"""Deterministic scale-factor data generator (seed 42) for bench runs at
scale factors the read-only driver testdata does not provide
(``TESTDATA.md`` tops out at sf0.1, where per-query runtime is dominated
by fixed session overhead rather than plan quality).

Generates the same star schema + events/documents/embeddings tables with
distributions matched to the profiled sf0.1 driver data (value ranges,
key cardinalities, group frequencies, text length and near-dup rate), so
per-query cost should scale ~linearly in sf and a BENCH_sf1 run measures
plan behavior, not constant factors.

Usage:
    python tools/gen_sf.py 1 [/root/repo/.bench_data/sf1]
    python tools/gen_sf.py 1 --skew [out_dir]   # adversarial Zipf-ish tail

``--skew`` layers the realistic crawl-data failure modes the uniform
seed-42 distributions never exercise (VERDICT r7 item 2) on top of the
same tables:
  * one HOT ENTITY: user_id 0 holds ~20% of all events (single-task
    skew for per-entity collect/fold operators);
  * one GIANT DOCUMENT: the last doc_id carries ~5M*sf tokens (a
    single row dominating any per-document token expansion);
  * a HEAD N-GRAM: ~40% of documents embed one repeated 8-token
    phrase at ~half their length, putting ~30% of all n-gram postings
    on one shingle family (hot-key shuffle pressure);
  * one LSH BUCKET AT CAP: a 200-document near-identical cluster
    (tiny single-token mutations of one base) whose band buckets all
    exceed the default bucket_cap=64.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

# sf0.1 row counts x 10 = rows per unit sf
ROWS = {
    "lineitem": 6_000_000,
    "orders": 1_500_000,
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

_DAY_US = 86_400_000_000

_VOCAB = ("batch part spark line column order small sort fast value scan a "
          "hash slow group vector query agg spark table big join scan shuffle "
          "read write plan stage task row").split()

_MKTSEG = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_PADJ = ["large", "hot", "blue", "old", "cold", "red", "small", "new"]
_PNOUN = ["ring", "bolt", "plate", "tube", "rod", "disk", "cap", "wheel"]


def _ts_us(date_str: str) -> int:
    return np.datetime64(date_str, "us").astype("int64")


def _write(out_dir: str, name: str, cols: dict) -> None:
    tbl = pa.table(cols)
    # bounded row groups: pyarrow's 1M-row default wrote e.g. sf10
    # documents (500k rows, 60MB zstd) as ONE row group — a single scan
    # task no matter the core count.  64k-row groups let Spark's
    # byte-range splits actually parallelize under the DEFAULT
    # 128m maxPartitionBytes + filesMinPartitionNum/bytesPerCore split
    # behavior (session.py deliberately sets no global override —
    # commit fd30cfb; Python-bound operators guard their own
    # parallelism via operators/_par.py::spread_for_python).  Values
    # are unchanged — layout only.
    pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"),
                   row_group_size=65536)
    print(f"  {name}: {tbl.num_rows} rows")


def generate(sf: float, out_dir: str, skew: bool = False,
             tables=None) -> None:
    """``tables`` (e.g. ``{"documents", "embeddings"}``) restricts
    generation to the named tables — at sf100 the full star schema is
    600M lineitem rows, but the document-family scale ladder only needs
    the text tables."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(SEED)
    n = {t: max(1, int(r * sf)) for t, r in ROWS.items()}

    def want(t: str) -> bool:
        return tables is None or t in tables

    # --- dimensions -------------------------------------------------------
    if want("region"):
        _write(out_dir, "region", {
            "r_regionkey": pa.array(range(5), pa.int64()),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE",
                       "MIDDLE EAST"]})
    if want("nation"):
        _write(out_dir, "nation", {
            "n_nationkey": pa.array(range(25), pa.int64()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int64())})

    nc = n["customer"]
    if want("customer"):
        _write(out_dir, "customer", {
            "c_custkey": pa.array(np.arange(nc, dtype=np.int64)),
            "c_name": [f"Customer#{i:09d}" for i in range(nc)],
            "c_nationkey": pa.array(rng.randint(0, 25, nc).astype(np.int64)),
            "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, nc), 2)),
            "c_mktsegment": pa.array(
                np.array(_MKTSEG)[rng.randint(0, 5, nc)])})

    ns = n["supplier"]
    if want("supplier"):
        _write(out_dir, "supplier", {
            "s_suppkey": pa.array(np.arange(ns, dtype=np.int64)),
            "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
            "s_nationkey": pa.array(rng.randint(0, 25, ns).astype(np.int64)),
            "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, ns), 2))})

    np_ = n["part"]
    if want("part"):
        _write(out_dir, "part", {
            "p_partkey": pa.array(np.arange(np_, dtype=np.int64)),
            "p_name": [f"{_PADJ[i % 8]} {_PNOUN[(i // 8) % 8]}"
                       for i in range(np_)],
            "p_brand": [f"Brand#{i % 25}" for i in range(np_)],
            "p_type": pa.array(
                np.array(_PTYPES)[rng.randint(0, len(_PTYPES), np_)]),
            "p_size": pa.array(rng.randint(1, 51, np_).astype(np.int32)),
            "p_retailprice": pa.array(
                np.round(rng.uniform(900, 2000, np_), 2))})

    # --- orders -----------------------------------------------------------
    # NOTE: the rng draw sequence is per-table-block, so a subset
    # generation reproduces EXACTLY the tables a full generation would
    # write only when the skipped blocks' draws are also skipped — a
    # subset dir is self-consistent but not byte-identical to the same
    # tables inside a full dir.  Scale ladders compare within one dir
    # family, so this does not matter there.
    if want("orders") or want("lineitem"):
        no = n["orders"]
        od_lo, od_hi = _ts_us("1995-01-01"), _ts_us("2001-08-02")
        odate = (rng.randint(0, (od_hi - od_lo) // _DAY_US, no) * _DAY_US
                 + od_lo)
        odate.sort()  # orderkey correlates with date, like the driver data
    if want("orders"):
        _write(out_dir, "orders", {
            "o_orderkey": pa.array(np.arange(no, dtype=np.int64)),
            "o_custkey": pa.array(rng.randint(0, nc, no).astype(np.int64)),
            "o_orderstatus": pa.array(
                np.array(["O", "P", "F"])[rng.randint(0, 3, no)]),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000, 500000, no), 2)),
            "o_orderdate": pa.array(odate).cast(pa.timestamp("us")),
            "o_orderpriority": pa.array(np.array(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                 "5-LOW"])[rng.randint(0, 5, no)])})

    # --- lineitem ---------------------------------------------------------
    if want("lineitem"):
        nl = n["lineitem"]
        lines_per_order = 1 + rng.poisson(nl / no - 1, no)  # mean nl/no
        okeys = np.repeat(np.arange(no, dtype=np.int64),
                          lines_per_order)[:nl]
        if len(okeys) < nl:  # top up if the draw fell short
            okeys = np.concatenate([okeys,
                                    rng.randint(0, no, nl - len(okeys))
                                    .astype(np.int64)])
            okeys.sort()
        # per-order line numbers 1..k (vectorized cumulative count within
        # runs of equal orderkey)
        same = okeys[1:] == okeys[:-1]
        idx = np.arange(nl)
        start = np.concatenate([[0], idx[1:][~same]])
        starts_per_row = np.repeat(
            start, np.diff(np.concatenate([start, [nl]])))
        linenum = (idx - starts_per_row + 1).astype(np.int32)
        ship = odate[okeys] + rng.randint(1, 96, nl) * _DAY_US
        # draw order matters: partkey THEN suppkey, exactly as the
        # original dict literal evaluated, so skew=False output stays
        # bit-identical to data generated before the hot-key change
        partkeys = rng.randint(0, np_, nl).astype(np.int64)
        suppkeys = rng.randint(0, ns, nl).astype(np.int64)
        if skew:
            # hot JOIN key: supplier 0 on ~20% of lineitem rows — the
            # broadcast-ineligible skewed-probe case operators/skew.py's
            # salted_join exists for (one reducer owns 20% of the join
            # under plain hash partitioning)
            suppkeys[rng.random_sample(nl) < 0.2] = 0
        _write(out_dir, "lineitem", {
            "l_orderkey": pa.array(okeys),
            "l_partkey": pa.array(partkeys),
            "l_suppkey": pa.array(suppkeys),
            "l_linenumber": pa.array(linenum),
            "l_quantity": pa.array(rng.randint(1, 51, nl).astype(np.float64)),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900, 105000, nl), 2)),
            "l_discount": pa.array(
                np.round(rng.randint(0, 11, nl) / 100.0, 2)),
            "l_tax": pa.array(np.round(rng.randint(0, 9, nl) / 100.0, 2)),
            "l_returnflag": pa.array(
                np.array(["A", "N", "R"])[rng.randint(0, 3, nl)]),
            "l_linestatus": pa.array(
                np.array(["F", "O"])[rng.randint(0, 2, nl)]),
            "l_shipdate": pa.array(ship).cast(pa.timestamp("us"))})

    # --- events -----------------------------------------------------------
    if want("events"):
        _gen_events(out_dir, n, sf, rng, skew)

    # --- documents (profiled ~3% near-dup / ~0.2% exact-dup mix) ----------
    if want("documents"):
        _gen_documents(out_dir, n, sf, rng, skew)

    # --- embeddings (clustered so IVF/LSH have structure) -----------------
    if want("embeddings"):
        _gen_embeddings(out_dir, n, rng)


def _gen_events(out_dir, n, sf, rng, skew):
    ne = n["events"]
    ev_lo, ev_hi = _ts_us("2024-01-01"), _ts_us("2024-01-31")
    ts = np.sort(rng.randint(ev_lo, ev_hi, ne))
    n_users = max(1, int(15_000 * sf))
    user_ids = rng.randint(0, n_users, ne).astype(np.int64)
    if skew:
        # hot entity: user 0 owns ~20% of ALL events — the single-task
        # skew case for per-entity collect_list/fold operators
        user_ids[rng.random_sample(ne) < 0.2] = 0
    _write(out_dir, "events", {
        "event_id": pa.array(np.arange(ne, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(user_ids),
        "event_type": pa.array(np.array(
            ["view", "click", "purchase", "signup", "error"]
        )[rng.randint(0, 5, ne)]),
        "value": pa.array(np.round(np.minimum(rng.exponential(50, ne), 600), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.randint(0, 100, ne)])})


def _gen_documents(out_dir, n, sf, rng, skew):
    nd = n["documents"]
    vocab = np.array(_VOCAB)
    texts: list[str] = []
    langs = np.array(["en", "en", "zh", "es", "fr", "de"])  # ~2:1:1:1:1
    doc_langs = []
    for i in range(nd):
        r = rng.random_sample()
        if i > 100 and r < 0.002:  # exact dup
            j = rng.randint(0, i)
            texts.append(texts[j])
        elif i > 100 and r < 0.032:  # near dup: mutate one word
            j = rng.randint(0, i)
            ws = texts[j].split()
            ws[rng.randint(0, len(ws))] = str(vocab[rng.randint(0, len(vocab))])
            texts.append(" ".join(ws))
        else:
            k = rng.randint(8, 106)
            texts.append(" ".join(vocab[rng.randint(0, len(vocab), k)]))
        doc_langs.append(langs[rng.randint(0, len(langs))])
    if skew:
        head = "hot head gram phrase dominating the posting stream"
        for i in range(nd):
            if i % 5 < 2:
                # head n-gram: 40% of docs are ~half this one phrase ->
                # ~30% of all n-gram postings land on one shingle family
                k = len(texts[i].split())
                texts[i] = " ".join([head] * max(1, k // 8)) \
                    + " " + texts[i]
        # LSH bucket at cap: 200 near-identical docs (one-token
        # mutations of a shared base) -> every band bucket of the
        # cluster exceeds the default bucket_cap=64
        if nd > 260:
            base = texts[nd - 260]
            bw = base.split()
            for j in range(200):
                ws = list(bw)
                ws[j % len(ws)] = str(vocab[j % len(vocab)])
                texts[nd - 201 + j] = " ".join(ws)
        # giant document: ~5M*sf tokens in ONE row — a single document
        # dominating every per-doc token expansion.  Its first half is
        # ONE repeated token, so a single n-gram ("boiler"*n) alone
        # covers ~30% of the corpus's postings — the hottest-key case.
        giant = max(50_000, int(5_000_000 * sf))
        texts[nd - 1] = " ".join(["boiler"] * (giant // 2)) + " " + \
            " ".join(vocab[rng.randint(0, len(vocab), giant - giant // 2)])
    _write(out_dir, "documents", {
        "doc_id": pa.array(np.arange(nd, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(doc_langs),
        "source": pa.array([f"src{i % 20}" for i in range(nd)]),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64))})


def _gen_embeddings(out_dir, n, rng):
    nv = n["embeddings"]
    dim = 64
    labels = rng.randint(0, 10, nv).astype(np.int32)
    centers = rng.standard_normal((10, dim)) * 0.8
    vecs = (centers[labels] + rng.standard_normal((nv, dim)) * 0.6) \
        .astype(np.float32)
    _write(out_dir, "embeddings", {
        "vec_id": pa.array(np.arange(nv, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels)})


def main() -> int:
    argv = sys.argv[1:]
    skew = "--skew" in argv
    tables = None
    for a in list(argv):
        if a.startswith("--tables="):
            tables = set(a.split("=", 1)[1].split(","))
        elif a.startswith("--") and a != "--skew":
            # fail loudly: a typo'd flag (--table=, --skew=1) silently
            # ignored would launch a FULL star-schema generation at
            # whatever sf was given
            print(f"unknown flag {a!r} (known: --skew, --tables=a,b)",
                  file=sys.stderr)
            return 2
    args = [a for a in argv if not a.startswith("--")]
    sf = float(args[0]) if args else 1.0
    default = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_data",
        f"sf{sf:g}" + ("skew" if skew else ""))
    out_dir = args[1] if len(args) > 1 else default
    print(f"generating sf={sf} skew={skew} tables={tables} -> {out_dir}")
    generate(sf, out_dir, skew=skew, tables=tables)
    return 0


if __name__ == "__main__":
    sys.exit(main())
