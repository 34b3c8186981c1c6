"""Chunked lineitem generator for the sf100 scale ladder.

``tools/gen_sf.py`` materializes every column of a table in memory at
once — fine through sf10 (60M rows), but 600M-row sf100 lineitem would
peak ~60 GB of numpy arrays.  This tool streams the same COLUMN
DISTRIBUTIONS through a ``pyarrow.parquet.ParquetWriter`` in bounded
chunks (~1.5 GB peak), one row group per chunk.

Distribution parity with gen_sf.py (what the scale families consume):
  * l_partkey / l_suppkey: uniform over [0, part_n) / [0, supp_n) —
    pagerank's edge source (mod-4099 projection) and the join keys;
  * l_orderkey: contiguous runs per order, ~4 lines/order (Poisson);
  * l_quantity/extendedprice/discount/tax/flags: verbatim formulas;
  * l_shipdate: order date + U[1, 96) days, order dates ascending with
    the orderkey (per-chunk quantile slice of the global range — the
    same orderkey/date correlation gen_sf sorts for).

NOT bit-identical to a hypothetical in-memory sf100 gen_sf run (chunked
RNG draws in a different order; each chunk is seeded SEED+chunk_index),
and deliberately so — the ladder compares DISTRIBUTIONS across scale
points, not bytes.

Usage: python tools/gen_big_lineitem.py [sf] [out_dir] [chunk_rows]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_sf import ROWS, SEED, _DAY_US, _ts_us  # noqa: E402


def generate(sf: float, out_dir: str, chunk_rows: int = 25_000_000) -> None:
    nl = max(1, int(ROWS["lineitem"] * sf))
    no = max(1, int(ROWS["orders"] * sf))
    np_ = max(1, int(ROWS["part"] * sf))
    ns = max(1, int(ROWS["supplier"] * sf))
    od_lo, od_hi = _ts_us("1995-01-01"), _ts_us("2001-08-02")
    lines_per_order = nl / no

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "lineitem.parquet")
    schema = pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ])
    written = 0
    with pq.ParquetWriter(path, schema, compression="zstd") as w:
        chunk_i = 0
        while written < nl:
            m = min(chunk_rows, nl - written)
            rng = np.random.RandomState(SEED + chunk_i)
            # contiguous order runs: this chunk covers orderkeys in its
            # proportional slice; ~Poisson(4) lines per order
            k0 = int(written / lines_per_order)
            k1 = max(k0 + 1, int((written + m) / lines_per_order))
            reps = 1 + rng.poisson(lines_per_order - 1, k1 - k0)
            okeys = np.repeat(np.arange(k0, k1, dtype=np.int64), reps)[:m]
            if len(okeys) < m:
                okeys = np.concatenate([
                    okeys, rng.randint(k0, k1, m - len(okeys))
                    .astype(np.int64)])
                okeys.sort()
            same = okeys[1:] == okeys[:-1]
            idx = np.arange(m)
            start = np.concatenate([[0], idx[1:][~same]])
            starts_per_row = np.repeat(
                start, np.diff(np.concatenate([start, [m]])))
            linenum = (idx - starts_per_row + 1).astype(np.int32)
            # order dates ascend with orderkey: uniform within the
            # chunk's quantile slice of the global range, sorted
            lo = od_lo + int((od_hi - od_lo) * (k0 / no))
            hi = od_lo + int((od_hi - od_lo) * (k1 / no))
            odate = (rng.randint(0, max(1, (hi - lo) // _DAY_US), k1 - k0)
                     * _DAY_US + lo)
            odate.sort()
            ship = odate[okeys - k0] + rng.randint(1, 96, m) * _DAY_US
            tbl = pa.table({
                "l_orderkey": pa.array(okeys),
                "l_partkey": pa.array(
                    rng.randint(0, np_, m).astype(np.int64)),
                "l_suppkey": pa.array(
                    rng.randint(0, ns, m).astype(np.int64)),
                "l_linenumber": pa.array(linenum),
                "l_quantity": pa.array(
                    rng.randint(1, 51, m).astype(np.float64)),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(900, 105000, m), 2)),
                "l_discount": pa.array(
                    np.round(rng.randint(0, 11, m) / 100.0, 2)),
                "l_tax": pa.array(np.round(rng.randint(0, 9, m) / 100.0, 2)),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[rng.randint(0, 3, m)]),
                "l_linestatus": pa.array(
                    np.array(["F", "O"])[rng.randint(0, 2, m)]),
                "l_shipdate": pa.array(ship).cast(pa.timestamp("us")),
            }, schema=schema)
            w.write_table(tbl, row_group_size=1 << 20)
            written += m
            chunk_i += 1
            print(f"  chunk {chunk_i}: {written}/{nl} rows",
                  file=sys.stderr)
    print(f"lineitem: {nl} rows -> {path}")


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_data/sf100"
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 25_000_000
    generate(sf, out, chunk)
    return 0


if __name__ == "__main__":
    sys.exit(main())
