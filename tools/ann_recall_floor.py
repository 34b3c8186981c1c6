"""ANN recall FLOOR at real scale — a CHECKED invariant, not just a
recorded table (VERDICT r12 item 5).

The ``ivfpq_ann`` driver gate asserts its recall floor only at
sf0.001/sf0.01, where ``n_cells="auto"`` degenerates to tiny
geometries; the cells ladder (``ann_cells_ladder.py``) measures scale
recall but asserts nothing, so a geometry/encode regression could ship
with every gate green.  This tool runs the DEFAULT recipes — the exact
parameter resolution a user gets from ``build_ann_index``/``ann_search``
with everything left at ``"auto"`` — at a bench scale factor
(default sf10: 200k vectors, auto ~= 447 cells, far from degenerate),
measures recall@10 against the exact cosine top-10, and EXITS NONZERO
if any floor is violated:

  * IVF, auto cells / auto probes, maintained (appended) state array:
    recall@10 >= 0.80
  * IVFPQ, all-auto geometry (n_cells/n_probe/m="auto", n_codes=64 —
    the constructor/build_ann_index defaults) with the DEFAULT rerank
    shortlist max(10k, 100):                                  >= 0.80

Floors sit under the measured sf10 values (IVF 0.975, rerank 0.9+)
with margin for query-sample noise; they are meant to catch a recipe
that silently drops to codes-only or mis-sizes geometry, not a 2%
wobble.  The first run of this tool caught exactly that defect: the
old fixed defaults (m=8, n_codes=16) read recall@10 = 0.3375 at 200k
vectors EVEN WITH the rerank shortlist — the coarse codes poison the
shortlist itself — which is why ``m`` is now dim-resolved
(``auto_m``) and ``n_codes`` defaults to 64.

Usage: python tools/ann_recall_floor.py [sf_dir]   # one JSON line;
merge into BENCH_ann.json as "recall_floor".  Exit 1 = floor broken.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_QUERIES = 8
K = 10
FLOORS = {"ivf_auto_state": 0.80, "ivfpq_rerank_default": 0.80}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/.bench_data/sf10"
    from tiledb_py_spark.operators.similarity import (IVFIndex, IVFPQIndex,
                                                      batch_topk)
    from tiledb_py_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    e = (spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
         .withColumn("embedding", F.col("embedding").cast("array<double>")))
    e = e.cache()
    n = e.count()
    stride = max(1, n // N_QUERIES)
    q_ids = [i * stride for i in range(N_QUERIES)]
    queries = e.filter(F.col("vec_id").isin(q_ids)) \
               .select("vec_id", "embedding")
    q_vecs = {r.vec_id: r.embedding for r in queries.collect()}

    exact = {}
    for r in batch_topk(e, "embedding", "vec_id", queries, "embedding",
                        "vec_id", k=K).collect():
        exact.setdefault(r.query_id, []).append(r.vec_id)

    out = {"metric": "ann_recall_floor", "sf_dir": sf_dir, "n_vectors": n,
           "n_queries": N_QUERIES, "k": K, "floors": dict(FLOORS),
           "measured": {}, "floor_ok": True}
    tmp = tempfile.mkdtemp(prefix="tdbps_floor_")

    # ---- IVF: everything "auto", over a maintained state array --------
    t0 = time.perf_counter()
    ivf = IVFIndex().fit(e, "embedding")          # n_cells/n_probe auto
    state = os.path.join(tmp, "ivf_state")
    ivf.append(e, "embedding", "vec_id", state)
    hits = 0
    for qid in q_ids:
        got = [r.vec_id for r in ivf.search_state(
            state, "embedding", "vec_id", q_vecs[qid], k=K,
            spark=spark).collect()]
        hits += len(set(got) & set(exact[qid]))
    out["measured"]["ivf_auto_state"] = {
        "n_cells": int(ivf.n_cells), "n_probe": int(ivf.n_probe),
        "recall_at_10": round(hits / (K * N_QUERIES), 4),
        "total_s": round(time.perf_counter() - t0, 2)}

    # ---- IVFPQ: constructor defaults (all-auto geometry, n_codes=64)
    # + default rerank shortlist max(10k, 100) — the
    # ann_search(kind="ivfpq") recipe (highlevel.py) -------------------
    t0 = time.perf_counter()
    pq = IVFPQIndex().fit(e, "embedding")         # auto cells/probe/m
    tab = pq.build(e, "embedding", "vec_id").cache()
    tab.count()
    hits = 0
    for qid in q_ids:
        got = [r.vec_id for r in pq.search(
            tab, q_vecs[qid], k=K, rerank=max(10 * K, 100),
            vectors_df=e).collect()]
        hits += len(set(got) & set(exact[qid]))
    tab.unpersist()
    out["measured"]["ivfpq_rerank_default"] = {
        "n_cells": int(pq.n_cells), "n_probe": int(pq.n_probe),
        "m": int(pq.m), "n_codes": int(pq.n_codes),
        "recall_at_10": round(hits / (K * N_QUERIES), 4),
        "total_s": round(time.perf_counter() - t0, 2)}

    for name, floor in FLOORS.items():
        got = out["measured"][name]["recall_at_10"]
        if got < floor:
            out["floor_ok"] = False
            print(f"FLOOR BROKEN: {name} recall {got} < {floor}",
                  file=sys.stderr)
    print(json.dumps(out))
    return 0 if out["floor_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
