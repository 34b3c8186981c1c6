"""ANN recall-at-scale evidence (VERDICT r10 item 6): recall@10 vs the
exact cosine top-10 for IVF and IVFPQ at a bench scale factor, per
n_probe, with per-query latency — and the IVF numbers measured over a
state array GROWN BY TWO ``append`` BATCHES (the incremental-ingest
form), so the recorded recall is the recall of the maintained index,
not just a scratch build.  (Bit-equality of append-state vs scratch
search is separately pinned by the ``ann_append`` /
``incremental_e2e`` driver gates; this artifact records the measured
recall + latency ladder.)

Usage: python tools/ann_recall_bench.py [sf_dir] > BENCH_ann.json
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
N_PROBES = [1, 4, 8, 16, 64]
N_CELLS = 64


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

    # exact cosine top-10 per query (the ground truth)
    exact = {}
    t0 = time.perf_counter()
    for r in batch_topk(e, "embedding", "vec_id", queries, "embedding",
                        "vec_id", k=K).collect():
        exact.setdefault(r.query_id, []).append(r.vec_id)
    exact_s = round(time.perf_counter() - t0, 2)

    out = {"metric": "ann_recall", "sf_dir": sf_dir, "n_vectors": n,
           "n_queries": N_QUERIES, "k": K, "n_cells": N_CELLS,
           "exact_batch_topk_s": exact_s, "indexes": {}}

    # ---- IVF over a state array grown by TWO append batches ----------
    ivf = IVFIndex(n_cells=N_CELLS, n_probe=8).fit(e, "embedding")
    state = os.path.join(tempfile.mkdtemp(prefix="tdbps_annrec_"), "ivf")
    t0 = time.perf_counter()
    ivf.append(e.filter(F.col("vec_id") % 2 == 0), "embedding", "vec_id",
               state)
    ivf.append(e.filter(F.col("vec_id") % 2 == 1), "embedding", "vec_id",
               state)
    append_s = round(time.perf_counter() - t0, 2)
    rows = {"append_2_batches_s": append_s, "per_n_probe": {}}
    for npb in N_PROBES:
        hits, lat = 0, []
        for qid in q_ids:
            t0 = time.perf_counter()
            got = [r.vec_id for r in ivf.search_state(
                state, "embedding", "vec_id", q_vecs[qid], k=K,
                n_probe=npb, spark=spark).collect()]
            lat.append(time.perf_counter() - t0)
            hits += len(set(got) & set(exact[qid]))
        lat.sort()
        rows["per_n_probe"][npb] = {
            "recall_at_10": round(hits / (K * N_QUERIES), 4),
            "med_query_s": round(lat[len(lat) // 2], 3)}
    out["indexes"]["ivf_append_state"] = rows

    # ---- IVFPQ over the built code table ------------------------------
    pq = IVFPQIndex(n_cells=N_CELLS, n_probe=8, m=16, n_codes=64).fit(
        e, "embedding")
    tab = pq.build(e, "embedding", "vec_id").cache()
    t0 = time.perf_counter()
    tab.count()
    build_s = round(time.perf_counter() - t0, 2)
    rows = {"encode_s": build_s, "per_n_probe": {}}
    for npb in N_PROBES:
        hits, lat = 0, []
        for qid in q_ids:
            t0 = time.perf_counter()
            got = [r.vec_id for r in pq.search(
                tab, q_vecs[qid], k=K, n_probe=npb).collect()]
            lat.append(time.perf_counter() - t0)
            hits += len(set(got) & set(exact[qid]))
        lat.sort()
        rows["per_n_probe"][npb] = {
            "recall_at_10": round(hits / (K * N_QUERIES), 4),
            "med_query_s": round(lat[len(lat) // 2], 3)}
    out["indexes"]["ivfpq_code_table"] = rows

    # ---- IVFPQ + exact re-rank (shortlist 10*k) ------------------------
    rows = {"rerank_shortlist": 10 * K, "per_n_probe": {}}
    for npb in N_PROBES:
        hits, lat = 0, []
        for qid in q_ids:
            t0 = time.perf_counter()
            got = [r.vec_id for r in pq.search(
                tab, q_vecs[qid], k=K, n_probe=npb, rerank=10 * K,
                vectors_df=e).collect()]
            lat.append(time.perf_counter() - t0)
            hits += len(set(got) & set(exact[qid]))
        lat.sort()
        rows["per_n_probe"][npb] = {
            "recall_at_10": round(hits / (K * N_QUERIES), 4),
            "med_query_s": round(lat[len(lat) // 2], 3)}
    out["indexes"]["ivfpq_rerank"] = rows

    # one deeper-shortlist point (100*k) at the knee n_probe to show the
    # shortlist-miss bound closing
    hits, lat = 0, []
    for qid in q_ids:
        t0 = time.perf_counter()
        got = [r.vec_id for r in pq.search(
            tab, q_vecs[qid], k=K, n_probe=8, rerank=100 * K,
            vectors_df=e).collect()]
        lat.append(time.perf_counter() - t0)
        hits += len(set(got) & set(exact[qid]))
    lat.sort()
    out["indexes"]["ivfpq_rerank_deep"] = {
        "rerank_shortlist": 100 * K, "n_probe": 8,
        "recall_at_10": round(hits / (K * N_QUERIES), 4),
        "med_query_s": round(lat[len(lat) // 2], 3)}

    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
