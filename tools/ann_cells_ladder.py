"""IVF/IVFPQ cell-geometry ladder (VERDICT r11 item 2): recall@10 +
per-query latency vs ``n_cells`` at a fixed corpus, demonstrating why
the data-dependent ``n_cells="auto"`` (~sqrt(n)) default exists — a
FIXED cell count makes per-probe scan volume grow linearly with the
corpus, while sqrt-sized geometry keeps the scanned fraction
n_probe/sqrt(n).

For each n_cells in {64, 256, 1024, auto(sqrt n)}:
  - IVF: fit, ONE append into a state array (the maintained-index
    form), then recall@10 + median query latency per n_probe over the
    persisted cell-partitioned table.
  - IVFPQ: fit + encode the code table once, then codes-only ADC and
    the DEFAULT rerank recipe (shortlist max(10*k, 100)) at the
    sqrt-coupled probe count.

Usage: python tools/ann_cells_ladder.py [sf_dir] > ladder.json
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
N_PROBES = [4, 8, 16, 32, 64]
CELLS = [64, 256, 1024, "auto"]


def _med(lat):
    lat = sorted(lat)
    return round(lat[len(lat) // 2], 3)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/.bench_data/sf100"
    from tiledb_py_spark.operators.similarity import (IVFIndex, IVFPQIndex,
                                                      auto_n_cells,
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
    t0 = time.perf_counter()
    for r in batch_topk(e, "embedding", "vec_id", queries, "embedding",
                        "vec_id", k=K).collect():
        exact.setdefault(r.query_id, []).append(r.vec_id)
    exact_s = round(time.perf_counter() - t0, 2)

    out = {"metric": "ann_cells_ladder", "sf_dir": sf_dir, "n_vectors": n,
           "n_queries": N_QUERIES, "k": K,
           "exact_batch_topk_s": exact_s, "ladder": {}}

    tmp = tempfile.mkdtemp(prefix="tdbps_cells_")
    for spec in CELLS:
        nc = auto_n_cells(n) if spec == "auto" else spec
        tag = f"auto({nc})" if spec == "auto" else str(nc)
        if spec == "auto" and any(str(c) == str(nc) for c in CELLS[:-1]):
            continue
        row = {"n_cells": nc}

        # ---- IVF over a maintained (appended) state array -------------
        t0 = time.perf_counter()
        ivf = IVFIndex(n_cells=nc, n_probe=8).fit(e, "embedding")
        row["ivf_fit_s"] = round(time.perf_counter() - t0, 2)
        state = os.path.join(tmp, f"ivf_{nc}")
        t0 = time.perf_counter()
        ivf.append(e, "embedding", "vec_id", state)
        row["ivf_append_s"] = round(time.perf_counter() - t0, 2)
        per = {}
        for npb in N_PROBES:
            if npb > nc:
                continue
            hits, lat = 0, []
            for qid in q_ids:
                t0 = time.perf_counter()
                got = [r.vec_id for r in ivf.search_state(
                    state, "embedding", "vec_id", q_vecs[qid], k=K,
                    n_probe=npb, spark=spark).collect()]
                lat.append(time.perf_counter() - t0)
                hits += len(set(got) & set(exact[qid]))
            per[npb] = {"recall_at_10": round(hits / (K * N_QUERIES), 4),
                        "med_query_s": _med(lat),
                        "scanned_fraction": round(npb / nc, 4)}
        row["ivf_per_n_probe"] = per

        # ---- IVFPQ at the sqrt-coupled probe count ---------------------
        coupled = max(4, auto_n_cells(nc, lo=1))
        t0 = time.perf_counter()
        pq = IVFPQIndex(n_cells=nc, n_probe=coupled, m=16,
                        n_codes=64).fit(e, "embedding")
        row["ivfpq_fit_s"] = round(time.perf_counter() - t0, 2)
        tab = pq.build(e, "embedding", "vec_id").cache()
        t0 = time.perf_counter()
        tab.count()
        row["ivfpq_encode_s"] = round(time.perf_counter() - t0, 2)
        for label, kw in (("codes_only", {}),
                          ("rerank_default",
                           {"rerank": max(10 * K, 100), "vectors_df": e})):
            hits, lat = 0, []
            for qid in q_ids:
                t0 = time.perf_counter()
                got = [r.vec_id for r in pq.search(
                    tab, q_vecs[qid], k=K, n_probe=coupled,
                    **kw).collect()]
                lat.append(time.perf_counter() - t0)
                hits += len(set(got) & set(exact[qid]))
            row[f"ivfpq_{label}"] = {
                "n_probe": coupled,
                "recall_at_10": round(hits / (K * N_QUERIES), 4),
                "med_query_s": _med(lat)}
        tab.unpersist()
        out["ladder"][tag] = row

    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
