"""Write-path scale proof (VERDICT r13 item 5): the read families have
sf10/sf100 rows; the write proof stopped at sf1 (BASELINE.md: `from_spark`
6M-row lineitem, 6.6 s ~= 0.9M rows/s).  This tool measures BOTH write
surfaces at an arbitrary sf dir and verifies a full readback:

  * ``from_spark`` ingest of the full lineitem (repartitionByRange on the
    dims + sortWithinPartitions + zstd parquet fragment + manifest
    commit) — the documented 100 TB ingest path, no pandas anywhere;
  * the Spark datasource sink, ``df.write.format("tiledb")
    .mode("append")`` into a pre-created array — the executor-parallel
    commit-from-task-messages path.

Each readback is a datasource scan counting rows AND summing one attr
(count alone could satisfy itself from parquet metadata without touching
data pages).  One run per process — invoke N times and take the min
(min-of-N fresh-process; this host's runtimes are bimodal, see
BENCH_sf10.json environment_variance).

Usage: python tools/write_scale_bench.py [sf_dir]   # one JSON line
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DIMS = ["l_orderkey", "l_linenumber"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/.bench_data/sf10"
    import tiledb_py_spark as tdb
    from tiledb_py_spark import manifest as mf
    from tiledb_py_spark.session import get_spark
    from tiledb_py_spark.sources.spark_datasource import register

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    n_expect = li.count()

    scratch = "/tmp/tdbps_write_scale"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    out = {"metric": "write_scale_bench", "sf_dir": sf_dir,
           "rows": n_expect, "unit": "sec", "runs": {}}

    # ---- from_spark ingest + full readback ---------------------------
    uri = os.path.join(scratch, "li_from_spark")
    t0 = time.perf_counter()
    tdb.from_spark(uri, li, index_dims=DIMS, full_domain=True)
    t_ingest = time.perf_counter() - t0
    t0 = time.perf_counter()
    back = spark.read.format("tiledb").load(uri) \
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("s")) \
        .collect()[0]
    t_read = time.perf_counter() - t0
    assert back.n == n_expect, f"readback {back.n} != {n_expect}"
    out["runs"]["from_spark_ingest"] = {
        "s": round(t_ingest, 2),
        "mrows_per_s": round(n_expect / t_ingest / 1e6, 3)}
    out["runs"]["from_spark_readback"] = {"s": round(t_read, 2),
                                          "rows_verified": back.n}

    # ---- datasource sink (df.write.format("tiledb")) + readback ------
    uri2 = os.path.join(scratch, "li_ds_write")
    tdb.from_spark(uri2, li, index_dims=DIMS, full_domain=True,
                   mode="schema_only")
    t0 = time.perf_counter()
    li.write.format("tiledb").mode("append").save(uri2)
    t_ds = time.perf_counter() - t0
    t0 = time.perf_counter()
    back2 = spark.read.format("tiledb").load(uri2) \
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("s")) \
        .collect()[0]
    t_read2 = time.perf_counter() - t0
    assert back2.n == n_expect, f"ds readback {back2.n} != {n_expect}"
    assert abs(back2.s - back.s) < 1e-6 * max(abs(back.s), 1.0), \
        "the two write surfaces read back different data"
    out["runs"]["datasource_write"] = {
        "s": round(t_ds, 2),
        "mrows_per_s": round(n_expect / t_ds / 1e6, 3),
        "n_fragments": len(mf.read_manifest(uri2).fragments)}
    out["runs"]["datasource_readback"] = {"s": round(t_read2, 2),
                                          "rows_verified": back2.n}

    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
