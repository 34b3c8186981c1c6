"""Parallelism guard for Python-bound row-local stages.

A small zstd parquet file is ONE scan task under Spark's default
``maxPartitionBytes`` (byte-range splits), which is fine for JVM-side
scans but serializes an Arrow/pandas stage — a shuffle-free document
operator then runs its whole corpus in one Python worker (round-9
measurement: 500+ s for a 16 s job).  Globally lowering
``maxPartitionBytes`` taxes every JVM scan 1.5-3x at small scale, so
the targeted fix lives here: operators whose next stage is
Python-bound call :func:`spread_for_python` to round-robin repartition
up to core count when the incoming partition count is lower.  The
extra Exchange moves only the operator's input columns once — cheap
against minutes of serialized Python — and is a no-op on data that is
already parallel (any post-shuffle frame, any many-file source)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_python(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff it currently has
    fewer partitions — call immediately before a Python-bound stage
    (pandas_udf over a scan, ``mapInPandas``)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df.repartition(target)
    return df.repartition(target) if current < target else df
