"""Custom Spark data source: spark.read/write.format('tiledb')."""

import numpy as np
import pandas as pd
import pytest

import tiledb_py_spark as tdb


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from tiledb_py_spark.sources.spark_datasource import register

    register(spark)


@pytest.fixture()
def arr(uri, spark):
    pdf = pd.DataFrame({"k": np.arange(500, dtype=np.int64),
                        "v": np.arange(500) * 1.5})
    tdb.from_pandas(uri, pdf, index_dims=["k"])
    return uri


def test_format_read(arr, spark):
    df = spark.read.format("tiledb").load(arr)
    assert df.count() == 500
    assert set(df.columns) == {"k", "v"}


def test_format_filter_pushdown_correct(arr, spark):
    df = spark.read.format("tiledb").load(arr)
    rows = df.filter((df.k >= 10) & (df.k < 20)).collect()
    assert sorted(r.k for r in rows) == list(range(10, 20))
    rows = df.filter(df.k.isin([1, 5, 400])).collect()
    assert sorted(r.k for r in rows) == [1, 5, 400]


def test_format_write_appends_fragment(arr, spark):
    extra = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(500, 600, dtype=np.int64),
                      "v": np.zeros(100)}))
    extra.write.format("tiledb").mode("append").save(arr)
    assert spark.read.format("tiledb").load(arr).count() == 600
    assert len(tdb.array_fragments(arr)) == 2
    # engine path sees the same data
    assert tdb.open(arr, spark=spark).dataframe().count() == 600


def test_format_timestamp_option(arr, spark):
    extra = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(500, 550, dtype=np.int64),
                      "v": np.zeros(50)}))
    extra.write.format("tiledb").mode("append").save(arr)
    ts1 = tdb.array_fragments(arr)[0].timestamp_range[1]
    old = spark.read.format("tiledb").option("timestamp", ts1).load(arr)
    assert old.count() == 500


def test_format_overwrite_rejected(arr, spark):
    df = spark.read.format("tiledb").load(arr)
    with pytest.raises(Exception):
        df.write.format("tiledb").mode("overwrite").save(arr)


def test_format_overlapping_nodup_rejected(uri, spark):
    """Overlapping fragments on a no-duplicates array need the engine's
    last-write-wins plan; the raw format reader must refuse, not lie."""
    pdf = pd.DataFrame({"k": np.arange(10, dtype=np.int64), "v": np.zeros(10)})
    tdb.from_pandas(uri, pdf, index_dims=["k"])
    tdb.from_pandas(uri, pdf, index_dims=["k"], mode="append")  # same coords
    with pytest.raises(Exception):
        spark.read.format("tiledb").load(uri).count()
