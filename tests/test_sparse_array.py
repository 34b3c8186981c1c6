"""Sparse array read/write: COO writes, slice reads (inclusive bounds),
multi_index, query conditions, aggregates, unique_dim_values.

Oracle = numpy recomputation, mirroring the reference's test strategy
(test_libtiledb.py / test_multi_index.py / test_aggregates.py).
"""

import numpy as np
import pytest
from numpy.testing import assert_array_equal

import tiledb_py_spark as tdb


@pytest.fixture()
def sparse1d(uri, spark):
    dom = tdb.Domain(tdb.Dim(name="k", domain=(0, 999), tile=100, dtype=np.int64))
    schema = tdb.ArraySchema(domain=dom,
                             attrs=[tdb.Attr(name="v", dtype=np.float64),
                                    tdb.Attr(name="w", dtype=np.int64)],
                             sparse=True)
    tdb.Array.create(uri, schema)
    with tdb.open(uri, "w", spark=spark) as A:
        A[np.arange(0, 100, 2)] = {"v": np.arange(50) * 1.5,
                                   "w": np.arange(50) * 10}
    return uri


def _sorted(d, key="k"):
    order = np.argsort(d[key], kind="stable")
    return {k: v[order] for k, v in d.items()}


def test_full_read(sparse1d, spark):
    A = tdb.open(sparse1d, spark=spark)
    res = _sorted(A[:])
    assert_array_equal(res["k"], np.arange(0, 100, 2))
    assert_array_equal(res["v"], np.arange(50) * 1.5)


def test_slice_read_inclusive_halfopen(sparse1d, spark):
    """Plain __getitem__ uses numpy half-open slices (array.py:290-292)."""
    A = tdb.open(sparse1d, spark=spark)
    res = _sorted(A[10:21])  # half-open: coords 10..20
    assert_array_equal(res["k"], np.arange(10, 21, 2))


def test_multi_index_inclusive(sparse1d, spark):
    """multi_index slices are INCLUSIVE (multirange_indexing docstring)."""
    A = tdb.open(sparse1d, spark=spark)
    res = _sorted(A.multi_index[10:20])
    assert_array_equal(res["k"], np.arange(10, 21, 2))


def test_multi_index_points_and_ranges(sparse1d, spark):
    A = tdb.open(sparse1d, spark=spark)
    res = _sorted(A.multi_index[[0, 4, slice(90, 94)]])
    assert_array_equal(res["k"], np.array([0, 4, 90, 92, 94]))


def test_query_cond(sparse1d, spark):
    A = tdb.open(sparse1d, spark=spark)
    res = _sorted(A.query(cond="w >= 400 and v < 690.0")[:])
    mask = (np.arange(50) * 10 >= 400) & (np.arange(50) * 1.5 < 690.0)
    assert_array_equal(res["w"], (np.arange(50) * 10)[mask])


def test_attr_projection(sparse1d, spark):
    A = tdb.open(sparse1d, spark=spark)
    res = A.query(attrs=["v"])[:]
    assert set(res.keys()) == {"k", "v"}
    with pytest.raises(KeyError):
        A.query(attrs=["nope"])


def test_agg(sparse1d, spark):
    A = tdb.open(sparse1d, spark=spark)
    assert A.query().agg({"v": "sum"})[:] == pytest.approx(np.sum(np.arange(50) * 1.5))
    res = A.query().agg({"v": ["min", "max", "mean"], "w": ["count"]})[:]
    assert res["v"]["min"] == 0.0
    assert res["v"]["max"] == 49 * 1.5
    assert res["w"]["count"] == 50


def test_agg_empty_selection(sparse1d, spark):
    """Empty-set aggregates: None for int min/max, NaN for float (core.cc:436-501)."""
    A = tdb.open(sparse1d, spark=spark)
    res = A.query().agg({"v": ["min", "sum"], "w": ["max"]}).multi_index[500:600]
    assert np.isnan(res["v"]["min"])
    assert res["w"]["max"] is None
    assert res["v"]["sum"] == 0


def test_nonempty_domain(sparse1d, spark):
    A = tdb.open(sparse1d, spark=spark)
    assert A.nonempty_domain() == ((0, 98),)


def test_unique_dim_values(sparse1d, spark):
    A = tdb.open(sparse1d, spark=spark)
    assert_array_equal(A.unique_dim_values("k"), np.arange(0, 100, 2))


def test_multiple_fragments_last_write_wins(uri, spark):
    dom = tdb.Domain(tdb.Dim(name="k", domain=(0, 9), tile=10, dtype=np.int64))
    schema = tdb.ArraySchema(domain=dom, attrs=[tdb.Attr(name="v", dtype=np.int64)],
                             sparse=True, allows_duplicates=False)
    tdb.Array.create(uri, schema)
    with tdb.open(uri, "w", spark=spark) as A:
        A[np.array([1, 2, 3])] = np.array([10, 20, 30])
    with tdb.open(uri, "w", spark=spark) as A:
        A[np.array([2, 3, 4])] = np.array([200, 300, 400])
    res = _sorted(tdb.open(uri, spark=spark)[:])
    assert_array_equal(res["k"], [1, 2, 3, 4])
    assert_array_equal(res["v"], [10, 200, 300, 400])


def test_allows_duplicates_keeps_all(uri, spark):
    dom = tdb.Domain(tdb.Dim(name="k", domain=(0, 9), tile=10, dtype=np.int64))
    schema = tdb.ArraySchema(domain=dom, attrs=[tdb.Attr(name="v", dtype=np.int64)],
                             sparse=True, allows_duplicates=True)
    tdb.Array.create(uri, schema)
    with tdb.open(uri, "w", spark=spark) as A:
        A[np.array([1, 1])] = np.array([10, 11])
    with tdb.open(uri, "w", spark=spark) as A:
        A[np.array([1])] = np.array([12])
    res = tdb.open(uri, spark=spark)[:]
    assert sorted(res["v"].tolist()) == [10, 11, 12]


def test_string_dim(uri, spark):
    dom = tdb.Domain(tdb.Dim(name="name", dtype=np.str_))
    schema = tdb.ArraySchema(domain=dom, attrs=[tdb.Attr(name="v", dtype=np.int64)],
                             sparse=True)
    tdb.Array.create(uri, schema)
    with tdb.open(uri, "w", spark=spark) as A:
        A[np.array(["apple", "banana", "cherry"])] = np.array([1, 2, 3])
    A = tdb.open(uri, spark=spark)
    res = A.multi_index["apple":"banana"]
    assert sorted(res["name"].tolist()) == ["apple", "banana"]


def test_datetime_dim(uri, spark):
    """Datetime dimension: domain round-trip, np.datetime64 slicing,
    parquet micros coercion (Spark rejects TIMESTAMP(NANOS))."""
    import pandas as pd
    import tiledb_py_spark as tdb_

    dates = pd.date_range("2021-01-01", periods=30, freq="D")
    pdf = pd.DataFrame({"d": dates, "v": np.arange(30) * 1.0})
    tdb_.from_pandas(uri, pdf, index_dims=["d"])
    A = tdb.open(uri, spark=spark)
    assert A.schema.domain.dim("d").dtype.kind == "M"
    res = A.multi_index[np.datetime64("2021-01-05"):np.datetime64("2021-01-10")]
    assert len(res["d"]) == 6  # inclusive both ends
    assert res["d"].dtype.kind == "M"
    with pytest.raises(Exception):
        A.multi_index[5:10]  # non-datetime selector on datetime dim


def test_write_requires_write_mode(sparse1d, spark):
    A = tdb.open(sparse1d, "r", spark=spark)
    with pytest.raises(PermissionError):
        A[np.array([0])] = np.array([1.0])


def test_incomplete_iteration(sparse1d, spark):
    A = tdb.open(sparse1d, spark=spark)
    batches = list(A.query(return_incomplete=True)[:])
    total = np.concatenate([b["k"] for b in batches])
    assert sorted(total.tolist()) == list(range(0, 100, 2))


def test_return_arrow(sparse1d, spark):
    import pyarrow as pa

    A = tdb.open(sparse1d, spark=spark)
    tbl = A.query(return_arrow=True)[:]
    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == 50


def test_return_arrow_zero_copy_dtype_fidelity(uri, spark, monkeypatch):
    """Arrow export rides Spark 4's df.toArrow() (reference core.cc:
    1514-1571 is zero-copy), NOT a pandas round-trip: timestamps keep
    timestamp[us] and nullable ints stay int64 with real nulls (pandas
    would widen to float64/NaN).  The from_pandas fallback is pinned
    dead on this PySpark by making it explode."""
    import pandas as pd
    import pyarrow as pa

    pdf = pd.DataFrame({
        "k": np.arange(5, dtype="int64"),
        "ts": pd.date_range("2020-01-01", periods=5,
                            freq="D").astype("datetime64[us]"),
        "x": pd.array([1, None, 3, None, 5], dtype="Int64"),
        "v": np.linspace(0.0, 1.0, 5),
    })
    tdb.from_pandas(uri, pdf, index_dims=["k"])

    from pyspark.sql import DataFrame as _SparkDF

    def _boom(*a, **k):
        raise AssertionError("pandas round-trip used for Arrow export")
    monkeypatch.setattr(_SparkDF, "toPandas", _boom)

    A = tdb.open(uri, spark=spark)
    tbl = A.query(return_arrow=True)[:]
    assert pa.types.is_timestamp(tbl.schema.field("ts").type)
    assert tbl.schema.field("ts").type.unit == "us"
    assert pa.types.is_int64(tbl.schema.field("x").type)
    assert tbl.column("x").null_count == 2
    assert tbl.column("x").to_pylist() == [1, None, 3, None, 5]
    assert tbl.column("ts").to_pylist()[0].year == 2020


def test_pickle_roundtrip(sparse1d, spark):
    import pickle

    A = tdb.open(sparse1d, spark=spark)
    B = pickle.loads(pickle.dumps(A))
    assert B.uri == A.uri and B.schema.sparse
