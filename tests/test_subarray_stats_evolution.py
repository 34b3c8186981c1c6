"""S14 Subarray object reads/writes, stats_*, expand_current_domain."""

import numpy as np
import pandas as pd
import pytest
from numpy.testing import assert_array_equal

import tiledb_py_spark as tdb


def test_subarray_sparse_read(uri, spark):
    pdf = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                        "v": np.arange(50) * 1.0})
    tdb.from_pandas(uri, pdf, index_dims=["k"])
    A = tdb.open(uri, spark=spark)
    sub = tdb.Subarray(A)
    sub.add_dim_range("k", (5, 8))
    sub.add_dim_range(0, (20, 22))
    assert sub.num_dim_ranges("k") == 2
    res = A.read_subarray(sub)
    assert sorted(res["k"].tolist()) == [5, 6, 7, 8, 20, 21, 22]


def test_subarray_dense_read_write(uri, spark):
    tdb.from_numpy(uri, np.zeros(10, dtype=np.int64))
    with tdb.open(uri, "w", spark=spark) as A:
        sub = tdb.Subarray(A)
        sub.add_dim_range(0, (2, 4))
        A.write_subarray(sub, np.array([7, 8, 9]))
    A = tdb.open(uri, spark=spark)
    sub = tdb.Subarray(A)
    sub.add_dim_range(0, (0, 9))
    res = A.read_subarray(sub)
    got = next(iter(res.values()))
    expected = np.zeros(10, dtype=np.int64)
    expected[2:5] = [7, 8, 9]
    assert_array_equal(got, expected)
    assert sub.shape() == (10,)


def test_subarray_dense_multirange_read(uri, spark):
    """Dense multi-range read: concatenated axes in ADD order, repeats
    and out-of-order ranges included (reference
    tests/test_read_subarray.py::test_read_multiple_ranges)."""
    data = np.arange(11, dtype=np.float64) * 10
    tdb.from_numpy(uri, data)
    A = tdb.open(uri, spark=spark)
    sub = tdb.Subarray(A)
    sub.add_dim_range(0, (3, 3))
    sub.add_dim_range(0, (1, 2))
    sub.add_dim_range(0, (5, 10))
    res = A.read_subarray(sub)
    got = next(iter(res.values()))
    order = np.array([3, 1, 2, 5, 6, 7, 8, 9, 10])
    assert_array_equal(got, data[order])


def test_subarray_dense_multirange_2d(uri, spark):
    """2D: per-dim concatenation crosses into a (sum_d0, sum_d1) grid."""
    data = np.arange(16, dtype=np.int64).reshape(4, 4)
    tdb.from_numpy(uri, data)
    A = tdb.open(uri, spark=spark)
    sub = tdb.Subarray(A)
    sub.add_dim_range(0, (2, 3))
    sub.add_dim_range(0, (0, 0))
    sub.add_dim_range(1, (1, 2))
    res = A.read_subarray(sub)
    got = next(iter(res.values()))
    assert got.shape == (3, 2)
    assert_array_equal(got, data[np.ix_([2, 3, 0], [1, 2])])


def test_subarray_dense_multirange_write(uri, spark):
    """Multi-range dense write: value shape == concatenated axes."""
    tdb.from_numpy(uri, np.zeros(10, dtype=np.int64))
    with tdb.open(uri, "w", spark=spark) as A:
        sub = tdb.Subarray(A)
        sub.add_dim_range(0, (1, 2))
        sub.add_dim_range(0, (7, 8))
        A.write_subarray(sub, np.array([1, 2, 7, 8]))
    A = tdb.open(uri, spark=spark)
    sub = tdb.Subarray(A)
    sub.add_dim_range(0, (0, 9))
    got = next(iter(A.read_subarray(sub).values()))
    expected = np.zeros(10, dtype=np.int64)
    expected[[1, 2, 7, 8]] = [1, 2, 7, 8]
    assert_array_equal(got, expected)


def test_stats(uri, spark):
    pdf = pd.DataFrame({"k": np.arange(10, dtype=np.int64), "v": np.zeros(10)})
    tdb.from_pandas(uri, pdf, index_dims=["k"])
    tdb.stats_reset()
    tdb.stats_enable()
    A = tdb.open(uri, spark=spark)
    A.multi_index[0:5]
    out = tdb.stats_dump(print_out=False, json_output=True)
    tdb.stats_disable()
    import json

    data = json.loads(out)
    assert data["py.queries_planned"] >= 1
    assert data["py.fragments_scanned"] >= 1
    # disabled -> counters frozen
    tdb.stats_reset()
    A.multi_index[0:5]
    assert "py.queries_planned" not in (tdb.stats_dump(print_out=False,
                                                       json_output=True) or "{}")


def test_expand_current_domain(uri, spark):
    pdf = pd.DataFrame({"k": np.arange(10, dtype=np.int64), "v": np.zeros(10)})
    tdb.from_pandas(uri, pdf, index_dims=["k"])
    old_hi = tdb.open(uri).schema.domain.dim("k").domain[1]
    ev = tdb.ArraySchemaEvolution()
    ev.expand_current_domain({"k": (0, old_hi + 1000)})
    ev.array_evolve(uri)
    assert tdb.open(uri).schema.domain.dim("k").domain == (0, old_hi + 1000)
    ev2 = tdb.ArraySchemaEvolution()
    ev2.expand_current_domain({"k": (0, 5)})  # shrink -> reject
    with pytest.raises(ValueError):
        ev2.array_evolve(uri)
