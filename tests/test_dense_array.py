"""Dense array semantics: numpy-oracle slicing, fill values, QC fill
(P11), steps, from_numpy round-trips, append mode.
"""

import numpy as np
import pytest
from numpy.testing import assert_array_equal

import tiledb_py_spark as tdb


def test_from_numpy_roundtrip_1d(uri, spark):
    data = np.arange(20, dtype=np.float64) * 2.5
    tdb.from_numpy(uri, data)
    A = tdb.open(uri, spark=spark)
    assert not A.schema.sparse
    assert A.shape == (20,)
    assert_array_equal(A[:], data)
    assert_array_equal(A[5:12], data[5:12])  # half-open like numpy
    assert_array_equal(A[3], data[3].reshape(()))  # scalar index drops axis


def test_from_numpy_roundtrip_2d(uri, spark):
    data = np.arange(30, dtype=np.int64).reshape(5, 6)
    tdb.from_numpy(uri, data)
    A = tdb.open(uri, spark=spark)
    assert A.shape == (5, 6)
    assert_array_equal(A[:], data)
    assert_array_equal(A[1:4, 2:5], data[1:4, 2:5])
    assert_array_equal(A[2], data[2])  # scalar first dim


def test_step_slices(uri, spark):
    data = np.arange(24, dtype=np.int64)
    tdb.from_numpy(uri, data)
    A = tdb.open(uri, spark=spark)
    assert_array_equal(A[::3], data[::3])
    assert_array_equal(A[1:20:4], data[1:20:4])


def test_negative_indexing(uri, spark):
    data = np.arange(10, dtype=np.int64)
    tdb.from_numpy(uri, data)
    A = tdb.open(uri, spark=spark)
    assert_array_equal(A[-3:], data[-3:])


def test_fill_values_unwritten(uri, spark):
    """Unwritten dense cells materialize the fill value (attribute.py:87-104)."""
    dom = tdb.Domain(tdb.Dim(name="i", domain=(0, 9), tile=10, dtype=np.int64))
    schema = tdb.ArraySchema(domain=dom,
                             attrs=[tdb.Attr(name="x", dtype=np.float64),
                                    tdb.Attr(name="n", dtype=np.int32)])
    tdb.Array.create(uri, schema)
    with tdb.open(uri, "w", spark=spark) as A:
        A[2:5] = {"x": np.array([1.0, 2.0, 3.0]), "n": np.array([1, 2, 3], dtype=np.int32)}
    A = tdb.open(uri, spark=spark)
    res = A[:]
    expected_x = np.full(10, np.nan)
    expected_x[2:5] = [1.0, 2.0, 3.0]
    assert_array_equal(np.isnan(res["x"]), np.isnan(expected_x))
    assert_array_equal(res["x"][2:5], expected_x[2:5])
    assert res["n"][0] == np.iinfo(np.int32).min  # int fill


def test_dense_qc_fill_semantics(uri, spark):
    """QC on dense keeps shape; non-matching cells -> fill (P11)."""
    data = np.arange(10, dtype=np.float64)
    tdb.from_numpy(uri, data)
    A = tdb.open(uri, spark=spark)
    res = A.subarray(slice(0, 10), cond="__attr > 5.0")
    assert res.shape == (10,)
    assert np.isnan(res[:6]).all()
    assert_array_equal(res[6:], data[6:])


def test_scalar_broadcast_write(uri, spark):
    dom = tdb.Domain(tdb.Dim(name="i", domain=(0, 4), tile=5, dtype=np.int64))
    schema = tdb.ArraySchema(domain=dom, attrs=[tdb.Attr(name="v", dtype=np.int64)])
    tdb.Array.create(uri, schema)
    with tdb.open(uri, "w", spark=spark) as A:
        A[:] = 7
    assert_array_equal(tdb.open(uri, spark=spark)[:], np.full(5, 7))


def test_from_numpy_append(uri, spark):
    tdb.from_numpy(uri, np.arange(5, dtype=np.int64))
    tdb.from_numpy(uri, np.arange(5, 8, dtype=np.int64), mode="append")
    A = tdb.open(uri, spark=spark)
    assert_array_equal(A[:], np.arange(8))


def test_multi_attr_dense(uri, spark):
    dom = tdb.Domain(tdb.Dim(name="i", domain=(0, 3), tile=4, dtype=np.int64))
    schema = tdb.ArraySchema(domain=dom,
                             attrs=[tdb.Attr(name="a", dtype=np.int64),
                                    tdb.Attr(name="b", dtype=np.str_)])
    tdb.Array.create(uri, schema)
    with tdb.open(uri, "w", spark=spark) as A:
        A[:] = {"a": np.arange(4), "b": np.array(["w", "x", "y", "z"])}
    res = tdb.open(uri, spark=spark)[:]
    assert_array_equal(res["a"], np.arange(4))
    assert res["b"].tolist() == ["w", "x", "y", "z"]


def test_2d_overwrite_region(uri, spark):
    data = np.zeros((4, 4), dtype=np.int64)
    tdb.from_numpy(uri, data)
    with tdb.open(uri, "w", spark=spark) as A:
        A[1:3, 1:3] = np.array([[1, 2], [3, 4]])
    expected = data.copy()
    expected[1:3, 1:3] = [[1, 2], [3, 4]]
    assert_array_equal(tdb.open(uri, spark=spark)[:], expected)
