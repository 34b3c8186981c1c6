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


# -- read/write_direct (S13, reference dense_array.py:633-777) --------------

def _direct_arr(uri, domain_hi=(19,), dtype=np.int64, cell_order="row-major",
                tile_order="row-major", nattr=1):
    dims = [tdb.Dim(name=f"d{i}", domain=(0, hi), tile=hi + 1,
                    dtype=np.int64) for i, hi in enumerate(domain_hi)]
    attrs = [tdb.Attr(name=f"a{i}", dtype=dtype, fill=-1)
             for i in range(nattr)]
    schema = tdb.ArraySchema(domain=tdb.Domain(*dims), attrs=attrs,
                             cell_order=cell_order, tile_order=tile_order)
    tdb.Array.create(uri, schema)
    return schema


def test_write_direct_ingest_and_read_direct(uri, spark):
    _direct_arr(uri, (9,))
    data = np.arange(10, dtype=np.int64)
    with tdb.open(uri, "w", spark=spark) as A:
        A.write_direct(data)
    A = tdb.open(uri, spark=spark)
    assert_array_equal(A.read_direct(), data)
    assert_array_equal(A.read_direct("a0"), data)


def test_write_direct_append_1d(uri, spark):
    """Append mode: new fragment lands at nonempty_domain+1 along the
    dim; read-back sees the concatenation (reference dense_array.py:
    672-705)."""
    _direct_arr(uri, (19,))
    with tdb.open(uri, "w", spark=spark) as A:
        A.write_direct(np.arange(5, dtype=np.int64))
        A.write_direct(np.arange(5, 12, dtype=np.int64), append_dim=0,
                       mode="append")
    A = tdb.open(uri, spark=spark)
    assert A.nonempty_domain() == ((0, 11),)
    assert_array_equal(A[0:12], np.arange(12, dtype=np.int64))
    # each write is its own fragment
    assert len(A._manifest.live_fragments()) == 2


def test_write_direct_append_2d_shape_checks(uri, spark):
    _direct_arr(uri, (9, 9))
    base = np.arange(12, dtype=np.int64).reshape(4, 3)
    with tdb.open(uri, "w", spark=spark) as A:
        A.write_direct(base)
        # append along dim 1: other dim extent must match (4)
        A.write_direct(np.full((4, 2), 99, dtype=np.int64),
                       append_dim=1, mode="append")
        with pytest.raises(ValueError, match="same shape as the"):
            A.write_direct(np.full((3, 2), 7, dtype=np.int64),
                           append_dim=1, mode="append")
        with pytest.raises(IndexError, match="append_dim"):
            A.write_direct(np.full((4, 2), 7, dtype=np.int64),
                           append_dim=2, mode="append")
    A = tdb.open(uri, spark=spark)
    got = A[0:4, 0:5]
    want = np.concatenate([base, np.full((4, 2), 99)], axis=1)
    assert_array_equal(got, want)


def test_write_direct_append_start_idx(uri, spark):
    """Explicit start_idx overrides the nonempty-domain placement."""
    _direct_arr(uri, (19,))
    with tdb.open(uri, "w", spark=spark) as A:
        A.write_direct(np.arange(3, dtype=np.int64))
        A.write_direct(np.array([7, 8], dtype=np.int64), append_dim=0,
                       mode="append", start_idx=10)
    A = tdb.open(uri, spark=spark)
    got = A[0:12]
    assert_array_equal(got[:3], [0, 1, 2])
    assert_array_equal(got[10:12], [7, 8])
    assert (got[3:10] == -1).all()          # fill between the fragments


def test_write_direct_guards(uri, spark):
    _direct_arr(uri, (9,), nattr=2)
    with tdb.open(uri, "w", spark=spark) as A:
        with pytest.raises(ValueError, match="multi-attribute"):
            A.write_direct(np.arange(10, dtype=np.int64))
    A = tdb.open(uri, spark=spark)
    with pytest.raises(tdb.TileDBError, match="not opened for writing"):
        A.write_direct(np.arange(10, dtype=np.int64))
    with pytest.raises(ValueError, match="ambiguous"):
        A.read_direct()


def test_write_direct_domain_bounds(uri, spark):
    _direct_arr(uri, (9,))
    with tdb.open(uri, "w", spark=spark) as A:
        A.write_direct(np.arange(8, dtype=np.int64))
        with pytest.raises(tdb.TileDBError, match="exceeds domain"):
            A.write_direct(np.arange(5, dtype=np.int64), append_dim=0,
                           mode="append")


def test_write_direct_noncontiguous_refused(uri, spark):
    _direct_arr(uri, (9,))
    strided = np.arange(20, dtype=np.int64)[::2]
    assert not strided.flags.c_contiguous
    with tdb.open(uri, "w", spark=spark) as A:
        with pytest.raises(ValueError, match="contiguous"):
            A.write_direct(strided)


def test_read_direct_col_major_forder(uri, spark):
    _direct_arr(uri, (3, 4), cell_order="col-major", tile_order="col-major")
    data = np.arange(20, dtype=np.int64).reshape(4, 5)
    with tdb.open(uri, "w", spark=spark) as A:
        A.write_direct(data)
    out = tdb.open(uri, spark=spark).read_direct()
    assert out.flags.f_contiguous
    assert_array_equal(out, data)
