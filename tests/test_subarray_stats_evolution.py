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


# ---------------------------------------------------------------------------
# CurrentDomain / NDRectangle (reference current_domain.py, ndrectangle.py,
# tests/test_current_domain.py)
# ---------------------------------------------------------------------------

def test_ndrectangle_roundtrip():
    dom = tdb.Domain(tdb.Dim(name="x", domain=(0, 100), tile=10, dtype=np.int64),
                     tdb.Dim(name="y", domain=(0, 100), tile=10, dtype=np.int64))
    rect = tdb.NDRectangle(None, dom)
    rect.set_range(0, 10, 20)
    rect.set_range("y", 30, 40)
    assert rect.range(0) == (10, 20)
    assert rect.range("x") == (10, 20)
    assert rect.range(1) == (30, 40)
    cd = tdb.CurrentDomain()
    assert cd.is_empty
    cd.set_ndrectangle(rect)
    assert not cd.is_empty
    assert cd.type == "NDRECTANGLE"
    assert cd.ndrectangle.range("y") == (30, 40)


def test_current_domain_dense_read_clamp(uri, spark):
    """Reference sc61914 dense behavior: A[:] clamps to the current-domain
    box; explicit selections outside it raise."""
    data = np.arange(10000, dtype=np.int64).reshape(100, 100)
    tdb.from_numpy(uri, data)
    A = tdb.open(uri, spark=spark)
    dom = A.schema.domain
    rect = tdb.NDRectangle(None, dom)
    rect.set_range(0, 10, 20)
    rect.set_range(1, 30, 35)
    cd = tdb.CurrentDomain()
    cd.set_ndrectangle(rect)
    A.schema.set_current_domain(cd)

    from numpy.testing import assert_array_equal as aeq
    full = next(iter(A[:, :].values())) if isinstance(A[:, :], dict) else A[:, :]
    aeq(full, data[10:21, 30:36])
    sub = A[11:14, 33:35]
    sub = next(iter(sub.values())) if isinstance(sub, dict) else sub
    aeq(sub, data[11:14, 33:35])
    # one-sided slices clamp to the box
    one = A[11:, :35]
    one = next(iter(one.values())) if isinstance(one, dict) else one
    aeq(one, data[11:21, 30:35])
    with pytest.raises(Exception):
        A[11:55, 33:34]


def test_current_domain_sparse_multi_index_clamp(uri, spark):
    pdf = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                        "v": np.arange(100) * 1.0})
    tdb.from_pandas(uri, pdf, index_dims=["k"])
    A = tdb.open(uri, spark=spark)
    rect = tdb.NDRectangle(None, A.schema.domain)
    rect.set_range("k", 10, 20)
    cd = tdb.CurrentDomain()
    cd.set_ndrectangle(rect)
    A.schema.set_current_domain(cd)
    res = A.multi_index[:]
    assert sorted(res["k"].tolist()) == list(range(10, 21))
    res = A.multi_index[12:15]
    assert sorted(res["k"].tolist()) == [12, 13, 14, 15]
    with pytest.raises(Exception):
        A.multi_index[12:55]


def test_current_domain_float_dim_rejects_excess_stop(uri, spark):
    """Float dims have INCLUSIVE stops, so any explicit stop beyond the
    current-domain bound must raise — the integer-style stop-1 check
    would let stops in (ub, ub+1] silently clamp instead."""
    pdf = pd.DataFrame({"x": np.linspace(0.0, 10.0, 21),
                        "v": np.arange(21) * 1.0})
    tdb.from_pandas(uri, pdf, index_dims=["x"])
    A = tdb.open(uri, spark=spark)
    rect = tdb.NDRectangle(None, A.schema.domain)
    rect.set_range("x", 0.0, 8.0)
    cd = tdb.CurrentDomain()
    cd.set_ndrectangle(rect)
    A.schema.set_current_domain(cd)
    res = A.multi_index[0.0:8.0]
    assert max(res["x"]) == 8.0
    with pytest.raises(Exception):
        A.multi_index[0.0:8.5]      # in (ub, ub+1]: must raise, not clamp
    with pytest.raises(Exception):
        A.multi_index[0.0:9.5]


def test_current_domain_evolve_persists(uri, spark):
    """expand_current_domain(CurrentDomain) persists in the manifest and
    shrinking is rejected (reference test_current_domain_evolve)."""
    pdf = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                        "v": np.arange(50) * 1.0})
    tdb.from_pandas(uri, pdf, index_dims=["k"])
    dom = tdb.open(uri).schema.domain
    rect = tdb.NDRectangle(None, dom)
    rect.set_range("k", 5, 30)
    cd = tdb.CurrentDomain()
    cd.set_ndrectangle(rect)
    ev = tdb.ArraySchemaEvolution()
    ev.expand_current_domain(cd)
    ev.array_evolve(uri)
    A = tdb.open(uri, spark=spark)
    assert not A.schema.current_domain.is_empty
    assert A.schema.current_domain.ndrectangle.range("k") == (5, 30)
    res = A.multi_index[:]
    assert sorted(res["k"].tolist()) == list(range(5, 31))
    # shrink rejected
    rect2 = tdb.NDRectangle(None, dom)
    rect2.set_range("k", 10, 20)
    cd2 = tdb.CurrentDomain()
    cd2.set_ndrectangle(rect2)
    ev2 = tdb.ArraySchemaEvolution()
    ev2.expand_current_domain(cd2)
    with pytest.raises(ValueError):
        ev2.array_evolve(uri)
