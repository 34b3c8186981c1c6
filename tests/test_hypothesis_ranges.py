"""Property-based range-semantics tests (mirrors the reference's
``test_multi_index-hp.py`` ranged_slices strategy): inclusive multi_index
bounds, half-open dense slices, point lists — numpy/pandas oracle.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from numpy.testing import assert_array_equal

import tiledb_py_spark as tdb

N = 60
COORDS = np.arange(0, 3 * N, 3, dtype=np.int64)  # sparse coords 0,3,...
VALS = COORDS * 1.5


@pytest.fixture(scope="module")
def sparse_uri(tmp_path_factory, spark):
    uri = str(tmp_path_factory.mktemp("hp") / "sparse")
    dom = tdb.Domain(tdb.Dim(name="k", domain=(0, 3 * N), tile=64, dtype=np.int64))
    schema = tdb.ArraySchema(domain=dom,
                             attrs=[tdb.Attr(name="v", dtype=np.float64)],
                             sparse=True)
    tdb.Array.create(uri, schema)
    with tdb.open(uri, "w", spark=spark) as A:
        A[COORDS] = VALS
    return uri


@pytest.fixture(scope="module")
def dense_uri(tmp_path_factory, spark):
    uri = str(tmp_path_factory.mktemp("hp") / "dense")
    tdb.from_numpy(uri, VALS)
    return uri


bounds = st.integers(min_value=-5, max_value=3 * N + 5)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lo=bounds, hi=bounds)
def test_multi_index_inclusive_property(sparse_uri, spark, lo, hi):
    """multi_index[lo:hi] == coords in [lo, hi] (inclusive both ends)."""
    if hi < lo:
        return
    A = tdb.open(sparse_uri, spark=spark)
    res = A.multi_index[lo:hi]
    got = np.sort(res["k"])
    want = COORDS[(COORDS >= lo) & (COORDS <= hi)]
    assert_array_equal(got, want)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(points=st.lists(st.integers(min_value=0, max_value=3 * N), min_size=1,
                       max_size=8, unique=True))
def test_multi_index_points_property(sparse_uri, spark, points):
    A = tdb.open(sparse_uri, spark=spark)
    res = A.multi_index[sorted(points)]
    want = COORDS[np.isin(COORDS, points)]
    assert_array_equal(np.sort(res["k"]), want)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lo=st.integers(min_value=0, max_value=N),
       hi=st.integers(min_value=0, max_value=N),
       step=st.integers(min_value=1, max_value=5))
def test_dense_halfopen_steps_property(dense_uri, spark, lo, hi, step):
    """Dense A[lo:hi:step] == numpy slicing exactly."""
    A = tdb.open(dense_uri, spark=spark)
    got = A[lo:hi:step]
    assert_array_equal(got, VALS[lo:hi:step])
