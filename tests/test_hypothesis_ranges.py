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


# ---------------------------------------------------------------------------
# as-of join vs pandas merge_asof (flagship custom operator)
# ---------------------------------------------------------------------------

import pandas as pd
from pyspark.sql import functions as F


asof_cfg = st.tuples(
    st.lists(st.integers(0, 500), min_size=1, max_size=40),   # left times
    st.lists(st.integers(0, 500), min_size=0, max_size=25),   # right times
    st.sampled_from(["backward", "forward"]),
    st.booleans(),                                            # strict
    st.sampled_from([1, 4]),                                  # num_buckets
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(asof_cfg)
def test_asof_join_matches_pandas(spark, cfg):
    from tiledb_py_spark.operators.asof import asof_join

    lt_raw, rt_raw, direction, strict, nb = cfg
    lt = pd.DataFrame({"t": pd.Series(sorted(set(lt_raw)), dtype="int64")})
    rt = pd.DataFrame({"t": pd.Series(sorted(set(rt_raw)), dtype="int64")})
    rt["rv"] = rt["t"] * 3 + 1
    got = (asof_join(spark.createDataFrame(lt),
                     spark.createDataFrame(rt) if len(rt) else
                     spark.createDataFrame([], "t bigint, rv bigint"),
                     on="t", direction=direction, strict=strict,
                     num_buckets=nb)
           .orderBy("t").toPandas())
    want = pd.merge_asof(
        lt, rt.rename(columns={"rv": "rv_right", "t": "t_kept"}),
        left_on="t", right_on="t_kept", direction=direction,
        allow_exact_matches=not strict)
    norm = lambda s: [None if pd.isna(v) else float(v) for v in s]
    assert norm(got["rv_right"]) == norm(want["rv_right"]), \
        (direction, strict, nb)


chunk_cfg = st.tuples(
    st.integers(0, 120),                    # token count
    st.sampled_from([(8, 2), (16, 4), (64, 16)]),  # (chunk, overlap)
)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(chunk_cfg)
def test_chunk_documents_covers_every_token(spark, cfg):
    """Invariants for any doc length: every token appears in >= 1 chunk,
    consecutive chunks overlap by exactly `overlap` (except the tail),
    and chunk ids are dense from 0."""
    from tiledb_py_spark.operators.pipeline import chunk_documents

    n_tok, (chunk, overlap) = cfg
    text = " ".join(f"w{i}" for i in range(n_tok))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = (chunk_documents(df, "text", ["doc_id"],
                            chunk_tokens=chunk, overlap=overlap)
            .orderBy("chunk_id").collect())
    assert [r.chunk_id for r in rows] == list(range(len(rows)))
    seen = []
    stride = chunk - overlap
    for r in rows:
        toks = r.chunk_text.split() if r.chunk_text else []
        assert len(toks) == r.chunk_n_tokens
        assert len(toks) <= chunk
        seen.extend(toks)
    if n_tok == 0:
        assert len(rows) == 1 and rows[0].chunk_n_tokens == 0
    else:
        assert set(seen) == {f"w{i}" for i in range(n_tok)}
        # chunk k starts at k*stride
        for k, r in enumerate(rows):
            assert r.chunk_text.split()[0] == f"w{k * stride}"


# -- S13 write_direct append: any sequence of appends mirrors numpy ---------

@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(chunks=st.lists(st.integers(min_value=1, max_value=7),
                       min_size=1, max_size=5),
       start=st.integers(min_value=0, max_value=4))
def test_write_direct_append_any_chunking(tmp_path_factory, spark,
                                          chunks, start):
    """Any ingest-then-append chunking of a 1-D vector reassembles the
    concatenation exactly: appends land at nonempty_domain+1, fill
    covers the untouched suffix, and chunk boundaries are invisible."""
    total = sum(chunks)
    dom_hi = start + total + 4
    uri = str(tmp_path_factory.mktemp("wd") / "arr")
    dom = tdb.Domain(tdb.Dim(name="i", domain=(0, dom_hi), tile=dom_hi + 1,
                             dtype=np.int64))
    schema = tdb.ArraySchema(
        domain=dom, sparse=False,
        attrs=[tdb.Attr(name="a0", dtype=np.int64, fill=-1)])
    tdb.Array.create(uri, schema)
    data = np.arange(total, dtype=np.int64) * 7 + 1
    with tdb.open(uri, "w", spark=spark) as A:
        off = 0
        for ci, c in enumerate(chunks):
            chunk = data[off:off + c]
            if ci == 0:
                A.write_direct(chunk, start_idx=start or None)
            else:
                A.write_direct(chunk, append_dim=0, mode="append")
            off += c
    A = tdb.open(uri, spark=spark)
    got = A.read_direct()
    want = np.full(dom_hi + 1, -1, dtype=np.int64)
    want[start:start + total] = data
    assert_array_equal(got, want)
    assert A.nonempty_domain() == ((start, start + total - 1),)
