"""Round-15 optimization pins.

The materialization default moved from eager localCheckpoint to
evict-then-persist (columnar cache, recomputable lineage).  The
load-bearing property is CROSS-RUN HONESTY: rebuilding the same
operator in one session must NOT serve the previous build's cached
blocks — every build recomputes from its sources.
"""

import os

import pytest
from pyspark.sql import functions as F


def _family_df(spark):
    return spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} tok{i % 5} tok{i % 7} tok{i % 3}")
         for i in range(200)],
        ["doc_id", "text"])


def test_materialize_rebuild_recomputes(spark, tmp_path):
    """A rebuild of the same materialized table must evict the previous
    build's cache entry and recompute from its sources — proven by a
    side-effecting UDF in the lineage: if the second build served the
    first build's cached blocks, the UDF would not run again."""
    from pyspark.sql.types import LongType

    from tiledb_py_spark.operators._mat import materialize

    assert os.environ.get("SPARK_GRAFT_MATERIALIZE", "persist") == "persist"
    marker_dir = str(tmp_path / "touch")
    os.makedirs(marker_dir, exist_ok=True)

    @F.udf(LongType())
    def touch(x):
        import os as _os
        import uuid as _uuid
        open(_os.path.join(marker_dir, _uuid.uuid4().hex), "w").close()
        return x

    def build():
        return materialize(
            spark.range(0, 64, 1, 2)
                 .select(touch((F.col("id") % 7)).alias("k"))
                 .groupBy("k").agg(F.count("*").alias("c")))

    d1 = build()
    assert d1.count() == 7  # materializes run 1's cache
    n1 = len(os.listdir(marker_dir))
    assert n1 >= 64

    d2 = build()  # fresh build: must have EVICTED run 1's entry
    assert d2.count() == 7
    n2 = len(os.listdir(marker_dir))
    assert n2 >= 2 * n1 - 8, \
        "rebuild adopted the previous build's computed cache"
    # within ONE build, consumers share the cache: a second action on
    # d2 must NOT recompute
    assert d2.count() == 7
    assert len(os.listdir(marker_dir)) == n2, \
        "second action on the same build recomputed instead of reusing"
    d2.unpersist(True)


def test_materialize_family_results_identical_across_modes(spark):
    """persist / ckpt / off must produce the same operator results.
    Discrete outputs (ids, counts, strings) must be exactly equal;
    floating-point aggregates are compared at 1e-12 relative — the
    materialization point changes double-summation ORDER (it did
    between ckpt and off in r14 too, measured max 4.4e-16 here), which
    the oracle gate's tolerance also absorbs."""
    from tiledb_py_spark.operators.dedup import remove_repeated_lines
    from tiledb_py_spark.operators.text import unigram_surprisal

    df = _family_df(spark)
    outs = {}
    for mode in ("persist", "ckpt", "off"):
        os.environ["SPARK_GRAFT_MATERIALIZE"] = mode
        try:
            a = sorted(
                unigram_surprisal(df, "text", "doc_id").collect())
            b = sorted(
                remove_repeated_lines(df, "text", "doc_id").collect())
            outs[mode] = (a, b)
        finally:
            os.environ.pop("SPARK_GRAFT_MATERIALIZE", None)
        spark.catalog.clearCache()
    ref_a, ref_b = outs["persist"]
    for mode in ("ckpt", "off"):
        a, b = outs[mode]
        assert b == ref_b  # line-dedup output is discrete: exact
        assert len(a) == len(ref_a)
        for x, y in zip(a, ref_a):
            assert (x.doc_id, x.n_tokens) == (y.doc_id, y.n_tokens)
            assert x.surprisal == pytest.approx(y.surprisal, rel=1e-12)


def test_sig_band_keys_string_path_matches_column_path(spark):
    """The unrolled one-parse band-key expression must equal the
    Column-API tree in values (plan equality was verified at change
    time; values are the contract)."""
    from tiledb_py_spark.operators.dedup import _sig_band_keys

    df = spark.range(5).select(
        F.array(*[F.col("id") * i for i in range(64)]).alias("__sig"))
    a = df.select(_sig_band_keys(F.col("__sig"), 64, 16).alias("k")).collect()
    b = df.select(_sig_band_keys("__sig", 64, 16).alias("k")).collect()
    assert a == b


def test_bucket_index_sql_tree_matches_hof_fold(spark):
    """The SQL-snippet (binary-IF-tree codegen) form of bucket_index
    must equal the Column (array-filter fold) form on every edge:
    nulls (contract: bucket 0), duplicate cuts, string cuts containing
    quotes/backslashes, weird column names, and the non-finite-cut
    fallback."""
    from tiledb_py_spark.operators.stats_bounds import (
        _quote_ident, bucket_index, monotonic_view, monotonic_view_sql)

    df = spark.createDataFrame(
        [(float(x),) for x in range(10)] + [(None,)], ["d"])
    fb = [1.5, 3.0, 3.0, 7.25]
    assert (df.select(bucket_index(F.col("d"), fb).alias("b")).collect()
            == df.select(bucket_index("`d`", fb).alias("b")).collect())

    sdf = spark.createDataFrame(
        [("apple",), ("bob's",), ("c\\d",), (None,), ("zz",)], ["s"])
    sb = ["b", "bob's", "c\\a"]
    assert (sdf.select(bucket_index(F.col("s"), sb).alias("b")).collect()
            == sdf.select(bucket_index(_quote_ident("s"), sb).alias("b"))
                  .collect())

    tdf = spark.sql(
        "select timestamp'2024-01-01' + make_interval(0,0,0,0,id,0,0) as ts"
        " from range(5) union all select null")
    cuts = [1.7040e15, 1.70401e15]
    assert (tdf.select(bucket_index(
                monotonic_view("ts", "timestamp"), cuts).alias("b")).collect()
            == tdf.select(bucket_index(
                monotonic_view_sql("ts", "timestamp"), cuts).alias("b"))
                  .collect())

    wdf = spark.createDataFrame([(1.0,), (0.2,)], ["we`ird col"])
    assert (wdf.select(bucket_index(
                monotonic_view_sql("we`ird col", "double"), [0.5]).alias("b"))
               .collect()
            == wdf.select(bucket_index(
                F.col("`we``ird col`").cast("double"), [0.5]).alias("b"))
                  .collect())

    nf = [float("-inf"), 2.0]
    assert (df.select(bucket_index(F.col("d"), nf).alias("b")).collect()
            == df.select(bucket_index("`d`", nf).alias("b")).collect())

    # UNSORTED cuts: the documented contract (count of cuts strictly
    # below d) is order-independent; the tree must sort internally
    un = [5.0, 1.0, 3.0]
    assert (df.select(bucket_index(F.col("d"), un).alias("b")).collect()
            == df.select(bucket_index("`d`", un).alias("b")).collect())
    uns = ["m", "a", "f"]
    assert (sdf.select(bucket_index(F.col("s"), uns).alias("b")).collect()
            == sdf.select(bucket_index(_quote_ident("s"), uns).alias("b"))
                  .collect())


def test_materialize_rejects_unknown_mode(spark):
    """A typo'd SPARK_GRAFT_MATERIALIZE opt-out must raise, not
    silently persist-and-evict."""
    from tiledb_py_spark.operators._mat import materialize

    os.environ["SPARK_GRAFT_MATERIALIZE"] = "none"
    try:
        with pytest.raises(ValueError, match="SPARK_GRAFT_MATERIALIZE"):
            materialize(spark.range(3))
    finally:
        os.environ.pop("SPARK_GRAFT_MATERIALIZE", None)


def test_bucket_index_expr_array_matches_lit_array(spark):
    """The parsed-literal bounds array must bucket identically to the
    F.lit form, including negative/scientific-notation cuts."""
    from tiledb_py_spark.operators.stats_bounds import bucket_index

    bounds = [-1.5, -2.25e-3, 0.0, 1e-05, 3.7754, 1e22]
    df = spark.range(9).select((F.col("id") * 1.7 - 3).alias("d"))
    new = df.select(bucket_index(F.col("d"), bounds).alias("b")).collect()
    old_arr = F.array(*[F.lit(float(b)) for b in bounds])
    old = df.select(
        F.size(F.filter(old_arr, lambda bd: F.col("d") > bd)).alias("b")
    ).collect()
    assert new == old
