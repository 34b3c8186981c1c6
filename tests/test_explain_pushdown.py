"""Plan-shape assertions: the scale guarantees README claims must hold in
the actual physical plan — pushed filters, pruned read schema, broadcast
joins for enum-decode-sized tables."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import tiledb_py_spark as tdb
from tiledb_py_spark.plans import DimRanges, QueryPlan


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


@pytest.fixture()
def arr(uri, spark):
    pdf = pd.DataFrame({"k": np.arange(5000, dtype=np.int64),
                        "a": np.arange(5000) * 1.0,
                        "b": np.arange(5000) * 2.0,
                        "c": [f"s{i}" for i in range(5000)]})
    tdb.from_pandas(uri, pdf, index_dims=["k"])
    return uri


def test_range_predicate_pushed_to_scan(arr, spark):
    A = tdb.open(arr, spark=spark)
    plan = QueryPlan(dim_ranges=[DimRanges(name="k", intervals=[(100, 200)])],
                     attrs=["a"], order="U")
    s = _plan(A._execute(plan))
    assert "PushedFilters" in s
    assert "GreaterThanOrEqual(k,100)" in s
    assert "LessThanOrEqual(k,200)" in s


def test_column_pruning_reaches_scan(arr, spark):
    A = tdb.open(arr, spark=spark)
    plan = QueryPlan(dim_ranges=[], attrs=["a"], order="U")
    s = _plan(A._execute(plan))
    # only k (dim) + a should be read; b and c pruned out of ReadSchema
    read_schema = [ln for ln in s.splitlines() if "ReadSchema" in ln][0]
    assert "a:double" in read_schema
    assert "b:double" not in read_schema
    assert "c:string" not in read_schema


def test_condition_pushed(arr, spark):
    A = tdb.open(arr, spark=spark)
    df = A.dataframe(cond="a > 100.0", attrs=["a"])
    s = _plan(df)
    assert "GreaterThan(a,100.0)" in s


def test_whole_stage_codegen(arr, spark):
    A = tdb.open(arr, spark=spark)
    df = A.dataframe(cond="a > 100.0 and b < 900.0")
    s = _plan(df)
    assert "codegen id" in s  # filter runs in whole-stage generated code


def test_dense_fill_join_broadcasts_small_cells(uri, spark):
    """The dense fill join (generated grid ⟕ written cells) must not
    single-task: the grid is a distributed spark.range, and the written
    cells side joins without an exchange of the grid when broadcastable."""
    dom = tdb.Domain(tdb.Dim(name="k", domain=(0, 999), tile=1000,
                             dtype=np.int64))
    schema = tdb.ArraySchema(domain=dom, sparse=False,
                             attrs=[tdb.Attr(name="v", dtype=np.float64,
                                             fill=-1.0)])
    tdb.Array.create(uri, schema)
    with tdb.open(uri, "w", spark=spark) as A:
        A[0:500] = {"v": np.arange(500) * 1.0}
    with tdb.open(uri, spark=spark) as A:
        df = A.dataframe()
        s = _plan(df)
        assert "Range (0, 1000" in s  # distributed grid generator
        assert df.count() == 1000
        # fill materialized for the unwritten half
        assert df.filter(F.col("v") == -1.0).count() == 500


def test_sql_view_pushes_filters_to_scan(arr, spark):
    """A spark.sql query over Array.create_view() must push its predicate
    into the fragment parquet scan — the view is the lazy dataframe()
    plan, not a materialization."""
    A = tdb.open(arr, spark=spark)
    A.create_view("arr_view_t")
    df = spark.sql(
        "SELECT k, a FROM arr_view_t WHERE k >= 100 AND k <= 200")
    s = _plan(df)
    assert "PushedFilters" in s
    assert "GreaterThanOrEqual(k,100)" in s
    assert df.count() == 101


def test_minhash_signatures_plan_has_no_exchange(spark):
    """The staged-projection minhash signature pass is the crown-jewel
    shuffle-free plan (signatures are per-row expressions): any Exchange
    appearing here is a regression that would shuffle full document text
    at 100 TB."""
    from tiledb_py_spark.operators.dedup import minhash_signatures

    df = spark.range(0, 200).select(
        F.col("id"),
        F.concat(F.lit("some words here repeated tokens "),
                 (F.col("id") % 7).cast("string")).alias("text"))
    sig = minhash_signatures(df, "text", "id", num_perm=16)
    s = _plan(sig)
    assert "Exchange" not in s
    assert sig.count() == 200


def test_simhash_signatures_plan_has_no_exchange(spark):
    """Same guarantee for the simhash signature pass: single scan,
    JVM-side higher-order functions, zero shuffles."""
    from tiledb_py_spark.operators.dedup import simhash_signatures

    df = spark.range(0, 200).select(
        F.col("id"),
        F.concat(F.lit("alpha beta gamma delta "),
                 (F.col("id") % 5).cast("string")).alias("text"))
    sig = simhash_signatures(df, "text", "id", n_bits=16)
    s = _plan(sig)
    assert "Exchange" not in s
    assert sig.count() == 200


def test_format_lww_few_overlap_read_plans_no_shuffle(uri, spark):
    """format('tiledb') few-overlap LWW: supersession is resolved inside
    each read task by a pyarrow anti-join against newer fragments'
    coordinates — the SPARK plan must stay a plain BatchScan with no
    Exchange (a shuffle here would mean LWW leaked into the engine plan)."""
    from tiledb_py_spark.sources.spark_datasource import (TileDBReader,
                                                          register)

    register(spark)
    pdf = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                        "v": np.zeros(100)})
    tdb.from_pandas(uri, pdf, index_dims=["k"])
    upd = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                        "v": np.ones(10)})
    tdb.from_pandas(uri, upd, index_dims=["k"], mode="append")

    # planning really does take the per-split anti-join route
    splits = TileDBReader(uri, None).partitions()
    assert any(s.newer for s in splits) and not any(s.group for s in splits)

    df = spark.read.format("tiledb").load(uri)
    s = _plan(df)
    assert "Exchange" not in s
    assert df.count() == 100


def test_corpus_assembly_row_local_ops_plan_no_exchange(spark):
    """hash_split / stratified_sample / scrub_text are pure row-local
    column expressions — any Exchange in their plans is a regression
    (deterministic_shuffle's sort exchange is intentional and excluded:
    that exchange IS the shuffle being requested)."""
    from tiledb_py_spark.operators.pipeline import (hash_split, scrub_text,
                                                    stratified_sample)

    df = spark.range(0, 100).select(
        F.col("id"), F.lit("en").alias("lang"),
        F.lit("text with words").alias("text"))
    for out in (
        hash_split(df, ["id"], {"train": 0.9, "test": 0.1}),
        stratified_sample(df, "lang", {"en": 0.5}, ["id"]),
        df.select("id", scrub_text("text").alias("clean")),
    ):
        s = _plan(out)
        assert "Exchange" not in s


def test_pack_sequences_offset_distributed_group_windows(spark):
    """Offset packing never serializes a group into one task: the data
    window partitions on (group, id-range bucket) — not the group key
    alone — never a global sort, and the row-path Exchange budget stays
    at one (the bucket window; totals/carry exchanges move only tiny
    per-bucket scalars)."""
    from tiledb_py_spark.operators.pipeline import pack_sequences

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("grp"), F.lit(100).alias("n"))
    # explicit bounds: sampled cuts can degenerate on 1000 synthetic
    # rows, which would take the one-task-per-group fallback
    out = pack_sequences(df, "n", ["id"], max_tokens=512, by="grp",
                         bounds=[250.0, 500.0, 750.0])
    s = _plan(out)
    import re
    assert re.search(r"windowspecdefinition\(grp#\d+L?, __grs_bkt#\d+", s), s
    assert "SinglePartition" not in s
    # formatted plans list each node twice (tree + "(n) Node" detail
    # header) — count the detail headers
    n_ex = len(re.findall(r"\(\d+\) Exchange", s))
    assert n_ex <= 3, s   # bucket window + totals + per-group carry


def test_repeated_ngrams_bounded_exchanges_no_window(spark):
    """The inverted-index formulation: pre-aggregated postings, document
    frequency folded back through a JOIN (AQE can skew-split a hot
    boilerplate gram; a window over the gram key cannot), within a fixed
    exchange budget."""
    import re

    from tiledb_py_spark.operators.dedup import repeated_ngram_stats

    df = spark.range(0, 50).select(
        F.col("id"), F.concat(F.lit("a b c d e f g h i j k l m n o p "),
                              (F.col("id") % 5).cast("string")).alias("text"))
    out = repeated_ngram_stats(df, "text", "id", n=5)
    s = _plan(out)
    assert len(re.findall(r"\(\d+\) Exchange", s)) <= 4
    assert "Window" not in s  # hot-gram skew must stay on the join path
    assert out.count() == 50


def test_chunk_documents_plan_no_exchange(spark):
    """Chunking is a narrow transform (project + generate): any Exchange
    is a regression."""
    from tiledb_py_spark.operators.pipeline import chunk_documents

    df = spark.range(0, 100).select(
        F.col("id"), F.lit("a b c d e f g h i j").alias("text"))
    out = chunk_documents(df, "text", ["id"], chunk_tokens=4, overlap=1)
    s = _plan(out)
    assert "Exchange" not in s
    assert out.count() == 300


def test_unigram_surprisal_bounded_exchanges(spark):
    """Two aggregation passes + one token join + one broadcast total:
    at most 4 data exchanges (broadcast exchanges excluded)."""
    import re

    from tiledb_py_spark.operators.text import unigram_surprisal

    df = spark.range(0, 100).select(
        F.col("id"), F.concat(F.lit("x y z w "),
                              (F.col("id") % 3).cast("string")).alias("text"))
    out = unigram_surprisal(df, "text", "id")
    s = _plan(out)
    data_exchanges = [m for m in re.findall(r"\(\d+\) (Broadcast)?Exchange", s)
                      if m != "Broadcast"]
    assert len(data_exchanges) <= 4
    assert out.count() == 100


def test_keyless_asof_avoids_global_window(spark):
    """Keyless as-of joins must not degrade to one global single-task
    window: the bucket decomposition partitions the window by time
    bucket."""
    from tiledb_py_spark.operators.asof import asof_join

    left = spark.range(0, 10_000).select(F.col("id").alias("t"))
    right = spark.range(0, 100).select((F.col("id") * 100).alias("t"),
                                       (F.col("id") * 2).alias("rv"))
    out = asof_join(left, right, on="t", num_buckets=8)
    s = _plan(out)
    # window partition spec carries the bucket column, not a constant
    assert "__asof_bkt" in s
    # and the answer equals the naive single-bucket result
    naive = asof_join(left, right, on="t", num_buckets=1)
    assert (out.orderBy("t").toPandas()["rv_right"].tolist()
            == naive.orderBy("t").toPandas()["rv_right"].tolist())


def test_contamination_bounded_exchanges_no_text_shuffle(spark):
    """Two-table inverted index: corpus postings pre-aggregate, benchmark
    collapses to a distinct gram-hash set, one join + per-doc
    re-aggregation + zero-gram re-attach — a fixed exchange budget, and
    the text column itself must never appear in an Exchange input
    (only 8-byte gram hashes and ids shuffle)."""
    import re

    from tiledb_py_spark.operators.dedup import ngram_contamination_stats

    corpus = spark.range(0, 60).select(
        F.col("id"), F.concat(F.lit("a b c d e f g h "),
                              (F.col("id") % 7).cast("string")).alias("text"))
    bench = spark.range(0, 10).select(
        F.col("id"), F.lit("a b c d e").alias("text"))
    out = ngram_contamination_stats(corpus, bench, "text", "id", n=5)
    s = _plan(out)
    assert len(re.findall(r"\(\d+\) Exchange", s)) <= 6
    assert "Window" not in s
    assert out.count() == 60


def test_semantic_dedup_single_cell_shuffle(spark):
    """Semantic dedup moves each vector across the wire exactly once:
    one Exchange on the cell id feeding the Arrow-batched per-cell scan
    (plus the driver-side fit, which is not in this plan)."""
    import re

    from tiledb_py_spark.operators.dedup import semantic_dedup
    from tiledb_py_spark.operators.similarity import IVFIndex

    rng = np.random.RandomState(3)
    df = spark.createDataFrame(
        [(i, rng.randn(4).tolist()) for i in range(300)], ["vec_id", "v"])
    idx = IVFIndex(n_cells=4, n_probe=4).fit(df, "v")
    out = semantic_dedup(df, "v", "vec_id", threshold=0.9, index=idx)
    s = _plan(out)
    data_exchanges = [m for m in re.findall(r"\(\d+\) (Broadcast)?Exchange", s)
                      if m != "Broadcast"]
    assert len(data_exchanges) == 1
    assert "FlatMapGroupsInPandas" in s or "FlatMapGroupsIn" in s
    assert out.count() > 0


def test_sample_exact_ungrouped_takes_ordered_no_global_sort(spark):
    """Ungrouped exact-n must plan as TakeOrderedAndProject (per-partition
    top-n + driver merge), never a full global Sort+Exchange."""
    from tiledb_py_spark.operators.pipeline import sample_exact

    df = spark.range(0, 100_000).select(F.col("id").alias("doc_id"))
    out = sample_exact(df, ["doc_id"], n=50)
    s = _plan(out)
    assert "TakeOrderedAndProject" in s
    assert out.count() == 50


def test_semantic_contamination_plan_no_exchange(spark):
    """The broadcast-matrix scan is shuffle-free: scan -> ArrowEvalPython,
    zero Exchanges (the benchmark matrix lives inside the UDF closure)."""
    import re

    from tiledb_py_spark.operators.dedup import semantic_contamination_stats

    rng = np.random.RandomState(2)
    corpus = spark.createDataFrame(
        [(i, rng.randn(4).tolist()) for i in range(200)], ["vec_id", "v"])
    bench = spark.createDataFrame(
        [(i, rng.randn(4).tolist()) for i in range(10)], ["vec_id", "v"])
    out = semantic_contamination_stats(corpus, bench, "v", "vec_id")
    s = _plan(out)
    assert "Exchange" not in s
    assert "ArrowEvalPython" in s
    assert out.count() == 200


def test_repetition_stats_and_clean_lines_row_local_no_exchange(spark):
    """Gopher repetition stats and C4 line cleaning are row-local array
    expressions — any Exchange is a regression (they must ride the scan
    stage untouched at 100 TB)."""
    from tiledb_py_spark.operators.text import clean_lines, repetition_stats

    df = spark.range(0, 50).select(
        F.col("id"),
        F.concat(F.lit("alpha beta gamma delta line one\nalpha beta "),
                 F.col("id").cast("string")).alias("text"))
    for out in (repetition_stats(df, "text", top_ns=(2,), dup_ns=(3,)),
                clean_lines(df, "text")):
        s = _plan(out)
        assert "Exchange" not in s


def test_line_dedup_bounded_exchanges_no_text_shuffle(spark):
    """remove_repeated_lines: postings carry only (hash, id, pos) — the
    exchange budget is fixed and no Window appears (hot boilerplate
    lines must stay on the AQE-splittable join path)."""
    import re

    from tiledb_py_spark.operators.dedup import remove_repeated_lines

    df = spark.range(0, 50).select(
        F.col("id"),
        F.concat(F.lit("shared header\nbody "),
                 F.col("id").cast("string")).alias("text"))
    out = remove_repeated_lines(df, "text", "id", min_docs=2)
    s = _plan(out)
    assert len(re.findall(r"\(\d+\) Exchange", s)) <= 5
    assert "Window" not in s


def test_dsir_weights_ratio_join_broadcast(spark):
    """The bucket log-ratio table must reach the postings via a
    BroadcastHashJoin — a sort-merge join here would shuffle the whole
    postings relation against an at-most-n_buckets-row table."""
    from tiledb_py_spark.operators.pipeline import importance_weights

    df = spark.range(0, 200).select(
        F.col("id"), F.lit("alpha beta gamma delta").alias("text"))
    tgt = df.filter(F.col("id") < 50)
    out = importance_weights(df, "text", "id", tgt, n_buckets=64)
    s = _plan(out)
    assert "BroadcastHashJoin" in s


def test_winnow_no_generator_child_clone(spark):
    """The winnowing explode must stay explode_outer: a plain explode
    lets InferFiltersFromGenerate clone the whole un-staged winnowing
    expression into a scan-pushed predicate (measured 80x slower).
    Regression: the gram-hash transform appears exactly once in the
    optimized plan and no Filter node carries an aggregate()."""
    from tiledb_py_spark.operators.dedup import winnow_fingerprints

    df = spark.range(0, 40).select(
        F.col("id"),
        F.concat(F.lit("tok a b c d e f g h i j "),
                 F.col("id").cast("string")).alias("text"))
    out = winnow_fingerprints(df, "text", "id", k=5, window=4)
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("xxhash64") == 1
    for line in opt.splitlines():
        if "Filter" in line:
            assert "aggregate(" not in line and "xxhash64" not in line
    assert out.count() > 0


def test_round6_operator_exchange_budgets(spark):
    """Exchange budgets for the round-6 retrieval/selection operators:
    bm25 and tfidf keep their frequency tables on broadcast joins;
    temperature_mix adds no shuffle beyond the explode; perplexity
    bucketing is surprisal's budget plus exactly one ungrouped window."""
    import re

    from tiledb_py_spark.operators.pipeline import temperature_mix
    from tiledb_py_spark.operators.retrieval import (bm25_scores,
                                                     tfidf_top_terms)
    from tiledb_py_spark.operators.text import perplexity_buckets

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", "alpha beta gamma delta epsilon")
         for i in range(100)], ["doc_id", "lang", "text"])

    s = _plan(bm25_scores(df, "text", "doc_id", ["alpha", "beta"]))
    assert "BroadcastHashJoin" in s and "SortMergeJoin" not in s

    s = _plan(tfidf_top_terms(df, "text", "doc_id", k=2))
    assert "SortMergeJoin" not in s

    s = _plan(temperature_mix(df, "lang", ["doc_id"], alpha=0.5))
    assert "Exchange" not in s  # pure row-local explode after the rates

    s = _plan(perplexity_buckets(df, "text", "doc_id"))
    assert len(re.findall(r"\(\d+\) Window", s)) == 1


def test_round7_operator_exchange_budgets(spark):
    """Exchange budgets for the round-7 operators: classifier scoring
    and the optimizer's loss/gradient evaluation are shuffle-free;
    IVFPQ search never shuffles (predicate + cell prune at the scan,
    ADC row-local, top-k TakeOrdered); the unigram seed expansion is
    one aggregation over the word table (its input aggregation aside)."""
    import re

    import numpy as np

    from tiledb_py_spark.operators.bpe import (unigram_seed_counts,
                                               word_frequencies)
    from tiledb_py_spark.operators.classifier import (QualityClassifier,
                                                      quality_scores,
                                                      token_buckets)
    from tiledb_py_spark.operators.similarity import IVFPQIndex

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(50)],
        ["doc_id", "text"])

    # classifier scoring: scan -> project -> ArrowEvalPython, no Exchange
    m = QualityClassifier(weights=np.zeros(64), bias=0.0, n_buckets=64)
    s = _plan(quality_scores(df, "text", m))
    assert "Exchange" not in s

    # the featurization feeding each optimizer step is also row-local
    feats = df.select(
        F.lit(1.0).alias("y"),
        F.coalesce(token_buckets("text", 64),
                   F.array().cast("array<int>")).alias("bkts"))
    assert "Exchange" not in _plan(feats)

    # IVFPQ search plan: no Exchange anywhere — cell + predicate prune
    # at the scan, ADC scores row-local, top-k is TakeOrdered
    rng = np.random.RandomState(5)
    emb = spark.createDataFrame(
        [(i, rng.randn(8).tolist(), i % 2) for i in range(64)],
        "vec_id long, embedding array<double>, label int")
    idx = IVFPQIndex(n_cells=4, n_probe=2, m=4, n_codes=8).fit(
        emb, "embedding")
    tab = idx.build(emb, "embedding", "vec_id", keep_cols=["label"])
    s = _plan(idx.search(tab, rng.randn(8).tolist(), k=5,
                         predicate=F.col("label") == 1))
    assert "Exchange" not in s
    assert "TakeOrderedAndProject" in s

    # unigram seed: exactly the word-frequency Exchange + the piece
    # aggregation Exchange — nothing else
    s = _plan(unigram_seed_counts(word_frequencies(df, "text")))
    assert len(re.findall(r"\(\d+\) Exchange", s)) == 2


def test_interval_join_grid_plan_no_nested_loop(spark):
    """The interval-join grid path must be an EQUI hash/sort-merge join
    on (by-keys, bucket) — never BroadcastNestedLoop or a cartesian —
    and only the rare-long-interval branch may nested-loop, against a
    broadcast side."""
    from tiledb_py_spark.operators.intervals import (interval_join,
                                                     interval_overlap_join)

    pts = spark.createDataFrame(
        [(i, float(i * 7 % 10_000)) for i in range(500)], ["pid", "t"])
    ivs = spark.createDataFrame(
        [(j, float(j * 97 % 10_000), float(j * 97 % 10_000 + 50))
         for j in range(50)], ["iid", "s", "e"])

    # all-short: pure grid — no nested loop, no cartesian at all
    s = _plan(interval_join(pts, ivs, on="t", start="s", end="e",
                            interval_cols=["iid"], suffix="",
                            num_buckets=16, long_span_buckets=10**9))
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s

    # hybrid: the long branch nested-loops ONLY against a broadcast
    # exchange; the grid branch stays equi
    s = _plan(interval_join(pts, ivs, on="t", start="s", end="e",
                            interval_cols=["iid"], suffix="",
                            num_buckets=16, long_span_buckets=4))
    assert "CartesianProduct" not in s
    if "BroadcastNestedLoopJoin" in s:
        assert "BroadcastExchange" in s

    # overlap grid: same contract
    rhs = spark.createDataFrame(
        [(j, float(j * 131 % 10_000), float(j * 131 % 10_000 + 40))
         for j in range(40)], ["rid", "rs", "re"])
    s = _plan(interval_overlap_join(
        ivs.withColumnRenamed("iid", "lid"), rhs,
        "s", "e", "rs", "re", right_cols=["rid"], suffix="",
        num_buckets=16, long_span_buckets=10**9))
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_kn3_no_corpus_sized_broadcast_hint(spark):
    """kneser_ney_trigram_logprob must not broadcast-HINT the corpus-
    sized tables (tri/ctx3/c2 are keyed by n-gram tuples and grow with
    corpus size); only the vocabulary-sized ctx2/c1 and the one-row
    scalar table carry hints.  With hints absent, AQE picks the join
    strategy from runtime sizes — tiny inputs may still broadcast, so
    the assertion targets the ANALYZED plan's hint nodes, not the
    physical join choice."""
    from tiledb_py_spark.operators.text import kneser_ney_trigram_logprob

    df = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        ["doc_id", "text"])
    out = kneser_ney_trigram_logprob(df, "text", "doc_id")
    analyzed = out._jdf.queryExecution().analyzed().toString()
    # exactly 3 hints: ctx2 (token-keyed context totals), c1 (token-
    # keyed continuation counts), scal (one scalar row)
    assert analyzed.count("ResolvedHint") == 3

    # with broadcast_tables=False only the scalar row keeps its hint
    out = kneser_ney_trigram_logprob(df, "text", "doc_id",
                                     broadcast_tables=False)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 1
