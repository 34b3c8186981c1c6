"""Scale-proof runner for the heaviest operator families.

``bench.py`` times the driver-gate entries, which are pinned to their
oracle-checkable parameterizations (portable md5 hashes, exact verify
paths, capped slices).  This tool times the OPERATORS on their
documented SCALE paths (xxhash, sketch/LSH variants, production
parameters) at an arbitrary generated sf dir, so the sf1 -> sf10 ratio
measures plan behavior where it matters.

Results materialize through the noop sink (``format("noop")``) so
every output column is computed — a ``count()`` would let Spark prune
the expensive rebuilt-text / signature projections and understate the
cost.

Usage:
    SPARK_GRAFT_SF_DIR=.bench_data/sf10 python tools/scale_bench.py \
        [family ...]
Prints ONE JSON line {"queries": {...}, "sf": ..., "load_1m_start": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _docs(spark, sf_dir):
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return d.filter(F.length(F.trim("text")) > 0)


def _events(spark, sf_dir):
    import __spark_entry__ as entry

    return entry._t(spark, sf_dir, "events")


def r_minhash_dedup(spark, sf_dir):
    from tiledb_py_spark.operators.dedup import minhash_dedup

    return minhash_dedup(_docs(spark, sf_dir), "text", "doc_id",
                         num_perm=64, bands=16, shingle_k=3, threshold=0.8)


def r_dedup_clusters_lsh(spark, sf_dir):
    from tiledb_py_spark.operators.dedup import (connected_components,
                                                 minhash_lsh_candidates,
                                                 verify_jaccard)

    d = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidates(d, "text", "doc_id", num_perm=64,
                                   bands=16, shingle_k=3)
    verified = verify_jaccard(d, pairs, "text", "doc_id", shingle_k=3,
                              threshold=0.8)
    return connected_components(verified)


def r_line_dedup(spark, sf_dir):
    from tiledb_py_spark.operators.dedup import remove_repeated_lines

    return remove_repeated_lines(
        _docs(spark, sf_dir).withColumn(
            "text", F.regexp_replace("text", r"((?:\S+ ){7}\S+) ", "$1\n")),
        "text", "doc_id", min_docs=2)


def r_remove_spans(spark, sf_dir):
    from tiledb_py_spark.operators.dedup import remove_repeated_spans

    return remove_repeated_spans(_docs(spark, sf_dir), "text", "doc_id",
                                 n=10, min_docs=2)


def r_winnow(spark, sf_dir):
    from tiledb_py_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir), "text", "doc_id",
                               k=5, window=4)


def r_incremental_dedup(spark, sf_dir):
    from tiledb_py_spark.operators.dedup import incremental_exact_dedup

    state = os.path.join(tempfile.mkdtemp(prefix="scale_incdedup_"), "s")
    d = _docs(spark, sf_dir)
    mid = d.agg(F.max("doc_id")).collect()[0][0] // 2
    incremental_exact_dedup(d.filter(F.col("doc_id") < mid), "text",
                            "doc_id", state).write.format("noop") \
        .mode("overwrite").save()
    return incremental_exact_dedup(d.filter(F.col("doc_id") >= mid),
                                   "text", "doc_id", state)


def r_incremental_neardup(spark, sf_dir):
    from tiledb_py_spark.operators.dedup import incremental_neardup

    state = os.path.join(tempfile.mkdtemp(prefix="scale_incnd_"), "s")
    d = _docs(spark, sf_dir)
    mid = d.agg(F.max("doc_id")).collect()[0][0] // 2
    incremental_neardup(d.filter(F.col("doc_id") < mid), "text",
                        "doc_id", state).write.format("noop") \
        .mode("overwrite").save()
    return incremental_neardup(d.filter(F.col("doc_id") >= mid), "text",
                               "doc_id", state)


def r_tfidf_terms(spark, sf_dir):
    from tiledb_py_spark.operators.retrieval import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), "text", "doc_id", k=5)


def r_source_similarity_sketch(spark, sf_dir):
    from tiledb_py_spark.operators.dedup import source_similarity

    return source_similarity(_docs(spark, sf_dir), "text", "source",
                             shingle_k=3, method="sketch", num_perm=64)


def r_contamination(spark, sf_dir):
    from tiledb_py_spark.operators.dedup import ngram_contamination_stats

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") < 500)
    corpus = d.filter(F.col("doc_id") >= 500)
    return ngram_contamination_stats(corpus, bench, "text", "doc_id", n=5)


def r_sessionize(spark, sf_dir):
    from tiledb_py_spark.streaming.events import sessionize

    return sessionize(_events(spark, sf_dir), by="user_id", ts_col="ts",
                      gap_minutes=30.0)


def r_quality_classifier(spark, sf_dir):
    from tiledb_py_spark.operators.classifier import (fit_quality_classifier,
                                                      quality_scores)

    d = _docs(spark, sf_dir).select(
        "doc_id", "text",
        F.col("text").contains("vector").cast("int").alias("y"))
    m = fit_quality_classifier(d, "text", "y", n_buckets=4096, max_iter=15,
                               tol=1e-4)
    return quality_scores(d, "text", m)


def r_ivfpq_build_search(spark, sf_dir):
    from tiledb_py_spark.operators.similarity import IVFPQIndex

    e = (spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
         .withColumn("embedding", F.col("embedding").cast("array<double>")))
    qv = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    idx = IVFPQIndex(n_cells=64, n_probe=8, m=16, n_codes=64).fit(
        e, "embedding")
    tab = idx.build(e, "embedding", "vec_id", keep_cols=["label"])
    tab.write.format("noop").mode("overwrite").save()   # build cost
    return idx.search(tab, qv, k=10, predicate=F.col("label") == 2)


def r_unigram_seed(spark, sf_dir):
    from tiledb_py_spark.operators.bpe import (unigram_seed_counts,
                                               word_frequencies)

    return unigram_seed_counts(
        word_frequencies(_docs(spark, sf_dir), "text"), max_piece_len=8)


def r_bm25(spark, sf_dir):
    from tiledb_py_spark.operators.retrieval import bm25_scores

    return bm25_scores(_docs(spark, sf_dir), "text", "doc_id",
                       ["query", "window", "spark"])


def r_dsir_weights(spark, sf_dir):
    from tiledb_py_spark.operators.pipeline import importance_weights

    d = _docs(spark, sf_dir)
    target = d.filter(F.col("lang") == "en")
    return importance_weights(d, "text", "doc_id", target, n_buckets=1024)


def r_unigram_surprisal(spark, sf_dir):
    from tiledb_py_spark.operators.text import unigram_surprisal

    return unigram_surprisal(_docs(spark, sf_dir), "text", "doc_id")


def r_bigram_surprisal(spark, sf_dir):
    from tiledb_py_spark.operators.text import ngram_surprisal

    return ngram_surprisal(_docs(spark, sf_dir), "text", "doc_id", n=2)


def r_kn_ppl(spark, sf_dir):
    from tiledb_py_spark.operators.text import kneser_ney_logprob

    return kneser_ney_logprob(_docs(spark, sf_dir), "text", "doc_id")


def r_kn3_ppl(spark, sf_dir):
    from tiledb_py_spark.operators.text import kneser_ney_trigram_logprob

    return kneser_ney_trigram_logprob(_docs(spark, sf_dir), "text",
                                      "doc_id")


def r_self_repeat(spark, sf_dir):
    from tiledb_py_spark.operators.text import remove_self_repeated_spans

    return remove_self_repeated_spans(_docs(spark, sf_dir), "text", n=8)


def r_pack_materialize(spark, sf_dir):
    from tiledb_py_spark.operators.pipeline import materialize_packs
    from tiledb_py_spark.operators.text import whitespace_tokens

    d = _docs(spark, sf_dir)
    return materialize_packs(
        d.withColumn("toks", whitespace_tokens("text")),
        "toks", ["doc_id"], max_tokens=2048, by="source", pad_token="")


def r_pack_string_ids(spark, sf_dir):
    # STRING doc ids (the common LLM-corpus key): the per-group prefix
    # sum must stay distributed via string-space bucket cuts instead of
    # the old one-task-per-group window fallback (VERDICT r12 item 3)
    from tiledb_py_spark.operators.pipeline import materialize_packs
    from tiledb_py_spark.operators.text import whitespace_tokens

    d = _docs(spark, sf_dir).withColumn(
        "doc_key", F.format_string("doc-%012d", F.col("doc_id")))
    return materialize_packs(
        d.withColumn("toks", whitespace_tokens("text")),
        "toks", ["doc_key"], max_tokens=2048, by="source", pad_token="")


def r_interval_join(spark, sf_dir):
    # per-user attribution shape: linear in sf (entities scale, per-
    # entity density constant — the keyless grid would grow pairwise)
    from tiledb_py_spark.operators.intervals import interval_join

    e = _events(spark, sf_dir)
    clicks = (e.filter(F.col("event_type") == "click")
               .select("user_id", F.col("event_id").alias("click_id"),
                       "ts"))
    iv = (e.filter(F.col("event_type") == "purchase")
           .select("user_id", F.col("event_id").alias("promo_id"),
                   F.col("ts").alias("s"))
           .withColumn("e", F.col("s") + F.expr("INTERVAL 12 HOURS")))
    return interval_join(clicks, iv, on="ts", start="s", end="e",
                         by=["user_id"], interval_cols=["promo_id"],
                         suffix="")


def r_interval_overlap(spark, sf_dir):
    from tiledb_py_spark.operators.intervals import interval_overlap_join

    e = _events(spark, sf_dir)
    pw = (e.filter(F.col("event_type") == "purchase")
           .select("user_id", F.col("event_id").alias("p_id"),
                   F.col("ts").alias("ps"))
           .withColumn("pe", F.col("ps") + F.expr("INTERVAL 60 MINUTES")))
    ew = (e.filter(F.col("event_type") == "error")
           .select("user_id", F.col("event_id").alias("e_id"),
                   F.col("ts").alias("es"))
           .withColumn("ee", F.col("es") + F.expr("INTERVAL 45 MINUTES")))
    return interval_overlap_join(pw, ew, "ps", "pe", "es", "ee",
                                 by=["user_id"], right_cols=["e_id"],
                                 suffix="")


def r_bloom_decontam(spark, sf_dir):
    from tiledb_py_spark.operators.dedup import decontaminate

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 17 == 0) \
             .select(F.col("text").alias("btext"))
    return decontaminate(d, bench, "text", "doc_id",
                         bench_text_col="btext", n=8,
                         strategy="prefilter", bloom_bits=1 << 27)


def r_ewma(spark, sf_dir):
    from tiledb_py_spark.streaming.events import ewma

    return ewma(_events(spark, sf_dir), "value", alpha=0.3)


def r_repeated_ngrams(spark, sf_dir):
    from tiledb_py_spark.operators.dedup import repeated_ngram_stats

    return repeated_ngram_stats(_docs(spark, sf_dir), "text", "doc_id",
                                n=10, min_docs=2)


def r_funnel(spark, sf_dir):
    from tiledb_py_spark.streaming.events import funnel

    return funnel(_events(spark, sf_dir),
                  ["view", "click", "purchase"], within="12 HOURS")


def r_embedding_pca(spark, sf_dir):
    from tiledb_py_spark.operators.similarity import PCAModel

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")) \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    m = PCAModel(n_components=16).fit(e, "embedding")
    return m.transform(e, "embedding").select("vec_id", "pca")


def r_wordpiece(spark, sf_dir):
    from tiledb_py_spark.operators.bpe import (wordpiece_token_count,
                                               wordpiece_train)

    d = _docs(spark, sf_dir)
    vocab = wordpiece_train(d, "text", n_merges=200, min_freq=2)
    return wordpiece_token_count(d, "text", vocab).select(
        "doc_id", "n_tokens_wordpiece")


def r_changelog(spark, sf_dir):
    # fixture array (cached per sf dir): base + overwrite + insert on
    # the part table at pinned timestamps; the timed operator is the
    # delta-sized diff, not the one-off ingest
    import tiledb_py_spark as tdb
    from tiledb_py_spark.cdc import changelog
    from tiledb_py_spark.sources.fragment_writer import (
        write_fragment_pandas, write_fragment_spark)

    key = os.path.basename(os.path.normpath(sf_dir))
    uri = os.path.join(tempfile.gettempdir(), "tdbps_scale", key,
                       "part_cdc")
    if not tdb.array_exists(uri):
        os.makedirs(os.path.dirname(uri), exist_ok=True)
        part = spark.read.parquet(os.path.join(sf_dir, "part.parquet")) \
            .select("p_partkey", "p_retailprice")
        pdf_head = part.limit(1).toPandas()
        tdb.from_pandas(uri, pdf_head, index_dims=["p_partkey"],
                        mode="schema_only")
        schema = tdb.open(uri).schema
        write_fragment_spark(uri, schema, part, timestamp=1000)
        upd = part.filter(F.col("p_partkey") % 10 == 0) \
            .withColumn("p_retailprice", F.col("p_retailprice") + 5000.0)
        write_fragment_spark(uri, schema, upd, timestamp=2000)
    return changelog(uri, 1500, 3000, spark=spark)


def r_pagerank(spark, sf_dir):
    from tiledb_py_spark.operators.graph import pagerank

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    edges = (li.select((F.col("l_partkey") % 4099).alias("src"),
                       (F.col("l_suppkey") % 4099).alias("dst"))
               .filter(F.col("src") != F.col("dst")))
    return pagerank(edges, damping=0.85, n_iter=6)


def r_heavy_hitters(spark, sf_dir):
    from tiledb_py_spark.operators.sketches import heavy_hitters
    from tiledb_py_spark.operators.text import whitespace_tokens

    d = _docs(spark, sf_dir)
    toks = F.transform(whitespace_tokens("text"), lambda t: F.lower(t))
    return heavy_hitters(d, toks, threshold_frac=0.005)


def r_zorder_write(spark, sf_dir):
    from tiledb_py_spark.operators.layout import write_zorder

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return write_zorder(li, ["l_partkey", "l_suppkey"], num_files=64,
                        bits=12)


def r_skew_join(spark, sf_dir):
    from tiledb_py_spark.operators.skew import salted_join

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    sup = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet")) \
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
    # shuffle_hash suppresses broadcast so the measured plan is the one
    # salting exists for (hot probe keys, non-broadcastable build side)
    return salted_join(li, sup, on=["l_suppkey"], n_salts=8,
                       join_hint="shuffle_hash")


def r_rolling_anomaly(spark, sf_dir):
    from tiledb_py_spark.streaming.events import rolling_anomaly

    return rolling_anomaly(_events(spark, sf_dir), window=20,
                           min_periods=5, threshold=2.0)


def r_skew_join_plain(spark, sf_dir):
    """Control for the skew artifact: the SAME shuffle-hash join
    without salting — on a hot-key dir one reducer owns the hot key's
    entire probe side (AQE's skew split does not cover shuffled hash
    joins' probe side in local mode)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    sup = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet")) \
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey") \
        .hint("shuffle_hash")
    return li.join(sup, on="l_suppkey")


def r_time_resample(spark, sf_dir):
    from tiledb_py_spark.streaming.events import time_resample

    # 30-day span, 2h grid: output ~ users x 360 buckets (mostly
    # generated gap rows) — ~5x the input rows at every sf, so the
    # sf1->sf10 ratio stays an apples-to-apples plan measurement
    return time_resample(_events(spark, sf_dir), "value",
                         interval="2 hours", fill="ffill")


def r_attribution(spark, sf_dir):
    from tiledb_py_spark.streaming.events import attribution

    return attribution(_events(spark, sf_dir), ["view", "click"],
                       "purchase", lookback="1 day")


def r_hybrid_search(spark, sf_dir):
    from tiledb_py_spark.operators.retrieval import hybrid_search

    d = _docs(spark, sf_dir)
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qv = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return hybrid_search(d, e.filter(F.col("vec_id") != 0),
                         ["query", "window", "spark"], qv,
                         k=10, candidates=50)


RUNNERS = {
    "interval_join": r_interval_join,
    "zorder_write": r_zorder_write,
    "skew_join": r_skew_join,
    "rolling_anomaly": r_rolling_anomaly,
    "time_resample": r_time_resample,
    "hybrid_search": r_hybrid_search,
    "skew_join_plain": r_skew_join_plain,
    "attribution": r_attribution,
    "heavy_hitters": r_heavy_hitters,
    "pagerank": r_pagerank,
    "interval_overlap": r_interval_overlap,
    "bloom_decontam": r_bloom_decontam,
    "funnel": r_funnel,
    "ewma": r_ewma,
    "repeated_ngrams": r_repeated_ngrams,
    "embedding_pca": r_embedding_pca,
    "wordpiece": r_wordpiece,
    "changelog": r_changelog,
    "minhash_dedup": r_minhash_dedup,
    "dedup_clusters_lsh": r_dedup_clusters_lsh,
    "line_dedup": r_line_dedup,
    "remove_spans": r_remove_spans,
    "winnow": r_winnow,
    "incremental_dedup": r_incremental_dedup,
    "incremental_neardup": r_incremental_neardup,
    "tfidf_terms": r_tfidf_terms,
    "source_similarity_sketch": r_source_similarity_sketch,
    "contamination": r_contamination,
    "sessionize": r_sessionize,
    "quality_classifier": r_quality_classifier,
    "ivfpq_build_search": r_ivfpq_build_search,
    "unigram_seed": r_unigram_seed,
    "bm25": r_bm25,
    "dsir_weights": r_dsir_weights,
    "unigram_surprisal": r_unigram_surprisal,
    "bigram_surprisal": r_bigram_surprisal,
    "kn_ppl": r_kn_ppl,
    "kn3_ppl": r_kn3_ppl,
    "self_repeat": r_self_repeat,
    "pack_materialize": r_pack_materialize,
    "pack_string_ids": r_pack_string_ids,
}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/repo/.bench_data/sf10")
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir))
                   .replace("sf", ""))
    except ValueError:
        sf = None
    argv = [a for a in sys.argv[1:] if a != "--same-jvm"]
    same_jvm = "--same-jvm" in sys.argv[1:]
    names = argv or list(RUNNERS)
    load_start = round(os.getloadavg()[0], 2)

    if len(names) > 1 and not same_jvm:
        # DEFAULT (VERDICT r8 item 6): fork a fresh process per family —
        # batched same-JVM runs measured 2-13x inflation on later
        # families (GC pressure, accumulated broadcast/codegen caches),
        # making round-over-round ratios incomparable.  Each child pays
        # its own JVM+warmup (excluded from its timing); --same-jvm
        # restores the batched mode for quick triage.
        import subprocess

        times = {}
        for name in names:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True, env=os.environ)
            line = (r.stdout.strip().splitlines() or [""])[-1]
            try:
                times.update(json.loads(line)["queries"])
            except Exception:
                times[name] = None
                print(f"  {name}: FAILED\n{r.stderr[-2000:]}",
                      file=sys.stderr)
            else:
                print(f"  {name}: {times[name]}s", file=sys.stderr)
        print(json.dumps({
            "metric": "scale_bench", "unit": "sec", "queries": times,
            "sf": sf, "mode": "fresh-process",
            "load_1m_start": load_start,
            "load_1m_end": round(os.getloadavg()[0], 2)}))
        return 0

    from tiledb_py_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM + codegen + python workers
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    _docs(spark, sf_dir).select(F.xxhash64("text")).write.format("noop") \
        .mode("overwrite").save()

    times = {}
    for name in names:
        t0 = time.perf_counter()
        df = RUNNERS[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {times[name]}s", file=sys.stderr)
    print(json.dumps({
        "metric": "scale_bench", "unit": "sec", "queries": times,
        "sf": sf, "load_1m_start": load_start,
        "load_1m_end": round(os.getloadavg()[0], 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
