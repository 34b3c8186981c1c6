"""Corpus retrieval / relevance operators: BM25 search and TF-IDF
keyword extraction over the same inverted-index shapes the dedup module
uses (explode postings, aggregate, join back — hash-keyed shuffles,
never raw text).

At 100 TB the load-bearing choices are: (1) the query-term filter is
applied AT THE EXPLODE, so the postings relation is query-sized, not
corpus-sized; (2) per-document lengths are a row-local ``size()`` —
no token shuffle; (3) corpus-level scalars (N, avgdl) ride one
broadcast row; (4) document frequencies derive from the already-tiny
term postings.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str, tokens_col: Optional[Column]) -> Column:
    if tokens_col is not None:
        return tokens_col
    from .text import _tokens_lower

    return _tokens_lower(F.col(text_col))


def bm25_scores(df: DataFrame, text_col: str, id_col: str,
                query_terms: Sequence[str],
                k1: float = 1.2, b: float = 0.75,
                tokens_col: Optional[Column] = None) -> DataFrame:
    """BM25 relevance of every document for a bag of query terms
    (Robertson/Sparck Jones probabilistic weighting, the Lucene/Elastic
    default):

        score(d) = sum over query terms t of
            ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
            * tf_td * (k1 + 1) / (tf_td + k1 * (1 - b + b * len_d / avgdl))

    Returns (id_col, score) for documents matching at least one term.

    Scale shape: the explode filters to ``query_terms`` immediately, so
    the postings shuffle carries only matching (id, term, len, tf)
    rows — the doc length is a row-local ``size(tokens)`` riding the
    posting (a separate length table would cost another corpus scan
    plus an id join); (N, avgdl) is one broadcast row from the only
    other corpus pass; df_t comes from the term postings themselves.
    Everything downstream of the scans is query-sized."""
    terms = sorted(set(t.lower() for t in query_terms))
    toks = _tokens(text_col, tokens_col)
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__toks"))
    stats = (base.select(F.size("__toks").alias("__l"))
                 .agg(F.count("*").alias("__N"),
                      F.avg("__l").alias("__avgdl")))
    term_arr = F.array(*[F.lit(t) for t in terms])
    # the doc length rides the posting rows (row-local size() in the
    # same projection) — a separate lens table costs one more corpus
    # scan AND a join back on the id
    tf = (base
          .select("__id", F.size("__toks").alias("__len"),
                  F.explode(F.filter(
                      "__toks",
                      lambda t: F.array_contains(term_arr, t))).alias("__t"))
          .groupBy("__id", "__t")
          .agg(F.count("*").alias("__tf"), F.first("__len").alias("__len")))
    dfreq = tf.groupBy("__t").agg(F.count("*").alias("__df"))
    scored = (tf
              .join(F.broadcast(dfreq), on="__t")
              .crossJoin(F.broadcast(stats))
              .withColumn("__idf", F.log(
                  1.0 + (F.col("__N") - F.col("__df") + 0.5)
                  / (F.col("__df") + 0.5)))
              .withColumn("__s", F.col("__idf") * F.col("__tf") * (k1 + 1)
                          / (F.col("__tf") + k1 * (1 - b + b * F.col("__len")
                                                   / F.col("__avgdl")))))
    return (scored.groupBy("__id").agg(F.sum("__s").alias("score"))
            .withColumnRenamed("__id", id_col))


def bm25_topk(df: DataFrame, text_col: str, id_col: str,
              query_terms: Sequence[str], k: int = 10,
              **kwargs) -> DataFrame:
    """Top-k BM25 documents — TakeOrdered (per-partition heads + driver
    merge, no global sort)."""
    s = bm25_scores(df, text_col, id_col, query_terms, **kwargs)
    return s.orderBy(F.desc("score"), id_col).limit(k)


def tfidf_top_terms(df: DataFrame, text_col: str, id_col: str,
                    k: int = 5,
                    tokens_col: Optional[Column] = None,
                    broadcast_dfreq: bool = True) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF:
    ``tf_td * ln(N / df_t)``, ranked per doc by (rounded score desc,
    term asc) — the rounding (6 dp) makes the ranking stable across
    engines whose ``ln`` differ in the last ulp.

    Returns (id_col, term, tf, tfidf, rank).  Scale shape: one postings
    pass collapsed to (id, term, tf) with map-side combine; document
    frequency joined back on the term; the per-doc top-k is one window
    over the (id)-keyed shuffle."""
    toks = _tokens(text_col, tokens_col)
    g = (df.select(F.col(id_col).alias("__id"), F.explode(toks).alias("__t"))
           .groupBy("__id", "__t").agg(F.count("*").alias("__tf")))
    dfreq = g.groupBy("__t").agg(F.count("*").alias("__df"))
    nrow = (df.select(F.col(id_col).alias("__id"))
              .agg(F.count_distinct("__id").cast("double").alias("__N")))
    # dfreq is vocabulary-sized (typically ~1M rows) — broadcast it
    # rather than shuffling the (id, term, tf) table against it.
    # UNLIKE bm25's query-restricted table this is the FULL distinct
    # token set; on heavy-tailed corpora (urls/typos/numbers pushing
    # it past the broadcast limits) pass broadcast_dfreq=False and let
    # AQE pick the join
    freq_side = F.broadcast(dfreq) if broadcast_dfreq else dfreq
    scored = (g.join(freq_side, on="__t")
                .crossJoin(F.broadcast(nrow))
                .withColumn("__tfidf", F.round(
                    F.col("__tf") * F.log(F.col("__N") / F.col("__df")),
                    6)))
    w = Window.partitionBy("__id").orderBy(F.desc("__tfidf"), F.asc("__t"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(F.col("__id").alias(id_col),
                          F.col("__t").alias("term"),
                          F.col("__tf").cast("long").alias("tf"),
                          F.col("__tfidf").alias("tfidf"),
                          F.col("rank").cast("long").alias("rank")))
