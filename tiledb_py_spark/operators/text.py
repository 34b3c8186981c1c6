"""Text analysis operators for LLM training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure ``pyspark.sql.functions`` (whole-stage codegen; zero Python in
the per-row path).  The language-ID heuristic uses stopword-hit ratios
against small built-in word lists broadcast as literals — the classic
n-gram/stopword approach, good enough for corpus bucketing; a model-based
classifier would slot in as a Pandas UDF behind the same column contract.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny built-in stopword lists (top function words per language)
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "as", "his", "on", "be", "at", "by", "had", "not", "are"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von",
           "den", "im", "für", "auf", "des", "sich", "dem", "als", "auch"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "que",
           "pas", "pour", "dans", "qui", "sur", "avec", "au", "par"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "las", "del",
           "se", "por", "con", "una", "para", "es", "al", "lo"],
    "it": ["il", "di", "che", "la", "e", "un", "per", "non", "una", "del",
           "con", "si", "da", "come", "le", "nel", "alla"],
}


def _tokens_lower(col: Column) -> Column:
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\w\s]", " ")
    return F.split(F.trim(F.regexp_replace(c, r"\s+", " ")), " ")


def whitespace_tokens(col: str | Column) -> Column:
    """Canonical whitespace token array: maximal non-whitespace runs of
    the trimmed text; empty/whitespace-only text is ZERO tokens (a bare
    ``split`` would yield ``['']`` — one phantom token).  The single
    source of the rule shared by ``whitespace_token_count`` and
    ``pipeline.chunk_documents``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0,
                  F.array().cast("array<string>")) \
        .otherwise(F.split(F.trim(c), r"\s+"))


def whitespace_token_count(col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(whitespace_tokens(col))


def bpe_ish_token_count(col: str | Column) -> Column:
    """BPE-ish subword count: word chunks + digits + punctuation marks each
    count as tokens, long words count extra per 4 chars (a deterministic
    regex approximation of byte-pair tokenizers)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_count(c, F.lit(r"\w+|[^\w\s]"))
    # long words contribute ~len/4 extra subword tokens
    extra = F.aggregate(
        F.filter(F.split(c, r"\s+"), lambda w: F.length(w) > 4),
        F.lit(0),
        lambda acc, w: acc + F.floor((F.length(w) - 1) / F.lit(4)).cast("int"),
    )
    return (pieces + extra).cast("long")


def language_id(col: str | Column, tokens_col: Optional[Column] = None) -> Column:
    """Best-scoring language by stopword hit ratio; 'und' when nothing hits.

    The expression references its token array ~11 times (a hit count per
    language plus the total); pass ``tokens_col`` pointing at a STAGED
    token-array column (see ``language_id_df``) so the tokenizer runs
    once per row instead of once per reference."""
    toks = tokens_col if tokens_col is not None else \
        _tokens_lower(F.col(col) if isinstance(col, str) else col)
    n = F.greatest(F.size(toks), F.lit(1))
    best_lang, best_score = F.lit("und"), F.lit(0.0)
    for lang, words in _STOPWORDS.items():
        wl = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))
        score = hits.cast("double") / n
        cond = score > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, score).otherwise(best_score)
    return best_lang


def language_id_df(df: DataFrame, text_col: str,
                   out_col: str = "lang_pred") -> DataFrame:
    """DataFrame-level language ID with the token array staged once."""
    return (df.withColumn("__lid_toks", _tokens_lower(F.col(text_col)))
              .withColumn(out_col,
                          language_id(text_col, tokens_col=F.col("__lid_toks")))
              .drop("__lid_toks"))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Append standard quality-signal columns (Gopher/C4-style filters):
    length, token count, mean word length, punctuation ratio, stopword
    ratio, digit ratio, uppercase ratio, repetition ratio.

    The token array is STAGED in its own projection before the feature
    columns: five of them reference it, and an inline expression gets
    re-inlined per use by CollapseProject — the regex tokenizer then
    runs ~5x per row (measured ~30% total slowdown at sf1)."""
    c = F.col(text_col)
    df = df.withColumn("__q_toks", _tokens_lower(c))
    toks = F.col("__q_toks")
    n_tok = F.greatest(F.size(toks), F.lit(1))
    en = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    n_chars = F.length(c)
    safe_chars = F.greatest(n_chars, F.lit(1))
    return (df
            .withColumn("q_n_chars", n_chars.cast("long"))
            .withColumn("q_n_tokens", F.size(toks).cast("long"))
            .withColumn("q_mean_word_len",
                        F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w))
                        .cast("double") / n_tok)
            .withColumn("q_punct_ratio",
                        F.regexp_count(c, F.lit(r"[^\w\s]")).cast("double") / safe_chars)
            .withColumn("q_stopword_ratio",
                        F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
                        .cast("double") / n_tok)
            .withColumn("q_digit_ratio",
                        F.regexp_count(c, F.lit(r"[0-9]")).cast("double") / safe_chars)
            .withColumn("q_upper_ratio",
                        F.regexp_count(c, F.lit(r"[A-Z]")).cast("double") / safe_chars)
            .withColumn("q_dup_token_ratio",
                        (F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n_tok))
            .drop("__q_toks"))


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Scalar [0,1] quality score from the feature columns (simple
    interpretable linear gate, matching common heuristic filters)."""
    feat = quality_features(df, text_col)
    score = (
        F.lit(1.0)
        * F.when(F.col("q_n_tokens").between(5, 100000), 1.0).otherwise(0.2)
        * F.when(F.col("q_mean_word_len").between(2.0, 12.0), 1.0).otherwise(0.5)
        * F.when(F.col("q_punct_ratio") < 0.2, 1.0).otherwise(0.5)
        * F.when(F.col("q_dup_token_ratio") < 0.5, 1.0).otherwise(0.3)
        * (F.lit(0.5) + F.least(F.col("q_stopword_ratio") * 2, F.lit(0.5)))
    )
    return feat.withColumn("quality", F.round(score, 6))


def unigram_surprisal(df: DataFrame, text_col: str, id_col: str,
                      tokens_col: Optional[Column] = None) -> DataFrame:
    """Perplexity-proxy quality score from corpus statistics: mean
    per-token surprisal ``-ln(count(token)/total_tokens)`` under the
    corpus's own unigram distribution — the cheap stand-in for a KenLM
    quality filter (high surprisal = tokens rare in this corpus:
    gibberish, boilerplate-free noise; low = common fluent text).

    Two aggregation passes over the exploded (id, token) postings — a
    token-frequency table (hash shuffle on the token), then a join back
    and a per-doc mean (shuffle on the id).  Postings carry only an
    8-byte token HASH plus the id — the raw string never shuffles, and
    the stopword-skewed string join key becomes a uniform hash (same
    convention as the dedup module; a 64-bit collision merging two
    vocabulary entries is negligible at any realistic vocabulary size).
    The frequency table is vocabulary-sized.  Docs with no tokens are
    dropped (no distribution to score against)."""
    toks = tokens_col if tokens_col is not None else _tokens_lower(F.col(text_col))
    g = (df.select(F.col(id_col).alias("__id"), toks.alias("__toks"))
           .select("__id", F.explode("__toks").alias("__tok"))
           .select("__id", F.xxhash64("__tok").alias("__tok")))
    freq = g.groupBy("__tok").agg(F.count("*").alias("__cnt"))
    total = freq.agg(F.sum("__cnt").alias("__total"))
    return (g.join(freq, on="__tok")
             .crossJoin(F.broadcast(total))
             .groupBy("__id")
             .agg(F.avg(-F.log(F.col("__cnt") / F.col("__total")))
                  .alias("surprisal"),
                  F.count("*").cast("long").alias("n_tokens"))
             .withColumnRenamed("__id", id_col))


def fingerprint(col: str | Column) -> Column:
    """64-bit document fingerprint: xxhash64 over the normalized text —
    stable under whitespace/punctuation/case variation (rolling-hash
    style canonicalization)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^\w\s]", " "), r"\s+", " "))
    return F.xxhash64(norm)


def add_text_analysis(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-stop enrichment: language, token counts, fingerprint, quality."""
    out = language_id_df(quality_score(df, text_col), text_col)
    return (out
            .withColumn("n_tokens_ws", whitespace_token_count(text_col))
            .withColumn("n_tokens_bpe", bpe_ish_token_count(text_col))
            .withColumn("fingerprint", fingerprint(text_col)))
