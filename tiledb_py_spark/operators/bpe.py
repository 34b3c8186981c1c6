"""Distributed BPE vocabulary induction + subword tokenization.

Classic byte-pair encoding (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): start from a character
vocabulary, repeatedly merge the most frequent adjacent symbol pair.

The scale split is the standard one and it matters at 100 TB:

- The CORPUS-sized work is exactly one aggregation — the word-frequency
  table (``word_frequencies``: explode tokens, groupBy, map-side
  combine; the result is VOCABULARY-sized, ~1M rows for any web corpus
  regardless of corpus bytes).
- The merge ITERATIONS run on that vocabulary-sized summary on the
  driver (pure Python over (word, count) pairs — the formulation every
  reference implementation uses, because pair counts per iteration
  derive from the word table alone).  No per-iteration corpus scan.
- ENCODING with the learned merges goes back to scale as an
  Arrow-batched pandas UDF (``bpe_encode`` / ``bpe_token_count``):
  applying a fixed merge-rank table is row-local.

``bpe_pair_counts`` exposes the first iteration's adjacent-pair counts
as a DataFrame — the one piece of the trainer that is SQL-expressible,
so the correctness gate can hash-verify the corpus-scale machinery
against DuckDB while the full iterative trainer is checked against a
reference implementation.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_frequencies(df: DataFrame, text_col: str,
                     tokens_col: Optional[Column] = None,
                     lowercase: bool = True) -> DataFrame:
    """(word, count) over the corpus — the single corpus-sized
    aggregation of BPE training.  One hash shuffle with map-side
    partial combine; output is vocabulary-sized."""
    from .text import whitespace_tokens

    toks = tokens_col if tokens_col is not None \
        else whitespace_tokens(text_col)
    w = F.explode(toks).alias("word")
    out = df.select(w)
    if lowercase:
        out = out.select(F.lower("word").alias("word"))
    return out.groupBy("word").agg(F.count("*").alias("count"))


def bpe_pair_counts(words: DataFrame, word_col: str = "word",
                    count_col: str = "count",
                    end_of_word: str = END_OF_WORD) -> DataFrame:
    """Initial adjacent-pair counts over the character vocabulary:
    each word contributes ``count`` occurrences of every adjacent
    (char, char-or-end-marker) pair.  Row-local explode over the tiny
    word table + one aggregation — this is iteration 0 of the trainer,
    exposed because SQL can state it exactly (the oracle's handle on
    the corpus-scale machinery).

    Pairs are (left, right) with the end-of-word marker appended to the
    final character, matching the trainer's symbol initialization."""
    chars = F.split(F.col(word_col), "")
    n = F.size(chars)
    pairs = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            F.element_at(chars, i).alias("left"),
            F.when(i == n - 1,
                   F.concat(F.element_at(chars, i + 1), F.lit(end_of_word)))
             .otherwise(F.element_at(chars, i + 1)).alias("right")))
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    return (words
            .select(F.col(count_col).alias("__c"), F.explode(pairs).alias("p"))
            .groupBy(F.col("p.left").alias("left"),
                     F.col("p.right").alias("right"))
            .agg(F.sum("__c").cast("long").alias("pair_count")))


def _merge_word(symbols: Tuple[str, ...], pair: Tuple[str, str]
                ) -> Tuple[str, ...]:
    out: List[str] = []
    i, L = 0, len(symbols)
    a, b = pair
    while i < L:
        if i < L - 1 and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 100,
              min_freq: int = 2, end_of_word: str = END_OF_WORD,
              tokens_col: Optional[Column] = None,
              lowercase: bool = True,
              max_vocab_rows: int = 2_000_000
              ) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    ordered merge list [(left, right), ...].

    Deterministic: ties on pair count break lexicographically on
    (left, right) — stated so any engine replays the identical merges.
    Stops early when the best remaining pair falls below ``min_freq``.

    ``max_vocab_rows`` guards the driver collect: the word-frequency
    table is vocabulary-sized by nature, but a caller pointing this at
    a non-tokenized column could blow it up — refuse loudly rather than
    OOM the driver (same pattern as the LWW read-amplification guard)."""
    wf = word_frequencies(df, text_col, tokens_col=tokens_col,
                          lowercase=lowercase)
    # ONE corpus-sized job: the limit probe both enforces the guard and
    # fetches the rows with bounded driver memory (a count() + collect()
    # pair would run the full aggregation twice)
    rows = wf.limit(max_vocab_rows + 1).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"bpe_train: word-frequency table exceeds "
            f"max_vocab_rows={max_vocab_rows}; is {text_col!r} tokenized "
            "text? Raise max_vocab_rows to override.")
    # driver-side merge loop over the vocabulary-sized summary
    from collections import Counter

    words = {}
    for r in rows:
        w = r["word"]
        if not w:
            continue
        syms = tuple(list(w[:-1]) + [w[-1] + end_of_word])
        words[syms] = words.get(syms, 0) + r["count"]
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count, lexicographic tiebreak — the stated determinism
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        pair = best[0]
        merges.append(pair)
        words = {_merge_word(s, pair): c for s, c in words.items()}
    return merges


def bpe_encode_udf(merges: Sequence[Tuple[str, str]],
                   end_of_word: str = END_OF_WORD,
                   lowercase: bool = True):
    """Arrow-batched subword tokenizer from a learned merge list:
    returns a pandas UDF string -> array<string> applying the merges in
    rank order per whitespace word (the standard BPE encode with a
    rank dict).  The merge table rides the UDF closure — broadcast
    once, row-local forever."""
    from pyspark.sql.functions import pandas_udf

    merges = [tuple(p) for p in merges]
    ranks = {p: i for i, p in enumerate(merges)}

    def encode_word(word: str) -> Tuple[str, ...]:
        syms: Tuple[str, ...] = tuple(list(word[:-1])
                                      + [word[-1] + end_of_word])
        while len(syms) > 1:
            cand = [(ranks[(syms[i], syms[i + 1])], i)
                    for i in range(len(syms) - 1)
                    if (syms[i], syms[i + 1]) in ranks]
            if not cand:
                break
            rank, _ = min(cand)
            syms = _merge_word(syms, merges[rank])
        return syms

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        # word -> tokens memo: Zipfian text re-encodes the same types
        # constantly; caching cuts UDF CPU by ~the token/type ratio
        memo: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            if lowercase:
                t = t.lower()
            toks: List[str] = []
            for w in t.split():
                cached = memo.get(w)
                if cached is None:
                    cached = memo[w] = encode_word(w)
                toks.extend(cached)
            out.append(toks)
        return pd.Series(out)

    return enc


def bpe_token_count(df: DataFrame, text_col: str,
                    merges: Sequence[Tuple[str, str]],
                    out_col: str = "n_tokens_bpe_learned",
                    end_of_word: str = END_OF_WORD,
                    lowercase: bool = True) -> DataFrame:
    """Token counts under the LEARNED tokenizer (the budget metric a
    training pipeline actually bills by, vs the regex approximation in
    ``text.bpe_ish_token_count``).  ``end_of_word`` / ``lowercase`` must
    match the parameters the merges were TRAINED with (``bpe_train``) —
    counts are silently wrong under a mismatched normalization."""
    enc = bpe_encode_udf(merges, end_of_word=end_of_word,
                         lowercase=lowercase)
    return df.withColumn(out_col,
                         F.size(enc(F.col(text_col))).cast("long"))
