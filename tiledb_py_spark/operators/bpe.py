"""Distributed subword-tokenizer induction: BPE, WordPiece, unigram-LM.

Classic byte-pair encoding (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): start from a character
vocabulary, repeatedly merge the most frequent adjacent symbol pair.
WordPiece (Schuster & Nakajima 2012; the BERT tokenizer): the same
merge loop scored by likelihood ``count(ab)/(count(a)count(b))`` with
``##`` continuation symbols and greedy longest-match encoding.
Unigram-LM (Kudo 2018, "Subword Regularization" — the SentencePiece
default): seed with frequent substrings, EM over all segmentations,
prune to the vocabulary budget, Viterbi encode.

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

import re as _re

# Match the Spark-side training tokenizer (Java-regex \s+, ASCII-only:
# [ \t\n\x0B\f\r]) EXACTLY in the Python encode UDFs — str.split()
# breaks on UNICODE whitespace (NBSP, thin/ideographic spaces), so a
# web-text word like 'foo\\xa0bar' would train as ONE word but encode
# as two never-seen words: silent train/inference skew.
_WS_ASCII = _re.compile(r"\s+", _re.ASCII)


def _train_ws_split(t: str) -> list:
    return [w for w in _WS_ASCII.split(t) if w]


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


def _batch_encoder(encode_word, lowercase: bool):
    """The ONE Arrow batch wrapper shared by the three learned
    tokenizers (BPE / unigram-LM / WordPiece): None passthrough,
    optional lowercase, per-batch word -> tokens memo (Zipfian text
    re-encodes the same types constantly — caching cuts UDF CPU by
    ~the token/type ratio), whitespace split via the SAME ASCII
    splitter as training.  One implementation so the
    None/normalize/split chain can never drift between encoders —
    exactly the failure mode that shipped the r12 NBSP train/encode
    skew (deferred-refactor #1, closed r13)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        memo: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            if lowercase:
                t = t.lower()
            toks: List[str] = []
            for w in _train_ws_split(t):
                cached = memo.get(w)
                if cached is None:
                    cached = memo[w] = encode_word(w)
                toks.extend(cached)
            out.append(toks)
        return pd.Series(out)

    return enc


def bpe_encode_udf(merges: Sequence[Tuple[str, str]],
                   end_of_word: str = END_OF_WORD,
                   lowercase: bool = True):
    """Arrow-batched subword tokenizer from a learned merge list:
    returns a pandas UDF string -> array<string> applying the merges in
    rank order per whitespace word (the standard BPE encode with a
    rank dict).  The merge table rides the UDF closure — broadcast
    once, row-local forever."""
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

    return _batch_encoder(encode_word, lowercase)


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


# ---------------------------------------------------------------------------
# unigram-LM (SentencePiece-style) tokenizer induction
# ---------------------------------------------------------------------------

def unigram_seed_counts(words: DataFrame, max_piece_len: int = 8,
                        word_col: str = "word",
                        count_col: str = "count") -> DataFrame:
    """Distributed seed-piece counts over the (vocabulary-sized)
    word-frequency table: every substring of length 1..max_piece_len
    of each word contributes the word's corpus count.  Row-local
    nested transform + one aggregation over the tiny word table —
    SQL-expressible, so the correctness gate can hash-verify the
    corpus-scale machinery of the unigram-LM trainer exactly the way
    ``bpe_pair_counts`` anchors ``bpe_train``."""
    n = F.length(F.col(word_col))
    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_piece_len), n - i + 1)),
            lambda le: F.col(word_col).substr(i, le))))
    return (words.filter(n >= 1)   # sequence(1, 0) would run DESCENDING
                 .select(F.col(count_col).alias("__c"),
                         F.explode(subs).alias("piece"))
                 .groupBy("piece")
                 .agg(F.sum("__c").cast("long").alias("piece_count")))


def _unigram_em(words: dict, vocab_logp: dict,
                max_piece_len: int) -> Tuple[dict, float]:
    """One E-step: forward-backward over every distinct word (weighted
    by corpus count) under the current piece log-probabilities.
    Returns (expected piece counts, total corpus log-likelihood).
    Pure driver-side Python over the vocabulary-sized word table —
    the same scale split as ``bpe_train``'s merge loop."""
    from math import exp, inf, log

    def lse(acc, x):
        if acc == -inf:
            return x
        if x == -inf:
            return acc
        m = acc if acc > x else x
        return m + log(exp(acc - m) + exp(x - m))

    counts = {p: 0.0 for p in vocab_logp}
    ll = 0.0
    for w, c in words.items():
        L = len(w)
        alpha = [-inf] * (L + 1)
        alpha[0] = 0.0
        for j in range(1, L + 1):
            a = -inf
            for i in range(max(0, j - max_piece_len), j):
                lp = vocab_logp.get(w[i:j])
                if lp is not None and alpha[i] != -inf:
                    a = lse(a, alpha[i] + lp)
            alpha[j] = a
        if alpha[L] == -inf:   # unsegmentable (chars pruned?) — skip
            continue
        beta = [-inf] * (L + 1)
        beta[L] = 0.0
        for i in range(L - 1, -1, -1):
            b = -inf
            for j in range(i + 1, min(L, i + max_piece_len) + 1):
                lp = vocab_logp.get(w[i:j])
                if lp is not None and beta[j] != -inf:
                    b = lse(b, lp + beta[j])
            beta[i] = b
        ll += c * alpha[L]
        for i in range(L):
            if alpha[i] == -inf:
                continue
            for j in range(i + 1, min(L, i + max_piece_len) + 1):
                lp = vocab_logp.get(w[i:j])
                if lp is not None and beta[j] != -inf:
                    counts[w[i:j]] += c * exp(alpha[i] + lp + beta[j]
                                              - alpha[L])
    return counts, ll


def unigram_lm_train(df: DataFrame, text_col: str, vocab_size: int = 200,
                     max_piece_len: int = 8, n_em_iters: int = 2,
                     prune_frac: float = 0.25,
                     seed_size: Optional[int] = None,
                     tokens_col: Optional[Column] = None,
                     lowercase: bool = True,
                     max_vocab_rows: int = 2_000_000
                     ) -> List[Tuple[str, float]]:
    """SentencePiece-style unigram-LM tokenizer induction (Kudo 2018,
    "Subword Regularization"): seed with frequent substrings, run EM
    (forward-backward expected counts over all segmentations of each
    word), prune low-expected-count pieces, repeat until ``vocab_size``.
    Returns ``[(piece, logprob), ...]`` sorted by piece.

    The scale split is ``bpe_train``'s: the corpus-sized work is the
    ONE word-frequency aggregation (vocabulary-sized output, guarded
    collect); seeding, EM, and pruning run driver-side on that summary
    (the formulation of every public implementation — expected counts
    derive from the word table alone).  Encoding returns to scale as
    an Arrow UDF (``unigram_encode_udf``).

    Deterministic, stated so any engine replays the identical model:
    pieces iterate in sorted order; the seed keeps all single
    characters plus the top substrings by (count desc, piece asc);
    pruning drops the lowest (expected count, piece desc) multi-char
    pieces — ties prune the lexicographically LATER piece — and never
    drops single characters, so every corpus word stays segmentable."""
    wf = word_frequencies(df, text_col, tokens_col=tokens_col,
                          lowercase=lowercase)
    rows = wf.limit(max_vocab_rows + 1).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"unigram_lm_train: word-frequency table exceeds "
            f"max_vocab_rows={max_vocab_rows}; is {text_col!r} tokenized "
            "text? Raise max_vocab_rows to override.")
    words = {}
    for r in rows:
        if r["word"]:
            words[r["word"]] = words.get(r["word"], 0) + r["count"]
    if not words:
        raise ValueError("unigram_lm_train: empty corpus")

    from collections import Counter
    from math import log

    seed: Counter = Counter()
    chars = set()
    for w, c in words.items():
        chars.update(w)
        for i in range(len(w)):
            for le in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i:i + le]] += c
    if seed_size is None:
        seed_size = max(4 * vocab_size, len(chars) + vocab_size)
    multi = sorted((p for p in seed if len(p) > 1),
                   key=lambda p: (-seed[p], p))[:max(0, seed_size - len(chars))]
    vocab = sorted(chars | set(multi))
    tot = float(sum(seed[p] for p in vocab))
    logp = {p: log(seed[p] / tot) for p in vocab}

    while True:
        for _ in range(n_em_iters):
            counts, _ = _unigram_em(words, logp, max_piece_len)
            tot = sum(counts.values())
            # smoothing floor keeps never-used pieces finite until the
            # prune step removes them deterministically
            logp = {p: log(max(counts[p], 1e-12) / tot)
                    for p in sorted(logp)}
        multi_now = [p for p in sorted(logp) if len(p) > 1]
        excess = len(logp) - vocab_size
        if excess <= 0 or not multi_now:
            break
        counts, _ = _unigram_em(words, logp, max_piece_len)
        n_drop = min(excess, max(1, int(len(multi_now) * prune_frac)))
        # lowest expected count first; count ties drop the
        # lexicographically LATER piece first (stable two-key sort)
        victims = sorted(sorted(multi_now, reverse=True),
                         key=lambda p: counts[p])[:n_drop]
        for p in victims:
            del logp[p]
    counts, _ = _unigram_em(words, logp, max_piece_len)
    tot = sum(counts.values())
    logp = {p: log(max(counts[p], 1e-12) / tot) for p in sorted(logp)}
    return sorted(logp.items())


def unigram_encode_udf(model: Sequence[Tuple[str, float]],
                       lowercase: bool = True):
    """Arrow-batched Viterbi tokenizer for a trained unigram-LM:
    string -> array<string>, best segmentation per whitespace word
    under the piece log-probabilities (ties prefer the segmentation
    found first scanning split points left-to-right, i.e. the LONGEST
    final piece).  Characters outside the vocabulary fall back to
    single-char tokens at a penalty below every real piece — encoding
    never fails.  The model rides the UDF closure: broadcast once,
    row-local forever (same contract as ``bpe_encode_udf``)."""
    from math import inf

    vocab = dict(model)
    if not vocab:
        raise ValueError("empty unigram-LM model")
    max_len = max(len(p) for p in vocab)
    unk = min(vocab.values()) - 100.0

    def encode_word(w: str) -> Tuple[str, ...]:
        L = len(w)
        best = [-inf] * (L + 1)
        back = [0] * (L + 1)
        best[0] = 0.0
        for j in range(1, L + 1):
            for i in range(max(0, j - max_len), j):
                lp = vocab.get(w[i:j])
                if lp is None and j - i == 1:
                    lp = unk   # single-char fallback for unseen chars
                if lp is not None and best[i] + lp > best[j]:
                    best[j] = best[i] + lp
                    back[j] = i
        out: List[str] = []
        j = L
        while j > 0:
            out.append(w[back[j]:j])
            j = back[j]
        return tuple(reversed(out))

    return _batch_encoder(encode_word, lowercase)


def unigram_token_count(df: DataFrame, text_col: str,
                        model: Sequence[Tuple[str, float]],
                        out_col: str = "n_tokens_unigram_lm",
                        lowercase: bool = True) -> DataFrame:
    """Token counts under the learned unigram-LM tokenizer.
    ``lowercase`` must match the training normalization (the
    ``bpe_token_count`` contract)."""
    enc = unigram_encode_udf(model, lowercase=lowercase)
    return df.withColumn(out_col,
                         F.size(enc(F.col(text_col))).cast("long"))


# ---------------------------------------------------------------------------
# WordPiece (likelihood-scored merges, ## continuation prefix)
# ---------------------------------------------------------------------------

CONT_PREFIX = "##"
UNK_TOKEN = "[UNK]"


def _wp_symbols(word: str, cont_prefix: str = CONT_PREFIX
                ) -> Tuple[str, ...]:
    return tuple(c if i == 0 else cont_prefix + c
                 for i, c in enumerate(word))


def wordpiece_pair_scores(words: DataFrame, word_col: str = "word",
                          count_col: str = "count",
                          cont_prefix: str = CONT_PREFIX) -> DataFrame:
    """WordPiece trainer iteration 0 as a DataFrame — the
    SQL-expressible piece (the ``bpe_pair_counts`` role): adjacent
    symbol pairs over the character alphabet (first char bare,
    continuations ``##``-prefixed) with the WordPiece likelihood score
    ``pair_count / (left_count * right_count)``.  Two vocabulary-sized
    aggregations + one join; the corpus never re-scans."""
    chars = F.split(F.col(word_col), "")
    n = F.size(chars)
    sym = lambda i: F.when(i == 1, F.element_at(chars, i)) \
        .otherwise(F.concat(F.lit(cont_prefix), F.element_at(chars, i)))
    pairs = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(sym(i).alias("left"),
                           sym(i + 1).alias("right")))
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    pc = (words
          .select(F.col(count_col).alias("__c"),
                  F.explode(pairs).alias("p"))
          .groupBy(F.col("p.left").alias("left"),
                   F.col("p.right").alias("right"))
          .agg(F.sum("__c").cast("long").alias("pair_count")))
    syms = F.transform(F.sequence(F.lit(1), n), lambda i: sym(i))
    sc = (words
          .select(F.col(count_col).alias("__c"),
                  F.explode(syms).alias("sym"))
          .groupBy("sym").agg(F.sum("__c").cast("long").alias("sym_count")))
    return (pc
            .join(F.broadcast(sc.withColumnRenamed("sym", "left")
                  .withColumnRenamed("sym_count", "left_count")), "left")
            .join(F.broadcast(sc.withColumnRenamed("sym", "right")
                  .withColumnRenamed("sym_count", "right_count")), "right")
            .select("left", "right", "pair_count",
                    (F.col("pair_count")
                     / (F.col("left_count") * F.col("right_count")))
                    .cast("double").alias("score")))


def wordpiece_train(df: DataFrame, text_col: str, n_merges: int = 100,
                    min_freq: int = 2, cont_prefix: str = CONT_PREFIX,
                    tokens_col: Optional[Column] = None,
                    lowercase: bool = True,
                    max_vocab_rows: int = 2_000_000) -> List[str]:
    """Learn a WordPiece vocabulary (Schuster & Nakajima 2012; the BERT
    tokenizer): like BPE, but each merge maximizes the LIKELIHOOD score
    ``count(ab) / (count(a) * count(b))`` instead of the raw pair
    count.  Returns the ordered vocabulary: every alphabet symbol seen
    in the corpus (bare first-chars, then ``##``-prefixed
    continuations, each lexicographic), then the merged pieces in
    creation order.

    Deterministic: ties break on (higher pair count, lexicographic
    (left, right)) — stated so a reference implementation replays the
    identical vocabulary.  ``min_freq`` floors the PAIR count (a
    high-score rare pair is noise).  Same scale split and
    ``max_vocab_rows`` guard as ``bpe_train``: one corpus-sized
    aggregation, driver loop over the vocabulary-sized summary."""
    wf = word_frequencies(df, text_col, tokens_col=tokens_col,
                          lowercase=lowercase)
    rows = wf.limit(max_vocab_rows + 1).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"wordpiece_train: word-frequency table exceeds "
            f"max_vocab_rows={max_vocab_rows}; is {text_col!r} tokenized "
            "text? Raise max_vocab_rows to override.")
    from collections import Counter

    words: dict = {}
    for r in rows:
        w = r["word"]
        if not w:
            continue
        syms = _wp_symbols(w, cont_prefix)
        words[syms] = words.get(syms, 0) + r["count"]

    firsts = sorted({s[0] for s in words})
    conts = sorted({c for s in words for c in s[1:]})
    vocab: List[str] = firsts + conts
    np_ = len(cont_prefix)
    for _ in range(n_merges):
        pairs: Counter = Counter()
        sym_counts: Counter = Counter()
        for syms, c in words.items():
            for i, s in enumerate(syms):
                sym_counts[s] += c
                if i < len(syms) - 1:
                    pairs[(s, syms[i + 1])] += c
        # min_freq EXCLUDES rare pairs from candidacy rather than
        # stopping at them: best is LIKELIHOOD-ordered, and rare pairs
        # systematically score highest (count 1 over two count-1 symbols
        # scores 1.0), so a bpe_train-style break-on-best would halt
        # training while frequent mergeable pairs remain
        eligible = [(p, c) for p, c in pairs.items() if c >= min_freq]
        if not eligible:
            break
        best = min(
            eligible,
            key=lambda kv: (-kv[1] / (sym_counts[kv[0][0]]
                                      * sym_counts[kv[0][1]]),
                            -kv[1], kv[0]))
        a, b = best[0]
        merged = a + (b[np_:] if b.startswith(cont_prefix) else b)
        vocab.append(merged)
        words = {_wp_merge_word(s, (a, b), merged): c
                 for s, c in words.items()}
    return vocab


def _wp_merge_word(symbols: Tuple[str, ...], pair: Tuple[str, str],
                   merged: str) -> Tuple[str, ...]:
    """Like ``_merge_word`` but the merged symbol is supplied (WordPiece
    strips the continuation prefix off the right side)."""
    out: List[str] = []
    i, L = 0, len(symbols)
    a, b = pair
    while i < L:
        if i < L - 1 and symbols[i] == a and symbols[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def wordpiece_encode_udf(vocab: Sequence[str],
                         cont_prefix: str = CONT_PREFIX,
                         unk_token: str = UNK_TOKEN,
                         lowercase: bool = True):
    """Arrow-batched WordPiece encoder: greedy longest-match-first per
    word over the learned vocabulary (the BERT inference algorithm); a
    word with no match at any position becomes one ``unk_token``.
    Memoized per batch worker — web text re-encodes the same words
    constantly."""
    vset = frozenset(vocab)

    def encode_word(w: str) -> List[str]:
        toks: List[str] = []
        i, L = 0, len(w)
        while i < L:
            j = L
            while j > i:
                piece = w[i:j] if i == 0 else cont_prefix + w[i:j]
                if piece in vset:
                    break
                j -= 1
            else:
                toks = [unk_token]
                break
            toks.append(piece)
            i = j
        return toks

    return _batch_encoder(encode_word, lowercase)


def wordpiece_token_count(df: DataFrame, text_col: str,
                          vocab: Sequence[str],
                          out_col: str = "n_tokens_wordpiece",
                          cont_prefix: str = CONT_PREFIX,
                          unk_token: str = UNK_TOKEN,
                          lowercase: bool = True) -> DataFrame:
    """Token counts under the learned WordPiece vocabulary;
    normalization parameters must match training (the
    ``bpe_token_count`` contract)."""
    enc = wordpiece_encode_udf(vocab, cont_prefix=cont_prefix,
                               unk_token=unk_token, lowercase=lowercase)
    return df.withColumn(out_col,
                         F.size(enc(F.col(text_col))).cast("long"))
