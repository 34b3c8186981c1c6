"""Property-based tests for the round-6 corpus operators: invariants a
python-side reference can state for ANY generated corpus — the same
strategy the range-semantics suite uses for the indexing surface.

Each test collects one small random corpus per example and checks the
Spark answer against a from-scratch python computation (or a stated
invariant), so the operators get fuzzed beyond the fixed oracle-gate
corpora.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

word = st.sampled_from(["a", "bb", "ccc", "dd", "e", "fff", "gg"])
doc = st.lists(word, min_size=0, max_size=30).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=8)

_SETTINGS = dict(max_examples=15, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(docs=corpus)
@settings(**_SETTINGS)
def test_repetition_stats_invariants(spark, docs):
    """All fractions in [0,1]; dup-gram coverage monotone in n (a
    duplicated 5-gram contains duplicated... no — but coverage is
    bounded by 1 and 0 for docs shorter than n); arrow == expr."""
    from tiledb_py_spark.operators.text import repetition_stats

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    a = {r.doc_id: r.asDict() for r in
         repetition_stats(df, "text", top_ns=(2,), dup_ns=(3,),
                          impl="arrow").collect()}
    e = {r.doc_id: r.asDict() for r in
         repetition_stats(df, "text", top_ns=(2,), dup_ns=(3,),
                          impl="expr").collect()}
    for i, d in enumerate(docs):
        for col, v in a[i].items():
            if col.endswith("frac"):
                assert 0.0 <= v <= 1.0, (col, d)
                assert v == pytest.approx(e[i][col]), (col, d)
        toks = d.split()
        if len(toks) < 3:
            assert a[i]["r_dup3gram_char_frac"] == 0.0
        if len(set(toks)) == len(toks):  # all-unique tokens: no dup grams
            assert a[i]["r_dup3gram_char_frac"] == 0.0


@given(docs=corpus, k=st.integers(2, 4), w=st.integers(2, 4))
@settings(**_SETTINGS)
def test_winnow_matches_reference(spark, docs, k, w):
    """Winnowing equals the from-scratch reference for any corpus and
    (k, window); fingerprint density never exceeds the gram count."""
    from pyspark.sql import functions as F

    from tiledb_py_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = winnow_fingerprints(df, "text", "doc_id", k=k, window=w)
    by = {}
    for r in out.collect():
        by.setdefault(r.doc_id, []).append((r.pos, r.fp))

    # reference on the same xxhash64 values
    grams_all = []
    for d in docs:
        toks = d.split()
        grams_all.append([" ".join(toks[i:i + k])
                          for i in range(len(toks) - k + 1)])
    flat = sorted({g for gs in grams_all for g in gs})
    if flat:
        hmap = {row.g: row.h for row in spark.createDataFrame(
            [(g,) for g in flat], ["g"]).select(
                "g", F.xxhash64("g").alias("h")).collect()}
    else:
        hmap = {}
    for i, gs in enumerate(grams_all):
        hs = [hmap[g] for g in gs]
        G = len(hs)
        sels = {}
        for j in range(max(G - w + 1, 1) if G else 0):
            size = min(w, G - j)
            win = hs[j:j + size]
            m = min(win)
            pos = j + max(t for t, h in enumerate(win) if h == m)
            sels[pos + 1] = hs[pos]
        assert sorted(by.get(i, [])) == sorted(sels.items()), (docs[i], k, w)
        assert len(by.get(i, [])) <= max(G, 0)


@given(docs=corpus.filter(lambda ds: any(len(d.split()) >= 2 for d in ds)))
@settings(**_SETTINGS)
def test_bigram_surprisal_matches_reference(spark, docs):
    """Bigram surprisal equals the python MLE computation; docs without
    bigrams are absent; surprisal >= 0."""
    from collections import Counter

    from pyspark.sql import functions as F

    from tiledb_py_spark.operators.text import ngram_surprisal

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    ws = F.split(F.trim(F.col("text")), r"\s+")
    got = {r.doc_id: r for r in
           ngram_surprisal(df.filter(F.length(F.trim("text")) > 0),
                           "text", "doc_id", n=2,
                           tokens_col=ws).collect()}
    big = Counter()
    pre = Counter()
    per_doc = {}
    for i, d in enumerate(docs):
        toks = d.split()
        bgs = list(zip(toks, toks[1:]))
        per_doc[i] = bgs
        for b in bgs:
            big[b] += 1
            pre[b[0]] += 1
    for i, bgs in per_doc.items():
        if not bgs:
            assert i not in got
            continue
        expect = sum(-math.log(big[b] / pre[b[0]]) for b in bgs) / len(bgs)
        assert got[i].surprisal == pytest.approx(expect, abs=1e-9), docs[i]
        assert got[i].surprisal >= -1e-12
        assert got[i].n_grams == len(bgs)


@given(docs=st.lists(doc.filter(lambda d: d.strip()), min_size=2,
                     max_size=8))
@settings(**_SETTINGS)
def test_remove_repeated_lines_only_cross_doc(spark, docs):
    """remove_repeated_lines drops exactly the lines occurring in >=2
    distinct docs; per-doc output text round-trips the kept lines."""
    from tiledb_py_spark.operators.dedup import remove_repeated_lines

    # one line per 4 tokens to synthesize multi-line docs
    def linify(d):
        toks = d.split()
        return "\n".join(" ".join(toks[i:i + 4])
                         for i in range(0, len(toks), 4))

    lined = [linify(d) for d in docs]
    df = spark.createDataFrame(list(enumerate(lined)), ["doc_id", "text"])
    out = {r.doc_id: r for r in
           remove_repeated_lines(df, "text", "doc_id",
                                 min_docs=2).collect()}
    from collections import Counter
    docfreq = Counter()
    for t in lined:
        for l in set(x.strip() for x in t.split("\n") if x.strip()):
            docfreq[l] += 1
    dup = {l for l, c in docfreq.items() if c >= 2}
    for i, t in enumerate(lined):
        lines = [x.strip() for x in t.split("\n") if x.strip()]
        kept = [l for l in lines if l not in dup]
        assert out[i].clean_text == "\n".join(kept), lined[i]
        assert out[i].n_removed == len(lines) - len(kept)
