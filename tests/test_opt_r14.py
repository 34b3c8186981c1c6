"""Round-14 optimization pins: internals changed for performance must
stay bit-equal to their reference formulations."""

import pytest

def test_kneser_ney_pattern_rework_matches_reference(spark):  # noqa: F811
    """The r14 pattern-keyed KN restructure must reproduce the direct
    postings-level formulation (hand-replayed here for a small corpus
    at full double precision, before any rounding)."""
    import math
    from collections import Counter

    from tiledb_py_spark.operators.text import kneser_ney_logprob

    texts = {1: "a b a c", 2: "b a", 3: "c", 4: "a b b a c a"}
    rows = [(i, t) for i, t in texts.items()]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in
           kneser_ney_logprob(df, "text", "doc_id").collect()}

    # reference replay on raw tokens (hash is injective on this vocab)
    D = 0.75
    bigrams = Counter()
    toks_by_doc = {i: t.split() for i, t in texts.items()}
    for toks in toks_by_doc.values():
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] += 1
    ctot = Counter(); n1f = Counter(); n1b = Counter()
    for (a, b), c in bigrams.items():
        ctot[a] += c; n1f[a] += 1; n1b[b] += 1
    B = len(bigrams)
    V = len({w for toks in toks_by_doc.values() for w in toks})

    def pcont(wrd):
        return (n1b.get(wrd, 0) + 1) / (B + V)

    for i, toks in toks_by_doc.items():
        lp = 0.0
        for j, wrd in enumerate(toks):
            if j == 0:
                p = pcont(wrd)
            else:
                v = toks[j - 1]
                p = (max(bigrams[(v, wrd)] - D, 0.0) / ctot[v]
                     + (D * n1f[v] / ctot[v]) * pcont(wrd))
            lp += math.log(p)
        assert out[i].n_tokens == len(toks)
        assert out[i].log_prob == pytest.approx(lp, rel=1e-12)
