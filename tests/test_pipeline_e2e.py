"""End-to-end corpus-preparation pipeline: the full operator chain a
training-data run composes, over the driver's documents table —
quality -> language filter -> exact dedup -> MinHash near-dedup ->
n-gram benchmark decontamination -> deterministic split -> exact-n eval
draw -> chunking -> sequence packing -> token budget.  Asserts the
invariants each stage must preserve for the next one."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

_DOCS = "/root/testdata/sf0.01/documents.parquet"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_DOCS),
    reason="driver testdata not present on this machine")


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(_DOCS)
            .select("doc_id", "lang", "source", "text"))


def test_corpus_prep_pipeline(spark, docs):
    from tiledb_py_spark.operators.dedup import (decontaminate, exact_dedup,
                                                 minhash_dedup)
    from tiledb_py_spark.operators.pipeline import (chunk_documents,
                                                    deterministic_shuffle,
                                                    hash_split, pack_sequences,
                                                    sample_exact,
                                                    select_token_budget)
    from tiledb_py_spark.operators.text import quality_score

    n0 = docs.count()

    # 1. quality + language gate (stays lazy/codegen)
    scored = quality_score(docs, "text")
    kept = scored.filter((F.col("quality") >= 0.2)
                         & F.col("lang").isin("en", "zh", "de"))
    n1 = kept.count()
    assert 0 < n1 <= n0

    # 2. exact then near dedup — monotone shrinking, ids preserved
    d1 = exact_dedup(kept, ["text"], id_col="doc_id")
    d2 = minhash_dedup(d1, "text", "doc_id", num_perm=32, bands=16,
                       threshold=0.85)
    n2, n3 = d1.count(), d2.count()
    assert n3 <= n2 <= n1
    ids2 = {r.doc_id for r in d2.select("doc_id").collect()}
    ids1 = {r.doc_id for r in kept.select("doc_id").collect()}
    assert ids2 <= ids1

    # 3. benchmark decontamination: held-out set = 20 exact-sampled docs
    bench = sample_exact(d2, ["doc_id"], n=20, seed=7, salt="bench")
    bench_ids = {r.doc_id for r in bench.select("doc_id").collect()}
    assert len(bench_ids) == 20
    corpus = d2.join(bench.select("doc_id"), on="doc_id", how="left_anti")
    clean = decontaminate(corpus, bench, "text", "doc_id", n=8)
    # every bench doc shares its own 8-grams with itself, so any corpus
    # doc IDENTICAL to a bench doc would have been dropped; and nothing
    # from the bench set leaks into the clean corpus
    clean_ids = {r.doc_id for r in clean.select("doc_id").collect()}
    assert clean_ids.isdisjoint(bench_ids)

    # 4. deterministic split + shuffle: partition-of-unity over splits
    split = hash_split(clean, ["doc_id"], {"train": 0.9, "val": 0.1})
    by_split = {r.split: r.n for r in
                split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by_split.values()) == len(clean_ids)
    train = deterministic_shuffle(split.filter(F.col("split") == "train"),
                                  ["doc_id"], seed=3)
    train_rows = train.select("doc_id", "shuffle_key").collect()
    keys = [r.shuffle_key for r in train_rows]
    assert keys == sorted(keys)  # globally ordered by the seeded hash

    # 5. chunk -> pack -> budget: every chunk within budget, traceable
    chunks = chunk_documents(train, "text", ["doc_id"],
                             chunk_tokens=128, overlap=16,
                             keep_cols=["split"])
    packed = pack_sequences(chunks, "chunk_n_tokens", ["doc_id", "chunk_id"],
                            max_tokens=512, by="split")
    got = packed.collect()
    assert {(r.doc_id, r.chunk_id) for r in got} == \
        {(r.doc_id, r.chunk_id) for r in chunks.collect()}
    assert all(r.chunk_n_tokens <= 128 for r in got)
    assert all(r.pack_offset < 512 for r in got)

    # 6. token budget: kept chunk set is a prefix of the (pack, chunk)
    # layout and respects the cap per split
    budget = 10_000
    sel = select_token_budget(packed, "chunk_n_tokens",
                              ["doc_id", "chunk_id"], budget, by="split")
    per_split = (sel.groupBy("split")
                 .agg(F.sum("chunk_n_tokens").alias("tot")).collect())
    assert all(r.tot <= budget for r in per_split)
    assert sel.count() > 0
