"""Beyond-reference operators for large-scale training-data pipelines
(SURVEY.md §7 phase E):

- ``dedup`` — exact/MinHash/SimHash/embedding/line/span dedup, connected
  components, decontamination, fuzzy join, winnowing fingerprints,
  incremental state-array dedup, source-level similarity audit
- ``similarity`` — brute-force/batch top-k, IVF + PQ ANN with manifest
  persistence, diversity (prototype) sampling
- ``text`` — language ID, quality/repetition/OOV/compression signals,
  C4 line cleaning, unigram/bigram surprisal, perplexity buckets
- ``bpe`` — distributed BPE vocabulary induction + learned-token counting
- ``classifier`` — trainable quality classifier + one-vs-rest label
  classifier (distributed-L-BFGS logistic regression over hashed
  unigrams, row-local scoring/prediction, manifest persistence)
- ``retrieval`` — BM25 search, TF-IDF keyword extraction
- ``pipeline`` — deterministic shuffle/split/sample/mix (incl. p^alpha
  temperature), DSIR selection, chunking, packing, token budgets, PII
  scrub, shard writer
- ``multimodal`` — binary columns + Arrow-batched decode plumbing
- ``sketches`` — mergeable Misra-Gries digests + exact heavy hitters
  (sketch-nominated candidates, exact recount)
- ``asof`` / ``intervals`` — point-in-time, point-in-interval, and
  interval-overlap joins (union+window and grid-bucket strategies; no
  nested-loop fallback), imported directly by callers

Design rule: everything stays JVM-side (built-in ``pyspark.sql.functions``
over arrays — ``transform``/``aggregate``/``filter``/``zip_with``) so the
hot path is whole-stage-codegen'd; Python appears only as Arrow-batched
pandas UDFs where measured faster (minhash/simhash folds, repetition
stats, PQ/ADC, BPE encode) or unavoidable (multimodal decode stubs).
"""

from . import (bpe, classifier, dedup, multimodal, pipeline, retrieval,
               similarity, sketches, text)

__all__ = ["bpe", "classifier", "dedup", "multimodal", "pipeline",
           "retrieval", "similarity", "sketches", "text"]
