"""Beyond-reference operators for large-scale training-data pipelines
(SURVEY.md §7 phase E): deduplication, similarity search, text analysis,
multimodal column plumbing.

Design rule: everything stays JVM-side (built-in ``pyspark.sql.functions``
over arrays — ``transform``/``aggregate``/``filter``/``zip_with``) so the
hot path is whole-stage-codegen'd; Python appears only in clearly-marked
multimodal decode stubs behind ``mapInPandas``.
"""

from . import bpe, dedup, multimodal, pipeline, retrieval, similarity, text

__all__ = ["bpe", "dedup", "multimodal", "pipeline", "retrieval",
           "similarity", "text"]
