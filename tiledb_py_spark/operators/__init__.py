"""Beyond-reference operators for large-scale training-data pipelines
(SURVEY.md §7 phase E): deduplication, similarity search, text analysis,
multimodal column plumbing.

Design rule: everything stays JVM-side (built-in ``pyspark.sql.functions``
over arrays — ``transform``/``aggregate``/``filter``/``zip_with``) so the
hot path is whole-stage-codegen'd; Python appears only in clearly-marked
multimodal decode stubs behind ``mapInPandas``.
"""

from . import dedup, multimodal, pipeline, similarity, text

__all__ = ["dedup", "multimodal", "pipeline", "similarity", "text"]
