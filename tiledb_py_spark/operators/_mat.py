"""Materialization point for small derived tables with multiple
consumers (the r14 "checkpoint family": KN pattern tables, tfidf term
tables, repeated-ngram/line-dedup collapses, surprisal count tables).

Why it exists: each consumer branch of such a table prunes/pushes
different columns and filters into the aggregate, so the branches'
exchange subtrees canonicalize differently and neither plan-time
``ReuseExchange`` nor AQE runtime stage reuse dedups them — without a
materialization point the corpus-sized scan+tokenize+explode lineage
re-executes once PER consumer.  Materializing the (much smaller)
derived table truncates the plan there (guide §3.3) and every branch
reads the stored blocks instead.

The default mechanism (r15, measured) is ``persist(MEMORY_AND_DISK)``:
the derived table lands in Spark's COLUMNAR compressed in-memory cache
(``InMemoryTableScan`` in the plan), which at sf10 reads ~2x faster
than the row-format executor blocks ``localCheckpoint`` writes
(interleaved A/B, kn_ppl med 19.6 s persist vs 38.6 s lazy-ckpt vs
43.4 s eager-ckpt; kn3 38.9/53.6; line_dedup parity).  Unlike a local
checkpoint the cached lineage stays RECOMPUTABLE — an executor loss
after materialization recomputes the lost partitions instead of
failing the query — and no job runs at DataFrame-build time.

CROSS-RUN HONESTY (load-bearing): Spark's CacheManager matches cached
plans structurally, so a SECOND build of the same operator in one
session would silently serve the first build's cached blocks — a
cross-run result cache the bench contract forbids (and stale data if
the inputs mutated).  ``materialize`` therefore EVICTS any
identical-plan cache entry (``unpersist(blocking=True)`` on the fresh
DataFrame) before persisting, so every rebuild starts cold and
recomputes from its sources; reuse happens only across the consumer
branches WITHIN one build — exactly the plan-truncation semantics the
checkpoint had.  ``tests/test_opt_r15.py`` pins this property.

Mode knob (``SPARK_GRAFT_MATERIALIZE``, read at build time so library
users composing lazy pipelines can opt out without a signature
change):

- ``persist`` (default): evict-then-``persist(MEMORY_AND_DISK)`` as
  above.  CACHE LIFETIME: each build leaves ONE live CacheManager
  entry (small — pattern/vocabulary sized) until the next
  identical-plan rebuild evicts it, ``spark.catalog.clearCache()``,
  or session end; there is no caller-reachable handle on the internal
  table, so a long-lived session building these operators over MANY
  DISTINCT inputs accumulates one entry per distinct build and should
  prefer ``ckpt`` (blocks freed by the ContextCleaner once the result
  is unreachable) or ``off``.  The eviction is plan-structural, so it
  also hits a structurally-identical table the CALLER cached (or a
  still-alive previous build of the same operator over the same
  input — that older result silently reverts to re-deriving its
  lineage per consumer); callers that need two identical builds alive
  must rename an internal column to decouple the plans.
- ``ckpt``: ``localCheckpoint(eager=True)`` — the r14 default;
  deterministic materialization point, plan truncated at a
  ``Scan ExistingRDD``, but blocks are neither replicated nor
  recomputable and the build itself runs the upstream jobs.
- ``lazy``: ``localCheckpoint(eager=False)`` — same truncation, no
  build-time job; measured ~2x slower than ``persist`` at sf10 (row
  blocks).
- ``off``: no materialization (the pre-r14 shape: every consumer
  re-derives the lineage; AQE overlaps the redundant passes on an
  idle cluster — the right choice only when cores are otherwise idle
  and the upstream pass is cheap, e.g. the reverted bm25 site).

The table is recomputed fresh inside every build of the operator
(nothing is memoized across builds — the eviction guarantees it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Materialize a small multi-consumer derived table per
    ``SPARK_GRAFT_MATERIALIZE`` (see module docstring)."""
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "persist")
    if mode == "off":
        return df
    if mode in ("ckpt", "lazy"):
        return df.localCheckpoint(eager=(mode != "lazy"))
    if mode != "persist":
        # loud, not silent: this knob is the documented opt-out for
        # lazy-pipeline composition, so a typo ("none", "OFF", ...)
        # must not quietly keep persisting and evicting
        raise ValueError(
            f"SPARK_GRAFT_MATERIALIZE={mode!r}: expected one of "
            "'persist', 'ckpt', 'lazy', 'off'")
    from pyspark import StorageLevel

    # evict any identical-plan entry left by a PREVIOUS build of this
    # operator (blocking, so the subsequent persist registers a fresh
    # uncomputed entry instead of adopting the old computed one)
    df.unpersist(blocking=True)
    return df.persist(StorageLevel.MEMORY_AND_DISK)
