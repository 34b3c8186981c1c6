"""Change-data-capture between two array snapshots (batch changelog).

``changelog(uri, ts1, ts2)`` returns one row per coordinate whose
VISIBLE value differs between the array opened at ``ts1`` and at
``ts2`` — classified ``insert`` / ``update`` / ``delete`` with the old
and new attribute values side by side.  This is the batch complement of
``sources.spark_datasource.TileDBStreamReader`` (which feeds *raw
fragment rows* forward in commit order): the changelog states the NET
effect of a time window after last-write-wins and delete resolution,
which is what a downstream sync (cache invalidation, index refresh,
reverse ETL) actually needs.

Scale shape — the window's cost is proportional to the CHANGE volume,
not the array size:

1. Affected coordinates come from the window's delta only: the write
   fragments committed in ``(ts1, ts2]`` are read dim-columns-only
   (column-pruned parquet scan of just those fragments), and each
   windowed delete condition is applied to the ts1 snapshot to find the
   keys it removes.
2. Both snapshot reads are fragment-PRUNED by the union MBR of the
   delta fragments (write-only windows; stored-space DimRanges from the
   manifest footer stats — no data job), then LEFT-SEMI joined to the
   affected keys, so unchanged regions of the array never reach the
   diff join.  LWW stays correct under pruning: any fragment holding an
   affected key intersects the delta MBR by construction.
3. The diff itself is one full-outer join on the dims over the two
   (affected-keys-only) snapshots with null-safe attribute comparison.

A consolidation commit inside the window makes the product fragment the
delta — every key it covers counts as affected; the diff then reports
only real changes (consolidation alone produces none), at the cost of a
wider scan for that window.  Timestamps follow open-at semantics
(millisecond manifest clock, inclusive upper bound).

Reference parity: TileDB-Py exposes the ingredients (timestamped opens
``array.py:321-339``, fragment listings ``fragment.py``) but no diff
operator; this composes them Spark-side.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import manifest as mf
from .array import Array, _decode_mbr
from .plans.range_ir import DimRanges


def changelog(uri: str, ts1: int, ts2: int, spark=None,
              include_unchanged: bool = False) -> DataFrame:
    """Net row-level changes between snapshots ``ts1`` and ``ts2`` of
    the array at ``uri`` (manifest milliseconds, both inclusive-bound
    opens; ``ts1 < ts2``).

    Returns ``dims... , change, <attr>_old, <attr>_new ...`` where
    ``change`` is ``'insert'`` (coordinate invisible at ts1, visible at
    ts2), ``'delete'`` (the reverse), or ``'update'`` (visible in both
    with at least one attribute value differing, null-safely).
    Coordinates touched by window fragments but landing on identical
    values are dropped unless ``include_unchanged`` (then carried with
    ``change = NULL``) — a rewrite of the same value is not a change.
    """
    if ts2 <= ts1:
        raise ValueError(f"changelog needs ts1 < ts2, got {ts1} >= {ts2}")
    a_old = Array.load_typed(uri, timestamp=ts1, spark=spark)
    a_new = Array.load_typed(uri, timestamp=ts2, spark=spark)
    spark = a_new.spark
    schema = a_new.schema
    dims = list(schema.dim_names)
    attrs = list(schema.attr_names)

    m = a_new._manifest
    live1 = {f.name for f in m.live_fragments(ts1)}
    delta = [f for f in m.live_fragments(ts2) if f.name not in live1]
    # windowed deletes come from the RAW fragment list, not
    # delete_fragments_visible(ts2): a delete committed in the window
    # and then materialized by an in-window consolidation is no longer
    # "visible" (the product carries its effect), but its removed keys
    # are still part of this window's change set — and the product's
    # coordinates do NOT contain them, so only the delete condition can
    # name them.  The affected-key probe applies the condition to the
    # ts1 snapshot either way; the diff against the ts2 snapshot then
    # reports the rows as deleted.
    win_deletes = [f for f in m.fragments
                   if f.kind == "delete"
                   and ts1 < f.timestamp_range[0] <= ts2]

    empty = a_new._empty_df().select(*dims).withColumn(
        "change", F.lit(None).cast("string"))
    for a in attrs:
        t = schema.spark_schema()[a].dataType
        empty = empty.withColumn(f"{a}_old", F.lit(None).cast(t)) \
                     .withColumn(f"{a}_new", F.lit(None).cast(t))
    if not delta and not win_deletes:
        return empty

    # -- affected coordinates (delta-sized, never array-sized) ----------
    keys: Optional[DataFrame] = None
    if delta:
        paths = [mf.fragment_path(uri, f.name) for f in delta]
        keys = (spark.read.schema(schema.spark_schema()).parquet(*paths)
                .select(*dims))
    # ONE ts1-snapshot scan for ALL windowed deletes (OR of the
    # conditions) — per-delete scans multiplied the full snapshot read
    # by the number of delete commits in the window, breaking the
    # "cost proportional to the CHANGE volume" contract
    conds = [a_old._compile_cond(f.delete_condition) for f in win_deletes]
    conds = [F.coalesce(c, F.lit(False)) for c in conds if c is not None]
    if conds:
        pred = conds[0]
        for c in conds[1:]:
            pred = pred | c
        k = a_old._scan_df().filter(pred).select(*dims)
        keys = k if keys is None else keys.unionByName(k)
    if keys is None:
        return empty
    keys = keys.dropDuplicates(dims)

    # -- snapshot scans, fragment-pruned to the delta's bounding box ----
    ranges = _delta_ranges(schema, delta) if delta and not win_deletes \
        else None
    old = a_old._scan_df(dim_ranges=ranges).join(keys, on=dims,
                                                 how="left_semi")
    new = a_new._scan_df(dim_ranges=ranges).join(keys, on=dims,
                                                 how="left_semi")

    o = old.select(*dims, F.lit(True).alias("__in_old"),
                   *[F.col(a).alias(f"{a}_old") for a in attrs])
    n = new.select(*dims, F.lit(True).alias("__in_new"),
                   *[F.col(a).alias(f"{a}_new") for a in attrs])
    j = o.join(n, on=dims, how="full_outer")

    differs = F.lit(False)
    for a in attrs:
        differs = differs | ~F.col(f"{a}_old").eqNullSafe(F.col(f"{a}_new"))
    change = (F.when(F.col("__in_old").isNull(), F.lit("insert"))
               .when(F.col("__in_new").isNull(), F.lit("delete"))
               .when(differs, F.lit("update")))
    out = j.withColumn("change", change).drop("__in_old", "__in_new")
    if not include_unchanged:
        out = out.filter(F.col("change").isNotNull())
    cols = dims + ["change"]
    for a in attrs:
        cols += [f"{a}_old", f"{a}_new"]
    return out.select(*cols)


def _delta_ranges(schema, delta) -> Optional[list]:
    """Union bounding box of the delta fragments' MBRs as stored-space
    DimRanges — computed from manifest footer stats alone (no job).
    Returns None (no pruning) when any fragment lacks an MBR for any
    dim.  ``Array._stored_ranges`` is idempotent on stored-space values,
    so passing these through ``_scan_df`` never double-converts."""
    los: dict = {}
    his: dict = {}
    for f in delta:
        box = _decode_mbr(schema, f.nonempty_domain)
        for d in schema.dim_names:
            b = box.get(d)
            if b is None:
                return None
            lo, hi = b
            los[d] = lo if d not in los or lo < los[d] else los[d]
            his[d] = hi if d not in his or hi > his[d] else his[d]
    return [DimRanges(name=d, intervals=[(los[d], his[d])])
            for d in schema.dim_names]
