"""Interval joins — point-in-interval and interval-overlap, grid-bucketized.

Spark has no native range-join strategy: ``l JOIN r ON l.t BETWEEN r.s
AND r.e`` without equi keys falls back to BroadcastNestedLoop (or worse,
a cartesian product), which is O(|l|*|r|) work however selective the
predicate — the classic 100 TB cliff for event-to-window attribution,
campaign overlap analysis, and span containment.

The fix here is the standard grid (1-D spatial) partitioning, sharing
the keyless as-of join's monotonic numeric space
(``stats_bounds.monotonic_view``) but with UNIFORM-width buckets (see
``_uniform_bucket`` for why quantile cuts are the wrong tool for a join
key):

- the time axis is cut into ``num_buckets`` uniform ranges over the
  point side's (min, max) — one cheap aggregation, or zero jobs with
  caller-supplied ``bounds`` (e.g. parquet footer statistics);
- each point lands in exactly ONE bucket; each interval is replicated
  into the buckets it spans;
- the join becomes an EQUI join on (by-keys..., bucket) plus the exact
  range predicate as a residual filter — one hash shuffle, no quadratic
  expansion, and each matching (point, interval) pair meets exactly once
  (in the point's bucket), so no dedup pass is needed.

Long intervals are the failure mode of pure grids (a covers-everything
interval replicates ``num_buckets``x).  Intervals spanning more than
``long_span_buckets`` buckets are routed to a BROADCAST path instead:
they are joined to the points unreplicated as a broadcast nested loop —
correct for any count, efficient because long intervals are rare in real
workloads (and Spark's broadcast size limit is the loud backstop if they
are not).  The two paths partition the pair space exactly, so the union
is the complete answer.

For interval x interval overlap the same grid applies to both sides;
the duplicate-meeting problem (a pair can share many buckets) is solved
join-side, not with a dedup shuffle: a pair is emitted only in bucket
``greatest(left_start_bucket, right_start_bucket)`` — the first bucket
the two spans share — which each pair satisfies exactly once.

No reference counterpart (TileDB-Py has no join engine); this extends
the custom-operator family of ``operators/asof.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stats_bounds import monotonic_view

_BKT = "__iv_bkt"


def _resolve_range(df, d, bounds) -> tuple:
    """(lo, hi) of the bucketing range: min/max of caller-supplied
    ``bounds`` (any cut list works, e.g. parquet-footer quantiles — no
    job), else one cheap min/max aggregation over the point side."""
    if bounds is not None and len(bounds) > 0:
        bs = [float(b) for b in bounds]
        return min(bs), max(bs)
    row = df.select(F.min(d).alias("lo"), F.max(d).alias("hi")).first()
    if row is None or row.lo is None:
        return 0.0, 0.0
    return float(row.lo), float(row.hi)


def _uniform_bucket(d, lo: float, hi: float, nb: int):
    """Uniform-width bucket id in [0, nb-1] — plain arithmetic, fully
    whole-stage-codegen'd.  The as-of join's quantile buckets
    (``stats_bounds.bucket_index``) were measured ~10x slower here: the
    higher-order ``filter`` over a 64-literal array is interpreted,
    allocating the array per evaluated row.  Uniform buckets are safe
    for a JOIN key (unlike as-of's per-bucket windows): the stream side
    of a hash join never shuffles, so bucket skew does not become task
    skew, and AQE splits any skewed sort-merge partition.  Out-of-range
    values clamp to the edge buckets, which only affects balance, never
    membership."""
    if nb <= 1 or hi <= lo:
        return F.lit(0)
    width = (hi - lo) / nb
    return F.least(F.lit(nb - 1), F.greatest(F.lit(0), F.floor(
        (d - F.lit(lo)) / F.lit(width)).cast("int")))


def _range_pred(t, s, e, closed: str):
    """Exact point-in-interval predicate on the RAW columns (the grid only
    routes; it never decides membership)."""
    lo = (s <= t) if closed in ("both", "left") else (s < t)
    hi = (t <= e) if closed in ("both", "right") else (t < e)
    return lo & hi


def interval_join(points: DataFrame, intervals: DataFrame, on: str,
                  start: str, end: str,
                  by: Optional[Sequence[str]] = None,
                  interval_cols: Optional[Sequence[str]] = None,
                  how: str = "inner", closed: str = "both",
                  suffix: str = "_iv", num_buckets: int = 64,
                  bounds: Optional[Sequence[float]] = None,
                  long_span_buckets: int = 8,
                  point_id: Optional[str] = None) -> DataFrame:
    """Join each point row to every interval row containing it: one
    output row per matching (point, interval) pair.

    - ``on``: the point's time/numeric column; ``start``/``end``: the
      interval's bound columns (same comparable type).
    - ``by``: optional equi keys (same names both sides); composed with
      the grid bucket, they stay ordinary hash-join keys.
    - ``interval_cols``: interval columns to carry (default: all but
      ``by``), each renamed with ``suffix``.
    - ``closed``: which endpoints match — 'both' (s<=t<=e, the default),
      'left' (s<=t<e), 'right' (s<t<=e), 'neither'.
    - ``how``: 'inner' or 'left' ('left' keeps uncontained points with
      null interval columns and requires ``point_id``, a unique point
      key, so unmatched rows are recovered by anti-join — no reliance
      on nondeterministic row ids).
    - ``bounds``: precomputed values in the monotonic numeric space of
      ``on`` whose min/max set the bucketing range (any cut list works,
      e.g. ``stats_bounds.parquet_range_bounds``) — skips the min/max
      job.
    - ``long_span_buckets``: intervals spanning more buckets than this
      take the broadcast path instead of grid replication.

    Inverted (start > end) and null-bounded intervals match nothing;
    null-``on`` points match nothing (and survive only under
    ``how='left'``).
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError("closed must be both|left|right|neither")
    if how == "left" and point_id is None:
        raise ValueError("how='left' requires point_id (a unique point "
                         "key column) so unmatched points can be "
                         "recovered deterministically")
    by = list(by or [])
    if interval_cols is None:
        interval_cols = [c for c in intervals.columns if c not in by]
    carried = [f"{c}{suffix}" for c in interval_cols]
    clash = set(carried) & set(points.columns)
    if clash:
        raise ValueError(f"suffixed interval columns collide with point "
                         f"columns: {sorted(clash)}")

    d_t = monotonic_view(on, dict(points.dtypes)[on])
    lo, hi = _resolve_range(points, d_t, bounds)
    nb = num_buckets if hi > lo else 1

    iv_dt = dict(intervals.dtypes)
    iv = intervals.select(
        *by,
        F.col(start).alias("__iv_s"), F.col(end).alias("__iv_e"),
        *[F.col(c).alias(cc) for c, cc in zip(interval_cols, carried)],
    ).filter(F.col("__iv_s").isNotNull() & F.col("__iv_e").isNotNull()
             & (F.col("__iv_s") <= F.col("__iv_e")))
    d_s = monotonic_view("__iv_s", iv_dt[start])
    d_e = monotonic_view("__iv_e", iv_dt[end])
    iv = iv.withColumn("__b0", _uniform_bucket(d_s, lo, hi, nb)) \
           .withColumn("__b1", _uniform_bucket(d_e, lo, hi, nb))

    pt = points.withColumn(
        _BKT, F.when(d_t.isNotNull(), _uniform_bucket(d_t, lo, hi, nb)))
    pred = _range_pred(F.col(on), F.col("__iv_s"), F.col("__iv_e"), closed)
    drop = ["__iv_s", "__iv_e", "__b0", "__b1"]

    split = long_span_buckets < nb  # statically known: skip dead branches
    short = iv.filter(F.col("__b1") - F.col("__b0")
                      < F.lit(long_span_buckets)) if split else iv
    gridded = short.withColumn(
        _BKT, F.explode(F.sequence(F.col("__b0"), F.col("__b1"))))
    out = (pt.join(gridded, on=by + [_BKT], how="inner")
             .filter(pred).drop(_BKT, *drop))

    if split:
        # rare long intervals: broadcast unreplicated; by-keys become the
        # hash keys of the broadcast join, else a broadcast nested loop
        long_iv = iv.filter(F.col("__b1") - F.col("__b0")
                            >= F.lit(long_span_buckets))
        long_iv = long_iv.select(
            *[F.col(k).alias(f"__ivk_{i}") for i, k in enumerate(by)],
            *(c for c in long_iv.columns if c not in by))
        cond = pred
        for i, k in enumerate(by):
            cond = cond & (pt[k] == F.col(f"__ivk_{i}"))
        longm = (pt.join(F.broadcast(long_iv), cond, "inner")
                   .drop(_BKT, *drop,
                         *[f"__ivk_{i}" for i in range(len(by))]))
        out = out.unionByName(longm.select(*out.columns))

    if how == "left":
        matched = out.select(point_id).distinct()
        missing = points.join(matched, on=point_id, how="left_anti")
        missing = missing.withColumns(
            {cc: F.lit(None).cast(iv_dt[c])
             for c, cc in zip(interval_cols, carried)})
        out = out.unionByName(missing.select(*out.columns))
    return out


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          lstart: str, lend: str, rstart: str, rend: str,
                          by: Optional[Sequence[str]] = None,
                          right_cols: Optional[Sequence[str]] = None,
                          closed: str = "both", suffix: str = "_r",
                          num_buckets: int = 64,
                          bounds: Optional[Sequence[float]] = None,
                          long_span_buckets: int = 8) -> DataFrame:
    """Inner-join interval rows whose ranges overlap: ``closed='both'``
    means touching endpoints overlap (``ls <= re AND rs <= le``);
    ``closed='neither'`` requires a positive-length intersection.

    Grid strategy as :func:`interval_join`, applied to BOTH sides; each
    overlapping pair is emitted exactly once — in bucket
    ``greatest(left_b0, right_b0)`` — so no dedup shuffle.  Long
    intervals on either side take a broadcast path (long-right joins all
    of left; long-left joins short-right and long-right), partitioning
    the pair space with no double counting.  ``bounds`` are sampled from
    the left side's ``lstart`` unless supplied."""
    if closed not in ("both", "neither"):
        raise ValueError("closed must be 'both' or 'neither'")
    by = list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by]
    carried = [f"{c}{suffix}" for c in right_cols]
    clash = set(carried) & set(left.columns)
    if clash:
        raise ValueError(f"suffixed right columns collide with left "
                         f"columns: {sorted(clash)}")

    l_dt, r_dt = dict(left.dtypes), dict(right.dtypes)
    d_ls = monotonic_view(lstart, l_dt[lstart])
    lo, hi = _resolve_range(left, d_ls, bounds)
    nb = num_buckets if hi > lo else 1
    split = long_span_buckets < nb

    def prep(df, s, e, s_al, e_al, keep, key_alias):
        out = df.select(
            *[F.col(k).alias(f"{key_alias}{i}") for i, k in enumerate(by)],
            F.col(s).alias(s_al), F.col(e).alias(e_al), *keep,
        ).filter(F.col(s_al).isNotNull() & F.col(e_al).isNotNull()
                 & (F.col(s_al) <= F.col(e_al)))
        dt = dict(df.dtypes)
        return out.withColumns(
            {"__b0": _uniform_bucket(monotonic_view(s_al, dt[s]), lo, hi, nb),
             "__b1": _uniform_bucket(monotonic_view(e_al, dt[e]), lo, hi, nb)})

    lhs = prep(left, lstart, lend, "__l_s", "__l_e",
               [F.col(c) for c in left.columns if c not in by], "__lk_")
    rhs = prep(right, rstart, rend, "__r_s", "__r_e",
               [F.col(c).alias(cc)
                for c, cc in zip(right_cols, carried)], "__rk_")

    if closed == "both":
        pred = (F.col("__l_s") <= F.col("__r_e")) & \
               (F.col("__r_s") <= F.col("__l_e"))
    else:
        pred = (F.col("__l_s") < F.col("__r_e")) & \
               (F.col("__r_s") < F.col("__l_e"))
    keys_eq = F.lit(True)
    for i in range(len(by)):
        keys_eq = keys_eq & (F.col(f"__lk_{i}") == F.col(f"__rk_{i}"))
    out_cols = ([F.col(f"__lk_{i}").alias(k) for i, k in enumerate(by)]
                + [F.col(c) for c in left.columns if c not in by]
                + [F.col(cc) for cc in carried])

    def finish(j):
        return j.filter(pred & keys_eq).select(*out_cols)

    span = lambda df: F.col("__b1") - F.col("__b0")
    l_short = lhs.filter(span(lhs) < long_span_buckets) if split else lhs
    r_short = rhs.filter(span(rhs) < long_span_buckets) if split else rhs

    def grid_side(df, lb0, lb1):
        return df.withColumn(_BKT, F.explode(
            F.sequence(F.col("__b0"), F.col("__b1")))) \
            .withColumnRenamed("__b0", lb0).withColumnRenamed("__b1", lb1)

    gl = grid_side(l_short, "__lb0", "__lb1")
    gr = grid_side(r_short, "__rb0", "__rb1") \
        .withColumnRenamed(_BKT, "__rbkt")
    # equi keys: by-keys + shared bucket (distinct internal names so the
    # same condition style serves the keyless case)
    grid_keys = keys_eq & (F.col(_BKT) == F.col("__rbkt"))
    # each overlapping short pair shares buckets [max(b0s), min(b1s)];
    # emitting only at max(b0s) makes the grid join duplicate-free
    first_shared = F.col(_BKT) == F.greatest(F.col("__lb0"), F.col("__rb0"))
    grid_rows = (gl.join(gr, grid_keys, "inner")
                 .filter(first_shared).drop("__rbkt"))
    out = finish(grid_rows)

    if split:
        l_long = lhs.filter(span(lhs) >= long_span_buckets)
        r_long = rhs.filter(span(rhs) >= long_span_buckets)
        # long-right x ALL left (unreplicated), long-left x short-right:
        # together with short x short above this partitions the pairs
        b1 = finish(lhs.join(F.broadcast(
            r_long.drop("__b0", "__b1")), keys_eq & pred, "inner")
            .drop("__b0", "__b1"))
        b2 = finish(l_long.drop("__b0", "__b1").join(F.broadcast(
            r_short.drop("__b0", "__b1")), keys_eq & pred, "inner"))
        out = out.unionByName(b1).unionByName(b2)
    return out
