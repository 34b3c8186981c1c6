"""As-of (time-travel) join — a custom operator Spark's built-ins lack.

``asof_join(left, right, ...)`` matches each left row to the most recent
right row with ``right.time <= left.time`` within the same key group
(optionally within a tolerance) — the standard point-in-time join for
feature lookup and event attribution.

Spark-first implementation: a UNION + single window pass, not a range
join or per-row UDF.  Both sides are tagged and unioned, then one
``last(..., ignorenulls=True)`` window ordered by (time, tag) carries the
latest right-side values forward onto left rows.  Cost: ONE shuffle of
(keys, time) — the same partitioning both inputs would need anyway — and
no quadratic range expansion, so it scales to arbitrarily dense right
sides (a range join explodes when many right rows fall in each left
window; this stays linear)."""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_src"


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: Optional[Sequence[str]] = None,
              right_cols: Optional[Sequence[str]] = None,
              tolerance=None, suffix: str = "_right",
              strict: bool = False) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[on] <= left[on]`` (``<`` when ``strict``) per ``by`` group.

    - ``on``: ordering column (timestamp or numeric), same name both sides.
    - ``by``: equi-join keys (optional).
    - ``right_cols``: right columns to carry (default: all but on/by).
    - ``tolerance``: max allowed ``left[on] - right[on]`` (e.g.
      ``F.expr("INTERVAL 1 HOUR")`` or a number); matches older than this
      come back null.
    - unmatched left rows keep nulls (left-outer semantics, like pandas
      ``merge_asof``)."""
    by = list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    carried = [f"{c}{suffix}" for c in right_cols]

    lhs = left.withColumn(_TAG, F.lit(1))
    for c, cc in zip(right_cols, carried):
        lhs = lhs.withColumn(cc, F.lit(None).cast(right.schema[c].dataType))
    lhs = lhs.withColumn(f"{on}{suffix}", F.lit(None).cast(right.schema[on].dataType))

    rhs = right.select(
        *by,
        F.col(on),
        F.lit(0).alias(_TAG),
        *[F.col(c).alias(cc) for c, cc in zip(right_cols, carried)],
        F.col(on).alias(f"{on}{suffix}"),
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rhs = rhs.select(*lhs.columns)

    u = lhs.unionByName(rhs)
    # right rows sort before left rows at equal time unless strict, in
    # which case they sort after (so an equal-time right row is excluded)
    tag_order = F.col(_TAG).asc() if not strict else F.col(_TAG).desc()
    w = (Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))) \
        .orderBy(F.col(on).asc(), tag_order) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled = u
    for cc in [*carried, f"{on}{suffix}"]:
        filled = filled.withColumn(cc, F.last(cc, ignorenulls=True).over(w))
    out = filled.filter(F.col(_TAG) == 1).drop(_TAG)
    if tolerance is not None:
        lag_ok = (F.col(on) - F.col(f"{on}{suffix}")) <= tolerance
        for cc in carried:
            out = out.withColumn(cc, F.when(lag_ok, F.col(cc)))
        out = out.withColumn(f"{on}{suffix}", F.when(lag_ok, F.col(f"{on}{suffix}")))
    return out
