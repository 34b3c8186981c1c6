"""Skew-mitigation primitives: salted aggregation and salted joins.

At 100 TB a handful of hot keys (empty documents, null-ish defaults, one
huge customer) can pin a single reducer for hours.  AQE's skew-join
handles the sort-merge case at runtime; these helpers cover the cases AQE
does not: skewed ``groupBy`` aggregations and broadcast-ineligible joins
with a known-hot build side.

- ``salted_agg``: two-stage aggregate — stage 1 groups on
  (key, salt) spreading each hot key over ``n_salts`` reducers, stage 2
  merges the partials.  Works for any algebraic aggregate
  (sum/count/min/max, and avg via sum+count).
- ``salted_join``: replicate the small side ``n_salts`` times with an
  explicit salt column; the big side picks a random salt per row, so each
  hot key's rows spread over ``n_salts`` tasks.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Deterministic per-row salt (hash of all columns, not rand(), so
    retried tasks produce identical salts — required for exactly-once
    writes).  Caveat: byte-identical duplicate rows share a salt; dedupe
    first (or add a disambiguating column) if a hot key consists of exact
    duplicates."""
    return df.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                      F.lit(n_salts)).cast("int"))


def salted_agg(df: DataFrame, keys: Sequence[str], aggs: dict,
               n_salts: int = 16) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs``: {out_name: (col, op)} with op in sum|count|min|max|avg.
    Equivalent to ``df.groupBy(keys).agg(...)`` but no single reducer ever
    sees a whole hot key."""
    stage1_exprs = []
    stage2_exprs = []
    for out, (col, op) in aggs.items():
        if op == "sum":
            stage1_exprs.append(F.sum(col).alias(out))
            stage2_exprs.append(F.sum(out).alias(out))
        elif op == "count":
            stage1_exprs.append(F.count(col).alias(out))
            stage2_exprs.append(F.sum(out).alias(out))
        elif op == "min":
            stage1_exprs.append(F.min(col).alias(out))
            stage2_exprs.append(F.min(out).alias(out))
        elif op == "max":
            stage1_exprs.append(F.max(col).alias(out))
            stage2_exprs.append(F.max(out).alias(out))
        elif op == "avg":
            stage1_exprs.append(F.sum(col).alias(f"{out}__s"))
            stage1_exprs.append(F.count(col).alias(f"{out}__c"))
            stage2_exprs.append(
                (F.sum(f"{out}__s") / F.sum(f"{out}__c")).alias(out))
        else:
            raise ValueError(f"unsupported op {op!r}")
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, _SALT).agg(*stage1_exprs)
    return partial.groupBy(*keys).agg(*stage2_exprs)


def salted_join(big: DataFrame, small: DataFrame, on: Sequence[str],
                how: str = "inner", n_salts: int = 16,
                join_hint: Optional[str] = None) -> DataFrame:
    """Skew-safe equi-join: small side replicated n_salts times, big side
    salted, join on (keys + salt).  Use when the big side has hot join
    keys and the small side is too large to broadcast outright.

    ``join_hint`` (e.g. ``"shuffle_hash"``, ``"merge"``) is applied to
    the replicated side at the OUTER join — a hint placed on ``small``
    by the caller would be consumed by the internal salt crossJoin
    instead.  At production scale the replicated side exceeds
    ``autoBroadcastJoinThreshold`` on its own; at test scale pass
    ``join_hint="shuffle_hash"`` to exercise the path salting exists
    for (a broadcast plan would make the salt a no-op)."""
    salts = big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias(_SALT))
    small_rep = small.crossJoin(salts)
    if join_hint:
        small_rep = small_rep.hint(join_hint)
    big_salted = with_salt(big, n_salts)
    out = big_salted.join(small_rep, [*on, _SALT], how)
    return out.drop(_SALT)
