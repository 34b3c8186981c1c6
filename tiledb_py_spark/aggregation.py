"""Whole-selection aggregates with the reference's exact result rules.

Reference: the channel-aggregate API ``PyAgg``
(``/root/reference/tiledb/core.cc:300-583``), spec shaping in ``Query.agg``
(``/root/reference/tiledb/query.py:140-201``) and result unwrapping in
``aggregation.py:72-79``.

Semantics mirrored exactly (``core.cc:405-563``):
- ``sum``: ints upcast to int64 (uint -> uint64 -> Python int), floats -> float64;
  empty set -> 0 for ints / 0.0 for floats.
- ``min``/``max``: attr dtype preserved; EMPTY selection -> None for int
  attrs, NaN for float attrs (``core.cc:436-501``); nullable attr with all
  nulls -> None.
- ``mean``: float64; empty -> NaN.
- ``count``: cell count (int).
- ``null_count``: only valid for nullable attrs (int).

Spark mapping: ONE ``df.agg(...)`` with a hidden ``count(*)`` column to
detect the empty/all-null cases — the same trick the reference uses
(auto-added count channel, ``core.cc:346-361``).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_OPS = ("count", "sum", "min", "max", "mean", "null_count")


def normalize_agg_spec(spec, attrs: list[str], nullable: dict[str, bool]) -> dict[str, tuple]:
    """str | list | {attr: op|ops} -> {attr: (ops...)}  (reference
    ``query.py:140-201``)."""
    if isinstance(spec, str):
        return {a: (spec,) for a in attrs}
    if isinstance(spec, (list, tuple)):
        for op in spec:
            if op not in VALID_OPS:
                raise ValueError(f"unknown aggregate {op!r}")
        return {a: tuple(spec) for a in attrs}
    if isinstance(spec, dict):
        out = {}
        for a, ops in spec.items():
            if a not in attrs:
                raise ValueError(f"unknown attribute {a!r}")
            ops = (ops,) if isinstance(ops, str) else tuple(ops)
            out[a] = ops
        return out
    raise TypeError(f"unsupported agg spec {spec!r}")


def _is_float_dtype(dt: np.dtype) -> bool:
    return dt.kind == "f"


def _qcol(name: str) -> F.col:
    """Backtick-quoted column reference: a bare string like 'a.b' would
    be parsed as a struct-field path (the read/dedup paths quote for
    the same reason)."""
    return F.col("`" + name.replace("`", "``") + "`")


def compute_aggregates(df: DataFrame, spec: dict[str, tuple],
                       dtypes: dict[str, np.dtype],
                       nullable: dict[str, bool]) -> dict[str, dict[str, Any]]:
    """Run all requested aggregates in one Spark job and shape results
    per the reference's nested-dict convention."""
    exprs = [F.count(F.lit(1)).alias("__n")]
    # hidden per-attr VALID counts for nullable attrs: the reference's
    # validity buffer rule (core.cc:466-485) — a nullable attr with
    # ZERO valid values returns None (integer dtypes) / NaN (float)
    # from sum/min/max/mean, NOT the empty-set defaults
    need_valid = sorted({a for a, ops in spec.items()
                         if nullable.get(a, False)
                         and any(op in ("sum", "min", "max", "mean")
                                 for op in ops)})
    for a in need_valid:
        exprs.append(F.count(_qcol(a)).alias(f"__nv_{a}"))
    for a, ops in spec.items():
        dt = dtypes.get(a, np.dtype("float64"))
        c = _qcol(a)
        if dt.kind == "b":
            # bool attrs map to Spark BooleanType, which sum/avg refuse
            # — the reference upcasts bool sums to integers
            num = c.cast("long")
        else:
            num = c
        for op in ops:
            name = f"{a}__{op}"
            if op == "count":
                exprs.append(F.count(F.lit(1)).alias(name))
            elif op == "sum":
                exprs.append(F.sum(num).alias(name))
            elif op == "min":
                exprs.append(F.min(c).alias(name))
            elif op == "max":
                exprs.append(F.max(c).alias(name))
            elif op == "mean":
                exprs.append(F.avg(num).alias(name))
            elif op == "null_count":
                if not nullable.get(a, False):
                    raise ValueError(f"null_count requires a nullable attribute (got {a!r})")
                exprs.append((F.count(F.lit(1)) - F.count(c)).alias(name))
            else:
                raise ValueError(f"unknown aggregate {op!r}")
    row = df.agg(*exprs).collect()[0].asDict()

    out: dict[str, dict[str, Any]] = {}
    for a, ops in spec.items():
        dt = dtypes.get(a, np.dtype("float64"))
        isfloat = _is_float_dtype(dt)
        # all-null nullable attr (reference _is_invalid): None for
        # integer dtypes, NaN for float — applies to sum/min/max/mean
        allnull = nullable.get(a, False) and row.get(f"__nv_{a}") == 0
        invalid = None if not isfloat else float("nan")
        res = {}
        for op in ops:
            v = row[f"{a}__{op}"]
            if op == "count":
                res[op] = int(v)
            elif op == "null_count":
                res[op] = int(v)
            elif op == "sum":
                if allnull:
                    res[op] = invalid
                elif v is None:  # empty set: 0 / 0.0 (core.cc sum_type)
                    res[op] = 0.0 if isfloat else 0
                else:
                    res[op] = float(v) if isfloat else int(v) if dt.kind in "iub" else v
            elif op in ("min", "max"):
                if allnull:
                    res[op] = invalid
                elif v is None:  # empty selection (core.cc:477-483)
                    res[op] = float("nan") if isfloat else None
                else:
                    res[op] = v
            elif op == "mean":
                if allnull:
                    res[op] = invalid
                else:
                    res[op] = float("nan") if v is None else float(v)
        out[a] = res
    return out


def unwrap(results: dict[str, dict[str, Any]], spec, attrs: list[str]):
    """Singleton unwrapping, exactly as the reference
    (``aggregation.py:72-79``): only when there is a single attribute is
    the outer dict dropped — and then, only if that attribute has a single
    aggregate, the inner dict too.  Multi-attribute results keep inner
    dicts even for single ops."""
    if len(results) == 1:
        inner = list(results.values())[0]
        if len(inner) == 1:
            return list(inner.values())[0]
        return inner
    return results


def nan_safe_equal(a, b) -> bool:
    """Test helper: compare aggregate results treating NaN == NaN."""
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b
