"""Range IR: the logical read plan.

Replaces the reference's three-stage IR (list-of-ranges ->
``Subarray`` object -> ``PyQuery``; see SURVEY.md §3 /
``/root/reference/tiledb/array.py:117-297``, ``subarray.py:15-129``,
``core.cc:619-706``) with ONE declarative dataclass that compiles to
a ``pyspark.sql.Column`` predicate.

Every range is **inclusive on both ends** (TileDB convention — the
numpy-style half-open adjustment happens in the indexer front-end before
ranges reach this IR).  Multi-range = union (OR) of per-dim disjuncts,
AND across dims — exactly the semantics of ``multi_index``
(``/root/reference/tiledb/multirange_indexing.py:384-413``).

Scale note: because the plan is a plain Column expression over dim
columns, Catalyst pushes it into the parquet scan (min/max row-group
pruning) — the Spark equivalent of TileDB pushing ranges into tile
selection.  Point lists compile to ``isin`` (-> parquet dictionary/bloom
pruning where available).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class DimRanges:
    """Ranges for one dimension: a union of inclusive (lo, hi) intervals
    and/or explicit point lists.  ``None`` bound = unbounded on that side."""

    name: str
    intervals: list[tuple[Any, Any]] = field(default_factory=list)
    points: list[Any] = field(default_factory=list)

    @property
    def is_full(self) -> bool:
        return not self.points and all(
            lo is None and hi is None for lo, hi in self.intervals
        ) and len(self.intervals) <= 1

    def to_column(self) -> Optional[Column]:
        """Compile to a Column predicate, or None if unconstrained."""
        disjuncts: list[Column] = []
        c = F.col(self.name)
        for lo, hi in self.intervals:
            if lo is None and hi is None:
                return None  # any full interval makes the dim unconstrained
            lo, hi = _plain(lo), _plain(hi)
            if lo is None:
                disjuncts.append(c <= F.lit(hi))
            elif hi is None:
                disjuncts.append(c >= F.lit(lo))
            elif lo == hi:
                disjuncts.append(c == F.lit(lo))
            else:
                disjuncts.append((c >= F.lit(lo)) & (c <= F.lit(hi)))
        if self.points:
            disjuncts.append(c.isin([_plain(p) for p in self.points]))
        if not disjuncts:
            return None
        out = disjuncts[0]
        for d in disjuncts[1:]:
            out = out | d
        return out


def _plain(v: Any) -> Any:
    import numpy as np

    if isinstance(v, np.datetime64):
        return v.astype("datetime64[us]").item()
    if isinstance(v, np.generic):
        return v.item()
    return v


@dataclass
class QueryPlan:
    """The full logical read: which fragments (resolved by the array layer),
    dim ranges, attribute condition, projection, ordering.

    This is the Spark-side analog of the (Subarray, QueryCondition, attrs,
    layout) tuple assembled at ``/root/reference/tiledb/core.cc:619-710``.
    """

    dim_ranges: list[DimRanges] = field(default_factory=list)
    cond: Optional[Column] = None  # compiled QueryCondition
    attrs: Optional[Sequence[str]] = None  # None = all attrs
    dims: Optional[Sequence[str]] = None  # None = all dims (has_coords)
    order: str = "U"  # C (row-major) | F (col-major) | G (global) | U (unordered)
    limit: Optional[int] = None

    def range_predicate(self) -> Optional[Column]:
        return ranges_to_predicate(self.dim_ranges)


def ranges_to_predicate(dim_ranges: Sequence[DimRanges]) -> Optional[Column]:
    """AND across dims of each dim's OR-of-ranges."""
    pred: Optional[Column] = None
    for dr in dim_ranges:
        c = dr.to_column()
        if c is not None:
            pred = c if pred is None else (pred & c)
    return pred


def mbr_intersects(dim_ranges: Sequence[DimRanges], mbr: dict) -> bool:
    """Fragment-pruning check on the driver: does a fragment's per-dim MBR
    intersect the requested ranges?  Mirrors the spatial fragment pruning
    libtiledb does from ``FragmentInfo.nonempty_domain``
    (``/root/reference/tiledb/fragment.py:24-34``).  Conservative: unknown
    MBR or unconstrained dim -> True."""
    for dr in dim_ranges:
        box = mbr.get(dr.name)
        if box is None:
            continue
        flo, fhi = box
        if dr.is_full:
            continue
        hit = False
        for lo, hi in dr.intervals:
            if (lo is None or _cmp_le(lo, fhi)) and (hi is None or _cmp_le(flo, hi)):
                hit = True
                break
        if not hit and dr.points:
            for p in dr.points:
                if _cmp_le(flo, p) and _cmp_le(p, fhi):
                    hit = True
                    break
        if not hit and (dr.intervals or dr.points):
            return False
    return True


def _cmp_le(a, b) -> bool:
    import numpy as np

    try:
        if isinstance(a, np.datetime64) or isinstance(b, np.datetime64):
            return np.datetime64(a) <= np.datetime64(b)
        return a <= b
    except (TypeError, ValueError):
        # incomparable (mixed types in manifest; np.datetime64(int) raises
        # ValueError, not TypeError) -> conservative: don't prune
        return True
