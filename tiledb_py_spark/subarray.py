"""Explicit Subarray API (S14).

Reference: ``/root/reference/tiledb/subarray.py:15-129`` (``add_ranges``,
``add_dim_range``, ``num_dim_ranges``) and the ``read_subarray`` /
``write_subarray`` entry points (``dense_array.py:779-896``,
``sparse_array.py:410-449``).

A Subarray is a per-dim list of inclusive ranges — the same Range IR the
indexers compile to (plans.DimRanges); this class is the user-facing
builder for it.
"""

from __future__ import annotations

from typing import Any, Sequence

from .plans import DimRanges


class EmptyLabelSelection(Exception):
    """A label range matched no label-table rows: the selection is
    provably empty (readers return an empty result; writers refuse)."""

    def __init__(self, label, rng):
        self.label, self.range = label, rng
        super().__init__(
            f"label range {rng!r} on {label!r} matches no labels")


class Subarray:
    """Per-dimension inclusive range sets."""

    def __init__(self, array, ctx=None):
        self.array = array
        self._ranges: dict[int, list[tuple]] = {}

    def _dim_index(self, dim) -> int:
        if isinstance(dim, int):
            ndim = self.array.schema.domain.ndim
            # an out-of-range int index would store ranges that
            # to_dim_ranges() never emits — the query would silently
            # scan the FULL domain instead of erroring
            if not 0 <= dim < ndim:
                raise IndexError(
                    f"dimension index {dim} out of range for a "
                    f"{ndim}-dim array")
            return dim
        for i, d in enumerate(self.array.schema.domain):
            if d.name == dim:
                return i
        raise KeyError(dim)

    def add_dim_range(self, dim, rng: tuple) -> None:
        """Add one inclusive (lo, hi) range on a dim (index or name)."""
        if len(rng) != 2:
            raise ValueError("range must be a (lo, hi) tuple")
        lo, hi = rng
        try:
            inverted = lo is not None and hi is not None and hi < lo
        except TypeError:
            inverted = False
        if inverted:
            # the reference Subarray rejects lo > hi; storing it would
            # compile to an always-false predicate (silently empty
            # results) and a negative shape()
            raise ValueError(f"invalid range on dim {dim!r}: "
                             f"lower bound {lo!r} > upper bound {hi!r}")
        self._ranges.setdefault(self._dim_index(dim), []).append(tuple(rng))

    def add_ranges(self, ranges: Sequence[Sequence[tuple]]) -> None:
        """Bulk add: one list of (lo, hi) tuples per dimension."""
        ndim = self.array.schema.domain.ndim
        if len(ranges) > ndim:
            # validate BEFORE adding anything — a mid-loop refusal
            # would leave the earlier dims' ranges partially applied
            raise IndexError(
                f"add_ranges got {len(ranges)} per-dim lists for a "
                f"{ndim}-dim array")
        for i, dim_ranges in enumerate(ranges):
            for rng in dim_ranges:
                self.add_dim_range(i, rng)

    def num_dim_ranges(self, dim) -> int:
        return len(self._ranges.get(self._dim_index(dim), []))

    def get_range(self, dim_idx, range_idx: int) -> tuple:
        """The ``range_idx``-th range on a dim (reference
        ``subarray.py:76-88``)."""
        rs = self._ranges.get(self._dim_index(dim_idx), [])
        if not 0 <= range_idx < len(rs):
            raise IndexError(
                f"range index {range_idx} out of range "
                f"({len(rs)} ranges on dim {dim_idx!r})")
        return rs[range_idx]

    # -- dimension-label ranges (reference subarray.py:44-51,90-114) ----
    def add_label_range(self, label: str, label_range: tuple) -> None:
        """Add an inclusive range on a dimension LABEL; resolved to dim
        ranges through the label table at read time (labels.py)."""
        if len(label_range) != 2:
            raise ValueError("range must be a (lo, hi) tuple")
        if not self.array.schema.has_dim_label(label):
            from .functions.query_condition import TileDBError

            raise TileDBError(f"no dimension label {label!r}")
        if not hasattr(self, "_label_ranges"):
            self._label_ranges: dict[str, list[tuple]] = {}
        self._label_ranges.setdefault(label, []).append(tuple(label_range))

    def has_label_range(self, dim_idx) -> bool:
        """True if any label range targets the given dim (reference
        ``subarray.py:90-96``)."""
        i = self._dim_index(dim_idx)
        for label in getattr(self, "_label_ranges", {}):
            if self.array.schema.dim_label(label).dim_index == i:
                return True
        return False

    def num_label_ranges(self, label: str) -> int:
        if not isinstance(label, str):
            raise TypeError(f"invalid type {type(label)} for label")
        return len(getattr(self, "_label_ranges", {}).get(label, []))

    def to_dim_ranges(self) -> list[DimRanges]:
        by_dim: dict[int, DimRanges] = {}
        for i, d in enumerate(self.array.schema.domain):
            rs = self._ranges.get(i)
            if rs:
                by_dim[i] = DimRanges(name=d.name,
                                      intervals=[tuple(r) for r in rs])
        # label ranges resolve through the label tables to coord
        # intervals (same machinery as LabelIndexer) — leaving them
        # unresolved would silently scan the FULL domain
        for label, ranges in getattr(self, "_label_ranges", {}).items():
            dl = self.array.schema.dim_label(label)
            i = dl.dim_index
            d = self.array.schema.domain.dim(i)
            from .labels import resolve_label_selection

            for lo, hi in ranges:
                interval, _vals, _coords = resolve_label_selection(
                    self.array.uri, label, slice(lo, hi))
                if interval is None:
                    raise EmptyLabelSelection(label, (lo, hi))
                dr = by_dim.setdefault(i, DimRanges(name=d.name))
                dr.intervals.append(tuple(interval))
        return [by_dim[i] for i in sorted(by_dim)]

    def shape(self) -> tuple:
        """Total cells per dim for single-range integer subarrays."""
        sizes = []
        for i, d in enumerate(self.array.schema.domain):
            rs = self._ranges.get(i)
            if not rs:
                lo, hi = d.domain
            elif len(rs) == 1:
                lo, hi = rs[0]
            else:
                sizes.append(sum(int(h) - int(l) + 1 for l, h in rs))
                continue
            sizes.append(int(hi) - int(lo) + 1)
        return tuple(sizes)
