"""CurrentDomain / NDRectangle: a mutable sub-domain the array currently
uses, smaller than the (fixed) full domain.

Reference: ``/root/reference/tiledb/current_domain.py:8`` (CurrentDomain),
``/root/reference/tiledb/ndrectangle.py:9`` (NDRectangle),
``array_schema.py:401-416`` (schema accessors),
``schema_evolution.py:55-62`` (expand), and the read-clamping behavior of
``tests/test_current_domain.py::test_take_current_domain_into_account_*``:
open slice ends clamp to the current-domain box, and explicit selections
outside it raise.

Spark rebuild: the rectangle is plain metadata persisted in the manifest
JSON; clamping happens at range-IR construction (indexing.py) so every
downstream stage — MBR fragment pruning, parquet predicate pushdown —
automatically honors it with zero extra plan nodes.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union


class TileDBError(Exception):
    pass


class NDRectangle:
    """N-dimensional inclusive box over a Domain
    (reference ``ndrectangle.py:9-55``)."""

    def __init__(self, ctx=None, domain=None):
        # ctx accepted for signature parity; unused (no native context)
        if domain is None and ctx is not None and hasattr(ctx, "ndim"):
            domain = ctx  # NDRectangle(domain) convenience
        if domain is None:
            raise ValueError("NDRectangle requires a Domain")
        self._domain = domain
        self._ranges: dict[int, tuple] = {}

    def _dim_index(self, dim: Union[str, int]) -> int:
        if isinstance(dim, int):
            if dim >= self._domain.ndim:
                raise TileDBError(f"dimension index {dim} out of range")
            return dim
        for i, d in enumerate(self._domain):
            if d.name == dim:
                return i
        raise TileDBError(f"no dimension {dim!r}")

    def set_range(self, dim: Union[str, int], start, end) -> None:
        """Set the inclusive (start, end) range for one dimension."""
        self._ranges[self._dim_index(dim)] = (start, end)

    def range(self, dim: Union[str, int]) -> Tuple:
        i = self._dim_index(dim)
        if i not in self._ranges:
            raise TileDBError(f"no range set for dimension {dim!r}")
        return tuple(self._ranges[i])

    def has_range(self, dim: Union[str, int]) -> bool:
        return self._dim_index(dim) in self._ranges

    def __str__(self) -> str:
        parts = ", ".join(
            f"{self._domain.dim(i).name}: {self._ranges.get(i)}"
            for i in range(self._domain.ndim))
        return f"NDRectangle({parts})"

    __repr__ = __str__

    def to_json(self):
        return {self._domain.dim(i).name: [lo, hi]
                for i, (lo, hi) in self._ranges.items()}

    @classmethod
    def from_json(cls, domain, d) -> "NDRectangle":
        r = cls(domain=domain)
        for name, (lo, hi) in d.items():
            r.set_range(name, lo, hi)
        return r


class CurrentDomain:
    """The array's current domain (reference ``current_domain.py:8-52``):
    empty until an NDRectangle is set."""

    def __init__(self, ctx=None):
        self._rect: Optional[NDRectangle] = None

    @property
    def type(self) -> Optional[str]:
        return "NDRECTANGLE" if self._rect is not None else None

    @property
    def is_empty(self) -> bool:
        return self._rect is None

    def set_ndrectangle(self, ndrect: NDRectangle) -> None:
        self._rect = ndrect

    @property
    def ndrectangle(self) -> NDRectangle:
        if self._rect is None:
            raise TileDBError("current domain is empty")
        return self._rect

    def box(self, domain) -> dict[str, tuple]:
        """{dim_name: (lo, hi)} for dims with a range set (clamping input)."""
        if self._rect is None:
            return {}
        return {domain.dim(i).name: tuple(r)
                for i, r in self._rect._ranges.items()}

    def __repr__(self):
        return f"CurrentDomain({'empty' if self.is_empty else self._rect})"
