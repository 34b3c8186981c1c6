"""Index normalization front-end: numpy-style selections -> Range IR.

Re-expresses the reference's indexer pipeline (see SURVEY.md §3):

- ``index_as_tuple`` / ``replace_ellipsis`` / ``replace_scalars_slice``
  <- /root/reference/tiledb/array.py:37-94 (same algorithm)
- ``index_domain_subarray`` (numpy half-open -> inclusive, negative wrap,
  dtype checks, float/datetime inclusive bounds, clamping)
  <- /root/reference/tiledb/array.py:117-297
- multi_index range building (ALWAYS-inclusive slices, scalars, lists)
  <- /root/reference/tiledb/multirange_indexing.py:128-241

Two distinct rules, per the reference docs (``array.py:1081-1084``):
``A[0:10]`` (getitem path) uses numpy half-open int slices;
``A.multi_index[0:10]`` is inclusive of both endpoints.  Steps are not
part of the IR: the getitem path applies them *after* materialization
(``dense_array.py:284-286``), sparse arrays reject them
(``array.py:207-208``).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from .plans import DimRanges
from .schema import Dim, Domain

_inttypes = (int, np.integer)


class _EmptyRangeType:
    """Singleton sentinel: ``A.multi_index[EmptyRange]`` selects nothing
    (reference ``multirange_indexing.py:56-66``)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "EmptyRange"


EmptyRange = _EmptyRangeType()


def is_empty_range(idx) -> bool:
    """True for the EmptyRange sentinel or any zero-length sized selection
    except the empty string (reference ``multirange_indexing.py:59-65``)."""
    if idx is EmptyRange:
        return True
    try:
        if hasattr(idx, "__len__") and len(idx) == 0 and idx != "":
            return True
    except (TypeError, ValueError):
        pass
    return False


def index_as_tuple(idx) -> tuple:
    if isinstance(idx, tuple):
        return idx
    return (idx,)


def replace_ellipsis(ndim: int, idx: tuple) -> tuple:
    n_ellip = sum(1 for i in idx if i is Ellipsis)
    if n_ellip > 1:
        raise IndexError("an index can only have a single ellipsis ('...')")
    elif n_ellip == 1:
        n = len(idx)
        if (n - 1) >= ndim:
            idx = tuple(i for i in idx if i is not Ellipsis)
        else:
            left = idx.index(Ellipsis)
            right = n - (left + 1)
            new_idx = idx[:left] + ((slice(None),) * (ndim - (n - 1)))
            if right:
                new_idx += idx[-right:]
            idx = new_idx
    if len(idx) < ndim:
        idx += (slice(None),) * (ndim - len(idx))
    if len(idx) > ndim:
        raise IndexError("too many indices for array")
    return idx


def replace_scalars_slice(dom: Domain, idx: tuple):
    """Scalar indices -> 1-element slices; record dropped axes
    (reference ``array.py:75-94``)."""
    new_idx, drop_axes = [], []
    for i in range(dom.ndim):
        dim = dom.dim(i)
        dim_idx = idx[i]
        if np.isscalar(dim_idx):
            drop_axes.append(i)
            if isinstance(dim_idx, _inttypes):
                start = int(dim_idx)
                if start < 0:
                    start += int(dim.domain[1]) + 1
                stop = start + 1
            else:
                start = dim_idx
                stop = dim_idx
            new_idx.append(slice(start, stop, None))
        else:
            new_idx.append(dim_idx)
    return tuple(new_idx), tuple(drop_axes)


def _np_points(arr: np.ndarray) -> list:
    """ndarray selection -> point list, PRESERVING datetime/timedelta
    element types: ``.tolist()`` degrades datetime64 values to raw
    integer counts, which silently select nothing (range IR) or raise
    (multi_index's datetime check) for a perfectly valid selection."""
    return list(arr) if arr.dtype.kind in "Mm" else arr.tolist()


def index_domain_subarray(dom: Domain, idx: tuple, sparse: bool,
                          nonempty: tuple | None = None,
                          current_domain: dict | None = None) -> list[DimRanges]:
    """numpy-slice semantics -> inclusive Range IR
    (algorithm of reference ``array.py:117-297``).

    ``nonempty`` (per-dim (lo, hi) of written cells) substitutes for the
    domain on string dims, as the reference does in read mode
    (``array.py:136-143``).

    ``current_domain`` ({dim_name: (lo, hi)}) clamps open slice ends to
    the current-domain box and REJECTS explicit selections outside it
    (reference ``tests/test_current_domain.py`` sc61914 behavior).
    """
    ndim = dom.ndim
    if len(idx) != ndim:
        raise IndexError(
            f"number of indices does not match domain rank: (got {len(idx)!r}, expected: {ndim!r})"
        )
    out: list[DimRanges] = []
    for r in range(ndim):
        dim = dom.dim(r)
        dim_dtype = dim.dtype
        is_string = dim_dtype.kind in ("U", "S")
        if is_string and nonempty is not None and nonempty[r] is not None:
            dim_lb, dim_ub = nonempty[r]
        else:
            dim_lb, dim_ub = dim.domain
        cd_box = (current_domain or {}).get(dim.name)
        if cd_box is not None:
            dim_lb, dim_ub = cd_box  # clamp defaults; explicit checked below

        dim_idx = idx[r]
        dr = DimRanges(name=dim.name)

        # point lists / arrays (reference array.py:147-176)
        if isinstance(dim_idx, (list, np.ndarray)):
            dr.points = list(_np_points(dim_idx)
                             if isinstance(dim_idx, np.ndarray) else dim_idx)
            out.append(dr)
            continue
        try:
            import pyarrow as pa

            if isinstance(dim_idx, pa.Array):
                dr.points = dim_idx.to_pylist()
                out.append(dr)
                continue
        except ImportError:
            pass
        if not isinstance(dim_idx, slice):
            raise IndexError(f"invalid index type: {type(dim_idx)!r}")

        start, stop, step = dim_idx.start, dim_idx.stop, dim_idx.step
        if step and sparse:
            raise IndexError("steps are not supported for sparse arrays")
        # reference keys half-open vs inclusive on the STOP VALUE's
        # type (array.py:279-296): an integer stop keeps numpy
        # half-open semantics even on a float dim
        stop_is_int = isinstance(stop, _inttypes) \
            and not isinstance(stop, (bool, np.bool_))

        if is_string:
            # BOTH endpoints must be strings — a numeric stop would
            # compile to a numeric comparison on a string column and
            # silently drop rows (reference rejects either endpoint)
            for v in (start, stop):
                if v is not None and not isinstance(v, (str, bytes)):
                    raise ValueError(
                        f"Non-string range '({start},{stop})' provided for string dimension '{dim.name}'")
            dr.intervals.append((start if start is not None else dim_lb,
                                 stop if stop is not None else dim_ub))
            out.append(dr)
            continue

        is_datetime = dim_dtype.kind == "M"

        if start is not None:
            if is_datetime and not isinstance(start, np.datetime64):
                raise IndexError("cannot index datetime dimension with non-datetime interval")
            if np.issubdtype(dim_dtype, np.integer):
                if isinstance(start, (float, np.floating)):
                    raise IndexError("cannot index integral domain dimension with floating point slice")
                if not isinstance(start, _inttypes):
                    raise IndexError(
                        f"cannot index integral domain dimension with non-integral slice (dtype: {type(start)})")
            if not is_datetime and start < 0:
                start += int(dim_ub) + 1
            if not is_datetime and start < dim_lb:
                raise IndexError("index out of bounds")
            if is_datetime \
                    and np.datetime64(start) < np.datetime64(dim_lb):
                # reference index_domain_subarray raises unconditionally
                # for below-domain starts — datetimes included
                raise IndexError("index out of bounds")
            if cd_box is not None and not is_datetime and start > dim_ub:
                raise IndexError(
                    f"selection on {dim.name!r} is outside the current domain {cd_box}")
        else:
            start = dim_lb
        if stop is not None:
            if is_datetime and not isinstance(stop, np.datetime64):
                raise IndexError("cannot index datetime dimension with non-datetime interval")
            if np.issubdtype(dim_dtype, np.integer) and isinstance(stop, (float, np.floating)):
                raise IndexError("cannot index integral domain dimension with floating point slice")
            if not is_datetime and stop < 0:
                stop = int(stop) + int(dim_ub)
            # explicit end beyond the current domain: reject, don't
            # clamp.  Integer stops are half-open numpy-style (stop-1 is
            # the last selected cell); float stops are inclusive, so the
            # -1 adjustment would let any stop in (ub, ub+1] silently
            # clamp instead of raising.
            cd_stop_excess = (stop > dim_ub
                              if np.issubdtype(dim_dtype, np.floating)
                              and not stop_is_int
                              else stop - 1 > dim_ub)
            if cd_box is not None and not is_datetime and not is_string \
                    and cd_stop_excess:
                raise IndexError(
                    f"selection on {dim.name!r} is outside the current domain {cd_box}")
            if not is_datetime and stop > dim_ub:
                if np.issubdtype(dim_dtype, np.floating):
                    # half-open int stop: leave it — clamping to the
                    # (possibly fractional) ub and then subtracting 1
                    # at emission would cut real cells below the top
                    if not stop_is_int:
                        stop = dim_ub
                else:
                    stop = int(dim_ub) + 1
            if is_datetime and stop > dim_ub:
                stop = dim_ub
        else:
            if np.issubdtype(dim_dtype, np.floating) or is_datetime:
                stop = dim_ub
            else:
                stop = int(dim_ub) + 1

        if np.issubdtype(dim_dtype, np.floating):
            # inclusive bounds for FLOAT stops (array.py:279-283); an
            # INTEGER stop keeps numpy half-open semantics — the
            # reference keys on type(stop), so A[0:5] on a float dim
            # selects [0, 4], not everything in [0.0, 5.0]
            hi = float(int(stop) - 1) if stop_is_int else float(stop)
            dr.intervals.append((float(start), hi))
        elif is_datetime:
            dr.intervals.append((np.datetime64(start).astype(dim_dtype),
                                 np.datetime64(stop).astype(dim_dtype)))
        else:
            # numpy half-open -> inclusive (array.py:290-292)
            dr.intervals.append((int(start), int(stop) - 1))
        out.append(dr)
    return out


def getitem_ranges_multi_index(dom: Domain, idx: tuple,
                               nonempty: tuple | None = None,
                               current_domain: dict | None = None) -> list[DimRanges]:
    """multi_index semantics: slices INCLUSIVE of both endpoints, scalars =
    points, lists = point sets; open slice ends clamped to the nonempty
    domain (reference ``multirange_indexing.py:128-241``; sparse full-domain
    fast path at :158-161 = leave unconstrained)."""
    import datetime as _dt

    def _check_dt(dim, v):
        # datetime dims accept only datetime-like selectors (reference
        # rejects integral selectors on DATETIME dims); int64-stored units
        # would otherwise silently compare raw counts
        if v is not None and dim.dtype.kind == "M" and not isinstance(
                v, (np.datetime64, _dt.date, _dt.datetime, str)):
            raise TypeError(
                f"cannot index datetime dimension {dim.name!r} with "
                f"non-datetime value {v!r}")
        return v

    ndim = dom.ndim
    idx = replace_ellipsis(ndim, index_as_tuple(idx))
    out: list[DimRanges] = []
    def _cd_check(dim, box, v):
        if box is not None and v is not None and not isinstance(
                v, (np.datetime64, str, bytes)):
            if v < box[0] or v > box[1]:
                raise IndexError(
                    f"selection on {dim.name!r} is outside the current "
                    f"domain {box}")
        return v

    for r in range(ndim):
        dim = dom.dim(r)
        dim_idx = idx[r]
        box = (current_domain or {}).get(dim.name)
        dr = DimRanges(name=dim.name)
        sel_list = dim_idx if isinstance(dim_idx, list) else [dim_idx]
        if isinstance(dim_idx, np.ndarray):
            sel_list = _np_points(dim_idx)
        for sel in sel_list:
            if isinstance(sel, slice):
                if sel.step is not None:
                    raise ValueError("steps are not supported by multi_index")
                start, stop = sel.start, sel.stop
                if start is None and stop is None and box is None:
                    # full-domain: unconstrained (fast path, :158-161)
                    continue
                _cd_check(dim, box, start)
                _cd_check(dim, box, stop)
                ned = nonempty[r] if (nonempty is not None and r < len(nonempty)) else None
                if start is None:
                    start = box[0] if box is not None else (
                        ned[0] if ned is not None else None)
                if stop is None:
                    stop = box[1] if box is not None else (
                        ned[1] if ned is not None else None)
                dr.intervals.append((_check_dt(dim, start), _check_dt(dim, stop)))
            elif np.isscalar(sel) or isinstance(sel, (np.datetime64, str, bytes)):
                dr.points.append(_check_dt(dim, _cd_check(dim, box, sel)))
            elif isinstance(sel, tuple) and len(sel) == 2:
                # (lo, hi) inclusive range inside a list selection —
                # reference multirange_indexing iter_ranges supports
                # tuples alongside scalars and slices
                lo_v, hi_v = sel
                dr.intervals.append(
                    (_check_dt(dim, _cd_check(dim, box, lo_v)),
                     _check_dt(dim, _cd_check(dim, box, hi_v))))
            else:
                raise TypeError(f"Unsupported selection {sel!r}")
        out.append(dr)
    return out


