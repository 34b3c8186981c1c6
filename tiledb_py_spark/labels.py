"""Dimension labels (S8): label-based reads.

Reference: ``DimLabel`` (``/root/reference/tiledb/dimension_label.py``),
``Dim.create_label_schema``, ``Array.label_index``
(``array.py:987-1061``) and the two-phase label-resolution query
(``LabelIndexer``, ``multirange_indexing.py:663-733``).

Model: a label is a monotonic (increasing/decreasing) mapping
``dim coordinate -> label value`` attached to one dimension.  We store
each label as its own small parquet table ``<uri>/__labels/<name>/`` with
columns ``(__coord, __label)`` — the Spark analog of the reference's
hidden label sub-arrays.

Read path = the reference's two-phase plan: resolve label ranges to dim
coordinate ranges via the label table (phase 1, a lookup over a tiny
monotonic table), then run the main query with plain dim predicates
(phase 2).  At scale the label table is broadcast-joined instead of
collected; the compat API resolves driver-side exactly like the
reference's label query does.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Any, Optional

import numpy as np
import pandas as pd

LABELS_DIR = "__labels"


class DimLabelSchema:
    """Label declaration (reference ``Dim.create_label_schema``)."""

    def __init__(self, order: str = "increasing", label_dtype: Any = np.int64,
                 dim_index: int = 0):
        if order not in ("increasing", "decreasing"):
            raise ValueError("label order must be 'increasing' or 'decreasing'")
        self.order = order
        self.label_dtype = np.dtype(label_dtype)
        self.dim_index = dim_index

    def to_json(self):
        return {"order": self.order, "dtype": self.label_dtype.str,
                "dim_index": self.dim_index}

    @classmethod
    def from_json(cls, d):
        return cls(order=d["order"], label_dtype=np.dtype(d["dtype"]),
                   dim_index=d.get("dim_index", 0))


class DimLabel:
    """Read-only view of one dimension label's declaration
    (reference ``tiledb/dimension_label.py:12-100``): name, the dimension
    it labels, dtype, var-length flag, and data order."""

    def __init__(self, name: str, schema: DimLabelSchema,
                 uri: Optional[str] = None, dim_index: Optional[int] = None):
        self.name = name
        self._schema = schema
        self._uri = uri
        self._dim_index = dim_index

    @property
    def dim_index(self) -> int:
        return self._dim_index if self._dim_index is not None \
            else self._schema.dim_index

    @property
    def dtype(self):
        return self._schema.label_dtype

    @property
    def isvar(self) -> bool:
        """Var-length labels: variable-size strings/bytes."""
        return self._schema.label_dtype.kind in ("U", "S", "O") \
            and self._schema.label_dtype.itemsize == 0

    @property
    def isascii(self) -> bool:
        return self._schema.label_dtype.kind == "S"

    @property
    def label_attr_name(self) -> str:
        return "__label"

    @property
    def order(self) -> str:
        return self._schema.order

    @property
    def uri(self) -> Optional[str]:
        """Path of the label table, when attached to a stored array."""
        return self._uri

    def __repr__(self) -> str:
        dtype = "ascii" if self.isascii else self.dtype
        return (f"DimLabel(name={self.name}, dtype='{dtype!s}', "
                f"var={self.isvar!s}, order={self.order!s})")


def label_path(uri: str, name: str) -> str:
    return os.path.join(uri, LABELS_DIR, name)


def _label_file(uri: str, name: str) -> str:
    """Path of the label table, completing a crashed swap first: if a
    previous :func:`_swap_in` died between its two renames, the live
    path is missing and the ``.old`` sibling holds the only committed
    copy — rename it back so readers AND the next writer's
    read-modify-write see the durable table instead of KeyError /
    silently merging against nothing."""
    f = os.path.join(label_path(uri, name), "labels.parquet")
    old = f + ".old"
    if not os.path.exists(f) and os.path.exists(old):
        os.rename(old, f)
    return f


def _swap_in(staged: str, live: str) -> None:
    """Replace the live label table with ``staged`` without a window
    where NO table exists (the old rmtree-then-rename left exactly that
    window — a crash there lost the whole table): live -> .old,
    staged -> live, drop .old.  A crash between the renames leaves
    ``.old`` intact; :func:`_label_file` completes the swap backward.
    Single-writer per label table (the write_label_* contract)."""
    import shutil

    old = live + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)          # stale leftover of a COMPLETED swap
    elif os.path.exists(old):
        os.remove(old)
    if os.path.exists(live):
        os.rename(live, old)
    os.rename(staged, live)
    if os.path.isdir(old):
        shutil.rmtree(old, ignore_errors=True)
    elif os.path.exists(old):
        try:
            os.remove(old)
        except OSError:
            pass


def write_label_data(uri: str, name: str, coords: np.ndarray,
                     labels: np.ndarray) -> None:
    """Upsert label values for the given dim coordinates."""
    d = label_path(uri, name)
    os.makedirs(d, exist_ok=True)
    pdf = pd.DataFrame({"__coord": coords, "__label": labels})
    f = _label_file(uri, name)
    if os.path.exists(f):
        old = pd.read_parquet(f)
        old = old[~old["__coord"].isin(pdf["__coord"])]
        pdf = pd.concat([old, pdf], ignore_index=True)
    pdf = pdf.sort_values("__coord", kind="stable").reset_index(drop=True)
    tmp = f + ".tmp"
    pdf.to_parquet(tmp, index=False)
    if os.path.isdir(f):
        # the distributed path (write_label_dataframe) leaves a parquet
        # DIRECTORY; swap via the crash-safe rename dance
        _swap_in(tmp, f)
    else:
        os.replace(tmp, f)   # plain file over plain file: atomic


def write_label_dataframe(uri: str, name: str, df) -> None:
    """Distributed label upsert (the scale path for large label tables):
    ``df`` is a Spark DataFrame with columns ``(__coord, __label)``.  The
    existing table is anti-joined against the new coords (both sides stay
    distributed; no driver materialization, unlike ``write_label_data``'s
    read-modify-write), unioned, sorted by coord, and atomically swapped
    in.  One shuffle of the label table — O(label bytes), not O(driver
    RAM)."""
    from pyspark.sql import functions as F

    d = label_path(uri, name)
    os.makedirs(d, exist_ok=True)
    f = _label_file(uri, name)
    new = df.select(F.col("__coord"), F.col("__label"))
    if os.path.exists(f):
        spark = df.sparkSession
        old = spark.read.parquet(f)
        keep = old.join(new.select("__coord"), on="__coord", how="left_anti")
        new = keep.unionByName(new)
    # labels.parquet may be a single file (write_label_data compat path)
    # or a parquet directory (this path) — pandas and Spark read both.
    out_dir = f + ".staged"
    new.sortWithinPartitions("__coord").write.mode("overwrite").parquet(out_dir)
    for n in os.listdir(out_dir):  # _SUCCESS/.crc markers break pandas readers
        if not n.endswith(".parquet"):
            os.remove(os.path.join(out_dir, n))
    _swap_in(out_dir, f)   # crash-safe: never a no-table window


def read_label_data(uri: str, name: str) -> pd.DataFrame:
    f = _label_file(uri, name)   # completes a crashed swap if needed
    if not os.path.exists(f):
        raise KeyError(f"no data written for dimension label {name!r}")
    return pd.read_parquet(f)


def resolve_label_selection(uri: str, name: str, sel) -> tuple[Optional[tuple], np.ndarray, np.ndarray]:
    """Label-space selection -> (inclusive coord interval or None-if-empty,
    label values in coord order, matching coords in the same order).
    ``sel`` is a scalar or an inclusive slice in LABEL space
    (multi_index semantics, steps unsupported — reference labels reject
    stepped slices too).  The coords column lets callers align labels
    PER RESULT CELL (a coord can hold several cells on a
    multi-dim/duplicate-allowing array, and a coord inside the interval
    can hold none)."""
    pdf = read_label_data(uri, name)
    lab = pdf["__label"]
    if isinstance(sel, slice):
        if sel.step is not None:
            raise ValueError("stepped slices are not supported for label ranges")
        lo = sel.start
        hi = sel.stop
        mask = pd.Series(True, index=pdf.index)
        if lo is not None:
            mask &= lab >= lo
        if hi is not None:
            mask &= lab <= hi
    else:
        mask = lab == sel
    hit = pdf[mask]
    if len(hit) == 0:
        return (None, np.array([], dtype=pdf["__label"].dtype),
                np.array([], dtype=pdf["__coord"].dtype))
    coords = hit["__coord"]
    hit = hit.sort_values("__coord")
    return ((coords.min(), coords.max()), hit["__label"].to_numpy(),
            hit["__coord"].to_numpy())


class LabelIndexer:
    """``A.label_index(["l1"])[...]`` (reference
    ``multirange_indexing.py:663-733``)."""

    def __init__(self, array, labels: tuple, query=None):
        self.array = array
        self.labels = tuple(labels)
        # optional Query whose cond/attrs/dims apply to the read
        # (reference query.py:274-278 label_index-with-query)
        self.query = query
        if query is not None and query.dims == []:
            raise ValueError(
                "label reads need dimension coordinates; do not pass "
                "dims=False/coords=False to a query used with "
                "label_index")
        schema = array.schema
        self._by_dim: dict[int, str] = {}
        declared = schema.dim_labels or {}
        flat = {name: (dim_idx, spec)
                for dim_idx, names in declared.items()
                for name, spec in names.items()}
        for lbl in self.labels:
            if lbl not in flat:
                raise KeyError(f"no dimension label {lbl!r}")
            dim_idx, _spec = flat[lbl]
            if dim_idx in self._by_dim:
                raise ValueError(
                    f"only one label per dimension (dim {dim_idx} given twice)")
            self._by_dim[dim_idx] = lbl

    def _normalized_idx(self, selection):
        from .indexing import index_as_tuple, replace_ellipsis

        schema = self.array.schema
        idx = index_as_tuple(selection)
        idx = replace_ellipsis(schema.ndim, idx)
        if len(idx) != schema.ndim:
            idx = tuple(list(idx) + [slice(None)] * (schema.ndim - len(idx)))
        return idx

    def dataframe(self, selection):
        """Scale-path label read (the broadcast-join plan promised by the
        module docstring): every phase is distributed.

        Phase 1 reduces each label table to a (min, max) coord interval in
        Spark — only TWO scalars reach the driver, never the label table
        (the compat ``[]`` API materializes label values driver-side
        because it must return numpy arrays).  Phase 2 runs the main scan
        with the resolved dim interval (MBR pruning + parquet pushdown
        intact) and broadcast-joins the filtered label table to attach
        label columns — a BroadcastHashJoin, no shuffle of the main scan.
        """
        from pyspark.sql import functions as F

        from .plans import DimRanges, QueryPlan

        arr = self.array
        schema = arr.schema
        idx = self._normalized_idx(selection)

        ranges: list = []
        joins: list = []  # (dim_name, filtered label df aliased to lbl)
        empty = False
        for i, (d, sel) in enumerate(zip(schema.domain, idx)):
            if i not in self._by_dim:
                if isinstance(sel, slice):
                    if sel.step is not None:
                        raise ValueError(
                            "stepped slices are not supported in label "
                            "reads (multi_index semantics)")
                    lo, hi = sel.start, sel.stop
                else:
                    lo = hi = sel
                if lo is not None or hi is not None:
                    ranges.append(DimRanges(name=d.name, intervals=[(lo, hi)]))
                continue
            lbl = self._by_dim[i]
            f = _label_file(arr.uri, lbl)
            if not os.path.exists(f):
                raise KeyError(f"no data written for dimension label {lbl!r}")
            ldf = arr.spark.read.parquet(f)
            if isinstance(sel, slice):
                if sel.step is not None:
                    raise ValueError(
                        "stepped slices are not supported for label ranges")
                if sel.start is not None:
                    ldf = ldf.filter(F.col("__label") >= sel.start)
                if sel.stop is not None:
                    ldf = ldf.filter(F.col("__label") <= sel.stop)
            else:
                ldf = ldf.filter(F.col("__label") == sel)
            joins.append((d.name, ldf.select(
                F.col("__coord").alias(d.name), F.col("__label").alias(lbl))))
            if empty:
                continue  # result already empty — skip the (min,max) job
            row = ldf.agg(F.min("__coord").alias("lo"),
                          F.max("__coord").alias("hi")).collect()[0]
            if row.lo is None:
                empty = True
            else:
                ranges.append(DimRanges(name=d.name,
                                        intervals=[(row.lo, row.hi)]))

        if empty:
            df = arr._empty_df()
            for _dim, ldf in joins:
                lbl = ldf.columns[1]
                df = df.withColumn(lbl, F.lit(None).cast(ldf.schema[lbl].dataType))
            return df
        df = arr._execute(QueryPlan(dim_ranges=ranges))
        for dim_name, ldf in joins:
            df = df.join(F.broadcast(ldf), on=dim_name, how="inner")
        return df

    def __getitem__(self, selection):
        from .plans import DimRanges

        arr = self.array
        schema = arr.schema
        idx = self._normalized_idx(selection)

        ranges: list[DimRanges] = []
        label_values: "OrderedDict[str, np.ndarray]" = OrderedDict()
        label_maps: dict = {}   # lbl -> (dim_name, coords, interval)
        coord_slices = []
        empty = False
        ned = arr.nonempty_domain()
        for i, (d, sel) in enumerate(zip(schema.domain, idx)):
            if i in self._by_dim:
                lbl = self._by_dim[i]
                interval, vals, coords = resolve_label_selection(
                    arr.uri, lbl, sel)
                label_values[lbl] = vals
                label_maps[lbl] = (d.name, coords, interval)
                if interval is None:
                    empty = True
                    coord_slices.append(slice(0, 0))
                    continue
                lo, hi = interval
                ranges.append(DimRanges(name=d.name, intervals=[(lo, hi)]))
                coord_slices.append(slice(int(lo), int(hi) + 1))
            else:
                # plain domain-value selection (inclusive, multi_index rules)
                lo, hi = None, None
                if isinstance(sel, slice):
                    if sel.step is not None:
                        raise ValueError(
                            "stepped slices are not supported in label "
                            "reads (multi_index semantics)")
                    lo = sel.start
                    hi = sel.stop
                else:
                    lo = hi = sel
                if lo is None and ned is not None:
                    lo = ned[i][0]
                if hi is None and ned is not None:
                    hi = ned[i][1]
                if d.dtype.kind in "iu" and lo is not None:
                    coord_slices.append(slice(int(lo), int(hi) + 1))
                else:
                    coord_slices.append(slice(None))
                if lo is not None:
                    ranges.append(DimRanges(name=d.name, intervals=[(lo, hi)]))

        if schema.sparse:
            from .plans import QueryPlan

            if empty:
                df = arr._empty_df()
            else:
                # order="C": label_values are __coord-sorted, so the
                # cell rows must come back coord-sorted too — the
                # default unordered scan would row-misalign the label
                # column against the dim/attr columns after a
                # multi-fragment dedup shuffle
                if self.query is not None:
                    import dataclasses as _dc

                    plan = _dc.replace(self.query._plan(ranges),
                                       order="C")
                else:
                    plan = QueryPlan(dim_ranges=ranges, order="C")
                df = arr._execute(plan)
            pdf = df.toPandas()
            from .materialize import pdf_to_numpy_dict

            cells = pdf_to_numpy_dict(pdf, schema, list(pdf.columns))
            # Align labels PER RESULT CELL (coord -> label lookup on the
            # cell's own dim coordinate): positional pairing holds only
            # when every labeled coord carries exactly one cell — a
            # 2-D / duplicate-allowing array (several cells per coord)
            # or a label row whose coord has no cells silently
            # row-misaligned every following label value.
            out = OrderedDict()
            for lbl, vals in label_values.items():
                dim_name, coords, _ = label_maps[lbl]
                lut = dict(zip(coords.tolist(), vals.tolist()))
                cell_coords = cells.get(dim_name)
                if cell_coords is None or len(cell_coords) == 0:
                    out[lbl] = np.array([], dtype=vals.dtype)
                    continue
                missing = [c for c in dict.fromkeys(cell_coords.tolist())
                           if c not in lut]
                if missing:
                    raise KeyError(
                        f"dimension label {lbl!r} has no entry for "
                        f"{len(missing)} scanned coordinate(s) of "
                        f"{dim_name!r} (e.g. {missing[:3]}); label "
                        "tables must cover every labeled coordinate")
                out[lbl] = np.array([lut[c] for c in cell_coords.tolist()],
                                    dtype=vals.dtype)
            out.update(cells)
            return out

        # dense: reuse the fill-join subarray read, shape preserved
        if self.query is not None and (self.query.cond
                                       or self.query.attrs is not None):
            raise NotImplementedError(
                "query cond/attrs with label_index is supported on "
                "sparse arrays only; dense label reads go through the "
                "fill-join grid which has no condition slot yet")
        out = OrderedDict(label_values)
        for lbl, vals in label_values.items():
            dim_name, _coords, interval = label_maps[lbl]
            if interval is None:
                continue
            lo, hi = interval
            span = int(hi) - int(lo) + 1
            if len(vals) != span:
                # the dense grid materializes EVERY coord in [lo, hi];
                # a label table with holes would positionally misalign
                # the label axis against the grid — refuse loudly
                raise KeyError(
                    f"dimension label {lbl!r} covers {len(vals)} of "
                    f"{span} coordinates in [{lo}, {hi}]; dense label "
                    "reads need a gap-free label table over the "
                    "matched interval")
        if empty:
            for a in schema.attr_names:
                out[a] = np.empty(tuple(0 for _ in range(schema.ndim)),
                                  dtype=schema.attr(a).dtype)
            return out
        res = arr.subarray(tuple(coord_slices))
        if isinstance(res, dict):
            out.update(res)
        else:
            out[arr.view_attr or schema.attr(0).name] = res
        return out
