"""Result materialization: Spark/pandas results -> numpy dict with exact
reference dtypes.

The reference returns an ``OrderedDict[str, np.ndarray]``
(``/root/reference/tiledb/multirange_indexing.py:821-842``) with nullable
attrs as ``np.ma.MaskedArray`` (``dense_array.py:96-101``) and enumerated
attrs decoded from codes to labels (``dense_array.py:86-95``).  This module
restores those shapes from a pandas frame produced by ``toPandas()``
(Arrow transport), applying the manifest type annotations
(unsigned widening, datetime units — see datatypes.py).
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd

from .schema import ArraySchema


def restore_column(values: pd.Series, ti, nullable: bool,
                   enum_values=None) -> np.ndarray:
    ann = ti.annotations
    np_dtype = ti.np_dtype

    if enum_values is not None:
        codes = values.to_numpy()
        labels = np.asarray(enum_values, dtype=object)
        mask_bad = pd.isna(codes)
        codes_i = np.where(mask_bad, 0, codes).astype("int64")
        out = labels[codes_i]
        arr = np.asarray(out)
        if nullable:
            # ALWAYS MaskedArray for nullable attrs, even when this
            # batch has no nulls — a data-dependent result type breaks
            # callers doing result[name].mask (reference wraps
            # unconditionally, dense_array.py:96-101)
            return np.ma.MaskedArray(arr, mask=mask_bad)
        return arr

    if "datetime_unit" in ann:
        unit = ann["datetime_unit"]
        if ann.get("stored_as") == "int64":
            iv = values.to_numpy()
            if nullable:
                mask = pd.isna(values).to_numpy()
                iv = np.where(mask, 0, iv).astype("int64")
                return np.ma.MaskedArray(iv.view(f"datetime64[{unit}]"), mask=mask)
            return iv.astype("int64").view(f"datetime64[{unit}]")
        arr = values.to_numpy()
        if arr.dtype.kind != "M":
            arr = pd.to_datetime(values).to_numpy()
        arr = arr.astype(f"datetime64[{unit}]")
        if nullable:
            # native-unit (TimestampNTZ transport) nullable datetimes:
            # NULLs arrive as NaT — mask them like the stored_as=int64
            # branch does, or the null mask silently vanishes
            return np.ma.MaskedArray(arr, mask=np.isnat(arr))
        return arr

    if "timedelta_unit" in ann:
        unit = ann["timedelta_unit"]
        if nullable:
            # NaN-bearing float64 -> astype('int64') is platform-
            # dependent garbage; mask first like the datetime path
            mask = pd.isna(values).to_numpy()
            iv = np.where(mask, 0, values.to_numpy()).astype("int64")
            return np.ma.MaskedArray(iv.view(f"timedelta64[{unit}]"),
                                     mask=mask)
        return values.to_numpy().astype("int64").view(f"timedelta64[{unit}]")

    from pyspark.sql import types as T

    if isinstance(ti.spark_type, T.ArrayType):
        # multi-value cells: object ndarray of per-cell numpy arrays
        elem = np.dtype(np_dtype) if np.dtype(np_dtype).kind in "iuf" else None
        out = np.empty(len(values), dtype=object)
        for i, v in enumerate(values):
            if v is None:
                out[i] = None
            else:
                out[i] = np.asarray(v, dtype=elem) if elem is not None else np.asarray(v)
        return out

    if nullable:
        mask = pd.isna(values).to_numpy()
        dt = np.dtype(np_dtype)
        if dt.kind in "iub" and mask.any():
            base = np.where(mask, 0, values.to_numpy()).astype(dt)
        elif dt.kind in "iubf":
            base = values.to_numpy(dtype=dt, na_value=0)
        else:
            base = values.to_numpy()
        return np.ma.MaskedArray(base, mask=mask)

    dt = np.dtype(np_dtype)
    if dt.kind in "US" and dt.itemsize == 0:
        return values.to_numpy()
    try:
        return values.to_numpy().astype(dt)
    except (TypeError, ValueError):
        return values.to_numpy()


def pdf_to_numpy_dict(pdf: pd.DataFrame, schema: ArraySchema,
                      names: list[str]) -> "OrderedDict[str, np.ndarray]":
    out: OrderedDict[str, np.ndarray] = OrderedDict()
    for name in names:
        if schema.has_dim(name):
            d = schema.domain.dim(name)
            out[name] = restore_column(pdf[name], d.type_info, nullable=False)
        else:
            a = schema.attr(name)
            enum_vals = schema.enums[a.enum_label].values if a.enum_label else None
            out[name] = restore_column(pdf[name], a.type_info, a.nullable, enum_vals)
    return out
