"""numpy <-> Spark SQL type mapping for the PySpark-native array engine.

Mirrors the reference's canonical dtype table
(``/root/reference/tiledb/datatypes.py:137-194`` ``_COMMON_DATATYPES`` and
``DataType.from_numpy`` at ``datatypes.py:18-83``) but targets Spark SQL
types instead of TileDB physical types.

Spark has no unsigned ints and only microsecond timestamps, so every
mapping carries an *annotation* (stored in the array manifest) that lets
reads restore the exact numpy dtype:

- unsigned ints  -> next-wider signed Spark type + ``{"unsigned": true}``
  (uint64 stays in LongType — documented precision caveat, same as Arrow's
  common practice when a wider type is unavailable).
- datetime64[Y..as] -> TimestampNTZ for us-representable units, else
  LongType + ``{"datetime_unit": u}``.
- timedelta64 -> LongType + ``{"timedelta_unit": u}``.
- fixed-width strings (``S n``/``U n``) -> String/Binary + width annotation.
- complex64/128 -> ArrayType(float/double, 2 cells).
- multi-value cells (ncells>1, homogeneous record dtypes,
  ``datatypes.py:34-45``) -> ArrayType(element) + ``{"ncells": n}``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
from pyspark.sql import types as T

# numpy datetime/timedelta units the reference supports
# (/root/reference/tiledb/datatypes.py:153-175)
_DATETIME_UNITS = ("Y", "M", "W", "D", "h", "m", "s", "ms", "us", "ns", "ps", "fs", "as")
_TIMEDELTA_UNITS = ("h", "m", "s", "ms", "us", "ns", "ps", "fs", "as")
# units exactly representable in a Spark microsecond timestamp
_TS_NATIVE_UNITS = {"D", "h", "m", "s", "ms", "us"}


@dataclass
class TypeInfo:
    """A resolved (numpy dtype <-> Spark type) mapping plus manifest annotations."""

    np_dtype: str  # numpy dtype str, e.g. "int64", "datetime64[ns]", "<U0"
    spark_type: T.DataType
    annotations: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> dict[str, Any]:
        return {
            "np_dtype": self.np_dtype,
            "spark_type": self.spark_type.json(),
            "annotations": self.annotations,
        }

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "TypeInfo":
        return cls(
            np_dtype=d["np_dtype"],
            spark_type=_parse_spark_type(d["spark_type"]),
            annotations=dict(d.get("annotations", {})),
        )


def _parse_spark_type(json_str: str) -> T.DataType:
    from pyspark.sql.types import _parse_datatype_json_string

    return _parse_datatype_json_string(json_str)


_SIGNED_FOR_UNSIGNED = {
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    # no wider signed type exists; LongType + annotation (precision caveat)
    "uint64": T.LongType(),
}

_SIMPLE = {
    "bool": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
}


def from_numpy(dtype: Any, ncells: Optional[int] = None, ascii: bool = False) -> TypeInfo:
    """Resolve a numpy dtype (or the 'ascii'/'blob' pseudo-dtypes of
    ``/root/reference/tiledb/datatypes.py:24-31``) to a TypeInfo.
    """
    if isinstance(dtype, str) and dtype in ("ascii", "blob", "wkb", "wkt"):
        st = T.StringType() if dtype == "ascii" else T.BinaryType()
        return TypeInfo(np_dtype="S0" if dtype == "ascii" else "bytes", spark_type=st,
                        annotations={"pseudo": dtype})

    dt = np.dtype(dtype)

    # record dtypes -> homogeneous multi-cell (datatypes.py:34-45)
    if dt.kind == "V" and dt.fields:
        sub = {np.dtype(f[0]) for f in dt.fields.values()}
        if len(sub) != 1:
            raise TypeError(f"heterogeneous record dtype {dt} not supported (reference rejects too)")
        elem = from_numpy(sub.pop())
        return TypeInfo(
            np_dtype=str(dt),
            spark_type=T.ArrayType(elem.spark_type, containsNull=False),
            annotations={"ncells": len(dt.fields), **elem.annotations},
        )

    name = dt.name

    if name in _SIMPLE:
        ti = TypeInfo(np_dtype=name, spark_type=_SIMPLE[name])
    elif name in _SIGNED_FOR_UNSIGNED:
        ti = TypeInfo(np_dtype=name, spark_type=_SIGNED_FOR_UNSIGNED[name],
                      annotations={"unsigned": True})
    elif dt.kind == "M":  # datetime64
        unit = np.datetime_data(dt)[0]
        if unit == "generic":
            raise TypeError("datetime64 requires an explicit unit")
        if unit in _TS_NATIVE_UNITS and unit != "D":
            ti = TypeInfo(np_dtype=str(dt), spark_type=T.TimestampNTZType(),
                          annotations={"datetime_unit": unit})
        elif unit == "D":
            ti = TypeInfo(np_dtype=str(dt), spark_type=T.DateType(),
                          annotations={"datetime_unit": unit})
        else:
            # ns and coarser-than-day units: int64 + unit annotation
            ti = TypeInfo(np_dtype=str(dt), spark_type=T.LongType(),
                          annotations={"datetime_unit": unit, "stored_as": "int64"})
    elif dt.kind == "m":  # timedelta64
        unit = np.datetime_data(dt)[0]
        ti = TypeInfo(np_dtype=str(dt), spark_type=T.LongType(),
                      annotations={"timedelta_unit": unit, "stored_as": "int64"})
    elif dt.kind == "U":
        ti = TypeInfo(np_dtype="<U0", spark_type=T.StringType(),
                      annotations={"fixed_width": dt.itemsize // 4} if dt.itemsize else {})
    elif dt.kind == "S":
        ti = TypeInfo(np_dtype="S0", spark_type=T.BinaryType(),
                      annotations={"fixed_width": dt.itemsize} if dt.itemsize else {})
    elif dt.kind == "O":
        # object dtype: treat as var-length UTF-8 string (pandas default)
        ti = TypeInfo(np_dtype="<U0", spark_type=T.StringType())
    elif name in ("complex64", "complex128"):
        elem = T.FloatType() if name == "complex64" else T.DoubleType()
        ti = TypeInfo(np_dtype=name, spark_type=T.ArrayType(elem, containsNull=False),
                      annotations={"complex": True, "ncells": 2})
    else:
        raise TypeError(f"unsupported dtype {dt!r}")

    if ncells is not None and ncells > 1 and not isinstance(ti.spark_type, T.ArrayType):
        ti = TypeInfo(np_dtype=ti.np_dtype,
                      spark_type=T.ArrayType(ti.spark_type, containsNull=False),
                      annotations={**ti.annotations, "ncells": ncells})
    return ti


def stored_scalar(v: Any, dt: Any) -> Any:
    """User-space scalar -> the column's STORED representation.

    datetime64[ns] and coarser-than-day units (and all timedelta64) are
    stored as raw int64 counts in the declared unit (``stored_as: int64``
    in TypeInfo); comparing such a LongType column to a timestamp literal
    fails or miscompares, so predicate compilation (range IR, query
    conditions, MBR pruning) converts bounds/values through this helper.
    Native-unit datetimes normalize to ``datetime.datetime`` (TimestampNTZ
    literals) / ``datetime.date`` for 'D'.  Identity for all other types;
    raw ints pass through unchanged for int64-stored columns (idempotent).
    """
    if v is None:
        return None
    dt = np.dtype(dt)
    if dt.kind == "M":
        unit = np.datetime_data(dt)[0]
        if unit in _TS_NATIVE_UNITS:
            if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
                v = np.datetime64(int(v), unit)  # raw count in the dim unit
            d64 = np.datetime64(v)
            if unit == "D":
                return d64.astype("datetime64[D]").item()
            return d64.astype("datetime64[us]").item()
        if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
            return int(v)
        return int(np.datetime64(v, unit).astype("int64"))
    if dt.kind == "m":
        unit = np.datetime_data(dt)[0]
        if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
            return int(v)
        return int(np.timedelta64(v, unit).astype("int64"))
    if dt.kind == "u" and dt.itemsize == 8:
        # uint64 is stored as the int64 bit pattern (no wider signed type);
        # values >= 2^63 (e.g. the max-value default fill) must be viewed,
        # not cast, into the stored column
        return int(np.array(v, dtype="uint64").view("int64")[()])
    return v


def default_fill(ti: TypeInfo) -> Any:
    """Default fill value for unwritten dense cells, mirroring the reference's
    per-type defaults (documented at
    ``/root/reference/tiledb/query_condition.py:36-40`` and
    ``attribute.py:87-104``): ints -> min value, floats -> NaN,
    strings/bytes -> empty... we use the same convention.
    """
    st = ti.spark_type
    if isinstance(st, T.BooleanType):
        return False
    if isinstance(st, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        if ti.annotations.get("unsigned"):
            # TileDB default fill for unsigned ints is the type's MAX value
            # (docs.tiledb.com writing#default-fill-values); np_dtype is the
            # declared unsigned type, e.g. "uint16" -> 65535
            return int(np.iinfo(np.dtype(ti.np_dtype)).max)
        bits = {"ByteType": 8, "ShortType": 16, "IntegerType": 32, "LongType": 64}[type(st).__name__]
        return -(2 ** (bits - 1))
    if isinstance(st, (T.FloatType, T.DoubleType)):
        return float("nan")
    if isinstance(st, T.StringType):
        return ""
    if isinstance(st, T.BinaryType):
        return b""
    return None


def numpy_to_python(v: Any) -> Any:
    """Convert numpy scalars to plain Python for JSON serialization.
    datetime64/timedelta64 must be checked BEFORE np.generic (both are,
    and their .item() yields datetime.datetime / datetime.timedelta —
    which json.dump rejects)."""
    if isinstance(v, np.datetime64):
        return str(v)
    if isinstance(v, np.timedelta64):
        # store the raw tick count; the unit lives in the dtype that
        # accompanies it on deserialization
        return int(v.view("int64"))
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return v.tolist()
    if hasattr(v, "isoformat"):  # datetime.datetime / pandas.Timestamp
        return v.isoformat()
    return v
