"""Array data model: Dim, Domain, Attr, Enumeration, ArraySchema.

Pure-Python (no Spark dependency) re-expression of the reference's schema
classes:

- ``Dim``         <- /root/reference/tiledb/dimension.py:13-86
- ``Domain``      <- /root/reference/tiledb/domain.py:13
- ``Attr``        <- /root/reference/tiledb/attribute.py:14-111
- ``Enumeration`` <- /root/reference/tiledb/enumeration.py:15-137
- ``ArraySchema`` <- /root/reference/tiledb/array_schema.py:39-132

Physical storage is parquet fragments + a JSON manifest (see manifest.py);
these classes serialize into the manifest.  Tile extents become partition
hints; filters (compression pipelines, §2.9 of SURVEY.md) map to parquet
codec options and are retained as annotations.
"""

from __future__ import annotations

from typing import Any, Iterable, Optional, Sequence

import numpy as np

from .datatypes import TypeInfo, default_fill, from_numpy, numpy_to_python
from .filter_ import FilterList

__all__ = ["Dim", "Domain", "Attr", "Enumeration", "ArraySchema"]


def _as_filter_list(filters) -> FilterList:
    if filters is None:
        return FilterList()
    if isinstance(filters, FilterList):
        return filters
    return FilterList(list(filters))


class Enumeration:
    """Ordered categorical value list bound to an attribute
    (reference: ``tiledb/enumeration.py:15-137``).  Codes are the value's
    position.  Extendable: ``extend`` returns a new Enumeration with
    appended values (reference ``enumeration.py:120-137``).
    """

    def __init__(self, name: str, ordered: bool, values: Sequence[Any]):
        self.name = name
        self.ordered = bool(ordered)
        self.values = list(values)

    @property
    def dtype(self) -> np.dtype:
        """numpy dtype of the values (reference ``enumeration.py``)."""
        return np.asarray(self.values).dtype

    @property
    def cell_val_num(self) -> int:
        """Values per cell: the var-num sentinel for string
        enumerations, else 1 (reference ``enumeration.py``)."""
        return 2**32 - 1 if self.dtype.kind in ("U", "S", "O") else 1

    def extend(self, new_values: Sequence[Any]) -> "Enumeration":
        if set(new_values) & set(self.values):
            raise ValueError("extension values overlap existing enumeration values")
        return Enumeration(self.name, self.ordered, self.values + list(new_values))

    def index_of(self, value: Any) -> int:
        return self.values.index(value)

    def __eq__(self, other):
        return (isinstance(other, Enumeration) and self.name == other.name
                and self.ordered == other.ordered and self.values == other.values)

    def __repr__(self):
        return f"Enumeration(name={self.name!r}, ordered={self.ordered}, values={self.values!r})"

    def to_json(self):
        # bytes values need the same JSON-safe wrapper as Attr fills —
        # raw bytes crash json.dumps at manifest write time
        vals = []
        for v in self.values:
            v = numpy_to_python(v)
            if isinstance(v, bytes):
                v = {"__bytes__": v.decode("latin-1")}
            vals.append(v)
        return {"name": self.name, "ordered": self.ordered, "values": vals}

    @classmethod
    def from_json(cls, d):
        vals = [v["__bytes__"].encode("latin-1")
                if isinstance(v, dict) and "__bytes__" in v else v
                for v in d["values"]]
        return cls(d["name"], d["ordered"], vals)


class Dim:
    """A dimension: named coordinate column with a typed inclusive domain
    ``(lo, hi)`` and a tile extent (reference ``tiledb/dimension.py:13-86``).

    In the Spark build a dim is an ordinary column flagged ``role=dim``;
    the tile extent becomes the partition/bucket hint used when writing
    fragments (rows sorted/ranged by dim → parquet row-group pruning).
    """

    def __init__(self, name: str = "__dim_0", domain: Optional[tuple] = None,
                 tile: Optional[Any] = None, dtype: Any = np.uint64,
                 filters: Optional[list] = None, var: Optional[bool] = None):
        self.name = name
        self.type_info: TypeInfo = from_numpy(dtype)
        dt = None
        try:
            dt = np.dtype(dtype)
        except TypeError:
            pass
        self._is_string = (dt is not None and dt.kind in ("U", "S")) or dtype in ("ascii",)
        if self._is_string:
            self.domain = (None, None)
            self.tile = None
            self.var = True
        else:
            if domain is None:
                raise ValueError(f"dimension {name!r} requires a domain")
            lo, hi = domain
            if dt is not None and dt.kind == "M":
                # keep datetime domains as np.datetime64 (comparable in the
                # indexer); serialized to ISO strings in to_json
                self.domain = (np.datetime64(lo), np.datetime64(hi))
            else:
                self.domain = (numpy_to_python(lo), numpy_to_python(hi))
            self.tile = numpy_to_python(tile) if tile is not None else None
            self.var = bool(var) if var is not None else False
        self.filters = _as_filter_list(filters)

    @property
    def dtype(self) -> np.dtype:
        return np.dtype(self.type_info.np_dtype)

    @property
    def isvar(self) -> bool:
        return self.var

    @property
    def isanon(self) -> bool:
        """True for an anonymous dimension (reference
        ``dimension.py:217-223``)."""
        return self.name == "" or self.name.startswith("__dim")

    @property
    def shape(self) -> tuple:
        """Cell count along this dim as a 1-tuple — valid only for
        integer/datetime domains (reference ``dimension.py:236-252``)."""
        if not (np.issubdtype(self.dtype, np.integer)
                or np.issubdtype(self.dtype, np.datetime64)):
            raise TypeError(
                "shape only valid for integer and datetime dimension "
                "domains")
        lo, hi = self.domain
        if self.dtype.kind == "M":
            from .datatypes import stored_scalar

            lo, hi = stored_scalar(lo, self.dtype), stored_scalar(hi, self.dtype)
        return (int(hi) - int(lo) + 1,)

    @property
    def size(self) -> Optional[int]:
        if self.domain[0] is None or self._is_string:
            return None
        if self.dtype.kind in "iu":
            return int(self.domain[1]) - int(self.domain[0]) + 1
        return None

    def __eq__(self, other):
        return (isinstance(other, Dim) and self.name == other.name
                and self.domain == other.domain and self.tile == other.tile
                and self.type_info.np_dtype == other.type_info.np_dtype)

    def __repr__(self):
        return (f"Dim(name={self.name!r}, domain={self.domain!r}, "
                f"tile={self.tile!r}, dtype='{self.type_info.np_dtype}')")

    def create_label_schema(self, order: str = "increasing",
                            dtype: Any = np.int64):
        """Declare a dimension label on this dim (reference
        ``Dim.create_label_schema``; model in labels.py)."""
        from .labels import DimLabelSchema

        return DimLabelSchema(order=order, label_dtype=dtype)

    def to_json(self):
        return {"name": self.name,
                "domain": [numpy_to_python(self.domain[0]),
                           numpy_to_python(self.domain[1])],
                "tile": self.tile, "type": self.type_info.to_json(),
                "var": self.var, "filters": self.filters.to_json()}

    @classmethod
    def from_json(cls, d):
        ti = TypeInfo.from_json(d["type"])
        obj = cls.__new__(cls)
        obj.name = d["name"]
        obj.type_info = ti
        if ti.np_dtype.startswith("datetime64") and d["domain"][0] is not None:
            obj.domain = tuple(np.datetime64(x) for x in d["domain"])
        else:
            obj.domain = tuple(d["domain"])
        obj.tile = d["tile"]
        obj.var = d.get("var", False)
        obj.filters = FilterList.from_json(d.get("filters"))
        obj._is_string = ti.np_dtype in ("<U0", "S0")
        return obj


class Domain:
    """Ordered tuple of Dims (reference ``tiledb/domain.py:13``)."""

    def __init__(self, *dims: Dim):
        if not dims:
            raise ValueError("Domain requires at least one Dim")
        names = [d.name for d in dims]
        if len(set(names)) != len(names):
            raise ValueError("duplicate dimension names")
        self._dims = list(dims)

    @property
    def ndim(self) -> int:
        return len(self._dims)

    @property
    def shape(self) -> tuple:
        sizes = [d.size for d in self._dims]
        if any(s is None for s in sizes):
            raise TypeError("domain is not integer-sized; shape undefined")
        return tuple(sizes)

    def dim(self, key) -> Dim:
        if isinstance(key, int):
            return self._dims[key]
        for d in self._dims:
            if d.name == key:
                return d
        raise KeyError(key)

    def has_dim(self, name: str) -> bool:
        return any(d.name == name for d in self._dims)

    @property
    def homogeneous(self) -> bool:
        """True when every dim shares one dtype (reference
        ``domain.py:157-159``)."""
        return len({d.dtype for d in self._dims}) == 1

    @property
    def dtype(self) -> np.dtype:
        """The dtype of a homogeneous domain (reference
        ``domain.py:122-128``)."""
        if not self.homogeneous:
            raise TypeError("dtype undefined for a heterogeneous domain")
        return self._dims[0].dtype

    @property
    def size(self) -> int:
        """Total cell count — integer domains only (reference
        ``domain.py:141-150``)."""
        if not np.issubdtype(self.dtype, np.integer):
            raise TypeError("size valid only for integer domains")
        return int(np.prod(self.shape))

    def dump(self) -> None:
        """Print the domain (reference ``domain.py`` dump)."""
        print(repr(self), "\n")

    def __iter__(self):
        return iter(self._dims)

    def __len__(self):
        return len(self._dims)

    def __eq__(self, other):
        return isinstance(other, Domain) and self._dims == other._dims

    def __repr__(self):
        return f"Domain({', '.join(map(repr, self._dims))})"

    def to_json(self):
        return [d.to_json() for d in self._dims]

    @classmethod
    def from_json(cls, lst):
        return cls(*[Dim.from_json(d) for d in lst])


class Attr:
    """An attribute column (reference ``tiledb/attribute.py:14-111``):
    name, dtype, fill value, var-length flag, nullable flag, filter
    pipeline, optional enumeration label binding (``attribute.py:109-110``).
    """

    def __init__(self, name: str = "", dtype: Any = np.float64,
                 fill: Any = None, var: Optional[bool] = None,
                 nullable: bool = False, enum_label: Optional[str] = None,
                 filters: Optional[list] = None):
        self.name = name
        self.type_info = from_numpy(dtype)
        self.nullable = bool(nullable)
        self.enum_label = enum_label
        self.filters = _as_filter_list(filters)
        if var is None:
            var = self.type_info.np_dtype in ("<U0", "S0")
        self.var = bool(var)
        # var-length multi-value cells on a primitive dtype (reference
        # TILEDB_VAR_NUM attrs, attribute.py:74-79) -> ArrayType column
        from pyspark.sql import types as T

        if (self.var and not isinstance(self.type_info.spark_type,
                                        (T.ArrayType, T.StringType, T.BinaryType))):
            self.type_info = TypeInfo(
                np_dtype=self.type_info.np_dtype,
                spark_type=T.ArrayType(self.type_info.spark_type, containsNull=False),
                annotations={**self.type_info.annotations, "var_cells": True})
        self.fill = numpy_to_python(fill) if fill is not None else default_fill(self.type_info)

    @property
    def dtype(self) -> np.dtype:
        return np.dtype(self.type_info.np_dtype)

    @property
    def isvar(self) -> bool:
        return self.var

    @property
    def isnullable(self) -> bool:
        return self.nullable

    @property
    def isanon(self) -> bool:
        """True for an anonymous attribute (reference
        ``attribute.py:186-192``)."""
        return self.name == "" or self.name.startswith("__attr")

    @property
    def isascii(self) -> bool:
        """True for an ASCII-string attribute ONLY (reference
        ``attribute.py:271-278`` flags TILEDB_STRING_ASCII; blob/wkb/
        wkt share the bytes kind but are NOT ascii)."""
        pseudo = self.type_info.annotations.get("pseudo")
        if pseudo is not None:
            return pseudo == "ascii"
        try:
            return np.dtype(self.type_info.np_dtype).kind == "S"
        except TypeError:
            return False

    @property
    def ncells(self) -> int:
        """Scalar values per cell (reference ``attribute.py:260-268``);
        fixed multi-value record dtypes report their cell count,
        var-length cells the reference's TILEDB_VAR_NUM sentinel."""
        if self.var:
            return 2**32 - 1
        return int(self.type_info.annotations.get("ncells", 1))

    def dump(self) -> None:
        """Print the attribute (reference ``attribute.py:154-156``)."""
        print(repr(self), "\n")

    def __eq__(self, other):
        return (isinstance(other, Attr) and self.name == other.name
                and self.type_info.np_dtype == other.type_info.np_dtype
                and self.nullable == other.nullable and self.enum_label == other.enum_label)

    def __repr__(self):
        return (f"Attr(name={self.name!r}, dtype='{self.type_info.np_dtype}', "
                f"nullable={self.nullable}"
                + (f", enum_label={self.enum_label!r}" if self.enum_label else "") + ")")

    def to_json(self):
        fill = self.fill
        if isinstance(fill, float) and fill != fill:  # NaN -> JSON-safe token
            fill = "__nan__"
        if isinstance(fill, bytes):
            fill = {"__bytes__": fill.decode("latin-1")}
        return {"name": self.name, "type": self.type_info.to_json(), "fill": fill,
                "var": self.var, "nullable": self.nullable,
                "enum_label": self.enum_label, "filters": self.filters.to_json()}

    @classmethod
    def from_json(cls, d):
        obj = cls.__new__(cls)
        obj.name = d["name"]
        obj.type_info = TypeInfo.from_json(d["type"])
        fill = d["fill"]
        # decode the NaN token only for FLOAT attrs: a string attr whose
        # fill is literally "__nan__" must round-trip as that string
        if fill == "__nan__" and np.dtype(obj.type_info.np_dtype).kind == "f":
            fill = float("nan")
        if isinstance(fill, dict) and "__bytes__" in fill:
            fill = fill["__bytes__"].encode("latin-1")
        obj.fill = fill
        obj.var = d.get("var", False)
        obj.nullable = d.get("nullable", False)
        obj.enum_label = d.get("enum_label")
        obj.filters = FilterList.from_json(d.get("filters"))
        return obj


# cell/tile order tokens (reference ``array_schema.py:19-36``)
_ORDERS = {"row-major", "col-major", "global", "hilbert", "unordered", None}


class ArraySchema:
    """Array schema: domain + attrs + physical layout knobs
    (reference ``tiledb/array_schema.py:39-132``).

    Spark mapping: a StructType (dims first, then attrs) plus layout
    metadata persisted in the JSON manifest.  ``capacity`` (cells per data
    tile, ``array_schema.py:95``) becomes the target rows-per-parquet-row-group;
    ``allows_duplicates`` (``array_schema.py:210-218``) controls dedup on read.
    """

    def __init__(self, domain: Domain, attrs: Iterable[Attr], sparse: bool = False,
                 cell_order: str = "row-major", tile_order: str = "row-major",
                 capacity: int = 0, allows_duplicates: bool = False,
                 enums: Optional[Sequence[Enumeration]] = None,
                 dim_labels: Optional[dict] = None,
                 coords_filters: Optional[list] = None,
                 offsets_filters: Optional[list] = None,
                 validity_filters: Optional[list] = None,
                 ctx: Optional[Any] = None):
        if cell_order not in _ORDERS or tile_order not in _ORDERS:
            raise ValueError(f"unknown order; must be one of {_ORDERS}")
        if not sparse and allows_duplicates:
            raise ValueError("allows_duplicates requires a sparse array")
        if cell_order == "hilbert" and not sparse:
            raise ValueError("Hilbert order is only supported on sparse arrays")
        self.domain = domain
        self.attrs_list = list(attrs)
        names = [d.name for d in domain] + [a.name for a in self.attrs_list]
        if len(set(names)) != len(names):
            raise ValueError("duplicate column names across dims/attrs")
        self.sparse = bool(sparse)
        self.cell_order = cell_order
        self.tile_order = tile_order
        self.capacity = int(capacity) or 10000
        self.allows_duplicates = bool(allows_duplicates)
        self.enums = {e.name: e for e in (enums or [])}
        for a in self.attrs_list:
            if a.enum_label and a.enum_label not in self.enums:
                raise ValueError(f"attr {a.name!r} references unknown enumeration {a.enum_label!r}")
        # {dim_index: {label_name: DimLabelSchema}} (reference dim_labels
        # kwarg, array_schema.py:53,128-130)
        self.dim_labels = {}
        for dim_idx, by_name in (dim_labels or {}).items():
            dim_idx = int(dim_idx)
            if dim_idx >= domain.ndim:
                raise ValueError(f"dim_labels index {dim_idx} out of range")
            self.dim_labels[dim_idx] = dict(by_name)
            for spec in by_name.values():
                spec.dim_index = dim_idx

        self._current_domain = None  # Optional[CurrentDomain]
        # schema-level filter pipelines (reference array_schema.py ctor:
        # coords/offsets/validity) — declarative metadata here (parquet
        # codecs are chosen per-attr/dim); kept for round-trip parity
        self.coords_filters = _as_filter_list(coords_filters)
        self.offsets_filters = _as_filter_list(offsets_filters)
        self.validity_filters = _as_filter_list(validity_filters)

    def attr_or_dim_dtype(self, name: str) -> np.dtype:
        """dtype of the named attr or dim (reference
        ``array_schema.py:418-429``)."""
        if self.has_attr(name):
            dtype = self.attr(name).dtype
        elif self.domain.has_dim(name):
            dtype = self.domain.dim(name).dtype
        else:
            from .functions.query_condition import TileDBError

            raise TileDBError(
                f"Unknown attribute or dimension ({name!r})")
        if dtype.itemsize == 0:
            dtype = np.dtype((dtype, 1))
        return dtype

    def check(self) -> bool:
        """Validity check (reference ``array_schema.py:191-197``); the
        constructor already enforces every invariant, so a constructed
        schema is always valid."""
        return True

    @property
    def version(self) -> int:
        """Storage format version of this engine's manifest layout
        (reference ``array_schema.py:321-327``)."""
        return 1

    @property
    def ctx(self):
        from .ctx import default_ctx

        return default_ctx()

    def dump(self) -> None:
        """Print the schema (reference ``array_schema.py`` dump)."""
        print(repr(self), "\n")

    @classmethod
    def load(cls, uri: str, ctx=None, key=None) -> "ArraySchema":
        """Load the schema of an existing array (reference
        ``array_schema.py`` ArraySchema.load)."""
        if key is not None:
            raise NotImplementedError(
                "encrypted arrays are not supported (key=)")
        from . import manifest as mf

        return mf.read_manifest(uri).schema

    # -- current domain (reference array_schema.py:401-416) ------------------
    @property
    def current_domain(self):
        from .current_domain import CurrentDomain

        return self._current_domain or CurrentDomain()

    def set_current_domain(self, current_domain) -> None:
        self._current_domain = current_domain

    def current_domain_box(self) -> dict:
        """{dim_name: (lo, hi)} when a current domain is set, else {}."""
        cd = self._current_domain
        return cd.box(self.domain) if cd is not None and not cd.is_empty else {}

    def label_names(self) -> list[str]:
        return [n for by in self.dim_labels.values() for n in by]

    def has_dim_label(self, name: str) -> bool:
        return name in self.label_names()

    def dim_label(self, name: str):
        """The named dimension label's declaration (reference
        ``array_schema.py:371-385``)."""
        from .labels import DimLabel

        for dim_idx, by_name in self.dim_labels.items():
            if name in by_name:
                return DimLabel(name, by_name[name], dim_index=dim_idx)
        raise KeyError(f"unknown dimension label {name!r}")

    # -- reference API parity ------------------------------------------------
    @property
    def ndim(self) -> int:
        return self.domain.ndim

    @property
    def nattr(self) -> int:
        return len(self.attrs_list)

    @property
    def shape(self):
        return self.domain.shape

    def attr(self, key) -> Attr:
        if isinstance(key, int):
            return self.attrs_list[key]
        for a in self.attrs_list:
            if a.name == key:
                return a
        raise KeyError(key)

    def has_attr(self, name: str) -> bool:
        return any(a.name == name for a in self.attrs_list)

    def has_dim(self, name: str) -> bool:
        return self.domain.has_dim(name)

    @property
    def dim_names(self) -> list[str]:
        return [d.name for d in self.domain]

    @property
    def attr_names(self) -> list[str]:
        return [a.name for a in self.attrs_list]

    def enum(self, name: str) -> Enumeration:
        return self.enums[name]

    def __eq__(self, other):
        return (isinstance(other, ArraySchema) and self.domain == other.domain
                and self.attrs_list == other.attrs_list and self.sparse == other.sparse)

    def __repr__(self):
        kind = "sparse" if self.sparse else "dense"
        return (f"ArraySchema({kind}, domain={self.domain!r}, "
                f"attrs={self.attrs_list!r})")

    # -- Spark schema --------------------------------------------------------
    def spark_schema(self):
        """StructType with dim columns first, then attrs.  Enumerated attrs
        are stored as integer codes (dictionary encoding); decode happens at
        materialization (reference ``dense_array.py:86-95``)."""
        from pyspark.sql import types as T
        fields = []
        for d in self.domain:
            fields.append(T.StructField(d.name, d.type_info.spark_type, nullable=False))
        for a in self.attrs_list:
            st = T.IntegerType() if a.enum_label else a.type_info.spark_type
            fields.append(T.StructField(a.name, st, nullable=True))
        return T.StructType(fields)

    # -- serialization -------------------------------------------------------
    def to_json(self):
        out = {
            "sparse": self.sparse,
            "cell_order": self.cell_order,
            "tile_order": self.tile_order,
            "capacity": self.capacity,
            "allows_duplicates": self.allows_duplicates,
            "domain": self.domain.to_json(),
            "attrs": [a.to_json() for a in self.attrs_list],
            "enums": [e.to_json() for e in self.enums.values()],
            "dim_labels": {str(i): {n: s.to_json() for n, s in by.items()}
                           for i, by in self.dim_labels.items()},
            "current_domain": (self._current_domain.ndrectangle.to_json()
                               if self._current_domain is not None
                               and not self._current_domain.is_empty else None),
        }
        # written only when set — schemas without them stay byte-identical
        for key, fl in (("coords_filters", self.coords_filters),
                        ("offsets_filters", self.offsets_filters),
                        ("validity_filters", self.validity_filters)):
            if len(fl):
                out[key] = fl.to_json()
        return out

    @classmethod
    def from_file(cls, uri: Optional[str] = None, ctx=None):
        """ArraySchema for a Filestore array (reference
        ``array_schema.py:145-150``): the documented creation path is
        ``Array.create(uri, ArraySchema.from_file(...))`` followed by
        ``Filestore.copy_from``.  The ``uri`` argument only seeds
        defaults in the reference; the schema is the same either way."""
        from .filestore import filestore_schema

        return filestore_schema()

    @classmethod
    def from_json(cls, d):
        from .labels import DimLabelSchema

        return cls._restore_current_domain(cls(
            domain=Domain.from_json(d["domain"]),
            attrs=[Attr.from_json(a) for a in d["attrs"]],
            sparse=d["sparse"],
            cell_order=d.get("cell_order", "row-major"),
            tile_order=d.get("tile_order", "row-major"),
            capacity=d.get("capacity", 0),
            allows_duplicates=d.get("allows_duplicates", False),
            enums=[Enumeration.from_json(e) for e in d.get("enums", [])],
            dim_labels={int(i): {n: DimLabelSchema.from_json(s)
                                 for n, s in by.items()}
                        for i, by in d.get("dim_labels", {}).items()},
            coords_filters=FilterList.from_json(d.get("coords_filters")),
            offsets_filters=FilterList.from_json(d.get("offsets_filters")),
            validity_filters=FilterList.from_json(d.get("validity_filters")),
        ), d)

    @staticmethod
    def _restore_current_domain(schema, d):
        cdj = d.get("current_domain")
        if cdj:
            from .current_domain import CurrentDomain, NDRectangle

            cd = CurrentDomain()
            cd.set_ndrectangle(NDRectangle.from_json(schema.domain, cdj))
            schema._current_domain = cd
        return schema
