"""Ingestion: pandas / CSV / parquet -> array, and array -> pandas.

Reference:
- ``from_pandas``      <- /root/reference/tiledb/dataframe_.py:534-779
- dtype inference      <- ``ColumnInfo.from_values/from_dtype`` dataframe_.py:147-271
- ``from_csv``         <- dataframe_.py:850-1013
- ``from_parquet``     <- parquet_.py:4-9
- ``open_dataframe``   <- dataframe_.py:782-808
- pandas metadata keys <- dataframe_.py:493-504 (__pandas_attribute_repr /
  __pandas_index_dims analogs live in the manifest's ``pandas_meta``)

Sparse-vs-dense inference follows ``_sparse_from_dtypes``
(dataframe_.py:406-425): explicit index -> sparse; default RangeIndex ->
dense over a synthetic ``__tiledb_rows`` dimension.  Dim tile defaults by
ndim (10000/1000/100/10) follow dataframe_.py:469-476.

Scale path: ``from_spark`` ingests a Spark DataFrame as a fragment without
driver materialization; ``from_csv``/``from_parquet`` accept either pandas
kwargs (compat) or a SparkSession for distributed reads.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pandas as pd

from .. import manifest as mf
from ..schema import ArraySchema, Attr, Dim, Domain, Enumeration
from .fragment_writer import write_fragment_pandas, write_fragment_spark

_TILE_BY_NDIM = {1: 10000, 2: 1000, 3: 100}
ROWS_DIM = "__tiledb_rows"


def _tile_default(ndim: int) -> int:
    return _TILE_BY_NDIM.get(ndim, 10)


def _infer_attr(name: str, s: pd.Series):
    """pandas dtype -> (Attr, Optional[Enumeration], stored_series)."""
    if isinstance(s.dtype, pd.CategoricalDtype):
        enum = Enumeration(name, bool(s.cat.ordered), list(s.cat.categories))
        attr = Attr(name=name, dtype=np.int32, nullable=bool(s.isna().any()),
                    enum_label=name)
        codes = s.cat.codes.astype("int32")
        if attr.nullable:
            # nullable extension dtype, NOT .where(pd.NA) on the plain
            # int series — that upcast the column to object and pyarrow
            # stored DOUBLE under the declared int32 schema (Spark
            # reads of nullable-enum arrays then failed with a parquet
            # type mismatch)
            stored = codes.astype("Int32").where(codes >= 0, other=pd.NA)
        else:
            stored = codes
        return attr, enum, stored
    dt = s.dtype
    nullable = bool(s.isna().any())
    if pd.api.types.is_extension_array_dtype(dt):  # Int64, boolean, string...
        if not hasattr(dt, "numpy_dtype"):
            # DatetimeTZDtype/Period/...: mapping to object would declare
            # a var-string attr over a TIMESTAMP parquet column — silent
            # schema/data skew on every read.  Refuse with the recipe.
            raise TypeError(
                f"column {name!r} has extension dtype {dt} with no numpy "
                "storage equivalent; convert it first (tz-aware "
                "datetimes: .dt.tz_convert('UTC').dt.tz_localize(None))")
        base = dt.numpy_dtype
        nullable = True
        return Attr(name=name, dtype=base, nullable=True), None, s
    if dt == object:
        first = s.dropna()
        if len(first) and isinstance(first.iloc[0], bytes):
            return Attr(name=name, dtype=np.bytes_, nullable=nullable), None, s
        if len(first) and isinstance(first.iloc[0], (list, tuple, np.ndarray)):
            # var-length multi-value cells (e.g. embeddings): element dtype
            # from the first cell (reference var attrs, attribute.py:74-79).
            # Only NUMERIC elements are expressible — a silent
            # var-float64 declaration over list<string>/list<struct>
            # parquet would disagree with the stored data on every read
            elem = np.asarray(first.iloc[0])
            if elem.dtype.kind not in "iuf":
                raise TypeError(
                    f"column {name!r} holds lists of "
                    f"{elem.dtype.kind!r}-kind elements; only numeric "
                    "multi-value cells are supported — store strings as "
                    "one delimited string, or explode to rows upstream")
            return Attr(name=name, dtype=elem.dtype, var=True,
                        nullable=nullable), None, s
        return Attr(name=name, dtype=np.str_, nullable=nullable), None, s
    if np.issubdtype(dt, np.floating):
        # reference treats float NaN as data, not null, unless pandas NA
        return Attr(name=name, dtype=dt, nullable=False), None, s
    return Attr(name=name, dtype=dt, nullable=nullable), None, s


def _infer_dim(name: str, s: pd.Series, full_domain: bool, tile: Optional[int],
               ndim: int) -> Dim:
    dt = s.dtype
    if dt == object or str(dt) == "string":
        return Dim(name=name, dtype=np.str_)
    if np.issubdtype(dt, np.datetime64):
        # keep the series' unit (pandas default ns -> DATETIME_NS dim, like
        # the reference); coercing to us would corrupt sub-us coordinates
        unit = np.datetime_data(dt)[0]
        try:
            day = max(1, int(np.timedelta64(1, "D") / np.timedelta64(1, unit)))
        except TypeError:  # units coarser than a day (W/M/Y)
            day = 1
        if full_domain:
            # near-full int64 range in the unit (iinfo.min is the NaT
            # sentinel — excluded); without this, chunked ingest pins
            # the domain to chunk 1 and later chunks land out-of-domain
            lo = np.int64(np.iinfo(np.int64).min + 1).view(f"M8[{unit}]")
            hi = np.int64(np.iinfo(np.int64).max - (tile or day)) \
                .view(f"M8[{unit}]")
        else:
            lo, hi = np.datetime64(s.min(), unit), np.datetime64(s.max(), unit)
        return Dim(name=name, domain=(lo, hi), tile=tile or day, dtype=dt)
    if full_domain and np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        # leave headroom for tile extents like the reference — but CLAMP
        # for small-int dtypes, where the default headroom exceeds the
        # whole range and produced an INVERTED domain (int8: (-128,
        # -9873)) that rejected every write
        t = tile or _tile_default(ndim)
        hi = info.max - t
        if hi <= info.min:
            hi = info.max - 1
            t = min(t, int(hi) - int(info.min) + 1)
        return Dim(name=name, domain=(info.min, hi), tile=t, dtype=dt)
    if full_domain and np.issubdtype(dt, np.floating):
        # floats get the full finite range (reference dim_info full_domain
        # covers every numeric dtype, not just ints) — without this,
        # chunked ingest pins the domain to chunk 1's min/max and every
        # later chunk is rejected as out-of-domain
        info = np.finfo(dt)
        return Dim(name=name, domain=(float(info.min), float(info.max)),
                   tile=tile or _tile_default(ndim), dtype=dt)
    lo, hi = s.min(), s.max()
    return Dim(name=name, domain=(lo, hi), tile=tile or _tile_default(ndim), dtype=dt)


def from_pandas(uri: str, dataframe: pd.DataFrame, index_dims: Optional[list] = None,
                sparse: Optional[bool] = None, mode: str = "ingest",
                full_domain: bool = False, tile=None, capacity: int = 0,
                allows_duplicates: bool = False, **kwargs) -> None:
    """Create (or append to) an array from a pandas DataFrame."""
    if mode not in ("ingest", "schema_only", "append"):
        raise ValueError(f"invalid mode {mode!r}")
    pdf = dataframe.copy()

    # resolve index dims: explicit arg > named index > synthetic row dim
    if index_dims is None:
        if pdf.index.name is not None or isinstance(pdf.index, pd.MultiIndex):
            pdf = pdf.reset_index()
            if isinstance(dataframe.index, pd.MultiIndex):
                index_dims = [n or f"level_{i}" for i, n in enumerate(dataframe.index.names)]
            else:
                index_dims = [dataframe.index.name]
        else:
            index_dims = []
    else:
        missing = [c for c in index_dims if c not in pdf.columns]
        # a MultiIndex has .name None — check the level names too, or
        # explicit index_dims naming index levels KeyError later
        if missing and (pdf.index.name in missing
                        or set(missing) & set(pdf.index.names)):
            pdf = pdf.reset_index()
        index_dims = list(index_dims)
        still = [c for c in index_dims if c not in pdf.columns]
        if still:
            raise KeyError(
                f"index_dims {still} not found in the DataFrame's "
                f"columns or index levels (columns: {list(pdf.columns)})")

    if sparse is None:
        sparse = bool(index_dims)  # _sparse_from_dtypes analog

    # filter declarations are popped up-front so ANY leftover keyword —
    # a typo like attr_filter=, or an unsupported reference option — is
    # refused loudly instead of silently ignored (the from_csv(spark=)
    # posture)
    attr_filters = kwargs.pop("attr_filters", None)
    dim_filters = kwargs.pop("dim_filters", None)
    kwargs.pop("spark", None)   # accepted for call-site symmetry with
    if kwargs:                  # from_spark; the write is driver-side
        raise TypeError(
            f"from_pandas got unsupported keyword(s) {sorted(kwargs)}; "
            "supported extras are attr_filters/dim_filters/spark")

    if mode == "append":
        if not mf.array_exists(uri):
            raise FileNotFoundError(f"append to nonexistent array {uri}")
        man = mf.read_manifest(uri)
        schema = man.schema
        row_offset = 0
        if schema.dim_names == [ROWS_DIM] and ROWS_DIM not in pdf.columns:
            # default-index arrays (dense OR sparse — from_spark creates
            # the sparse flavor): synthesize the row coordinates; the old
            # dense-only guard made pandas appends to from_spark arrays
            # crash with a raw KeyError('__tiledb_rows')
            ned = man.nonempty_domain()
            row_offset = (int(ned[0][1]) + 1) if ned and ned[0][0] is not None else 0
            pdf = pdf.copy()
            pdf[ROWS_DIM] = np.arange(row_offset, row_offset + len(pdf), dtype="int64")
        stored = _encode_for_schema(pdf, schema)
        write_fragment_pandas(uri, schema, stored)
        return

    def _filters_for(spec, name):
        if spec is None:
            return None
        return spec.get(name) if isinstance(spec, dict) else spec

    ndim = max(len(index_dims), 1)
    dims = []
    tiles = tile if isinstance(tile, dict) else {}
    if index_dims:
        for dname in index_dims:
            t = tiles.get(dname, tile if isinstance(tile, int) else None)
            d = _infer_dim(dname, pdf[dname], full_domain, t, ndim)
            fl = _filters_for(dim_filters, dname)
            if fl is not None:
                from ..schema import _as_filter_list

                d.filters = _as_filter_list(fl)
            dims.append(d)
    else:
        n = len(pdf)
        hi = np.iinfo(np.int64).max - _tile_default(1) if full_domain else max(n - 1, 0)
        dims.append(Dim(name=ROWS_DIM, domain=(0, hi),
                        tile=_tile_default(1), dtype=np.int64))
        pdf = pdf.copy()
        pdf[ROWS_DIM] = np.arange(n, dtype="int64")

    attrs, enums = [], []
    stored_cols = {}
    for cname in dataframe.columns:
        if cname in index_dims:
            continue
        attr, enum, stored = _infer_attr(cname, pdf[cname])
        fl = _filters_for(attr_filters, cname)
        if fl is not None:
            from ..schema import _as_filter_list

            attr.filters = _as_filter_list(fl)
        attrs.append(attr)
        if enum is not None:
            enums.append(enum)
        stored_cols[cname] = stored

    schema = ArraySchema(
        domain=Domain(*dims), attrs=attrs, sparse=sparse,
        capacity=capacity, allows_duplicates=allows_duplicates, enums=enums)
    mf.create_array(uri, schema)

    pandas_meta = {
        "attribute_dtypes": {c: str(dataframe[c].dtype) for c in dataframe.columns
                             if c not in index_dims},
        "index_dims": index_dims if index_dims else [ROWS_DIM],
        "default_index": not bool(index_dims),
    }
    mf.commit(uri, lambda m: m.pandas_meta.update(pandas_meta))

    if mode == "ingest":
        out = pd.DataFrame({d.name: pdf[d.name] for d in dims})
        for a in attrs:
            out[a.name] = stored_cols[a.name]
        write_fragment_pandas(uri, schema, out)


def _encode_for_schema(pdf: pd.DataFrame, schema: ArraySchema) -> pd.DataFrame:
    out = pd.DataFrame()
    for d in schema.domain:
        out[d.name] = pdf[d.name]
    for a in schema.attrs_list:
        s = pdf[a.name]
        if a.enum_label:
            enum = schema.enums[a.enum_label]
            if isinstance(s.dtype, pd.CategoricalDtype):
                s = s.astype(object)   # unify: validate labels below
            # labels outside the stored enumeration must refuse loudly
            # (the reference raises for values not in the enumeration);
            # the old .map().astype('int32') either crashed with a raw
            # IntCastingNaNError or silently wrote code -1 (read back
            # as null) for unseen categoricals
            lookup = {v: i for i, v in enumerate(enum.values)}
            unknown = sorted({str(v) for v in s.dropna().unique()
                              if v not in lookup})
            if unknown:
                raise ValueError(
                    f"attribute {a.name!r}: values {unknown[:5]} are not "
                    f"in the stored enumeration {a.enum_label!r} "
                    f"({len(enum.values)} labels); extend the "
                    "enumeration before appending")
            codes = s.map(lookup)
            if codes.isna().any():
                if not a.nullable:
                    raise ValueError(
                        f"attribute {a.name!r} is not nullable but the "
                        "append batch contains nulls")
                out[a.name] = codes.astype("Int32")
            else:
                out[a.name] = codes.astype("int32")
        else:
            declared = np.dtype(a.dtype)
            if declared.kind in "iu" and pd.api.types.is_float_dtype(s):
                # chunked-ingest drift: a later chunk's integer column
                # read as float (NaN appeared) would write DOUBLE parquet
                # under the int schema — fragment 2 silently disagreeing
                # with fragment 1
                if s.isna().any():
                    if not a.nullable:
                        raise ValueError(
                            f"attribute {a.name!r} is {declared} and not "
                            "nullable, but this batch's column is float "
                            "with nulls (chunked-ingest dtype drift)")
                    bits = declared.itemsize * 8
                    ext = ("UInt" if declared.kind == "u" else "Int")
                    out[a.name] = s.astype(f"{ext}{bits}")
                    continue
                if not np.array_equal(
                        s.to_numpy(),
                        s.to_numpy().astype(declared).astype(s.dtype)):
                    raise ValueError(
                        f"attribute {a.name!r} is {declared} but this "
                        "batch's column holds non-integral floats")
                out[a.name] = s.astype(declared)
            else:
                out[a.name] = s
    return out


def from_csv(uri: str, csv_file, mode: str = "ingest", index_dims=None,
             sparse=None, full_domain: bool = False, chunksize: Optional[int] = None,
             spark=None, **pandas_kwargs) -> None:
    """CSV ingest (reference ``dataframe_.py:850-1013``).  Accepts one path
    or a list; ``chunksize`` streams pandas chunks into separate fragments
    (the reference's chunked ingest); pass ``spark`` for a distributed read
    at scale."""
    files = csv_file if isinstance(csv_file, (list, tuple)) else [csv_file]
    if spark is not None:
        # honor the pandas kwargs the Spark reader can express; refuse
        # the rest loudly — silently dropping sep= would parse every
        # row as one comma-joined string and ingest the corpus garbled
        opts = {"inferSchema": "true", "header": "true"}
        kw = dict(pandas_kwargs)
        sep = kw.pop("sep", kw.pop("delimiter", None))
        if sep is not None:
            opts["sep"] = sep
        if "header" in kw:
            opts["header"] = "false" if kw.pop("header") is None else "true"
        if kw:
            raise NotImplementedError(
                f"from_csv(spark=...) cannot express pandas kwargs "
                f"{sorted(kw)}; use the pandas path (spark=None) or "
                "pre-read with spark.read.csv and call from_spark")
        reader = spark.read
        for k, v in opts.items():
            reader = reader.option(k, v)
        sdf = reader.csv(list(files))
        from_spark(uri, sdf, index_dims=index_dims, sparse=sparse, mode=mode,
                   full_domain=full_domain)
        return
    if chunksize is not None:
        first = mode in ("ingest", "schema_only")
        for f in files:
            for chunk in pd.read_csv(f, chunksize=chunksize, **pandas_kwargs):
                if first:
                    from_pandas(uri, chunk, index_dims=index_dims, sparse=sparse,
                                mode=mode, full_domain=True)
                    if mode == "schema_only":
                        # schema_only means CREATE the array from the first
                        # chunk's shape and stop — appending the remaining
                        # chunks would ingest the whole corpus (the
                        # reference's from_csv breaks after the first batch
                        # in schema_only mode: dataframe_.py:990-998)
                        return
                    first = False
                else:
                    from_pandas(uri, chunk, mode="append")
        return
    pdf = pd.concat([pd.read_csv(f, **pandas_kwargs) for f in files], ignore_index=True)
    from_pandas(uri, pdf, index_dims=index_dims, sparse=sparse, mode=mode,
                full_domain=full_domain)


def _flatten_structs(sdf):
    """Recursively lift struct leaves to top-level ``parent_child``
    columns (attr schemas are flat — the engine has no nested type)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols, names, again = [], [], False
    for f in sdf.schema.fields:
        if isinstance(f.dataType, T.StructType):
            again = True
            for sub in f.dataType.fields:
                cols.append(F.col(f"`{f.name}`.`{sub.name}`")
                            .alias(f"{f.name}_{sub.name}"))
                names.append(f"{f.name}_{sub.name}")
        else:
            cols.append(F.col(f"`{f.name}`"))
            names.append(f.name)
    # same loud refusal as _flatten_pandas_json: a flattened
    # 'parent_child' alias colliding with an existing top-level column
    # would otherwise produce two same-named columns (ambiguous refs /
    # duplicate attrs downstream)
    clash = sorted({n for n in names if names.count(n) > 1})
    if clash:
        raise ValueError(
            f"flattened column names {clash} collide with existing "
            "top-level columns; rename the conflicting fields upstream")
    out = sdf.select(*cols)
    return _flatten_structs(out) if again else out


def _flatten_pandas_json(pdf, flatten: bool):
    """Mirror the spark path's nested-object handling on the pandas
    paths: dict-valued columns either raise (flatten=False — the same
    loud refusal as the spark path) or are lifted to ``parent_child``
    columns via ``pd.json_normalize`` (flatten=True).  Without this the
    pandas paths would silently ingest nested JSON objects as
    object-dtype dict columns — mis-stored data, not an error."""
    nested = [c for c in pdf.columns
              if pdf[c].dtype == object
              and pdf[c].map(lambda v: isinstance(v, dict)).any()]
    if not nested:
        return pdf
    if not flatten:
        raise ValueError(
            f"JSON objects in {nested} are nested; the array schema "
            "is flat — pass flatten=True to lift struct leaves to "
            "parent_child columns (arrays of structs cannot be "
            "flattened; project them upstream)")
    # a column mixing dicts and scalars cannot flatten losslessly —
    # json_normalize would emit the scalar rows into a residual
    # object column (silent mis-storage); refuse instead
    for c in nested:
        bad = pdf[c].map(
            lambda v: not isinstance(v, dict) and v is not None
            and not (pd.api.types.is_scalar(v) and pd.isna(v)))
        if bad.any():
            raise ValueError(
                f"column {c!r} mixes JSON objects and scalars "
                f"(e.g. row {int(bad.idxmax())}); flatten=True needs "
                "every non-null value to be an object — clean the "
                "column upstream")
    # flatten PER COLUMN: a joint json_normalize last-wins-merges when
    # two nested columns flatten to the same name (a={'b_c':1} and
    # a_b={'c':2} both become a_b_c — one value silently discarded);
    # per-column frames let every collision be detected before any loss
    flats = []
    owner: dict = {}
    for c in nested:
        sub = pd.json_normalize(
            [v if isinstance(v, dict) else {} for v in pdf[c]], sep="_")
        sub.columns = [f"{c}_{k}" for k in sub.columns]
        for n in sub.columns:
            if n in owner:
                raise ValueError(
                    f"flattened name {n!r} is produced by BOTH nested "
                    f"columns {owner[n]!r} and {c!r}; rename the "
                    "conflicting fields upstream")
            owner[n] = c
        sub.index = pdf.index
        flats.append(sub)
    rest = pdf.drop(columns=nested)
    clash = sorted(set(owner) & set(rest.columns))
    if clash:
        raise ValueError(
            f"flattened column names {clash} collide with existing "
            "top-level columns; rename the conflicting fields upstream")
    return pd.concat([rest] + flats, axis=1)


def from_json(uri: str, json_file, mode: str = "ingest", index_dims=None,
              sparse=None, full_domain: bool = False,
              chunksize: Optional[int] = None, spark=None,
              flatten: bool = False, **pandas_kwargs) -> None:
    """JSONL / newline-delimited JSON ingest — the ``from_csv`` surface
    (S16 shape) for the dominant raw-corpus interchange format (web
    crawls, instruction data, chat logs ship as .jsonl).  Accepts one
    path or a list; ``spark`` routes through ``spark.read.json`` (the
    distributed path — JSONL is splittable, so a 1 TB file scans
    parallel) with schema inference; without it, pandas
    ``read_json(lines=True)`` handles small files, with ``chunksize``
    streaming chunks into separate fragments like the reference's
    chunked CSV ingest."""
    files = json_file if isinstance(json_file, (list, tuple)) else [json_file]
    if spark is not None:
        from pyspark.sql import types as T

        if pandas_kwargs:
            raise NotImplementedError(
                f"from_json(spark=...) cannot express pandas kwargs "
                f"{sorted(pandas_kwargs)}; use the pandas path "
                "(spark=None) or pre-read with spark.read.json and "
                "call from_spark")
        sdf = spark.read.json(list(files))
        nested = [f.name for f in sdf.schema.fields
                  if isinstance(f.dataType, T.StructType)]
        if nested and flatten:
            sdf = _flatten_structs(sdf)
        elif nested:
            raise ValueError(
                f"JSON objects in {nested} are nested; the array schema "
                "is flat — pass flatten=True to lift struct leaves to "
                "parent_child columns (arrays of structs cannot be "
                "flattened; project them upstream)")
        from_spark(uri, sdf, index_dims=index_dims, sparse=sparse, mode=mode,
                   full_domain=full_domain)
        return
    if chunksize is not None:
        first = mode in ("ingest", "schema_only")
        for f in files:
            for chunk in pd.read_json(f, lines=True, chunksize=chunksize,
                                      **pandas_kwargs):
                chunk = _flatten_pandas_json(chunk, flatten)
                if first:
                    from_pandas(uri, chunk, index_dims=index_dims,
                                sparse=sparse, mode=mode, full_domain=True)
                    if mode == "schema_only":
                        # create-from-first-chunk then stop (see from_csv)
                        return
                    first = False
                else:
                    from_pandas(uri, chunk, mode="append")
        return
    pdf = pd.concat([pd.read_json(f, lines=True, **pandas_kwargs)
                     for f in files], ignore_index=True)
    pdf = _flatten_pandas_json(pdf, flatten)
    from_pandas(uri, pdf, index_dims=index_dims, sparse=sparse, mode=mode,
                full_domain=full_domain)


def from_parquet(uri: str, parquet_uri, spark=None, index_dims=None,
                 sparse=None, mode: str = "ingest",
                 full_domain: bool = False) -> None:
    """Parquet ingest (reference ``parquet_.py:4-9`` routes via pandas; the
    Spark path keeps it distributed)."""
    if spark is not None:
        # DataFrameReader.parquet is varargs (*paths) — unlike csv()/
        # json() it does NOT accept a list; passing one crashed in py4j
        sdf = (spark.read.parquet(parquet_uri)
               if isinstance(parquet_uri, str)
               else spark.read.parquet(*parquet_uri))
        from_spark(uri, sdf, index_dims=index_dims, sparse=sparse, mode=mode,
                   full_domain=full_domain)
        return
    pdf = pd.read_parquet(parquet_uri)
    from_pandas(uri, pdf, index_dims=index_dims, sparse=sparse, mode=mode,
                full_domain=full_domain)


def from_spark(uri: str, df, index_dims: Optional[list] = None,
               sparse: Optional[bool] = None, mode: str = "ingest",
               full_domain: bool = False) -> None:
    """Spark-native ingestion: infer the array schema from the DataFrame
    schema on the driver, then write fragments distributed.  This is the
    100 TB ingest path — no pandas materialization anywhere.
    ``full_domain`` declares integer dims over their full dtype range
    (the from_pandas convention) so later appends with out-of-batch
    coordinates stay inside the declared domain."""
    from pyspark.sql import functions as F

    if mode not in ("ingest", "schema_only", "append"):
        # from_pandas raises too — an unknown mode must not silently
        # behave like schema_only (create + write nothing)
        raise ValueError(f"invalid mode {mode!r}")
    index_dims = list(index_dims or [])
    sparse_explicit = sparse is not None
    if sparse is None:
        sparse = bool(index_dims)
    if mode == "append":
        man = mf.read_manifest(uri)
        schema = man.schema
        if schema.dim_names == [ROWS_DIM] and ROWS_DIM not in df.columns:
            # default-index arrays: generate the synthetic row coords
            # (mirrors from_pandas append — without this the fragment
            # writer would commit coordinate-less rows)
            ned = man.nonempty_domain()
            offset = (int(ned[0][1]) + 1) \
                if ned and ned[0][0] is not None else 0
            if schema.sparse:
                # unique ids strictly above every existing coordinate;
                # sparse coords don't need contiguity, so the id stays
                # distributed (no shuffle)
                df = df.withColumn(
                    ROWS_DIM,
                    F.monotonically_increasing_id() + F.lit(offset))
            else:
                # dense grids need CONTIGUOUS row coords: one global
                # row_number pass (single-task window — fine at append
                # scale; at corpus scale use a sparse array or supply
                # __tiledb_rows yourself)
                from pyspark.sql import Window

                df = df.withColumn(
                    ROWS_DIM,
                    F.row_number().over(
                        Window.orderBy(F.monotonically_increasing_id()))
                    - 1 + F.lit(offset))
        from pyspark.sql import types as T

        enum_attrs = [a.name for a in schema.attrs_list if a.enum_label]
        bad = [n for n in enum_attrs
               if n in df.columns
               and isinstance(df.schema[n].dataType, T.StringType)]
        if bad:
            # the pandas append path encodes labels -> codes and refuses
            # unknown labels; writing raw strings under the declared
            # int32-code schema would commit unreadable fragments
            raise ValueError(
                f"attributes {bad} are enumerated (stored as int32 "
                "codes); from_spark append cannot encode string labels "
                "— append via from_pandas, or supply the integer codes")
        write_fragment_spark(uri, schema, df)
        return

    # driver-side schema inference: one small agg job for dim domains —
    # built ONLY for dims that actually need min/max (string dims and
    # full_domain integer dims don't), so full_domain=True never pays a
    # full-table scan just to discard the result
    dims = []
    if index_dims:
        np_dts = {d: _spark_to_np(df.schema[d].dataType)
                  for d in index_dims}

        def _needs_minmax(dname):
            k = np_dts[dname].kind
            return k not in ("U", "S") and not (full_domain
                                                and k in ("i", "u"))

        need = [d for d in index_dims if _needs_minmax(d)]
        row = {}
        if need:
            aggs = []
            for d in need:
                aggs += [F.min(d).alias(f"__lo_{d}"),
                         F.max(d).alias(f"__hi_{d}")]
            row = df.agg(*aggs).collect()[0].asDict()
        for dname in index_dims:
            npdt = np_dts[dname]
            if npdt.kind in ("U", "S"):
                dims.append(Dim(name=dname, dtype=np.str_))
            elif full_domain and npdt.kind in ("i", "u"):
                info = np.iinfo(npdt)
                tile = _tile_default(len(index_dims))
                hi = info.max - tile
                if hi <= info.min:   # small-int dtypes: clamp (see
                    hi = info.max - 1   # _infer_dim)
                    tile = min(tile, int(hi) - int(info.min) + 1)
                dims.append(Dim(name=dname,
                                domain=(info.min, hi),
                                tile=tile, dtype=npdt))
            else:
                dims.append(Dim(name=dname, domain=(row[f"__lo_{dname}"], row[f"__hi_{dname}"]),
                                tile=_tile_default(len(index_dims)), dtype=npdt))
    elif sparse_explicit and sparse is False:
        # honor an EXPLICIT dense request (from_pandas parity): dense
        # grids need contiguous coords, so pay one row_number pass and
        # a count for the bounded domain
        from pyspark.sql import Window

        n = df.count()
        df = df.withColumn(
            ROWS_DIM,
            F.row_number().over(Window.orderBy(
                F.monotonically_increasing_id())) - 1)
        dims.append(Dim(name=ROWS_DIM, domain=(0, max(n - 1, 0)),
                        tile=10000, dtype=np.int64))
    else:
        df = df.withColumn(ROWS_DIM, F.monotonically_increasing_id())
        dims.append(Dim(name=ROWS_DIM, domain=(0, np.iinfo(np.int64).max - 10000),
                        tile=10000, dtype=np.int64))
        sparse = True  # monotonic ids are sparse coordinates

    attrs = []
    for f in df.schema.fields:
        if f.name in index_dims or f.name == ROWS_DIM:
            continue
        from pyspark.sql import types as T

        if isinstance(f.dataType, T.ArrayType):
            # var-length multi-value cells (embeddings, code columns) —
            # same mapping as from_pandas' list-valued columns; same
            # numeric-only refusal (a var-string declaration would
            # disagree with the stored list<string> parquet)
            np_elem = _spark_to_np(f.dataType.elementType)
            if np_elem.kind not in "iuf":
                elem_name = f.dataType.elementType.simpleString()
                raise TypeError(
                    f"column {f.name!r} is array<{elem_name}>; only "
                    "numeric multi-value cells are supported — "
                    "concat_ws to one string, or explode to rows "
                    "upstream")
            attrs.append(Attr(name=f.name, dtype=np_elem,
                              var=True, nullable=f.nullable))
        else:
            attrs.append(Attr(name=f.name, dtype=_spark_to_np(f.dataType),
                              nullable=f.nullable))
    schema = ArraySchema(domain=Domain(*dims), attrs=attrs, sparse=sparse)
    mf.create_array(uri, schema)
    # same round-trip contract as from_pandas: open_dataframe/A.df[]
    # restores index_dims as the index and hides a synthetic row dim
    # (attribute_dtypes stays empty — Spark types have no pandas-dtype
    # sidecar to restore)
    pandas_meta = {
        "attribute_dtypes": {},
        "index_dims": index_dims if index_dims else [ROWS_DIM],
        "default_index": not bool(index_dims),
    }
    mf.commit(uri, lambda m: m.pandas_meta.update(pandas_meta))
    if mode == "ingest":
        write_fragment_spark(uri, schema, df)


def _spark_to_np(dt) -> np.dtype:
    from pyspark.sql import types as T

    m = {T.BooleanType: "bool", T.ByteType: "int8", T.ShortType: "int16",
         T.IntegerType: "int32", T.LongType: "int64", T.FloatType: "float32",
         T.DoubleType: "float64", T.StringType: "<U0", T.BinaryType: "S0",
         T.TimestampType: "datetime64[us]", T.TimestampNTZType: "datetime64[us]",
         T.DateType: "datetime64[D]"}
    for k, v in m.items():
        if isinstance(dt, k):
            return np.dtype(v)
    raise TypeError(f"unsupported Spark type {dt}")


def open_dataframe(uri: str, timestamp=None, *, attrs=None,
                   use_arrow=None, idx=slice(None), ctx=None) -> pd.DataFrame:
    """Whole array -> pandas (reference ``dataframe_.py:782-808``).
    ``attrs`` projects; ``idx`` slices (multi_index semantics);
    ``use_arrow`` is accepted for parity (Arrow IS the transport)."""
    del use_arrow, ctx
    from ..array import Array

    arr = Array.load_typed(uri, timestamp=timestamp)
    if attrs is None and (idx is None
                          or (isinstance(idx, slice) and idx == slice(None))):
        return arr.df[:]
    q = arr.query(attrs=list(attrs) if attrs is not None else None,
                  coords=True)
    from ..array import DataFrameIndexer

    return DataFrameIndexer(arr, q)[idx]
