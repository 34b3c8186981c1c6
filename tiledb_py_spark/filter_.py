"""Filter family: storage-codec declarations (§2.9 of SURVEY.md).

Reference: ``/root/reference/tiledb/filter.py`` (985 LoC of pybind
wrappers over libtiledb codec kernels).  In the Spark rebuild these are
*declarations, not kernels*: parquet already compresses and encodes, so a
FilterList maps to (a) the fragment writer's parquet codec when a direct
equivalent exists (Gzip/Zstd/LZ4 -> parquet compression; Dictionary/RLE ->
parquet encodings, automatic) and (b) a manifest annotation otherwise, so
schemas round-trip faithfully even for filters with no parquet analog
(BitShuffle, FloatScale, ...).
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

__all__ = [
    "Filter", "NoOpFilter", "GzipFilter", "ZstdFilter", "LZ4Filter",
    "Bzip2Filter", "RleFilter", "DeltaFilter", "DoubleDeltaFilter",
    "DictionaryFilter", "BitShuffleFilter", "ByteShuffleFilter",
    "BitWidthReductionFilter", "PositiveDeltaFilter", "ChecksumMD5Filter",
    "ChecksumSHA256Filter", "FloatScaleFilter", "XORFilter", "WebpFilter",
    "OpaqueFilter", "FilterList",
]


class Filter:
    """Base filter declaration; serializes to a manifest annotation."""

    #: parquet compression codec this filter maps to, if any
    parquet_codec: Optional[str] = None

    def __init__(self, **options: Any):
        self.options = options

    def to_json(self) -> dict:
        return {"type": type(self).__name__, **self.options}

    @classmethod
    def from_json(cls, d: dict) -> "Filter":
        kind = d.get("type", "NoOpFilter")
        opts = {k: v for k, v in d.items() if k != "type"}
        klass = _BY_NAME.get(kind)
        if klass is None:
            # a manifest written by a newer engine version: PRESERVE the
            # declaration instead of collapsing it to NoOpFilter — the
            # next read-modify-write would otherwise permanently erase
            # the filter's identity from the schema
            return OpaqueFilter(kind, **opts)
        return klass(**opts)

    def __eq__(self, other):
        return type(self) is type(other) and self.options == getattr(other, "options", None)

    def __repr__(self):
        opts = ", ".join(f"{k}={v!r}" for k, v in self.options.items())
        return f"{type(self).__name__}({opts})"


class NoOpFilter(Filter):
    pass


class OpaqueFilter(Filter):
    """Placeholder for a filter type this engine version does not know:
    round-trips the original type string and options faithfully."""

    def __init__(self, type_name: str, **options: Any):
        super().__init__(**options)
        self.type_name = type_name

    def to_json(self) -> dict:
        return {"type": self.type_name, **self.options}

    def __eq__(self, other):
        return (isinstance(other, OpaqueFilter)
                and self.type_name == other.type_name
                and self.options == other.options)

    def __repr__(self):
        return f"OpaqueFilter({self.type_name!r}, {self.options!r})"


class CompressionFilter(Filter):
    def __init__(self, level: int = -1, **kw):
        super().__init__(level=level, **kw)

    @property
    def level(self) -> int:
        return self.options.get("level", -1)


class GzipFilter(CompressionFilter):
    parquet_codec = "gzip"


class ZstdFilter(CompressionFilter):
    parquet_codec = "zstd"


class LZ4Filter(CompressionFilter):
    parquet_codec = "lz4"


class Bzip2Filter(CompressionFilter):
    pass  # no parquet analog; annotation only


class RleFilter(CompressionFilter):
    pass  # parquet applies RLE encoding automatically


class DeltaFilter(CompressionFilter):
    pass  # parquet DELTA_BINARY_PACKED is automatic for ints


class DoubleDeltaFilter(CompressionFilter):
    pass


class DictionaryFilter(CompressionFilter):
    pass  # parquet dictionary encoding is automatic


class BitShuffleFilter(Filter):
    pass


class ByteShuffleFilter(Filter):
    pass


class BitWidthReductionFilter(Filter):
    def __init__(self, window: int = -1, **kw):
        super().__init__(window=window, **kw)


class PositiveDeltaFilter(Filter):
    def __init__(self, window: int = -1, **kw):
        super().__init__(window=window, **kw)


class ChecksumMD5Filter(Filter):
    pass  # parquet page checksums cover this concern


class ChecksumSHA256Filter(Filter):
    pass


class FloatScaleFilter(Filter):
    """Lossy scale-offset: the one filter with *semantic* effect.  Writers
    apply round((v - offset)/factor) and readers the inverse when this
    filter is declared (explicit transform pair, SURVEY.md §2.9)."""

    def __init__(self, factor: float = 1.0, offset: float = 0.0,
                 bytewidth: int = 8, **kw):
        super().__init__(factor=factor, offset=offset, bytewidth=bytewidth, **kw)


class XORFilter(Filter):
    pass


class WebpFilter(Filter):
    """WebP image codec declaration (reference ``filter.py:690-780``):
    quality/input_format/lossless knobs for uint8 image attributes.  No
    parquet analog — annotation only; image bytes stay raw binary and the
    multimodal operators handle decode (SURVEY §2.9 / multimodal.py)."""

    #: input colorspace formats (reference WebpFilter.WebpInputFormat)
    WEBP_NONE, WEBP_RGB, WEBP_BGR, WEBP_RGBA, WEBP_BGRA = range(5)

    def __init__(self, input_format: int = 0, quality: float = 100.0,
                 lossless: bool = False, **kw):
        super().__init__(input_format=input_format, quality=quality,
                         lossless=lossless, **kw)


_BY_NAME = {c.__name__: c for c in [
    NoOpFilter, GzipFilter, ZstdFilter, LZ4Filter, Bzip2Filter, RleFilter,
    DeltaFilter, DoubleDeltaFilter, DictionaryFilter, BitShuffleFilter,
    ByteShuffleFilter, BitWidthReductionFilter, PositiveDeltaFilter,
    ChecksumMD5Filter, ChecksumSHA256Filter, FloatScaleFilter, XORFilter,
    WebpFilter,
]}


class FilterList:
    """Ordered filter pipeline (reference ``filter.py:806-985``)."""

    def __init__(self, filters: Optional[Iterable[Filter]] = None,
                 chunksize: Optional[int] = None):
        self._filters = list(filters or [])
        self.chunksize = chunksize

    def append(self, f: Filter) -> None:
        self._filters.append(f)

    def __len__(self):
        return len(self._filters)

    def __getitem__(self, i):
        return self._filters[i]

    def __iter__(self):
        return iter(self._filters)

    def __eq__(self, other):
        return (isinstance(other, FilterList)
                and self._filters == other._filters
                and self.chunksize == other.chunksize)

    def __repr__(self):
        return f"FilterList({self._filters!r})"

    def parquet_codec(self) -> Optional[str]:
        """First filter with a direct parquet codec mapping, if any."""
        for f in self._filters:
            if f.parquet_codec:
                return f.parquet_codec
        return None

    def to_json(self):
        # plain list when no chunksize (the historical manifest shape);
        # a dict wrapper when set, so chunksize round-trips
        filters = [f.to_json() for f in self._filters]
        if self.chunksize is None:
            return filters
        return {"chunksize": self.chunksize, "filters": filters}

    @classmethod
    def from_json(cls, lst) -> "FilterList":
        chunksize = None
        if isinstance(lst, dict):
            chunksize = lst.get("chunksize")
            lst = lst.get("filters")
        return cls([Filter.from_json(d) for d in (lst or [])],
                   chunksize=chunksize)
