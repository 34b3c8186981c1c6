"""Round-13 review batch 4: schema/filter/ctx/highlevel surface edges —
JSON round-trip fidelity, loud refusals for silent no-ops."""

import json

import numpy as np
import pytest

import tiledb_py_spark as tdb
from tiledb_py_spark.filter_ import (Filter, FilterList, GzipFilter,
                                     OpaqueFilter)
from tiledb_py_spark.schema import Attr, Enumeration


def test_bytes_enumeration_roundtrip():
    """bytes-valued enumerations serialize (raw bytes crashed
    json.dumps at manifest write time)."""
    e = Enumeration("e", False, [b"a", b"\xff\x00"])
    e2 = Enumeration.from_json(json.loads(json.dumps(e.to_json())))
    assert e2 == e


def test_attr_nan_token_gated_by_dtype():
    """A STRING attr whose fill is literally '__nan__' round-trips as
    that string; only float attrs decode the NaN token."""
    a = Attr(name="s", dtype=str, fill="__nan__")
    a2 = Attr.from_json(json.loads(json.dumps(a.to_json())))
    assert a2.fill == "__nan__"
    f = Attr(name="f", dtype=np.float64, fill=float("nan"))
    f2 = Attr.from_json(json.loads(json.dumps(f.to_json())))
    assert f2.fill != f2.fill  # NaN


def test_filterlist_chunksize_and_opaque_roundtrip():
    fl = FilterList([GzipFilter()], chunksize=1024)
    fl2 = FilterList.from_json(fl.to_json())
    assert fl2 == fl and fl2.chunksize == 1024
    # historical manifests (plain list) still load
    old = FilterList.from_json([{"type": "GzipFilter", "level": -1}])
    assert len(old) == 1 and old.chunksize is None
    # unknown filter types from a newer engine version round-trip
    # instead of collapsing to NoOpFilter forever
    unk = Filter.from_json({"type": "FancyNewFilter", "alpha": 2})
    assert isinstance(unk, OpaqueFilter)
    assert unk.to_json() == {"type": "FancyNewFilter", "alpha": 2}


def test_default_ctx_rejects_garbage_accepts_ctx():
    from tiledb_py_spark.ctx import Config, default_ctx

    c = default_ctx(Config({"x": "1"}))
    assert default_ctx(c) is c          # adopt a Ctx as-is
    with pytest.raises(ValueError, match="Config, dict, Ctx"):
        default_ctx("my.cfg")           # reference raises too


def test_schema_like_zero_dim_refused():
    with pytest.raises(ValueError, match="positive"):
        tdb.schema_like(shape=(0,), dtype=np.int64)
    with pytest.raises(ValueError, match="positive"):
        tdb.from_numpy("/tmp/never_created_arr", np.empty((0, 3)))


def test_walk_invalid_order_refused(tmp_path):
    with pytest.raises(ValueError, match="preorder"):
        tdb.walk(str(tmp_path), lambda *a: None, order="in-order")


def test_vacuum_rejects_unknown_kwargs(tmp_path):
    import pandas as pd

    uri = str(tmp_path / "arr")
    tdb.from_pandas(uri, pd.DataFrame({"k": np.arange(3, dtype=np.int64),
                                       "v": [1.0, 2.0, 3.0]}),
                    index_dims=["k"])
    tdb.vacuum(uri, config=None, ctx=None)   # parity slots accepted
    # timestamp became a SUPPORTED reference kwarg in r14 (restricts
    # the purge window); a truly-unknown kwarg still refuses
    tdb.vacuum(uri, timestamp=123)
    with pytest.raises(TypeError):
        tdb.vacuum(uri, timestmap=123)       # typo not swallowed


def test_build_ann_index_ivfpq_validates_before_save(tmp_path, spark):
    """A failing id_col validation must not leave a persisted index
    with no code table (ann_search would load the half-built index)."""
    import pandas as pd

    uri = str(tmp_path / "vecarr")
    rng = np.random.RandomState(2)
    pdf = pd.DataFrame({"vec_id": np.arange(30, dtype=np.int64),
                        "embedding": [rng.randn(4).tolist()
                                      for _ in range(30)]})
    tdb.from_pandas(uri, pdf, index_dims=["vec_id"])
    with pytest.raises(ValueError, match="identity column"):
        tdb.build_ann_index(uri, "embedding", spark=spark, kind="ivfpq",
                            n_cells=2, n_probe=2, m=2, n_codes=4,
                            id_col="embedding")
    meta = tdb.Metadata(uri)
    assert not any(k.startswith("__ivfpq_index:") for k in meta.keys()), \
        "half-built index persisted before validation"


# -- review batch 6: ingestion surface (dataframe_.py) --------------------

def test_json_flatten_cross_column_collision_refused():
    import pandas as pd

    from tiledb_py_spark.sources.dataframe_ import _flatten_pandas_json

    pdf = pd.DataFrame({"a": [{"b_c": 1}], "a_b": [{"c": 2}]})
    with pytest.raises(ValueError, match="BOTH nested columns"):
        _flatten_pandas_json(pdf, flatten=True)
    # non-colliding flatten still works, values preserved
    ok = _flatten_pandas_json(
        pd.DataFrame({"x": [{"y": 1}], "z": [{"w": 2}]}), flatten=True)
    assert ok["x_y"].tolist() == [1] and ok["z_w"].tolist() == [2]


def test_tz_aware_attr_refused(tmp_path):
    import pandas as pd

    pdf = pd.DataFrame({"k": np.arange(3, dtype=np.int64),
                        "t": pd.date_range("2020", periods=3, tz="UTC")})
    with pytest.raises(TypeError, match="tz-aware"):
        tdb.from_pandas(str(tmp_path / "arr"), pdf, index_dims=["k"])


def test_full_domain_small_int_dim(tmp_path, spark):
    """int8/int16 full_domain dims no longer build an inverted domain
    that rejects every write."""
    import pandas as pd

    uri = str(tmp_path / "arr")
    pdf = pd.DataFrame({"k": np.array([-5, 0, 7], dtype=np.int8),
                        "v": [1.0, 2.0, 3.0]})
    tdb.from_pandas(uri, pdf, index_dims=["k"], full_domain=True)
    res = tdb.open(uri, spark=spark).multi_index[:]
    assert sorted(res["v"].tolist()) == [1.0, 2.0, 3.0]


def test_from_parquet_multi_file_spark(tmp_path, spark):
    import pandas as pd

    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pd.DataFrame({"k": np.arange(3, dtype=np.int64),
                  "v": [1.0, 2.0, 3.0]}).to_parquet(p1)
    pd.DataFrame({"k": np.arange(3, 6, dtype=np.int64),
                  "v": [4.0, 5.0, 6.0]}).to_parquet(p2)
    uri = str(tmp_path / "arr")
    tdb.from_parquet(uri, [p1, p2], spark=spark, index_dims=["k"])
    out = tdb.open(uri, spark=spark).dataframe().collect()
    assert len(out) == 6


def test_from_pandas_append_to_from_spark_array(tmp_path, spark):
    """Pandas append to a from_spark default-index (sparse) array
    synthesizes fresh row coords instead of KeyError."""
    import pandas as pd

    from tiledb_py_spark.sources.dataframe_ import from_spark

    uri = str(tmp_path / "arr")
    from_spark(uri, spark.createDataFrame([(1.0,), (2.0,)], "v double"))
    tdb.from_pandas(uri, pd.DataFrame({"v": [3.0, 4.0]}), mode="append")
    out = tdb.open(uri, spark=spark).dataframe().toPandas()
    assert sorted(out["v"]) == [1.0, 2.0, 3.0, 4.0]
    assert out["__tiledb_rows"].nunique() == 4


def test_from_spark_explicit_dense_default_index(tmp_path, spark):
    from tiledb_py_spark.sources.dataframe_ import from_spark

    uri = str(tmp_path / "arr")
    from_spark(uri, spark.createDataFrame([(1.0,), (2.0,)], "v double"),
               sparse=False)
    A = tdb.open(uri, spark=spark)
    assert not A.schema.sparse
    assert A.df[:]["v"].tolist() == [1.0, 2.0]


def test_from_pandas_unknown_kwargs_refused(tmp_path):
    import pandas as pd

    with pytest.raises(TypeError, match="unsupported keyword"):
        tdb.from_pandas(str(tmp_path / "arr"),
                        pd.DataFrame({"v": [1.0]}),
                        attr_filter={"v": []})   # typo: singular


def test_append_dtype_drift_guarded(tmp_path, spark):
    """A later chunk whose int column drifted to float (NaN appeared)
    is refused for non-nullable attrs and exact-cast otherwise."""
    import pandas as pd

    uri = str(tmp_path / "arr")
    tdb.from_pandas(uri, pd.DataFrame({"k": np.arange(3, dtype=np.int64),
                                       "n": np.arange(3, dtype=np.int64)}),
                    index_dims=["k"], full_domain=True)
    drifted = pd.DataFrame({"k": np.arange(3, 6, dtype=np.int64),
                            "n": [4.0, np.nan, 6.0]})
    with pytest.raises(ValueError, match="dtype drift"):
        tdb.from_pandas(uri, drifted, mode="append")
    clean = pd.DataFrame({"k": np.arange(3, 6, dtype=np.int64),
                          "n": [4.0, 5.0, 6.0]})   # integral floats: cast
    tdb.from_pandas(uri, clean, mode="append")
    res = tdb.open(uri, spark=spark).multi_index[:]
    assert sorted(res["n"].tolist()) == [0, 1, 2, 4, 5, 6]
    with pytest.raises(ValueError, match="non-integral"):
        tdb.from_pandas(uri, pd.DataFrame(
            {"k": np.array([9], dtype=np.int64), "n": [4.5]}),
            mode="append")


def test_from_spark_append_enum_strings_refused(tmp_path, spark):
    import pandas as pd

    from tiledb_py_spark.sources.dataframe_ import from_spark

    uri = str(tmp_path / "arr")
    pdf = pd.DataFrame({"k": np.arange(3, dtype=np.int64),
                        "col": pd.Categorical(["r", "g", "r"])})
    tdb.from_pandas(uri, pdf, index_dims=["k"], full_domain=True)
    bad = spark.createDataFrame([(5, "g")], "k long, col string")
    with pytest.raises(ValueError, match="enumerated"):
        from_spark(uri, bad, mode="append")
