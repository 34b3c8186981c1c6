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
    with pytest.raises(TypeError):
        tdb.vacuum(uri, timestamp=123)       # not silently swallowed


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
