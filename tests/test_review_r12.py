"""Round-12 review fixes for materialize/subarray/filestore/multimodal:
silent-wrong-result edges (full-domain scans from bad dim indexes,
corrupted filestore reads, phantom video frames) and the nullable
MaskedArray contract (reference ``dense_array.py:96-101``)."""

import numpy as np
import pandas as pd
import pytest

import tiledb_py_spark as tdb


# ---- materialize: nullable columns are ALWAYS MaskedArray ---------------

def _ti(dtype):
    from tiledb_py_spark.datatypes import from_numpy

    return from_numpy(dtype)


def test_restore_nullable_enum_always_masked():
    from tiledb_py_spark.materialize import restore_column

    out = restore_column(pd.Series([0, 1, 1]), _ti(np.int32),
                         nullable=True, enum_values=["a", "b"])
    assert isinstance(out, np.ma.MaskedArray)   # even with no nulls
    assert list(out) == ["a", "b", "b"]
    out2 = restore_column(pd.Series([0.0, np.nan]), _ti(np.int32),
                          nullable=True, enum_values=["a", "b"])
    assert bool(out2.mask[1]) and out2[0] == "a"


def test_restore_nullable_timedelta_masked():
    from tiledb_py_spark.materialize import restore_column

    ti = _ti(np.dtype("timedelta64[ms]"))
    out = restore_column(pd.Series([5.0, np.nan]), ti, nullable=True)
    assert isinstance(out, np.ma.MaskedArray)
    assert out.data.dtype == np.dtype("timedelta64[ms]")
    assert out[0] == np.timedelta64(5, "ms") and bool(out.mask[1])


def test_restore_nullable_native_datetime_masked():
    from tiledb_py_spark.materialize import restore_column

    ti = _ti(np.dtype("datetime64[us]"))
    s = pd.Series(pd.to_datetime(["2024-01-01", None])
                  .astype("datetime64[us]"))
    out = restore_column(s, ti, nullable=True)
    assert isinstance(out, np.ma.MaskedArray)
    assert bool(out.mask[1]) and not bool(out.mask[0])


# ---- subarray: invalid inputs refuse instead of full-domain scans -------

def test_subarray_rejects_bad_dim_index_and_inverted_range(tmp_path, spark):
    uri = str(tmp_path / "arr")
    tdb.from_pandas(uri, pd.DataFrame({"k": [0, 1, 2], "v": [1.0, 2.0, 3.0]}),
                    index_dims=["k"], full_domain=True)
    A = tdb.open(uri, spark=spark)
    sub = tdb.Subarray(A)
    with pytest.raises(IndexError, match="out of range"):
        sub.add_dim_range(2, (0, 1))      # 1-dim array: index 2 invalid
    with pytest.raises(IndexError, match="per-dim lists"):
        sub.add_ranges([[(0, 1)], [(0, 1)]])   # more lists than dims
    assert sub.num_dim_ranges(0) == 0          # refused ATOMICALLY
    with pytest.raises(ValueError, match="invalid range"):
        sub.add_dim_range(0, (10, 5))
    sub.add_dim_range(0, (1, 2))          # valid ranges still work
    assert sub.num_dim_ranges(0) == 1


# ---- filestore ------------------------------------------------------------

def test_filestore_rejects_negative_offset(tmp_path):
    from tiledb_py_spark.filestore import Filestore

    fs = Filestore(str(tmp_path / "fs"))
    fs.write(b"0123456789")
    with pytest.raises(ValueError, match="offset"):
        fs.read(offset=-5)
    with pytest.raises(ValueError, match="size"):
        fs.read(size=-2)
    assert fs.read(offset=3, size=4) == b"3456"


def test_filestore_write_single_metadata_commit(tmp_path):
    from tiledb_py_spark import manifest as mf
    from tiledb_py_spark.filestore import Filestore

    uri = str(tmp_path / "fs")
    fs = Filestore(uri)
    v0 = mf.read_manifest(uri).version
    fs.write(b"payload", mime_type="text/plain")
    # one fragment commit + ONE metadata commit (size+mime batched) —
    # a crash between per-key commits would tear size from contents
    assert mf.read_manifest(uri).version == v0 + 2
    assert len(fs) == 7 and fs.mime_type == "text/plain"


# ---- multimodal: video frames -------------------------------------------

def test_sample_video_frames_null_and_negative_duration(spark):
    from tiledb_py_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      sample_video_frames)

    rows = [(1, "video", b"v", None, None, None, 2000),
            (2, "video", b"v", None, None, None, None),    # unknown
            (3, "video", b"v", None, None, None, -7)]      # corrupt
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sample_video_frames(df, every_ms=1000).collect()
    # no phantom ts=0 frame for unknown duration, no sequence() crash
    # for the corrupt row
    assert sorted((r.media_id, r.frame_ts_ms) for r in got) == \
        [(1, 0), (1, 1000), (1, 2000)]


# ---- metadata.update ------------------------------------------------------

def test_metadata_update_batches_one_commit(tmp_path):
    from tiledb_py_spark import manifest as mf
    from tiledb_py_spark.metadata import Metadata

    uri = str(tmp_path / "arr")
    tdb.from_pandas(uri, pd.DataFrame({"k": [0], "v": [1.0]}),
                    index_dims=["k"], full_domain=True)
    m = Metadata(uri)
    v0 = mf.read_manifest(uri).version
    m.update({"a": 1, "b": "two"}, c=3.0)
    assert mf.read_manifest(uri).version == v0 + 1
    assert (m["a"], m["b"], m["c"]) == (1, "two", 3.0)
    with pytest.raises(TypeError, match="str"):
        m.update({7: "nope"})
    m.update({})   # empty update: no commit
    assert mf.read_manifest(uri).version == v0 + 1
