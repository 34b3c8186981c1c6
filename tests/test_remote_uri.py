"""Remote array URIs must be refused loudly, never silently misplaced.

The manifest/fragment commit layer is POSIX-only (os.link version claims);
before this guard, ``Array.create("s3://bucket/arr", ...)`` "succeeded" by
creating a local ``./s3:/bucket/arr`` directory — the exact silent-
misplacement class fixed for VFS mixed schemes in round 12.  The reference
opens arrays natively at s3:// (``/root/reference/tiledb/ctx.py:149-156``);
until the commit layer is object-store-routed we refuse with a loud
TileDBError (same posture as the ``key=`` refusal).
"""

import os

import numpy as np
import pandas as pd
import pytest

import tiledb_py_spark as tdb
from tiledb_py_spark import manifest as mf
from tiledb_py_spark.functions.query_condition import TileDBError

REMOTE = ["s3://bucket/arr", "gs://bucket/arr", "azure://c/arr",
          "tiledb://ns/arr", "hdfs://nn/arr", "memory://arr"]


def _schema():
    dom = tdb.Domain(tdb.Dim(name="k", domain=(0, 999), tile=100,
                             dtype=np.int64))
    return tdb.ArraySchema(domain=dom,
                           attrs=[tdb.Attr(name="v", dtype=np.float64)],
                           sparse=True)


def _no_local_droppings(cwd_entries_before):
    """No ``s3:`` / ``gs:`` ... directory appeared in the working dir."""
    new = set(os.listdir(".")) - cwd_entries_before
    assert not any(":" in n for n in new), f"misplaced local dirs: {new}"


@pytest.mark.parametrize("uri", REMOTE)
def test_create_remote_refused(uri, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    before = set(os.listdir("."))
    with pytest.raises(TileDBError, match="remote array URIs"):
        tdb.Array.create(uri, _schema())
    _no_local_droppings(before)
    assert not os.path.exists("s3:"), "local s3: directory created"


def test_open_remote_refused():
    with pytest.raises(TileDBError, match="remote array URIs"):
        tdb.open("s3://bucket/arr")


def test_array_exists_remote_refused():
    # loud, not False: a False would send create() down the misplacement path
    with pytest.raises(TileDBError, match="remote array URIs"):
        mf.array_exists("s3://bucket/arr")


def test_from_pandas_remote_refused(spark, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    before = set(os.listdir("."))
    df = pd.DataFrame({"k": np.arange(4), "v": np.arange(4) * 1.0})
    with pytest.raises(TileDBError, match="remote array URIs"):
        tdb.from_pandas("s3://bucket/arr", df, sparse=True, index_dims=["k"],
                        spark=spark)
    _no_local_droppings(before)


def test_group_create_remote_refused(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    before = set(os.listdir("."))
    with pytest.raises(TileDBError, match="remote array URIs"):
        tdb.Group.create("s3://bucket/grp")
    with pytest.raises(TileDBError, match="remote array URIs"):
        tdb.Group("gs://bucket/grp")
    _no_local_droppings(before)


def test_object_move_remote_refused(tmp_path):
    src = str(tmp_path / "obj")
    os.makedirs(src)
    with pytest.raises(TileDBError, match="remote array URIs"):
        tdb.highlevel.move(src, "s3://bucket/obj")
    assert os.path.isdir(src)  # untouched


def test_file_uri_normalized(tmp_path, spark):
    """file:// is LOCAL — it must keep working, normalized to the path."""
    uri = "file://" + str(tmp_path / "arr")
    tdb.Array.create(uri, _schema())
    with tdb.open(uri, "w", spark=spark) as A:
        A[np.arange(3)] = {"v": np.array([1.0, 2.0, 3.0])}
    with tdb.open(str(tmp_path / "arr"), spark=spark) as A:  # plain path
        res = A[:]
    assert sorted(res["v"].tolist()) == [1.0, 2.0, 3.0]


def test_file_uri_localhost_authority_normalized(tmp_path, spark):
    """RFC 8089: file://localhost/p means THIS host — normalize to /p."""
    uri = "file://localhost" + str(tmp_path / "arr")
    tdb.Array.create(uri, _schema())
    assert mf.array_exists(str(tmp_path / "arr"))


def test_file_uri_remote_authority_refused(tmp_path, monkeypatch):
    """file://somehost/share/arr names a REMOTE host; the pre-r14 guard
    stripped the prefix and created a local ./somehost/... tree."""
    monkeypatch.chdir(tmp_path)
    before = set(os.listdir("."))
    with pytest.raises(TileDBError, match="non-local authority"):
        tdb.Array.create("file://somehost/share/arr", _schema())
    assert set(os.listdir(".")) == before, "local droppings from file://host"
    assert not os.path.exists("somehost")


@pytest.mark.parametrize("uri", ["s3:/bucket/arr", "s3:bucket/arr",
                                 "gs:/b/arr", "hdfs:nn/arr"])
def test_scheme_prefix_typo_forms_refused(uri, tmp_path, monkeypatch):
    """Single-slash / no-slash scheme forms (what a naive os.path.join
    produces from an s3 URI) contain no '://' — the pre-r14 guard let
    them through as local RELATIVE paths."""
    monkeypatch.chdir(tmp_path)
    before = set(os.listdir("."))
    with pytest.raises(TileDBError, match="remote array URIs"):
        tdb.Array.create(uri, _schema())
    with pytest.raises(TileDBError, match="remote array URIs"):
        mf.array_exists(uri)
    _no_local_droppings(before)
    assert set(os.listdir(".")) == before


def test_colon_path_escape_hatch(tmp_path, monkeypatch):
    """A genuinely local relative path containing ':' before its first
    '/' works with the documented ./ prefix (and absolute forms never
    match the scheme grammar at all)."""
    monkeypatch.chdir(tmp_path)
    tdb.Array.create("./odd:name", _schema())
    assert mf.array_exists("./odd:name")
    abs_colon = str(tmp_path / "a:b")
    tdb.Array.create(abs_colon, _schema())
    assert mf.array_exists(abs_colon)


def test_streaming_sink_remote_refused():
    """writeStream.format('tiledb') to a remote path fails at writer
    construction (plan time), not mid-stream into a local s3:/ dir."""
    from tiledb_py_spark.sources.spark_datasource import TileDBStreamWriter

    with pytest.raises(TileDBError, match="remote array URIs"):
        TileDBStreamWriter("s3://bucket/arr")
