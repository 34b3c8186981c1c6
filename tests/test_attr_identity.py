"""Attribute identity across drop/re-add (schema evolution).

Reference semantics (`/root/reference/tiledb/schema_evolution.py`): an
attribute added under a name a previous evolution dropped is a NEW
attribute — fragments written before the re-add read its FILL value,
never the dropped predecessor's stored bytes.  Pre-r14 this engine had
no attr identity: a same-type re-add silently resurfaced the dropped
predecessor's data, and a different-type re-add crashed the native scan
(Spark's vectorized parquet reader) or silently CAST the predecessor's
bytes in the datasource (int64 10 -> string "10").

Mechanism under test: ``Manifest.dropped_attrs``/``attr_since`` +
``Manifest.masked_attrs``, consumed by ``Array._frag_df`` (native scan),
``TileDBReader`` (_Split.masked — conform, predicate skip, row-group
prune skip, LWW newer/group paths), and ``TileDBStreamReader``.
"""

import os

import numpy as np
import pandas as pd
import pytest

import tiledb_py_spark as tdb
from tiledb_py_spark import manifest as mf
from tiledb_py_spark.sources.spark_datasource import register


@pytest.fixture(scope="module")
def spark():
    s = tdb.get_spark(cpus="8")
    s.sparkContext.setLogLevel("ERROR")
    register(s)
    return s


def _mk(uri, spark):
    tdb.from_pandas(uri, pd.DataFrame(
        {"k": np.array([1, 2], np.int64), "v": [1.0, 2.0], "w": [10, 20]}),
        index_dims=["k"], full_domain=True)


def _drop_readd(uri, attr):
    e1 = tdb.ArraySchemaEvolution()
    e1.drop_attribute("w")
    e1.array_evolve(uri)
    e2 = tdb.ArraySchemaEvolution()
    e2.add_attribute(attr)
    e2.array_evolve(uri)


def test_readd_different_type_reads_fill_everywhere(tmp_path, spark):
    uri = str(tmp_path / "a")
    _mk(uri, spark)
    _drop_readd(uri, tdb.Attr("w", dtype="U", fill="none"))
    tdb.from_pandas(uri, pd.DataFrame(
        {"k": np.array([3], np.int64), "v": [3.0], "w": ["real"]}),
        index_dims=["k"], mode="append")
    with tdb.open(uri, spark=spark) as A:
        r = A[:]
        native = dict(zip(r["k"].tolist(), r["w"].tolist()))
    assert native == {1: "none", 2: "none", 3: "real"}
    ds = {row.k: row.w for row in
          spark.read.format("tiledb").load(uri).collect()}
    assert ds == native, "datasource and native scan disagree"


def test_readd_same_type_does_not_resurface_dropped_data(tmp_path, spark):
    uri = str(tmp_path / "a")
    _mk(uri, spark)
    _drop_readd(uri, tdb.Attr("w", dtype=np.int64, fill=-5))
    with tdb.open(uri, spark=spark) as A:
        assert A[:]["w"].tolist() == [-5, -5], \
            "dropped predecessor data resurfaced under a re-added name"
    ds = sorted(row.w for row in
                spark.read.format("tiledb").load(uri).collect())
    assert ds == [-5, -5]


def test_predicate_on_masked_column_is_not_pushed_to_predecessor(
        tmp_path, spark):
    """A filter on the re-added attr must evaluate against the FILL
    value, never the predecessor's stored bytes (which would both
    row-filter and row-group-prune wrongly)."""
    uri = str(tmp_path / "a")
    _mk(uri, spark)
    _drop_readd(uri, tdb.Attr("w", dtype=np.int64, fill=-5))
    df = spark.read.format("tiledb").load(uri)
    assert df.filter("w = -5").count() == 2
    assert df.filter("w = 10").count() == 0, \
        "predicate matched the dropped predecessor's bytes"


def test_stream_source_masks_readded_attr(tmp_path, spark):
    uri = str(tmp_path / "a")
    _mk(uri, spark)
    _drop_readd(uri, tdb.Attr("w", dtype=np.int64, fill=-5))
    out = []
    q = (spark.readStream.format("tiledb").load(uri).writeStream
         .foreachBatch(lambda b, i: out.extend(b.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    assert sorted(r.w for r in out) == [-5, -5]


def test_lww_overlap_with_masked_fragment(tmp_path, spark):
    """No-duplicates LWW where the OLD fragment is masked: the newer
    fragment's rows supersede, and the survivor's masked attr is
    fill."""
    uri = str(tmp_path / "a")
    _mk(uri, spark)  # k=1,2 with predecessor w
    _drop_readd(uri, tdb.Attr("w", dtype="U", fill="none"))
    # overwrite k=2 post-re-add
    tdb.from_pandas(uri, pd.DataFrame(
        {"k": np.array([2], np.int64), "v": [22.0], "w": ["new"]}),
        index_dims=["k"], mode="append")
    ds = {row.k: (row.v, row.w) for row in
          spark.read.format("tiledb").load(uri).collect()}
    assert ds == {1: (1.0, "none"), 2: (22.0, "new")}
    with tdb.open(uri, spark=spark) as A:
        r = A[:]
        native = dict(zip(r["k"].tolist(),
                          zip(r["v"].tolist(), r["w"].tolist())))
    assert native == ds


def test_manifest_roundtrip_and_masked_attrs(tmp_path, spark):
    uri = str(tmp_path / "a")
    _mk(uri, spark)
    m0 = mf.read_manifest(uri)
    assert m0.masked_attrs(0) == ()
    assert "attr_since" not in m0.to_json(), \
        "unevolved manifests must stay byte-identical to pre-r14"
    _drop_readd(uri, tdb.Attr("w", dtype="U", fill="none"))
    m = mf.read_manifest(uri)
    assert m.attr_since == {"w": 2}
    assert m.masked_attrs(0) == ("w",)
    assert m.masked_attrs(1) == ("w",)
    assert m.masked_attrs(2) == ()
    # a second drop clears since and re-records the drop version
    e = tdb.ArraySchemaEvolution()
    e.drop_attribute("w")
    e.array_evolve(uri)
    m = mf.read_manifest(uri)
    assert m.attr_since == {} and m.dropped_attrs == {"w": 3}


def test_single_evolution_drop_then_readd_call_order(tmp_path, spark):
    """The reference applies ops in call order: drop('w') then
    add(Attr('w', ...)) in ONE evolution creates a new attr under the
    reused name."""
    uri = str(tmp_path / "a")
    _mk(uri, spark)
    e = tdb.ArraySchemaEvolution()
    e.drop_attribute("w")
    e.add_attribute(tdb.Attr("w", dtype="U", fill="none"))
    e.array_evolve(uri)
    m = mf.read_manifest(uri)
    assert m.attr_since == {"w": 1} and m.dropped_attrs == {}
    with tdb.open(uri, spark=spark) as A:
        assert A[:]["w"].tolist() == ["none", "none"]


def test_add_after_unrecorded_drop_probes_fragment_columns(
        tmp_path, spark):
    """Upgrade path: a drop committed by a pre-r14 engine left no
    dropped_attrs record; re-adding the name must still detect the
    predecessor column in live fragments and record the mask."""
    uri = str(tmp_path / "a")
    _mk(uri, spark)
    e1 = tdb.ArraySchemaEvolution()
    e1.drop_attribute("w")
    e1.array_evolve(uri)
    # simulate the pre-r14 manifest: erase the drop record
    mf.commit(uri, lambda m: m.dropped_attrs.clear())
    e2 = tdb.ArraySchemaEvolution()
    e2.add_attribute(tdb.Attr("w", dtype="U", fill="none"))
    e2.array_evolve(uri)
    m = mf.read_manifest(uri)
    assert m.attr_since == {"w": 2}, \
        "unrecorded predecessor column not detected"
    with tdb.open(uri, spark=spark) as A:
        assert A[:]["w"].tolist() == ["none", "none"]


def test_create_array_from_fragments_carries_identity(tmp_path, spark):
    uri = str(tmp_path / "a")
    _mk(uri, spark)
    _drop_readd(uri, tdb.Attr("w", dtype="U", fill="none"))
    new = str(tmp_path / "b")
    tdb.create_array_from_fragments(uri, new, (0, mf.now_ms() + 1000))
    m = mf.read_manifest(new)
    assert m.attr_since == {"w": 2} and m.schema_version == 2
    with tdb.open(new, spark=spark) as A:
        assert A[:]["w"].tolist() == ["none", "none"]


def test_copy_fragments_refuses_diverged_history(tmp_path, spark):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk(src, spark)
    _mk(dst, spark)
    _drop_readd(src, tdb.Attr("w", dtype=np.int64, fill=-5))
    _drop_readd(dst, tdb.Attr("w", dtype=np.int64, fill=-5))
    # same final schema, same history -> works
    tdb.copy_fragments_to_existing_array(src, dst, (0, mf.now_ms() + 1000))
    # diverge dst's history -> refuse
    e = tdb.ArraySchemaEvolution()
    e.drop_attribute("w")
    e.add_attribute(tdb.Attr("w", dtype=np.int64, fill=-5))
    e.array_evolve(dst)
    with pytest.raises(ValueError, match="histories differ"):
        tdb.copy_fragments_to_existing_array(src, dst,
                                             (0, mf.now_ms() + 1000))


def test_fragment_stamp_is_plan_time_not_commit_time(tmp_path, spark):
    """An evolution committing between a writer's plan and its commit
    must not mark the fragment post-evolution: its files have the OLD
    layout, and a too-new stamp would disable evolved-fill and
    drop/re-add masking for them (NULL instead of fill; predecessor
    bytes unmasked)."""
    from tiledb_py_spark.sources.spark_datasource import TileDBWriter

    uri = str(tmp_path / "a")
    _mk(uri, spark)
    w = TileDBWriter(uri)  # plan-time read: schema_version 0
    # evolution lands between plan and commit
    e = tdb.ArraySchemaEvolution()
    e.add_attribute(tdb.Attr("z", dtype=np.int64, fill=-9))
    e.array_evolve(uri)
    import pyarrow as pa
    batch = pa.record_batch(
        {"k": pa.array([7], pa.int64()), "v": pa.array([7.5]),
         "w": pa.array([70], pa.int64())})
    msg = w.write(iter([batch]))
    w.commit([msg])
    frag = mf.read_manifest(uri).fragments[-1]
    assert frag.schema_version == 0, \
        "fragment stamped with a schema version newer than its layout"
    with tdb.open(uri, spark=spark) as A:
        r = A[:]
        z = dict(zip(r["k"].tolist(), r["z"].tolist()))
    assert z[7] == -9, "evolved-fill skipped for the racing fragment"


def test_fragment_stamp_race_with_drop_readd_mask(tmp_path, spark):
    """Same race against a drop/re-add: the racing fragment's stored
    predecessor column must stay masked."""
    from tiledb_py_spark.sources.spark_datasource import TileDBWriter

    uri = str(tmp_path / "a")
    _mk(uri, spark)
    w = TileDBWriter(uri)  # plan at version 0 (schema still has old w)
    e = tdb.ArraySchemaEvolution()
    e.drop_attribute("w")
    e.add_attribute(tdb.Attr("w", dtype="U", fill="none"))
    e.array_evolve(uri)
    import pyarrow as pa
    batch = pa.record_batch(
        {"k": pa.array([7], pa.int64()), "v": pa.array([7.5]),
         "w": pa.array([70], pa.int64())})  # OLD int64 layout
    msg = w.write(iter([batch]))
    w.commit([msg])
    assert mf.read_manifest(uri).fragments[-1].schema_version == 0
    with tdb.open(uri, spark=spark) as A:
        r = A[:]
        got = dict(zip(r["k"].tolist(), r["w"].tolist()))
    assert got == {1: "none", 2: "none", 7: "none"}, got
    ds = {row.k: row.w for row in
          spark.read.format("tiledb").load(uri).collect()}
    assert ds == got


def test_dense_array_drop_readd_masks(tmp_path, spark):
    """Dense arrays go through the same masked scan: a re-added attr
    reads fill on every cell written before the re-add, and the base
    attr's overwrite semantics are untouched."""
    uri = str(tmp_path / "dense")
    tdb.from_numpy(uri, np.arange(4.0))
    with tdb.open(uri, spark=spark) as A:
        anon = A.schema.attr(0).name
    e1 = tdb.ArraySchemaEvolution()
    e1.add_attribute(tdb.Attr("w", dtype=np.int64, fill=7))
    e1.array_evolve(uri)
    with tdb.open(uri, mode="w", spark=spark) as A:
        A[0:2] = {anon: np.array([9.0, 9.5]),
                  "w": np.array([100, 101], np.int64)}
    e2 = tdb.ArraySchemaEvolution()
    e2.drop_attribute("w")
    e2.add_attribute(tdb.Attr("w", dtype="U", fill="none"))
    e2.array_evolve(uri)
    with tdb.open(uri, spark=spark) as A:
        assert A.query(attrs=["w"])[:]["w"].tolist() == ["none"] * 4
        assert A.query(attrs=[anon])[:][anon].tolist() == [9.0, 9.5, 2.0, 3.0]
