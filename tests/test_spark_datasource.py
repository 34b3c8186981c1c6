"""Custom Spark data source: spark.read/write.format('tiledb')."""

import numpy as np
import pandas as pd
import pytest

import tiledb_py_spark as tdb


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from tiledb_py_spark.sources.spark_datasource import register

    register(spark)


@pytest.fixture()
def arr(uri, spark):
    pdf = pd.DataFrame({"k": np.arange(500, dtype=np.int64),
                        "v": np.arange(500) * 1.5})
    # full_domain: the stream tests append fragments at coords 1000+,
    # which out-of-domain write validation would (rightly) reject on a
    # batch-1-pinned domain
    tdb.from_pandas(uri, pdf, index_dims=["k"], full_domain=True)
    return uri


def test_format_read(arr, spark):
    df = spark.read.format("tiledb").load(arr)
    assert df.count() == 500
    assert set(df.columns) == {"k", "v"}


def test_format_filter_pushdown_correct(arr, spark):
    df = spark.read.format("tiledb").load(arr)
    rows = df.filter((df.k >= 10) & (df.k < 20)).collect()
    assert sorted(r.k for r in rows) == list(range(10, 20))
    rows = df.filter(df.k.isin([1, 5, 400])).collect()
    assert sorted(r.k for r in rows) == [1, 5, 400]


def test_format_write_appends_fragment(arr, spark):
    extra = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(500, 600, dtype=np.int64),
                      "v": np.zeros(100)}))
    extra.write.format("tiledb").mode("append").save(arr)
    assert spark.read.format("tiledb").load(arr).count() == 600
    assert len(tdb.array_fragments(arr)) == 2
    # engine path sees the same data
    assert tdb.open(arr, spark=spark).dataframe().count() == 600


def test_format_timestamp_option(arr, spark):
    extra = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(500, 550, dtype=np.int64),
                      "v": np.zeros(50)}))
    extra.write.format("tiledb").mode("append").save(arr)
    ts1 = tdb.array_fragments(arr)[0].timestamp_range[1]
    old = spark.read.format("tiledb").option("timestamp", ts1).load(arr)
    assert old.count() == 500


def test_format_overwrite_rejected(arr, spark):
    df = spark.read.format("tiledb").load(arr)
    with pytest.raises(Exception):
        df.write.format("tiledb").mode("overwrite").save(arr)


def test_format_overlapping_nodup_last_write_wins(uri, spark):
    """Overlapping fragments on a no-duplicates array resolve to the LAST
    write per coordinate, merge-on-read style (per-split anti-join against
    newer overlapping fragments' coordinates)."""
    pdf = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                        "v": np.zeros(10)})
    tdb.from_pandas(uri, pdf, index_dims=["k"], full_domain=True)
    pdf2 = pd.DataFrame({"k": np.arange(5, 15, dtype=np.int64),
                         "v": np.ones(10)})
    tdb.from_pandas(uri, pdf2, index_dims=["k"], mode="append")
    out = (spark.read.format("tiledb").load(uri)
           .orderBy("k").toPandas())
    assert out["k"].tolist() == list(range(15))
    # coords 0-4 keep the first write, 5-14 take the second
    assert out["v"].tolist() == [0.0] * 5 + [1.0] * 10
    # matches the engine's own scan exactly
    eng = tdb.open(uri, spark=spark).dataframe().orderBy("k").toPandas()
    assert out.equals(eng)


def test_format_lww_after_delete_resurfaces_old(uri, spark):
    """A newer row that was itself deleted no longer supersedes: the older
    cell resurfaces (delete-then-dedup order, same as Array._scan_df)."""
    pdf = pd.DataFrame({"k": np.arange(5, dtype=np.int64),
                        "v": np.arange(5) * 1.0})
    tdb.from_pandas(uri, pdf, index_dims=["k"])
    pdf2 = pd.DataFrame({"k": np.arange(5, dtype=np.int64),
                         "v": np.arange(5) + 100.0})
    tdb.from_pandas(uri, pdf2, index_dims=["k"], mode="append")
    with tdb.open(uri, "d", spark=spark) as A:
        A.query(cond="v >= 100.0").submit_delete()
    out = (spark.read.format("tiledb").load(uri).orderBy("k").toPandas())
    eng = tdb.open(uri, spark=spark).dataframe().orderBy("k").toPandas()
    assert out.equals(eng)
    # the delete killed the overwrites; originals resurface
    assert out["v"].tolist() == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_format_lww_many_overlaps_streams_each_file_once(uri, spark):
    """Hot-key upsert: 20 updates all overlapping the base fragment.
    Planning must route the overlap component through a streaming-merge
    group split where every parquet file is referenced exactly ONCE
    (per-split `newer` stacking would reference newer files O(F^2) times),
    and the result must match the engine's shuffle-dedup scan."""
    base = pd.DataFrame({"k": np.arange(200, dtype=np.int64),
                         "v": np.zeros(200)})
    tdb.from_pandas(uri, base, index_dims=["k"])
    for i in range(1, 21):
        upd = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                            "v": np.full(50, float(i))})
        tdb.from_pandas(uri, upd, index_dims=["k"], mode="append")

    from tiledb_py_spark.sources.spark_datasource import TileDBReader

    r = TileDBReader(uri, None)
    splits = r.partitions()
    group_splits = [s for s in splits if s.group]
    assert group_splits, "expected the overlap component to be grouped"
    refs = []
    for s in splits:
        refs.extend(p for paths, _d, _m in s.group for p in paths)
        if s.file_path:
            refs.append(s.file_path)
        refs.extend(p for p, _d, _m in s.newer)
    assert len(refs) == len(set(refs)) == 21  # each file planned exactly once

    out = spark.read.format("tiledb").load(uri).orderBy("k").toPandas()
    eng = tdb.open(uri, spark=spark).dataframe().orderBy("k").toPandas()
    assert out.equals(eng)
    assert out["v"].tolist() == [20.0] * 50 + [0.0] * 150

    # group path is delete-aware: killing the winning write resurfaces
    # the previous one (same delete-then-dedup order as Array._scan_df)
    with tdb.open(uri, "d", spark=spark) as A:
        A.query(cond="v >= 20.0").submit_delete()
    out = spark.read.format("tiledb").load(uri).orderBy("k").toPandas()
    assert out["v"].tolist() == [19.0] * 50 + [0.0] * 150

    # pushed filters still prune the OUTPUT of the group split without
    # breaking supersession (newer out-of-range rows still tombstone)
    df = spark.read.format("tiledb").load(uri)
    got = df.filter(df.k < 10).orderBy("k").toPandas()
    assert got["v"].tolist() == [19.0] * 10


def test_format_lww_giant_component_auto_slices(uri, spark):
    """A mutually-overlapping component above lww_split_bytes must NOT
    serialize into one task: planning slices it into first-dim coordinate
    ranges (one independent streaming merge per slice), and the sliced
    result is identical to the engine's shuffle-dedup scan."""
    import glob
    import os

    import pyarrow.parquet as pq

    from tiledb_py_spark import manifest as mf

    rng = np.random.RandomState(7)
    base = pd.DataFrame({"k": np.arange(5000, dtype=np.int64),
                         "v": np.zeros(5000)})
    tdb.from_pandas(uri, base, index_dims=["k"])
    for i in range(1, 12):
        # every update overlaps the full domain -> one component
        ks = np.sort(rng.choice(5000, 2000, replace=False)).astype(np.int64)
        upd = pd.DataFrame({"k": ks, "v": np.full(len(ks), float(i))})
        tdb.from_pandas(uri, upd, index_dims=["k"], mode="append")
    # tiny test fragments land in ONE row group each; rewrite with small
    # sorted row groups to model a real multi-row-group fragment (where
    # range slicing actually prunes I/O — the planner refuses to slice
    # single-giant-row-group layouts, see the unsorted test)
    for f in mf.read_manifest(uri).fragments:
        for p in glob.glob(os.path.join(mf.fragment_path(uri, f.name),
                                        "**", "*.parquet"), recursive=True):
            pq.write_table(pq.read_table(p).sort_by("k"), p,
                           row_group_size=250)

    from tiledb_py_spark.sources.spark_datasource import TileDBReader

    # tiny byte threshold forces slicing of this small test component
    r = TileDBReader(uri, None, lww_split_bytes=16 << 10)
    splits = r.partitions()
    group_splits = [s for s in splits if s.group]
    assert len(group_splits) > 1, "giant component should slice into >1 task"
    # slices must partition the domain: contiguous half-open ranges
    rngs = sorted((s.group_range for s in group_splits),
                  key=lambda r: (r[0] is not None, r[0]))
    assert rngs[0][0] is None and rngs[-1][1] is None
    for a, b in zip(rngs, rngs[1:]):
        assert a[1] == b[0]

    sliced = (spark.read.format("tiledb")
              .option("lww_split_bytes", 16 << 10).load(uri)
              .orderBy("k").toPandas())
    eng = tdb.open(uri, spark=spark).dataframe().orderBy("k").toPandas()
    assert sliced.equals(eng)

    # delete-awareness survives slicing: killing the winning writes
    # resurfaces previous values, identically to the engine scan
    with tdb.open(uri, "d", spark=spark) as A:
        A.query(cond="v >= 11.0").submit_delete()
    sliced = (spark.read.format("tiledb")
              .option("lww_split_bytes", 16 << 10).load(uri)
              .orderBy("k").toPandas())
    eng = tdb.open(uri, spark=spark).dataframe().orderBy("k").toPandas()
    assert sliced.equals(eng)


def test_format_lww_unsorted_component_skips_slicing(uri, spark):
    """Wide row groups (unsorted data) would be re-read by every slice —
    the planner must detect the amplification and fall back to fewer (or
    one) slices instead of multiplying I/O."""
    import glob
    import os

    import pyarrow.parquet as pq

    from tiledb_py_spark import manifest as mf
    from tiledb_py_spark.sources.spark_datasource import TileDBReader

    rng = np.random.RandomState(3)
    base = pd.DataFrame({"k": np.arange(4000, dtype=np.int64),
                         "v": np.zeros(4000)})
    tdb.from_pandas(uri, base, index_dims=["k"])
    for i in range(1, 12):
        upd = pd.DataFrame({"k": np.arange(0, 4000, 2, dtype=np.int64),
                            "v": np.full(2000, float(i))})
        tdb.from_pandas(uri, upd, index_dims=["k"], mode="append")
    # shuffle every fragment file and rewrite with small row groups:
    # each row group now spans ~the whole key domain
    for f in mf.read_manifest(uri).fragments:
        for p in glob.glob(os.path.join(mf.fragment_path(uri, f.name),
                                        "**", "*.parquet"), recursive=True):
            tbl = pq.read_table(p)
            perm = rng.permutation(tbl.num_rows)
            pq.write_table(tbl.take(perm), p, row_group_size=500)

    r = TileDBReader(uri, None, lww_split_bytes=16 << 10)
    splits = r.partitions()
    group_splits = [s for s in splits if s.group]
    assert len(group_splits) == 1 and group_splits[0].group_range in ((), (None, None))
    # and the merge still resolves LWW correctly on the shuffled files
    out = spark.read.format("tiledb") \
        .option("lww_split_bytes", 16 << 10).load(uri).orderBy("k").toPandas()
    eng = tdb.open(uri, spark=spark).dataframe().orderBy("k").toPandas()
    assert out.equals(eng)


def test_format_lww_few_overlaps_keeps_per_split_anti_join(uri, spark):
    """At or below the threshold the shuffle-free per-split anti-join is
    the right plan (cost bounded by actual overlap) — no group splits."""
    base = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                         "v": np.zeros(100)})
    tdb.from_pandas(uri, base, index_dims=["k"])
    for i in range(1, 4):
        upd = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                            "v": np.full(10, float(i))})
        tdb.from_pandas(uri, upd, index_dims=["k"], mode="append")

    from tiledb_py_spark.sources.spark_datasource import TileDBReader

    splits = TileDBReader(uri, None).partitions()
    assert not any(s.group for s in splits)
    assert any(s.newer for s in splits)
    out = spark.read.format("tiledb").load(uri).orderBy("k").toPandas()
    assert out["v"].tolist() == [3.0] * 10 + [0.0] * 90


def test_rg_stats_pruning_plans_fewer_splits(uri, spark):
    """Driver-side planning skips whole row groups whose parquet min/max
    statistics cannot match the pushed predicates (the 100 TB lever: a
    selective dim filter should cost row groups, not a file scan)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiledb_py_spark import manifest as mf
    from tiledb_py_spark.sources.spark_datasource import (TileDBReader,
                                                          _rg_matches)

    pdf = pd.DataFrame({"k": np.arange(100_000, dtype=np.int64),
                        "v": np.arange(100_000) * 1.0})
    tdb.from_pandas(uri, pdf, index_dims=["k"])
    # rewrite the fragment's parquet with small row groups so stats
    # pruning has something to prune
    frag = mf.read_manifest(uri).fragments[0]
    import glob
    import os
    [pq_path] = glob.glob(os.path.join(mf.fragment_path(uri, frag.name),
                                       "**", "*.parquet"), recursive=True)
    tbl = pq.read_table(pq_path)
    pq.write_table(tbl.sort_by("k"), pq_path, row_group_size=10_000)
    md = pq.ParquetFile(pq_path).metadata
    assert md.num_row_groups == 10

    preds = (("k", ">=", 45_000), ("k", "<", 52_000))
    live = [i for i in range(md.num_row_groups)
            if _rg_matches(md.row_group(i), preds)]
    assert live == [4, 5]  # 8 of 10 row groups pruned at the driver

    r = TileDBReader(uri, None)
    r._preds = list(preds)
    splits = r.partitions()
    assert sum(len(s.row_groups) for s in splits) == 2

    # end-to-end through Spark stays correct
    df = spark.read.format("tiledb").load(uri)
    got = df.filter((df.k >= 45_000) & (df.k < 52_000)).count()
    assert got == 7_000


def test_stream_read_fragment_feed(arr, spark, tmp_path):
    """spark.readStream.format('tiledb'): each committed fragment's
    rows arrive exactly once in commit order; a fragment committed
    between micro-batch triggers is picked up by the next one; offsets
    replay deterministically from the checkpoint."""
    import pandas as pd

    batches = []

    def sink(df, bid):
        batches.append((bid, sorted(r.k for r in df.collect())))

    q = (spark.readStream.format("tiledb").load(arr)
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got0 = sorted(k for _, ks in batches for k in ks)
    assert got0 == list(range(500))     # the initial fragment, once

    # commit two more fragments, restart the stream from the checkpoint
    tdb.from_pandas(arr, pd.DataFrame(
        {"k": np.arange(1000, 1010, dtype=np.int64),
         "v": np.zeros(10)}), index_dims=["k"], mode="append")
    tdb.from_pandas(arr, pd.DataFrame(
        {"k": np.arange(2000, 2005, dtype=np.int64),
         "v": np.ones(5)}), index_dims=["k"], mode="append")
    batches.clear()
    q = (spark.readStream.format("tiledb").load(arr)
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got1 = sorted(k for _, ks in batches for k in ks)
    # ONLY the new fragments: the checkpoint offset excludes batch 1
    assert got1 == list(range(1000, 1010)) + list(range(2000, 2005))


def test_stream_array_to_array_etl(arr, spark, tmp_path):
    """Array-to-array streaming ETL: readStream from one array,
    transform, commit each micro-batch as a fragment of a SECOND array
    — the full subscribe -> process -> publish loop on engine storage
    alone.  The sink array ends exactly one processed row per source
    row."""
    from pyspark.sql import functions as F

    out_uri = str(tmp_path / "sink_array")
    src = spark.readStream.format("tiledb").load(arr)
    xform = src.withColumn("v2", F.col("v") * 2.0).drop("v")

    def commit_batch(df, bid):
        pdf = df.toPandas()
        if len(pdf):
            tdb.from_pandas(out_uri, pdf, index_dims=["k"],
                            mode="append" if tdb.array_exists(out_uri)
                            else "ingest",
                            full_domain=True)

    q = (xform.writeStream.foreachBatch(commit_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    A = tdb.open(out_uri, spark=spark)
    rows = {r.k: r.v2 for r in A.dataframe().collect()}
    assert len(rows) == 500
    assert rows[10] == 10 * 1.5 * 2.0


def test_stream_native_sink_one_fragment_per_batch(arr, spark, tmp_path):
    """writeStream.format('tiledb'): each micro-batch commits exactly
    ONE fragment of the sink array (two-file source -> two trigger
    batches -> two fragments), rows land once, and the staging dir
    holds no leftovers after the run."""
    import os

    from pyspark.sql import functions as F

    from tiledb_py_spark import manifest as mf

    out_uri = str(tmp_path / "native_sink")
    # schema_only creation: the sink array must exist before the first
    # batch; full domain so any coordinate fits
    tdb.from_pandas(out_uri, pd.DataFrame(
        {"k": np.array([0], dtype=np.int64), "v2": [0.0]}),
        index_dims=["k"], mode="schema_only", full_domain=True)

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    pd.DataFrame({"k": np.arange(0, 50, dtype=np.int64),
                  "v2": np.arange(0, 50) * 2.0}) \
        .to_parquet(src_dir / "b1.parquet")
    pd.DataFrame({"k": np.arange(50, 80, dtype=np.int64),
                  "v2": np.arange(50, 80) * 2.0}) \
        .to_parquet(src_dir / "b2.parquet")

    schema = spark.read.parquet(str(src_dir)).schema
    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).parquet(str(src_dir))
         .writeStream.format("tiledb")
         .option("path", out_uri)
         .option("checkpointLocation", str(tmp_path / "nsckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)

    frags = mf.read_manifest(out_uri).fragments
    assert len(frags) == 2                      # one per micro-batch
    assert all("_sb" in f.name for f in frags)  # batchId markers
    assert sorted(f.cell_num for f in frags) == [30, 50]
    rows = {r.k: r.v2 for r in
            spark.read.format("tiledb").load(out_uri).collect()}
    assert len(rows) == 80 and rows[79] == 158.0
    stage = os.path.join(out_uri, "__stream_stage")
    assert not os.path.exists(stage) or not os.listdir(stage)


def test_stream_native_sink_checkpoint_restart(arr, spark, tmp_path):
    """Restarting a writeStream.format('tiledb') query from its
    checkpoint after new source data arrives appends exactly the new
    batch's fragment — no duplicate fragments, no replayed rows."""
    from tiledb_py_spark import manifest as mf

    out_uri = str(tmp_path / "restart_sink")
    tdb.from_pandas(out_uri, pd.DataFrame(
        {"k": np.array([0], dtype=np.int64), "v2": [0.0]}),
        index_dims=["k"], mode="schema_only", full_domain=True)
    src_dir = tmp_path / "rsrc"
    src_dir.mkdir()
    pd.DataFrame({"k": np.arange(0, 20, dtype=np.int64),
                  "v2": np.zeros(20)}).to_parquet(src_dir / "b1.parquet")
    schema = spark.read.parquet(str(src_dir)).schema

    def run():
        q = (spark.readStream.schema(schema).parquet(str(src_dir))
             .writeStream.format("tiledb").option("path", out_uri)
             .option("checkpointLocation", str(tmp_path / "rsckpt"))
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120)

    run()
    assert len(mf.read_manifest(out_uri).fragments) == 1
    pd.DataFrame({"k": np.arange(20, 25, dtype=np.int64),
                  "v2": np.ones(5)}).to_parquet(src_dir / "b2.parquet")
    run()   # resumes from the checkpoint: only b2 is new
    frags = mf.read_manifest(out_uri).fragments
    assert [f.cell_num for f in frags] == [20, 5]
    ks = sorted(r.k for r in
                spark.read.format("tiledb").load(out_uri).collect())
    assert ks == list(range(25))   # every row exactly once


def test_stream_native_sink_replay_idempotent(arr, spark, tmp_path):
    """Exactly-once at the sink: commit() with a batchId already in
    the manifest (the sink-committed-then-crashed replay) publishes
    nothing and discards the re-staged pieces."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiledb_py_spark import manifest as mf
    from tiledb_py_spark.sources.spark_datasource import (
        TileDBStreamWriter, _StreamPieceCommit)

    out_uri = str(tmp_path / "replay_sink")
    tdb.from_pandas(out_uri, pd.DataFrame(
        {"k": np.array([0], dtype=np.int64), "v2": [0.0]}),
        index_dims=["k"], mode="schema_only", full_domain=True)
    w = TileDBStreamWriter(out_uri)

    def stage(vals):
        os.makedirs(w.stage_dir, exist_ok=True)
        fn = f"piece-test{vals[0]}.parquet"
        pq.write_table(pa.table({
            "k": pa.array(vals, type=pa.int64()),
            "v2": pa.array([float(v) for v in vals])}),
            os.path.join(w.stage_dir, fn))
        return _StreamPieceCommit(file_name=fn, rows=len(vals))

    w.commit([stage([1, 2, 3])], batchId=7)
    v7 = mf.read_manifest(out_uri).version
    assert len(mf.read_manifest(out_uri).fragments) == 1
    # replay of batch 7: already-published marker -> no-op, pieces gone
    w.commit([stage([1, 2, 3])], batchId=7)
    m = mf.read_manifest(out_uri)
    assert m.version == v7 and len(m.fragments) == 1
    assert not os.listdir(w.stage_dir)
    # a NEW batch still publishes — and the publish sweeps orphan
    # pieces left by failed/speculative task attempts (staged but
    # never reported in messages)
    orphan = stage([99])
    w.commit([stage([4, 5])], batchId=8)
    assert len(mf.read_manifest(out_uri).fragments) == 2
    assert orphan.file_name not in os.listdir(w.stage_dir)
    # abort drops staged pieces without publishing
    msg = stage([9])
    w.abort([msg, None], batchId=9)
    assert not os.listdir(w.stage_dir)
    assert len(mf.read_manifest(out_uri).fragments) == 2


def test_stream_offsets_identity_bearing(arr, spark):
    """Stream offsets record the fragment NAME at the offset position
    (ADVICE r7): after a vacuum shrinks the fragment list and later
    commits grow it back past a checkpointed offset, the length-only
    check would pass but the positions now name DIFFERENT fragments —
    the reader must refuse rather than silently replay wrong rows."""
    import pandas as pd

    from tiledb_py_spark.fragment import consolidate, vacuum
    from tiledb_py_spark.sources.spark_datasource import TileDBStreamReader

    schema = spark.read.format("tiledb").load(arr).schema
    tdb.from_pandas(arr, pd.DataFrame(
        {"k": np.arange(1000, 1010, dtype=np.int64),
         "v": np.zeros(10)}), index_dims=["k"], mode="append")
    tdb.from_pandas(arr, pd.DataFrame(
        {"k": np.arange(2000, 2005, dtype=np.int64),
         "v": np.ones(5)}), index_dims=["k"], mode="append")

    r = TileDBStreamReader(arr, schema)
    ckpt = r.latestOffset()                      # i=3, frag=<third frag>
    assert ckpt["i"] == 3 and ckpt["frag"] is not None

    # consolidate + vacuum: 3 fragments -> 1; then grow back to 3
    consolidate(arr, spark=spark)
    vacuum(arr)
    tdb.from_pandas(arr, pd.DataFrame(
        {"k": np.arange(3000, 3002, dtype=np.int64),
         "v": np.zeros(2)}), index_dims=["k"], mode="append")
    tdb.from_pandas(arr, pd.DataFrame(
        {"k": np.arange(4000, 4002, dtype=np.int64),
         "v": np.zeros(2)}), index_dims=["k"], mode="append")

    latest = r.latestOffset()
    assert latest["i"] == 3                       # length check alone passes
    with pytest.raises(RuntimeError, match="rewritten"):
        r.partitions(ckpt, latest)

    # a fresh checkpoint over the rewritten list works fine
    fresh = {"i": 0, "frag": None}
    assert len(r.partitions(fresh, latest)) == 3
