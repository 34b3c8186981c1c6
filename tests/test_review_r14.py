"""Round-14 review batch: ADVICE-r13 fixes — vacuum ever-set snapshot
ordering, stream-source fill semantics for non-nullable evolved attrs,
default_ctx Ctx adoption documented, legacy 2-field stateful checkpoint
tolerance."""

import os

import numpy as np
import pandas as pd
import pytest

import tiledb_py_spark as tdb
from tiledb_py_spark import manifest as mf
from tiledb_py_spark.sources.spark_datasource import register


@pytest.fixture()
def arr(uri, spark):
    pdf = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                        "v": np.arange(10) * 1.0})
    tdb.from_pandas(uri, pdf, index_dims=["k"], full_domain=True)
    register(spark)
    return uri


def test_stream_source_fills_nonnullable_evolved_attr(arr, spark, tmp_path):
    """readStream.format('tiledb') on pre-evolution fragments must emit
    the FILL value for a non-nullable evolved attr — the batch
    datasource and the native scan (_fill_evolved) do; nulls-only
    conforming made the stream disagree with both (ADVICE r13)."""
    ev = tdb.ArraySchemaEvolution()
    ev.add_attribute(tdb.Attr(name="w", dtype=np.float64, fill=-1.0,
                              nullable=False))
    ev.array_evolve(arr)
    df = spark.createDataFrame([(60, 6.0, 8.0)], "k long, v double, w double")
    df.write.format("tiledb").mode("append").save(arr)
    sink = str(tmp_path / "sink")
    q = (spark.readStream.format("tiledb").load(arr)
         .writeStream.foreachBatch(
             lambda d, _i: d.write.mode("append").parquet(sink))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = {r.k: r.w for r in spark.read.parquet(sink).collect()}
    assert len(got) == 11
    assert got[60] == 8.0
    assert got[0] == -1.0, "pre-evolution rows must stream as fill, not NULL"
    # three-way agreement: stream == batch datasource == native scan
    batch = {r.k: r.w for r in
             spark.read.format("tiledb").load(arr).collect()}
    assert got == batch


def test_vacuum_snapshots_ever_before_purge(arr, spark, monkeypatch):
    """vacuum() must compute the ever-committed set BEFORE its purge
    commit: a fragment committed in the window between the purge commit
    and the ever-scan would read as 'ever but not live' and get
    rmtree'd while its manifest record is live (ADVICE r13, medium).

    Deterministic single-process replay of the interleaving: hook
    mf.commit so a concurrent fragment commit lands immediately after
    vacuum's own purge commit returns."""
    import tiledb_py_spark.fragment as frag_mod

    tdb.consolidate(arr)   # create a superseded fragment for vacuum to drop
    real_commit = mf.commit
    fired = {}

    def racing_commit(uri, fn, *a, **kw):
        m = real_commit(uri, fn, *a, **kw)
        if fn.__name__ == "_purge" and not fired:
            fired["yes"] = True
            # concurrent writer: commits a fragment AFTER the purge
            # commit but BEFORE vacuum lists directories
            with tdb.open(arr, "w", spark=spark) as A:
                A[np.array([900])] = {"v": np.array([9.0])}
        return m

    monkeypatch.setattr(frag_mod.mf, "commit", racing_commit)
    frag_mod.vacuum(arr)
    assert fired, "hook never fired — test wiring broke"
    monkeypatch.undo()
    m = mf.read_manifest(arr)
    live_dirs = {f.name for f in m.fragments}
    for name in live_dirs:
        p = mf.fragment_path(arr, name)
        assert os.path.isdir(p), f"vacuum deleted live fragment {name}"
    got = tdb.open(arr, spark=spark)[:]
    assert 9.0 in got["v"].tolist(), "racing writer's rows were destroyed"


def test_default_ctx_adopts_ctx_instance():
    """Documented intentional extension vs the reference (which raises
    for Ctx): default_ctx(Ctx) adopts the instance, matching
    scope_ctx's accepted inputs; junk still raises ValueError."""
    c = tdb.Ctx(tdb.Config({"sm.tile_cache_size": "123"}))
    assert tdb.default_ctx(c) is c
    assert "INTENTIONALLY" in tdb.default_ctx.__doc__
    with pytest.raises(ValueError, match="default_ctx takes"):
        tdb.default_ctx(42)
    tdb.default_ctx(tdb.Config())   # reset thread-local for other tests


def test_running_totals_tolerates_legacy_two_field_state():
    """A legacy (n, total) state tuple from a pre-n_valid checkpoint is
    unpacked with n_valid defaulting to n (the legacy emission
    semantics) instead of crashing the stream on unpack."""
    from tiledb_py_spark.streaming.stateful import _running_totals_fn

    class FakeState:
        exists = True
        get = (3, 6.0)          # legacy 2-field shape

        def update(self, v):
            self.updated = v

    st = FakeState()
    pdf = pd.DataFrame({"value": [4.0]})
    out = list(_running_totals_fn((7,), iter([pdf]), st))
    assert st.updated == (4, 4, 10.0)
    assert out[0]["total_value"].iloc[0] == 10.0


def test_datasource_write_shuffled_column_order(arr, spark):
    """df.write.format('tiledb') with DataFrame columns in a different
    order than the stored layout (dims first): pre-r14 the sink
    persisted DataFrame order and the reader's positional fast path
    silently transposed same-typed columns (or crashed on the first
    type mismatch).  The writer now normalizes batches to the stored
    layout."""
    import pyarrow.parquet as pq

    df = spark.createDataFrame([(7.5, 77), (8.5, 88)], "v double, k long")
    df.write.format("tiledb").mode("append").save(arr)
    frag = mf.read_manifest(arr).fragments[-1]
    f = os.path.join(mf.fragment_path(arr, frag), os.listdir(
        mf.fragment_path(arr, frag))[0])
    assert pq.ParquetFile(f).schema_arrow.names == ["k", "v"], \
        "sink fragment not in stored (dims-first) layout"
    got = {r.k: r.v for r in
           spark.read.format("tiledb").load(arr).collect()}
    assert got[77] == 7.5 and got[88] == 8.5
    native = tdb.open(arr, spark=spark)[:]
    assert dict(zip(native["k"].tolist(), native["v"].tolist()))[77] == 7.5


def test_datasource_reads_legacy_df_order_fragment(arr, spark):
    """A fragment whose parquet stores declared columns in a DIFFERENT
    order (written by the pre-r14 sink) must read back correctly: the
    reader detects the order mismatch and conforms by NAME instead of
    passing batches through positionally."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    name = mf.new_fragment_name(99999)
    fdir = mf.fragment_path(arr, name)
    os.makedirs(fdir)
    # v first, k second — the reverse of the stored layout; int32 k to
    # also exercise the type-mismatch leg of the conform guard
    pq.write_table(pa.table({"v": pa.array([3.25]),
                             "k": pa.array([555], pa.int32())}),
                   os.path.join(fdir, "part-legacy.parquet"))
    rec = mf.FragmentRecord(name=name, timestamp_range=(99999, 99999),
                            cell_num=1, nonempty_domain={"k": [555, 555]})
    mf.commit(arr, lambda m: m.fragments.append(rec))
    got = {r.k: r.v for r in
           spark.read.format("tiledb").load(arr).collect()}
    assert got[555] == 3.25, "legacy df-order fragment transposed/misread"
    assert got[0] == 0.0, "untouched rows disturbed"


def test_stream_sink_shuffled_column_order(arr, spark, tmp_path):
    """writeStream.format('tiledb') normalizes micro-batch columns to
    the stored layout too."""
    import pyarrow.parquet as pq

    src = str(tmp_path / "src")
    df = spark.createDataFrame([(9.5, 99)], "v double, k long")
    df.write.parquet(src)
    q = (spark.readStream.schema("v double, k long").parquet(src)
         .writeStream.format("tiledb")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start(arr))
    assert q.awaitTermination(120)
    frag = mf.read_manifest(arr).fragments[-1]
    f = os.path.join(mf.fragment_path(arr, frag), os.listdir(
        mf.fragment_path(arr, frag))[0])
    assert pq.ParquetFile(f).schema_arrow.names == ["k", "v"]
    got = {r.k: r.v for r in
           spark.read.format("tiledb").load(arr).collect()}
    assert got[99] == 9.5


def test_datasource_write_unknown_column_refused(arr, spark):
    """Extra DataFrame columns on df.write.format('tiledb') are refused
    at plan time (pre-r14 they were silently dropped — the same loss
    class as a silently misplaced URI)."""
    df = spark.createDataFrame([(1, 1.0, 9)], "k long, v double, zz long")
    with pytest.raises(Exception, match="zz"):
        df.write.format("tiledb").mode("append").save(arr)
    # nothing committed
    assert all("zz" not in f.name for f in mf.read_manifest(arr).fragments)


def test_lww_newer_path_conforms_legacy_dim_types(arr, spark):
    """A LEGACY fragment (pre-r14 sink: df column order, narrower dim
    type) that OVERLAPS an older fragment must still supersede it: the
    LWW newer-coordinate scan casts legacy dims to the declared types
    before concat/anti-join (uncast int32 vs int64 raised ArrowInvalid
    and killed the read)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    name = mf.new_fragment_name(mf.now_ms() + 10_000)
    fdir = mf.fragment_path(arr, name)
    os.makedirs(fdir)
    pq.write_table(pa.table({"v": pa.array([42.0]),
                             "k": pa.array([0], pa.int32())}),
                   os.path.join(fdir, "part-legacy.parquet"))
    rec = mf.FragmentRecord(name=name,
                            timestamp_range=(mf.now_ms() + 10_000,) * 2,
                            cell_num=1, nonempty_domain={"k": [0, 0]})
    mf.commit(arr, lambda m: m.fragments.append(rec))
    got = {r.k: r.v for r in
           spark.read.format("tiledb").load(arr).collect()}
    assert got[0] == 42.0, "legacy overlapping fragment did not supersede"
    assert got[1] == 1.0, "non-overlapping rows disturbed"


@pytest.mark.parametrize("bad", [
    "file:///tmp/arr#frag", "file:///tmp/arr?x=1", "file:///tmp/my%20dir"])
def test_file_uri_query_fragment_percent_refused(bad):
    """urlsplit parses '#'/'?' as delimiters — returning the truncated
    path would silently retarget the array; refuse instead."""
    from tiledb_py_spark.functions.query_condition import TileDBError
    with pytest.raises(TileDBError, match="ambiguous"):
        mf.require_local_uri(bad)


def test_windows_drive_letter_is_a_local_path():
    """A single letter before ':' is a drive path, not a URI scheme."""
    assert mf.require_local_uri(r"C:\data\arr") == r"C:\data\arr"
    assert mf.require_local_uri("c:/data/arr") == "c:/data/arr"


def test_hash_and_question_fine_in_plain_paths(tmp_path):
    p = str(tmp_path / "arr#1?x")
    assert mf.require_local_uri(p) == p


def test_subarray_label_ranges_are_applied(tmp_path, spark):
    """add_label_range must constrain the read (pre-fix: the stored
    label ranges were never resolved and the query scanned the FULL
    domain)."""
    uri = str(tmp_path / "arr")
    dim = tdb.Dim(name="d", domain=(0, 9), tile=10, dtype=np.int64)
    dls = dim.create_label_schema(order="increasing", dtype=np.int64)
    schema = tdb.ArraySchema(domain=tdb.Domain(dim),
                             attrs=[tdb.Attr("v", dtype=np.float64)],
                             sparse=True, dim_labels={0: {"lbl": dls}})
    tdb.Array.create(uri, schema)
    from tiledb_py_spark.labels import write_label_data

    with tdb.open(uri, mode="w", spark=spark) as A:
        A[np.arange(10)] = {"v": np.arange(10) * 1.0}
    write_label_data(uri, "lbl", np.arange(10), np.arange(10) * 100)
    with tdb.open(uri, spark=spark) as A:
        sub = tdb.Subarray(A)
        sub.add_label_range("lbl", (200, 400))
        r = A.read_subarray(sub)
        assert sorted(r["d"].tolist()) == [2, 3, 4], \
            "label range not applied (full-domain scan)"
        # empty label selection -> empty result, not full scan
        sub2 = tdb.Subarray(A)
        sub2.add_label_range("lbl", (5000, 6000))
        assert len(A.read_subarray(sub2)["d"]) == 0


def test_create_array_from_fragments_dry_run_is_dry(tmp_path, spark):
    uri = str(tmp_path / "src")
    tdb.from_pandas(uri, pd.DataFrame({"k": np.array([1], np.int64),
                                       "v": [1.0]}),
                    index_dims=["k"], full_domain=True)
    dst = str(tmp_path / "dst")
    tdb.create_array_from_fragments(uri, dst, (0, mf.now_ms() + 1000),
                                    dry_run=True)
    assert not mf.array_exists(dst), "dry_run created the destination"
    # the real run works after the preview
    tdb.create_array_from_fragments(uri, dst, (0, mf.now_ms() + 1000))
    assert tdb.open(dst, spark=spark)[:]["k"].tolist() == [1]


def test_query_label_index_applies_cond_and_attrs(tmp_path, spark):
    uri = str(tmp_path / "arr")
    dim = tdb.Dim(name="d", domain=(0, 9), tile=10, dtype=np.int64)
    dls = dim.create_label_schema(order="increasing", dtype=np.int64)
    schema = tdb.ArraySchema(domain=tdb.Domain(dim),
                             attrs=[tdb.Attr("v", dtype=np.float64),
                                    tdb.Attr("w", dtype=np.int64)],
                             sparse=True, dim_labels={0: {"lbl": dls}})
    tdb.Array.create(uri, schema)
    from tiledb_py_spark.labels import write_label_data

    with tdb.open(uri, mode="w", spark=spark) as A:
        A[np.arange(10)] = {"v": np.arange(10) * 1.0,
                            "w": np.arange(10) * 10}
    write_label_data(uri, "lbl", np.arange(10), np.arange(10) * 100)
    with tdb.open(uri, spark=spark) as A:
        r = A.query(cond="v >= 3.0", attrs=["v"]).label_index(["lbl"])[:]
        assert sorted(r["d"].tolist()) == [3, 4, 5, 6, 7, 8, 9], \
            "query cond silently dropped by label_index"
        assert "w" not in r, "attrs projection silently dropped"
        assert sorted(r["lbl"].tolist()) == [300, 400, 500, 600, 700,
                                             800, 900]


def test_open_dataframe_array_idx(tmp_path, spark):
    uri = str(tmp_path / "arr")
    tdb.from_pandas(uri, pd.DataFrame({"k": np.arange(5, dtype=np.int64),
                                       "v": np.arange(5) * 1.0}),
                    index_dims=["k"], full_domain=True)
    df = tdb.open_dataframe(uri, idx=[0, 3])
    assert sorted(df["v"].tolist()) == [0.0, 3.0]


def test_metadata_setdefault_pop_single_commit(arr):
    meta = tdb.open(arr).meta
    v0 = mf.latest_version(arr)
    with tdb.open(arr, mode="w") as A:
        assert A.meta.setdefault("x", 5) == 5
        assert A.meta.setdefault("x", 9) == 5   # existing wins
        assert A.meta.pop("x") == 5
        assert A.meta.pop("x", "gone") == "gone"
    # each mutating call = exactly one commit (4 calls above)
    assert mf.latest_version(arr) == v0 + 4


def test_attr_isascii_and_ncells_semantics():
    assert tdb.Attr("a", dtype="ascii").isascii
    assert tdb.Attr("a", dtype=np.bytes_).isascii
    assert not tdb.Attr("a", dtype="blob").isascii
    assert not tdb.Attr("a", dtype="U").isascii
    assert tdb.Attr("a", dtype=np.dtype("f8,f8")).ncells == 2
    assert tdb.Attr("a", dtype=np.float64).ncells == 1
