"""Round-13 review-batch fixes, each pinned: fragment maintenance
(partial-consolidation delete scoping, vacuum safety, window-copy
carriers + deletes), label-table durability and per-cell alignment,
schema-evolution drop order / timestamp refusal, CDC single-scan
delete probe."""

import os
import time

import numpy as np
import pandas as pd
import pytest

import tiledb_py_spark as tdb
from tiledb_py_spark import manifest as mf


def _mk(uri, n=10):
    pdf = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                        "v": np.arange(n) * 1.0})
    tdb.from_pandas(uri, pdf, index_dims=["k"], full_domain=True)


def _rows(uri, spark, timestamp=None):
    res = tdb.open(uri, timestamp=timestamp, spark=spark).multi_index[:]
    return dict(zip(res["k"].tolist(), res["v"].tolist()))


# -- F1: partial consolidation must not materialize LATER deletes -------

def test_partial_consolidation_later_delete_timetravel(uri, spark):
    """A delete committed AFTER the folded writes is not baked into the
    product (stamped at the write-only max ts): a timestamped open
    between write and delete still sees the row; opens after the delete
    see it removed (the live delete anti-applies to the product)."""
    _mk(uri)
    ts_write = tdb.array_fragments(uri)[0].timestamp_range[1]
    time.sleep(0.002)
    with tdb.open(uri, "d", spark=spark) as A:
        A.query(cond="v >= 5.0").submit()
    frag_names = [f.uri for f in tdb.array_fragments(uri)]
    tdb.consolidate(uri, fragment_uris=frag_names)   # partial: the write
    # post-write/pre-delete open: the delete had not happened yet
    assert len(_rows(uri, spark, timestamp=ts_write)) == 10
    # current open: delete applies (stays live, anti-applied on read)
    assert sorted(_rows(uri, spark)) == [0, 1, 2, 3, 4]
    # the delete fragment is still live (not superseded) in the manifest
    dels = [f for f in mf.read_manifest(uri).fragments
            if f.kind == "delete"]
    assert dels and all(f.superseded_by is None for f in dels)


def test_partial_consolidation_earlier_delete_materialized(uri, spark):
    """A delete committed BEFORE the folded subset's max write ts IS
    materialized (its re-application on read is a no-op), matching the
    documented contract."""
    _mk(uri)
    time.sleep(0.002)
    with tdb.open(uri, "d", spark=spark) as A:
        A.query(cond="v < 2.0").submit()
    time.sleep(0.002)
    tdb.from_pandas(uri, pd.DataFrame({"k": np.arange(10, 13, dtype=np.int64),
                                       "v": [10.0, 11.0, 12.0]}),
                    index_dims=["k"], mode="append")
    names = [f.uri for f in tdb.array_fragments(uri)]
    tdb.consolidate(uri, fragment_uris=names)
    assert sorted(_rows(uri, spark)) == [2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]


# -- F2: vacuum must not delete uncommitted in-flight fragment dirs -----

def test_vacuum_spares_inflight_fragment_dir(uri, spark):
    """A fragment directory with data on disk but no manifest record yet
    (a concurrent writer between its parquet write and its commit) must
    survive vacuum; superseded dirs are still removed."""
    _mk(uri)
    tdb.from_pandas(uri, pd.DataFrame({"k": np.array([20], dtype=np.int64),
                                       "v": [20.0]}),
                    index_dims=["k"], mode="append")
    inflight = os.path.join(mf.fragments_dir(uri), "frag_9999_9999_inflight")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "wb") as f:
        f.write(b"not yet committed")
    tdb.consolidate(uri)
    removed = tdb.vacuum(uri)
    assert removed == 2                       # exactly the superseded pair
    assert os.path.isdir(inflight), "vacuum destroyed an in-flight write"
    assert sorted(_rows(uri, spark)) == list(range(10)) + [20]


# -- F3/F4: window copies carry superseded originals AND deletes --------

def test_copy_to_existing_array_superseded_carrier(uri, tmp_path, spark):
    """copy_fragments_to_existing_array: a fragment superseded by an
    out-of-window consolidation product is the only carrier of its
    window — it must travel (create_array_from_fragments already did;
    the two now share selection)."""
    from tiledb_py_spark.fragment import copy_fragments_to_existing_array

    _mk(uri)
    ts_w = tdb.array_fragments(uri)[0].timestamp_range[1]
    time.sleep(0.002)
    tdb.consolidate(uri)                      # product AFTER the window
    dst = str(tmp_path / "dst")
    tdb.from_pandas(dst, pd.DataFrame({"k": np.array([0], dtype=np.int64),
                                       "v": [0.0]}),
                    index_dims=["k"], mode="schema_only", full_domain=True)
    copied = copy_fragments_to_existing_array(uri, dst, (0, ts_w))
    assert copied, "in-window data dropped because its carrier was superseded"
    assert sorted(_rows(dst, spark)) == list(range(10))
    tdb.vacuum(dst)                           # cleared superseded_by: safe
    assert sorted(_rows(dst, spark)) == list(range(10))


def test_window_copy_carries_deletes(uri, tmp_path, spark):
    """An unmaterialized in-window delete travels with the copy — its
    removed rows must not resurrect in the destination."""
    from tiledb_py_spark.fragment import (copy_fragments_to_existing_array,
                                          create_array_from_fragments)

    _mk(uri)
    time.sleep(0.002)
    with tdb.open(uri, "d", spark=spark) as A:
        A.query(cond="v >= 5.0").submit()
    hi = max(f.timestamp_range[1]
             for f in mf.read_manifest(uri).fragments) + 1

    new = str(tmp_path / "new")
    create_array_from_fragments(uri, new, (0, hi))
    assert sorted(_rows(new, spark)) == [0, 1, 2, 3, 4]

    dst = str(tmp_path / "dst")
    tdb.from_pandas(dst, pd.DataFrame({"k": np.array([0], dtype=np.int64),
                                       "v": [0.0]}),
                    index_dims=["k"], mode="schema_only", full_domain=True)
    copy_fragments_to_existing_array(uri, dst, (0, hi))
    assert sorted(_rows(dst, spark)) == [0, 1, 2, 3, 4]


# -- F6: label-table swap is crash-safe ---------------------------------

def test_label_swap_crash_recovery(uri, spark):
    """A swap that died between its two renames (live missing, .old
    holding the committed table) is completed backward by the next
    reader/writer instead of KeyError / merging against nothing."""
    from tiledb_py_spark.labels import (read_label_data, write_label_data,
                                        write_label_dataframe)

    dim = tdb.Dim(name="k", domain=(0, 9), tile=10, dtype=np.int64)
    schema = tdb.ArraySchema(
        domain=tdb.Domain(dim),
        attrs=[tdb.Attr(name="v", dtype=np.int64)], sparse=True,
        dim_labels={0: {"temp": dim.create_label_schema("increasing",
                                                        np.float64)}})
    tdb.Array.create(uri, schema)
    with tdb.open(uri, "w", spark=spark) as A:
        A[np.arange(10)] = np.arange(10) * 10
    write_label_data(uri, "temp", np.arange(10), np.arange(10) * 0.5)
    # distributed upsert leaves a parquet DIRECTORY
    sdf = spark.createDataFrame([(0, 99.0)], ["__coord", "__label"])
    write_label_dataframe(uri, "temp", sdf)
    f = os.path.join(uri, "__labels", "temp", "labels.parquet")
    assert os.path.isdir(f)
    # simulate the crash window: live renamed away, .old present
    os.rename(f, f + ".old")
    got = read_label_data(uri, "temp")        # recovers, no KeyError
    assert got.loc[got["__coord"] == 0, "__label"].iloc[0] == 99.0
    assert os.path.exists(f) and not os.path.exists(f + ".old")
    # a write after a (recovered) crash merges against the real table
    write_label_data(uri, "temp", np.array([1]), np.array([7.0]))
    got = read_label_data(uri, "temp")
    assert len(got) == 10
    assert got.loc[got["__coord"] == 1, "__label"].iloc[0] == 7.0
    assert got.loc[got["__coord"] == 0, "__label"].iloc[0] == 99.0


# -- F7: labels align per result cell -----------------------------------

def test_sparse_label_alignment_multi_cell(tmp_path, spark):
    """2-D sparse array: several cells share one labeled coord and one
    labeled coord has no cells — the label column must align per CELL
    (coord lookup), not positionally per label row."""
    from tiledb_py_spark.labels import write_label_data

    uri = str(tmp_path / "arr2d")
    d0 = tdb.Dim(name="r", domain=(0, 9), tile=10, dtype=np.int64)
    d1 = tdb.Dim(name="c", domain=(0, 9), tile=10, dtype=np.int64)
    schema = tdb.ArraySchema(
        domain=tdb.Domain(d0, d1),
        attrs=[tdb.Attr(name="v", dtype=np.int64)], sparse=True,
        dim_labels={0: {"lab": d0.create_label_schema("increasing",
                                                      np.int64)}})
    tdb.Array.create(uri, schema)
    with tdb.open(uri, "w", spark=spark) as A:
        # coords: r=5 twice, r=7 once; r=6 labeled but cell-less
        A[np.array([5, 5, 7]), np.array([0, 1, 0])] = \
            {"v": np.array([50, 51, 70])}
    write_label_data(uri, "lab", np.array([5, 6, 7]),
                     np.array([500, 600, 700]))
    A = tdb.open(uri, spark=spark)
    res = A.label_index(["lab"])[500:700]
    assert len(res["lab"]) == len(res["r"]) == 3
    by_cell = sorted(zip(res["r"].tolist(), res["c"].tolist(),
                         res["lab"].tolist()))
    assert by_cell == [(5, 0, 500), (5, 1, 500), (7, 0, 700)]


def test_dense_label_gap_refused(tmp_path, spark):
    """Dense label reads refuse a label table with holes in the matched
    interval instead of silently misaligning the label axis."""
    from tiledb_py_spark.labels import write_label_data

    uri = str(tmp_path / "dense_arr")
    dim = tdb.Dim(name="k", domain=(0, 9), tile=10, dtype=np.int64)
    schema = tdb.ArraySchema(
        domain=tdb.Domain(dim),
        attrs=[tdb.Attr(name="v", dtype=np.float64, fill=0.0)], sparse=False,
        dim_labels={0: {"lab": dim.create_label_schema("increasing",
                                                       np.int64)}})
    tdb.Array.create(uri, schema)
    with tdb.open(uri, "w", spark=spark) as A:
        A[0:10] = {"v": np.arange(10) * 1.0}
    write_label_data(uri, "lab", np.array([2, 4]), np.array([20, 40]))
    A = tdb.open(uri, spark=spark)
    with pytest.raises(KeyError, match="gap-free"):
        A.label_index(["lab"])[20:40]        # coords 2..4, label 3 missing


# -- F8/F9: schema evolution ---------------------------------------------

def test_evolution_drop_attr_and_enum_together(uri, spark):
    """Dropping an attribute and its enumeration in ONE evolution works
    (reference applies ops in call order; the fixed enum-first order
    used to raise 'still referenced')."""
    pdf = pd.DataFrame({"k": np.arange(3, dtype=np.int64),
                        "v": np.arange(3) * 1.0,
                        "col": pd.Categorical(["red", "blue", "red"])})
    tdb.from_pandas(uri, pdf, index_dims=["k"])
    ev = tdb.ArraySchemaEvolution()
    ev.drop_attribute("col")
    ev.drop_enumeration("col")
    ev.array_evolve(uri)
    schema = tdb.open(uri, spark=spark).schema
    assert not schema.has_attr("col")
    assert "col" not in schema.enums
    # dropping a STILL-referenced enum alone keeps raising
    ev2 = tdb.ArraySchemaEvolution()
    ev2.add_enumeration(tdb.Enumeration("e2", False, ["a"]))
    ev2.array_evolve(uri)
    ev3 = tdb.ArraySchemaEvolution()
    ev3.add_attribute(tdb.Attr(name="a2", dtype=np.int64, enum_label="e2"))
    ev3.array_evolve(uri)
    ev4 = tdb.ArraySchemaEvolution()
    ev4.drop_enumeration("e2")
    with pytest.raises(ValueError, match="still referenced"):
        ev4.array_evolve(uri)


def test_evolution_timestamp_refused():
    ev = tdb.ArraySchemaEvolution()
    with pytest.raises(NotImplementedError, match="timestamp"):
        ev.timestamp(12345)


# -- F10: changelog delete probe is one scan -----------------------------

def test_changelog_multi_delete_window(uri, spark):
    """Two delete commits inside the window: the changelog reports both
    key sets as deleted (single OR'd snapshot scan)."""
    from tiledb_py_spark.cdc import changelog

    _mk(uri)
    ts1 = max(f.timestamp_range[1]
              for f in mf.read_manifest(uri).fragments)
    time.sleep(0.002)
    with tdb.open(uri, "d", spark=spark) as A:
        A.query(cond="v >= 8.0").submit()
    time.sleep(0.002)
    with tdb.open(uri, "d", spark=spark) as A:
        A.query(cond="v < 1.0").submit()
    ts2 = max(f.timestamp_range[1]
              for f in mf.read_manifest(uri).fragments) + 1
    out = changelog(uri, ts1, ts2, spark=spark).collect()
    deleted = sorted(r.k for r in out if r.change == "delete")
    assert deleted == [0, 8, 9]
    assert all(r.change == "delete" for r in out)
