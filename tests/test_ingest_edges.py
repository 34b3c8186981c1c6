"""Ingestion edge cases surfaced by the round-12 review of
``sources/dataframe_.py`` / ``fragment_writer.py`` /
``functions/query_condition.py`` — every case here was previously
either silent corruption (dropped coordinates, mis-declared schemas,
garbled parses) or a raw internal error far from the user's mistake."""

import numpy as np
import pandas as pd
import pytest

import tiledb_py_spark as tdb
from tiledb_py_spark import manifest as mf
from tiledb_py_spark.sources.dataframe_ import from_csv, from_json, from_spark


def test_from_spark_append_default_index_sparse(tmp_path, spark):
    """Appending to a from_spark default-index array generates fresh
    __tiledb_rows coords above every existing one (pre-r12 the append
    committed coordinate-less rows — silent corruption)."""
    uri = str(tmp_path / "arr")
    from_spark(uri, spark.createDataFrame([(x,) for x in (1.0, 2.0)],
                                          "v double"))
    from_spark(uri, spark.createDataFrame([(x,) for x in (3.0, 4.0)],
                                          "v double"), mode="append")
    out = tdb.open(uri, spark=spark).dataframe().toPandas()
    assert sorted(out["v"]) == [1.0, 2.0, 3.0, 4.0]
    rows = out["__tiledb_rows"]
    assert rows.nunique() == 4        # no coordinate collisions


def test_from_spark_append_default_index_dense(tmp_path, spark):
    """Appending via from_spark to a DENSE default-index array created
    by from_pandas gets CONTIGUOUS row coords continuing the grid."""
    uri = str(tmp_path / "arr")
    tdb.from_pandas(uri, pd.DataFrame({"v": [1.0, 2.0]}),
                    full_domain=True)
    from_spark(uri, spark.createDataFrame([(3.0,), (4.0,)], "v double"),
               mode="append")
    out = tdb.open(uri, spark=spark).df[:]
    assert out["v"].tolist() == [1.0, 2.0, 3.0, 4.0]


def test_writers_refuse_missing_schema_columns(tmp_path, spark):
    from tiledb_py_spark.sources.fragment_writer import (
        write_fragment_pandas, write_fragment_spark)

    uri = str(tmp_path / "arr")
    tdb.from_pandas(uri, pd.DataFrame({"k": [1, 2], "a": [1.0, 2.0],
                                       "b": [3.0, 4.0]}),
                    index_dims=["k"], full_domain=True)
    schema = mf.read_manifest(uri).schema
    with pytest.raises(ValueError, match="missing schema columns.*'b'"):
        write_fragment_pandas(uri, schema,
                              pd.DataFrame({"k": [9], "a": [9.0]}))
    with pytest.raises(ValueError, match="missing schema columns"):
        write_fragment_spark(uri, schema,
                             spark.createDataFrame([(9, 9.0)],
                                                   "k long, a double"))
    # nothing was committed by the refused writes
    assert len(tdb.array_fragments(uri)) == 1


def test_from_csv_spark_honors_sep(tmp_path, spark):
    p = tmp_path / "d.csv"
    p.write_text("k;v\n1;10\n2;20\n")
    uri = str(tmp_path / "arr")
    from_csv(uri, str(p), spark=spark, index_dims=["k"], sep=";")
    out = tdb.open(uri, spark=spark).df[:].reset_index()
    assert sorted(out["v"]) == [10, 20]
    with pytest.raises(NotImplementedError, match="dtype"):
        from_csv(str(tmp_path / "arr2"), str(p), spark=spark,
                 dtype={"k": "int64"})
    with pytest.raises(NotImplementedError, match="convert_dates"):
        from_json(str(tmp_path / "arr3"), str(p), spark=spark,
                  convert_dates=False)


def test_list_of_strings_refused(tmp_path, spark):
    with pytest.raises(TypeError, match="delimited string"):
        tdb.from_pandas(str(tmp_path / "a1"),
                        pd.DataFrame({"tags": [["a", "b"], ["c"]]}))
    with pytest.raises(TypeError, match="array<string>"):
        from_spark(str(tmp_path / "a2"),
                   spark.createDataFrame([(["a", "b"],)],
                                         "tags array<string>"))


def test_enum_append_unknown_label_and_nulls(tmp_path, spark):
    uri = str(tmp_path / "arr")
    pdf = pd.DataFrame({"k": [0, 1],
                        "tier": pd.Categorical(["gold", "silver"])})
    tdb.from_pandas(uri, pdf, index_dims=["k"], full_domain=True)
    # unknown label: loud refusal, not IntCastingNaNError / silent -1
    bad = pd.DataFrame({"k": [2], "tier": ["platinum"]})
    with pytest.raises(ValueError, match="platinum.*enumeration|not.*in the stored enumeration"):
        tdb.from_pandas(uri, bad, index_dims=["k"], mode="append")
    # unseen CATEGORICAL category refuses too (was silent code -1)
    bad_cat = pd.DataFrame({"k": [2],
                            "tier": pd.Categorical(["platinum"])})
    with pytest.raises(ValueError, match="platinum"):
        tdb.from_pandas(uri, bad_cat, index_dims=["k"], mode="append")
    # null into a non-nullable enum attr refuses with context
    with pytest.raises(ValueError, match="not nullable"):
        tdb.from_pandas(uri, pd.DataFrame({"k": [2], "tier": [None]}),
                        index_dims=["k"], mode="append")
    # valid labels still append fine
    tdb.from_pandas(uri, pd.DataFrame({"k": [2], "tier": ["gold"]}),
                    index_dims=["k"], mode="append")
    out = tdb.open(uri, spark=spark).df[:].reset_index().sort_values("k")
    assert list(out["tier"]) == ["gold", "silver", "gold"]


def test_enum_append_nullable_nulls_roundtrip(tmp_path, spark):
    uri = str(tmp_path / "arr")
    pdf = pd.DataFrame({"k": [0, 1],
                        "tier": pd.Categorical(["gold", None])})
    tdb.from_pandas(uri, pdf, index_dims=["k"], full_domain=True)
    tdb.from_pandas(uri, pd.DataFrame({"k": [2], "tier": [None]}),
                    index_dims=["k"], mode="append")
    out = tdb.open(uri, spark=spark).df[:].reset_index().sort_values("k")
    assert list(out["tier"].isna()) == [False, True, True]
    assert out["tier"].iloc[0] == "gold"


def test_chunked_csv_float_and_datetime_dims(tmp_path, spark):
    """Chunked ingest declares FULL domains for float and datetime
    index dims too — pre-r12 the domain was pinned to chunk 1's
    min/max, so chunk 2 was rejected (floats) or silently committed
    out-of-domain (datetimes)."""
    p = tmp_path / "d.csv"
    rows = ["price,ts,v"]
    for i in range(10):
        rows.append(f"{i * 100.5},2024-01-{i + 1:02d},{i}")
    p.write_text("\n".join(rows) + "\n")
    u1 = str(tmp_path / "by_price")
    from_csv(u1, str(p), index_dims=["price"], chunksize=3)
    out = tdb.open(u1, spark=spark).df[:].reset_index()
    assert len(out) == 10 and out["v"].sum() == 45
    u2 = str(tmp_path / "by_ts")
    from_csv(u2, str(p), index_dims=["ts"], chunksize=3,
             parse_dates=["ts"])
    out = tdb.open(u2, spark=spark).df[:].reset_index()
    assert len(out) == 10
    # chunk-2 coordinates are INSIDE the declared domain (not silently
    # out-of-domain): every fragment MBR fits (ns datetimes store as
    # int64, so the MBR bounds compare in the int64 view)
    man = mf.read_manifest(u2)
    lo, hi = man.schema.domain.dim(0).domain
    lo_i, hi_i = (int(np.asarray(v).view("int64")) for v in (lo, hi))

    def as_i(x):
        return int(x) if not isinstance(x, str) \
            else int(np.datetime64(x).astype("datetime64[ns]")
                     .view("int64"))

    for f in man.fragments:
        b = f.nonempty_domain["ts"]
        assert lo_i <= as_i(b[0]) and as_i(b[1]) <= hi_i


def test_multiindex_explicit_index_dims(tmp_path, spark):
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0]},
                       index=pd.MultiIndex.from_product(
                           [[0, 1], [0, 1]], names=["x", "y"]))
    uri = str(tmp_path / "arr")
    tdb.from_pandas(uri, pdf, index_dims=["x", "y"], full_domain=True)
    out = tdb.open(uri, spark=spark).df[:]
    assert out["v"].tolist() == [1.0, 2.0, 3.0, 4.0]
    # genuinely absent names still refuse with a clear KeyError
    with pytest.raises(KeyError, match="index_dims.*'zz'"):
        tdb.from_pandas(str(tmp_path / "bad"), pdf.reset_index(),
                        index_dims=["zz"])


def test_from_spark_default_index_hidden_on_roundtrip(tmp_path, spark):
    uri = str(tmp_path / "arr")
    from_spark(uri, spark.createDataFrame([(1.0,), (2.0,)], "v double"))
    out = tdb.open_dataframe(uri)
    # the synthetic row dim is index machinery, not data (from_pandas
    # round-trip parity — pre-r12 it leaked as a column)
    assert "__tiledb_rows" not in out.columns
    assert sorted(out["v"]) == [1.0, 2.0]


def test_flatten_structs_collision_refused(tmp_path, spark):
    import json as _json

    p = tmp_path / "d.jsonl"
    p.write_text("\n".join(_json.dumps(r) for r in [
        {"a_b": 1, "a": {"b": 2}}, {"a_b": 3, "a": {"b": 4}}]) + "\n")
    with pytest.raises(ValueError, match="collide"):
        from_json(str(tmp_path / "arr"), str(p), spark=spark,
                  flatten=True)


def test_query_condition_unknown_names_raise(tmp_path, spark):
    from tiledb_py_spark.functions.query_condition import TileDBError

    uri = str(tmp_path / "arr")
    tdb.from_pandas(uri, pd.DataFrame(
        {"k": [0, 1], "flag": [True, False], "x": [1.0, 5.0]}),
        index_dims=["k"], full_domain=True)
    A = tdb.open(uri, spark=spark)
    # bare boolean attr with a typo: immediate TileDBError, not a
    # Spark AnalysisException later
    with pytest.raises(TileDBError, match="flagg"):
        A.query(cond="flagg and x > 2").df[:]
    with pytest.raises(TileDBError, match="typo"):
        A.query(cond="attr('typo') == 5").df[:]
    # the valid forms still work
    assert len(A.query(cond="flag").df[:]) == 1
    assert len(A.query(cond="attr('x') > 2").df[:]) == 1
