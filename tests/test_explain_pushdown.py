"""Plan-shape assertions: the scale guarantees README claims must hold in
the actual physical plan — pushed filters, pruned read schema, broadcast
joins for enum-decode-sized tables."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import tiledb_py_spark as tdb
from tiledb_py_spark.plans import DimRanges, QueryPlan


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


@pytest.fixture()
def arr(uri, spark):
    pdf = pd.DataFrame({"k": np.arange(5000, dtype=np.int64),
                        "a": np.arange(5000) * 1.0,
                        "b": np.arange(5000) * 2.0,
                        "c": [f"s{i}" for i in range(5000)]})
    tdb.from_pandas(uri, pdf, index_dims=["k"])
    return uri


def test_range_predicate_pushed_to_scan(arr, spark):
    A = tdb.open(arr, spark=spark)
    plan = QueryPlan(dim_ranges=[DimRanges(name="k", intervals=[(100, 200)])],
                     attrs=["a"], order="U")
    s = _plan(A._execute(plan))
    assert "PushedFilters" in s
    assert "GreaterThanOrEqual(k,100)" in s
    assert "LessThanOrEqual(k,200)" in s


def test_column_pruning_reaches_scan(arr, spark):
    A = tdb.open(arr, spark=spark)
    plan = QueryPlan(dim_ranges=[], attrs=["a"], order="U")
    s = _plan(A._execute(plan))
    # only k (dim) + a should be read; b and c pruned out of ReadSchema
    read_schema = [ln for ln in s.splitlines() if "ReadSchema" in ln][0]
    assert "a:double" in read_schema
    assert "b:double" not in read_schema
    assert "c:string" not in read_schema


def test_condition_pushed(arr, spark):
    A = tdb.open(arr, spark=spark)
    df = A.dataframe(cond="a > 100.0", attrs=["a"])
    s = _plan(df)
    assert "GreaterThan(a,100.0)" in s


def test_whole_stage_codegen(arr, spark):
    A = tdb.open(arr, spark=spark)
    df = A.dataframe(cond="a > 100.0 and b < 900.0")
    s = _plan(df)
    assert "codegen id" in s  # filter runs in whole-stage generated code
