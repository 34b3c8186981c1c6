"""Footer-statistics range bounds (operators/stats_bounds.py): the
driver-side replacement for the keyless-asof / prefix-sum sampling job.
"""

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tiledb_py_spark.operators.stats_bounds import (mixture_quantile_bounds,
                                                    parquet_range_bounds,
                                                    row_group_stats)


def test_mixture_quantiles_single_uniform_group():
    bounds = mixture_quantile_bounds([(0.0, 100.0, 1000)], 4)
    assert bounds == pytest.approx([25.0, 50.0, 75.0], abs=1e-6)


def test_mixture_quantiles_weighted_groups():
    # 90% of rows in [0, 10], 10% in [10, 100]: the median must sit
    # inside the dense range, not at the naive midpoint 50
    bounds = mixture_quantile_bounds([(0.0, 10.0, 900), (10.0, 100.0, 100)], 2)
    assert len(bounds) == 1 and 5.0 < bounds[0] < 6.0


def test_mixture_quantiles_point_mass_collapses():
    # all mass at one point -> no usable cut
    assert mixture_quantile_bounds([(7.0, 7.0, 100)], 8) == []
    assert mixture_quantile_bounds([], 8) == []
    assert mixture_quantile_bounds([(0.0, 1.0, 100)], 1) == []


def test_parquet_bounds_numeric(tmp_path):
    rng = np.random.RandomState(3)
    vals = np.sort(rng.randint(0, 10**6, 50_000).astype(np.int64))
    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"x": vals}), p, row_group_size=5000)
    bounds = parquet_range_bounds(p, "x", 8)
    assert bounds and len(bounds) == 7
    # balance: each bucket holds roughly 1/8 of the rows (uniform data,
    # 10 narrow sorted row groups -> near-exact quantiles)
    counts = np.histogram(vals, bins=[-np.inf, *bounds, np.inf])[0]
    assert counts.min() > len(vals) / 8 * 0.7

    # directory input resolves part files
    d = tmp_path / "dir"
    d.mkdir()
    pq.write_table(pa.table({"x": vals[:25_000]}), str(d / "a.parquet"))
    pq.write_table(pa.table({"x": vals[25_000:]}), str(d / "b.parquet"))
    assert parquet_range_bounds(str(d), "x", 8)


def test_parquet_bounds_timestamp_epoch_micros(tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    ts = [t0 + datetime.timedelta(hours=i) for i in range(240)]
    p = str(tmp_path / "ts.parquet")
    pq.write_table(pa.table({"ts": pa.array(ts, pa.timestamp("us"))}), p)
    bounds = parquet_range_bounds(p, "ts", 4)
    assert bounds and len(bounds) == 3
    lo = t0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6
    hi = (ts[-1].replace(tzinfo=datetime.timezone.utc).timestamp()) * 1e6
    assert all(lo < b < hi for b in bounds)


def test_parquet_bounds_string_column_returns_none(tmp_path):
    p = str(tmp_path / "s.parquet")
    pq.write_table(pa.table({"s": ["a", "b", "c"]}), p)
    assert parquet_range_bounds(p, "s", 4) is None
    assert row_group_stats(p, "no_such_column") is None
