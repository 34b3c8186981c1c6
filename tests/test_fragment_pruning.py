"""Fragment MBR pruning: range queries must touch only the fragments whose
nonempty domain intersects the ranges — the driver-side pruning that makes
a 1000-executor scan start from an already-short file list (SURVEY.md §4).
"""

import numpy as np
import pandas as pd
import pytest

import tiledb_py_spark as tdb
from tiledb_py_spark.array import _decode_mbr
from tiledb_py_spark.plans import DimRanges
from tiledb_py_spark.plans.range_ir import mbr_intersects


@pytest.fixture()
def multi_frag(uri, spark):
    """Three disjoint-coord fragments: [0,99], [100,199], [200,299]."""
    pdf = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "v": np.zeros(100)})
    # full_domain: later appends land outside batch 1's coord range,
    # which out-of-domain write validation would (rightly) reject
    tdb.from_pandas(uri, pdf, index_dims=["k"], allows_duplicates=True,
                    full_domain=True)
    for base in (100, 200):
        p = pd.DataFrame({"k": np.arange(base, base + 100, dtype=np.int64),
                          "v": np.zeros(100)})
        tdb.from_pandas(uri, p, index_dims=["k"], mode="append")
    return uri


def _pruned_count(A, lo, hi):
    ranges = [DimRanges(name="k", intervals=[(lo, hi)])]
    frs = A._manifest.live_fragments(A.timestamp)
    return sum(1 for f in frs
               if mbr_intersects(ranges, _decode_mbr(A.schema, f.nonempty_domain)))


def test_mbr_prunes_to_one_fragment(multi_frag, spark):
    A = tdb.open(multi_frag, spark=spark)
    assert len(A._manifest.fragments) == 3
    assert _pruned_count(A, 110, 150) == 1
    assert _pruned_count(A, 90, 110) == 2
    assert _pruned_count(A, 0, 300) == 3
    assert _pruned_count(A, 500, 600) == 0


def test_pruned_read_correct(multi_frag, spark):
    A = tdb.open(multi_frag, spark=spark)
    res = A.multi_index[110:150]
    assert sorted(res["k"].tolist()) == list(range(110, 151))
    # out-of-range read returns empty, not an error
    res = A.multi_index[500:600]
    assert len(res["k"]) == 0


def test_timestamp_pruning(multi_frag, spark):
    frags = tdb.array_fragments(multi_frag)
    ts_first = frags[0].timestamp_range[1]
    A = tdb.open(multi_frag, timestamp=ts_first, spark=spark)
    assert len(A._manifest.live_fragments(A.timestamp)) == 1
    assert A.nonempty_domain() == ((0, 99),)
