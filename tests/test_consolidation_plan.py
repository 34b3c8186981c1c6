"""ConsolidationPlan (reference consolidation_plan.py:9-117) and
partial consolidation via Array.consolidate(fragment_uris=...)."""

import json

import numpy as np
import pandas as pd

import tiledb_py_spark as tdb


def _write_n_fragments(uri, n, rows_per=100):
    for i in range(n):
        pdf = pd.DataFrame({
            "k": np.arange(i * rows_per, (i + 1) * rows_per, dtype=np.int64),
            "v": np.full(rows_per, float(i))})
        tdb.from_pandas(uri, pdf, index_dims=["k"], full_domain=True,
                        mode="ingest" if i == 0 else "append")


def test_plan_api_shape(uri, spark):
    _write_n_fragments(uri, 4)
    with tdb.open(uri, spark=spark) as A:
        plan = tdb.ConsolidationPlan(None, A, 1)  # 1 byte: one frag per node
    assert plan.num_nodes == 4
    assert len(plan) == 4
    for i in range(plan.num_nodes):
        assert plan.num_fragments(i) == 1
        node = plan[i]
        assert node["num_fragments"] == 1
        assert node["fragment_uris"] == [plan.fragment_uri(i, 0)]
    # big budget: everything lands in one node
    with tdb.open(uri, spark=spark) as A:
        one = tdb.ConsolidationPlan(None, A, 1 << 40)
    assert one.num_nodes == 1 and one.num_fragments(0) == 4
    dumped = json.loads(one.dump())
    assert len(dumped["nodes"]) == 1
    assert len(dumped["nodes"][0]["uris"]) == 4
    assert "node_0" in repr(one)


def test_plan_rejects_bad_fragment_size(uri, spark):
    _write_n_fragments(uri, 1)
    import pytest

    with pytest.raises(ValueError):
        tdb.ConsolidationPlan(None, uri, "huge")


def test_partial_consolidation_by_plan_node(uri, spark):
    """Consolidating one plan node folds only its fragments; data and the
    other fragments are untouched."""
    _write_n_fragments(uri, 4)
    with tdb.open(uri, spark=spark) as A:
        plan = tdb.ConsolidationPlan(None, A, 1)
        before = A.dataframe().orderBy("k").toPandas()
    # fold the two middle fragments together
    node_uris = plan[1]["fragment_uris"] + plan[2]["fragment_uris"]
    with tdb.open(uri, "w", spark=spark) as A:
        A.consolidate(fragment_uris=node_uris)
    frags = tdb.array_fragments(uri)
    assert len(frags) == 3  # 4 - 2 folded + 1 new
    with tdb.open(uri, spark=spark) as A:
        after = A.dataframe().orderBy("k").toPandas()
    pd.testing.assert_frame_equal(before, after)
    # vacuum drops the two superseded originals
    assert tdb.vacuum(uri) == 2


def test_partial_consolidation_preserves_live_deletes(uri, spark):
    """A delete fragment stays live through partial consolidation: its
    effect is materialized in the folded subset AND still applies to
    untouched fragments."""
    _write_n_fragments(uri, 3)  # ks 0-99, 100-199, 200-299; v = 0,1,2
    with tdb.open(uri, "d", spark=spark) as A:
        A.query(cond="k >= 50 and k < 250").submit_delete()
    with tdb.open(uri, spark=spark) as A:
        plan = tdb.ConsolidationPlan(None, A, 1)
    # fold only the FIRST fragment (k 0-99)
    with tdb.open(uri, "w", spark=spark) as A:
        A.consolidate(fragment_uris=plan[0]["fragment_uris"])
    with tdb.open(uri, spark=spark) as A:
        out = A.dataframe().orderBy("k").toPandas()
    # the delete holds everywhere: 0-49 and 250-299 survive
    assert out["k"].tolist() == list(range(50)) + list(range(250, 300))
