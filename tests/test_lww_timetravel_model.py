"""Model-based LWW / delete / consolidate / time-travel semantics.

Random sequences of overlapping appends (no-duplicates array: last
write wins), delete-condition commits, and consolidate+vacuum at a
random point are checked against a pure-python event-replay model at
the latest timestamp on both read surfaces.  Model rules (reference
`/root/reference/tiledb/libtiledb` read semantics, SURVEY §2 S12/S15):

- a cell's value at time T is the latest write at-or-before T;
- a delete at time D removes cells whose latest write is <= D and that
  match the condition; a cell re-written AFTER D resurfaces;
- consolidation+vacuum preserves the latest-timestamp view but drops
  the ability to open before the consolidated range's end (fragments
  folded into a product spanning [t_min, t_max] are visible only to
  opens at >= t_max; this engine keeps un-folded delete records live).
"""

import time

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import tiledb_py_spark as tdb
from tiledb_py_spark import manifest as mf
from tiledb_py_spark.sources.spark_datasource import register

KEYS = [0, 1, 2, 3]


@pytest.fixture(scope="module")
def spark():
    s = tdb.get_spark(cpus="8")
    s.sparkContext.setLogLevel("ERROR")
    register(s)
    return s


op = st.one_of(
    st.tuples(st.just("write"),
              st.lists(st.sampled_from(KEYS), min_size=1, max_size=3,
                       unique=True)),
    st.tuples(st.just("delete"), st.integers(0, 400)),  # threshold v <= x
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=st.lists(op, min_size=2, max_size=7),
       consolidate_at=st.integers(0, 6))
def test_random_lww_delete_sequences_match_model(ops, consolidate_at,
                                                 spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("lww")
    uri = str(base / "arr")
    tdb.from_pandas(
        uri,
        pd.DataFrame({"k": np.array(KEYS, np.int64),
                      "v": np.array([10 * k for k in KEYS], np.int64)}),
        index_dims=["k"], full_domain=True)

    # model: k -> (write_seq, value); deletes tracked as (seq, threshold)
    seq = 0
    state = {k: (seq, 10 * k) for k in KEYS}
    deletes = []

    for i, o in enumerate(ops):
        time.sleep(0.003)  # distinct ms timestamps keep ordering crisp
        seq += 1
        if o[0] == "write":
            ks = o[1]
            vals = [100 * seq + k for k in ks]
            tdb.from_pandas(uri, pd.DataFrame(
                {"k": np.array(ks, np.int64),
                 "v": np.array(vals, np.int64)}),
                index_dims=["k"], mode="append")
            for k, v in zip(ks, vals):
                state[k] = (seq, v)
        else:
            thr = o[1]
            with tdb.open(uri, mode="d", spark=spark) as A:
                A.query(cond=f"v <= {thr}").submit()
            deletes.append((seq, thr))
        if i + 1 == consolidate_at:
            tdb.consolidate(uri)
            tdb.vacuum(uri)

    # expected at latest time: replay each key's write/delete event
    # history in commit order — a delete kills the cell if its
    # then-current value matches; a later write resurrects it
    def expected():
        out = {}
        for k in KEYS:
            writes = [(0, 10 * k)]
            sq = 0
            for oo in ops:
                sq += 1
                if oo[0] == "write" and k in oo[1]:
                    writes.append((sq, 100 * sq + k))
            alive_val = None
            events = ([(s, "w", v2) for s, v2 in writes]
                      + [(s, "d", thr) for s, thr in deletes])
            events.sort(key=lambda e: (e[0], e[1] == "d"))
            for s, kind, x in events:
                if kind == "w":
                    alive_val = x
                elif alive_val is not None and alive_val <= x:
                    alive_val = None
            if alive_val is not None:
                out[k] = alive_val
        return out

    want = expected()

    with tdb.open(uri, spark=spark) as A:
        r = A[:]
        native = dict(zip(r["k"].tolist(), r["v"].tolist()))
    assert native == want, f"native {native} != model {want}\nops={ops} " \
                           f"cons@{consolidate_at}"

    ds = {row.k: row.v for row in
          spark.read.format("tiledb").load(uri).collect()}
    assert ds == want, f"datasource {ds} != model {want}\nops={ops} " \
                       f"cons@{consolidate_at}"
