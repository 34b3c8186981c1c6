"""Model-based evolution semantics: random add/drop/re-add/write
sequences checked against a pure-pandas model on BOTH read surfaces.

The model: every row reads, for each attr in the FINAL schema, the
value written with it if the writing fragment's schema contained that
attr *incarnation* (same name AND the write happened at-or-after the
attr's latest (re-)add), else the attr's fill (non-nullable) / null.
This is the reference's attribute-identity semantics
(`/root/reference/tiledb/schema_evolution.py`) generalized over any
op sequence — the drop/re-add corruption class fixed in r14
(`tests/test_attr_identity.py`) falls out as a special case.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import tiledb_py_spark as tdb
from tiledb_py_spark.sources.spark_datasource import register

DTYPES = {
    "i": (np.int64, -1),
    "f": (np.float64, -1.5),
    "s": ("U", "fill"),
}
ATTR_NAMES = ["a", "b"]


@pytest.fixture(scope="module")
def spark():
    s = tdb.get_spark(cpus="8")
    s.sparkContext.setLogLevel("ERROR")
    register(s)
    return s


# an op is ("write",), ("add", name, dtype_key) or ("drop", name);
# invalid ops for the current schema state are skipped at runtime
op = st.one_of(
    st.just(("write",)),
    st.tuples(st.just("add"), st.sampled_from(ATTR_NAMES),
              st.sampled_from(sorted(DTYPES))),
    st.tuples(st.just("drop"), st.sampled_from(ATTR_NAMES)),
)


def _value_for(dtype_key, epoch, row):
    if dtype_key == "i":
        return np.int64(100 * epoch + row)
    if dtype_key == "f":
        return float(100 * epoch + row) + 0.25
    return f"v{epoch}_{row}"


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=st.lists(op, min_size=1, max_size=8))
def test_random_evolution_sequences_match_model(ops, spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("evo")
    uri = str(base / "arr")

    # live state of the model
    schema = {}          # name -> (dtype_key, incarnation_id)
    incarnation = 0
    rows = []            # (k, {(name, incarnation): value})
    next_k = 0

    # create with one starting attr so the array always has >= 1 attr
    schema["a"] = ("i", incarnation)
    tdb.from_pandas(
        uri,
        pd.DataFrame({"k": np.array([next_k], np.int64),
                      "a": np.array([_value_for("i", 0, next_k)], np.int64)}),
        index_dims=["k"], full_domain=True)
    rows.append((next_k, {("a", incarnation): _value_for("i", 0, next_k)}))
    next_k += 1

    epoch = 0
    for o in ops:
        epoch += 1
        if o[0] == "write":
            data = {"k": np.array([next_k], np.int64)}
            vals = {}
            for name, (dk, inc) in schema.items():
                v = _value_for(dk, epoch, next_k)
                np_dt = DTYPES[dk][0]
                data[name] = (np.array([v], np_dt) if np_dt != "U"
                              else np.array([v], object))
                vals[(name, inc)] = v
            tdb.from_pandas(uri, pd.DataFrame(data), index_dims=["k"],
                            mode="append")
            rows.append((next_k, vals))
            next_k += 1
        elif o[0] == "add":
            _, name, dk = o
            if name in schema:
                continue
            incarnation += 1
            e = tdb.ArraySchemaEvolution()
            e.add_attribute(tdb.Attr(name, dtype=DTYPES[dk][0],
                                     fill=DTYPES[dk][1]))
            e.array_evolve(uri)
            schema[name] = (dk, incarnation)
        else:  # drop
            _, name = o
            if name not in schema or len(schema) == 1:
                continue  # keep >= 1 attr (matches many engines' rule)
            e = tdb.ArraySchemaEvolution()
            e.drop_attribute(name)
            e.array_evolve(uri)
            del schema[name]

    # ---- expected table under the FINAL schema -----------------------
    expect = {}
    for k, vals in rows:
        out = {}
        for name, (dk, inc) in schema.items():
            out[name] = vals.get((name, inc), DTYPES[dk][1])
        expect[k] = out

    # ---- native scan -------------------------------------------------
    with tdb.open(uri, spark=spark) as A:
        r = A[:]
        ks = r["k"].tolist()
        for name, (dk, inc) in schema.items():
            got = dict(zip(ks, r[name].tolist()))
            want = {k: v[name] for k, v in expect.items()}
            assert got == pytest.approx(want) if dk == "f" else got == want, \
                f"native scan mismatch on {name!r}: {got} != {want}\nops={ops}"

    # ---- datasource scan ---------------------------------------------
    ds_rows = spark.read.format("tiledb").load(uri).collect()
    assert len(ds_rows) == len(expect)
    for row in ds_rows:
        for name, (dk, inc) in schema.items():
            got, want = getattr(row, name), expect[row.k][name]
            ok = (got == pytest.approx(want)) if dk == "f" else got == want
            assert ok, (f"datasource mismatch k={row.k} {name!r}: "
                        f"{got} != {want}\nops={ops}")
