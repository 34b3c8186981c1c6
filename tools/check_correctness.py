"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [--exact] [query ...]

``--exact`` compares float columns by BIT equality (NaN==NaN), matching
the driver's value hash.  The default tolerant mode (rtol=1e-6,
atol=1e-4) is for triage only — it cannot see the 1-ulp divergences the
driver's hash fails on (how the r8 ``rolling_anomaly`` red shipped
while the local sweep said green).  Committed full sweeps must be
exact-mode runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from tiledb_py_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame, exact: bool = False) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64") if exact \
                else s.astype("float64").round(4)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        else:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _bits_equal(ca: pd.Series, cb: pd.Series) -> np.ndarray:
    """Per-row float64 bit equality, with any-NaN == any-NaN (the driver
    hashes a canonical NaN) — catches 1-ulp and ±0.0 divergences."""
    xa = ca.to_numpy(dtype="float64", copy=True)
    xb = cb.to_numpy(dtype="float64", copy=True)
    nan = np.isnan(xa) & np.isnan(xb)
    xa[nan] = 0.0
    xb[nan] = 0.0
    return xa.view("int64") == xb.view("int64")


def compare(a: pd.DataFrame, b: pd.DataFrame,
            exact: bool = False) -> tuple[bool, str]:
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns {sorted(a.columns)} != {sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"rowcount {len(a)} != {len(b)}"
    # The driver's value hash is dtype-sensitive: an int64 Spark column vs a
    # float64 oracle column (e.g. DuckDB HUGEINT sums) hash-mismatches even
    # when values are equal.  Flag dtype-class drift before coercing.
    for c in a.columns:
        ka = "f" if pd.api.types.is_float_dtype(a[c]) else \
             "i" if pd.api.types.is_integer_dtype(a[c]) else "o"
        kb = "f" if pd.api.types.is_float_dtype(b[c]) else \
             "i" if pd.api.types.is_integer_dtype(b[c]) else "o"
        if ka != kb:
            return False, (f"dtype-class mismatch col {c}: spark {a[c].dtype} "
                           f"vs oracle {b[c].dtype} (driver hash would differ)")
    na, nb = normalize(a, exact), normalize(b, exact)
    for c in na.columns:
        ca, cb = na[c], nb[c]
        if pd.api.types.is_float_dtype(ca):
            eq = _bits_equal(ca, cb) if exact else np.isclose(
                ca.fillna(1e300), cb.fillna(1e300), rtol=1e-6, atol=1e-4)
        else:
            eq = np.asarray(ca == cb)
        if not eq.all():
            i = int(np.argmax(~eq))
            return False, f"col {c} differs at sorted row {i}: {ca.iloc[i]!r} vs {cb.iloc[i]!r}"
    return True, "ok"


def main():
    argv = list(sys.argv[1:])
    json_out = None
    exact = "--exact" in argv
    if exact:
        argv.remove("--exact")
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            print("usage: check_correctness.py [sf_dir] [--json OUT] "
                  "[query ...]", file=sys.stderr)
            return 2
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) \
        else "/root/testdata/sf0.01"
    dirs = [a for a in argv if os.path.isdir(a)]
    if len(dirs) > 1 or (dirs and dirs[0] != (argv[0] if argv else None)):
        # a directory in any position other than first would be
        # SILENTLY dropped from `only` — the caller meant it as sf_dir
        print(f"error: sf_dir must be the FIRST argument (got dirs "
              f"{dirs}, first arg {argv[0]!r})", file=sys.stderr)
        return 2
    only = set(a for a in argv if not os.path.isdir(a))
    unknown = only - set(entrymod.queries())
    if unknown:
        # a typo'd query name used to make the gate exit 0 having run
        # NOTHING — a committed "green" sweep that verified nothing
        print(f"error: unknown query name(s): {sorted(unknown)}",
              file=sys.stderr)
        return 2
    results = {}

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            results[name] = {"status": "FAIL",
                             "err": f"spark: {type(e).__name__}: {e}"}
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"weak  {name}: rows={len(sdf)} ({dt:.1f}s, no oracle)")
            results[name] = {"status": "weak", "rows": len(sdf),
                             "sec": round(dt, 1)}
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            results[name] = {"status": "FAIL", "err": f"duckdb: {e}"}
            n_fail += 1
            continue
        ok, msg = compare(sdf, odf, exact)
        status = "pass" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status}  {name}: rows={len(sdf)} ({dt:.1f}s) {'' if ok else msg}")
        results[name] = {"status": status, "rows": len(sdf),
                         "sec": round(dt, 1)}
        if not ok:
            results[name]["err"] = msg
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} FAIL")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "mode": "exact" if exact
                       else "tolerant", "n_pass": n_pass,
                       "n_weak": n_weak, "n_fail": n_fail,
                       "results": results}, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
