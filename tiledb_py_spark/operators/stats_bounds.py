"""Range-bucket bounds from parquet footer statistics — no Spark job.

The keyless as-of join (``operators/asof.py``) and the distributed
prefix sum (``operators/pipeline.py::global_running_sum``) decompose a
global window into ``num_buckets`` time-range buckets.  The bounds only
need to BALANCE tasks, not be precise — duplicate or skewed bounds
merely collapse buckets, never change the answer (the carry logic is
bounds-agnostic).  By default both operators derive bounds from a
sampled ``approxQuantile``, which costs one extra (small) Spark job
before the main one.  When the input is parquet the engine already has
better information for free: every row-group footer records (min, max,
num_rows) per column.  ``parquet_range_bounds`` turns those statistics
into quantile bounds entirely driver-side — footers are a few KB each,
read in parallel — so the separate sampling job disappears.

Model: each row group's rows are spread uniformly over its [min, max];
quantiles of the mixture CDF are found by bisection.  For data written
in time order (the overwhelmingly common case for event tables) row
groups are narrow and the mixture is near-exact; for shuffled data the
uniform assumption still lands within a row group's width — fine for
balance.
"""

from __future__ import annotations

import datetime as _dt
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

_EPOCH = _dt.datetime(1970, 1, 1)
_EPOCH_DATE = _dt.date(1970, 1, 1)


def _to_num(v) -> Optional[float]:
    """Footer stat -> the numeric space the bucketing expressions use:
    timestamps as epoch MICROSECONDS (matching ``F.unix_micros``; any
    constant tz offset shifts all bounds uniformly — irrelevant for
    balance), dates as epoch DAYS (matching ``F.unix_date``), numerics
    as-is."""
    if isinstance(v, bool):
        return None
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return (v - _EPOCH).total_seconds() * 1e6
    if isinstance(v, _dt.date):
        return float((v - _EPOCH_DATE).days)
    if isinstance(v, (int, float)):
        return float(v)
    return None


def _collect_paths(path_or_paths) -> list:
    paths = ([path_or_paths] if isinstance(path_or_paths, (str, os.PathLike))
             else list(path_or_paths))
    out = []
    for p in paths:
        p = os.fspath(p)
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                out.extend(os.path.join(root, f) for f in sorted(files)
                           if f.endswith(".parquet"))
        else:
            out.append(p)
    return out


def column_chunk_minmax(rg, column: str):
    """Raw ``(min, max)`` statistics for ``column`` in one row-group
    footer (pyarrow ``RowGroupMetaData``), or ``None`` when the column
    is absent or carries no min/max.  Shared by the driver-side bounds
    derivation here and the LWW component slicer
    (``sources/spark_datasource.py``) so the footer walk cannot drift."""
    for j in range(rg.num_columns):
        cc = rg.column(j)
        if cc.path_in_schema == column:
            st = cc.statistics
            if st is not None and st.has_min_max:
                return (st.min, st.max)
            return None
    return None


def row_group_stats(path_or_paths, column: str,
                    max_workers: int = 16) -> Optional[list]:
    """Per-row-group ``(min, max, num_rows)`` for ``column`` across the
    given parquet file(s)/director(ies), footers read concurrently.
    Returns ``None`` if any row group lacks min/max statistics for the
    column (caller should fall back to sampling)."""
    import pyarrow.parquet as pq

    paths = _collect_paths(path_or_paths)
    if not paths:
        return None

    def one(p):
        # an unreadable footer (zero-byte / truncated crashed-write
        # leftover) means "no statistics", per the documented contract
        # — propagating the ArrowInvalid would fail the caller's whole
        # planning step instead of falling back to sampling
        try:
            pf = pq.ParquetFile(p)
        except Exception:
            return None
        try:
            md = pf.metadata
            rgs = []
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                mm = column_chunk_minmax(rg, column)
                if mm is None:
                    return None
                lo, hi = _to_num(mm[0]), _to_num(mm[1])
                if lo is None or hi is None:
                    return None
                rgs.append((lo, hi, rg.num_rows))
            return rgs
        finally:
            pf.close()

    with ThreadPoolExecutor(max_workers=min(max_workers, len(paths))) as ex:
        per_file = list(ex.map(one, paths))
    if any(r is None for r in per_file):
        return None
    return [rg for rgs in per_file for rg in rgs]


def mixture_quantile_bounds(rgs: Sequence, num_buckets: int) -> list:
    """Quantile bounds of the uniform-mixture CDF over per-row-group
    ``(min, max, rows)`` triples: ``num_buckets - 1`` cut values giving
    ~equal row counts per bucket (duplicates collapse downstream)."""
    rgs = [(mn, mx, n) for mn, mx, n in rgs if n > 0]
    if not rgs or num_buckets <= 1:
        return []
    import numpy as np

    # vectorized: the scalar bisection was O(48 x buckets x row_groups)
    # pure-Python on the driver — a multi-second planning stall at 10k
    # row groups x 256 buckets.  One (buckets, row_groups) broadcast
    # per bisection step instead; bucket cuts only need to BALANCE, so
    # sub-ulp float-order differences vs the scalar fold are harmless.
    mn = np.array([r[0] for r in rgs], dtype="float64")
    mx = np.array([r[1] for r in rgs], dtype="float64")
    n = np.array([r[2] for r in rgs], dtype="float64")
    lo, hi = float(mn.min()), float(mx.max())
    if lo >= hi:
        return []
    total = float(n.sum())
    width = np.where(mx > mn, mx - mn, 1.0)
    point = mx <= mn   # degenerate single-value groups

    def cdf(x: np.ndarray) -> np.ndarray:
        X = x[:, None]
        frac = np.clip((X - mn[None, :]) / width[None, :], 0.0, 1.0)
        frac = np.where(point[None, :],
                        (X >= mx[None, :]).astype("float64"), frac)
        return frac @ n

    targets = total * np.arange(1, num_buckets) / num_buckets
    a = np.full(num_buckets - 1, lo)
    b = np.full(num_buckets - 1, hi)
    for _ in range(48):
        m = (a + b) / 2
        below = cdf(m) < targets
        a = np.where(below, m, a)
        b = np.where(below, b, m)
    return sorted(set(b.tolist()))


def parquet_range_bounds(path_or_paths, column: str, num_buckets: int,
                         max_workers: int = 16) -> Optional[list]:
    """Bucket bounds for a range decomposition of ``column``, derived
    purely from parquet footer statistics (no Spark job).  Returns a
    sorted list of floats in the operator's numeric space (epoch micros
    for timestamps, epoch days for dates, value otherwise), or ``None``
    when statistics are unavailable — callers fall back to the sampled
    ``approxQuantile`` path."""
    rgs = row_group_stats(path_or_paths, column, max_workers=max_workers)
    if rgs is None:
        return None
    bounds = mixture_quantile_bounds(rgs, num_buckets)
    return bounds or None


# ---------------------------------------------------------------------------
# shared range-bucket machinery (keyless as-of + distributed prefix sum)
# ---------------------------------------------------------------------------

def monotonic_view(col: str, dtype: str):
    """DOUBLE-valued monotonic view of a column, used only for range-
    bucket ASSIGNMENT (never returned): timestamps -> epoch micros,
    dates -> epoch days (DATE cannot cast straight to DOUBLE), anything
    else -> a plain double cast.  Shared by ``operators/asof.py`` and
    ``operators/pipeline.py`` so the numeric space always matches what
    ``parquet_range_bounds`` produces."""
    from pyspark.sql import functions as F

    if dtype.startswith("timestamp"):
        return F.unix_micros(F.col(col).cast("timestamp")).cast("double")
    if dtype == "date":
        return F.unix_date(F.col(col)).cast("double")
    return F.col(col).cast("double")


def resolve_bounds(df, d, num_buckets: int, bounds=None,
                   fraction: float = 0.1, seed: int = 42,
                   rel_err: float = 0.01) -> list:
    """Sorted distinct bucket cut values: caller-supplied ``bounds``
    verbatim (no job), else coarse approxQuantile over a Bernoulli
    sample of the monotonic view ``d`` (one small job).  Bounds only
    need to BALANCE tasks — duplicates collapse, a bad set merely
    shrinks parallelism, never the answer."""
    if bounds is not None:
        qs = [float(b) for b in bounds]
    elif num_buckets > 1:
        probs = [i / num_buckets for i in range(1, num_buckets)]
        qs = (df.select(d.alias("__rb_d"))
                .sample(fraction=fraction, seed=seed)
                .approxQuantile("__rb_d", probs, rel_err))
    else:
        qs = []
    return sorted(set(qs))


def string_range_bounds(df, col: str, num_buckets: int,
                        sample_rows: Optional[int] = None, seed: int = 42,
                        max_len: int = 64) -> list:
    """Sorted distinct STRING cut values for range-bucketing a string
    order column: bounded uniform sample (top-S by ``rand`` — one
    single-column scan, driver receives at most S rows), then driver-
    side rank quantiles.  Safe because UTF-8 byte order equals code-
    point order, so Python's sort and Spark's default UTF8_BINARY
    ``orderBy``/``>`` agree; cuts are truncated to ``max_len`` chars — a
    cut need not be a data value, truncation only merges adjacent
    buckets (balance, never the answer)."""
    from pyspark.sql import functions as F

    if num_buckets <= 1:
        return []
    s = sample_rows or max(1024, 32 * num_buckets)
    vals = sorted(r[0] for r in df.select(F.col(col).alias("__rb_s"))
                  .filter(F.col("__rb_s").isNotNull())
                  .orderBy(F.rand(seed)).limit(s).collect())
    if not vals:
        return []
    return sorted({vals[(i * len(vals)) // num_buckets][:max_len]
                   for i in range(1, num_buckets)})


def _quote_ident(col: str) -> str:
    """Backtick-quote a column name for embedding in parsed SQL."""
    return "`" + col.replace("`", "``") + "`"


def monotonic_view_sql(col: str, dtype: str) -> str:
    """SQL-text twin of ``monotonic_view`` — same expression, rendered
    as a parseable snippet so ``bucket_index`` can build its whole
    per-row bucket expression in ONE parse (see there)."""
    q = _quote_ident(col)
    if dtype.startswith("timestamp"):
        return f"CAST(unix_micros(CAST({q} AS TIMESTAMP)) AS DOUBLE)"
    if dtype == "date":
        return f"CAST(unix_date({q}) AS DOUBLE)"
    return f"CAST({q} AS DOUBLE)"


def _sql_str_lit(s: str) -> str:
    """Single-quoted Spark SQL string literal (C-style escaping — the
    parser default ``escapedStringLiterals=false``)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def bucket_index(d, bounds) -> "object":
    """Bucket id = number of bounds strictly below ``d``.  Null ``d``
    yields 0; callers wanting null-bucket semantics wrap it.  Bounds may
    be floats (numeric/timestamp monotonic view) or strings
    (``string_range_bounds`` cuts; UTF8_BINARY ``>`` matches orderBy).

    Pass ``d`` as a SQL snippet (``monotonic_view_sql`` or a quoted
    column name) to get the CODEGEN form: a binary-search ``IF`` tree
    built with ONE parsed expression — log2(n) comparisons per row
    inside whole-stage codegen, vs the array-filter fold which is
    evaluated interpreted (higher-order functions sit outside codegen)
    and touches every cut.  Measured over the sf10 events scan,
    31 cuts: 0.21 s (tree) vs 0.27 s (flat int(d>b) sum) vs 1.43 s
    (fold) — ~6.7x per row — at sub-ms build cost.  Passing a Column
    keeps the array-filter form (same values) for callers whose ``d``
    has no SQL rendering — an equivalent tree built through the Column
    API would cost ~134 ms of driver build per 31-cut site, which is
    why the fold form existed at all."""
    import math

    from pyspark.sql import functions as F

    if isinstance(d, str):
        # the tree is a binary SEARCH, so it needs sorted cuts; the
        # fold form counts order-independently.  "count of cuts
        # strictly below d" is itself order-independent, so sorting
        # here preserves the documented contract for unsorted input
        # (every internal caller already passes sorted cuts — this is
        # a guard for external callers).  Strings sort by UTF-8 bytes
        # to match Spark's UTF8_BINARY `>`.
        if bounds and isinstance(bounds[0], str):
            lits = [_sql_str_lit(str(b))
                    for b in sorted(bounds, key=lambda s: str(s).encode())]
        elif all(math.isfinite(float(b)) for b in bounds):
            lits = [f"{float(b)!r}D" for b in sorted(float(b) for b in bounds)]
        else:
            # non-finite cuts have no SQL literal rendering — fall back
            # to the array-filter form over the parsed column
            return bucket_index(F.expr(d), bounds)
        if not lits:
            return F.expr("0")

        def tree(lo: int, hi: int) -> str:
            # bucket id for d within cuts[lo:hi] (= count of cuts < d)
            if lo == hi:
                return str(lo)
            mid = (lo + hi) // 2
            return (f"IF(({d}) > {lits[mid]}, "
                    f"{tree(mid + 1, hi)}, {tree(lo, mid)})")

        # null d: IF's null predicate takes the FALSE branch (it never
        # propagates null), so the tree descends low at every level and
        # lands on leaf 0 — the fold form's null-yields-0 contract
        # holds structurally.  The coalesce is a defensive no-op kept
        # so a future edit to the leaves cannot silently break that
        # contract.
        return F.expr(f"coalesce({tree(0, len(lits))}, 0)")

    # the literal array is built with ONE parsed SQL expression, not
    # num_buckets F.lit() py4j round trips (~0.1 s of driver build time
    # per 64-cut call site; repr() round-trips doubles exactly and the
    # parsed tree is the same array-of-Literal node set)
    if bounds and isinstance(bounds[0], str):
        barr = F.array(*[F.lit(bd) for bd in bounds])
    else:
        fb = [float(bd) for bd in bounds]
        if all(math.isfinite(b) for b in fb):
            barr = F.expr(
                "array(" + ",".join(f"{b!r}D" for b in fb) + ")")
        else:
            barr = F.array(*[F.lit(b) for b in fb])
    return F.size(F.filter(barr, lambda bd: d > bd))
