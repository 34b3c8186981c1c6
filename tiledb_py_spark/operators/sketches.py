"""Mergeable frequency sketches — heavy hitters without a vocabulary
shuffle.

``word_frequencies``-style exact counting shuffles one row per distinct
item; fine for word vocabularies (~1M rows), but for n-gram / URL /
fingerprint streams the distinct count approaches the corpus size and
the "vocabulary-sized" assumption collapses.  The classic answer is the
Misra–Gries summary (Misra & Gries 1982; the "space-saving" family):
a k-counter digest per partition, mergeable by counter addition + joint
decrement, with the guarantee that every item of true frequency
> n/(k+1) survives.

Scale split:

- ONE ``mapInPandas`` pass builds a k-counter summary per partition
  (numpy bincount per Arrow batch folded into a dict digest) — nothing
  shuffles, the corpus is read once.
- The driver merges the bounded n_partitions x k digests (the standard
  mergeable-MG combine: sum counters, subtract the (k+1)-th largest,
  truncate) — same bounded-collect contract as the PCA moments.
- ``heavy_hitters`` then recounts the <= k surviving candidates EXACTLY
  in one aggregation whose shuffle is map-side-combined to
  <= k rows/partition, and filters by the true threshold — so the
  OUTPUT is exactly "items with count > n/threshold_frac", independent
  of sketch noise (the MG superset guarantee makes the recount
  complete).  Approximate machinery, exact answer — the same pattern as
  the Bloom-prefiltered decontamination.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_fold(counts: dict, item, c: int, k: int) -> None:
    """Fold `c` occurrences of `item` into a k-counter MG digest."""
    if item in counts:
        counts[item] += c
    elif len(counts) < k:
        counts[item] = c
    else:
        # joint decrement by the smallest of (c, min counter): decrement
        # all counters and the incoming weight together
        m = min(min(counts.values()), c)
        dead = []
        for key in counts:
            counts[key] -= m
            if counts[key] == 0:
                dead.append(key)
        for key in dead:
            del counts[key]
        c -= m
        if c > 0:
            _mg_fold(counts, item, c, k)


def _merge_digests(digests, k: int) -> dict:
    """Mergeable-MG combine (Agarwal et al. 2013): sum counters, then
    subtract the (k+1)-th largest value and drop non-positives."""
    total: dict = {}
    for d in digests:
        for item, c in d.items():
            total[item] = total.get(item, 0) + c
    if len(total) > k:
        cut = sorted(total.values(), reverse=True)[k]
        total = {i: c - cut for i, c in total.items() if c > cut}
    return total


def mg_digest(df: DataFrame, items_col, k: int = 256) -> dict:
    """Driver-side Misra–Gries digest of ``items_col`` (a column name or
    Column; arrays are exploded, scalars counted directly; items are
    compared as strings): {item: lower-bound count}, at most ``k``
    entries.  Guarantee (merged digest): every item with true count
    > 2n/(k+1) is present — each partition digest undercounts by at
    most n_p/(k+1) (summing to n/(k+1)) and the one-shot merge
    truncation subtracts the (k+1)-th largest summed counter, itself
    <= n/(k+1).  Counters never overcount.  One corpus pass, zero
    shuffles, bounded collect (n_partitions x k rows)."""
    merged, _ = _digest_and_total(_items_base(df, items_col), k)
    return merged


def _items_base(df: DataFrame, items_col) -> DataFrame:
    items = F.col(items_col) if isinstance(items_col, str) else items_col
    base = df.select(items.alias("__it"))
    if dict(base.dtypes)["__it"].startswith("array"):
        base = base.select(F.explode_outer("__it").alias("__it"))
    return base.select(F.col("__it").cast("string").alias("__it")) \
               .filter(F.col("__it").isNotNull())


def _digest_and_total(base: DataFrame, k: int) -> tuple:
    """(merged digest, total item count) from ONE corpus pass: each
    partition also reports its row count, so the total is free."""
    def part(it):
        counts: dict = {}
        n = 0
        for pdf in it:
            n += len(pdf)
            vc = pdf["__it"].value_counts()
            for item, c in vc.items():
                _mg_fold(counts, item, int(c), k)
        if n:
            items = list(counts) or [None]
            cs = list(counts.values()) or [0]
            yield pd.DataFrame({"item": items, "c": cs,
                                "n": [n] + [0] * (len(items) - 1)})

    rows = base.mapInPandas(part, "item string, c long, n long").collect()
    total = sum(r.n for r in rows)
    # one-shot mergeable-MG combine: summing all partition digests then
    # truncating once is associative-combine order applied in one step
    # (and subtracts no more than any pairwise-merge schedule would)
    merged = _merge_digests(
        ({r.item: r.c} for r in rows if r.item is not None), k)
    return merged, total


def heavy_hitters(df: DataFrame, items_col, threshold_frac: float = 0.001,
                  k: Optional[int] = None) -> DataFrame:
    """EXACT heavy hitters — all items whose occurrence count exceeds
    ``threshold_frac`` of the total — without ever shuffling the item
    multiset: an MG digest (k = ceil(2/threshold_frac) counters)
    nominates <= k candidates, which are recounted exactly (map-side
    combine caps the shuffle at k rows/partition) and filtered by the
    true threshold.  The merged-MG guarantee (every item above
    2n/(k+1) survives; 2n/(k+1) <= n*threshold_frac by the choice of
    k) makes the candidate set complete, so the output equals the
    exact GROUP BY/HAVING answer.

    Returns ``(item, n)`` sorted by count descending, item ascending.
    Two corpus passes total: the digest pass (which also yields the
    total count) and the candidate recount.  A caller-supplied ``k``
    below ``2/threshold_frac - 1`` would silently void the superset
    guarantee, so it refuses loudly instead (the ``bpe_train`` guard
    pattern)."""
    if not 0 < threshold_frac < 1:
        raise ValueError("threshold_frac must be in (0, 1)")
    k_min = int(2.0 / threshold_frac - 1) + 1
    if k is None:
        k = k_min
    elif k < k_min:
        raise ValueError(
            f"heavy_hitters: k={k} is below the completeness minimum "
            f"{k_min} for threshold_frac={threshold_frac} (the merged "
            "digest only guarantees survival above 2n/(k+1)); raise k "
            "or the threshold")

    base = _items_base(df, items_col)
    digest, total = _digest_and_total(base, k)
    if not digest or total == 0:
        return base.sparkSession.createDataFrame([], "item string, n long")
    cand = list(digest)

    if len(cand) <= 1024:
        survivors = base.filter(F.col("__it").isin(cand))
    else:
        # small thresholds mean k ~ 2/threshold candidates; embedding
        # 200k string literals into the plan stalls analysis and bloats
        # the driver — a broadcast semi-join is the scalable equivalent
        cand_df = base.sparkSession.createDataFrame(
            [(c,) for c in cand], "__it string")
        survivors = base.join(F.broadcast(cand_df), "__it", "left_semi")
    counted = (survivors
               .groupBy(F.col("__it").alias("item"))
               .agg(F.count(F.lit(1)).cast("long").alias("n")))
    return (counted
            .filter(F.col("n") > F.lit(float(total) * threshold_frac))
            .select("item", "n")
            .orderBy(F.desc("n"), "item"))


def _cms_bucket(seed: str, item: str, width: int) -> int:
    """The ONE count-min hash: md5(seed NUL item) low 8 bytes mod width.
    Shared by digest build and point query — a drift between the two
    would silently break the one-sided guarantee."""
    import hashlib

    h = hashlib.md5((seed + "\x00" + item).encode()).digest()
    return int.from_bytes(h[:8], "little") % width


def approx_quantiles(df: DataFrame, col, probs, rel_err: float = 0.01,
                     by=None, verify: bool = False) -> DataFrame:
    """Mergeable approximate quantiles via SQL ``percentile_approx``
    (the Greenwald–Khanna-style sketch Spark aggregates JVM-side with
    map-side partial merge — ONE shuffle of bounded sketch state, never
    the value multiset).  ``accuracy = ceil(1/rel_err)`` gives the
    documented rank-error guarantee |rank(est)/n - p| <= rel_err.

    Returns ``(by..., prob, value)`` one row per requested probability.
    ``verify=True`` adds the EXACT achieved rank fraction and a
    ``within_bound`` flag by recounting ``x <= value`` in one extra
    aggregation — the gate pattern: approximate machinery, exactly
    verified answer."""
    probs = [float(p) for p in probs]
    if not probs or not all(0 <= p <= 1 for p in probs):
        raise ValueError("probs must be a non-empty list in [0, 1]")
    if not 0 < rel_err < 1:
        raise ValueError("rel_err must be in (0, 1)")
    c = F.col(col) if isinstance(col, str) else col
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    acc = int(1.0 / rel_err) + 1
    agg = (df.groupBy(*by)
             .agg(F.percentile_approx(c, probs, acc).alias("__qs")))
    out = (agg.select(*by,
                      F.posexplode("__qs").alias("__i", "value"))
              .select(*by,
                      F.element_at(F.array(*[F.lit(p) for p in probs]),
                                   F.col("__i") + 1).alias("prob"),
                      "value"))
    if not verify:
        return out
    # exact rank recount: one aggregation over (group, prob) — the
    # crossJoin side is |probs| x |groups| rows, broadcast by size
    vals = df.select(*by, c.alias("__x")).filter(F.col("__x").isNotNull())
    if by:
        # eqNullSafe: NULL group keys are real groups (the non-verify
        # path returns them via groupBy); a plain equality join would
        # silently drop them from the verify output
        outj = F.broadcast(out.select(
            *[F.col(b).alias(f"__o_{b}") for b in by], "prob", "value"))
        cond = None
        for b in by:
            t = F.col(b).eqNullSafe(F.col(f"__o_{b}"))
            cond = t if cond is None else cond & t
        j = vals.join(outj, cond).drop(*[f"__o_{b}" for b in by])
    else:
        j = vals.crossJoin(F.broadcast(out))
    # two-sided rank check: a duplicate-heavy value occupies a rank
    # RANGE [count(x < v)/n, count(x <= v)/n]; the GK guarantee holds
    # iff that range intersects [p - eps, p + eps], so testing only the
    # upper rank would flag correct answers on discrete data (90%
    # zeros: p=0.1 -> v=0 with rank range [0, 0.9])
    ranks = (j.groupBy(*by, "prob", "value")
              .agg((F.sum((F.col("__x") < F.col("value")).cast("long"))
                    / F.count(F.lit(1))).alias("rank_lo"),
                   (F.sum((F.col("__x") <= F.col("value")).cast("long"))
                    / F.count(F.lit(1))).alias("exact_rank_frac")))
    return ranks.withColumn(
        "within_bound",
        (F.col("rank_lo") <= F.col("prob") + F.lit(rel_err))
        & (F.col("exact_rank_frac") >= F.col("prob") - F.lit(rel_err)))


def approx_distinct(df: DataFrame, col, by=None, rsd: float = 0.02,
                    verify: bool = False) -> DataFrame:
    """Per-group distinct cardinality via HyperLogLog++
    (``approx_count_distinct`` — constant-size mergeable registers, ONE
    map-side-combined shuffle; the exact ``COUNT(DISTINCT)`` shuffles
    every distinct value, which at n-gram/URL cardinality IS the
    corpus).  ``rsd`` is the target relative standard deviation.
    ``verify=True`` adds the exact count and realized relative error —
    the gate runs it at driver scale; production runs never pay the
    exact pass."""
    if not 0 < rsd < 1:
        raise ValueError("rsd must be in (0, 1)")
    c = F.col(col) if isinstance(col, str) else col
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    aggs = [F.approx_count_distinct(c, rsd).cast("long").alias("approx_nd")]
    if verify:
        aggs.append(F.count_distinct(c).cast("long").alias("exact_nd"))
    out = df.groupBy(*by).agg(*aggs)
    if verify:
        out = out.withColumn(
            "rel_err", F.abs(F.col("approx_nd") - F.col("exact_nd"))
            / F.greatest(F.col("exact_nd"), F.lit(1)))
    return out


def cms_digest(df: DataFrame, items_col, eps: float = 1e-4,
               delta: float = 0.01, seed: int = 42):
    """Driver-side Count-Min sketch of ``items_col`` (same input
    contract as ``mg_digest``): a ``d x w`` counter table with
    ``w = ceil(e/eps)``, ``d = ceil(ln(1/delta))``, built as one
    per-partition ``mapInPandas`` pass (zero shuffles) and merged by
    elementwise ADDITION on the driver — CMS is linear, so the merge is
    exact.  Returns ``(table, depth_seeds, total_n)``.

    Unlike Misra–Gries (which keeps k candidate IDENTITIES), CMS
    answers point queries for ANY item with the one-sided guarantee
    ``true <= est <= true + eps*n`` w.p. ``1 - delta`` — the shape for
    "how frequent is THIS n-gram/URL" probes against a corpus too big
    to count exactly.  Bounded collect: n_partitions x (d*w) int64."""
    import numpy as np

    if not 0 < eps < 1 or not 0 < delta < 1:
        raise ValueError("eps and delta must be in (0, 1)")
    w = int(np.ceil(np.e / eps))
    d = int(np.ceil(np.log(1.0 / delta)))
    seeds = [f"{seed}:{i}" for i in range(d)]
    base = _items_base(df, items_col)

    def part(it):
        tab = np.zeros((d, w), dtype=np.int64)
        n = 0
        for pdf in it:
            n += len(pdf)
            vc = pdf["__it"].value_counts()
            for item, cnt in vc.items():
                for i, s in enumerate(seeds):
                    tab[i, _cms_bucket(s, item, w)] += int(cnt)
        if n:
            yield pd.DataFrame({"row": list(range(d)),
                                "counts": [r.tolist() for r in tab],
                                "n": [n] + [0] * (d - 1)})

    rows = base.mapInPandas(
        part, "row int, counts array<long>, n long").collect()
    table = np.zeros((d, w), dtype=np.int64)
    total = 0
    for r in rows:
        table[r.row] += np.asarray(r.counts, dtype=np.int64)
        total += r.n
    return table, seeds, total


def cms_query(sketch, items) -> dict:
    """Point-frequency estimates from a ``cms_digest`` result:
    ``min_i table[i, h_i(item)]`` — each >= the true count, and
    <= true + eps*n w.p. 1-delta."""
    table, seeds, _ = sketch
    w = table.shape[1]

    return {it: int(min(table[i, _cms_bucket(s, str(it), w)]
                        for i, s in enumerate(seeds)))
            for it in items}
