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

    counted = (base.filter(F.col("__it").isin(cand))
               .groupBy(F.col("__it").alias("item"))
               .agg(F.count(F.lit(1)).cast("long").alias("n")))
    return (counted
            .filter(F.col("n") > F.lit(float(total) * threshold_frac))
            .select("item", "n")
            .orderBy(F.desc("n"), "item"))
