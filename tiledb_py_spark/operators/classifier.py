"""Trainable corpus classifiers: the GPT-3 / LLaMA-style binary
quality filter ("looks like the reference corpus") and its one-vs-rest
multiclass extension (language / domain routing) — logistic regression
over hashed-unigram features, fit DISTRIBUTED, scored row-local.

The reference engine has no learning operators; this extends the
LLM-pipeline surface alongside DSIR (`pipeline.importance_weights`,
which covers closed-form importance weighting but not a learned
decision boundary).  Public-knowledge basis: Brown et al. 2020 (GPT-3
appendix A, LR quality filter over hashed features), Touvron et al.
2023 (LLaMA Wikipedia-reference classifier), hashing trick per
Weinberger et al. 2009.

Scale shape (the part that matters at 100 TB):

- **Featurization is shuffle-free.**  A document's feature vector is
  its raw hashed-token bucket array (``pmod(hash(tok), n_buckets)``),
  computed row-local in one projection — duplicate buckets ARE the
  term counts (``w . x == sum over occurrences of w[bucket]``), so no
  (id, bucket)->count aggregation and no corpus shuffle, ever.
- **Each optimizer step is ONE job, zero Exchanges.**  The loss and
  the full n_buckets-sized gradient are accumulated per partition in
  a vectorized Arrow pass (``mapInPandas``: flatten the batch's bucket
  arrays, ``np.add.reduceat`` for margins, ``np.bincount`` for the
  gradient) and only the per-partition (loss, count, gradient[])
  rows — bounded by partitions x n_buckets — reach the driver, the
  same bounded-summary contract as ``bpe_train``.  L-BFGS direction +
  Armijo line search run driver-side on those aggregates.
- **Scoring is row-local**: broadcast the learned weight vector in an
  Arrow UDF closure over the same staged bucket arrays — no shuffle,
  no join, applies at full corpus scale.

Determinism: per-partition sums are combined on the driver in
partition-id order, so a fit is bit-reproducible for a fixed input
partitioning (restated from the BPE/unigram-LM induction contract).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_buckets(text_col, n_buckets: int, token_hash=None,
                  tokens_col: Optional[Column] = None) -> Column:
    """Row-local hashed-unigram bucket array: whitespace tokens ->
    ``pmod(hash(tok), n_buckets)``.  Same bucketing family as DSIR
    (`pipeline.importance_weights`); pass ``dedup.md5_hash60`` as
    ``token_hash`` for a cross-engine-replayable bucketing."""
    from .text import whitespace_tokens

    th = token_hash or F.xxhash64
    toks = tokens_col if tokens_col is not None else whitespace_tokens(text_col)
    return F.transform(toks, lambda t: F.pmod(th(t), F.lit(n_buckets))
                       .cast("int"))


@dataclass
class QualityClassifier:
    """Learned LR model: ``weights`` (n_buckets), ``bias``, and the
    featurization parameters scoring must reuse."""

    weights: np.ndarray
    bias: float
    n_buckets: int
    loss: float = float("nan")
    n_iter: int = 0
    converged: bool = False
    history: list = field(default_factory=list)

    def to_dict(self) -> dict:
        return {"weights": [float(w) for w in self.weights],
                "bias": float(self.bias), "n_buckets": int(self.n_buckets),
                "loss": float(self.loss), "n_iter": int(self.n_iter),
                "converged": bool(self.converged)}

    @classmethod
    def from_dict(cls, d: dict) -> "QualityClassifier":
        return cls(weights=np.asarray(d["weights"], dtype=np.float64),
                   bias=float(d["bias"]), n_buckets=int(d["n_buckets"]),
                   loss=float(d.get("loss", float("nan"))),
                   n_iter=int(d.get("n_iter", 0)),
                   converged=bool(d.get("converged", False)))

    # -- persistence (same contract as the similarity indexes) ------------

    _META_PREFIX = "__quality_classifier:"

    def save(self, uri: str, name: str = "default") -> "QualityClassifier":
        """Persist the model: into an engine array's manifest metadata
        under ``__quality_classifier:<name>`` if ``uri`` is an array,
        else as a JSON file (the IVF/PQ index persistence contract)."""
        import json

        from .. import manifest as mf

        mf.save_payload(uri, self._META_PREFIX + name,
                        json.dumps(self.to_dict()), file_suffix=".qc.tmp")
        return self

    @classmethod
    def load(cls, uri: str, name: str = "default") -> "QualityClassifier":
        import json

        from .. import manifest as mf

        return cls.from_dict(json.loads(mf.load_payload(
            uri, cls._META_PREFIX + name, kind="quality classifier")))


def _segment_sums(vals: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Sum ``vals`` in consecutive segments of the given POSITIVE
    lengths (``sum(seg_lens) == len(vals)``)."""
    offs = np.zeros(len(seg_lens), dtype=np.int64)
    np.cumsum(seg_lens[:-1], out=offs[1:])
    return np.add.reduceat(vals, offs)


def _staged_buckets(text_col, n_buckets: int, token_hash, tokens_col):
    """Null-safe staged bucket-array column — the ONE featurization
    expression shared by both fits and both scorers (deferred-refactor
    #2, closed r13: train and score must bucket identically or the
    model silently mis-scores): NULL/empty documents become an empty
    array so they ride the bias alone."""
    bk = token_buckets(text_col, n_buckets, token_hash=token_hash,
                       tokens_col=tokens_col)
    return F.coalesce(bk, F.array().cast("array<int>"))


def _cap_and_persist(feats: DataFrame) -> DataFrame:
    """Each L-BFGS eval collects one (n_buckets+1)-double gradient row
    PER PARTITION; on a many-thousand-partition corpus that payload
    scales with partitions, not data — cap it (coalesce: no shuffle,
    512 tasks is still full cluster parallelism for a fold this thin),
    persist, and materialize once (every eval rescans the cache)."""
    if feats.rdd.getNumPartitions() > 512:
        feats = feats.coalesce(512)
    feats = feats.persist()
    feats.count()
    return feats


def _batch_margins(bks: pd.Series, W: np.ndarray,
                   B: np.ndarray) -> np.ndarray:
    """(n_rows, n_classes) margin matrix for one Arrow batch: bias plus
    segment-summed weights over each row's bucket array.  Shared by
    ``quality_scores`` (one class, sigmoid outside) and
    ``label_predict`` (argmax outside)."""
    lens = np.fromiter((len(a) for a in bks), dtype=np.int64,
                       count=len(bks))
    margins = np.tile(B, (len(bks), 1))
    if lens.sum():
        flat = np.concatenate([np.asarray(a, dtype=np.int64)
                               for a in bks])
        for c in range(W.shape[0]):
            margins[lens > 0, c] += _segment_sums(W[c][flat],
                                                  lens[lens > 0])
    return margins


# engage the two-level gradient merge once the flat per-eval driver
# payload (partitions x (n_buckets+1) doubles) would exceed ~256 MB —
# below that, the flat collect is cheaper than the extra shuffle stage
_TREE_COMBINE_DOUBLES = 1 << 25


def _eval_factory(feats: DataFrame, n_buckets: int, reg: float):
    """(loss, gradient) oracle over the persisted features: one
    mapInPandas job per call, one (loss, n, grad[n_buckets+1]) row per
    partition, numpy-summed on the driver in partition order.  The
    bias rides as slot ``n_buckets`` (unregularized).

    When ``partitions x (n_buckets+1)`` exceeds ``_TREE_COMBINE_DOUBLES``
    the per-partition digests go through a TREE COMBINE first:
    ``ceil(sqrt(P))`` combiner tasks each sum their pid-group's rows in
    ascending-pid order (one tiny Exchange of digest rows), so driver
    traffic is O(sqrt(P) * n_buckets) — effectively independent of
    partition count (VERDICT r7 item 6: the flat collect is 80 GB at
    10k partitions x 1M buckets).  Both paths reduce in a CANONICAL
    order (rows sorted by pid / gid before summing), so a fit is
    deterministic run-for-run on either path."""
    schema = "pid int, loss double, n long, grad array<double>"
    # invariant for the persisted feats — computed ONCE, not per
    # L-BFGS evaluation (the .rdd conversion is a JVM round-trip)
    n_parts = feats.rdd.getNumPartitions()

    def make_eval(wb: np.ndarray):
        w = wb[:n_buckets].copy()
        b = float(wb[n_buckets])

        def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            G = np.zeros(n_buckets + 1)
            L = 0.0
            N = 0
            for pdf in it:
                y = pdf["y"].to_numpy(dtype=np.float64)
                bks = pdf["bkts"]
                lens = np.fromiter((len(a) for a in bks), dtype=np.int64,
                                   count=len(bks))
                if len(y) == 0:
                    continue
                flat = (np.concatenate([np.asarray(a, dtype=np.int64)
                                        for a in bks])
                        if lens.sum() else np.empty(0, dtype=np.int64))
                # margins: per-doc sum of w[bucket] over occurrences.
                # reduceat runs over the NONZERO-length docs only —
                # zero-length offsets would either alias the next doc's
                # first element or (trailing) fall out of range
                m = np.zeros(len(y))
                if len(flat):
                    m[lens > 0] = _segment_sums(w[flat], lens[lens > 0])
                m = m + b
                # stable logistic loss: log(1+e^m) - y*m
                L += float(np.sum(np.logaddexp(0.0, m) - y * m))
                r = 1.0 / (1.0 + np.exp(-m)) - y   # sigmoid(m) - y
                if len(flat):
                    G[:n_buckets] += np.bincount(
                        flat, weights=np.repeat(r, lens),
                        minlength=n_buckets)
                G[n_buckets] += float(r.sum())
                N += len(y)
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame([{"pid": pid, "loss": L, "n": N,
                                 "grad": G.tolist()}])

        digests = feats.mapInPandas(part, schema)
        if n_parts * (n_buckets + 1) > _TREE_COMBINE_DOUBLES:
            import math

            G = int(math.ceil(math.sqrt(n_parts)))

            def combine(pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values("pid")
                grads = np.vstack([np.asarray(g) for g in pdf["grad"]])
                return pd.DataFrame([{
                    "pid": int(pdf["pid"].iloc[0]) % G,
                    "loss": float(pdf["loss"].sum()),
                    "n": int(pdf["n"].sum()),
                    "grad": grads.sum(axis=0).tolist()}])

            digests = (digests
                       .groupBy(F.pmod(F.col("pid"), F.lit(G)).alias("gid"))
                       .applyInPandas(combine, schema))
        rows = sorted(digests.collect(), key=lambda r: r.pid)
        N = sum(r.n for r in rows)
        if N == 0:
            raise ValueError("fit_quality_classifier: no labeled rows")
        L = sum(r.loss for r in rows) / N
        G = np.sum([np.asarray(r.grad) for r in rows], axis=0) / N
        # L2 on weights only, never the bias
        L += 0.5 * reg * float(wb[:n_buckets] @ wb[:n_buckets])
        G[:n_buckets] += reg * wb[:n_buckets]
        return L, G

    return make_eval


def _lbfgs(eval_fn, x0: np.ndarray, max_iter: int, tol: float,
           history_size: int = 10):
    """Textbook L-BFGS (Nocedal & Wright two-loop recursion) with
    Armijo backtracking.  Every objective evaluation is one Spark job;
    typical fits take 1-2 evaluations per iteration."""
    x = x0.copy()
    f, g = eval_fn(x)
    S: list = []
    Y: list = []
    rho: list = []
    hist = [f]
    it = 0
    converged = False
    for it in range(1, max_iter + 1):
        if float(np.max(np.abs(g))) < tol:
            converged = True
            break
        q = g.copy()
        alpha = []
        for s, y, r in zip(reversed(S), reversed(Y), reversed(rho)):
            a = r * float(s @ q)
            alpha.append(a)
            q -= a * y
        if Y:
            q *= float(S[-1] @ Y[-1]) / float(Y[-1] @ Y[-1])
        for (s, y, r), a in zip(zip(S, Y, rho), reversed(alpha)):
            q += s * (a - r * float(y @ q))
        d = -q
        gd = float(g @ d)
        if gd >= 0:   # safeguard: fall back to steepest descent
            d = -g
            gd = -float(g @ g)
        t = 1.0
        while True:
            fn, gn = eval_fn(x + t * d)
            if fn <= f + 1e-4 * t * gd or t < 1e-12:
                break
            t *= 0.5
        if t < 1e-12 and fn > f:
            # Armijo bottomed out without ANY improving point: keep the
            # current iterate instead of committing a strictly worse
            # step (and its junk (s, y) pair) before the escape below
            break
        s = t * d
        yv = gn - g
        sy = float(s @ yv)
        if sy > 1e-12:
            S.append(s)
            Y.append(yv)
            rho.append(1.0 / sy)
            if len(S) > history_size:
                S.pop(0)
                Y.pop(0)
                rho.pop(0)
        x = x + s
        f, g = fn, gn
        hist.append(f)
        if t < 1e-12:
            break
    return x, f, it, converged, hist


def fit_quality_classifier(df: DataFrame, text_col: str, label_col: str,
                           n_buckets: int = 4096, reg: float = 1e-4,
                           max_iter: int = 50, tol: float = 1e-6,
                           token_hash=None,
                           tokens_col: Optional[Column] = None,
                           history_size: int = 10) -> QualityClassifier:
    """Fit the quality LR on a labeled corpus (``label_col`` in {0,1}:
    1 = reference/high-quality, 0 = raw).  See the module docstring for
    the distributed shape; null/empty documents train on the bias
    alone (their margin is the intercept).  Rows with a NULL label are
    EXCLUDED from the fit (a null would otherwise propagate NaN
    through every loss/gradient evaluation and corrupt the model
    silently)."""
    feats = _cap_and_persist(
        df.filter(F.col(label_col).isNotNull()).select(
            F.col(label_col).cast("double").alias("y"),
            _staged_buckets(text_col, n_buckets, token_hash,
                            tokens_col).alias("bkts")))
    try:
        ev = _eval_factory(feats, n_buckets, reg)
        x0 = np.zeros(n_buckets + 1)
        x, f, it, conv, hist = _lbfgs(lambda w: ev(w), x0, max_iter, tol,
                                      history_size)
    finally:
        feats.unpersist()
    return QualityClassifier(weights=x[:n_buckets], bias=float(x[n_buckets]),
                             n_buckets=n_buckets, loss=float(f), n_iter=it,
                             converged=conv, history=hist)


def quality_scores(df: DataFrame, text_col: str, model: QualityClassifier,
                   out_col: str = "quality_score", token_hash=None,
                   tokens_col: Optional[Column] = None) -> DataFrame:
    """Score every document with ``sigmoid(bias + sum w[bucket])`` —
    the learned weights ride an Arrow UDF closure (one broadcast of
    n_buckets doubles), the bucket array is the same staged row-local
    projection as training, zero shuffles.  Null documents score at
    the bias (the training-side convention)."""
    from pyspark.sql.functions import pandas_udf

    W = np.asarray(model.weights, dtype=np.float64)[None, :]
    B = np.asarray([model.bias], dtype=np.float64)

    @pandas_udf("double")
    def score(bks: pd.Series) -> pd.Series:
        out = _batch_margins(bks, W, B)[:, 0]
        return pd.Series(1.0 / (1.0 + np.exp(-out)))

    staged = _staged_buckets(text_col, model.n_buckets, token_hash,
                             tokens_col)
    return df.withColumn(out_col, score(staged))


# ---------------------------------------------------------------------------
# one-vs-rest multiclass (language / domain classification)
# ---------------------------------------------------------------------------

@dataclass
class LabelClassifier:
    """One-vs-rest multiclass model: per-class weight rows over the
    shared hashed-unigram bucketing (language ID, domain routing,
    source attribution — any label a curation pipeline partitions
    by)."""

    labels: list
    weights: np.ndarray          # (n_labels, n_buckets)
    biases: np.ndarray           # (n_labels,)
    n_buckets: int

    def to_dict(self) -> dict:
        return {"labels": list(self.labels),
                "weights": [[float(x) for x in row] for row in self.weights],
                "biases": [float(b) for b in self.biases],
                "n_buckets": int(self.n_buckets)}

    @classmethod
    def from_dict(cls, d: dict) -> "LabelClassifier":
        return cls(labels=list(d["labels"]),
                   weights=np.asarray(d["weights"], dtype=np.float64),
                   biases=np.asarray(d["biases"], dtype=np.float64),
                   n_buckets=int(d["n_buckets"]))


def fit_label_classifier(df: DataFrame, text_col: str, label_col: str,
                         n_buckets: int = 4096, reg: float = 1e-4,
                         max_iter: int = 50, tol: float = 1e-6,
                         token_hash=None,
                         tokens_col: Optional[Column] = None,
                         max_labels: int = 1000) -> LabelClassifier:
    """One-vs-rest logistic regression over the quality classifier's
    machinery: the bucket-array featurization runs ONCE (persisted and
    shared by every class's fit — each class only re-derives its 0/1
    target from the cached label column), then each class runs the
    same zero-Exchange distributed L-BFGS.  Distinct labels are
    collected (bounded by ``max_labels`` — a label column with more
    classes than that is almost certainly not a label column; refuse
    loudly, the ``bpe_train`` guard pattern)."""
    from pyspark.sql import types as T

    ldt = df.schema[label_col].dataType
    if not isinstance(ldt, (T.StringType, T.ByteType, T.ShortType,
                            T.IntegerType, T.LongType, T.BooleanType)):
        raise ValueError(
            f"fit_label_classifier: label column {label_col!r} must be "
            f"string or integral, got {ldt} (label_predict must emit "
            "the same type back)")
    # unlabeled (NULL) rows are excluded: they would turn y into NaN
    # for EVERY one-vs-rest class and silently corrupt all fits
    feats = _cap_and_persist(
        df.filter(F.col(label_col).isNotNull()).select(
            F.col(label_col).alias("__lbl"),
            _staged_buckets(text_col, n_buckets, token_hash,
                            tokens_col).alias("bkts")))
    try:
        labels = [r[0] for r in
                  feats.select("__lbl").distinct()
                       .limit(max_labels + 1).collect()
                  if r[0] is not None]
        if len(labels) > max_labels:
            raise ValueError(
                f"fit_label_classifier: over {max_labels} distinct "
                f"labels in {label_col!r}; is this a label column? "
                "Raise max_labels to override.")
        if not labels:
            # a degenerate zero-class model would crash later inside
            # label_predict's Arrow UDF (argmax of an empty axis) —
            # refuse here, like fit_quality_classifier does
            raise ValueError(
                f"fit_label_classifier: no labeled rows — every "
                f"{label_col!r} value is NULL")
        labels = sorted(labels)
        W = np.zeros((len(labels), n_buckets))
        B = np.zeros(len(labels))
        for li, lbl in enumerate(labels):
            fl = feats.select(
                (F.col("__lbl") == F.lit(lbl)).cast("double").alias("y"),
                "bkts")
            ev = _eval_factory(fl, n_buckets, reg)
            x, _, _, _, _ = _lbfgs(lambda w: ev(w),
                                   np.zeros(n_buckets + 1), max_iter, tol)
            W[li] = x[:n_buckets]
            B[li] = x[n_buckets]
    finally:
        feats.unpersist()
    return LabelClassifier(labels=labels, weights=W, biases=B,
                           n_buckets=n_buckets)


def label_predict(df: DataFrame, text_col: str, model: LabelClassifier,
                  out_col: str = "pred_label", token_hash=None,
                  tokens_col: Optional[Column] = None) -> DataFrame:
    """Predicted label = argmax of the per-class margins (sigmoid is
    monotone, so margins suffice) — one Arrow UDF carrying the
    (n_labels x n_buckets) matrix, zero shuffles; ties break to the
    lexicographically first label (stable).  Documents with no tokens
    predict from the biases alone.  The output column carries the
    label's own type (string or long, matching the fit-time column)."""
    import numbers

    from pyspark.sql.functions import pandas_udf

    W = np.ascontiguousarray(model.weights)
    B = np.asarray(model.biases, dtype=np.float64)
    labels = list(model.labels)
    # emit the fit labels' OWN type back (the fit docstring's contract):
    # booleans as boolean — mapping them to bigint 0/1 breaks the
    # caller's pred == label comparison under ANSI (no implicit
    # boolean<->bigint cast)
    if all(isinstance(l, bool) for l in labels):
        ret = "boolean"
    elif all(isinstance(l, (bool, numbers.Integral)) for l in labels):
        ret = "long"
    else:
        ret = "string"

    @pandas_udf(ret)
    def pred(bks: pd.Series) -> pd.Series:
        best = _batch_margins(bks, W, B).argmax(axis=1)  # first max =
        return pd.Series([labels[b] for b in best])      # first label

    staged = _staged_buckets(text_col, model.n_buckets, token_hash,
                             tokens_col)
    return df.withColumn(out_col, pred(staged))
