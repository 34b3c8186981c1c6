"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming surface (SURVEY.md §2.7); this is the
Spark-native extension path for operators that need per-key state beyond
built-in windows: running aggregates that survive across micro-batches,
session carryover, online anomaly flags.

Pattern: group the stream by key, keep a small numpy-serializable state
per key in ``GroupState``, emit deltas per batch.  State size is O(keys),
partitioned across executors by the groupBy hash — the standard recipe for
100 TB streams where no single node holds all keys.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("total_value", T.DoubleType(), True),
])

# CHECKPOINT-BREAKING (r13): gained n_valid as a third field.  A stream
# resuming from a checkpoint written by the 2-field (n, total) schema is
# rejected by Spark's state-store schema compatibility check — restart
# with a fresh checkpoint directory.  _running_totals_fn additionally
# tolerates a legacy 2-tuple defensively (see its body).
_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType(), False),
    T.StructField("n_valid", T.LongType(), False),
    T.StructField("total", T.DoubleType(), False),
])


def _running_totals_fn(key: Tuple[Any, ...],
                       pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        st = state.get
        if len(st) == 2:
            # legacy pre-r13 checkpoint: 2-field state (n, total) from
            # before n_valid existed.  Spark's state-store schema check
            # usually rejects such a resume outright, but when the
            # store hands the old tuple through, degrade gracefully:
            # assume every counted event had a value (the legacy
            # emission semantics) instead of crashing the stream.
            n, total = st
            n_valid = n
        else:
            n, n_valid, total = st
    else:
        n, n_valid, total = 0, 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        # SQL sum(value) is NULL when every value is NULL — pandas
        # Series.sum() of all-NaN is 0.0, which would silently break the
        # documented batch/stream equivalence for all-null users; track
        # the non-null count so the emit can say NULL
        n_valid += int(pdf["value"].notna().sum())
        total += float(pdf["value"].sum())
    state.update((n, n_valid, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "total_value": [total if n_valid else None]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) across all micro-batches —
    state persists between triggers, unlike a windowed aggregate.

    Works only on streaming DataFrames (``applyInPandasWithState``
    contract); the batch equivalent is a plain groupBy, which is what the
    tests compare against."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _running_totals_fn,
                outputStructType=RUNNING_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("session_idx", T.LongType(), False),
    T.StructField("event_idx", T.LongType(), False),
])

_SESSION_STATE = T.StructType([
    T.StructField("last_us", T.LongType(), False),
    T.StructField("session_idx", T.LongType(), False),
    T.StructField("event_idx", T.LongType(), False),
])


def _sessionize_fn(gap_us: int):
    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        last_us, s_idx, e_idx = state.get if state.exists else (None, 0, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        # within a micro-batch, process in event-time order (ties on id)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        out_s, out_e = [], []
        for ts in rows["ts"]:
            us = int(pd.Timestamp(ts).value // 1000)
            # >= matches events.sessionize / F.session_window boundary
            if last_us is None or us - last_us >= gap_us:
                s_idx += 1
                e_idx = 1
            else:
                e_idx += 1
            last_us = us
            out_s.append(s_idx)
            out_e.append(e_idx)
        state.update((last_us if last_us is not None else 0, s_idx, e_idx))
        yield pd.DataFrame({
            "user_id": user_id,
            "event_id": rows["event_id"].to_numpy(),
            "ts": rows["ts"].to_numpy(),
            "session_idx": out_s,
            "event_idx": out_e,
        })

    return fn


def sessionize_stream(events: DataFrame,
                      gap_minutes: float = 30.0) -> DataFrame:
    """STREAMING per-event session assignment — the stateful counterpart
    of ``events.sessionize``: per-user state (last event time, session
    ordinal, event ordinal) persists across micro-batches, so a session
    spanning many triggers keeps one ``session_idx`` and its events
    number consecutively.

    Contract: events are processed in event-time order WITHIN each
    micro-batch (sorted per group); an event arriving in a LATER batch
    with an earlier timestamp is sessionized in arrival order — the
    exactness trade every online sessionizer makes.

    LATE-DATA POLICY (pinned by ``test_stateful_late_data_policies``):
    a straggler whose timestamp PRECEDES the entity's last processed
    event joins the entity's CURRENT session (its negative gap can
    never reach ``gap_minutes``), taking the next ``event_idx``; it is
    never re-sorted into the session its timestamp belongs to, and it
    REWINDS ``last_us`` — the next event's gap measures from the
    straggler.  To drop stragglers instead, compose
    ``events.withWatermark(ts, horizon)`` upstream: rows later than
    the watermark are filtered before the state op, and within-horizon
    rows still follow the arrival-order rule.  For bounded state on
    real deployments, compose with a watermark upstream and an
    eviction policy; batch backfills should use ``sessionize`` (whose
    window answer this operator reproduces for in-order streams — see
    the equivalence test)."""
    gap_us = int(gap_minutes * 60_000_000)
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn(gap_us),
                outputStructType=SESSION_SCHEMA,
                stateStructType=_SESSION_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def funnel_stream(events: DataFrame, steps, within_minutes=None,
                  by: str = "user_id", ts_col: str = "ts",
                  step_col: str = "event_type",
                  tiebreak_col: str = "event_id") -> DataFrame:
    """STREAMING first-touch funnel — the stateful counterpart of
    ``events.funnel``: per-entity state (the matched step timestamps)
    persists across micro-batches, so a funnel whose steps arrive in
    different triggers still completes, and each batch emits the
    entity's CURRENT completion row (update semantics — later batches
    supersede earlier rows for the same entity).

    Same stated semantics as the batch operator: earliest step-1
    anchors, later steps strictly after the previous match and (with
    ``within_minutes``) inside the window of the first match; non-step
    events are filtered BEFORE the shuffle.  Events are processed in
    event-time order within each micro-batch (ties by
    ``tiebreak_col``); cross-batch stragglers match in arrival order —
    the online sessionizer's exactness trade.

    LATE-DATA POLICY (pinned by ``test_stateful_late_data_policies``):
    matched step times are MONOTONE — a straggler step event whose
    timestamp is <= the last matched step's time NEVER matches (the
    ``us <= done[-1]`` guard), even if it is exactly the next needed
    step; state never rewinds, so an already-reported completion can
    never be retracted.  A straggler for a step the entity has not
    reached yet, with a timestamp still past the last match, matches
    normally.  Compose an upstream watermark to drop stragglers
    entirely.  For an in-order stream the final rows equal the batch
    ``funnel`` answer (equivalence test)."""
    from pyspark.sql import functions as F

    k = len(steps)
    if k == 0 or len(set(steps)) != k:
        raise ValueError("steps must be a non-empty list of distinct "
                         "step values")
    within_us = None if within_minutes is None \
        else int(within_minutes * 60_000_000)
    steps = list(steps)

    # entity-key type comes from the input schema — a string-keyed
    # stream works the same as the default long user_id
    out_schema = T.StructType(
        [T.StructField(by, events.schema[by].dataType, False)]
        + [T.StructField(f"step{i + 1}_ts", T.TimestampType(), True)
           for i in range(k)]
        + [T.StructField("n_steps", T.IntegerType(), False)])
    state_schema = T.StructType(
        [T.StructField("done_us", T.ArrayType(T.LongType()), True)])

    def fn(key, pdfs, state: GroupState):
        (entity,) = key
        done = list(state.get[0] or []) if state.exists else []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, tiebreak_col], kind="mergesort")
        for ts_v, s in zip(rows[ts_col], rows[step_col]):
            need = len(done)
            if need >= k or s != steps[need]:
                continue
            us = int(pd.Timestamp(ts_v).value // 1000)
            if need and us <= done[-1]:
                continue
            if within_us is not None and need \
                    and us - done[0] > within_us:
                continue
            done.append(us)
        state.update((done,))
        row = {by: [entity], "n_steps": [len(done)]}
        for i in range(k):
            row[f"step{i + 1}_ts"] = [
                pd.Timestamp(done[i] * 1000) if i < len(done) else pd.NaT]
        yield pd.DataFrame(row)

    return (events
            .filter(F.col(step_col).isin(steps))
            .groupBy(by)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


_EWMA_STATE = T.StructType([
    T.StructField("has_prev", T.BooleanType(), False),
    T.StructField("prev", T.DoubleType(), False),
])


def ewma_stream(events: DataFrame, alpha: float = 0.3,
                value_col: str = "value", by: str = "user_id",
                ts_col: str = "ts",
                tiebreak_col: str = "event_id") -> DataFrame:
    """STREAMING per-entity EWMA — the stateful counterpart of
    ``events.ewma``: the last smoothed value persists across
    micro-batches (O(1) state per entity, the minimal stateful
    operator).  Same semantics: seed at the first non-null value, nulls
    propagate the previous EWMA; events process in event-time order
    within each micro-batch, cross-batch stragglers in arrival order
    (the online trade).

    LATE-DATA POLICY (pinned by ``test_stateful_late_data_policies``):
    a straggler's value folds into the recurrence AT ARRIVAL — its
    ewma is ``alpha*x + (1-alpha)*latest_state``, not the value a
    re-sorted series would give — and it advances the state that later
    events smooth from.  Rows already emitted are never restated
    (append semantics); a batch ``ewma`` backfill is the exact-order
    answer.  Compose an upstream watermark to drop stragglers.
    In-order streams reproduce the batch ``ewma`` exactly
    (equivalence test)."""
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")

    # output columns carry the CALLER's names and the input's types —
    # a string entity key or a renamed timestamp column round-trips
    # unchanged (the batch ewma contract)
    src = events.schema
    out_schema = T.StructType([
        T.StructField(by, src[by].dataType, False),
        T.StructField(tiebreak_col, src[tiebreak_col].dataType, False),
        T.StructField(ts_col, src[ts_col].dataType, False),
        T.StructField(value_col, T.DoubleType(), True),
        T.StructField("ewma", T.DoubleType(), True),
    ])

    def fn(key, pdfs, state: GroupState):
        (entity,) = key
        has_prev, prev = state.get if state.exists else (False, 0.0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, tiebreak_col], kind="mergesort")
        out = []
        for x in rows[value_col]:
            if pd.isna(x):
                out.append(prev if has_prev else None)
                continue
            prev = (alpha * float(x) + (1.0 - alpha) * prev) \
                if has_prev else float(x)
            has_prev = True
            out.append(prev)
        state.update((has_prev, prev))
        yield pd.DataFrame({
            by: entity,
            tiebreak_col: rows[tiebreak_col].to_numpy(),
            ts_col: rows[ts_col].to_numpy(),
            value_col: rows[value_col].to_numpy(),
            "ewma": out,
        })

    return (events
            .groupBy(by)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=_EWMA_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


_ANOM_STATE = T.StructType([
    T.StructField("vals", T.ArrayType(T.DoubleType()), True),
    T.StructField("mask", T.ArrayType(T.BooleanType()), True),
])


def rolling_anomaly_stream(events: DataFrame, value_col: str = "value",
                           by: str = "user_id", ts_col: str = "ts",
                           window: int = 20, min_periods: int = 5,
                           threshold: float = 2.0,
                           tiebreak_col: str = "event_id",
                           value_decimals=None) -> DataFrame:
    """STREAMING rolling z-score anomaly flags — the stateful
    counterpart of :func:`...streaming.events.rolling_anomaly`: the
    trailing ``window`` ROWS (values + a non-null mask, matching the
    batch ROWS-frame that counts null rows but excludes their values
    from the aggregates) persist per entity across micro-batches, so a
    spike whose baseline accrued in earlier triggers is still caught.
    O(window) state per entity.  Emits ONLY the flagged rows (append
    semantics — a flag is final, never restated).

    Same math as the batch operator: sample stddev over the trailing
    frame EXCLUDING the current row (an outlier can't mask itself),
    ``min_periods`` non-null priors required, degenerate (zero) stddev
    never flags.  ``value_decimals`` mirrors the batch operator's exact
    fixed-point path (scaled-int64 frame sums, deterministic floor
    rounding) so stream and batch emissions stay bit-identical.

    LATE-DATA POLICY (matching ewma_stream): events process in
    event-time order within a micro-batch (ties by ``tiebreak_col``);
    a cross-batch straggler is judged against — and then enters — the
    trailing frame AS OF ARRIVAL, not the frame its timestamp belongs
    to.  Rows already flagged are never retracted.  Compose an
    upstream watermark to drop stragglers; batch backfills use
    ``rolling_anomaly`` (in-order equivalence pinned by
    ``test_rolling_anomaly_stream_matches_batch``)."""
    import math

    src = events.schema
    out_schema = T.StructType([
        T.StructField(by, src[by].dataType, False),
        T.StructField(tiebreak_col, src[tiebreak_col].dataType, False),
        T.StructField(ts_col, src[ts_col].dataType, False),
        T.StructField(value_col, T.DoubleType(), True),
        T.StructField("baseline_mean", T.DoubleType(), True),
        T.StructField("baseline_std", T.DoubleType(), True),
        T.StructField("zscore", T.DoubleType(), True),
    ])

    scale = None if value_decimals is None else 10 ** int(value_decimals)

    def fn(key, pdfs, state: GroupState):
        (entity,) = key
        vals, mask = (list(state.get[0] or []), list(state.get[1] or [])) \
            if state.exists else ([], [])
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, tiebreak_col], kind="mergesort")
        out = []
        for tb, ts_v, x in zip(rows[tiebreak_col], rows[ts_col],
                               rows[value_col]):
            # frame-slot value + validity, computed ONCE and shared by
            # the judgment and the state update so the two can never
            # drift.  On the exact path this mirrors the batch
            # entrance `try_cast("bigint")`: a value whose scaled
            # double exceeds the int64 range becomes a NULL slot
            # (excluded from the aggregates, never flagged itself).
            # try_cast(double->bigint) validity is the CLOSED interval
            # [-2^63, +2^63] in double space — Long.MaxValue.toDouble
            # rounds UP to 2^63, so Spark's range check accepts the
            # double +2^63 and CLAMPS it to int64 max; NULL only
            # strictly beyond (verified empirically on Spark 4.1.2 and
            # pinned by test_rolling_anomaly_stream_int64_boundary;
            # NOT the asymmetric open bound an ANSI reading suggests).
            # Mirrored here by abs(d) > 2^63 + the clamp on `iv` below.
            if pd.isna(x):
                slot, ok = 0.0, False
            elif scale is None:
                slot, ok = float(x), True
            else:
                d = float(round(float(x) * scale))
                slot, ok = (0.0, False) if abs(d) > 2.0 ** 63 \
                    else (d, True)
            live = [v for v, m in zip(vals, mask) if m]
            n = len(live)
            overflow = False
            # n >= 2 mirrors the batch operator exactly: stddev_samp
            # is NULL for a single observation (filtered by the
            # __std.isNotNull() guard), it never divides by zero
            if ok and n >= max(min_periods, 2):
                if scale is None:
                    m_ = sum(live) / n
                    var = sum((v - m_) ** 2 for v in live) / (n - 1)
                    s_ = math.sqrt(var)
                    x_, r4 = float(x), lambda c: round(c, 4)
                    mean_out, std_out = m_, s_
                else:
                    # exact fixed-point path: identical op sequence to
                    # the batch operator (scaled-int64 S/Q, sample var
                    # from n*Q - S*S, floor(x*1e4+0.5)/1e4 rounding) so
                    # emissions are bit-identical to it
                    iv = [max(min(int(v), 2**63 - 1), -(2**63))
                          for v in live]
                    S, Q = sum(iv), sum(v * v for v in iv)
                    # mirror the batch operator's DECIMAL(38,0)
                    # envelope: beyond it the batch try_* aggregates
                    # yield NULL std and the row is (visibly) unflagged
                    # — Python's arbitrary-precision ints would keep
                    # flagging here and break the pinned bit-identity
                    if Q >= 10**38 or S * S >= 10**38 or n * Q >= 10**38:
                        overflow = True
                    else:
                        m_ = float(S) / float(n)
                        var = float(n * Q - S * S) / float(n * (n - 1))
                        s_ = math.sqrt(var)
                        x_ = slot
                        # mirror the batch r4's |c| < 9e14 saturation
                        # guard
                        r4 = lambda c: (math.floor(c * 1e4 + 0.5) / 1e4
                                        if abs(c) < 9e14 else c)
                        mean_out, std_out = m_ / scale, s_ / scale
                if not overflow and s_ > 0 \
                        and abs((x_ - m_) / s_) > threshold:
                    z = (x_ - m_) / s_
                    out.append((entity, tb, ts_v, float(x),
                                r4(mean_out), r4(std_out), r4(z)))
            # the row ENTERS the frame after being judged; null (and
            # scaled-overflow) rows occupy a frame slot with a False
            # mask (ROWS semantics) — ONE shared update for all paths
            vals.append(slot)
            mask.append(ok)
            if len(vals) > window:
                vals, mask = vals[-window:], mask[-window:]
        state.update((vals, mask))
        yield pd.DataFrame(out, columns=[by, tiebreak_col, ts_col,
                                         value_col, "baseline_mean",
                                         "baseline_std", "zscore"])

    return (events
            .groupBy(by)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=_ANOM_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def time_resample_stream(events: DataFrame, value_col: str = "value",
                         by: str = "user_id", ts_col: str = "ts",
                         interval_sec: int = 900,
                         fill: str = "ffill") -> DataFrame:
    """STREAMING per-entity time-grid resampling — the stateful
    counterpart of :func:`...streaming.events.time_resample`, and the
    one stream operator here whose emission is WATERMARK-driven rather
    than input-driven: a bucket (and the gap rows before it) is emitted
    exactly once, when the event-time watermark passes its end, so
    late events inside the watermark horizon still land in their
    bucket.  Requires ``events.withWatermark(ts_col, ...)`` upstream;
    without one the watermark never advances and nothing is emitted.

    State per entity: the OPEN buckets' (count, sum) pairs — bounded by
    the watermark horizon / ``interval_sec`` — plus the last emitted
    bucket and its mean for gap fill.  An event-time timeout is armed
    at the earliest open bucket's end so an entity that stops receiving
    events still flushes when the watermark passes (the pattern the
    input-driven operators here can't express).

    Same output contract as the batch operator: (by, bucket, n_events,
    value); ``n_events`` is the bucket's row count, 0 marks generated
    gap rows, gaps carry the previous bucket's (possibly NULL) mean
    verbatim under ``fill="ffill"`` and NULL under ``fill="none"``.
    A GAP run emits together with the real bucket that CLOSES it (like
    the batch operator, gaps exist only between observations — trailing
    gaps after an entity's last event are unknowable online).  Events
    later than the watermark are dropped by Spark upstream; an in-order
    stream's emissions equal the batch answer cut at each entity's last
    finalized real bucket (``test_time_resample_stream_matches_batch``)."""
    if fill not in ("ffill", "none"):
        raise ValueError(f"unknown fill {fill!r}")
    step_us = interval_sec * 1_000_000

    src = events.schema
    out_schema = T.StructType([
        T.StructField(by, src[by].dataType, False),
        T.StructField("bucket", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField(value_col, T.DoubleType(), True),
    ])
    # state: parallel arrays of open buckets + last-emitted carry
    state_schema = T.StructType([
        T.StructField("bks", T.ArrayType(T.LongType()), True),   # bucket us
        T.StructField("cnt", T.ArrayType(T.LongType()), True),
        T.StructField("sm", T.ArrayType(T.DoubleType()), True),
        T.StructField("nn", T.ArrayType(T.LongType()), True),    # non-null n
        T.StructField("last_bk", T.LongType(), True),            # emitted
        T.StructField("last_v", T.DoubleType(), True),
        T.StructField("has_last", T.BooleanType(), False),
    ])

    def fn(key, pdfs, state: GroupState):
        (entity,) = key
        if state.exists:
            bks, cnt, sm, nn, last_bk, last_v, has_last = state.get
            open_ = {b: [c, s, n] for b, c, s, n
                     in zip(bks or [], cnt or [], sm or [], nn or [])}
        else:
            open_, last_bk, last_v, has_last = {}, None, None, False
        for pdf in pdfs:
            for ts_v, x in zip(pdf[ts_col], pdf[value_col]):
                us = int(pd.Timestamp(ts_v).value // 1000)
                b = us - us % step_us
                slot = open_.setdefault(b, [0, 0.0, 0])
                slot[0] += 1
                if not pd.isna(x):
                    slot[1] += float(x)
                    slot[2] += 1
        wm_ms = state.getCurrentWatermarkMs()
        out = []
        # flush every bucket whose END the watermark passed, oldest
        # first, generating the gap grid from the last emitted bucket
        for b in sorted(open_):
            if wm_ms <= 0 or (b + step_us) // 1000 > wm_ms:
                break
            c, s, n = open_.pop(b)
            if has_last:
                g = last_bk + step_us
                while g < b:
                    gv = last_v if fill == "ffill" else None
                    out.append((entity, pd.Timestamp(g * 1000), 0, gv))
                    g += step_us
            mean = round(s / n, 4) if n else None
            out.append((entity, pd.Timestamp(b * 1000), c, mean))
            last_bk, last_v, has_last = b, mean, True
        if open_:
            # arm a timeout at the earliest open bucket's end so the
            # entity flushes even with no further input
            state.setTimeoutTimestamp((min(open_) + step_us) // 1000)
        items = sorted(open_.items())
        state.update(([b for b, _ in items],
                      [v[0] for _, v in items],
                      [v[1] for _, v in items],
                      [v[2] for _, v in items],
                      last_bk, last_v, has_last))
        yield pd.DataFrame(out, columns=[by, "bucket", "n_events",
                                         value_col])

    return (events
            .groupBy(by)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
