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

_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType(), False),
    T.StructField("total", T.DoubleType(), False),
])


def _running_totals_fn(key: Tuple[Any, ...],
                       pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "total_value": [total]})


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
