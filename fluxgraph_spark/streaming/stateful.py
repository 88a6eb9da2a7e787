"""Custom stateful streaming operator via applyInPandasWithState.

``session_window`` (events.py) covers gap sessions; this operator covers
what built-ins can't express: an *incremental per-key accumulator* whose
state survives across micro-batches and whose output rows are emitted
per batch (running totals, monotone high-water marks, event-type
transitions).  State is one small tuple per key — bounded by key
cardinality, not stream length — and Spark's state store handles
checkpointing/recovery.

The Arrow batch path (pandas per group-batch) keeps the Python cost
amortized: one Python call per (key, micro-batch), never per row.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

RUNNING_STATS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events_total", T.LongType()),
        T.StructField("value_total", T.DoubleType()),
        T.StructField("max_value_seen", T.DoubleType()),
        T.StructField("batch_events", T.LongType()),
    ]
)

RUNNING_STATS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("max_v", T.DoubleType()),
    ]
)


def _update_running_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, max_v = state.get
    else:
        n, total, max_v = 0, 0.0, float("-inf")
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            max_v = max(max_v, float(pdf["value"].max()))
    state.update((n, total, max_v))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events_total": [n],
            "value_total": [total],
            "max_value_seen": [max_v],
            "batch_events": [batch_n],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (n, sum, max) across micro-batches — one output
    row per (user, batch) with totals-so-far.  State: 3 scalars per user."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running_stats,
            outputStructType=RUNNING_STATS_OUTPUT,
            stateStructType=RUNNING_STATS_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
