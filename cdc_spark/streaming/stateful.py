"""Custom stateful streaming operators via applyInPandasWithState.

The escape hatch for per-key streaming state that windows/dedup can't
express — here, a running per-key event counter + last-value register
(a tiny materialized-state machine, the same shape a custom CDC
aggregator would use). State is bounded per key; the state store
checkpoints with the query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("last_value", DoubleType()),
        StructField("last_lsn", LongType()),
    ]
)


def _update_counts(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, last_value, last_lsn = state.get
    else:
        n, last_value, last_lsn = 0, None, -1
    for pdf in batches:
        pdf = pdf.sort_values("event_id")
        n += len(pdf)
        if len(pdf):
            tail = pdf.iloc[-1]
            if int(tail["event_id"]) > last_lsn:
                last_lsn = int(tail["event_id"])
                last_value = float(tail["value"])
    state.update((n, last_value, last_lsn))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "last_value": [last_value],
        }
    )


def running_counts(stream: DataFrame) -> DataFrame:
    """Per-key running count + last value over a change stream
    (columns: user_id, event_id, value)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
