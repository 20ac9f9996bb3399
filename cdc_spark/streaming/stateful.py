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


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def timeout_sessionizer(gap_us: int):
    """Custom gap sessionization with EVENT-TIME TIMEOUT state closure.

    The session_window() built-in emits sessions through the windowed
    aggregation; this is the applyInPandasWithState twin for when the
    per-session logic outgrows an aggregate (custom close conditions,
    side outputs). Sessions that end inside a batch close by gap
    logic; each key's OPEN tail session closes via
    ``setTimeoutTimestamp(last + gap)`` — the state store evicts and
    emits it in the no-data batch once the watermark passes, so open
    sessions still emit without new events for that key (bounded
    state: one open session per key).
    """

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "start_us": [start],
                    "end_us": [last],
                    "n_events": [n],
                }
            )
            return
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple] = []
        # One key's rows may span several Arrow chunks (maxRecordsPerBatch);
        # gap detection needs a single global time order, so collect every
        # chunk's timestamps before the one sort + fold.
        all_ts: list[int] = []
        for pdf in batches:
            all_ts.extend(int(v) for v in pdf["ts_us"].to_numpy())
        for ts in sorted(all_ts):
            if start is None:
                start, last, n = ts, ts, 1
            elif ts - last > gap_us:
                closed.append((start, last, n))
                start, last, n = ts, ts, 1
            else:
                last, n = max(last, ts), n + 1
        state.update((start, last, n))
        # event-time timeout: fire once the watermark passes the gap
        state.setTimeoutTimestamp((last + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "start_us": [c[0] for c in closed],
                    "end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def gap_timeout_sessions(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    *,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    gap_us: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """Sessionize ``stream`` by per-key event-time gaps with timeout-
    driven closure of open sessions. Input needs (key_col, ts_col);
    output: key, session start/end epoch-micros, event count."""
    from pyspark.sql import functions as F

    from cdc_spark.catalog import normalize_event_time

    stream = normalize_event_time(stream, ts_col)
    prepared = (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.col(key_col).cast("long").alias("user_id"),
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
            F.col(ts_col),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        timeout_sessionizer(gap_us),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def running_totals_tws(stream: DataFrame) -> DataFrame:
    """Per-key running (count, exact sum) on the transformWithState
    API — the Spark 4 successor to applyInPandasWithState: named state
    variables on the RocksDB store, per-key Arrow iteration, update-
    mode cumulative emissions.

    ENVIRONMENT SEAM: the transformWithState Python worker speaks
    protobuf to the JVM state server; this container ships no
    ``google.protobuf``, so the operator cannot execute here (the
    same class of gap as Kafka transport / media codecs). The unit
    test skips when protobuf is absent; on a cluster image with
    protobuf installed it runs as-is.

    The running sum is kept in integer MICRO-UNITS (round(v * 1e6))
    so state content is independent of row arrival order and batch
    boundaries — the property that makes the final emission gateable
    against a batch SQL twin at any parallelism.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n BIGINT, micros BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, micros = (
                tuple(self._agg.get()) if self._agg.exists() else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                micros += int(
                    pdf["value"].map(lambda v: round(v * 1_000_000)).sum()
                )
            self._agg.update((n, micros))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(micros / 1_000_000, 4)],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, "
        "total_value double",
        outputMode="Update",
        timeMode="None",
    )
