"""Structured Streaming layer: stream parse → watermark → stateful apply."""

from cdc_spark.streaming.pipeline import (
    CdcStreamPipeline,
    VersionedStateTable,
    sessionized_counts,
    stream_dedup,
    windowed_agg,
)

__all__ = [
    "CdcStreamPipeline",
    "VersionedStateTable",
    "windowed_agg",
    "sessionized_counts",
    "stream_dedup",
]
