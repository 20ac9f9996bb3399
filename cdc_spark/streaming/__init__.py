"""Structured Streaming layer: stream parse → watermark → stateful apply."""

from cdc_spark.streaming.pipeline import (
    CdcStreamPipeline,
    VersionedStateTable,
)
from cdc_spark.streaming.state import BucketedStateTable
from cdc_spark.streaming.pipeline import (
    sessionized_counts,
    stream_dedup,
    windowed_agg,
)

__all__ = [
    "BucketedStateTable",
    "CdcStreamPipeline",
    "VersionedStateTable",
    "windowed_agg",
    "sessionized_counts",
    "stream_dedup",
]
