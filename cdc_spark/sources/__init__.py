"""Source/sink constructors for the CDC pipeline."""

from cdc_spark.sources.connectors import (
    file_change_stream,
    kafka_change_stream,
    kafka_sink,
    write_sink,
)

__all__ = [
    "file_change_stream",
    "kafka_change_stream",
    "kafka_sink",
    "write_sink",
]
