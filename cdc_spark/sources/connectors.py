"""Stream source/sink constructors.

The engine's transport is Kafka/Debezium (deck slides 21-27: DB →
Debezium → Kafka → consumers); the file source is the test harness's
stand-in with identical downstream code. Kafka constructors build the
full reader/writer configuration — they are exercised at the plan
level only in this environment (no broker in the container; the
spark-sql-kafka package ships with real clusters).

The reference's transport knobs map as (SURVEY.md §2.1):
- publication table-set (main.go:28-40)   → subscribePattern
- IdentifySystem start LSN (main.go:42-46)→ startingOffsets
- temporary replication slot (main.go:50) → fresh consumer group /
  checkpoint dir
- standby ack cadence (main.go:61-74)     → checkpoint commit per
  micro-batch (minOffsetsPerTrigger / maxTriggerDelay tune cadence)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_change_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    *,
    subscribe_pattern: str = "cdc\\..*",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source → (value string, lsn long, topic) rows ready for the
    envelope parsers. The Kafka (partition, offset) pair becomes the
    per-partition total order: lsn = offset (parsers only require
    monotonicity per key, and Debezium keys by PK → one partition)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", subscribe_pattern)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    raw = reader.load()
    return raw.select(
        F.col("value").cast("string").alias("value"),
        F.col("offset").alias("lsn"),
        F.col("topic"),
    )


def file_change_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based change stream (one JSON document per line) — the
    harness transport; identical downstream handling to Kafka."""
    reader = spark.readStream.format("text").schema("value string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(source_dir)


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
    *,
    topic_col: str = "topic",
    value_col: str = "value",
):
    """Kafka writer honoring a per-row topic column — the outbox
    router's fan-out transport (deck slide 40). Returns a CONFIGURED
    writer: call ``.start()`` on the streaming variant or ``.save()``
    on the batch variant to produce (needs the kafka package + a
    broker; returning unstarted keeps this constructible in tests)."""
    out = df.select(
        F.col(topic_col).alias("topic"),
        F.col(value_col).cast("string").alias("value"),
    )
    if out.isStreaming:
        return (
            out.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("checkpointLocation", checkpoint_dir)
        )
    return out.write.format("kafka").option(
        "kafka.bootstrap.servers", bootstrap_servers
    )


def write_sink(
    df: DataFrame,
    fmt: str,
    path: str | None = None,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Batch sink: parquet/orc/json/csv/console/noop."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "console":
        df.show(20, truncate=False)
        return
    if path is None:
        writer.format(fmt).save()
    else:
        writer.format(fmt).save(path)
