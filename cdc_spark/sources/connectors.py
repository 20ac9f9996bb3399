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


# The Kafka sink's frame contract (Structured Streaming + Kafka
# Integration Guide): `value` required, everything else optional.
# Types are the EXACT set the producer accepts — anything else fails
# only at runtime against a broker, which this environment lacks, so
# validate_kafka_frames() front-loads the check to plan time.
_KAFKA_FRAME_TYPES: dict[str, tuple[str, ...]] = {
    "key": ("string", "binary"),
    "value": ("string", "binary"),
    "topic": ("string",),
    "partition": ("int",),
    "headers": ("array<struct<key:string,value:binary>>",),
}


def validate_kafka_frames(df: DataFrame) -> None:
    """Assert ``df`` is a well-formed Kafka producer frame set.

    Raises ``ValueError`` when `value` is missing or any recognized
    column has a type the Kafka sink would reject — the misbuilt-frame
    failure that otherwise only surfaces against a live broker."""
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if "value" not in fields:
        raise ValueError(
            "Kafka frames require a `value` column; got "
            f"{sorted(fields)}"
        )
    for name, allowed in _KAFKA_FRAME_TYPES.items():
        if name in fields and fields[name] not in allowed:
            raise ValueError(
                f"Kafka frame column `{name}` must be "
                f"{' or '.join(allowed)}, got {fields[name]}"
            )


def kafka_frames(
    df: DataFrame,
    *,
    topic_col: str = "topic",
    value_col: str = "value",
    key_col: str | None = None,
) -> DataFrame:
    """Project a DataFrame into validated Kafka producer frames:
    binary key/value + string topic. The key column (Debezium keys by
    primary key) preserves per-entity partition ordering — without it
    a multi-partition topic loses the per-key total order every CDC
    consumer depends on."""
    cols = [
        F.col(topic_col).cast("string").alias("topic"),
        F.col(value_col).cast("string").cast("binary").alias("value"),
    ]
    if key_col is not None:
        cols.insert(
            0, F.col(key_col).cast("string").cast("binary").alias("key")
        )
    out = df.select(*cols)
    validate_kafka_frames(out)
    return out


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
    *,
    topic_col: str = "topic",
    value_col: str = "value",
    key_col: str | None = None,
):
    """Kafka writer honoring a per-row topic column — the outbox
    router's fan-out transport (deck slide 40). Returns a CONFIGURED
    writer: call ``.start()`` on the streaming variant or ``.save()``
    on the batch variant to produce (needs the kafka package + a
    broker; returning unstarted keeps this constructible in tests).
    Frames are validated against the producer contract at build time."""
    out = kafka_frames(
        df, topic_col=topic_col, value_col=value_col, key_col=key_col
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
