"""Source/sink round-trip queries: the engine's non-parquet I/O edge.

The reference's transport is a change stream feeding downstream sinks
(deck slides 33-40: search index, cache, analytics store); an engine
user also needs plain batch interchange formats. These queries prove
byte-faithful round-trips through JSONL and CSV — written with the
:func:`cdc_spark.sources.connectors.write_sink` sink, read back with
an explicit schema (schema inference on a 100 TB dump is a full extra
scan — never rely on it at scale), and verified by aggregating the
read-back against the oracle's view of the original parquet.

Timestamps cross the JSON/CSV boundary as ``unix_micros`` longs:
epoch integers are timezone- and format-proof, where ISO strings
depend on writer/reader locale settings.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.queries.base import dsum, dsum_sql, register
from cdc_spark.sources.connectors import write_sink

_AGG_ORACLE = f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id,
           {dsum_sql('value')} AS total_value,
           MIN(epoch_us(ts)) AS min_ts_us
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
"""


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    out = events.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    path = os.path.join(
        tempfile.mkdtemp(prefix=f"io_{fmt}_"), f"events_{fmt}"
    )
    write_sink(out, fmt, path)
    # headerless files + explicit schema: column names come from the
    # schema, not from per-part header lines (which a distributed
    # writer would emit once per part file)
    back = (
        spark.read.format(fmt)
        .schema(
            "event_id long, ts_us long, user_id long, "
            "event_type string, value double"
        )
        .load(path)
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        dsum("value").alias("total_value"),
        F.min("ts_us").alias("min_ts_us"),
    )


@register(
    "io01_jsonl_roundtrip",
    oracle=_AGG_ORACLE,
    note="JSONL sink -> source round-trip: write the filtered stream "
    "as line-delimited JSON, read it back with an EXPLICIT schema (no "
    "inference scan), aggregate; hashes must equal the same aggregate "
    "over the original parquet — proves value fidelity across the "
    "text boundary (timestamps as epoch-micros longs)",
    tags=("io", "source", "sink"),
)
def io01_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "json")


@register(
    "io02_csv_roundtrip",
    oracle=_AGG_ORACLE,
    note="CSV sink -> source round-trip with explicit schema; doubles "
    "survive because Spark's CSV writer emits round-trippable "
    "representations (shortest repr preserving the exact binary64 "
    "value)",
    tags=("io", "source", "sink"),
)
def io02_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "csv")
