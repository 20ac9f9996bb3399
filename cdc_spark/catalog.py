"""Table catalog over the driver-generated parquet test data.

``load_tables`` gives the query layer one entry point for the star
schema + extension tables (TESTDATA.md). Scans stay lazy DataFrames so
Catalyst keeps predicate pushdown / column pruning / partition pruning
on every downstream query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at *any* scale factor; the fact
# tables (orders, lineitem, events, documents, embeddings) scale with SF
# and must never be broadcast.
BROADCASTABLE = frozenset({"region", "nation", "supplier", "part", "customer"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def ensure_session_confs(spark: SparkSession) -> None:
    """Set the runtime-settable confs this engine depends on.

    The driver may hand us a session built without cdc_spark.session's
    defaults; these three are SQL confs (settable post-startup) and
    load-bearing: nanos parquet timestamps (events table), UTC
    timestamps (oracle comparability), Arrow (pandas UDF transfer).
    """
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:  # noqa: BLE001 — conf may be locked; best effort
            pass


def normalize_event_time(df: DataFrame, *cols: str) -> DataFrame:
    """Canonicalize event-time columns to TIMESTAMP (with local tz).

    The driver's events.parquet stores TIMESTAMP(NANOS); depending on
    how the session was built, Spark surfaces it as either

    - ``bigint`` (``spark.sql.legacy.parquet.nanosAsLong=true`` set at
      session build — our own sessions), or
    - ``timestamp_ntz`` (pyspark 4.1 default read path — the driver's
      session; the legacy conf is a no-op when set post-startup).

    Watermarks/stream-stream joins require TIMESTAMP, so both shapes
    are converted here. With session tz pinned to UTC
    (``ensure_session_confs``) the NTZ→LTZ cast preserves wall-clock
    values, so results stay comparable to the UTC-naive DuckDB oracle.
    Integer DIV keeps full precision on the bigint path; a double
    division would not (epoch-nanos exceeds 2^53).
    """
    dtypes = dict(df.dtypes)
    for c in cols:
        dt = dtypes.get(c)
        if dt == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
        elif dt == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    return normalize_event_time(df, "ts")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table as a lazy DataFrame keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for spark.sql use."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
