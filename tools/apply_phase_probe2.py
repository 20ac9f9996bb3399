"""Drill-down: why does a 200-row touched-bucket scan cost ~1 s and a
one-bucket merge write ~2 s? Times each candidate component in
isolation, steady-state (many reps, min)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil
import tempfile

from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.session import get_spark
from cdc_spark.streaming.state import BucketedStateTable


def tmin(fn, n=6, label=""):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:44s} min {best:7.3f}s")
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "apply_phase_probe2",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    d = tempfile.mkdtemp(prefix="probe2_state_")
    try:
        state = BucketedStateTable(spark, d, ["o_orderkey"], n_buckets=64)
        orders = load_table(spark, sf_dir, "orders")
        seed = orders.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.lit("c").alias("op"),
            F.col("o_orderkey").alias("lsn"),
        )
        state.apply(seed, ["o_custkey", "o_totalprice"])

        batch_rows = (
            seed.where(
                F.pmod(F.xxhash64(F.col("o_orderkey")), F.lit(64)) == 0
            )
            .limit(200)
            .collect()
        )
        batch = spark.createDataFrame(batch_rows, seed.schema).select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
            F.lit("u").alias("op"),
            (F.col("lsn") + 10_000_000).alias("lsn"),
        )
        batch = batch.localCheckpoint()  # freeze: plan noise out

        ch = batch.withColumn("__bucket", state._bucket_expr())

        # candidate costs of the touched-bucket scan
        tmin(lambda: batch.count(), label="batch.count()")
        tmin(
            lambda: ch.agg(
                F.collect_set(F.col("__bucket")).alias("bs"),
                F.max(F.col("op") == "t").alias("has_t"),
                F.max(F.col("lsn")).alias("mx"),
            ).first(),
            label="touched agg .first()",
        )
        tmin(
            lambda: ch.groupBy().agg(
                F.collect_set(F.col("__bucket")).alias("bs"),
            ).first(),
            label="collect_set only .first()",
        )

        # write-job components
        from cdc_spark.cdc.merge import apply_changes

        v_cur = state.current_version()
        man = state._load_manifest(v_cur)
        base_dirs = [
            os.path.join(state.path, rel)
            for b, rel in man["buckets"].items()
            if int(b) == 0
        ]
        base = state._read_dirs(man, base_dirs, session=batch.sparkSession)

        tmin(
            lambda: base.write.format("noop").mode("overwrite").save(),
            label="base bucket noop scan",
        )
        merged = apply_changes(
            base,
            batch,
            ["o_orderkey"],
            ["o_custkey", "o_totalprice"],
            may_truncate=False,
        )
        tmin(
            lambda: merged.write.format("noop").mode("overwrite").save(),
            label="merge noop (compute only)",
        )
        out = merged.withColumn("__bucket", state._bucket_expr())
        wd = os.path.join(d, "probe_out")
        tmin(
            lambda: out.write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(wd),
            label="merge + partitionBy parquet write",
        )
        tmin(
            lambda: out.write.mode("overwrite").parquet(wd),
            label="merge + flat parquet write",
        )
        tmin(
            lambda: apply_changes(
                base,
                batch,
                ["o_orderkey"],
                ["o_custkey", "o_totalprice"],
                may_truncate=False,
            ),
            label="apply_changes plan build only",
        )
        # a trivial 200-row write for the floor
        tmin(
            lambda: batch.write.mode("overwrite").parquet(wd),
            label="batch-only flat parquet write",
        )
        tmin(
            lambda: batch.write.partitionBy("op")
            .mode("overwrite")
            .parquet(wd),
            label="batch-only partitionBy write",
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
