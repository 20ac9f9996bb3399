"""A/B: does narrowing a tiny change batch to one partition before the
merge cut the apply floor? Same-session alternating min-of-5."""

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
from cdc_spark.cdc.merge import apply_changes


def tmin(fn, n=5, label=""):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:52s} min {best:7.3f}s")
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "apply_phase_probe3",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    d = tempfile.mkdtemp(prefix="probe3_state_")
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
        ).localCheckpoint()
        print("batch partitions:", batch.rdd.getNumPartitions())

        v_cur = state.current_version()
        man = state._load_manifest(v_cur)
        base_dirs = [
            os.path.join(state.path, rel)
            for b, rel in man["buckets"].items()
            if int(b) == 0
        ]
        base = state._read_dirs(man, base_dirs, session=batch.sparkSession)
        wd = os.path.join(d, "probe_out")

        def run(ch):
            merged = apply_changes(
                base,
                ch,
                ["o_orderkey"],
                ["o_custkey", "o_totalprice"],
                may_truncate=False,
            )
            out = merged.withColumn("__bucket", state._bucket_expr())
            out.write.partitionBy("__bucket").mode("overwrite").parquet(wd)

        narrow = batch.coalesce(1)
        # warm both
        run(batch)
        run(narrow)
        for _ in range(2):
            tmin(lambda: run(batch), label="A merge+write, 32-part batch")
            tmin(lambda: run(narrow), label="B merge+write, coalesce(1) batch")

        # touched-scan variant: agg over 32-part vs coalesced
        chA = batch.withColumn("__bucket", state._bucket_expr())
        chB = narrow.withColumn("__bucket", state._bucket_expr())
        agg = lambda c: c.agg(
            F.collect_set(F.col("__bucket")).alias("bs"),
            F.max(F.col("op") == "t").alias("has_t"),
            F.max(F.col("lsn")).alias("mx"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        agg(chA); agg(chB)
        tmin(lambda: agg(chA), label="A touched agg 32-part")
        tmin(lambda: agg(chB), label="B touched agg coalesce(1)")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
