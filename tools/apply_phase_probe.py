"""Phase-level instrumentation of one BucketedStateTable.apply.

Reproduces bench.py's cdc_incr_apply_small_batch setup, then times
each phase of the steady-state apply separately (guide §1: measure
before changing anything):

- touched-bucket scan (the bounded 1-row aggregate job)
- manifest/pointer driver IO
- base read construction (driver-side, no job)
- apply_changes plan build (spark.sql parse)
- the bucket write job (action)
- manifest + pointer fsync commit

Run: SPARK_GRAFT_SF_DIR=... python tools/apply_phase_probe.py
"""

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
from cdc_spark.streaming import state as state_mod
from cdc_spark.streaming.state import BucketedStateTable


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "apply_phase_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- instrument the module's phases via monkeypatch timers -------
    timings: dict[str, float] = {}

    orig_fsync = state_mod._fsync_replace

    def timed_fsync(tmp, dst, payload):
        t0 = time.time()
        orig_fsync(tmp, dst, payload)
        timings["fsync:" + os.path.basename(dst)] = timings.get(
            "fsync:" + os.path.basename(dst), 0.0
        ) + (time.time() - t0)

    state_mod._fsync_replace = timed_fsync

    d = tempfile.mkdtemp(prefix="probe_state_")
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
        state.apply(batch, ["o_custkey", "o_totalprice"])  # warm-up

        # --- manual phase replay of state.apply --------------------
        from cdc_spark.cdc.merge import apply_changes

        for rep in range(3):
            batch = batch.withColumn("lsn", F.col("lsn") + 1)
            marks = [("t0", time.time())]

            v_cur = state.current_version()
            marks.append(("current_version", time.time()))

            ch = batch.withColumn("__bucket", state._bucket_expr())
            info = ch.agg(
                F.collect_set(F.col("__bucket")).alias("bs"),
                F.max(F.col("op") == "t").alias("has_t"),
                F.max(F.col("lsn")).alias("mx"),
            ).first()
            marks.append(("touched_scan_job", time.time()))

            touched = set(info["bs"] or ())
            man = state._load_manifest(v_cur)
            base_dirs = [
                os.path.join(state.path, rel)
                for b, rel in man["buckets"].items()
                if int(b) in touched
            ]
            base = state._read_dirs(man, base_dirs, session=batch.sparkSession)
            marks.append(("base_read_build", time.time()))

            ch2 = ch.where(
                F.col("__bucket").isin([int(b) for b in touched])
            )
            new_state = apply_changes(
                base,
                ch2.drop("__bucket"),
                state.keys,
                ["o_custkey", "o_totalprice"],
                may_truncate=False,
            )
            marks.append(("merge_plan_build", time.time()))

            v_new = (v_cur or 0) + 1
            target = state._version_dir(v_new)
            out = new_state.withColumn("__bucket", state._bucket_expr())
            out.write.partitionBy("__bucket").mode("overwrite").parquet(
                target
            )
            marks.append(("write_job", time.time()))

            import json as _json

            written = {
                int(name.split("=", 1)[1]): f"v{v_new}/{name}"
                for name in os.listdir(target)
                if name.startswith("__bucket=")
            }
            buckets = {
                b: rel
                for b, rel in man["buckets"].items()
                if int(b) not in touched
            }
            buckets.update({str(b): rel for b, rel in written.items()})
            manifest = {
                "version": v_new,
                "n_buckets": state.n_buckets,
                "keys": state.keys,
                "schema": _json.loads(new_state.schema.json()),
                "buckets": buckets,
                "touched": sorted(touched),
            }
            state_mod._fsync_replace(
                state._manifest_path(v_new) + ".tmp",
                state._manifest_path(v_new),
                _json.dumps(manifest, indent=1),
            )
            state._commit_pointer(v_cur, v_new)
            marks.append(("commit", time.time()))

            print(f"--- rep {rep} total {marks[-1][1] - marks[0][1]:.3f}s")
            for (n1, t1), (n2, t2) in zip(marks, marks[1:]):
                print(f"  {n2:20s} {t2 - t1:8.3f}s")
        print("fsync totals:", {k: round(v, 4) for k, v in timings.items()})
    finally:
        shutil.rmtree(d, ignore_errors=True)
        state_mod._fsync_replace = orig_fsync


if __name__ == "__main__":
    main()
