"""Same-session A/B of the batch-narrowing change on the three apply
benches (bench.py's own functions), alternating variants."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from cdc_spark.session import get_spark
from cdc_spark.streaming import state as state_mod


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "apply_ab_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    fns = {
        "cdc_incr": bench.bench_incremental_apply,
        "ivm": bench.bench_ivm_maintenance,
        "skew": bench.bench_skewed_hot_key_apply,
    }
    for round_i in range(2):
        for name, fn in fns.items():
            for label, rpt in (("A off", 1), ("B 65536", 65536)):
                state_mod._APPLY_ROWS_PER_TASK = rpt
                t = fn(spark, sf_dir)
                print(f"r{round_i} {name:10s} {label:8s} {t:7.3f}s", flush=True)


if __name__ == "__main__":
    main()
