"""Driver-conditions smoke: run every registered query under a session
built WITHOUT cdc_spark.session's defaults.

The correctness driver constructs its own SparkSession; conf that only
works at builder time (e.g. spark.sql.legacy.parquet.nanosAsLong) is
absent there, which changes how the parquet test data surfaces (the
round-3 TIMESTAMP_NTZ watermark failures were exactly this class).
This harness reproduces those conditions locally: plain session, every
query executed and collected at the smoke SF.

Usage: python tools/driver_smoke.py [--sf /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_smoke")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_spark.queries import REGISTRY

    names = args.names or list(REGISTRY)
    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            rows = REGISTRY[name].fn(spark, args.sf).collect()
            print(f"ok   {name}: rows={len(rows)} [{time.time()-t0:.1f}s]")
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
            print(f"FAIL {name}: {type(e).__name__}: {msg}")
            n_fail += 1
    print(f"{len(names) - n_fail} ok, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
