"""Per-entry perf probe (optimization rounds).

Times one or more registry entries exactly the way bench.py does
(noop sink, warm-up pass at sf0.001, min-of-N at the target SF) and
optionally dumps `.explain("formatted")` to a file — the measure step
of guide §1 without paying for a full bench run.

    python tools/perf_probe.py dd03_minhash_lsh st30_... [--reps 3]
        [--sf /root/testdata/sf0.1] [--explain-dir plans/r13] [--tag before]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_spark.queries import REGISTRY  # noqa: E402
from cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--warm", default="/root/testdata/sf0.001")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--tag", default="probe")
    args = ap.parse_args()

    spark = get_spark(
        "perf_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"warm:{name}")
        if args.warm and os.path.isdir(args.warm) and args.warm != args.sf:
            try:
                fn(spark, args.warm).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001 — warmup is best-effort
                pass
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            path = os.path.join(
                args.explain_dir, f"{name}_{args.tag}.txt"
            )
            with open(path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                    df._jdf.queryExecution(), "formatted"
                ))
            print(f"# explain -> {path}")
        times = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{args.tag}:{name}:{i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.time() - t0)
        print(
            f"{name}: min={min(times):.3f} "
            f"all={[round(t, 3) for t in times]}"
        )


if __name__ == "__main__":
    main()
