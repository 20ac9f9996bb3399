"""One-off sf0.1 -> sf1 scaling probe (round-9 VERDICT item 3).

Runs the scale-critical families at sf0.1 and sf1 (10x data, generated
by tools/gen_scale.py) in ONE warm session with the bench.py protocol
(noop-format write, min-of-N), and reports the wall-clock ratio per
entry. With 10x data, linear scaling means ratio <= ~10 for scan-bound
entries (fixed-overhead-dominated ones sit far below); anything much
above ~20 (super-linear by >2x) is a red flag that a plan shape does
not survive scale-up.

Usage:
    python tools/scale_probe.py [--sf1 /root/repo/.scale/sf1]
                                [--out BENCH_sf1.json] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_spark.queries import REGISTRY  # noqa: E402
from cdc_spark.session import get_spark  # noqa: E402

ENTRIES = [
    # controls (fixed plans, scan-bound)
    "q01_pricing_summary",
    "q03_shipping_priority",
    # distributed-ordering family (two-pass range decompositions)
    "q39_rank_functions",
    "dp05_curriculum_order",
    "mm05_interleaved_packing",
    "dp03_concat_chunk_plan",
    "q98_quantile_binning",
    # mergeable-sketch family (fixed-size summaries)
    "q99_kmv_distinct",
    "q106_mergeable_quantile_sketch",
    "q107_stratified_sample_quantiles",
    "q110_cms_join_cardinality",
    "q112_cms_heavy_hitters",
    # ANN / dedup (pruned probes, banded joins)
    "ss15_pq_adc_topk",
    "ss17_ivfpq_index",
    "ss23_filtered_ivfpq_probe",
    "dd03_minhash_lsh",
    "dd12_semantic_dedup",
    "dd13_incremental_dedup",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/root/repo/.scale/sf1")
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="BENCH_sf1.json")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import bench as B

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # warm codegen/JIT at the smallest SF
    for name in ENTRIES:
        try:
            REGISTRY[name].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass

    def run(name: str, sf_dir: str) -> float:
        best = None
        for _ in range(args.reps):
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    result: dict[str, dict[str, float]] = {}
    for name in ENTRIES:
        t01 = run(name, args.sf01)
        t1 = run(name, args.sf1)
        result[name] = {
            "sf0.1_sec": t01,
            "sf1_sec": t1,
            "ratio": round(t1 / t01, 2) if t01 > 0 else None,
        }
        print(f"{name}: {t01}s -> {t1}s  (x{result[name]['ratio']})")

    # CDC apply / IVM benches: cost must track the BATCH, not state
    # size, so the sf1 number should stay near the sf0.1 number
    for key, fn in (
        ("cdc_incr_apply_small_batch", B.bench_incremental_apply),
        ("ivm_agg_maintenance_small_batch", B.bench_ivm_maintenance),
        ("cdc_skewed_hot_key_apply", B.bench_skewed_hot_key_apply),
        ("ivf_sized_probe_serving", B.bench_ivf_sized_probe),
    ):
        t01 = fn(spark, args.sf01)
        t1 = fn(spark, args.sf1)
        result[key] = {
            "sf0.1_sec": t01,
            "sf1_sec": t1,
            "ratio": round(t1 / t01, 2) if t01 > 0 else None,
        }
        print(f"{key}: {t01}s -> {t1}s  (x{result[key]['ratio']})")

    worst = max(
        (v["ratio"] for v in result.values() if v["ratio"]), default=None
    )
    payload = {
        "metric": "sf1_scaling_probe",
        "data_factor": 10,
        "worst_ratio": worst,
        "entries": result,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"worst_ratio": worst, "out": args.out}))


if __name__ == "__main__":
    main()
