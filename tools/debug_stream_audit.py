"""Debug helper: run one streaming entry, dump flagged window plans."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from cdc_spark.queries import REGISTRY  # noqa: E402
from cdc_spark.session import get_spark  # noqa: E402
from test_plan_guardrails import (  # noqa: E402
    _audit_streaming_description,
    _run_and_collect_descriptions,
)

name = sys.argv[1]
spark = get_spark("streamaudit")
descs = _run_and_collect_descriptions(
    spark, lambda: REGISTRY[name].fn(spark, "/root/testdata/sf0.01").count()
)
print(f"{len(descs)} executions captured")
for d in descs:
    probs = _audit_streaming_description(d)
    if probs:
        print("=== FLAGGED:")
        for line in d.splitlines():
            if "Window" in line or line.startswith("Arguments: ["):
                print("  ", line[:200])
        print()
