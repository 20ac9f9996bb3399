"""Bench capture contract (r11 verdict item 5).

The driver records ``bench.py``'s stdout with a bounded capture
buffer; round 10's artifact parsed as ``null`` because the JSON line
outgrew it (inlined derivable values + console progress bars).
Round 11 fixed the instance; these tests pin the CLASS: the line is
built by one formatter, and any future headline growth or format
change that would overflow the budget fails here, in-repo, before a
driver round discovers it.
"""

from __future__ import annotations

import json

import bench


def _synthetic_timings() -> dict[str, float]:
    # worst realistic widths: three-digit seconds with full precision
    t = {name: 999.999 for name in bench.HEADLINE}
    t["cdc_incr_apply_small_batch"] = 999.999
    t["ivm_agg_maintenance_small_batch"] = 999.999
    t["cdc_skewed_hot_key_apply"] = 999.999
    t["skew_join_plain_hot"] = 999.999
    t["skew_join_salted_hot"] = 999.999
    t["ivf_sized_probe_serving"] = 999.999
    t["control_overhead_10jobs"] = 999.999
    return t


def test_bench_line_is_single_and_round_trips():
    line = bench.format_bench_line(_synthetic_timings(), "/x/sf0.1")
    assert "\n" not in line and "\r" not in line
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_runtime"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    # the overhead control is a box meta-measurement: reported as
    # control_overhead_mean (per-job), excluded from queries/value
    expected = _synthetic_timings()
    overhead = expected.pop("control_overhead_10jobs")
    assert set(parsed["queries"]) == set(expected)
    assert parsed["control_mean"] == 999.999
    assert parsed["control_overhead_mean"] == round(
        overhead / bench.OVERHEAD_JOBS, 4
    )
    # value = sum of the synthetic timings (rounded)
    assert parsed["value"] == round(sum(expected.values()), 3)


def test_bench_line_fits_capture_budget_with_margin():
    """Budget with 25% headroom: the driver's capture must see the
    closing brace even if a stray WARN line shares the buffer."""
    line = bench.format_bench_line(_synthetic_timings(), "/x/sf0.1")
    assert len(line) < bench.LINE_BUDGET * 0.75, (
        f"bench line {len(line)}B is within 25% of the "
        f"{bench.LINE_BUDGET}B capture budget — trim the headline "
        "or stop inlining derivable values"
    )


def test_headline_covers_streaming_and_is_registered():
    """r11 verdict item 6: the per-round sf0.1 headline must carry at
    least one streaming-engine entry so streaming regressions show in
    round-over-round deltas, and every headline name must resolve."""
    from cdc_spark.queries import REGISTRY

    assert any(n.startswith("st") for n in bench.HEADLINE)
    for n in bench.HEADLINE:
        assert n in REGISTRY, n
    for c in bench.CONTROLS:
        assert c in bench.HEADLINE
