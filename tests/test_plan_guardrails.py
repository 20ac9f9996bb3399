"""Physical-plan guardrails over the whole query inventory.

Locks in the scale discipline the engine is built around: with
auto-broadcast disabled and AQE off, whatever broadcast/cartesian
shapes remain in a plan were FORCED by the code — so every one must
be provably bounded:

- no ``CartesianProductExec`` anywhere;
- no row-at-a-time Python eval (``BatchEvalPythonExec``) — Python
  reaches plans only through Arrow (``ArrowEvalPython``,
  ``MapInPandas``, ``FlatMapGroupsInPandas``);
- every ``BroadcastExchangeExec`` subtree is bounded: it contains an
  ungrouped (global, therefore 1-row) aggregate, or every file scan
  under it reads a bounded dim (``nation`` = 25 rows, ``region`` = 5
  at every scale factor);
- every ``BroadcastNestedLoopJoinExec`` is one of the deliberate
  1-row cross joins (build side holds an ungrouped aggregate — the
  ``merge.py`` t_agg / ``text_queries.py`` corpus-scalar pattern), so
  it degenerates to a map-side scalar attach, never an O(n·m) loop;
- no unpartitioned window over raw data: every ``WindowExec`` /
  ``WindowGroupLimitExec`` with an empty partitionSpec must sit over
  an aggregate (the two-pass prefix-sum offsets pattern of
  ``operators/ordering.py`` — input bounded by partition/block/group
  count, not by data) — a global window straight over a table scan is
  THE single-reducer shape that cannot survive 100 TB.

Streaming-tagged queries can't be linted through their returned frame
(a memory-sink scan), so they get their own audit: every SQL execution
a streaming entry triggers — micro-batch plans AND foreachBatch-body
actions — lands in the UI status store with a formatted plan
description, and ``test_streaming_plan_guardrails`` parses those for
the same no-unpartitioned-window-over-data rule (an unpartitioned
``Window`` detail has two top-level bracket groups, a partitioned one
three; ``WindowGroupLimit`` leads with its partitionSpec group).
"""

from __future__ import annotations

import os

import pytest

from cdc_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"

# Bounded at every scale factor (TPC-H fixed-cardinality dims).
BOUNDED_DIMS = {
    "nation.parquet",
    "region.parquet",
    # io24's materialized month dimension: one row per distinct calendar
    # month of the fact's date range (~#months at ANY fact size), written
    # to parquet only so yr_tag reaches the planner opaque for the DPP
    # proof — bounded by construction, so its forced broadcast is sound
    "dim_ym_calendar",
}


def _walk(node):
    yield node
    # ReusedExchangeExec is a leaf whose `child` points at the original
    # exchange subtree — follow it, or a reused 1-row-aggregate
    # broadcast looks like an unbounded build side
    if _cls(node) == "ReusedExchangeExec":
        yield from _walk(node.child())
        return
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _scan_files(subtree) -> list[str]:
    out = []
    for n in _walk(subtree):
        if _cls(n) == "FileSourceScanExec":
            path = n.relation().location().rootPaths().head().toString()
            out.append(os.path.basename(path.rstrip("/")))
    return out


def _has_ungrouped_agg(subtree) -> bool:
    for n in _walk(subtree):
        if "AggregateExec" in _cls(n) and n.groupingExpressions().isEmpty():
            return True
    return False


def _has_any_agg(subtree) -> bool:
    """Any aggregate (grouped or not) below: a global window over an
    aggregate's output is bounded by group count, not data rows."""
    return any("AggregateExec" in _cls(n) for n in _walk(subtree))


def _has_partition_id_agg(subtree) -> bool:
    """Aggregate whose grouping keys include a SPARK_PARTITION_ID-
    derived key (the operators/ordering.py offsets pattern). Grouped
    solely by pid the output is ≤ partition count; with extra group
    keys (grouped_prefix_sum's (pid, group) offsets) range-partition
    CONTIGUITY bounds distinct combos at partitions + groups − 1 —
    offsets-table-sized, never data-sized."""
    for n in _walk(subtree):
        if "AggregateExec" in _cls(n):
            ge = n.groupingExpressions()
            if ge.isEmpty():
                continue
            names = [ge.apply(i).name() for i in range(ge.size())]
            below = n.child().toString()
            if any(
                f"SPARK_PARTITION_ID() AS {name}#" in below
                for name in names
            ):
                return True
    return False


def _has_limit(subtree) -> bool:
    """A GlobalLimit / TakeOrderedAndProject bounds its output at the
    literal limit regardless of input size (ss20's broadcast top-k
    candidate shortlist)."""
    return any(
        _cls(n) in ("GlobalLimitExec", "TakeOrderedAndProjectExec")
        for n in _walk(subtree)
    )


def _broadcast_subtree_bounded(exchange) -> bool:
    if _has_ungrouped_agg(exchange) or _has_partition_id_agg(exchange):
        return True
    if _has_limit(exchange):
        return True
    scans = _scan_files(exchange)
    return all(s in BOUNDED_DIMS for s in scans)


# Documented single-reducer exceptions: queries whose GLOBAL window is
# the semantics, not an accident. cdc10 decodes ONE replication slot's
# binary stream — a total order by definition; parse_pgoutput_binary
# itself raises/warns on multi-partition input and takes a
# partition_col for fan-out transports (cdc/pgoutput_wire.py).
_GLOBAL_WINDOW_OK = {"cdc10_pgoutput_binary"}


_BATCH_QUERIES = sorted(
    name for name, spec in REGISTRY.items() if "streaming" not in spec.tags
)


@pytest.fixture(scope="module")
def guard_spark(spark):
    """Session with auto-broadcast + AQE off: surviving broadcasts are
    code-forced, not stats-chosen."""
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.enabled": spark.conf.get(
            "spark.sql.adaptive.enabled"
        ),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    for k, v in saved.items():
        spark.conf.set(k, v)


# --- streaming audit ---------------------------------------------------

import re

_STREAMING_QUERIES = sorted(
    name for name, spec in REGISTRY.items() if "streaming" in spec.tags
)

# cdc20 runs cdc10's single-replication-slot binary decode under
# streaming: ONE slot's wire bytes are a total order by definition
# (same documented contract as cdc10 above; parse_pgoutput_binary
# takes a partition_col for fan-out transports).
_STREAMING_GLOBAL_WINDOW_OK = {"cdc20_streaming_binary_wire"}

_TREE_LINE = re.compile(
    r"^[\s|:+*-]*([A-Za-z][A-Za-z0-9_]*)[^()]*\((\d+)\)\s*$"
)


def _bracket_groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups of a formatted Arguments line."""
    out, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                out.append(s[start + 1 : i])
    return out


def _audit_streaming_description(desc: str) -> list[str]:
    """Unpartitioned-window-over-data findings in one formatted plan
    description from the SQL status store."""
    # tree: (depth, name, node id) from indentation
    tree = []
    for line in desc.splitlines():
        m = _TREE_LINE.match(line)
        if m:
            tree.append((m.start(1), m.group(1), int(m.group(2))))
    # detail sections: node id -> first Arguments line
    args = {}
    for m in re.finditer(
        r"^\((\d+)\) ([A-Za-z][A-Za-z0-9_]*).*?^Arguments: (.*?)$",
        desc,
        re.S | re.M,
    ):
        args[int(m.group(1))] = (m.group(2), m.group(3))
    problems = []
    for i, (depth, name, nid) in enumerate(tree):
        if name not in ("Window", "WindowGroupLimit"):
            continue
        detail = args.get(nid)
        if detail is None:
            continue
        groups = _bracket_groups(detail[1])
        if name == "Window":
            # [exprs], [partitionSpec], [orderSpec] — but either spec
            # may be absent: with two groups the second is the ORDER
            # spec (ASC/DESC markers) only for an unpartitioned window
            if len(groups) >= 3:
                unpartitioned = False
            elif len(groups) == 2:
                unpartitioned = (
                    " ASC" in groups[1] or " DESC" in groups[1]
                )
            else:
                unpartitioned = True
        else:  # WindowGroupLimit: leads with its partitionSpec group
            unpartitioned = bool(groups) and groups[0].strip() == ""
        if not unpartitioned:
            continue
        # bounded if ANY descendant in the tree is an aggregate (the
        # ordering.py offsets pattern: input rows = group count);
        # descendants end at the first node back at <= our depth
        over_agg = False
        for ddepth, dname, _ in tree[i + 1 :]:
            if ddepth <= depth:
                break
            if "Aggregate" in dname:
                over_agg = True
        if not over_agg:
            problems.append(
                f"unpartitioned {name} over non-aggregated input "
                "in a streaming execution (single-reducer shape)"
            )
    return problems


def _run_and_collect_descriptions(spark, fn) -> list[str]:
    store = spark._jsparkSession.sharedState().statusStore()

    def _ids():
        lst = store.executionsList()
        return {
            lst.apply(i).executionId(): lst.apply(i)
            for i in range(lst.size())
        }

    before = set(_ids())
    fn()
    return [
        e.physicalPlanDescription()
        for eid, e in _ids().items()
        if eid not in before
    ]


@pytest.mark.parametrize("name", _STREAMING_QUERIES)
def test_streaming_plan_guardrails(guard_spark, name):
    descs = _run_and_collect_descriptions(
        guard_spark, lambda: REGISTRY[name].fn(guard_spark, SF).count()
    )
    assert descs, "streaming query produced no SQL executions to audit"
    if name in _STREAMING_GLOBAL_WINDOW_OK:
        pytest.skip("documented single-slot total-order exception")
    problems = [p for d in descs for p in _audit_streaming_description(d)]
    assert not problems, f"{name}: {'; '.join(problems)}"


def test_streaming_audit_catches_global_window(guard_spark, tmp_path):
    """The audit itself must go red on the shape it polices: a
    foreachBatch body running an unpartitioned window over raw rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("1\n2\n3\n")

    def body(bdf, _bid):
        bdf.withColumn(
            "rn", F.row_number().over(Window.orderBy("value"))
        ).write.format("noop").mode("overwrite").save()

    def run():
        q = (
            guard_spark.readStream.format("text")
            .schema("value string")
            .load(str(src))
            .writeStream.foreachBatch(body)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    descs = _run_and_collect_descriptions(guard_spark, run)
    problems = [p for d in descs for p in _audit_streaming_description(d)]
    assert problems, "audit failed to flag a global window in foreachBatch"


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_plan_guardrails(guard_spark, name):
    df = REGISTRY[name].fn(guard_spark, SF)
    plan = df._jdf.queryExecution().executedPlan()
    problems = []
    for node in _walk(plan):
        cls = _cls(node)
        if cls == "CartesianProductExec":
            problems.append("CartesianProduct in plan")
        elif "BatchEvalPython" in cls:
            problems.append("row-at-a-time Python eval (non-Arrow UDF)")
        elif cls == "BroadcastNestedLoopJoinExec":
            if not _has_ungrouped_agg(node):
                problems.append(
                    "BroadcastNestedLoopJoin without a 1-row aggregate "
                    "build side (unbounded nested loop)"
                )
        elif cls == "BroadcastExchangeExec":
            if not _broadcast_subtree_bounded(node):
                problems.append(
                    "forced broadcast of an unbounded subtree (scans: "
                    f"{_scan_files(node)})"
                )
        elif cls in ("WindowExec", "WindowGroupLimitExec"):
            if (
                name not in _GLOBAL_WINDOW_OK
                and node.partitionSpec().isEmpty()
                and not _has_any_agg(node.children().apply(0))
            ):
                problems.append(
                    f"unpartitioned {cls} over non-aggregated input "
                    "(single-reducer global window — use "
                    "operators/ordering.py's two-pass decomposition)"
                )
    assert not problems, f"{name}: {'; '.join(problems)}"
