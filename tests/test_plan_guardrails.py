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

Streaming-tagged queries are skipped: their returned frame is a
memory-sink scan; their per-batch plans exercise the same operators
covered here.
"""

from __future__ import annotations

import os

import pytest

from cdc_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"

# Bounded at every scale factor (TPC-H fixed-cardinality dims).
BOUNDED_DIMS = {"nation.parquet", "region.parquet"}


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
    """Aggregate grouped solely by SPARK_PARTITION_ID-derived keys:
    output rows ≤ partition count (the operators/ordering.py offsets
    pattern), bounded at any data scale."""
    for n in _walk(subtree):
        if "AggregateExec" in _cls(n):
            ge = n.groupingExpressions()
            if ge.isEmpty():
                continue
            names = [ge.apply(i).name() for i in range(ge.size())]
            below = n.child().toString()
            if all(
                f"SPARK_PARTITION_ID() AS {name}#" in below
                for name in names
            ):
                return True
    return False


def _broadcast_subtree_bounded(exchange) -> bool:
    if _has_ungrouped_agg(exchange) or _has_partition_id_agg(exchange):
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
