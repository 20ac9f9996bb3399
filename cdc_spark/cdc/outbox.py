"""Outbox routing — deck slides 38-40.

The outbox pattern: services write domain rows + an outbox row in one
transaction; CDC streams the outbox table and routes each event to a
topic by aggregate type (slide 40 shows "User Events" / "Notification
Events" fan-out). Routing is a projection — a column expression, no
shuffle; fan-out is either Kafka's ``topic`` column convention or a
per-route filtered write in foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def route_outbox(
    outbox: DataFrame,
    type_col: str,
    routes: dict[str, str],
    *,
    default_topic: str = "events.dead_letter",
    topic_col: str = "topic",
) -> DataFrame:
    """Attach the destination topic per row (aggregatetype → topic)."""
    expr: Column = F.lit(default_topic)
    # Build WHEN chain in deterministic (sorted) order.
    out = None
    for agg_type, topic in sorted(routes.items()):
        cond = F.col(type_col) == agg_type
        out = F.when(cond, topic) if out is None else out.when(cond, topic)
    expr = out.otherwise(default_topic) if out is not None else expr
    return outbox.withColumn(topic_col, expr)


def fan_out(routed: DataFrame, topic_col: str = "topic") -> dict[str, DataFrame]:
    """Split a routed frame into one DataFrame per destination topic.

    Driver-side metadata only (the distinct topic set is small and
    bounded by the route table); each branch stays a lazy plan over
    the shared source, so multi-sink fan-out (deck slides 36-37) can
    start N writers off one scan.
    """
    topics = [r[0] for r in routed.select(topic_col).distinct().collect()]
    return {
        t: routed.where(F.col(topic_col) == t).drop(topic_col) for t in sorted(topics)
    }
