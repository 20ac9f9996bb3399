from __future__ import annotations

from pyspark.sql import functions as F

from cdc_spark.cdc.merge import apply_changes
from cdc_spark.cdc.outbox import fan_out, route_outbox
from cdc_spark.cdc.snapshot import snapshot_diff

STATE = "id int, name string, bal double"


def test_snapshot_diff_emits_cud(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], STATE
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c2", 3.0), (4, "d", 4.0)], STATE
    )
    diff = {r.id: r.op for r in snapshot_diff(old, new, ["id"]).collect()}
    assert diff == {1: "d", 3: "u", 4: "c"}


def test_snapshot_diff_null_safe_compare(spark):
    old = spark.createDataFrame([(1, None, 1.0)], STATE)
    new = spark.createDataFrame([(1, None, 1.0)], STATE)
    assert snapshot_diff(old, new, ["id"]).count() == 0  # null == null


def test_snapshot_diff_feeds_merge(spark):
    """polling-CDC reconciliation: old + diff ⇒ new (slide 9 / slide 48)."""
    old = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], STATE)
    new = spark.createDataFrame([(2, "b2", 2.5), (5, "e", 5.0)], STATE)
    diff = snapshot_diff(old, new, ["id"]).withColumn(
        "lsn", F.monotonically_increasing_id()
    )
    rebuilt = apply_changes(old, diff, ["id"], ["name", "bal"])
    assert {
        (r.id, r.name, r.bal) for r in rebuilt.collect()
    } == {(2, "b2", 2.5), (5, "e", 5.0)}


def test_outbox_routing(spark):
    outbox = spark.createDataFrame(
        [
            (1, "user", '{"id": 1}'),
            (2, "notification", '{"id": 2}'),
            (3, "unknown_agg", '{"id": 3}'),
        ],
        "event_id int, aggregatetype string, payload string",
    )
    routed = route_outbox(
        outbox,
        "aggregatetype",
        {"user": "user.events", "notification": "notification.events"},
    )
    by_id = {r.event_id: r.topic for r in routed.collect()}
    assert by_id == {
        1: "user.events",
        2: "notification.events",
        3: "events.dead_letter",
    }
    split = fan_out(routed)
    assert set(split) == {"user.events", "notification.events", "events.dead_letter"}
    assert split["user.events"].count() == 1


def test_snapshot_diff_null_keys_still_diff(spark):
    old = spark.createDataFrame([(None, "gone", 1.0), (1, "a", 1.0)], STATE)
    new = spark.createDataFrame([(1, "a", 1.0), (None, "fresh", 2.0)], STATE)
    ops = sorted(
        (r.op, r.name) for r in snapshot_diff(old, new, ["id"]).collect()
    )
    # the null-keyed old row diffs as an update (matched null-safely)
    assert ops == [("u", "fresh")]
