"""Incremental view maintenance (cdc_spark/cdc/ivm.py): the delta-fold
must be *exactly* equal to a full recompute of the aggregate — counts
as longs, sums in the split-long fixed-point representation — under
inserts, updates (including group migration), and deletes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_spark.cdc.ivm import (
    agg_delta,
    base_agg,
    delta_groups_reagg,
    finish_agg,
    merge_agg,
)
from cdc_spark.cdc.merge import apply_changes

KEYS = ["k"]
GCOLS = ["grp"]
PAYLOAD = ["grp", "v"]
SCHEMA = "op string, lsn long, k long, grp string, v double"


def _measures():
    return {"sum_v": F.col("v")}


def _rows(df):
    return sorted(
        (r["grp"], r["n_rows"], round(r["sum_v"], 6))
        for r in df.collect()
    )


def _full(state):
    return _rows(
        finish_agg(
            base_agg(state, GCOLS, _measures()), GCOLS, ["sum_v"]
        )
    )


def _ivm(base_state, batch):
    agg0 = base_agg(base_state, GCOLS, _measures())
    touched = batch.select(*KEYS).distinct()
    pre = base_state.join(touched, on=KEYS, how="left_semi")
    post = apply_changes(pre, batch, KEYS, PAYLOAD)
    delta = agg_delta(pre, post, GCOLS, _measures())
    return _rows(
        finish_agg(merge_agg(agg0, delta, GCOLS), GCOLS, ["sum_v"])
    )


@pytest.fixture(scope="module")
def base(spark):
    head = spark.createDataFrame(
        [
            ("c", 1, 1, "a", 10.5),
            ("c", 2, 2, "a", 20.25),
            ("c", 3, 3, "b", 1.0),
            ("c", 4, 4, "b", 2.0),
            ("u", 5, 1, "a", 11.5),
        ],
        SCHEMA,
    )
    return apply_changes(None, head, KEYS, PAYLOAD)


def test_insert_update_delete_matches_full_recompute(spark, base):
    batch = spark.createDataFrame(
        [
            ("c", 10, 5, "c", 100.0),  # new key, new group
            ("u", 11, 2, "a", 21.0),  # in-place update
            ("d", 12, 3, None, None),  # delete from group b
        ],
        SCHEMA,
    )
    expect = _full(apply_changes(base, batch, KEYS, PAYLOAD))
    assert _ivm(base, batch) == expect
    assert len(expect) == 3  # a, b, c


def test_group_migration_moves_contribution(spark, base):
    # key 4 moves b -> a: delta must decrement b AND increment a
    batch = spark.createDataFrame([("u", 10, 4, "a", 2.0)], SCHEMA)
    expect = _full(apply_changes(base, batch, KEYS, PAYLOAD))
    got = _ivm(base, batch)
    assert got == expect
    assert dict((g, n) for g, n, _ in got) == {"a": 3, "b": 1}


def test_group_vanishes_when_count_hits_zero(spark, base):
    batch = spark.createDataFrame(
        [("d", 10, 3, None, None), ("d", 11, 4, None, None)],
        SCHEMA,
    )
    got = _ivm(base, batch)
    assert got == _full(apply_changes(base, batch, KEYS, PAYLOAD))
    assert [g for g, _, _ in got] == ["a"]  # group b has no row at all


def test_delete_then_reinsert_within_batch(spark, base):
    batch = spark.createDataFrame(
        [("d", 10, 1, None, None), ("c", 11, 1, "b", 5.0)],
        SCHEMA,
    )
    assert _ivm(base, batch) == _full(
        apply_changes(base, batch, KEYS, PAYLOAD)
    )


def test_empty_batch_is_identity(spark, base):
    batch = spark.createDataFrame([], SCHEMA)
    assert _ivm(base, batch) == _full(base)


def test_exactness_no_float_drift(spark):
    # 0.1 is inexact in binary; 1000 adds + 999 removes must land on
    # exactly one contribution, not 1000*0.1 - 999*0.1 in doubles.
    head = spark.createDataFrame(
        [("c", i, i, "g", 0.1) for i in range(1, 1001)], SCHEMA
    )
    state = apply_changes(None, head, KEYS, PAYLOAD)
    batch = spark.createDataFrame(
        [("d", 2000 + i, i, None, None) for i in range(1, 1000)], SCHEMA
    )
    got = _ivm(state, batch)
    assert got == [("g", 1, 0.1)]


def test_min_max_reagg_of_touched_groups(spark, base):
    batch = spark.createDataFrame(
        [("d", 10, 1, None, None), ("u", 11, 2, "a", 7.0)], SCHEMA
    )
    new_state = apply_changes(base, batch, KEYS, PAYLOAD)
    touched_groups = spark.createDataFrame([("a",)], "grp string")
    got = delta_groups_reagg(
        new_state,
        touched_groups,
        GCOLS,
        [F.min("v").alias("min_v"), F.max("v").alias("max_v")],
    ).collect()
    assert [(r["grp"], r["min_v"], r["max_v"]) for r in got] == [
        ("a", 7.0, 7.0)
    ]
