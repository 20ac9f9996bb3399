from __future__ import annotations

from cdc_spark.cdc.merge import scd2_history


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "op string, lsn long, id long, name string"
    )


def test_scd2_intervals_and_current(spark):
    ch = _changes(
        spark,
        [
            ("c", 1, 1, "a"),
            ("u", 3, 1, "b"),
            ("u", 7, 1, "c"),
            ("c", 2, 2, "x"),
            ("d", 5, 2, None),
            ("c", 4, 3, "m"),
        ],
    )
    hist = scd2_history(ch, ["id"], ["name"])
    rows = {(r.id, r.valid_from): r for r in hist.collect()}
    assert len(rows) == 5  # delete closes but emits no row
    assert rows[(1, 1)].valid_to == 3 and rows[(1, 1)].is_current == 0
    assert rows[(1, 3)].valid_to == 7
    assert rows[(1, 7)].valid_to is None and rows[(1, 7)].is_current == 1
    # deleted key: last version closed by the tombstone, nothing current
    assert rows[(2, 2)].valid_to == 5 and rows[(2, 2)].is_current == 0
    assert rows[(3, 4)].is_current == 1


def test_scd2_matches_latest_wins_merge(spark):
    """The is_current slice of SCD2 must equal apply_changes state."""
    from cdc_spark.cdc.merge import apply_changes

    import random

    rng = random.Random(7)
    rows = []
    for lsn in range(1, 301):
        k = rng.randrange(20)
        op = rng.choice(["c", "u", "u", "d"])
        rows.append((op, lsn, k, None if op == "d" else f"v{lsn}"))
    ch = _changes(spark, rows)
    cur = {
        (r.id, r.name)
        for r in scd2_history(ch, ["id"], ["name"])
        .where("is_current = 1")
        .collect()
    }
    merged = {
        (r.id, r.name)
        for r in apply_changes(None, ch, ["id"], ["name"]).collect()
    }
    assert cur == merged
