"""Merge/apply semantics: golden replay + property-style random DML."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cdc_spark.cdc.merge import apply_changes, latest_by_key
from cdc_spark.cdc.registry import SchemaRegistry

CHANGE_SCHEMA = (
    "op string, lsn long, id int, firstname string, lastname string"
)


def _changes(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _state(spark, rows):
    return spark.createDataFrame(rows, "id int, firstname string, lastname string")


def test_golden_replay_full_story(spark):
    # the reference fixtures' story: insert Rambo → update to Kowalski
    # → delete ⇒ empty table
    ch = _changes(
        spark,
        [
            ("c", 1, 1, "Johny", "Rambo"),
            ("u", 2, 1, "Johny", "Kowalski"),
            ("d", 3, 1, None, None),
        ],
    )
    out = apply_changes(None, ch, ["id"], ["firstname", "lastname"])
    assert out.count() == 0


def test_golden_replay_stops_before_delete(spark):
    ch = _changes(
        spark,
        [
            ("c", 1, 1, "Johny", "Rambo"),
            ("u", 2, 1, "Johny", "Kowalski"),
        ],
    )
    rows = apply_changes(None, ch, ["id"], ["firstname", "lastname"]).collect()
    assert len(rows) == 1
    assert rows[0].lastname == "Kowalski"


def test_out_of_order_arrival_applies_in_lsn_order(spark):
    # arrival order scrambled; lsn order must win
    ch = _changes(
        spark,
        [
            ("u", 2, 1, "Johny", "Kowalski"),
            ("d", 3, 1, None, None),
            ("c", 1, 1, "Johny", "Rambo"),
            ("c", 4, 1, "Johny", "Reborn"),
        ],
    )
    rows = apply_changes(None, ch, ["id"], ["firstname", "lastname"]).collect()
    assert len(rows) == 1
    assert rows[0].lastname == "Reborn"  # re-insert after delete survives


def test_toast_unchanged_column_coalesces_with_base(spark):
    # null in an update = unchanged (pgoutput 'u' flag, main.go:203)
    base = _state(spark, [(1, "Johny", "Rambo")])
    ch = _changes(spark, [("u", 10, 1, None, "Kowalski")])
    rows = apply_changes(base, ch, ["id"], ["firstname", "lastname"]).collect()
    assert rows[0].firstname == "Johny"  # carried from base
    assert rows[0].lastname == "Kowalski"


def test_insert_null_is_genuine_null_not_toast(spark):
    base = _state(spark, [(1, "Johny", "Rambo")])
    ch = _changes(
        spark,
        [
            ("d", 10, 1, None, None),
            ("c", 11, 1, None, "Fresh"),  # re-insert with genuinely-null firstname
        ],
    )
    rows = apply_changes(base, ch, ["id"], ["firstname", "lastname"]).collect()
    assert len(rows) == 1
    assert rows[0].firstname is None  # must NOT leak 'Johny' from base
    assert rows[0].lastname == "Fresh"


def test_multiple_updates_fold_per_column(spark):
    base = _state(spark, [(1, "A", "B")])
    ch = _changes(
        spark,
        [
            ("u", 1, 1, "X", None),   # firstname changed, lastname unchanged
            ("u", 2, 1, None, "Y"),   # lastname changed, firstname unchanged
        ],
    )
    rows = apply_changes(base, ch, ["id"], ["firstname", "lastname"]).collect()
    assert rows[0].firstname == "X" and rows[0].lastname == "Y"


def test_truncate_wipes_then_applies_later_changes(spark):
    # parsed-but-dropped in the reference (main.go:393-398 vs 115-130);
    # we implement the parsed semantics
    base = _state(spark, [(1, "Old", "Row"), (2, "Other", "Row")])
    ch = _changes(
        spark,
        [
            ("u", 5, 1, "Pre", "Trunc"),   # before the truncate: lost
            ("t", 10, None, None, None),
            ("c", 11, 3, "Post", "Trunc"),  # after: survives
        ],
    )
    rows = apply_changes(base, ch, ["id"], ["firstname", "lastname"]).collect()
    assert {(r.id, r.firstname) for r in rows} == {(3, "Post")}


def test_untouched_base_rows_carry_over(spark):
    base = _state(spark, [(1, "A", "A"), (2, "B", "B")])
    ch = _changes(spark, [("u", 1, 2, "B2", None)])
    rows = {
        r.id: r
        for r in apply_changes(
            base, ch, ["id"], ["firstname", "lastname"]
        ).collect()
    }
    assert rows[1].firstname == "A"
    assert rows[2].firstname == "B2"
    assert rows[2].lastname == "B"


def test_snapshot_read_op_behaves_as_insert(spark):
    ch = _changes(spark, [("r", 1, 7, "Snap", "Shot")])
    rows = apply_changes(None, ch, ["id"], ["firstname", "lastname"]).collect()
    assert rows[0].firstname == "Snap"


def test_latest_by_key_compaction(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k int, lsn long, v string"
    )
    rows = {r.k: r.v for r in latest_by_key(df, ["k"]).collect()}
    assert rows == {1: "b", 2: "c"}


def test_property_random_dml_matches_dict_simulation(spark):
    """merge(events(T)) == T for random DML over the users schema
    (SURVEY.md §5.2 item 4)."""
    rng = random.Random(42)
    ids = list(range(12))
    ops = []
    alive: dict[int, dict] = {}
    lsn = 0
    for _ in range(300):
        lsn += 1
        i = rng.choice(ids)
        kind = rng.choice(["c", "u", "d"])
        if kind == "c":
            fn, ln = f"fn{lsn}", f"ln{lsn}"
            alive[i] = {"firstname": fn, "lastname": ln}
            ops.append(("c", lsn, i, fn, ln))
        elif kind == "u":
            if i not in alive:
                continue
            # 30%: TOAST-style unchanged firstname
            fn = None if rng.random() < 0.3 else f"fn{lsn}"
            ln = f"ln{lsn}"
            if fn is not None:
                alive[i]["firstname"] = fn
            alive[i]["lastname"] = ln
            ops.append(("u", lsn, i, fn, ln))
        else:
            if i not in alive:
                continue
            del alive[i]
            ops.append(("d", lsn, i, None, None))

    rng.shuffle(ops)  # arrival order ≠ lsn order
    ch = _changes(spark, ops)
    result = {
        r.id: (r.firstname, r.lastname)
        for r in apply_changes(
            None, ch, ["id"], ["firstname", "lastname"]
        ).collect()
    }
    expected = {
        i: (v["firstname"], v["lastname"]) for i, v in alive.items()
    }
    assert result == expected


def test_merge_from_parsed_wal2json_end_to_end(spark):
    """events → parse → registry decode → merge: the §7 minimum slice."""
    from tests.test_envelope import DELETE_DOC, INSERT_DOC, UPDATE_DOC, _raw

    reg = SchemaRegistry()
    reg.announce(
        "public",
        "users",
        [
            ("id", "integer", True),
            ("firstname", "text"),
            ("lastname", "text"),
            ("created_at", "timestamp without time zone"),
        ],
    )
    from cdc_spark.cdc.envelope import parse_wal2json

    parsed = parse_wal2json(
        _raw(spark, [INSERT_DOC, UPDATE_DOC]), lsn_col="seq"
    )
    typed = reg.materialize(parsed, "public", "users")
    state = apply_changes(
        None,
        typed,
        ["id"],
        ["firstname", "lastname", "created_at"],
    )
    rows = state.collect()
    assert len(rows) == 1
    assert rows[0].lastname == "Kowalski"
    assert rows[0].created_at is not None  # typed timestamp decode

    # now the delete arrives → empty
    parsed_d = parse_wal2json(_raw(spark, [DELETE_DOC]), lsn_col="seq")
    typed_d = reg.materialize(parsed_d, "public", "users")
    state2 = apply_changes(
        state, typed_d, ["id"], ["firstname", "lastname", "created_at"]
    )
    assert state2.count() == 0


def test_asof_forward_and_backward(spark):
    from cdc_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "L1"), (1, 20, "L2")], "k int, lts long, lv string"
    )
    right = spark.createDataFrame(
        [(1, 5, "R5"), (1, 10, "R10"), (1, 15, "R15"), (1, 30, "R30")],
        "k int, rts long, rv string",
    )
    back = {
        r.lv: r.rv_matched
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_payload=["rv"], tiebreak="rv",
        ).collect()
    }
    assert back == {"L1": "R10", "L2": "R15"}  # latest <= left ts

    fwd = {
        r.lv: r.rv_matched
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_payload=["rv"], direction="forward", tiebreak="rv",
        ).collect()
    }
    assert fwd == {"L1": "R10", "L2": "R30"}  # earliest >= left ts

    # exact matches excluded: L1@10 must skip R10
    back_x = {
        r.lv: r.rv_matched
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_payload=["rv"], allow_exact_matches=False, tiebreak="rv",
        ).collect()
    }
    assert back_x == {"L1": "R5", "L2": "R15"}


def test_full_image_insert_nulls_do_not_leak_older_values(spark):
    """an insert/snapshot-read image is COMPLETE: its nulls are real
    nulls, so pre-insert column values must not survive past it."""
    ch = _changes(
        spark,
        [
            ("u", 3, 1, "x", "y"),
            ("r", 5, 1, None, "z"),  # full snapshot image: firstname IS null
        ],
    )
    rows = apply_changes(None, ch, ["id"], ["firstname", "lastname"]).collect()
    assert rows[0].firstname is None
    assert rows[0].lastname == "z"

    # but updates AFTER the insert still fold on top of it
    ch2 = _changes(
        spark,
        [
            ("r", 5, 1, None, "z"),
            ("u", 6, 1, "new", None),  # TOAST: lastname unchanged
        ],
    )
    rows2 = apply_changes(None, ch2, ["id"], ["firstname", "lastname"]).collect()
    assert rows2[0].firstname == "new"
    assert rows2[0].lastname == "z"
