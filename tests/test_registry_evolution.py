"""Schema evolution: the migrations 001→002 scenario (SURVEY.md §3.2).

A live `users` table gains `phone_number TEXT NOT NULL DEFAULT ''`
mid-stream; a fresh Relation announcement replaces the catalog entry
and later events decode against the new column list, while the
widest-schema view null-backfills old events.
"""

from __future__ import annotations

import json

import pytest

from cdc_spark.cdc.envelope import parse_wal2json
from cdc_spark.cdc.merge import apply_changes
from cdc_spark.cdc.registry import SchemaRegistry

V1_COLS = [
    ("id", "integer", True),
    ("firstname", "text"),
    ("lastname", "text"),
]
V2_COLS = V1_COLS + [("phone_number", "text")]


def _doc(kind, names, values, keys=None):
    c = {"kind": kind, "schema": "public", "table": "users"}
    if names:
        c["columnnames"] = names
        c["columntypes"] = ["integer"] + ["text"] * (len(names) - 1)
        c["columnvalues"] = values
    if keys:
        c["oldkeys"] = {
            "keynames": ["id"],
            "keytypes": ["integer"],
            "keyvalues": keys,
        }
    return json.dumps({"change": [c]})


def test_evolution_replay(spark):
    reg = SchemaRegistry()
    reg.announce("public", "users", V1_COLS)

    docs_v1 = [
        _doc("insert", ["id", "firstname", "lastname"], [1, "Johny", "Rambo"]),
    ]
    # ALTER TABLE … ADD COLUMN phone_number → new Relation announcement
    reg.announce("public", "users", V2_COLS)
    docs_v2 = [
        _doc(
            "insert",
            ["id", "firstname", "lastname", "phone_number"],
            [2, "Jane", "Doe", "555-0100"],
        ),
        _doc(
            "update",
            ["id", "firstname", "lastname", "phone_number"],
            [1, "Johny", "Kowalski", "555-0199"],
            keys=[1],
        ),
    ]
    raw = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs_v1 + docs_v2)], "seq long, value string"
    )
    typed = reg.materialize(parse_wal2json(raw, lsn_col="seq"), "public", "users")
    # widest schema includes phone_number; v1 rows null-backfilled
    assert "phone_number" in typed.columns

    state = apply_changes(
        None, typed, ["id"], ["firstname", "lastname", "phone_number"]
    )
    rows = {r.id: r for r in state.collect()}
    assert rows[1].lastname == "Kowalski"
    assert rows[1].phone_number == "555-0199"
    assert rows[2].phone_number == "555-0100"


def test_registry_versions_and_widest():
    reg = SchemaRegistry()
    reg.announce("public", "users", V1_COLS)
    v2 = reg.announce("public", "users", V2_COLS)
    assert v2.version == 2
    assert reg.current("public", "users").columns[-1].name == "phone_number"

    # drop column (down migration): current shrinks, widest still has it
    reg.announce("public", "users", V1_COLS)
    assert len(reg.current("public", "users").columns) == 3
    assert any(
        c.name == "phone_number" for c in reg.widest("public", "users").columns
    )


def test_unknown_table_raises_like_reference():
    # row event before Relation message is an error (main.go:447-450)
    reg = SchemaRegistry()
    with pytest.raises(KeyError):
        reg.current("public", "ghosts")
