"""Envelope parsing against golden-equivalent documents.

The three wal2json documents mirror the reference fixtures'
insert/update/delete story (events/insert.json, update.json,
delete.json): user id=1 'Johny Rambo' inserted, lastname updated to
'Kowalski', then deleted by key only.
"""

from __future__ import annotations

import json

from cdc_spark.cdc.envelope import (
    parse_debezium,
    parse_pgoutput_json,
    parse_wal2json,
)

INSERT_DOC = json.dumps(
    {
        "change": [
            {
                "kind": "insert",
                "schema": "public",
                "table": "users",
                "columnnames": ["id", "firstname", "lastname", "created_at"],
                "columntypes": [
                    "integer",
                    "text",
                    "text",
                    "timestamp without time zone",
                ],
                "columnvalues": [1, "Johny", "Rambo", "2020-09-15 11:58:28.988414"],
            }
        ]
    }
)

UPDATE_DOC = json.dumps(
    {
        "change": [
            {
                "kind": "update",
                "schema": "public",
                "table": "users",
                "columnnames": ["id", "firstname", "lastname", "created_at"],
                "columntypes": [
                    "integer",
                    "text",
                    "text",
                    "timestamp without time zone",
                ],
                "columnvalues": [
                    1,
                    "Johny",
                    "Kowalski",
                    "2020-09-15 11:58:28.988414",
                ],
                "oldkeys": {
                    "keynames": ["id"],
                    "keytypes": ["integer"],
                    "keyvalues": [1],
                },
            }
        ]
    }
)

DELETE_DOC = json.dumps(
    {
        "change": [
            {
                "kind": "delete",
                "schema": "public",
                "table": "users",
                "oldkeys": {
                    "keynames": ["id"],
                    "keytypes": ["integer"],
                    "keyvalues": [1],
                },
            }
        ]
    }
)


def _raw(spark, docs):
    return spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "seq long, value string"
    )


def test_wal2json_golden_replay_parse(spark):
    parsed = parse_wal2json(
        _raw(spark, [INSERT_DOC, UPDATE_DOC, DELETE_DOC]), lsn_col="seq"
    ).orderBy("lsn")
    rows = parsed.collect()
    assert [r.op for r in rows] == ["c", "u", "d"]

    ins, upd, dele = rows
    assert ins.src_schema == "public" and ins.src_table == "users"
    assert ins.after["lastname"] == "Rambo"
    assert ins.after["id"] == "1"  # lexical form, cast happens at decode
    assert ins.key is None
    assert ins.col_types["created_at"] == "timestamp without time zone"

    assert upd.after["lastname"] == "Kowalski"
    assert upd.key == {"id": "1"}

    # delete carries ONLY the key (events/delete.json:7-11)
    assert dele.after is None
    assert dele.key == {"id": "1"}

    # lsn strictly increasing in document order
    assert rows[0].lsn < rows[1].lsn < rows[2].lsn


def test_wal2json_multi_change_transaction(spark):
    doc = json.dumps(
        {
            "change": [
                {
                    "kind": "insert",
                    "schema": "public",
                    "table": "users",
                    "columnnames": ["id", "firstname"],
                    "columntypes": ["integer", "text"],
                    "columnvalues": [2, "Jane"],
                },
                {
                    "kind": "insert",
                    "schema": "public",
                    "table": "users",
                    "columnnames": ["id", "firstname"],
                    "columntypes": ["integer", "text"],
                    "columnvalues": [3, "Joe"],
                },
            ]
        }
    )
    rows = parse_wal2json(_raw(spark, [doc]), lsn_col="seq").orderBy("lsn").collect()
    assert len(rows) == 2
    # statement order within the transaction preserved via lsn
    assert rows[0].after["id"] == "2" and rows[1].after["id"] == "3"
    assert rows[0].lsn < rows[1].lsn


def test_debezium_envelope(spark):
    doc = json.dumps(
        {
            "op": "u",
            "before": {"id": "1", "lastname": "Rambo"},
            "after": {"id": "1", "lastname": "Kowalski"},
            "ts_ms": 1600171108988,
            "source": {
                "schema": "public",
                "table": "users",
                "lsn": 12345,
                "txId": 777,
            },
        }
    )
    row = parse_debezium(_raw(spark, [doc]), key_names=["id"]).collect()[0]
    assert row.op == "u"
    assert row.lsn == 12345 and row.tx_id == 777
    assert row.before["lastname"] == "Rambo"
    assert row.after["lastname"] == "Kowalski"
    assert row.key == {"id": "1"}
    assert row.commit_ts is not None


def test_pgoutput_json_envelope(spark):
    doc = json.dumps(
        {
            "op": "d",
            "schema": "public",
            "table": "users",
            "lsn": 99,
            "tx_id": 5,
            "tx_commit_ts": "2020-09-15 11:58:28.988414",
            "before": {"id": "1"},
        }
    )
    row = parse_pgoutput_json(_raw(spark, [doc])).collect()[0]
    assert row.op == "d"
    assert row.key == {"id": "1"}  # falls back to before-image
    assert row.lsn == 99
    assert row.commit_ts is not None


def test_malformed_document_is_permissive(spark):
    # crash-stop (log.Fatal, main.go:110) upgraded to permissive nulls
    rows = parse_wal2json(_raw(spark, ["{not json"]), lsn_col="seq").collect()
    assert len(rows) == 1
    assert rows[0].op is None


def test_dead_letter_split(spark):
    from cdc_spark.cdc.envelope import split_dead_letter

    raw = _raw(spark, [INSERT_DOC, "{broken", DELETE_DOC])
    parsed = parse_wal2json(raw, lsn_col="seq")
    good, dead = split_dead_letter(parsed)
    assert good.count() == 2
    assert dead.count() == 1


def test_empty_transaction_is_not_dead_letter(spark):
    from cdc_spark.cdc.envelope import split_dead_letter

    raw = _raw(spark, ['{"change": []}', INSERT_DOC])
    parsed = parse_wal2json(raw, lsn_col="seq")
    good, dead = split_dead_letter(parsed)
    assert good.count() == 1  # only the insert; empty txn dropped
    assert dead.count() == 0


def test_dead_letter_rows_keep_lsn(spark):
    from cdc_spark.cdc.envelope import split_dead_letter

    raw = _raw(spark, [INSERT_DOC, "{broken"])
    parsed = parse_wal2json(raw, lsn_col="seq")
    _good, dead = split_dead_letter(parsed)
    rows = dead.collect()
    assert len(rows) == 1 and rows[0].lsn is not None


def test_fallback_lsn_monotonic_without_order_column(spark):
    raw = spark.createDataFrame(
        [(d,) for d in [INSERT_DOC, UPDATE_DOC, DELETE_DOC]], "value string"
    ).coalesce(1)
    rows = parse_wal2json(raw).orderBy("lsn").collect()
    assert [r.op for r in rows] == ["c", "u", "d"]
    assert rows[0].lsn < rows[1].lsn < rows[2].lsn
    assert all(r.lsn >= 0 for r in rows)  # no sign wrap


def test_replica_identity_per_dialect(spark):
    import json

    from cdc_spark.cdc.envelope import (
        parse_debezium,
        parse_pgoutput_json,
        parse_wal2json,
    )

    w = spark.createDataFrame(
        [(0, json.dumps({"change": [
            {"kind": "update", "schema": "s", "table": "t",
             "columnnames": ["id", "v"], "columntypes": ["integer", "text"],
             "columnvalues": [1, "x"],
             "oldkeys": {"keynames": ["id"], "keytypes": ["integer"],
                         "keyvalues": [1]}},
            {"kind": "insert", "schema": "s", "table": "t",
             "columnnames": ["id"], "columntypes": ["integer"],
             "columnvalues": [2]},
        ]}))],
        "seq long, value string",
    )
    rows = parse_wal2json(w, lsn_col="seq").orderBy("lsn").collect()
    assert rows[0].replica_identity == "K"   # oldkeys → key-only
    assert rows[1].replica_identity is None  # insert carries no old image

    d = spark.createDataFrame(
        [(json.dumps({"op": "u", "before": {"id": "1", "v": "a"},
                      "after": {"id": "1", "v": "b"},
                      "source": {"schema": "s", "table": "t", "lsn": 5,
                                 "txId": 1},
                      "ts_ms": 0}),)],
        "value string",
    )
    assert parse_debezium(d).first().replica_identity == "O"

    pj_full = spark.createDataFrame(
        [(json.dumps({"op": "u", "schema": "s", "table": "t", "lsn": 1,
                      "tx_id": 1, "key": {"id": "1"},
                      "before": {"id": "1", "v": "a"},
                      "after": {"id": "1", "v": "b"}}),),
         (json.dumps({"op": "d", "schema": "s", "table": "t", "lsn": 2,
                      "tx_id": 1, "key": {"id": "1"}}),)],
        "value string",
    )
    got = {r.lsn: r.replica_identity
           for r in parse_pgoutput_json(pj_full).collect()}
    assert got[1] == "O" and got[2] == "K"


def test_maxwell_update_reconstructs_full_before(spark):
    """Maxwell's `old` carries only the changed columns; the canonical
    before image must be data overlaid with old (full pre-update row)."""
    from cdc_spark.cdc.envelope import parse_maxwell

    doc = (
        '{"database":"shop","table":"users","type":"update","ts":1700000000,'
        '"xid":7,"commit":true,'
        '"data":{"id":"1","name":"new","city":"berlin"},'
        '"old":{"name":"oldname"}}'
    )
    raw = spark.createDataFrame([(doc, 5)], "value string, seq long")
    got = parse_maxwell(raw, lsn_col="seq", key_names=["id"]).collect()[0]
    assert got.op == "u" and got.lsn == 5 and got.tx_id == 7
    assert got.after == {"id": "1", "name": "new", "city": "berlin"}
    assert got.before == {"id": "1", "name": "oldname", "city": "berlin"}
    assert got.key == {"id": "1"}
    assert got.replica_identity == "O"


def test_maxwell_delete_data_is_old_image(spark):
    from cdc_spark.cdc.envelope import parse_maxwell

    doc = (
        '{"database":"shop","table":"users","type":"delete","ts":1,'
        '"xid":9,"data":{"id":"2","name":"x"}}'
    )
    raw = spark.createDataFrame([(doc,)], "value string")
    got = parse_maxwell(raw, key_names=["id"]).collect()[0]
    assert got.op == "d"
    assert got.after is None
    assert got.before == {"id": "2", "name": "x"}
    assert got.key == {"id": "2"}


def test_maxwell_unknown_type_dead_letters(spark):
    from cdc_spark.cdc.envelope import parse_maxwell, split_dead_letter

    docs = [
        ('{"database":"shop","table":"t","type":"table-create","ts":1}',),
        ('{"database":"shop","table":"t","type":"insert","ts":1,'
         '"data":{"id":"1"}}',),
        ("not json at all",),
    ]
    raw = spark.createDataFrame(docs, "value string")
    good, dead = split_dead_letter(parse_maxwell(raw))
    assert good.count() == 1 and dead.count() == 2


def test_maxwell_bootstrap_maps_to_snapshot_read(spark):
    from cdc_spark.cdc.envelope import parse_maxwell

    doc = (
        '{"database":"shop","table":"users","type":"bootstrap-insert",'
        '"ts":1,"data":{"id":"3"}}'
    )
    raw = spark.createDataFrame([(doc,)], "value string")
    assert parse_maxwell(raw).collect()[0].op == "r"


def test_wal2json_v2_actions_and_markers(spark):
    import json

    from cdc_spark.cdc.envelope import parse_wal2json_v2

    docs = [
        json.dumps({"action": "B", "xid": 7}),
        json.dumps(
            {
                "action": "I",
                "schema": "s",
                "table": "t",
                "xid": 7,
                "columns": [
                    {"name": "id", "type": "integer", "value": "1"},
                    {"name": "v", "type": "text", "value": "x"},
                ],
            }
        ),
        json.dumps(
            {
                "action": "U",
                "schema": "s",
                "table": "t",
                "xid": 8,
                # unchanged-TOAST convention: v omitted from columns
                "columns": [
                    {"name": "id", "type": "integer", "value": "1"}
                ],
                "identity": [
                    {"name": "id", "type": "integer", "value": "1"}
                ],
            }
        ),
        json.dumps({"action": "C", "xid": 8}),
        "{broken",
    ]
    raw = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "seq long, value string"
    )
    rows = parse_wal2json_v2(raw, lsn_col="seq").orderBy("lsn").collect()
    assert [r.op for r in rows] == [None, "c", "u", None, None]
    ins, upd = rows[1], rows[2]
    assert ins.after == {"id": "1", "v": "x"} and ins.tx_id == 7
    # omitted column stays absent from the after map (unchanged TOAST)
    assert upd.after == {"id": "1"} and "v" not in upd.after
    assert upd.key == {"id": "1"} and upd.replica_identity == "K"
    assert upd.tx_id == 8
