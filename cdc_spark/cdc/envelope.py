"""Change-event envelope parsers — three dialects, one canonical shape.

Dialects (SURVEY.md §1.3):

1. **wal2json** — the reference's golden fixtures
   (`/root/reference/examples/pgoutput/events/*.json`): a document per
   transaction with a ``change`` array; inserts/updates carry parallel
   ``columnnames/columntypes/columnvalues`` arrays, updates/deletes
   carry ``oldkeys`` (deletes carry *only* keys — delete.json:7-11).
2. **Debezium** — ``before``/``after``/``op``/``source``/``ts_ms``,
   the deck's canonical Kafka transport (slides 21-27).
3. **pgoutput-JSON** — the flat envelope of FIXTURES.md §A4 mirroring
   the binary pgoutput messages the reference decodes
   (main.go:338-409), with explicit ``lsn``/``tx_id``.

All parse into the canonical change schema::

    op         string   -- c|u|d|t|r
    src_schema string
    src_table  string
    lsn        long     -- total order within the source; merge tiebreak
    tx_id      long
    commit_ts  timestamp
    key        map<string,string>  -- PK name→value (deletes: the only payload)
    before     map<string,string>  -- old image if the dialect carries one
    after      map<string,string>  -- new image (null for deletes)
    col_types  map<string,string>  -- in-band type announcements, if any
    origin     string              -- replication origin ('O' message;
                                   -- only the binary wire dialect emits it)
    replica_identity string        -- shape of the old image an update/
                                   -- delete carried: 'K' key-only,
                                   -- 'O' full old row (main.go:382-392)

Map-presence semantics (all dialects): a column ABSENT from ``after``
is *unchanged* (pgoutput's 'u' unchanged-TOAST flag); a column present
with a null value is a real SQL NULL. ``registry.materialize``
preserves the distinction.

Everything is ``from_json`` + array/map expressions — one declarative
plan replaces the reference's hand-rolled binary decoder, and executes
vectorized on every partition instead of row-at-a-time on one thread.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CANONICAL_FIELDS = (
    "op",
    "src_schema",
    "src_table",
    "lsn",
    "tx_id",
    "commit_ts",
    "key",
    "before",
    "after",
    "col_types",
    "origin",
    "replica_identity",
)

_MAP_SS = T.MapType(T.StringType(), T.StringType())

# wal2json: columnvalues is heterogeneous JSON (numbers, strings,
# bools); parsing as array<string> keeps each scalar's lexical form —
# the same "text value, cast later" discipline as the reference's
# tuple decode (main.go:197-210), made columnar.
WAL2JSON_SCHEMA = T.StructType(
    [
        T.StructField(
            "change",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("schema", T.StringType()),
                        T.StructField("table", T.StringType()),
                        T.StructField("columnnames", T.ArrayType(T.StringType())),
                        T.StructField("columntypes", T.ArrayType(T.StringType())),
                        T.StructField("columnvalues", T.ArrayType(T.StringType())),
                        T.StructField(
                            "oldkeys",
                            T.StructType(
                                [
                                    T.StructField(
                                        "keynames", T.ArrayType(T.StringType())
                                    ),
                                    T.StructField(
                                        "keytypes", T.ArrayType(T.StringType())
                                    ),
                                    T.StructField(
                                        "keyvalues", T.ArrayType(T.StringType())
                                    ),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)

DEBEZIUM_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("before", _MAP_SS),
        T.StructField("after", _MAP_SS),
        T.StructField("ts_ms", T.LongType()),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("schema", T.StringType()),
                    T.StructField("table", T.StringType()),
                    T.StructField("lsn", T.LongType()),
                    T.StructField("txId", T.LongType()),
                ]
            ),
        ),
    ]
)

PGOUTPUT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("tx_id", T.LongType()),
        T.StructField("tx_commit_ts", T.StringType()),
        T.StructField("key", _MAP_SS),
        T.StructField("before", _MAP_SS),
        T.StructField("after", _MAP_SS),
        T.StructField("col_types", _MAP_SS),
    ]
)

_KIND_TO_OP = {"insert": "c", "update": "u", "delete": "d", "truncate": "t"}


def split_dead_letter(
    parsed: DataFrame, raw: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """Permissive-mode routing: rows that failed to parse (null op —
    malformed JSON or unknown kind) go to a dead-letter frame instead
    of killing the stream (the upgrade over the reference's
    crash-stop ``log.Fatal`` policy, main.go:110,120-129).

    Returns (good, dead). Join the dead rows back to ``raw`` by lsn
    upstream if the original payload must be preserved; here the dead
    frame carries the canonical columns as parsed.
    """
    good = parsed.where(F.col("op").isNotNull())
    dead = parsed.where(F.col("op").isNull())
    return good, dead


def _zip_map(names: Column, values: Column) -> Column:
    """map_from_arrays guarded against null arrays."""
    return F.when(
        names.isNotNull() & values.isNotNull(), F.map_from_arrays(names, values)
    )


def parse_wal2json(
    raw: DataFrame, value_col: str = "value", lsn_col: str | None = None
) -> DataFrame:
    """Parse wal2json transaction documents → canonical change rows.

    ``lsn_col``: a pre-existing total-order column (Kafka offset, file
    line number); lsn = input_order * 2^20 + idx (order must stay
    below 2^43 — true for Kafka offsets and file line numbers).

    Without ``lsn_col`` a per-batch fallback order is derived from
    (partition id, row number): 20 bits partition | 33 bits row | 10
    bits statement index — overflow-free bit packing (a plain
    ``monotonically_increasing_id() * 2^20`` wraps negative beyond
    1024 partitions, silently corrupting merge order). Statement index
    saturates at 1023 within one transaction document.
    """
    doc = raw.withColumn("__doc", F.from_json(F.col(value_col), WAL2JSON_SCHEMA))
    if lsn_col:
        # statement index saturates at 2^20-1 here too: a transaction
        # document with ≥2^20 changes must not overflow into the next
        # input-order's lsn range
        lsn_expr = F.col("__order") * F.lit(1 << 20) + F.least(
            F.coalesce(F.col("__idx"), F.lit(0)), F.lit((1 << 20) - 1)
        )
        doc = doc.withColumn("__order", F.col(lsn_col))
    else:
        pid = F.shiftright(F.monotonically_increasing_id(), 33)
        row = F.monotonically_increasing_id().bitwiseAND(
            F.lit((1 << 33) - 1)
        )
        doc = doc.withColumn(
            "__order", F.shiftleft(pid, 43) + F.shiftleft(row, 10)
        )
        lsn_expr = F.col("__order") + F.least(
            F.coalesce(F.col("__idx"), F.lit(0)), F.lit((1 << 10) - 1)
        )
    changes = doc.select(
        F.col("__order"),
        # from_json returns a struct of nulls (not a null struct) for
        # malformed input — "failed to parse" is change IS NULL, while
        # a valid empty transaction has change = [] (non-null)
        F.col("__doc.change").isNull().alias("__bad"),
        F.posexplode_outer("__doc.change").alias("__idx", "c"),
    ).where(
        # drop the empty-transaction null row; keep genuinely malformed
        # documents for the dead-letter path
        F.col("c").isNotNull() | F.col("__bad")
    )
    kind_map = F.create_map(
        *[F.lit(x) for kv in _KIND_TO_OP.items() for x in kv]
    )
    return changes.select(
        kind_map[F.col("c.kind")].alias("op"),
        F.col("c.schema").alias("src_schema"),
        F.col("c.table").alias("src_table"),
        lsn_expr.cast("long").alias("lsn"),
        F.lit(None).cast("long").alias("tx_id"),
        F.lit(None).cast("timestamp").alias("commit_ts"),
        _zip_map(F.col("c.oldkeys.keynames"), F.col("c.oldkeys.keyvalues")).alias(
            "key"
        ),
        F.lit(None).cast(_MAP_SS).alias("before"),
        _zip_map(F.col("c.columnnames"), F.col("c.columnvalues")).alias("after"),
        _zip_map(F.col("c.columnnames"), F.col("c.columntypes")).alias("col_types"),
        F.lit(None).cast("string").alias("origin"),
        # wal2json's oldkeys carries only key columns — 'K'-shaped
        F.when(F.col("c.oldkeys").isNotNull(), F.lit("K")).alias(
            "replica_identity"
        ),
    )


def parse_debezium(
    raw: DataFrame, value_col: str = "value", key_names: list[str] | None = None
) -> DataFrame:
    """Parse Debezium envelopes → canonical change rows.

    ``key_names``: PK column names (Debezium keys travel in the Kafka
    record key; when consuming value-only, name the PK columns so the
    key map can be projected from before/after images).
    """
    doc = raw.withColumn("__e", F.from_json(F.col(value_col), DEBEZIUM_SCHEMA))
    img = F.coalesce(F.col("__e.after"), F.col("__e.before"))
    if key_names:
        key = F.map_from_arrays(
            F.array(*[F.lit(k) for k in key_names]),
            F.array(*[F.try_element_at(img, F.lit(k)) for k in key_names]),
        )
    else:
        key = F.lit(None).cast(_MAP_SS)
    return doc.select(
        F.col("__e.op").alias("op"),
        F.col("__e.source.schema").alias("src_schema"),
        F.col("__e.source.table").alias("src_table"),
        F.col("__e.source.lsn").alias("lsn"),
        F.col("__e.source.txId").alias("tx_id"),
        F.timestamp_millis(F.col("__e.ts_ms")).alias("commit_ts"),
        key.alias("key"),
        F.col("__e.before").alias("before"),
        F.col("__e.after").alias("after"),
        F.lit(None).cast(_MAP_SS).alias("col_types"),
        F.lit(None).cast("string").alias("origin"),
        # Debezium before is the full old row — REPLICA IDENTITY FULL
        F.when(F.col("__e.before").isNotNull(), F.lit("O")).alias(
            "replica_identity"
        ),
    )


def parse_pgoutput_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse the flat pgoutput-JSON envelope (FIXTURES.md §A4)."""
    doc = raw.withColumn("__e", F.from_json(F.col(value_col), PGOUTPUT_JSON_SCHEMA))
    return doc.select(
        F.col("__e.op").alias("op"),
        F.col("__e.schema").alias("src_schema"),
        F.col("__e.table").alias("src_table"),
        F.col("__e.lsn").alias("lsn"),
        F.col("__e.tx_id").alias("tx_id"),
        F.col("__e.tx_commit_ts").try_cast("timestamp").alias("commit_ts"),
        F.coalesce(F.col("__e.key"), F.col("__e.before")).alias("key"),
        F.col("__e.before").alias("before"),
        F.col("__e.after").alias("after"),
        F.col("__e.col_types").alias("col_types"),
        F.lit(None).cast("string").alias("origin"),
        F.when(F.col("__e.before").isNotNull(), F.lit("O"))
        .when(
            F.col("__e.key").isNotNull() & F.col("__e.op").isin("u", "d"),
            F.lit("K"),
        )
        .alias("replica_identity"),
    )


MAXWELL_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("xid", T.LongType()),
        T.StructField("commit", T.BooleanType()),
        T.StructField("position", T.StringType()),
        T.StructField("data", _MAP_SS),
        T.StructField("old", _MAP_SS),
    ]
)

_MAXWELL_TYPE_TO_OP = {
    "insert": "c",
    "update": "u",
    "delete": "d",
    "bootstrap-insert": "r",  # Maxwell's snapshot rows = Debezium 'r'
    "truncate": "t",
}


def parse_maxwell(
    raw: DataFrame,
    value_col: str = "value",
    lsn_col: str | None = None,
    key_names: list[str] | None = None,
) -> DataFrame:
    """Parse Maxwell daemon JSON (the MySQL-binlog ecosystem's CDC
    format: one row-change per document with ``database/table/type/
    ts/xid/data/old``) → canonical change rows.

    Dialect quirks handled here, not downstream:

    - ``data`` is the full AFTER image on insert/update but the full
      OLD image on delete (Maxwell has no after for deletes) — mapped
      to the canonical before/after accordingly;
    - ``old`` on updates carries ONLY the changed columns' previous
      values (a partial before image): the canonical ``before`` is
      ``data`` overlaid with ``old`` (map_concat right-biased), which
      reconstructs the full pre-update row exactly;
    - typed JSON values (numbers/bools) coerce to strings in the map,
      matching the other dialects' string-typed canonical maps;
    - ``lsn``: Maxwell's binlog ``position`` strings are not totally
      ordered across files lexicographically, so the caller passes a
      transport order (Kafka offset / file line) via ``lsn_col``;
      fallback is the same partition/row bit-packing as wal2json.
    - Unknown ``type`` values (DDL like table-create, bootstrap-start)
      parse with null op → the dead-letter path, same permissive
      policy as the other dialects.
    """
    doc = raw.withColumn("__e", F.from_json(F.col(value_col), MAXWELL_SCHEMA))
    if lsn_col:
        lsn_expr = F.col(lsn_col).cast("long")
    else:
        pid = F.shiftright(F.monotonically_increasing_id(), 33)
        row = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
        lsn_expr = F.shiftleft(pid, 43) + row
    op_map = F.create_map(
        *[F.lit(x) for kv in _MAXWELL_TYPE_TO_OP.items() for x in kv]
    )
    op = op_map[F.col("__e.type")]
    data, old = F.col("__e.data"), F.col("__e.old")
    before = (
        F.when(op == "d", data)
        .when(
            (op == "u") & old.isNotNull(),
            F.map_concat(
                F.map_filter(data, lambda k, _: ~F.map_contains_key(old, k)),
                old,
            ),
        )
    )
    after = F.when(op != "d", data)
    if key_names:
        img = F.coalesce(data, old)
        key = F.map_from_arrays(
            F.array(*[F.lit(k) for k in key_names]),
            F.array(*[F.try_element_at(img, F.lit(k)) for k in key_names]),
        )
    else:
        key = F.lit(None).cast(_MAP_SS)
    return doc.select(
        op.alias("op"),
        F.col("__e.database").alias("src_schema"),
        F.col("__e.table").alias("src_table"),
        lsn_expr.alias("lsn"),
        F.col("__e.xid").alias("tx_id"),
        F.timestamp_seconds(F.col("__e.ts")).alias("commit_ts"),
        key.alias("key"),
        before.alias("before"),
        after.alias("after"),
        F.lit(None).cast(_MAP_SS).alias("col_types"),
        F.lit(None).cast("string").alias("origin"),
        # delete's data / update's reconstructed old are full images
        F.when(op.isin("d", "u") & before.isNotNull(), F.lit("O")).alias(
            "replica_identity"
        ),
    )


# wal2json format-version 2: ONE action per JSON document (B/C/I/U/D/
# T/M), columns/identity as name+type+value struct arrays. Reference:
# the wal2json extension's documented v2 output
# (https://github.com/eulerto/wal2json#format-version-2).
WAL2JSON_V2_SCHEMA = T.StructType(
    [
        T.StructField("action", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("xid", T.LongType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField(
            "columns",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "identity",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

_V2_ACTION_TO_OP = {"I": "c", "U": "u", "D": "d", "T": "t"}


def _v2_map(col):  # noqa: ANN001
    return F.when(
        col.isNotNull(),
        F.map_from_entries(
            F.transform(col, lambda c: F.struct(c["name"], c["value"]))
        ),
    )


def parse_wal2json_v2(
    raw: DataFrame, value_col: str = "value", lsn_col: str | None = None
) -> DataFrame:
    """Parse wal2json FORMAT-VERSION 2 documents → canonical rows.

    The fifth envelope dialect: v2 emits one action per document
    (``action`` I/U/D/T plus B/C transaction markers and M messages)
    instead of v1's per-transaction ``change`` array. Dialect rules:

    - ``columns`` is the new image (I/U); ``identity`` is the old
      key/image (U/D) — identity maps to both ``key`` and ``before``
      (it IS the replica-identity image, 'K'-shaped);
    - ``xid`` arrives per action (``include-xids``) — no positional
      Begin fill-forward needed, unlike the binary wire;
    - B/C/M actions parse with null op and flow to the dead-letter /
      marker path (callers using the txn barrier map them to markers);
    - unparseable documents keep op null with null action — the same
      permissive policy as every other dialect.
    """
    doc = raw.withColumn(
        "__e", F.from_json(F.col(value_col), WAL2JSON_V2_SCHEMA)
    )
    if lsn_col:
        lsn_expr = F.col(lsn_col).cast("long")
    else:
        pid = F.shiftright(F.monotonically_increasing_id(), 33)
        row = F.monotonically_increasing_id().bitwiseAND(
            F.lit((1 << 33) - 1)
        )
        lsn_expr = F.shiftleft(pid, 43) + row
    op_map = F.create_map(
        *[F.lit(x) for kv in _V2_ACTION_TO_OP.items() for x in kv]
    )
    cols, ident = F.col("__e.columns"), F.col("__e.identity")
    return doc.select(
        op_map[F.col("__e.action")].alias("op"),
        F.col("__e.schema").alias("src_schema"),
        F.col("__e.table").alias("src_table"),
        lsn_expr.alias("lsn"),
        F.col("__e.xid").alias("tx_id"),
        F.to_timestamp(F.col("__e.timestamp")).alias("commit_ts"),
        _v2_map(ident).alias("key"),
        _v2_map(ident).alias("before"),
        _v2_map(cols).alias("after"),
        F.when(
            cols.isNotNull(),
            F.map_from_entries(
                F.transform(cols, lambda c: F.struct(c["name"], c["type"]))
            ),
        ).alias("col_types"),
        F.lit(None).cast("string").alias("origin"),
        F.when(ident.isNotNull(), F.lit("K")).alias("replica_identity"),
    )
