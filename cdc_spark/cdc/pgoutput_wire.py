"""Binary pgoutput wire decoder — the reference's core operator, on Spark.

The reference hand-decodes PostgreSQL logical-replication messages
(examples/pgoutput/main.go:338-409: 1-byte tag dispatch, big-endian
fields, NUL-terminated strings, tupledata with 'n'/'u'/'t' column
flags) into per-process mutable state (RelationSet, main.go:411-427).
Format spec:
https://www.postgresql.org/docs/current/protocol-logicalrep-message-formats.html

Spark-first rethink:

- **frame decode** is inherently imperative byte-walking → an
  Arrow-batched ``mapInPandas`` (the one place Python belongs); each
  frame decodes independently, so it parallelizes over partitions;
- **transaction context** (Begin's xid / commit timestamp, Origin
  name) is NOT process state: it is a fill-forward window over the
  stream order — ``last(..., ignorenulls)`` up to the current row;
- **relation announcements** ('R') resolve to data rows the same way,
  partitioned by relation id — an as-of association, not a mutable
  ``map[uint32]Relation``;
- **tupledata → named maps** is a ``zip_with`` of the announced
  column list against the tuple values, entirely JVM-side.

Canonical-map semantics (feeds ``registry.materialize`` /
``merge.apply_changes``):

- flag 't': decoded text value;
- flag 'n': SQL NULL → key present in the map with a null value;
- flag 'u' (unchanged TOAST): key **absent** from the map — absent
  means "unchanged", present-null means "really NULL", so the merge
  can tell the two apart (main.go:203's flag, kept distinguishable).

Replica-identity nuance: Update/Delete old images may be 'K'
(key-only) or 'O' (full old row) — surfaced as the ``key`` map
(always the announced key columns) vs the ``before`` map (whatever
old image the wire carried); a 'K' image yields before ≡ key.
"""

from __future__ import annotations

import struct
import warnings
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# PostgreSQL epoch (2000-01-01 UTC) offset from Unix epoch, in µs.
PG_EPOCH_US = 946_684_800 * 1_000_000

# Common pg_type OIDs → type names (static PostgreSQL catalog
# knowledge); in-band 'Y' announcements override for custom types.
PG_OID_NAMES: dict[int, str] = {
    16: "boolean",
    17: "bytea",
    20: "bigint",
    21: "smallint",
    23: "integer",
    25: "text",
    114: "json",
    700: "real",
    701: "double precision",
    1042: "character",
    1043: "character varying",
    1082: "date",
    1083: "time without time zone",
    1114: "timestamp without time zone",
    1184: "timestamp with time zone",
    1700: "numeric",
    2950: "uuid",
    3802: "jsonb",
}

_DECODED_SCHEMA = (
    "__order long, tag string, error string, "
    "lsn long, ts_us long, xid long, "
    "rel_id long, namespace string, rel_name string, replica int, "
    "cols array<struct<is_key: boolean, name: string, type_oid: long, "
    "mode: long>>, "
    "type_oid long, type_ns string, type_name string, "
    "origin_name string, old_kind string, "
    "old_tuple array<struct<flag: string, value: string>>, "
    "new_tuple array<struct<flag: string, value: string>>, "
    "trunc_opts int, trunc_rel_ids array<long>"
)


class _Reader:
    """Big-endian cursor over one frame (after the tag byte)."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u16(self) -> int:
        (v,) = struct.unpack_from(">H", self.buf, self.pos)
        self.pos += 2
        return v

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.pos)
        self.pos += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.buf, self.pos)
        self.pos += 8
        return v

    def cstring(self) -> str:
        end = self.buf.index(0, self.pos)
        s = self.buf[self.pos : end].decode("utf-8")
        self.pos = end + 1
        return s

    def tupledata(self) -> list[dict]:
        n = self.u16()
        out = []
        for _ in range(n):
            flag = chr(self.u8())
            if flag == "t":
                size = self.u32()
                val = self.buf[self.pos : self.pos + size].decode("utf-8")
                self.pos += size
                out.append({"flag": "t", "value": val})
            else:  # 'n' (null) or 'u' (unchanged TOAST)
                out.append({"flag": flag, "value": None})
        return out

    def peek_in(self, chars: str) -> str | None:
        c = chr(self.buf[self.pos])
        if c in chars:
            self.pos += 1
            return c
        return None


def _decode_frame(frame: bytes) -> dict:
    """One wire message → flat field dict (tag-dependent fields set)."""
    out: dict = {"tag": None, "error": None}
    if not frame:
        out["error"] = "empty frame"
        return out
    tag = chr(frame[0])
    r = _Reader(frame, 1)
    try:
        if tag == "B":
            out.update(tag=tag, lsn=r.u64(), ts_us=r.u64(), xid=r.u32())
        elif tag == "C":
            r.u8()  # flags (unused, always 0)
            commit_lsn = r.u64()
            r.u64()  # end-of-transaction LSN
            ts = r.u64()
            out.update(tag=tag, lsn=commit_lsn, ts_us=ts)
        elif tag == "O":
            out.update(tag=tag, lsn=r.u64(), origin_name=r.cstring())
        elif tag == "R":
            rel_id = r.u32()
            ns = r.cstring()
            name = r.cstring()
            replica = r.u8()
            ncols = r.u16()
            cols = []
            for _ in range(ncols):
                cols.append(
                    {
                        "is_key": r.u8() == 1,
                        "name": r.cstring(),
                        "type_oid": r.u32(),
                        "mode": r.u32(),
                    }
                )
            out.update(
                tag=tag,
                rel_id=rel_id,
                namespace=ns,
                rel_name=name,
                replica=replica,
                cols=cols,
            )
        elif tag == "Y":
            out.update(
                tag=tag,
                type_oid=r.u32(),
                type_ns=r.cstring(),
                type_name=r.cstring(),
            )
        elif tag == "I":
            rel_id = r.u32()
            r.u8()  # 'N' marker
            out.update(tag=tag, rel_id=rel_id, new_tuple=r.tupledata())
        elif tag == "U":
            rel_id = r.u32()
            old_kind = r.peek_in("KO")
            old = r.tupledata() if old_kind else None
            r.u8()  # 'N' marker
            out.update(
                tag=tag,
                rel_id=rel_id,
                old_kind=old_kind,
                old_tuple=old,
                new_tuple=r.tupledata(),
            )
        elif tag == "D":
            rel_id = r.u32()
            old_kind = r.peek_in("KO")
            out.update(
                tag=tag,
                rel_id=rel_id,
                old_kind=old_kind,
                old_tuple=r.tupledata(),
            )
        elif tag == "T":
            nrels = r.u32()
            opts = r.u8()
            rel_ids = [r.u32() for _ in range(nrels)]
            out.update(tag=tag, trunc_opts=opts, trunc_rel_ids=rel_ids)
        else:
            out["error"] = f"unknown message tag {tag!r}"
    except (IndexError, struct.error, UnicodeDecodeError, ValueError) as e:
        return {"tag": None, "error": f"{tag}: truncated/invalid frame: {e}"}
    return out


def decode_frames(
    raw: DataFrame,
    value_col: str = "value",
    order_col: str | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """Binary frames → flat decoded rows (one per wire message).

    ``order_col``: pre-existing total order (Kafka offset / file line
    number); falls back to ``monotonically_increasing_id`` — ordered
    within and across partitions of one batch, same discipline as
    ``parse_wal2json``. ``partition_col`` (a source-partition column,
    e.g. the Kafka partition) is carried through the decode so
    downstream windows can partition by it.
    """
    order = (
        F.col(order_col)
        if order_col
        else F.monotonically_increasing_id()
    )
    sel = [
        order.cast("long").alias("__order"),
        F.col(value_col).alias("__frame"),
    ]
    schema = _DECODED_SCHEMA
    if partition_col:
        sel.append(F.col(partition_col).alias("__part"))
        ptype = raw.schema[partition_col].dataType.simpleString()
        schema = f"{schema}, {partition_col} {ptype}"
    src = raw.select(*sel)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for order_v, frame in zip(pdf["__order"], pdf["__frame"]):
                d = _decode_frame(bytes(frame) if frame is not None else b"")
                d["__order"] = int(order_v)
                rows.append(d)
            cols = [f.split(":")[0] for f in _split_fields()]
            data = {c: [r.get(c) for r in rows] for c in cols}
            if partition_col:
                data[partition_col] = list(pdf["__part"])
            yield pd.DataFrame(data)

    return src.mapInPandas(decode, schema=schema)


def _split_fields() -> list[str]:
    """Top-level field names of _DECODED_SCHEMA (depth-0 commas)."""
    fields, depth, cur = [], 0, ""
    for ch in _DECODED_SCHEMA:
        if ch == "," and depth == 0:
            fields.append(cur.strip().split(" ")[0])
            cur = ""
        else:
            depth += ch in "<("
            depth -= ch in ">)"
            cur += ch
    fields.append(cur.strip().split(" ")[0])
    return fields


def _entries(cols: Column, tup: Column) -> Column:
    """zip announced columns with tuple values → array of
    (name, value, flag, is_key) entries."""
    return F.zip_with(
        cols,
        tup,
        lambda c, t: F.struct(
            c["name"].alias("name"),
            F.when(t["flag"] == "t", t["value"]).alias("value"),
            t["flag"].alias("flag"),
            c["is_key"].alias("is_key"),
        ),
    )


def _to_map(entries: Column, keep: Column) -> Column:
    kept = F.filter(entries, keep)
    return F.when(
        entries.isNotNull(),
        F.map_from_entries(
            F.transform(
                kept, lambda e: F.struct(e["name"], e["value"])
            )
        ),
    )


def parse_pgoutput_binary(
    raw: DataFrame,
    value_col: str = "value",
    order_col: str | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """Binary pgoutput frames → canonical change rows.

    ``partition_col`` is REQUIRED for input whose partitions carry
    INDEPENDENT frame orders (e.g. a Kafka topic with >1 partition):
    it names that source-partition column and the transaction
    fill-forward windows partition by it. Without it the windows run
    ``over (order by __order)`` globally — a single reducer. That is
    semantically forced for one replication slot's totally-ordered
    stream (exactly the reference's single-threaded loop,
    main.go:52-76), but a scale hazard if hit accidentally, so a
    physically multi-partition bounded input without ``partition_col``
    emits a RuntimeWarning. Physical chunking of one logical stream is
    still CORRECT (the window shuffles it to one total order) — the
    warning is about throughput at scale, hence not an error.
    """
    decoded = decode_frames(raw, value_col, order_col, partition_col)
    if partition_col is None and not raw.isStreaming:
        n_parts = raw.rdd.getNumPartitions()
        if n_parts > 1:
            warnings.warn(
                f"parse_pgoutput_binary: input has {n_parts} physical "
                "partitions but no partition_col — the transaction "
                "fill-forward window will run globally on ONE reducer. "
                "Correct for a single replication slot's total order; "
                "for multi-partition Kafka input pass partition_col so "
                "per-partition orders stay parallel.",
                RuntimeWarning,
                stacklevel=2,
            )

    part = [partition_col] if partition_col else []
    w_tx = (
        Window.partitionBy(*part)
        .orderBy("__order")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rel = (
        Window.partitionBy("rel_id", *part)
        .orderBy("__order")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tag = F.col("tag")

    # one row per logical event: truncate frames explode to one row
    # per truncated relation id, then relation context resolves per id
    events = (
        decoded.withColumn(
            "__rel_ids",
            F.when(tag == "T", F.col("trunc_rel_ids")).otherwise(
                F.array(F.col("rel_id"))
            ),
        )
        .withColumn("rel_id", F.explode_outer("__rel_ids"))
        .drop("__rel_ids")
    )

    ctx = (
        events.withColumn(
            "__xid",
            F.last(F.when(tag == "B", F.col("xid")), True).over(w_tx),
        )
        .withColumn(
            "__ts_us",
            F.last(F.when(tag == "B", F.col("ts_us")), True).over(w_tx),
        )
        .withColumn(
            "__b_ord",
            F.last(F.when(tag == "B", F.col("__order")), True).over(w_tx),
        )
        .withColumn(
            "__o_ord",
            F.last(F.when(tag == "O", F.col("__order")), True).over(w_tx),
        )
        .withColumn(
            "__origin",
            F.when(
                F.col("__o_ord") >= F.col("__b_ord"),  # origin is per-tx
                F.last(
                    F.when(tag == "O", F.col("origin_name")), True
                ).over(w_tx),
            ),
        )
        .withColumn("__ns", F.last(F.col("namespace"), True).over(w_rel))
        .withColumn("__rel", F.last(F.col("rel_name"), True).over(w_rel))
        .withColumn("__cols", F.last(F.col("cols"), True).over(w_rel))
    )

    data = ctx.where(tag.isin("I", "U", "D", "T") | tag.isNull())

    new_e = _entries(F.col("__cols"), F.col("new_tuple"))
    old_e = _entries(F.col("__cols"), F.col("old_tuple"))
    key_src = F.when(F.col("old_kind").isNotNull(), old_e).otherwise(new_e)

    # absent = unchanged TOAST ('u'); present-null = SQL NULL ('n')
    after = _to_map(new_e, lambda e: e["flag"] != "u")
    before = _to_map(old_e, lambda e: e["flag"] != "u")
    key = _to_map(key_src, lambda e: e["is_key"] & (e["flag"] != "u"))

    oid_name = F.create_map(
        *[F.lit(x) for kv in PG_OID_NAMES.items() for x in (kv[0], kv[1])]
    )
    col_types = F.when(
        F.col("__cols").isNotNull(),
        F.map_from_entries(
            F.transform(
                F.col("__cols"),
                lambda c: F.struct(
                    c["name"],
                    F.coalesce(
                        oid_name[c["type_oid"]],
                        c["type_oid"].cast("string"),
                    ),
                ),
            )
        ),
    )

    op = (
        F.when(tag == "I", "c")
        .when(tag == "U", "u")
        .when(tag == "D", "d")
        .when(tag == "T", "t")
    )
    return data.select(
        op.alias("op"),
        F.col("__ns").alias("src_schema"),
        F.col("__rel").alias("src_table"),
        F.col("__order").alias("lsn"),
        F.col("__xid").alias("tx_id"),
        F.timestamp_micros(F.col("__ts_us") + F.lit(PG_EPOCH_US)).alias(
            "commit_ts"
        ),
        key.alias("key"),
        before.alias("before"),
        after.alias("after"),
        col_types.alias("col_types"),
        F.col("__origin").alias("origin"),
        F.col("old_kind").alias("replica_identity"),
        *([F.col(partition_col)] if partition_col else []),
    )


def relation_announcements(decoded: DataFrame) -> DataFrame:
    """'R' frames as a relational view (rel_id, namespace, name,
    replica identity, exploded columns) — feed ``SchemaRegistry``
    .announce`` from it, or query schema history directly."""
    return (
        decoded.where(F.col("tag") == "R")
        .select(
            "__order",
            "rel_id",
            "namespace",
            "rel_name",
            "replica",
            F.posexplode("cols").alias("col_pos", "col"),
        )
        .select(
            "__order",
            "rel_id",
            "namespace",
            "rel_name",
            "replica",
            "col_pos",
            F.col("col.is_key").alias("is_key"),
            F.col("col.name").alias("col_name"),
            F.col("col.type_oid").alias("type_oid"),
        )
    )


def type_announcements(decoded: DataFrame) -> DataFrame:
    """'Y' frames: in-band custom type announcements (oid → name)."""
    return decoded.where(F.col("tag") == "Y").select(
        "__order", "type_oid", "type_ns", "type_name"
    )


# --- frame encoders (golden-fixture generation / tests) ---------------
# The inverse of the decoder, same wire layout. No broker in the test
# environment, so fixtures are synthesized frames mirroring the
# reference's events/*.json story.


def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def _tup(cells: list[tuple[str, str | None]]) -> bytes:
    out = struct.pack(">H", len(cells))
    for flag, val in cells:
        out += flag.encode()
        if flag == "t":
            b = (val or "").encode("utf-8")
            out += struct.pack(">I", len(b)) + b
    return out


def encode_begin(lsn: int, ts_us: int, xid: int) -> bytes:
    return b"B" + struct.pack(">QQI", lsn, ts_us, xid)


def encode_commit(lsn: int, end_lsn: int, ts_us: int) -> bytes:
    return b"C" + struct.pack(">BQQQ", 0, lsn, end_lsn, ts_us)


def encode_origin(lsn: int, name: str) -> bytes:
    return b"O" + struct.pack(">Q", lsn) + _cstr(name)


def encode_relation(
    rel_id: int,
    namespace: str,
    name: str,
    replica: int,
    cols: list[tuple[bool, str, int, int]],
) -> bytes:
    out = b"R" + struct.pack(">I", rel_id) + _cstr(namespace) + _cstr(name)
    out += struct.pack(">BH", replica, len(cols))
    for is_key, cname, oid, mode in cols:
        out += struct.pack(">B", 1 if is_key else 0) + _cstr(cname)
        out += struct.pack(">II", oid, mode)
    return out


def encode_type(oid: int, namespace: str, name: str) -> bytes:
    return b"Y" + struct.pack(">I", oid) + _cstr(namespace) + _cstr(name)


def encode_insert(rel_id: int, cells: list[tuple[str, str | None]]) -> bytes:
    return b"I" + struct.pack(">I", rel_id) + b"N" + _tup(cells)


def encode_update(
    rel_id: int,
    new: list[tuple[str, str | None]],
    old: list[tuple[str, str | None]] | None = None,
    old_kind: str | None = None,
) -> bytes:
    out = b"U" + struct.pack(">I", rel_id)
    if old is not None:
        out += (old_kind or "O").encode() + _tup(old)
    return out + b"N" + _tup(new)


def encode_delete(
    rel_id: int,
    old: list[tuple[str, str | None]],
    old_kind: str = "K",
) -> bytes:
    return b"D" + struct.pack(">I", rel_id) + old_kind.encode() + _tup(old)


def encode_truncate(rel_ids: list[int], opts: int = 0) -> bytes:
    out = b"T" + struct.pack(">IB", len(rel_ids), opts)
    for rid in rel_ids:
        out += struct.pack(">I", rid)
    return out


def announce_to_registry(registry, decoded: DataFrame) -> None:
    """Replay 'R' frames (stream order) into a ``SchemaRegistry`` —
    the reference's RelationSet.Add loop (main.go:425-427). Bounded
    collect: one row per announced relation version, with an in-band
    'Y' name overriding the static OID table when present."""
    y = {
        int(r["type_oid"]): r["type_name"]
        for r in type_announcements(decoded).collect()
    }
    rels = (
        decoded.where(F.col("tag") == "R")
        .select("__order", "namespace", "rel_name", "cols")
        .collect()
    )
    for r in sorted(rels, key=lambda r: r["__order"]):
        registry.announce(
            r["namespace"],
            r["rel_name"],
            [
                (
                    c["name"],
                    y.get(
                        int(c["type_oid"]),
                        PG_OID_NAMES.get(int(c["type_oid"]), "text"),
                    ),
                    bool(c["is_key"]),
                )
                for c in r["cols"]
            ],
        )
