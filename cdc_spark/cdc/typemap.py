"""PostgreSQL → Spark type mapping.

Mirrors the reference decoder's complete OID switch
(`/root/reference/examples/pgoutput/main.go:474-566`) and the textual
type vocabulary of the wal2json dialect
(`examples/pgoutput/events/insert.json:8-13`), per SURVEY.md §1.2.
One data table, not code branches. The reference's `ByteaArrayOID →
BoolArray` copy-paste slip (main.go:484-485) is mapped by *intent*:
``bytea[] → array<binary>``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- textual PG type names (wal2json / information_schema spelling) ---

_NAME_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "smallint": T.ShortType(),
    "int2": T.ShortType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "int4": T.IntegerType(),
    "bigint": T.LongType(),
    "int8": T.LongType(),
    "real": T.FloatType(),
    "float4": T.FloatType(),
    "double precision": T.DoubleType(),
    "float8": T.DoubleType(),
    "numeric": T.DecimalType(38, 18),
    "decimal": T.DecimalType(38, 18),
    "text": T.StringType(),
    "character varying": T.StringType(),
    "varchar": T.StringType(),
    "character": T.StringType(),
    "name": T.StringType(),
    "bytea": T.BinaryType(),
    "date": T.DateType(),
    "timestamp without time zone": T.TimestampNTZType(),
    "timestamp": T.TimestampNTZType(),
    "timestamp with time zone": T.TimestampType(),
    "timestamptz": T.TimestampType(),
    "time without time zone": T.StringType(),
    "uuid": T.StringType(),
    "json": T.StringType(),
    "jsonb": T.StringType(),
    "inet": T.StringType(),
    "cidr": T.StringType(),
    "macaddr": T.StringType(),
    "interval": T.DayTimeIntervalType(),
    "xid": T.StringType(),
    "cid": T.StringType(),
    "tid": T.StringType(),
    "aclitem": T.StringType(),
    "oid": T.StringType(),
    "record": T.StringType(),
}

# --- numeric OIDs (pgoutput binary dialect), main.go:474-566 ----------

_OID_TO_SPARK: dict[int, T.DataType] = {
    16: T.BooleanType(),        # bool        (main.go:482-483)
    17: T.BinaryType(),         # bytea       (main.go:486-487)
    18: T.StringType(),         # char
    19: T.StringType(),         # name        (main.go:529-530)
    20: T.LongType(),           # int8        (main.go:523-524)
    21: T.ShortType(),          # int2        (main.go:515-516)
    23: T.IntegerType(),        # int4        (main.go:519-520)
    25: T.StringType(),         # text        (main.go:542-543)
    26: T.StringType(),         # oid         (main.go:531-537)
    27: T.StringType(),         # tid         (main.go:538-539)
    28: T.StringType(),         # xid         (main.go:560-561)
    29: T.StringType(),         # cid         (main.go:488-489)
    114: T.StringType(),        # json        (main.go:527-528)
    650: T.StringType(),        # cidr        (main.go:492-493)
    700: T.FloatType(),         # float4      (main.go:503-504)
    701: T.DoubleType(),        # float8      (main.go:507-508)
    869: T.StringType(),        # inet        (main.go:511-512)
    1033: T.StringType(),       # aclitem     (main.go:478-479)
    1043: T.StringType(),       # varchar     (main.go:558-559)
    1082: T.DateType(),         # date        (main.go:499-500)
    1114: T.TimestampNTZType(), # timestamp   (main.go:546-547)
    1184: T.TimestampType(),    # timestamptz (main.go:550-551)
    2950: T.StringType(),       # uuid        (main.go:552-553)
    3802: T.StringType(),       # jsonb       (main.go:525-526)
    2249: T.StringType(),       # record      (main.go:554-555)
}

# Array OIDs → array of the scalar mapping (main.go:476-557).
_ARRAY_OIDS: dict[int, int] = {
    1000: 16,    # bool[]
    1001: 17,    # bytea[]  — reference bug maps this to BoolArray; we map intent
    651: 650,    # cidr[]
    1182: 1082,  # date[]
    1021: 700,   # float4[]
    1022: 701,   # float8[]
    1041: 869,   # inet[]
    1005: 21,    # int2[]
    1007: 23,    # int4[]
    1016: 20,    # int8[]
    1009: 25,    # text[]
    1115: 1114,  # timestamp[]
    1185: 1184,  # timestamptz[]
    1015: 1043,  # varchar[]
    1034: 1033,  # aclitem[]
}


def spark_type_for_pg_name(pg_type: str) -> T.DataType:
    """Textual PG type → Spark type; unknown degrades to string exactly
    like the reference's ``pgtype.Unknown`` default (main.go:562-565)."""
    name = pg_type.strip().lower()
    if name.endswith("[]"):
        return T.ArrayType(spark_type_for_pg_name(name[:-2]))
    # strip typmod: "character varying(32)" → "character varying"
    if "(" in name:
        name = name[: name.index("(")].strip()
    return _NAME_TO_SPARK.get(name, T.StringType())


def spark_type_for_oid(oid: int) -> T.DataType:
    if oid in _ARRAY_OIDS:
        return T.ArrayType(spark_type_for_oid(_ARRAY_OIDS[oid]))
    return _OID_TO_SPARK.get(oid, T.StringType())
