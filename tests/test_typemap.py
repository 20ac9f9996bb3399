from __future__ import annotations

from pyspark.sql import types as T

from cdc_spark.cdc.typemap import spark_type_for_oid, spark_type_for_pg_name


def test_golden_event_types():
    # the exact vocabulary of the reference fixtures (insert.json:8-13)
    assert spark_type_for_pg_name("integer") == T.IntegerType()
    assert spark_type_for_pg_name("text") == T.StringType()
    assert (
        spark_type_for_pg_name("timestamp without time zone")
        == T.TimestampNTZType()
    )


def test_scalar_oids():
    assert spark_type_for_oid(16) == T.BooleanType()
    assert spark_type_for_oid(20) == T.LongType()
    assert spark_type_for_oid(23) == T.IntegerType()
    assert spark_type_for_oid(701) == T.DoubleType()
    assert spark_type_for_oid(1114) == T.TimestampNTZType()
    assert spark_type_for_oid(1184) == T.TimestampType()
    assert spark_type_for_oid(2950) == T.StringType()  # uuid, canonical form


def test_array_oids():
    assert spark_type_for_oid(1007) == T.ArrayType(T.IntegerType())
    assert spark_type_for_oid(1009) == T.ArrayType(T.StringType())
    # bytea[]: the reference maps this OID to BoolArray by accident
    # (main.go:484-485); we implement the intent.
    assert spark_type_for_oid(1001) == T.ArrayType(T.BinaryType())


def test_unknown_degrades_to_string():
    # same degradation as pgtype.Unknown (main.go:562-565)
    assert spark_type_for_pg_name("some_custom_enum") == T.StringType()
    assert spark_type_for_oid(99999) == T.StringType()


def test_typmod_and_array_names():
    assert spark_type_for_pg_name("character varying(32)") == T.StringType()
    assert spark_type_for_pg_name("int4[]") == T.ArrayType(T.IntegerType())
    assert spark_type_for_pg_name("numeric(12,4)") == T.DecimalType(38, 18)
