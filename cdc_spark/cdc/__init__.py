"""CDC core: change-event parsing, schema registry, and stateful apply.

Spark-native re-expression of the reference CDC consumer
(`/root/reference/examples/pgoutput/main.go`): where the reference
decodes pgoutput wire frames row-at-a-time on one thread, this layer
parses change-event envelopes declaratively with `from_json`, tracks
evolving table schemas in a registry, and applies batches with an
LSN-ordered latest-wins merge — all columnar, all distributed.
"""

from cdc_spark.cdc.envelope import (
    CANONICAL_FIELDS,
    parse_debezium,
    parse_pgoutput_json,
    parse_wal2json,
)
from cdc_spark.cdc.merge import apply_changes, latest_by_key
from cdc_spark.cdc.registry import SchemaRegistry, TableSchema
from cdc_spark.cdc.snapshot import snapshot_diff
from cdc_spark.cdc.typemap import spark_type_for_oid, spark_type_for_pg_name

__all__ = [
    "CANONICAL_FIELDS",
    "parse_wal2json",
    "parse_debezium",
    "parse_pgoutput_json",
    "apply_changes",
    "latest_by_key",
    "SchemaRegistry",
    "TableSchema",
    "snapshot_diff",
    "spark_type_for_oid",
    "spark_type_for_pg_name",
]
