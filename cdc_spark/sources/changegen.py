"""Custom Python DataSource: a deterministic change-feed generator.

The Spark 4 Python DataSource API (`pyspark.sql.datasource`) is the
modern way to bring a non-file system into the engine — the same
surface a real CDC transport connector (reference: the pgoutput
receive loop, examples/pgoutput/main.go:412-413) would use when no
built-in format exists. This source demonstrates the full contract:

- ``partitions()`` plans N independent read units (the Kafka-partition
  / replication-slot-shard shape) — Spark schedules one task per unit,
  so the read parallelizes without any driver-side row handling;
- ``read(partition)`` generates each unit's rows executor-side.

Rows are pure integer arithmetic on the LSN, so the feed is
bit-reproducible at any partitioning — which is what lets the
correctness gate hash-check a *connector* end to end.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

SCHEMA = "lsn bigint, op string, key bigint, value double"


def gen_row(lsn: int) -> tuple[int, str, int, float]:
    """The deterministic row formula (mirrored by io08's SQL oracle):
    every 10th LSN is a delete, keys cycle mod 97, values are integer-
    valued doubles so sums stay exact in IEEE arithmetic."""
    return (
        lsn,
        "d" if lsn % 10 == 9 else "u",
        lsn % 97,
        float((lsn * 31) % 1000),
    )


class ChangeGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_changegen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "ChangeGenReader":  # noqa: ANN001
        return ChangeGenReader(self.options)


class ChangeGenReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001
        self.options = options

    def partitions(self) -> Sequence[InputPartition]:
        n = int(self.options.get("numPartitions", 4))
        return [InputPartition(i) for i in range(n)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        per = int(self.options.get("rowsPerPartition", 1000))
        base = partition.value * per
        for j in range(per):
            yield gen_row(base + j)
