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
    DataSourceStreamReader,
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


class LsnRangePartition(InputPartition):
    def __init__(self, lo: int, hi: int) -> None:
        self.lo = lo
        self.hi = hi


class ChangeGenStreamReader(DataSourceStreamReader):
    """Streaming half of the connector (Spark 4
    ``DataSourceStreamReader``): offsets are LSN positions, each
    trigger admits one ``batchLsns``-sized slice of the log (the
    rate-limited tail read a real transport source performs), and each
    admitted range is split into ``numPartitions`` independent
    executor-side read units. The generator is the same pure-integer
    ``gen_row`` formula, so the STREAM — offsets, batching, partition
    planning and all — is hash-checkable end to end."""

    def __init__(self, options) -> None:  # noqa: ANN001
        self.max_lsn = int(options.get("maxLsn", 10000))
        self.batch_lsns = int(options.get("batchLsns", 2500))
        self.n_parts = int(options.get("numPartitions", 4))
        # Restart liveness: availableNow captures its end offset from
        # the FIRST latestOffset call, so a fresh reader that restarts
        # its cursor at 0 would never plan past the committed start
        # within that run. A real transport asks the external system
        # for its position (Kafka endOffsets do not depend on consumer
        # state); the generator's optional ``positionDir`` cursor file
        # stands in for that external position API.
        self._pos_file = None
        pdir = options.get("positionDir")
        if pdir:
            import os

            os.makedirs(pdir, exist_ok=True)
            self._pos_file = os.path.join(pdir, "POSITION")
        self._pos = self._load_pos()

    def _load_pos(self) -> int:
        if self._pos_file:
            try:
                with open(self._pos_file) as fh:
                    return int(fh.read().strip())
            except (FileNotFoundError, ValueError):
                pass
        return 0

    def _save_pos(self) -> None:
        if self._pos_file:
            import os

            tmp = self._pos_file + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(str(self._pos))
            os.replace(tmp, self._pos_file)

    def initialOffset(self) -> dict:
        return {"lsn": 0}

    def latestOffset(self) -> dict:
        # advance one admission-controlled slice per trigger
        self._pos = min(self._pos + self.batch_lsns, self.max_lsn)
        return {"lsn": self._pos}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["lsn"]), int(end["lsn"])
        # Restart recovery: a fresh reader's _pos starts at 0, but the
        # checkpointed start Spark hands us here is authoritative. Jump
        # _pos forward so subsequent latestOffset calls never plan an
        # end below the committed position (offset regression would
        # replay already-applied LSN slices); the one batch planned
        # before we learned the start degenerates to an empty range.
        if self._pos < s:
            self._pos = s
            self._save_pos()
        if e < s:
            e = s
        n = max(1, self.n_parts)
        step = max(1, (e - s + n - 1) // n)
        return [
            LsnRangePartition(lo, min(lo + step, e))
            for lo in range(s, e, step)
        ] or [LsnRangePartition(s, e)]

    def read(self, partition: LsnRangePartition) -> Iterator[tuple]:
        for lsn in range(partition.lo, partition.hi):
            yield gen_row(lsn)

    def commit(self, end: dict) -> None:
        # committed end is a floor for future offset planning too
        self._pos = max(self._pos, int(end["lsn"]))
        self._save_pos()

    def stop(self) -> None:
        pass


def _stream_reader(self, schema):  # noqa: ANN001
    return ChangeGenStreamReader(self.options)


ChangeGenDataSource.streamReader = _stream_reader
