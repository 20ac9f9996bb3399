"""Custom Python DataSource WRITER: a two-phase-commit JSONL sink.

The write half of the Spark 4 Python DataSource API, completing the
connector surface beside the batch reader (io08) and stream reader
(io10) in ``changegen.py``. The contract a real external-system sink
(search index, feature store, queue) implements:

- ``write(iterator)`` runs once per task on executors and stages its
  partition's rows into a temp file, returning a commit message —
  nothing is visible to readers yet;
- ``commit(messages)`` runs on the driver only after EVERY task
  succeeded and atomically renames the staged files into place — the
  all-or-nothing barrier (a failed/speculated task's staging is
  discarded by ``abort``), mirroring how the reference's Dump sink
  only acks after a successful apply (main.go:429-445).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class FileStaged(WriterCommitMessage):
    tmp: str
    final: str


class JsonLinesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_jsonlines"

    def writer(self, schema, overwrite: bool) -> "JsonLinesWriter":  # noqa: ANN001
        return JsonLinesWriter(self.options, overwrite=overwrite)


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options, *, overwrite: bool = False) -> None:  # noqa: ANN001
        self.path = options.get("path")
        self.overwrite = overwrite
        if not self.path:
            raise ValueError("cdc_jsonlines sink requires option 'path'")

    def write(self, iterator) -> FileStaged:  # noqa: ANN001
        """Executor-side: stage this partition's rows; invisible until
        the driver's commit renames them."""
        os.makedirs(self.path, exist_ok=True)
        token = uuid.uuid4().hex
        tmp = os.path.join(self.path, f"._stage-{token}.jsonl")
        final = os.path.join(self.path, f"part-{token}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        if n == 0:
            os.remove(tmp)
            return FileStaged(tmp="", final="")
        return FileStaged(tmp=tmp, final=final)

    def commit(self, messages) -> None:  # noqa: ANN001
        # all tasks succeeded: atomically expose every staged file.
        # mode('overwrite') must actually replace the directory's
        # contents — clear pre-existing published parts first (the
        # staged set keeps distinct ._stage names, so only prior
        # commits' files match), otherwise overwrite silently
        # degrades to append.
        if self.overwrite:
            import glob

            for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                os.remove(old)
        for m in messages:
            if m.tmp:
                os.replace(m.tmp, m.final)

    def abort(self, messages) -> None:  # noqa: ANN001
        for m in messages:
            if m and m.tmp and os.path.exists(m.tmp):
                os.remove(m.tmp)


class JsonLinesStreamWriter(DataSourceStreamWriter):
    """Streaming half of the sink (``DataSourceStreamWriter``),
    completing the connector API's fourth quadrant beside the batch
    reader (io08), stream reader (io10) and batch writer (io16).

    Same staging discipline per micro-batch, with the batch id woven
    into the COMMITTED file names: ``commit(messages, batch_id)``
    publishes ``batch-<id>-*.jsonl`` atomically, so a replayed batch
    (crash between sink commit and checkpoint commit) overwrites its
    own files instead of duplicating rows — idempotent, exactly-once
    for downstream file readers."""

    def __init__(self, options) -> None:  # noqa: ANN001
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_jsonlines sink requires option 'path'")

    def write(self, iterator):  # noqa: ANN001
        import uuid as _uuid

        os.makedirs(self.path, exist_ok=True)
        token = _uuid.uuid4().hex
        tmp = os.path.join(self.path, f"._stage-{token}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        if n == 0:
            os.remove(tmp)
            return FileStaged(tmp="", final="")
        return FileStaged(tmp=tmp, final="")

    def commit(self, messages, batch_id) -> None:  # noqa: ANN001
        # A replayed micro-batch may stage FEWER files than the
        # pre-crash attempt (different parallelism after restart, or
        # a crash mid-commit): index-named renames alone would leave
        # stale higher-index files duplicating rows. Clear every file
        # this batch id ever published before renaming the staged
        # set — that makes the publish idempotent as a SET, not just
        # per index.
        import glob

        for old in glob.glob(
            os.path.join(self.path, f"batch-{batch_id}-*.jsonl")
        ):
            os.remove(old)
        for i, m in enumerate(messages):
            if m and m.tmp:
                final = os.path.join(
                    self.path, f"batch-{batch_id}-{i}.jsonl"
                )
                os.replace(m.tmp, final)

    def abort(self, messages, batch_id) -> None:  # noqa: ANN001
        for m in messages:
            if m and m.tmp and os.path.exists(m.tmp):
                os.remove(m.tmp)


def _stream_writer(self, schema, overwrite):  # noqa: ANN001
    return JsonLinesStreamWriter(self.options)


JsonLinesDataSource.streamWriter = _stream_writer
