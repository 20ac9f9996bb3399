"""Table maintenance: small-file compaction and layout rewrite.

At 100 TB the silent killer is file-count, not byte-count: a CDC
pipeline writing a micro-batch per trigger produces thousands of
KB-sized parquet files per day, and every downstream scan pays
per-file open/footer costs (plus driver-side listing memory). The
reference never faces this — its sink is a terminal log
(`examples/pgoutput/main.go:429-445`) — but any real deployment of the
deck's sync-to-analytics-DB pattern (CDC_small.pdf slides 33-37) does.

Compaction here is expressed as a *versioned rewrite*: read the
current snapshot, repartition to the byte-budgeted file count,
optionally sort within partitions for data-skipping locality, and
publish as a new immutable version via the same atomic pointer swap
the streaming sink uses. Readers never see a half-compacted table, and
the pre-compaction version stays readable (time travel / audit).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from cdc_spark.streaming.pipeline import VersionedStateTable


def dir_file_stats(path: str) -> dict:
    """Parquet data-file census for one table/version directory.

    Local-FS walk; on a cluster the same numbers come from the
    FileSystem listing API (or the table format's manifest), with the
    identical decision shape downstream.
    """
    sizes = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                sizes.append(os.path.getsize(os.path.join(root, f)))
    n = len(sizes)
    total = sum(sizes)
    return {
        "n_files": n,
        "total_bytes": total,
        "avg_file_bytes": total // n if n else 0,
    }


def needs_compaction(
    stats: dict,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 8,
) -> bool:
    """Compact when there are enough files to matter AND the average
    file is under a quarter of target — the classic post-streaming
    fragmentation signature. One big file or a handful of right-sized
    ones never triggers a rewrite."""
    return (
        stats["n_files"] >= min_files
        and stats["avg_file_bytes"] < target_file_bytes // 4
    )


def compact(
    state: VersionedStateTable,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite the current snapshot into byte-budgeted files.

    File count = ceil(current_bytes / target): parquet re-encoding
    changes sizes, so the budget is approximate — the point is order-
    of-magnitude (thousands of KB files → tens of 128 MB files).
    ``sort_by`` additionally range-partitions and sorts rows so each
    output file covers a narrow key range: parquet min/max footer
    stats then let later scans skip whole files (zone-map pruning) —
    the cheap local substitute for Z-ordering when there is one
    dominant filter column.

    Returns the new version number; the pre-compaction version remains
    readable via ``state.read(version=...)``.
    """
    v = state.current_version()
    if v is None:
        raise ValueError("cannot compact an empty state table")
    df = state.read()
    stats = dir_file_stats(os.path.join(state.path, f"v{v}"))
    n_out = max(1, math.ceil(stats["total_bytes"] / target_file_bytes))
    if sort_by:
        df = df.repartitionByRange(n_out, *[F.col(c) for c in sort_by])
        df = df.sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n_out)
    return state.write(df)
