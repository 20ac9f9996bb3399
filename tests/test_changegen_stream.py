"""ChangeGen streaming reader: offset admission + partition planning.

Pure-Python checks of the DataSourceStreamReader contract (the
end-to-end stream is gated by io10); the batch/stream generators must
agree row-for-row so the SQL oracle covers both.
"""

from __future__ import annotations

from cdc_spark.sources.changegen import (
    ChangeGenStreamReader,
    gen_row,
)


def _reader(**opts):
    base = {"maxLsn": "100", "batchLsns": "30", "numPartitions": "4"}
    base.update({k: str(v) for k, v in opts.items()})
    return ChangeGenStreamReader(base)


def test_offsets_advance_by_slice_and_clamp():
    r = _reader()
    assert r.initialOffset() == {"lsn": 0}
    assert [r.latestOffset()["lsn"] for _ in range(5)] == [
        30, 60, 90, 100, 100  # clamps at maxLsn, then stays
    ]


def test_partitions_cover_range_disjointly():
    r = _reader()
    parts = r.partitions({"lsn": 30}, {"lsn": 60})
    spans = sorted((p.lo, p.hi) for p in parts)
    assert spans[0][0] == 30 and spans[-1][1] == 60
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi == lo  # contiguous, no gap or overlap
    # empty admission window -> no rows to read
    assert all(
        p.hi <= p.lo for p in r.partitions({"lsn": 100}, {"lsn": 100})
    )


def test_stream_rows_equal_batch_formula():
    r = _reader()
    got = [
        row
        for p in r.partitions({"lsn": 0}, {"lsn": 100})
        for row in r.read(p)
    ]
    assert sorted(got) == [gen_row(i) for i in range(100)]


def test_restart_recovers_committed_position():
    """A fresh reader (post-restart) whose first planned batch carries
    a checkpointed start ahead of its in-memory position must not
    regress offsets below the committed start (that would replay
    already-applied LSN slices)."""
    r = _reader()
    # restart: Spark hands the checkpointed start (60) with the stale
    # end the fresh reader planned (30) -> empty range, position jumps
    parts = r.partitions({"lsn": 60}, {"lsn": 30})
    assert all(p.hi <= p.lo for p in parts)
    # subsequent planning resumes FROM the committed position
    assert r.latestOffset()["lsn"] == 90
    parts = r.partitions({"lsn": 60}, {"lsn": 90})
    spans = sorted((p.lo, p.hi) for p in parts)
    assert spans[0][0] == 60 and spans[-1][1] == 90


def test_commit_floors_future_offsets():
    r = _reader()
    r.commit({"lsn": 60})
    assert r.latestOffset()["lsn"] == 90  # 60 + batch, not 0 + batch
