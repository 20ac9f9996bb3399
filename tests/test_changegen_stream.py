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
