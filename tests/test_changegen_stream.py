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


def test_e2e_restart_does_not_replay_lsns(tmp_path):
    """Real streaming restart: run 1 drains to maxLsn=5000, run 2
    reuses the checkpoint with the log grown to 10000 and a FRESH
    reader (in-memory cursor back at 0). The committed-start clamp
    must prevent replaying applied LSN slices, and the optional
    positionDir cursor (the generator's stand-in for a real
    transport's external position API) must let the reader resume
    without a dead first batch. Both recovery paths end with every
    LSN delivered exactly once."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    from cdc_spark.session import get_spark
    from cdc_spark.sources.changegen import ChangeGenDataSource

    spark = get_spark("cdc_spark_tests", shuffle_partitions=8)
    try:
        spark.dataSource.register(ChangeGenDataSource)
    except Exception:
        pass

    def run(tag, max_lsn, with_pos_dir):
        feed = (
            spark.readStream.format("cdc_changegen")
            .option("maxLsn", str(max_lsn))
            .option("batchLsns", "2500")
            .option("numPartitions", "4")
        )
        if with_pos_dir:
            feed = feed.option("positionDir", str(tmp_path / f"{tag}_pos"))
        q = (
            feed.load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / f"{tag}_out"))
            .option("checkpointLocation", str(tmp_path / f"{tag}_ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)

    for tag, with_pos in (("clamp", False), ("cursor", True)):
        run(tag, 5000, with_pos)
        run(tag, 10000, with_pos)  # fresh reader, grown log, same ckpt
        got = spark.read.parquet(str(tmp_path / f"{tag}_out"))
        assert got.count() == 10000, tag       # nothing replayed
        assert got.select("lsn").distinct().count() == 10000, tag
        lo = got.agg({"lsn": "min"}).first()[0]
        hi = got.agg({"lsn": "max"}).first()[0]
        assert (lo, hi) == (0, 9999), tag      # no gap either
