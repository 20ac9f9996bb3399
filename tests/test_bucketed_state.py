"""BucketedStateTable: incremental apply correctness + the O(touched)
guarantee — untouched buckets are inherited by reference, their files
never rewritten.

The reference applies changes continuously as they arrive
(examples/pgoutput/main.go:115-130); these tests pin the distributed
analog: apply cost tracks the batch's key spread, not the state size.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from cdc_spark.cdc.merge import apply_changes
from cdc_spark.streaming.state import BucketedStateTable

SCHEMA = "id long, name string, qty long, op string, lsn long"


def _changes(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _bucket_files(path: str, man: dict) -> dict[str, list[str]]:
    """bucket id → sorted list of (relpath, sha256) under its dir."""
    out = {}
    for b, rel in man["buckets"].items():
        d = Path(path) / rel
        out[b] = sorted(
            (
                str(p.relative_to(path)),
                hashlib.sha256(p.read_bytes()).hexdigest(),
            )
            for p in d.rglob("*.parquet")
        )
    return out


def _manifest(t: BucketedStateTable, v: int) -> dict:
    with open(os.path.join(t.path, f"v{v}", "MANIFEST.json")) as fh:
        return json.load(fh)


@pytest.fixture()
def table(spark, tmp_path):
    return BucketedStateTable(
        spark, str(tmp_path / "state"), ["id"], n_buckets=8
    )


def test_cold_start_and_read(spark, table):
    assert table.read() is None
    v = table.apply(
        _changes(spark, [(1, "a", 10, "c", 1), (2, "b", 20, "c", 2)]),
        ["name", "qty"],
    )
    assert v == 1
    got = {r.id: (r.name, r.qty) for r in table.read().collect()}
    assert got == {1: ("a", 10), 2: ("b", 20)}


def test_untouched_buckets_inherited_byte_identical(spark, table):
    # seed 64 keys so several buckets are populated
    seed = [(i, f"n{i}", i * 10, "c", i) for i in range(1, 65)]
    table.apply(_changes(spark, seed), ["name", "qty"])
    man1 = _manifest(table, 1)
    files1 = _bucket_files(table.path, man1)
    assert len(man1["buckets"]) > 1  # multiple buckets populated

    # single-key update: exactly one bucket is dirty
    v2 = table.apply(
        _changes(spark, [(7, "updated", 700, "u", 100)]), ["name", "qty"]
    )
    man2 = _manifest(table, v2)
    assert len(man2["touched"]) == 1
    (touched,) = man2["touched"]

    files2 = _bucket_files(table.path, man2)
    for b in man1["buckets"]:
        if int(b) == touched:
            assert man2["buckets"][b].startswith("v2/")
        else:
            # inherited: same manifest entry → same files, same bytes
            assert man2["buckets"][b] == man1["buckets"][b]
            assert files2[b] == files1[b]

    got = {r.id: (r.name, r.qty) for r in table.read().collect()}
    assert got[7] == ("updated", 700)
    assert len(got) == 64


def test_matches_full_apply_semantics(spark, table):
    """Bucketed incremental apply ≡ apply_changes over the whole log."""
    b1 = [(1, "a", 1, "c", 1), (2, "b", 2, "c", 2), (3, "c", 3, "c", 3)]
    b2 = [(2, None, 20, "u", 4), (3, None, None, "d", 5), (4, "d", 4, "c", 6)]
    b3 = [(1, "a2", None, "u", 7), (5, "e", 5, "c", 8)]
    table.apply(_changes(spark, b1), ["name", "qty"])
    table.apply(_changes(spark, b2), ["name", "qty"])
    table.apply(_changes(spark, b3), ["name", "qty"])

    oracle = apply_changes(
        None, _changes(spark, b1 + b2 + b3), ["id"], ["name", "qty"]
    )
    got = sorted(
        (r.id, r.name, r.qty) for r in table.read().collect()
    )
    want = sorted((r.id, r.name, r.qty) for r in oracle.collect())
    assert got == want


def test_truncate_dirties_every_bucket(spark, table):
    seed = [(i, f"n{i}", i, "c", i) for i in range(1, 33)]
    table.apply(_changes(spark, seed), ["name", "qty"])
    v2 = table.apply(
        _changes(
            spark,
            [(0, None, None, "t", 100), (1, "after", 1, "c", 101)],
        ),
        ["name", "qty"],
    )
    man2 = _manifest(table, v2)
    assert man2["touched"] == list(range(8))  # all buckets wiped
    got = {r.id: r.name for r in table.read().collect()}
    assert got == {1: "after"}
    # no inherited (pre-truncate) directories survive in the manifest
    assert all(rel.startswith("v2/") for rel in man2["buckets"].values())


def test_time_travel_versions(spark, table):
    table.apply(_changes(spark, [(1, "v1", 1, "c", 1)]), ["name", "qty"])
    table.apply(_changes(spark, [(1, "v2", 2, "u", 2)]), ["name", "qty"])
    assert table.read(version=1).collect()[0].name == "v1"
    assert table.read(version=2).collect()[0].name == "v2"
    assert table.current_version() == 2


def test_empty_batch_is_noop(spark, table):
    table.apply(_changes(spark, [(1, "a", 1, "c", 1)]), ["name", "qty"])
    v = table.apply(_changes(spark, []), ["name", "qty"])
    assert v == 1
    assert table.current_version() == 1


def test_corrupt_pointer_recovers(spark, table):
    table.apply(_changes(spark, [(1, "a", 1, "c", 1)]), ["name", "qty"])
    table.apply(_changes(spark, [(2, "b", 2, "c", 2)]), ["name", "qty"])
    with open(os.path.join(table.path, "CURRENT"), "w") as fh:
        fh.write("")  # torn write
    assert table.current_version() == 2
    assert table.read().count() == 2


def test_aborted_version_dir_ignored(spark, table):
    table.apply(_changes(spark, [(1, "a", 1, "c", 1)]), ["name", "qty"])
    # simulate a crash mid-write: version dir without a manifest
    os.makedirs(os.path.join(table.path, "v9"), exist_ok=True)
    os.remove(os.path.join(table.path, "CURRENT"))
    assert table.current_version() == 1


def test_delete_then_reinsert_across_batches(spark, table):
    table.apply(_changes(spark, [(1, "a", 1, "c", 1)]), ["name", "qty"])
    table.apply(_changes(spark, [(1, None, None, "d", 2)]), ["name", "qty"])
    assert table.read().count() == 0
    table.apply(_changes(spark, [(1, "back", 9, "c", 3)]), ["name", "qty"])
    got = table.read().collect()
    assert [(r.id, r.name, r.qty) for r in got] == [(1, "back", 9)]


def test_bucket_pruning_reads_only_touched(spark, table):
    """The base scan for an apply only opens touched-bucket dirs."""
    seed = [(i, f"n{i}", i, "c", i) for i in range(1, 65)]
    table.apply(_changes(spark, seed), ["name", "qty"])
    man1 = _manifest(table, 1)
    # drop every bucket dir except key 7's: if apply read them, it
    # would fail — proving untouched buckets are never opened
    b7 = (
        table.spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(7).cast("long")), F.lit(8)).cast("int")
        )
        .collect()[0][0]
    )
    for b, rel in man1["buckets"].items():
        if int(b) != b7:
            for p in (Path(table.path) / rel).rglob("*.parquet"):
                p.rename(p.with_suffix(".hidden"))
    table.apply(
        _changes(spark, [(7, "u7", 70, "u", 99)]), ["name", "qty"]
    )
    # restore for sanity read
    for b, rel in man1["buckets"].items():
        for p in (Path(table.path) / rel).rglob("*.hidden"):
            p.rename(p.with_suffix(".parquet"))
    got = {r.id: r.name for r in table.read().collect()}
    assert got[7] == "u7" and len(got) == 64


def test_compact_buckets_preserves_data_and_folds_files(spark, table):
    from cdc_spark.operators.maintenance import compact_buckets, dir_file_stats

    seed = [(i, f"n{i}", i, "c", i) for i in range(1, 129)]
    # two applies so several buckets hold two file generations' rows;
    # fragment the writes so each bucket dir holds multiple files
    table.apply(_changes(spark, seed).repartition(8), ["name", "qty"])
    table.apply(
        _changes(spark, [(i, f"u{i}", i * 2, "u", 1000 + i) for i in range(1, 129)]
        ).repartition(8),
        ["name", "qty"],
    )
    before = sorted((r.id, r.name, r.qty) for r in table.read().collect())

    v = compact_buckets(table, target_file_bytes=1 << 30, min_files=1)
    assert v == 3
    man = _manifest(table, v)
    assert man.get("compaction") is True
    after = sorted((r.id, r.name, r.qty) for r in table.read().collect())
    assert after == before
    # every compacted bucket holds O(1) files now
    for b, rel in man["buckets"].items():
        stats = dir_file_stats(os.path.join(table.path, rel))
        assert stats["n_files"] <= 2  # range boundary may add one
    # time travel to the pre-compaction version still works
    assert sorted(
        (r.id, r.name, r.qty) for r in table.read(version=2).collect()
    ) == before


def test_compact_buckets_noop_below_threshold(spark, table):
    from cdc_spark.operators.maintenance import compact_buckets

    table.apply(_changes(spark, [(1, "a", 1, "c", 1)]), ["name", "qty"])
    assert compact_buckets(table, min_files=99) == 1


def test_concurrent_writer_detected_and_rolled_back(spark, table):
    from unittest import mock

    from cdc_spark.streaming.state import ConcurrentWriteError

    import pytest

    table.apply(_changes(spark, [(1, "a", 1, "c", 1)]), ["name", "qty"])
    # writer B commits v2 while writer A (same handle, stale read) is
    # mid-apply: force A to plan against v1 by pinning current_version
    with mock.patch.object(table, "current_version", return_value=1):
        with pytest.raises(ConcurrentWriteError):
            # a real interleaving: bump CURRENT under A's feet first
            from cdc_spark.streaming.state import _fsync_replace

            _fsync_replace(
                table._pointer + ".tmp", table._pointer, "2"
            )
            table.apply(
                _changes(spark, [(2, "b", 2, "c", 2)]), ["name", "qty"]
            )
    # loser rolled back: A's prepared v2 directory is gone, and the
    # dangling pointer recovers to the highest valid manifest (v1)
    assert not os.path.exists(table._version_dir(2))
    got = {r.id for r in table.read().collect()}
    assert got == {1}


def test_batch_id_makes_replay_exactly_once(spark, tmp_path):
    """A replayed foreachBatch epoch (same batch_id) must be a no-op:
    no version bump, no bucket rewrite — even though the batch's
    content would otherwise merge 'successfully' a second time."""
    from pyspark.sql import functions as F

    st = BucketedStateTable(spark, str(tmp_path / "eo"), ["k"], n_buckets=4)
    b1 = spark.createDataFrame(
        [("c", 1, 1, "a"), ("c", 2, 2, "b")], "op string, lsn long, k long, v string"
    )
    v1 = st.apply(b1, ["v"], batch_id=7)
    assert st._load_manifest(v1)["batch_id"] == 7
    v2 = st.apply(b1, ["v"], batch_id=7)  # replay
    assert v2 == v1
    # a NEW epoch with overlapping keys applies normally
    b2 = spark.createDataFrame(
        [("u", 3, 1, "a2")], "op string, lsn long, k long, v string"
    )
    v3 = st.apply(b2, ["v"], batch_id=8)
    assert v3 == v1 + 1
    got = sorted((r.k, r.v) for r in st.read().collect())
    assert got == [(1, "a2"), (2, "b")]


def test_batch_id_replay_skip_in_ivm_sink(spark, tmp_path):
    from pyspark.sql import functions as F

    from cdc_spark.streaming.ivm_sink import IncrementalAggregate

    st = BucketedStateTable(spark, str(tmp_path / "rows"), ["k"], n_buckets=4)
    inc = IncrementalAggregate(
        st, str(tmp_path / "agg"), ["g"], {"sum_v": F.col("v")}, n_buckets=2
    )
    b = spark.createDataFrame(
        [("c", 1, 1, "x", 2.0), ("c", 2, 2, "x", 3.0)],
        "op string, lsn long, k long, g string, v double",
    )
    v1 = inc.apply(b, ["g", "v"], batch_id=3)
    rows1 = sorted(
        (r.g, r.n_rows, r.sum_v) for r in inc.read().collect()
    )
    v2 = inc.apply(b, ["g", "v"], batch_id=3)  # replay
    assert v2 == v1
    rows2 = sorted(
        (r.g, r.n_rows, r.sum_v) for r in inc.read().collect()
    )
    assert rows2 == rows1 == [("x", 2, 5.0)]


def test_replication_progress_tracks_applied_lsn(spark, tmp_path):
    st = BucketedStateTable(spark, str(tmp_path / "prog"), ["k"], n_buckets=4)
    assert st.replication_progress() is None
    st.apply(
        spark.createDataFrame(
            [("c", 5, 1, "a"), ("c", 9, 2, "b")],
            "op string, lsn long, k long, v string",
        ),
        ["v"],
        batch_id=0,
    )
    p = st.replication_progress()
    assert p["applied_lsn"] == 9 and p["batch_id"] == 0
    # watermark is monotone even if a later batch carries older lsns
    st.apply(
        spark.createDataFrame(
            [("u", 7, 1, "a2")], "op string, lsn long, k long, v string"
        ),
        ["v"],
        batch_id=1,
    )
    p = st.replication_progress()
    assert p["applied_lsn"] == 9 and p["batch_id"] == 1 and p["version"] == 2


def test_vacuum_keeps_referenced_inherited_buckets(spark, tmp_path):
    """GC must never delete a version directory a retained manifest
    still references through bucket inheritance, and the current
    version must stay fully readable afterward."""
    import os

    st = BucketedStateTable(spark, str(tmp_path / "vac"), ["k"], n_buckets=4)
    schema = "op string, lsn long, k long, v string"
    # v1: seed many keys (all buckets); v2..v4: single-key touches that
    # rewrite one bucket each, inheriting the rest from v1
    st.apply(
        spark.createDataFrame(
            [("c", i, i, f"x{i}") for i in range(1, 9)], schema
        ),
        ["v"],
    )
    for j in range(3):
        st.apply(
            spark.createDataFrame([("u", 100 + j, 1, f"y{j}")], schema),
            ["v"],
        )
    assert st.current_version() == 4
    before = sorted((r.k, r.v) for r in st.read().collect())
    res = st.vacuum(keep_last=2)
    # v1 must survive (v3/v4 inherit buckets from it); at least one
    # superseded intermediate must be gone
    assert 1 in res["kept"]
    assert res["removed"], res
    for v in res["removed"]:
        assert not os.path.exists(st._version_dir(v))
    after = sorted((r.k, r.v) for r in st.read().collect())
    assert after == before
    # time travel to removed versions is gone, retained ones still work
    assert st.read(version=st.current_version()) is not None


def test_ivm_resync_survives_vacuum(spark, tmp_path):
    """If the agg's recorded pre version was vacuumed away, resync
    falls back to a full rebuild and still matches a recompute."""
    from pyspark.sql import functions as F

    from cdc_spark.streaming.ivm_sink import IncrementalAggregate

    st = BucketedStateTable(spark, str(tmp_path / "rows"), ["k"], n_buckets=4)
    inc = IncrementalAggregate(
        st, str(tmp_path / "agg"), ["g"], {"sum_v": F.col("v")}, n_buckets=2
    )
    schema = "op string, lsn long, k long, g string, v double"
    inc.apply(
        spark.createDataFrame(
            [("c", 1, 1, "a", 1.0), ("c", 2, 2, "b", 2.0)], schema
        ),
        ["g", "v"],
    )
    # state-only applies (agg left behind), then vacuum away history
    for j in range(3):
        st.apply(
            spark.createDataFrame(
                [("u", 10 + j, 1, "a", 5.0 + j)], schema
            ),
            ["g", "v"],
        )
    st.vacuum(keep_last=1)
    inc.apply(
        spark.createDataFrame([("c", 50, 3, "b", 9.0)], schema),
        ["g", "v"],
    )
    got = sorted((r.g, r.n_rows, r.sum_v) for r in inc.read().collect())
    assert got == [("a", 1, 7.0), ("b", 2, 11.0)]


def test_read_as_of_lsn_snapshot_consistency(spark, tmp_path):
    """AS-OF-LSN reads resolve to the newest version whose applied
    watermark is <= the asked position — the state exactly as it stood
    at that WAL point."""
    st = BucketedStateTable(spark, str(tmp_path / "asof"), ["k"], n_buckets=4)
    schema = "op string, lsn long, k long, v string"
    st.apply(spark.createDataFrame([("c", 10, 1, "a")], schema), ["v"])
    st.apply(spark.createDataFrame([("u", 20, 1, "a2")], schema), ["v"])
    st.apply(
        spark.createDataFrame(
            [("c", 30, 2, "b"), ("d", 31, 1, None)], schema
        ),
        ["v"],
    )

    def rows(df):
        return sorted((r.k, r.v) for r in df.collect())

    assert rows(st.read_as_of_lsn(10)) == [(1, "a")]
    assert rows(st.read_as_of_lsn(15)) == [(1, "a")]
    assert rows(st.read_as_of_lsn(20)) == [(1, "a2")]
    assert rows(st.read_as_of_lsn(99)) == [(2, "b")]
    assert st.read_as_of_lsn(5) is None  # before any applied state


def test_hot_key_skewed_batch_applies_correctly(spark, tmp_path):
    """Skew stress: a batch where 95% of changes hit ONE key (the
    Zipf-head shape a busy CDC entity produces) must fold to the same
    state as an even batch — the per-key fold is a hash aggregate with
    map-side combine, so the hot key reduces to one row per partition
    before the shuffle rather than concentrating raw rows on one
    reducer."""
    from pyspark.sql import functions as F

    st = BucketedStateTable(spark, str(tmp_path / "hot"), ["k"], n_buckets=8)
    n = 20_000
    rows = spark.range(n).select(
        F.lit("u").alias("op"),
        F.col("id").alias("lsn"),
        # 95% of rows on key 0, the rest spread over 1..999
        F.when(F.col("id") % 20 != 0, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .cast("long")
        .alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    st.apply(rows, ["v"])
    got = {r.k: r.v for r in st.read().collect()}
    # the hot key's final value is the max-lsn update for k=0
    want_hot = f"v{max(i for i in range(n) if i % 20 != 0)}"
    assert got[0] == want_hot
    # spot-check a cold key: max lsn among id%20==0 with id%1000==that key
    assert got[40] == f"v{max(i for i in range(n) if i % 20 == 0 and i % 1000 == 40)}"
    assert len(got) == len(
        {0} | {i % 1000 for i in range(n) if i % 20 == 0}
    )


def test_version_diff_classifies_ops_and_prunes_inherited(spark, table):
    # v1: keys 1..64 so every bucket holds rows
    table.apply(
        _changes(spark, [(i, f"n{i}", i, "c", i) for i in range(1, 65)]),
        ["name", "qty"],
    )
    # v2: update key 1, delete key 2, create key 100, and a no-op
    # rewrite of key 3 (same values — must NOT appear in the diff)
    v2 = table.apply(
        _changes(
            spark,
            [
                (1, "upd", 999, "u", 100),
                (2, None, None, "d", 101),
                (100, "new", 1, "c", 102),
                (3, "n3", 3, "u", 103),
            ],
        ),
        ["name", "qty"],
    )
    diff = table.version_diff(1, v2)
    got = {r.id: (r.op, r.name, r.qty) for r in diff.collect()}
    assert got == {
        1: ("u", "upd", 999),
        2: ("d", None, None),
        100: ("c", "new", 1),
    }
    # pruning: only buckets whose manifest mapping changed are opened —
    # walk the physical plan's file scans and check every root path is
    # a changed-bucket directory
    man1, man2 = _manifest(table, 1), _manifest(table, v2)
    changed_dirs = {
        os.path.normpath(os.path.join(table.path, rel))
        for man in (man1, man2)
        for b, rel in man["buckets"].items()
        if man1["buckets"].get(b) != man2["buckets"].get(b)
    }
    all_dirs = {
        os.path.normpath(os.path.join(table.path, rel))
        for man in (man1, man2)
        for rel in man["buckets"].values()
    }
    assert changed_dirs < all_dirs  # some buckets must be inherited

    def _scan_roots(node, acc):
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            return _scan_roots(node.initialPlan(), acc)
        if cls == "FileSourceScanExec":
            paths = node.relation().location().rootPaths()
            for i in range(paths.size()):
                acc.add(
                    os.path.normpath(
                        paths.apply(i).toString().replace("file:", "")
                    )
                )
        for i in range(node.children().size()):
            _scan_roots(node.children().apply(i), acc)
        return acc

    opened = _scan_roots(
        diff._jdf.queryExecution().executedPlan(), set()
    )
    opened = {p for p in opened if p.startswith(os.path.normpath(table.path))}
    assert opened and opened <= changed_dirs


def test_version_diff_multi_version_span(spark, table):
    # diffs across a span where some buckets changed in v2 only, some
    # in v3 only — both must be covered, all others inherited
    table.apply(
        _changes(spark, [(i, f"n{i}", i, "c", i) for i in range(1, 33)]),
        ["name", "qty"],
    )
    table.apply(_changes(spark, [(5, "a", 50, "u", 100)]), ["name", "qty"])
    v3 = table.apply(
        _changes(spark, [(17, None, None, "d", 200)]), ["name", "qty"]
    )
    diff = table.version_diff(1, v3)
    got = {r.id: r.op for r in diff.collect()}
    assert got == {5: "u", 17: "d"}


def test_apply_widens_schema_mid_stream(spark, table):
    # batch 1: 3-column rows fill several buckets
    table.apply(
        _changes(spark, [(i, f"n{i}", i, "c", i) for i in range(1, 17)]),
        ["name", "qty"],
    )
    # batch 2 carries a NEW payload column (migration-002 shape)
    wide = spark.createDataFrame(
        [(1, "upd", 99, "p1", "u", 100), (40, "new", 1, "p40", "c", 101)],
        "id long, name string, qty long, phone string, op string, lsn long",
    )
    table.apply(wide, ["name", "qty", "phone"])
    got = {r.id: (r.name, r.qty, r.phone) for r in table.read().collect()}
    assert got[1] == ("upd", 99, "p1")
    assert got[40] == ("new", 1, "p40")
    # rows living in INHERITED (never-rewritten) buckets null-backfill
    untouched = [i for i in got if i not in (1, 40)]
    assert untouched and all(got[i][2] is None for i in untouched)


def test_version_diff_across_schema_evolution(spark, table):
    table.apply(
        _changes(spark, [(1, "a", 1, "c", 1), (2, "b", 2, "c", 2)]),
        ["name", "qty"],
    )
    wide = spark.createDataFrame(
        [(1, "a", 1, "p1", "u", 10), (3, "c", 3, "p3", "c", 11)],
        "id long, name string, qty long, phone string, op string, lsn long",
    )
    v2 = table.apply(wide, ["name", "qty", "phone"])
    got = {
        r.id: (r.op, r.phone, r.old_phone)
        for r in table.version_diff(1, v2, include_old=True).collect()
    }
    # key 1: only the NEW column changed (null -> p1) — still a 'u';
    # its old image for the post-evolution column is null by rule
    assert got[1] == ("u", "p1", None)
    assert got[3] == ("c", "p3", None)
    assert 2 not in got  # untouched key in an inherited bucket


def test_local_fs_path_seam(spark, tmp_path):
    """Round 14: the state layer's file IO (manifests, pointer, footer
    counts) is local-filesystem-only through ONE seam — a file: URI
    normalizes to the bare path, any other scheme fails loudly instead
    of feeding a URI to os.listdir."""
    from cdc_spark.streaming.state import local_fs_path

    p = str(tmp_path / "seam_state")
    assert local_fs_path(p) == p
    assert local_fs_path("file:" + p) == p
    assert local_fs_path("file://" + p) == p  # file:///abs form
    with pytest.raises(NotImplementedError):
        local_fs_path("s3://bucket/state")
    with pytest.raises(NotImplementedError):
        local_fs_path("hdfs://nn:8020/state")

    # a file:-prefixed table behaves identically to the bare path
    t = BucketedStateTable(spark, "file:" + p, ["id"], n_buckets=4)
    t.apply(
        _changes(spark, [(1, "a", 10, "c", 1), (2, "b", 20, "c", 2)]),
        ["name", "qty"],
    )
    assert t.path == p
    assert t.row_count() == 2
    assert t.read().count() == 2

    with pytest.raises(NotImplementedError):
        BucketedStateTable(spark, "s3://bucket/state", ["id"])


def test_row_count_matches_read_regardless_of_file_names(spark, tmp_path):
    """r13 ADVICE: row_count() must sum exactly the files read() would
    scan — including data files NOT named part-* (a compaction or
    external writer may name them differently)."""
    import shutil

    t = BucketedStateTable(spark, str(tmp_path / "rc"), ["id"], n_buckets=2)
    t.apply(
        _changes(
            spark,
            [(i, "x", i, "c", i) for i in range(1, 21)],
        ),
        ["name", "qty"],
    )
    v = t.current_version()
    man = _manifest(t, v)
    # rename one data file to a non part- name; the scan still reads it
    for rel in man["buckets"].values():
        d = os.path.join(t.path, rel)
        for name in os.listdir(d):
            if name.startswith("part-") and name.endswith(".parquet"):
                os.replace(
                    os.path.join(d, name),
                    os.path.join(d, "data-renamed.parquet"),
                )
                crc = os.path.join(d, "." + name + ".crc")
                if os.path.exists(crc):
                    os.remove(crc)
                break
        break
    assert t.row_count() == t.read().count() == 20


def test_insert_only_append_generations(spark, tmp_path):
    """Round 14: insert_only=True appends a delta generation per
    touched bucket — prior bucket files are untouched (byte-identical),
    reads/row_count/version_diff see the union, and the result equals
    what the merge path would produce."""
    ta = BucketedStateTable(
        spark, str(tmp_path / "app"), ["id"], n_buckets=4
    )
    tb = BucketedStateTable(
        spark, str(tmp_path / "ref"), ["id"], n_buckets=4
    )
    seed = [(i, "s", i * 10, "c", i) for i in range(1, 9)]
    batch = [(i, "n", i * 10, "c", i) for i in range(100, 110)]
    for t in (ta, tb):
        t.apply(_changes(spark, seed), ["name", "qty"])
    v1 = ta.current_version()
    files_before = _bucket_files(ta.path, _manifest(ta, v1))

    ta.apply(_changes(spark, batch), ["name", "qty"], insert_only=True)
    tb.apply(_changes(spark, batch), ["name", "qty"])

    v2 = ta.current_version()
    man2 = _manifest(ta, v2)
    # every touched bucket's entry is now a [base, delta] list whose
    # head still points at the v1 directory
    lists = {
        b: rel for b, rel in man2["buckets"].items() if isinstance(rel, list)
    }
    assert lists, "append apply produced no generation lists"
    for b, rels in lists.items():
        assert rels[0] == _manifest(ta, v1)["buckets"][b]
        assert rels[-1].startswith(f"v{v2}/")
    # prior generation files byte-identical (never rewritten)
    files_after = _bucket_files(ta.path, _manifest(ta, v1))
    assert files_before == files_after

    a = {tuple(r) for r in ta.read().collect()}
    b_ = {tuple(r) for r in tb.read().collect()}
    assert a == b_ and len(a) == 18
    assert ta.row_count() == tb.read().count() == 18

    diff = {
        (r["op"], r["id"]) for r in ta.version_diff(v1, v2).collect()
    }
    assert diff == {("c", i) for i in range(100, 110)}


def test_insert_only_generation_cap_folds(spark, tmp_path):
    """At max_generations the apply falls back to the merge path and
    the touched buckets fold to a single directory again."""
    t = BucketedStateTable(
        spark,
        str(tmp_path / "cap"),
        ["id"],
        n_buckets=2,
        max_generations=2,
    )
    t.apply(
        _changes(spark, [(i, "s", i, "c", i) for i in range(1, 5)]),
        ["name", "qty"],
    )
    t.apply(
        _changes(spark, [(i, "a", i, "c", i) for i in range(10, 14)]),
        ["name", "qty"],
        insert_only=True,
    )
    man = _manifest(t, t.current_version())
    assert any(isinstance(rel, list) for rel in man["buckets"].values())
    # next insert-only apply hits the cap on the touched buckets and
    # folds them via the merge path (single dir again)
    t.apply(
        _changes(spark, [(i, "b", i, "c", i) for i in range(20, 24)]),
        ["name", "qty"],
        insert_only=True,
    )
    man = _manifest(t, t.current_version())
    assert all(
        not isinstance(rel, list) for rel in man["buckets"].values()
    )
    assert t.read().count() == 12 == t.row_count()


def test_vacuum_pins_generation_heads(spark, tmp_path):
    """Vacuum must keep every version directory any retained
    generation list references."""
    t = BucketedStateTable(
        spark, str(tmp_path / "vac"), ["id"], n_buckets=2
    )
    t.apply(
        _changes(spark, [(1, "s", 1, "c", 1), (2, "s", 2, "c", 2)]),
        ["name", "qty"],
    )
    for i in range(2):
        t.apply(
            _changes(spark, [(10 + i, "a", i, "c", 10 + i)]),
            ["name", "qty"],
            insert_only=True,
        )
    res = t.vacuum(keep_last=1)
    # v1 holds generation heads referenced by the current manifest
    assert 1 in res["kept"]
    assert t.read().count() == 4 == t.row_count()


def test_compact_folds_generations(spark, tmp_path):
    from cdc_spark.operators.maintenance import compact_buckets

    t = BucketedStateTable(
        spark, str(tmp_path / "cmp"), ["id"], n_buckets=2
    )
    t.apply(
        _changes(spark, [(i, "s", i, "c", i) for i in range(1, 5)]),
        ["name", "qty"],
    )
    t.apply(
        _changes(spark, [(i, "a", i, "c", i) for i in range(10, 14)]),
        ["name", "qty"],
        insert_only=True,
    )
    before = {tuple(r) for r in t.read().collect()}
    v_new = compact_buckets(t, min_files=1000)  # lists force the fold
    man = _manifest(t, v_new)
    assert all(not isinstance(rel, list) for rel in man["buckets"].values())
    assert {tuple(r) for r in t.read().collect()} == before
    assert t.row_count() == len(before)
