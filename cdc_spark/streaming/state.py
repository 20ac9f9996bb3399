"""Hash-bucketed versioned state: changed-bucket-only incremental apply.

The reference applies each decoded change to its sink continuously
(``examples/pgoutput/main.go:115-130`` — per-row apply as messages
arrive). The distributed analog must NOT rewrite the whole
materialized table per micro-batch: at 100 TB of state, apply cost has
to be O(touched buckets), not O(state). This module provides
Delta-MERGE-shaped semantics without Delta jars:

- state is hash-bucketed by key: ``pmod(xxhash64(keys), n_buckets)``;
- each version is a MANIFEST mapping bucket-id → parquet directory;
  buckets untouched by a batch are *inherited* — the manifest entry
  keeps pointing at the older version's directory, and the files are
  never rewritten (byte-identical by construction, asserted in tests);
- a micro-batch rewrites only the buckets its keys hash into (a
  truncate dirties every bucket — it wipes all keys);
- the CURRENT pointer is fsync'd and swapped atomically; a corrupt or
  missing pointer falls back to the highest version with a readable
  manifest, so a crash mid-write never bricks the table;
- immutable versions double as the audit trail: ``read(version=...)``
  time-travels, exactly as in ``VersionedStateTable``.

Sizing: pick ``n_buckets`` so a bucket is a few tens of GB at the
target scale (100 TB / 4096 ≈ 25 GB). A batch touching k distinct
buckets costs k bucket rewrites; the worst case (keys spread over all
buckets) degenerates to a full MERGE, which is what any engine pays.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from cdc_spark.cdc.merge import apply_changes

_BUCKET = "__bucket"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed a version between this writer's read
    and its commit. The losing write is rolled back (its version
    directory is removed); retry the apply against the new current
    version. One writer per table is the supported regime — a
    Structured Streaming sink serializes batches per checkpoint; this
    guard turns a misconfigured second pipeline into a clean error
    instead of silent lost updates."""


def local_fs_path(path: str) -> str:
    """The state layer's single filesystem seam (round 14).

    Manifests, the CURRENT pointer, footer-metadata counts and staged
    shard moves all use plain local-file IO (``open``/``os.listdir``/
    ``shutil``). That is correct in this harness — every state path is
    a local temp directory by design — but silently WRONG against
    object storage: ``os.listdir("s3://…")`` raises confusingly at
    best. This function is the one place that assumption lives:
    accepts a bare local path or a ``file:`` URI (normalized to the
    bare path), and fails loudly for any other scheme — an object-
    store deployment must route this seam through the Hadoop FS API
    instead of getting wrong results from ``os`` calls on a URI."""
    scheme, sep, rest = path.partition("://")
    if sep:
        if scheme != "file":
            raise NotImplementedError(
                "BucketedStateTable file IO is local-filesystem only; "
                f"got scheme {scheme!r} in {path!r} — this seam needs a "
                "Hadoop-FS-backed implementation for object storage"
            )
        # file://host/p or file:///p -> /p (no remote-host support)
        host, slash, tail = rest.partition("/")
        if host not in ("", "localhost"):
            raise NotImplementedError(
                f"file: URI with remote host {host!r} in {path!r}"
            )
        return "/" + tail if slash else "/"
    if path.startswith("file:"):
        return path[len("file:") :]
    return path


def _fsync_replace(tmp: str, dst: str, payload: str) -> None:
    """Durable pointer write: fsync the file, atomic rename, fsync the
    directory so the rename itself survives a crash."""
    with open(tmp, "w") as fh:
        fh.write(payload)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, dst)
    dfd = os.open(os.path.dirname(dst) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


class BucketedStateTable:
    """Materialized CDC state, hash-bucketed, with incremental apply."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: Sequence[str],
        *,
        n_buckets: int = 16,
        one_file_per_bucket: bool = False,
        max_generations: int = 8,
    ):
        self.spark = spark
        self.path = local_fs_path(path)  # the one FS-assumption seam
        self.keys = list(keys)
        self.n_buckets = n_buckets
        # Generation cap for insert-only appends (round 14): an
        # ``apply(..., insert_only=True)`` APPENDS a delta directory to
        # each touched bucket instead of rewriting its contents —
        # O(batch) written bytes instead of O(touched bucket contents),
        # the LSM discipline for the commonest CDC-dedup shape (probe,
        # anti-join, insert the provably-new keys). Reads union a
        # bucket's generation list; when any touched bucket has
        # ``max_generations`` generations the apply falls back to the
        # normal merge path, which folds those buckets back to one
        # directory — bounded read amplification, coarse compaction.
        self.max_generations = max_generations
        # For SMALL tables (materialized aggregates, dimension state) a
        # pre-write repartition by bucket costs a tiny shuffle and buys
        # exactly one file per bucket — reads open n_buckets footers
        # instead of tasks × n_buckets. Leave False for large row
        # state, where the extra full shuffle of touched data per
        # micro-batch is the wrong trade.
        self.one_file_per_bucket = one_file_per_bucket
        os.makedirs(path, exist_ok=True)

    # --- layout -------------------------------------------------------

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.path, f"v{v}")

    def _manifest_path(self, v: int) -> str:
        return os.path.join(self._version_dir(v), "MANIFEST.json")

    def _load_manifest(self, v: int) -> dict:
        with open(self._manifest_path(v)) as fh:
            return json.load(fh)

    @staticmethod
    def _rels(rel) -> list[str]:
        """A manifest bucket entry is a single relative directory
        (rewritten bucket) or a list of them, oldest first (base +
        appended insert-only generations)."""
        return list(rel) if isinstance(rel, list) else [rel]

    def current_version(self) -> int | None:
        try:
            with open(self._pointer) as fh:
                v = int(fh.read().strip())
            # pointer must reference a readable manifest
            self._load_manifest(v)
            return v
        except (FileNotFoundError, ValueError, json.JSONDecodeError):
            return self._recover_version()

    def _recover_version(self) -> int | None:
        """Corrupt/missing pointer: highest version with a valid
        manifest (a version directory without one is an aborted write)."""
        best = None
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return None
        for name in names:
            if name.startswith("v") and name[1:].isdigit():
                v = int(name[1:])
                try:
                    self._load_manifest(v)
                except (FileNotFoundError, json.JSONDecodeError):
                    continue
                best = v if best is None else max(best, v)
        return best

    # --- bucketing ----------------------------------------------------

    def _bucket_expr(self):
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in self.keys]),
            F.lit(self.n_buckets),
        ).cast("int")

    # --- read / time travel ------------------------------------------

    def read(
        self, version: int | None = None, *, session=None
    ) -> DataFrame | None:
        """``session`` reparents the scan (e.g. onto a foreachBatch
        micro-batch session so it can compose with the batch frame in
        one SQL text); default is the table's own session."""
        v = self.current_version() if version is None else version
        if v is None:
            return None
        man = self._load_manifest(v)
        return self._read_manifest(man, session=session)

    def read_as_of_lsn(self, lsn: int) -> DataFrame | None:
        """Snapshot-consistent read at a replication position: the
        newest version whose applied-LSN watermark is ≤ ``lsn`` (the
        state as it stood when that WAL position had been applied).
        Version manifests double as the LSN→version index — a driver-
        side scan of manifest files, no Spark job; versions predating
        LSN tracking (no watermark recorded) are skipped."""
        v_cur = self.current_version()
        if v_cur is None:
            return None
        best = None
        for v in range(v_cur, 0, -1):
            try:
                man = self._load_manifest(v)
            except (FileNotFoundError, json.JSONDecodeError):
                continue  # vacuumed or aborted version
            applied = man.get("applied_lsn")
            if applied is not None and applied <= lsn:
                best = v
                break
        return self.read(version=best) if best is not None else None

    def version_diff(
        self, v_old: int, v_new: int, *, include_old: bool = False
    ) -> DataFrame | None:
        """Reconstruct the change feed between two committed versions
        (the Delta-CDF shape without Delta): one row per key whose
        image differs, tagged ``op`` 'c' (created), 'u' (updated) or
        'd' (deleted), carrying the v_new image (null values on 'd').

        ``include_old=True`` additionally emits each value column's
        v_old image as ``old_<col>`` (Delta CDF's preimage/postimage
        pair) — what a downstream consumer needs to maintain an
        aggregate from the feed alone: delta = f(new) - f(old), no
        read of the base state.

        Manifests double as the change index: a bucket whose directory
        mapping is identical in both manifests was *inherited* through
        every intermediate apply, so none of its keys changed — only
        buckets whose mapping differs are opened and full-outer-diffed.
        Cost is O(changed buckets), not O(state), exactly the apply
        path's discipline applied to auditing. The reference's analog
        is replaying the WAL between two LSNs (``main.go:66-136``);
        here the versioned layout lets us *derive* that feed from
        state alone.
        """
        man_a = self._load_manifest(v_old)
        man_b = self._load_manifest(v_new)
        ba, bb = man_a["buckets"], man_b["buckets"]
        changed = sorted(
            (b for b in set(ba) | set(bb) if ba.get(b) != bb.get(b)),
            key=int,
        )
        old = self._read_dirs(
            man_a,
            [
                os.path.join(self.path, r)
                for b in changed
                if b in ba
                for r in self._rels(ba[b])
            ],
        )
        new = self._read_dirs(
            man_b,
            [
                os.path.join(self.path, r)
                for b in changed
                if b in bb
                for r in self._rels(bb[b])
            ],
        )
        vcols = [
            f.name
            for f in new.schema.fields
            if f.name not in self.keys and f.name != _BUCKET
        ]
        # schema evolution between the two versions: a column added
        # after v_old is absent from the old read — its old image is
        # null by definition (the widening rule apply() uses)
        new_types = {f.name: f.dataType for f in new.schema.fields}
        old_img = {
            c: (
                F.col(c)
                if c in old.columns
                else F.lit(None).cast(new_types[c])
            )
            for c in vcols
        }
        o = old.select(
            *self.keys,
            *[old_img[c].alias(f"__old_{c}") for c in vcols],
            F.lit(True).alias("__in_old"),
        )
        n = new.select(
            *self.keys, *vcols, F.lit(True).alias("__in_new")
        )
        j = o.join(n, on=self.keys, how="full_outer")
        differs = F.lit(False)
        for c in vcols:
            differs = differs | ~F.col(c).eqNullSafe(F.col(f"__old_{c}"))
        op = (
            F.when(F.col("__in_old").isNull(), F.lit("c"))
            .when(F.col("__in_new").isNull(), F.lit("d"))
            .when(differs, F.lit("u"))
        )
        old_cols = (
            [F.col(f"__old_{c}").alias(f"old_{c}") for c in vcols]
            if include_old
            else []
        )
        return (
            j.select(op.alias("op"), *self.keys, *vcols, *old_cols)
            .where(F.col("op").isNotNull())
        )

    def read_buckets(
        self, bucket_ids, version: int | None = None
    ) -> DataFrame | None:
        """Bucket-pruned read: only the named buckets' directories are
        opened — the I/O analog of partition pruning, O(touched
        buckets) regardless of table size. Buckets with no files yet
        are silently absent (an empty bucket has no rows)."""
        v = self.current_version() if version is None else version
        if v is None:
            return None
        man = self._load_manifest(v)
        wanted = {str(int(b)) for b in bucket_ids}
        dirs = [
            os.path.join(self.path, r)
            for b, rel in man["buckets"].items()
            if b in wanted
            for r in self._rels(rel)
        ]
        return self._read_dirs(man, dirs)

    def _read_dirs(
        self, man: dict, dirs: list[str], session=None
    ) -> DataFrame:
        spark = session or self.spark
        schema = StructType.fromJson(man["schema"])
        if not dirs:
            return spark.createDataFrame([], schema)
        # The manifest records the table's current schema, so the scan
        # needs no footer-based inference (one listing+schema job per
        # read saved — that fixed cost dominates small micro-batch
        # applies). Buckets inherited from before a schema evolution
        # may lack newer columns; an explicit user schema makes the
        # parquet reader fill those with null, which is exactly what
        # mergeSchema=true derived by scanning every footer.
        return spark.read.schema(schema).parquet(*dirs)

    def row_count(self, version: int | None = None) -> int | None:
        """Exact row count of a committed version from parquet footer
        metadata alone — no Spark job, no data read (round 13, guide
        §1.4/§6: ``read().count()`` scanned every bucket just to add
        up numbers each footer already stores; at 100 TB that is a
        full-state pass for one integer). Footer ``num_rows`` is exact
        by the parquet spec, so this equals ``read().count()`` always.
        """
        import pyarrow.parquet as pq

        v = self.current_version() if version is None else version
        if v is None:
            return None
        man = self._load_manifest(v)
        total = 0
        dirs = [
            os.path.join(self.path, r)
            for rel in man["buckets"].values()
            for r in self._rels(rel)
        ]
        for d in dirs:
            for name in os.listdir(d):
                # every non-hidden file — the same visibility rule the
                # parquet scan applies (names starting with '_' or '.'
                # are metadata: _SUCCESS, .crc), so this sums exactly
                # the files read() would scan regardless of how a
                # writer names its data files (r13 ADVICE: the old
                # 'part-' prefix filter silently undercounted any
                # differently-named data file)
                if not name.startswith(("_", ".")):
                    total += pq.ParquetFile(
                        os.path.join(d, name)
                    ).metadata.num_rows
        return total

    def _read_manifest(self, man: dict, session=None) -> DataFrame:
        dirs = [
            os.path.join(self.path, r)
            for rel in man["buckets"].values()
            for r in self._rels(rel)
        ]
        return self._read_dirs(man, dirs, session=session)

    # --- incremental apply -------------------------------------------

    def apply(
        self,
        changes: DataFrame,
        payload: Sequence[str],
        *,
        lsn_col: str = "lsn",
        op_col: str = "op",
        touched_info: tuple[set, bool] | None = None,
        batch_id: int | None = None,
        insert_only: bool = False,
    ) -> int | None:
        """Merge one batch of typed changes; rewrite only touched
        buckets. Returns the new version (or the current one for an
        empty batch). ``touched_info=(bucket_ids, has_truncate)`` lets
        a caller that already scanned the batch skip the scan here.

        ``insert_only=True`` is the caller's GUARANTEE that no change
        key exists in the current state (e.g. the batch was anti-joined
        against a membership probe first — the dd13 shape). The apply
        then APPENDS one delta directory per touched bucket instead of
        reading and rewriting bucket contents: written bytes are
        O(batch), never O(touched bucket contents) — at tens-of-GB
        buckets that is the difference between appending megabytes and
        rewriting terabytes per probe batch. Reads union a bucket's
        generation list (read/read_buckets/version_diff/row_count all
        flatten it); once a touched bucket reaches ``max_generations``
        the apply silently falls back to the merge path, folding those
        buckets to one directory again. A violated guarantee surfaces
        as duplicate keys in ``read()`` — the caller owns the contract
        (this table stores final images, so it cannot re-check without
        the probe the caller already ran). Truncates always take the
        merge path.

        ``batch_id`` (a foreachBatch epoch id) upgrades at-least-once
        replay to exactly-once apply: the committed manifest records
        it, and re-applying the same id is a no-op — the replayed
        batch after a crash between the sink commit and the stream's
        checkpoint commit neither rewrites buckets nor burns a
        version.

        The guard compares against the CURRENT manifest only, so the
        state path and the streaming checkpoint form one unit: deleting
        the checkpoint restarts epoch ids at 0, and if the table's last
        manifest already records batch_id=0 from the prior run, the
        first legitimate new batch would be silently dropped. Reset
        (or retarget) both together — never just the checkpoint."""
        v_cur = self.current_version()
        if (
            batch_id is not None
            and v_cur is not None
            and self._load_manifest(v_cur).get("batch_id") == batch_id
        ):
            return v_cur
        ch = changes.withColumn(_BUCKET, self._bucket_expr())

        if touched_info is None:
            # one bounded 1-row job: which buckets does this batch
            # touch, does it truncate (truncate wipes every key, so
            # every bucket is dirty), and what is its high LSN (the
            # reference's standby ack position, main.go:61-74 — free
            # here, folded into the same scan)? A global aggregate —
            # collect_set is capped at n_buckets — gets map-side
            # partials and a single-row exchange, ~3x cheaper per
            # micro-batch than a grouped shuffle.
            info = ch.agg(
                F.collect_set(F.col(_BUCKET)).alias("bs"),
                F.max(F.col(op_col) == "t").alias("has_t"),
                F.max(F.col(lsn_col)).alias("mx"),
            ).first()
            touched_info = (
                set(info["bs"] or ()),
                bool(info["has_t"]),
                info["mx"],
            )
        touched, any_t = set(touched_info[0]), touched_info[1]
        batch_max_lsn = touched_info[2] if len(touched_info) > 2 else None
        if not touched:
            return v_cur  # empty batch: no new version
        if any_t:
            touched = set(range(self.n_buckets))

        # insert-only append path: no base read, no merge joins — the
        # fold of the batch alone IS the buckets' delta content
        append = (
            insert_only
            and not any_t
            and v_cur is not None
        )
        if append:
            man = self._load_manifest(v_cur)
            if any(
                len(self._rels(man["buckets"][str(b)]))
                >= self.max_generations
                for b in touched
                if str(b) in man["buckets"]
            ):
                append = False  # cap reached: fold via the merge path

        base = None
        if v_cur is not None and not append:
            man = self._load_manifest(v_cur)
            base_dirs = [
                os.path.join(self.path, r)
                for b, rel in man["buckets"].items()
                if int(b) in touched
                for r in self._rels(rel)
            ]
            if base_dirs:
                # read base on the CHANGES frame's session: inside
                # foreachBatch the batch frame lives in a cloned
                # micro-batch session, and apply_changes' one-parse
                # SQL resolves both relations in one session — a
                # base bound to the outer session would not resolve
                base = self._read_dirs(
                    man, base_dirs, session=changes.sparkSession
                )

        if len(touched) < self.n_buckets:
            ch = ch.where(F.col(_BUCKET).isin([int(b) for b in touched]))
        # mid-stream schema evolution (the reference's migration-002
        # story, 002_user_field.up.sql): a batch may carry payload
        # columns the stored schema predates — widen the base with
        # nulls so the merge sees both sides full-width; the committed
        # manifest then records the widened schema, and inherited
        # old buckets null-backfill on read (_read_dirs). Column DROP
        # is deliberately not folded in (an analytics sink keeps the
        # history; dropped columns just stop receiving values).
        if base is not None:
            ch_types = {f.name: f.dataType for f in ch.schema.fields}
            for c in payload:
                if c not in base.columns and c in ch_types:
                    base = base.withColumn(
                        c, F.lit(None).cast(ch_types[c])
                    )
        new_state = apply_changes(
            base,
            ch.drop(_BUCKET),
            self.keys,
            payload,
            lsn_col=lsn_col,
            op_col=op_col,
            # the touched-bucket scan above already looked at every op:
            # skip the truncate subplan when none is present
            may_truncate=any_t,
        )

        # applied-LSN watermark: the confirmed replication position
        # (monotone across versions; the analog of the standby status
        # update the reference sends every 10s)
        prev_lsn = None
        if v_cur is not None:
            prev_lsn = self._load_manifest(v_cur).get("applied_lsn")
        applied = max(
            (x for x in (prev_lsn, batch_max_lsn) if x is not None),
            default=None,
        )
        meta: dict = {}
        if batch_id is not None:
            meta["batch_id"] = batch_id
        if applied is not None:
            meta["applied_lsn"] = applied
        return self._commit_new_version(
            new_state, touched, v_cur, meta or None, append=append
        )

    def vacuum(self, *, keep_last: int = 2) -> dict:
        """Version GC: drop history beyond the last ``keep_last``
        versions while never touching a file a retained manifest still
        references.

        Bucket inheritance makes naive deletion wrong: manifest vN may
        point at ``vK/__bucket=i`` for K << N (the bucket was never
        rewritten since), so a version directory stays pinned as long
        as ANY retained manifest references it. Unreferenced, unretained
        version directories (superseded bucket rewrites + aborted
        writes) are removed whole. Time travel shrinks to the retained
        window; the IVM sink's resync handles a vacuumed-away pre
        version by falling back to a full rebuild. O(versions) driver
        work, no Spark job.

        Returns ``{"removed": [...], "kept": [...]}`` (version ints).
        """
        import shutil

        v_cur = self.current_version()
        if v_cur is None:
            return {"removed": [], "kept": []}
        versions = sorted(
            int(n[1:])
            for n in os.listdir(self.path)
            if n.startswith("v") and n[1:].isdigit()
        )
        retained = [v for v in versions if v > v_cur - keep_last]
        pinned: set[int] = set(retained)
        for v in retained:
            try:
                man = self._load_manifest(v)
            except (FileNotFoundError, json.JSONDecodeError):
                continue
            for rel in man["buckets"].values():
                for r in self._rels(rel):
                    head = r.split("/", 1)[0]
                    if head.startswith("v") and head[1:].isdigit():
                        pinned.add(int(head[1:]))
        removed = []
        for v in versions:
            if v not in pinned:
                shutil.rmtree(self._version_dir(v), ignore_errors=True)
                removed.append(v)
        return {"removed": removed, "kept": sorted(pinned)}

    def replication_progress(self) -> dict | None:
        """Confirmed replication position + commit metadata of the
        current version — the engine's standby-status surface (the
        reference acks its applied LSN upstream every 10s,
        main.go:61-74; here the manifest IS the ack record). Pure
        manifest reads, no Spark job."""
        v = self.current_version()
        if v is None:
            return None
        man = self._load_manifest(v)
        return {
            "version": v,
            "applied_lsn": man.get("applied_lsn"),
            "batch_id": man.get("batch_id"),
            "n_buckets": man["n_buckets"],
            "last_touched_buckets": man.get("touched", []),
        }

    def overwrite_buckets(
        self,
        new_rows: DataFrame,
        bucket_ids,
        *,
        version: int | None = None,
        extra_meta: dict | None = None,
    ) -> int:
        """Replace the content of the named buckets with ``new_rows``
        (which must contain only keys hashing into those buckets);
        untouched buckets are inherited. The fast path for callers
        that already computed the buckets' final rows — no merge.
        ``extra_meta`` lands in the new version's manifest (e.g. the
        row-state version a derived aggregate reflects)."""
        v_cur = self.current_version() if version is None else version
        return self._commit_new_version(
            new_rows, {int(b) for b in bucket_ids}, v_cur, extra_meta
        )

    def commit_meta(self, extra_meta: dict, *, version: int | None = None) -> int:
        """Metadata-only commit: a new version inheriting every bucket
        unchanged, with ``extra_meta`` merged into the manifest. No
        Spark job — pure manifest/pointer work."""
        v_cur = self.current_version() if version is None else version
        if v_cur is None:
            raise ValueError("commit_meta requires an existing version")
        prev = self._load_manifest(v_cur)
        v_new = v_cur + 1
        os.makedirs(self._version_dir(v_new), exist_ok=True)
        manifest = {
            "version": v_new,
            "n_buckets": self.n_buckets,
            "keys": self.keys,
            "schema": prev["schema"],
            "buckets": prev["buckets"],
            "touched": [],
        }
        manifest.update(extra_meta)
        _fsync_replace(
            self._manifest_path(v_new) + ".tmp",
            self._manifest_path(v_new),
            json.dumps(manifest, indent=1),
        )
        self._commit_pointer(v_cur, v_new)
        return v_new

    def _commit_new_version(
        self,
        new_state: DataFrame,
        touched: set,
        v_cur: int | None,
        extra_meta: dict | None = None,
        *,
        append: bool = False,
    ) -> int:
        prev_buckets: dict[str, str | list] = {}
        if v_cur is not None:
            prev_buckets = self._load_manifest(v_cur)["buckets"]
        v_new = (v_cur or 0) + 1
        target = self._version_dir(v_new)
        # no pre-write repartition (saves a full shuffle of the touched
        # data per micro-batch). Tradeoff: each output task may write a
        # file into every touched-bucket dir, so a version holds up to
        # tasks × |touched| files; AQE coalesces small merges to few
        # tasks, and compaction (operators/maintenance.py) folds
        # fragments when the count matters.
        out = new_state.withColumn(_BUCKET, self._bucket_expr())
        if self.one_file_per_bucket:
            out = out.repartition(self.n_buckets, F.col(_BUCKET))
        out.write.partitionBy(_BUCKET).mode("overwrite").parquet(target)

        written = {
            int(name.split("=", 1)[1]): f"v{v_new}/{name}"
            for name in os.listdir(target)
            if name.startswith(f"{_BUCKET}=")
        }
        if append:
            # insert-only delta: touched buckets KEEP their previous
            # directories and gain one generation; a touched bucket
            # with no written file (claimed but empty) inherits as-is
            buckets = dict(prev_buckets)
            for b, rel in written.items():
                sb = str(b)
                if sb in buckets:
                    buckets[sb] = self._rels(buckets[sb]) + [rel]
                else:
                    buckets[sb] = rel
        else:
            buckets = {
                b: rel
                for b, rel in prev_buckets.items()
                if int(b) not in touched
            }
            buckets.update({str(b): rel for b, rel in written.items()})
        manifest = {
            "version": v_new,
            "n_buckets": self.n_buckets,
            "keys": self.keys,
            "schema": json.loads(new_state.schema.json()),
            "buckets": buckets,
            "touched": sorted(touched),
        }
        if extra_meta:
            manifest.update(extra_meta)
        # manifest lands before the pointer: a crash in between leaves
        # a complete, unreferenced version that recovery may adopt
        _fsync_replace(
            self._manifest_path(v_new) + ".tmp",
            self._manifest_path(v_new),
            json.dumps(manifest, indent=1),
        )
        self._commit_pointer(v_cur, v_new)
        return v_new

    def _commit_pointer(self, v_expected: int | None, v_new: int) -> None:
        """Optimistic-concurrency commit: swap CURRENT only if it still
        names the version this writer planned against; otherwise roll
        the prepared version back and raise ``ConcurrentWriteError``."""
        try:
            with open(self._pointer) as fh:
                now = int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            now = None
        if now != v_expected:
            import shutil

            shutil.rmtree(self._version_dir(v_new), ignore_errors=True)
            raise ConcurrentWriteError(
                f"state table {self.path}: expected version {v_expected} "
                f"at commit but found {now}; apply was rolled back — "
                "re-read and retry"
            )
        _fsync_replace(self._pointer + ".tmp", self._pointer, str(v_new))
