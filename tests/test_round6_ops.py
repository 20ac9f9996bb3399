"""Round-6 operators: PQ/ADC, curriculum shard write, scene
segmentation, Z-order layout — structural/scale properties beyond the
oracle hash checks."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_pq_codes_bounded_and_self_distance_zero(spark):
    from cdc_spark.operators.ivf import (
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )

    emb = _emb(spark)
    cb = pq_codebook(emb, "embedding", "vec_id", dim=64, m=8, k=16)
    assert len(cb) == 8 and all(len(s) == 16 for s in cb)
    assert all(len(c) == 8 for s in cb for c in s)

    coded = pq_encode(emb, "embedding", cb)
    bounds = coded.agg(
        *[F.min(f"pq{s}").alias(f"lo{s}") for s in range(8)],
        *[F.max(f"pq{s}").alias(f"hi{s}") for s in range(8)],
    ).first()
    for s in range(8):
        assert 0 <= bounds[f"lo{s}"] and bounds[f"hi{s}"] < 16

    # vector 0 is itself the 0th seed centroid in every subspace: its
    # codes reconstruct exactly, so its ADC distance to itself is 0
    # and it ranks first
    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    top = pq_adc_topk(emb, "embedding", "vec_id", q, cb, k=5).collect()
    assert top[0].vec_id == 0 and top[0].adc_dist == 0
    # distances are sorted ascending with id tiebreak
    dists = [r.adc_dist for r in top]
    assert dists == sorted(dists)


def test_pq_adc_overlaps_exact_topk(spark):
    """ADC is an approximation; sanity-floor its quality: the exact
    cosine top-10 and the ADC top-10 for the same probe share
    members (beyond the trivial self-match)."""
    from cdc_spark.operators.ivf import pq_adc_topk, pq_codebook
    from cdc_spark.operators.similarity import cosine_topk

    emb = _emb(spark)
    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    cb = pq_codebook(emb, "embedding", "vec_id", dim=64, m=8, k=16)
    adc = {
        r.vec_id
        for r in pq_adc_topk(
            emb, "embedding", "vec_id", q, cb, k=10
        ).collect()
    }
    exact = {
        r.vec_id
        for r in cosine_topk(emb, "embedding", "vec_id", q, 10).collect()
    }
    assert len(adc & exact) >= 2


def test_curriculum_shards_tile_the_total_order(spark):
    from cdc_spark.queries import REGISTRY

    stats = sorted(
        REGISTRY["dp07_curriculum_shard_write"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.shard,
    )
    # shards tile positions contiguously in 1024-doc capacity
    for r in stats:
        assert r.min_pos == r.shard * 1024 + 1
        assert r.max_pos - r.min_pos + 1 == r.n_docs <= 1024
    # curriculum: band never increases across shard boundaries
    for cur, nxt in zip(stats, stats[1:]):
        assert nxt.max_band <= cur.min_band


def test_frame_energies_known_boundary(spark):
    from cdc_spark.operators.multimodal import frame_energies

    payload = bytes([128] * 64 + [178] * 64)
    df = spark.createDataFrame(
        [(0, payload)], "item_id long, payload binary"
    )
    rows = sorted(
        frame_energies(df, window=64).collect(), key=lambda r: r.frame_idx
    )
    assert [(r.frame_idx, r.energy) for r in rows] == [
        (0, 0),
        (1, 50 * 50 * 64),
    ]


def test_zorder_layout_skips_files_on_second_dimension(spark, tmp_path):
    """The point of Z-order: a predicate on the SECOND dimension prunes
    files, where a layout sorted by the first dimension scatters that
    dimension across every file."""
    from cdc_spark.queries.io_queries import morton2

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id",
        (F.col("user_id") % 1024).alias("a"),
        (F.col("event_id") % 1024).alias("b"),
    )
    z_dir, a_dir = str(tmp_path / "z"), str(tmp_path / "a")
    (
        events.withColumn("z", morton2(F.col("a"), F.col("b")))
        .repartitionByRange(8, "z")
        .sortWithinPartitions("z")
        .write.parquet(z_dir)
    )
    (
        events.repartitionByRange(8, "a")
        .sortWithinPartitions("a")
        .write.parquet(a_dir)
    )

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .where(F.col("b").between(200, 231))
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    z_files, a_files = files_touched(z_dir), files_touched(a_dir)
    # b in [200,231] fixes b9=b8=0 — two of the three top Morton bits
    # that bound 8 range-partitioned files -> at most ~2 files carry
    # matches; the a-sorted layout spreads them everywhere
    assert z_files < a_files


def test_striped_packing_bins_balanced(spark):
    from cdc_spark.queries import REGISTRY

    bins = REGISTRY["dp08_striped_packing"].fn(spark, SF_SMOKE).collect()
    assert len(bins) == 64
    totals = [r.total_tokens for r in bins]
    max_doc = max(r.max_tokens for r in bins)
    # striping bounds every bin within one max-doc of the mean
    mean = sum(totals) / len(totals)
    assert max(totals) - min(totals) <= 2 * max_doc
    assert all(abs(t - mean) <= max_doc for t in totals)


def test_map_in_arrow_plan_is_arrow_side(spark):
    from cdc_spark.queries import REGISTRY

    df = REGISTRY["pu06_map_in_arrow"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan
    assert "BatchEvalPython" not in plan


def test_pq_index_scan_never_reads_embeddings(spark, tmp_path):
    """The compressed-domain contract: the persisted code table holds
    no embedding column, and a probe's scan schema is id + codes
    only."""
    from cdc_spark.operators.ivf import PqIndex, pq_codebook

    emb = _emb(spark)
    cb = pq_codebook(emb, "embedding", "vec_id", dim=64, m=8, k=16)
    idx = PqIndex.build(
        spark, str(tmp_path / "pq"), emb, "embedding", "vec_id",
        codebook=cb,
    )
    assert "embedding" not in idx.codes().columns
    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    plan = idx.topk(q)._jdf.queryExecution().executedPlan().toString()
    assert "embedding" not in plan


def test_pq_index_incremental_equals_one_shot(spark, tmp_path):
    from cdc_spark.operators.ivf import PqIndex, pq_adc_topk, pq_codebook

    emb = _emb(spark)
    cb = pq_codebook(emb, "embedding", "vec_id", dim=64, m=8, k=16)
    idx = PqIndex.build(
        spark, str(tmp_path / "pq"), emb.where(F.col("vec_id") < 100),
        "embedding", "vec_id", codebook=cb,
    )
    idx.add(emb.where(F.col("vec_id") >= 100))
    q = emb.where(F.col("vec_id") == 7).first()["embedding"]
    got = [(r.vec_id, r.adc_dist) for r in idx.topk(q, k=8).collect()]
    want = [
        (r.vec_id, r.adc_dist)
        for r in pq_adc_topk(
            emb, "embedding", "vec_id", q, cb, k=8
        ).collect()
    ]
    assert got == want


def test_ivfpq_prunes_partitions_and_reads_codes_only(spark, tmp_path):
    """The combined layout's two claims at once: the probe plan holds
    a cluster PartitionFilter (directory pruning) and never touches
    the embedding column."""
    from cdc_spark.operators.ivf import (
        IvfPqIndex,
        deterministic_codebook,
        pq_codebook,
    )

    emb = _emb(spark)
    coarse = deterministic_codebook(emb, "embedding", "vec_id", k=16)
    cb = pq_codebook(emb, "embedding", "vec_id", dim=64, m=8, k=16)
    idx = IvfPqIndex.build(
        spark, str(tmp_path / "ivfpq"), emb, "embedding", "vec_id",
        coarse=coarse, codebook=cb,
    )
    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    df = idx.topk(q, k=10, n_probe=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    assert "embedding" not in plan
    assert df.count() == 10


def test_jsonlines_sink_commit_is_atomic(spark, tmp_path):
    """No staged (uncommitted) files survive a successful write, and
    the committed files carry exactly the written rows."""
    import os

    from cdc_spark.sources.jsonlines_sink import JsonLinesDataSource

    spark.dataSource.register(JsonLinesDataSource)
    out = str(tmp_path / "sink")
    df = spark.range(100).selectExpr(
        "id AS event_id", "id % 7 AS user_id", "'x' AS event_type"
    )
    df.write.format("cdc_jsonlines").mode("append").option(
        "path", out
    ).save()
    names = os.listdir(out)
    assert names and all(n.startswith("part-") for n in names)
    back = spark.read.schema(
        "event_id long, user_id long, event_type string"
    ).json(out)
    assert back.count() == 100
    assert back.agg(F.sum("event_id")).first()[0] == 4950


def test_ivfpq_incremental_add_equals_one_shot(spark, tmp_path):
    from cdc_spark.operators.ivf import (
        IvfPqIndex,
        deterministic_codebook,
        pq_codebook,
    )

    emb = _emb(spark)
    coarse = deterministic_codebook(emb, "embedding", "vec_id", k=16)
    cb = pq_codebook(emb, "embedding", "vec_id", dim=64, m=8, k=16)

    full = IvfPqIndex.build(
        spark, str(tmp_path / "full"), emb, "embedding", "vec_id",
        coarse=coarse, codebook=cb,
    )
    inc = IvfPqIndex.build(
        spark, str(tmp_path / "inc"), emb.where(F.col("vec_id") < 60),
        "embedding", "vec_id", coarse=coarse, codebook=cb,
    )
    inc.add(emb.where(F.col("vec_id") >= 60))

    q = emb.where(F.col("vec_id") == 3).first()["embedding"]
    got = [(r.vec_id, r.adc_dist) for r in inc.topk(q, k=8).collect()]
    want = [(r.vec_id, r.adc_dist) for r in full.topk(q, k=8).collect()]
    assert got == want


def test_state_metadata_and_statestore_agree(spark, tmp_path):
    """The State Data Source's two formats: state-metadata names the
    operator + store and bounds its batch range; statestore returns
    the per-key rows that must equal the sink's complete output."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.txt"), "w") as fh:
        fh.write("x\ny\nx\nz\nx\ny\n")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("text")
        .load(src)
        .groupBy("value")
        .count()
        .writeStream.format("memory")
        .queryName("t_ssmeta")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    meta = spark.read.format("state-metadata").load(ckpt).collect()
    assert any("stateStoreName" in r.asDict() for r in meta)
    assert meta[0].operatorName  # an aggregation operator is recorded

    state = {
        (r["key"]["value"], r["value"]["count"])
        for r in spark.read.format("statestore").load(ckpt).collect()
    }
    sink = {
        (r["value"], r["count"])
        for r in spark.table("t_ssmeta").collect()
    }
    assert state == sink == {("x", 3), ("y", 2), ("z", 1)}


def test_merge_schema_refuses_int_long_conflict(spark, tmp_path):
    """Pin the failure io17's explicit-schema recipe works around:
    mergeSchema does NOT widen int->long, it refuses."""
    import pytest

    spark.range(3).selectExpr("CAST(id AS INT) AS v").write.parquet(
        str(tmp_path / "p1")
    )
    spark.range(3).selectExpr("CAST(id AS LONG) AS v").write.parquet(
        str(tmp_path / "p2")
    )
    with pytest.raises(Exception, match="CANNOT_MERGE_SCHEMAS|merg"):
        spark.read.option("mergeSchema", "true").parquet(
            str(tmp_path / "p1"), str(tmp_path / "p2")
        ).collect()
