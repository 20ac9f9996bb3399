"""Benchmark entry point (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full plan
execution, no driver collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_spark.queries import REGISTRY  # noqa: E402
from cdc_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",       # scan-heavy agg
    "q03_shipping_priority",     # fact-fact join + top-k
    "q05_local_supplier_volume", # 6-way star join
    "q06_revenue_filter",        # pushdown filter
    "q14_window_topk",           # window rank
    "q25_asof_join",             # as-of (union+window)
    "cdc02_events_merge",        # CDC latest-wins apply
    "cdc03_snapshot_diff",       # polling-CDC diff
    "cdc04_log_compaction",      # latest-by-key
    "cdc09_pipeline_e2e",        # change stream -> merge -> dim -> agg
    "q46_nation_trade_volume",   # 6-way multi-dim join
    "dd01_exact_dedup",          # hash dedup
    "dd03_minhash_lsh",          # minhash+LSH+verify
    "ss01_cosine_topk",          # similarity top-k
    "tx02_quality_score",        # text features
    "tx05_fingerprint",          # shingle fingerprints
    "cdc12_scd2_history",        # SCD2 interval reconstruction
    "tx08_repetition_stats",     # n-gram repetition quality signals
    "dp01_sequence_packing",     # token-budget packing (Arrow UDF)
    "dp03_concat_chunk_plan",    # concat-and-chunk packing (window cumsum)
    "dd09_common_ngram_exposure",# corpus-level duplicate-n-gram signal
    "cdc17_incremental_snapshot",# DBLog watermark-chunk backfill
    "q63_sole_late_supplier",    # double-correlated semi+anti join
    "tx18_curation_pipeline",    # e2e curation composite (filter+dedup+agg)
    "mm03_phash_neardup",        # Arrow perceptual hash + banded pair join
    "q72_time_decayed_engagement",  # decay aggregate (feature-store shape)
    "ss10_hybrid_rrf",           # hybrid keyword+vector RRF retrieval
    "dd12_semantic_dedup",       # SemDeDup: LSH buckets -> cosine -> clusters
    "tx20_link_pagerank",        # 3-round power iteration + checkpoints
    "cdc19_version_diff_feed",   # manifest-diff change-feed reconstruction
    "dd13_incremental_dedup",    # bucket-pruned continuous corpus dedup
    "q74_series_similarity",     # aligned-bucket Pearson correlation top-k
    "dp05_curriculum_order",     # distributed two-pass global row number
    "mm05_interleaved_packing",  # distributed two-pass prefix-sum packing
    "ss15_pq_adc_topk",          # PQ compressed-domain ADC scan
    "ss17_ivfpq_index",          # IVF-PQ partition-pruned compressed probe
    "io24_dynamic_partition_pruning",  # runtime star-join partition pruning
    "q99_kmv_distinct",          # KMV sketch (partial window-group-limit)
    "q104_kmv_set_intersection", # sketch merge + inclusion-exclusion algebra
    "ss23_filtered_ivfpq_probe", # filtered ANN serving path (pruned code scan)
    "q106_mergeable_quantile_sketch",  # bottom-k merge -> quantile estimates
    "q108_priority_weighted_sample",   # weighted bottom-k + subset-sum estimate
    "q110_cms_join_cardinality",       # sketch dot-product join-size estimate
    "q112_cms_heavy_hitters",          # sharded candidate pass + CMS verify
    "dd20_production_neardup",         # sized multi-table LSH, 0.85 threshold
    "ss25_ivf_sized_serving",          # persisted sized-IVF probe (min-of-3 =
                                       # probe-only: the index builds once and
                                       # is cached for the process)
    "st30_streaming_heavy_hitters",    # streaming engine representative in the
                                       # per-round headline (round 12): full
                                       # AvailableNow micro-batch pipeline w/
                                       # CMS maintainer — streaming regressions
                                       # now surface at sf0.1 deltas, not only
                                       # at the sf1/sf10 probes
]


def bench_incremental_apply(spark, sf_dir: str) -> float:
    """CDC apply cost must track the BATCH, not the state.

    Seeds a bucketed state table from `orders` (sf-proportional rows,
    64 buckets — untimed), then times one small-batch apply whose keys
    all hash into a single bucket: the rewrite touches 1/64th of the
    state. Under the old full-snapshot sink this time grew linearly
    with state size; now it is bounded by bucket size + fixed overhead.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cdc_spark.catalog import load_table
    from cdc_spark.streaming.state import BucketedStateTable

    d = tempfile.mkdtemp(prefix="bench_state_")
    try:
        state = BucketedStateTable(spark, d, ["o_orderkey"], n_buckets=64)
        orders = load_table(spark, sf_dir, "orders")
        seed = orders.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.lit("c").alias("op"),
            F.col("o_orderkey").alias("lsn"),
        )
        state.apply(seed, ["o_custkey", "o_totalprice"])  # untimed seed

        # 200-key batch confined to bucket 0 (the pruning case a
        # key-clustered CDC tail produces)
        batch_rows = (
            seed.where(
                F.pmod(F.xxhash64(F.col("o_orderkey")), F.lit(64)) == 0
            )
            .limit(200)
            .collect()
        )
        batch = spark.createDataFrame(batch_rows, seed.schema).select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
            F.lit("u").alias("op"),
            (F.col("lsn") + 10_000_000).alias("lsn"),
        )
        # one untimed warm-up apply (codegen for the merge plan), then
        # min of 3 timed applies: the steady-state micro-batch cost
        # with JVM GC / scheduling noise removed (standard latency
        # measurement; each repetition advances lsn so every apply is
        # a real new version)
        state.apply(batch, ["o_custkey", "o_totalprice"])
        best = None
        for _ in range(3):
            batch = batch.withColumn("lsn", F.col("lsn") + 1)
            t0 = time.time()
            state.apply(batch, ["o_custkey", "o_totalprice"])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def bench_ivm_maintenance(spark, sf_dir: str) -> float:
    """Materialized-aggregate maintenance must also track the BATCH.

    Seeds a bucketed state + per-custkey-segment aggregate from
    `orders` (untimed), then times one 200-key micro-batch through
    IncrementalAggregate.apply: pre/post images come from bucket-pruned
    reads, the delta fold is O(touched groups), and the aggregate
    store rewrites only the buckets those groups hash into. A full
    recompute of the aggregate would scan the whole state instead.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cdc_spark.catalog import load_table
    from cdc_spark.streaming.ivm_sink import IncrementalAggregate
    from cdc_spark.streaming.state import BucketedStateTable

    d = tempfile.mkdtemp(prefix="bench_ivm_")
    try:
        state = BucketedStateTable(
            spark, os.path.join(d, "rows"), ["o_orderkey"], n_buckets=64
        )
        inc = IncrementalAggregate(
            state,
            os.path.join(d, "agg"),
            ["o_seg"],
            {"price_sum": F.col("o_totalprice")},
            n_buckets=16,
        )
        orders = load_table(spark, sf_dir, "orders")
        seed = orders.select(
            "o_orderkey",
            F.pmod(F.col("o_custkey"), F.lit(1000)).alias("o_seg"),
            "o_totalprice",
            F.lit("c").alias("op"),
            F.col("o_orderkey").alias("lsn"),
        )
        inc.apply(seed, ["o_seg", "o_totalprice"])  # untimed seed

        batch_rows = (
            seed.where(
                F.pmod(F.xxhash64(F.col("o_orderkey")), F.lit(64)) == 0
            )
            .limit(200)
            .collect()
        )
        batch = spark.createDataFrame(batch_rows, seed.schema).select(
            "o_orderkey",
            "o_seg",
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
            F.lit("u").alias("op"),
            (F.col("lsn") + 10_000_000).alias("lsn"),
        )
        inc.apply(batch, ["o_seg", "o_totalprice"])  # warm-up
        best = None
        for _ in range(3):
            batch = batch.withColumn("lsn", F.col("lsn") + 1)
            t0 = time.time()
            inc.apply(batch, ["o_seg", "o_totalprice"])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def bench_skewed_hot_key_apply(spark, sf_dir: str) -> float:
    """Skew resilience as a NUMBER, not just a correctness test.

    Seeds a bucketed state from `orders`, then times a 200k-row batch
    where 95% of changes hit ONE key (the Zipf-head shape a busy CDC
    entity produces). The per-key fold is a hash aggregate with
    map-side combine, so the hot key collapses to one row per
    partition before the shuffle — this entry regresses if that shape
    is ever lost (e.g. a window-based fold would put 190k rows on one
    reducer)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cdc_spark.catalog import load_table
    from cdc_spark.streaming.state import BucketedStateTable

    d = tempfile.mkdtemp(prefix="bench_skew_")
    try:
        state = BucketedStateTable(spark, d, ["o_orderkey"], n_buckets=64)
        orders = load_table(spark, sf_dir, "orders")
        seed = orders.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.lit("c").alias("op"),
            F.col("o_orderkey").alias("lsn"),
        )
        state.apply(seed, ["o_custkey", "o_totalprice"])  # untimed seed

        def zipf_batch(lsn_base: int):
            return spark.range(200_000).select(
                # 95% of updates on key 1, the rest spread over real keys
                F.when(F.col("id") % 20 != 0, F.lit(1))
                .otherwise((F.col("id") % 10_000) * 4 + 1)
                .cast("long")
                .alias("o_orderkey"),
                (F.col("id") % 1000).alias("o_custkey"),
                (F.col("id") % 997).cast("double").alias("o_totalprice"),
                F.lit("u").alias("op"),
                (F.col("id") + F.lit(lsn_base)).alias("lsn"),
            )

        state.apply(zipf_batch(10_000_000), ["o_custkey", "o_totalprice"])
        best = None
        for i in range(1, 4):
            b = zipf_batch(10_000_000 + i * 1_000_000)
            t0 = time.time()
            state.apply(b, ["o_custkey", "o_totalprice"])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def bench_ivf_sized_probe(spark, sf_dir: str) -> float:
    """IVF serving-path cost with the corpus-sized nlist (ss24's
    operator), measured the way an index is used: the BUILD (assign
    every vector to its coarse cluster and write the corpus
    partitioned by cluster id — n·nlist·dim work, n^1.5 with the
    sized nlist, FAISS's own build/probe tradeoff) runs UNTIMED, and
    the timed region is one query's probe: planning-time partition
    pruning to the 4 nearest of nlist cluster directories + exact
    cosine rank inside them — n_probe·sqrt(n) rows, SUBLINEAR in
    corpus size. The ss24 gate entry times build+probe together (it
    must rebuild per run to stay oracle-checkable); this number is
    the steady-state serving cost."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cdc_spark.catalog import load_table
    from cdc_spark.operators.ivf import (
        deterministic_codebook,
        ivf_assign,
        ivf_sized_nlist,
        probe_order,
    )
    from cdc_spark.operators.similarity import cosine

    d = tempfile.mkdtemp(prefix="bench_ivf_sized_")
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        nlist = ivf_sized_nlist(emb.count())
        cents = deterministic_codebook(
            emb, "embedding", "vec_id", k=nlist, scale=64
        )
        # untimed build: one pass assigns + lays the corpus out by
        # cluster (arrow opt-in: the bench box carries the executor
        # pandas dependency, and the sized nlist is in its regime)
        ivf_assign(
            emb, "embedding", cents, scale=64, method="arrow"
        ).write.partitionBy("cluster").mode("overwrite").parquet(d)

        q = [
            float(x)
            for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
        ]
        probes = probe_order(q, cents, scale=64)[:4]
        qcol = F.array(*[F.lit(x) for x in q])

        def serve() -> None:
            (
                spark.read.parquet(d)
                .where(F.col("cluster").isin(probes))
                .select(
                    "vec_id",
                    F.round(cosine(F.col("embedding"), qcol), 4).alias(
                        "cosine_sim"
                    ),
                )
                .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
                .limit(10)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )

        serve()  # warm-up
        best = None
        for _ in range(3):
            t0 = time.time()
            serve()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def bench_skew_join_pair(spark, sf_dir: str) -> tuple[float, float]:
    """Plain vs salted shuffle join under one hot key — the q113/st31
    regime as a NUMBER. Broadcast and AQE skew handling are suppressed
    for both sides (the stream-static regime where neither rescue
    exists), so the only variable is the plan: the plain join funnels
    the hot key through one task, the salted join spreads it 16 ways.
    """
    from pyspark.sql import functions as F

    from cdc_spark.catalog import load_table
    from cdc_spark.operators.skew import salted_join

    events = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 3 == 0, F.lit(0))
        .otherwise(F.col("user_id") % 25)
        .cast("int")
        .alias("n_nationkey"),
        "value",
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"), "n_name"
    )
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}

    def run(df) -> float:
        agg = df.groupBy("n_name").agg(
            F.count("*").alias("n"), F.sum("value").alias("total")
        )
        agg.write.format("noop").mode("overwrite").save()  # warm-up
        best = None
        for _ in range(3):
            t0 = time.time()
            agg.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    try:
        spark.conf.set(keys[0], "-1")
        spark.conf.set(keys[1], "-1")
        spark.conf.set(keys[2], "false")
        plain = run(events.join(nation, "n_nationkey"))
        salted = run(salted_join(events, nation, "n_nationkey", salt=16))
        return plain, salted
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# Fixed-plan, scan-bound controls: their plans have not changed since
# round 7, so round-over-round movement in their times measures the
# BOX, not the code. control_mean normalizes every other entry.
CONTROLS = (
    "q01_pricing_summary",
    "q06_revenue_filter",
    "tx02_quality_score",
    "cdc04_log_compaction",
)

# One overhead-bound control alongside the four scan-bound ones
# (round-12 verdict item 5): the scan controls got 23% faster in r12
# while job-overhead-bound entries stayed flat, so the normalized
# series read +7.2% on a faster box. This fixed plan runs 10 tiny
# one-partition jobs touching no data — its time is pure
# scheduler + py4j + job-submission cost, so the pair
# (control_mean, control_overhead_mean) separates scan-speed drift
# from scheduler drift when reading round-over-round deltas.
OVERHEAD_JOBS = 10


def bench_overhead_control(spark) -> float:
    """Min-of-3 of a 10-job no-data loop (1 row, 1 partition each)."""

    def run() -> None:
        for _ in range(OVERHEAD_JOBS):
            spark.range(0, 1, 1, 1).write.format("noop").mode(
                "overwrite"
            ).save()

    run()  # warm-up
    best = None
    for _ in range(3):
        t0 = time.time()
        run()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


# The driver captures bench stdout with a bounded buffer; round 10's
# line was truncated MID-JSON (parsed: null) when inlined derivable
# values doubled its length. The formatter below is the ONE place the
# line is built, and tests/test_bench_contract.py pins: single line,
# json round-trip, length under this budget with margin.
LINE_BUDGET = 4096


def format_bench_line(timings: dict[str, float], sf_dir: str) -> str:
    """ONE compact JSON line (driver contract). Per-query normalized
    values are sec / control_mean — derivable, so NOT inlined;
    control_mean alone carries the normalization."""
    control_mean = round(
        sum(timings[c] for c in CONTROLS) / len(CONTROLS), 4
    )
    # the overhead control is NOT part of the headline sum (it is a
    # meta-measurement of the box, not an engine entry)
    overhead = timings.pop("control_overhead_10jobs", None)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "controls": list(CONTROLS),
        "control_mean": control_mean,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if overhead is not None:
        payload["control_overhead_mean"] = round(
            overhead / OVERHEAD_JOBS, 4
        )
    return json.dumps(payload, separators=(",", ":"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # no console progress bars: the driver captures stdout+stderr with
    # a bounded buffer, and round 10's capture was truncated MID-JSON
    # by megabytes of \r stage-progress noise (BENCH_r10.json parsed:
    # null) — the one JSON line must survive the capture
    spark = get_spark(
        "cdc_spark_bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM (codegen/JIT) with one pass of every headline query
    # at the smallest SF — a deployed engine runs with a warm JVM; the
    # measured numbers then reflect execution, not first-call compile.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            try:
                REGISTRY[name].fn(spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001 — warmup is best-effort
                pass

    # min-of-3 per headline query: single-shot numbers at sf0.1 carry
    # multi-hundred-ms scheduler/GC noise (the round-4 tx05 "+35%"
    # question), which min-of-N removes; round-over-round deltas are
    # then attributable to plan changes, not the draw.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        best = None
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    timings["cdc_incr_apply_small_batch"] = bench_incremental_apply(
        spark, sf_dir
    )
    timings["ivm_agg_maintenance_small_batch"] = bench_ivm_maintenance(
        spark, sf_dir
    )
    timings["cdc_skewed_hot_key_apply"] = bench_skewed_hot_key_apply(
        spark, sf_dir
    )
    plain, salted = bench_skew_join_pair(spark, sf_dir)
    timings["skew_join_plain_hot"] = plain
    timings["skew_join_salted_hot"] = salted
    timings["ivf_sized_probe_serving"] = bench_ivf_sized_probe(
        spark, sf_dir
    )
    timings["control_overhead_10jobs"] = bench_overhead_control(spark)

    # Control normalization in the ARTIFACT, not the narrative: the
    # four fixed-plan controls measure the box; normalized values
    # (sec / control_mean) are comparable across rounds even when the
    # host is contaminated (round 8/9 saw uniform +11-34% control
    # drift with zero code change).
    print(format_bench_line(timings, sf_dir))


if __name__ == "__main__":
    main()
