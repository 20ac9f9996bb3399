"""Property tests for operators/sketches.py (KMV + count-min).

Mirrors tests/test_ordering.py's approach for the ordering primitives:
the sketch invariants are checked against exact recomputation over
randomized inputs, plus the plan shapes that make them 100 TB-safe
(WindowGroupLimit Partial, fixed counter-grid size).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_spark.operators.sketches import (
    countmin_counters,
    kmv_estimate,
    kmv_sketch,
)


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "grp string, v long")


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=400),
        ),
        min_size=1,
        max_size=300,
    ),
    k=st.sampled_from([1, 4, 16]),
)
def test_kmv_sketch_invariants(spark, data, k):
    df = _df(spark, data)
    sk = kmv_sketch(df, ["grp"], "v", k).collect()
    per_group: dict[str, list[int]] = {}
    for r in sk:
        per_group.setdefault(r.grp, []).append(r._h)
    exact = {
        r.grp: r.n
        for r in df.groupBy("grp")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    assert set(per_group) == set(exact)
    for g, hashes in per_group.items():
        # at most k DISTINCT hashes per group, exactly min(k, ndv)
        assert len(hashes) == len(set(hashes)) == min(k, exact[g])
        # they are the k SMALLEST: every retained hash is <= any
        # excluded one — verified via the full hash set
        full = sorted(
            r._h
            for r in kmv_sketch(
                df.where(F.col("grp") == g), ["grp"], "v", 10**6
            ).collect()
        )
        assert sorted(hashes) == full[: min(k, exact[g])]


def test_kmv_estimate_exact_below_k(spark):
    # 10 distinct values, k=16: the sketch IS the value set, the
    # estimator must return the exact count
    df = _df(spark, [("a", i) for i in range(10)] * 3)
    out = (
        kmv_sketch(df, ["grp"], "v", 16)
        .groupBy("grp")
        .agg(F.max("_h").alias("kth"), F.count("*").alias("n"))
        .select(kmv_estimate(F.col("kth"), F.col("n"), 16).alias("est"))
        .collect()
    )
    assert out[0].est == 10.0


def test_kmv_estimate_reasonable_above_k(spark):
    # 400 distinct values, k=64: estimator should land within ~50%
    # (loose bound — determinism, not accuracy, is the gated claim;
    # accuracy here just guards against an off-by-domain bug)
    df = _df(spark, [("a", i) for i in range(400)])
    out = (
        kmv_sketch(df, ["grp"], "v", 64)
        .groupBy("grp")
        .agg(F.max("_h").alias("kth"), F.count("*").alias("n"))
        .select(kmv_estimate(F.col("kth"), F.col("n"), 64).alias("est"))
        .collect()
    )
    assert 200 <= out[0].est <= 800


def test_kmv_plan_has_partial_group_limit(spark):
    df = _df(spark, [("a", i) for i in range(50)])
    plan = (
        kmv_sketch(df, ["grp"], "v", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the map-side top-k push-down that bounds per-group reducer input
    assert "WindowGroupLimit" in plan and "Partial" in plan


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.integers(min_value=0, max_value=50),
        min_size=1,
        max_size=200,
    )
)
def test_countmin_never_underestimates(spark, data):
    df = spark.createDataFrame([(v,) for v in data], "v long")
    counters = countmin_counters(df, "v", depth=4, width=32)
    rows = counters.collect()
    # grid bound: at most depth x width cells, total mass = depth x n
    assert len(rows) <= 4 * 32
    assert sum(r.cnt for r in rows) == 4 * len(data)
    # point estimates: min over rows >= true frequency (CMS guarantee)
    from collections import Counter

    from cdc_spark.operators.dedup import portable_hash60

    truth = Counter(data)
    probe = spark.createDataFrame(
        [(v,) for v in truth], "v long"
    ).select(
        "v",
        F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("j"),
    ).withColumn(
        "bucket",
        portable_hash60(
            F.concat_ws(
                ":", F.col("j").cast("string"), F.col("v").cast("string")
            )
        )
        % 32,
    )
    est = {
        r.v: r.est
        for r in probe.join(counters, ["j", "bucket"])
        .groupBy("v")
        .agg(F.min("cnt").alias("est"))
        .collect()
    }
    for v, n in truth.items():
        assert est[v] >= n, f"CMS underestimated {v}: {est[v]} < {n}"


def test_countmin_exact_when_no_collisions(spark):
    # a single value cannot collide with itself: estimate is exact
    df = spark.createDataFrame([(7,)] * 25, "v long")
    rows = countmin_counters(df, "v", depth=4, width=32).collect()
    assert all(r.cnt == 25 for r in rows) and len(rows) == 4


def test_bottomk_grouped_plan_has_partial_group_limit(spark):
    """The per-shard bottom-k (q106/q107/st28's sketch builder) must
    keep the map-side top-k push-down: every task forwards at most k
    rows per group before the shuffle."""
    from cdc_spark.operators.sketches import bottomk_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(200)], "uid long, shard string"
    )
    plan = (
        bottomk_sample(df, "uid", 8, group_col="shard")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    members=st.sets(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=80
    ),
    probes=st.sets(
        st.integers(min_value=0, max_value=1000), min_size=1, max_size=60
    ),
)
def test_bloom_no_false_negatives(spark, members, probes):
    from cdc_spark.operators.dedup import portable_hash60
    from cdc_spark.operators.sketches import bloom_words

    mdf = spark.createDataFrame([(v,) for v in members], "v long")
    words = bloom_words(mdf, "v", m_bits=512, depth=3)
    rows = words.collect()
    assert len(rows) <= 512 // 62 + 1
    pdf = spark.createDataFrame([(v,) for v in probes], "v long")
    pp = pdf.select(
        "v",
        F.explode(F.array(*[F.lit(j) for j in range(3)])).alias("j"),
    ).withColumn(
        "pos",
        portable_hash60(
            F.concat_ws(
                ":", F.col("j").cast("string"), F.col("v").cast("string")
            )
        )
        % 512,
    ).withColumn("word", (F.col("pos") / 62).cast("long"))
    got = {
        r.v: r.claimed
        for r in pp.join(words, "word", "left")
        .withColumn(
            "s",
            F.expr(
                "coalesce(shiftright(bits, CAST(pos % 62 AS INT)) & 1, 0)"
            ),
        )
        .groupBy("v")
        .agg((F.min("s") == 1).alias("claimed"))
        .collect()
    }
    for v in probes:
        if v in members:
            assert got[v], f"false negative for member {v}"


_bk_rows = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1", "s2", "s3"]),  # shard
        st.integers(min_value=0, max_value=10_000),  # value
    ),
    min_size=1,
    max_size=200,
    unique_by=lambda t: t,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_bk_rows, k=st.sampled_from([1, 8, 32]))
def test_bottomk_merge_equivalence(spark, rows, k):
    """Cohen-Kaplan lossless union: the bottom-k of per-shard
    bottom-ks re-limited to k IS the global bottom-k — so shards
    sample independently and quantile estimates from the merged
    sample equal the single-pass truth (q106's merge step)."""
    from cdc_spark.operators.sketches import (
        bottomk_sample,
        sample_quantiles,
    )

    data = [(i, s, v) for i, (s, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "uid long, shard string, v long")
    direct = bottomk_sample(df, "uid", k)
    shards = bottomk_sample(df, "uid", k, group_col="shard")
    merged = shards.orderBy("_h", "uid").limit(k)
    d_rows = {(r.uid, r._h) for r in direct.collect()}
    m_rows = {(r.uid, r._h) for r in merged.collect()}
    assert m_rows == d_rows
    qs = (("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10))
    est_direct = {
        r.quantile: (r.sample_rank, r.est)
        for r in sample_quantiles(direct, "v", "uid", qs).collect()
    }
    est_merged = {
        r.quantile: (r.sample_rank, r.est)
        for r in sample_quantiles(merged, "v", "uid", qs).collect()
    }
    assert est_merged == est_direct


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_bk_rows)
def test_sample_quantiles_exact_when_sample_is_population(spark, rows):
    """With k >= n the bottom-k sample IS the population, so the
    rank-interpolated estimate must equal the exact rank-ceil(q*n)
    quantile recomputed in Python."""
    import math

    from cdc_spark.operators.sketches import (
        bottomk_sample,
        sample_quantiles,
    )

    data = [(i, v) for i, (_, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "uid long, v long")
    sample = bottomk_sample(df, "uid", 10**6)
    qs = (("p25", 1, 4), ("p50", 1, 2), ("p99", 99, 100))
    got = {
        r.quantile: r.est
        for r in sample_quantiles(sample, "v", "uid", qs).collect()
    }
    ordered = [v for v, _ in sorted((v, u) for u, v in data)]
    n = len(ordered)
    for lab, num, den in qs:
        want = ordered[math.ceil(num * n / den) - 1]
        assert got[lab] == want, lab


def test_bloom_merge_is_bit_or(spark):
    from cdc_spark.operators.sketches import bloom_words

    a = spark.createDataFrame([(v,) for v in range(30)], "v long")
    b = spark.createDataFrame([(v,) for v in range(20, 60)], "v long")
    both = a.unionByName(b)
    wa = bloom_words(a, "v", m_bits=256, depth=3).withColumnRenamed(
        "bits", "ba"
    )
    wb = bloom_words(b, "v", m_bits=256, depth=3).withColumnRenamed(
        "bits", "bb"
    )
    merged = {
        r.word: r.m
        for r in wa.join(wb, "word", "full")
        .select(
            "word",
            (
                F.coalesce(F.col("ba"), F.lit(0))
                .bitwiseOR(F.coalesce(F.col("bb"), F.lit(0)))
            ).alias("m"),
        )
        .collect()
    }
    direct = {
        r.word: r.bits
        for r in bloom_words(both, "v", m_bits=256, depth=3).collect()
    }
    assert merged == direct
