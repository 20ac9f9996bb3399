"""Mergeable-sketch aggregation: the hash-gated approximate family.

``q31_approx_stats`` (HLL/KLL) is the registry's one approximate
residue — engine-private register layouts make it rows-only by nature.
This module is the DETERMINISTIC counterpart: KMV distinct-count and
count-min frequency sketches on the portable md5 60-bit hash, so DuckDB
recomputes every estimate bit-for-bit and the family rides the full
value-hash gate. See ``operators/sketches.py`` for the scale shapes
(fixed-size summaries, map-side combine, partial window-group-limit).

Reference: no sketch surface in main.go; public-literature capability
(Beyer et al. SIGMOD'07; Cormode & Muthukrishnan '05) required by the
north-star 100 TB analytics brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.operators.sketches import (
    bottomk_sample,
    countmin_bucket_sql,
    countmin_counters,
    h60_sql,
    kmv_estimate,
    kmv_estimate_sql,
    kmv_sketch,
    sample_quantiles,
)
from cdc_spark.queries.base import register

_KMV_K = 32
_H60_USER = h60_sql("CAST(user_id AS VARCHAR)")


@register(
    "q99_kmv_distinct",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type, {_H60_USER} AS _h FROM events
    ),
    ranked AS (
        SELECT event_type, _h,
               row_number() OVER (PARTITION BY event_type ORDER BY _h)
                   AS rn
        FROM h
    ),
    sk AS (
        SELECT event_type, MAX(_h) AS kth_hash,
               CAST(COUNT(*) AS BIGINT) AS n_hashes
        FROM ranked WHERE rn <= {_KMV_K} GROUP BY event_type
    ),
    ex AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
        FROM events GROUP BY event_type
    )
    SELECT sk.event_type, sk.n_hashes, sk.kth_hash,
           {kmv_estimate_sql('sk.kth_hash', 'sk.n_hashes', _KMV_K)}
               AS est_users,
           ex.exact_users
    FROM sk JOIN ex USING (event_type)
    """,
    note="KMV distinct-count sketch (Beyer et al. SIGMOD'07), "
    "hash-gated: per event_type keep the k=32 smallest DISTINCT "
    "portable-md5 hashes of user_id; estimate = (k-1)/U(k), exact "
    "when the group holds < k values. The rank<=k filter compiles to "
    "WindowGroupLimitExec in Partial mode, so each task forwards at "
    "most k rows per group — per-group reducer input is O(k x tasks) "
    "at ANY corpus size, and the sketch itself is a fixed k rows per "
    "group. exact_users is the eval column (the dd17-style 'is k "
    "enough' number a 100 TB rollout reads before trusting the "
    "estimator); the deterministic hash makes the whole path "
    "oracle-recomputable, unlike q31's engine-private HLL",
    tags=("agg", "sketch", "approx"),
)
def q99_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    sk = (
        kmv_sketch(events, ["event_type"], "user_id", _KMV_K)
        .groupBy("event_type")
        .agg(
            F.max("_h").alias("kth_hash"),
            F.count("*").alias("n_hashes"),
        )
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return sk.join(exact, "event_type").select(
        "event_type",
        "n_hashes",
        "kth_hash",
        kmv_estimate(
            F.col("kth_hash"), F.col("n_hashes"), _KMV_K
        ).alias("est_users"),
        "exact_users",
    )


_CMS_D, _CMS_W, _CMS_PROBES = 4, 256, 10


@register(
    "q100_countmin_freq",
    oracle=f"""
    WITH counters AS (
        SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (
            SELECT t.j AS j,
                   {countmin_bucket_sql('t.j', 'user_id', _CMS_W)}
                       AS bucket
            FROM events, range({_CMS_D}) t(j)
        )
        GROUP BY j, bucket
    ),
    probes AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n
        FROM events GROUP BY user_id
        ORDER BY true_n DESC, user_id LIMIT {_CMS_PROBES}
    ),
    pb AS (
        SELECT p.user_id, p.true_n, t.j AS j,
               {countmin_bucket_sql('t.j', 'p.user_id', _CMS_W)}
                   AS bucket
        FROM probes p, range({_CMS_D}) t(j)
    )
    SELECT pb.user_id, pb.true_n,
           MIN(c.cnt) AS cms_n,
           MIN(c.cnt) - pb.true_n AS overcount
    FROM pb JOIN counters c ON pb.j = c.j AND pb.bucket = c.bucket
    GROUP BY pb.user_id, pb.true_n
    """,
    note="count-min frequency sketch (Cormode-Muthukrishnan), "
    "hash-gated: d=4 x w=256 counter grid from ONE grouped aggregate "
    "(map-side combine bounds every task's output at d*w cells — the "
    "counter table is corpus-size-independent, the property that "
    "makes CMS the 100 TB hot-key detector). Point estimates for the "
    "top-10 true-frequency users: min over the 4 rows' counters, "
    "always >= true count; overcount column surfaces collision "
    "error. The limit-bounded probe list is the broadcast side of "
    "the counter join (guardrail-recognized bounded build)",
    tags=("agg", "sketch", "approx"),
)
def q100_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counters = countmin_counters(events, "user_id", _CMS_D, _CMS_W)
    probes = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("true_n"))
        .orderBy(F.desc("true_n"), F.asc("user_id"))
        .limit(_CMS_PROBES)
    )
    from cdc_spark.operators.dedup import portable_hash60

    pb = probes.select(
        "user_id",
        "true_n",
        F.explode(
            F.array(*[F.lit(j) for j in range(_CMS_D)])
        ).alias("j"),
    ).withColumn(
        "bucket",
        portable_hash60(
            F.concat_ws(
                ":",
                F.col("j").cast("string"),
                F.col("user_id").cast("string"),
            )
        )
        % _CMS_W,
    )
    return (
        counters.join(F.broadcast(pb), ["j", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("cnt").alias("cms_n"))
        .select(
            "user_id",
            "true_n",
            "cms_n",
            (F.col("cms_n") - F.col("true_n")).alias("overcount"),
        )
    )


_MERGE_K = 64


@register(
    "q101_kmv_merge",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type, {_H60_USER} AS _h FROM events
    ),
    ranked AS (
        SELECT event_type, _h,
               row_number() OVER (PARTITION BY event_type ORDER BY _h)
                   AS rn
        FROM h
    ),
    sk AS (
        SELECT event_type, _h FROM ranked WHERE rn <= {_MERGE_K}
    ),
    merged AS (
        SELECT DISTINCT _h FROM sk ORDER BY _h LIMIT {_MERGE_K}
    ),
    m AS (
        SELECT MAX(_h) AS kth_hash,
               CAST(COUNT(*) AS BIGINT) AS n_hashes
        FROM merged
    ),
    shards AS (
        SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_shards
        FROM sk
    ),
    ex AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
        FROM events
    )
    SELECT shards.n_shards, m.n_hashes, m.kth_hash,
           {kmv_estimate_sql('m.kth_hash', 'm.n_hashes', _MERGE_K)}
               AS est_users,
           ex.exact_users
    FROM m, shards, ex
    """,
    note="KMV mergeability — the property that makes sketches a 100 TB "
    "primitive: per-shard (event_type) k=64 sketches are UNIONED "
    "(distinct hashes, re-take k smallest) into a global "
    "distinct-user estimate without re-touching a single raw row — "
    "the merge consumes O(shards x k) sketch rows, exactly how "
    "per-day/per-shard sketches roll up to a quarter's cardinality. "
    "Global k-smallest is TakeOrderedAndProject (per-partition "
    "partial top-k, driver sees <= k x partitions rows); exact_users "
    "is the eval column. Union semantics per Beyer et al. multiset "
    "operations",
    tags=("agg", "sketch", "approx"),
)
def q101_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    shard_sk = kmv_sketch(events, ["event_type"], "user_id", _MERGE_K)
    merged = (
        shard_sk.select("_h")
        .distinct()
        .orderBy("_h")
        .limit(_MERGE_K)
        .agg(
            F.max("_h").alias("kth_hash"),
            F.count("*").alias("n_hashes"),
        )
    )
    shards = shard_sk.agg(
        F.countDistinct("event_type").alias("n_shards")
    )
    exact = events.agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        merged.crossJoin(F.broadcast(shards))
        .crossJoin(F.broadcast(exact))
        .select(
            "n_shards",
            "n_hashes",
            "kth_hash",
            kmv_estimate(
                F.col("kth_hash"), F.col("n_hashes"), _MERGE_K
            ).alias("est_users"),
            "exact_users",
        )
    )


_BF_M, _BF_D = 1024, 3
_BF_SYNTH = 1_000_000


def _bf_pos_sql(uid_expr: str) -> str:
    from cdc_spark.operators.sketches import bloom_pos_sql

    return bloom_pos_sql("t.j", uid_expr, _BF_M)


@register(
    "q103_bloom_membership",
    oracle=f"""
    WITH members AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase'
    ),
    mpos AS (
        SELECT {_bf_pos_sql('m.user_id')} AS pos
        FROM members m, range({_BF_D}) t(j)
    ),
    words AS (
        SELECT pos // 62 AS word,
               bit_or(CAST(1 AS BIGINT) << CAST(pos % 62 AS INTEGER))
                   AS bits
        FROM mpos GROUP BY pos // 62
    ),
    probes AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) = 1 AS actual_member
        FROM events GROUP BY user_id
        UNION ALL
        SELECT user_id + {_BF_SYNTH}, FALSE
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    pp AS (
        SELECT p.user_id, p.actual_member,
               {_bf_pos_sql('p.user_id')} AS pos
        FROM probes p, range({_BF_D}) t(j)
    ),
    chk AS (
        SELECT pp.user_id, pp.actual_member,
               COALESCE(
                   (w.bits >> CAST(pp.pos % 62 AS INTEGER)) & 1, 0
               ) AS s
        FROM pp LEFT JOIN words w ON w.word = pp.pos // 62
    )
    SELECT user_id, actual_member,
           MIN(s) = 1 AS claimed_member,
           (MIN(s) = 1) AND NOT actual_member AS false_positive
    FROM chk GROUP BY user_id, actual_member
    """,
    note="Bloom-filter membership sketch, hash-gated — the fourth "
    "classic mergeable summary (after KMV/CMS): purchase-user set "
    "packed into a 1024-bit bitmap as 62-bit signed-long words via "
    "ONE grouped bit_or aggregate (map-side combine bounds every "
    "task at the word count; two bitmaps merge with a further "
    "bit_or — the 100 TB 'have we seen this key' primitive that "
    "also backs Spark's own runtime bloom join). Probes = every "
    "real user plus a synthetic guaranteed-absent twin per user: "
    "no false negatives by construction, false positives surface "
    "honestly in the gated fp column. The word table is "
    "structurally <= 17 rows (limit-marked bounded broadcast)",
    tags=("agg", "sketch", "approx", "membership"),
)
def q103_bloom_membership(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cdc_spark.operators.dedup import portable_hash60
    from cdc_spark.operators.sketches import bloom_words

    events = load_table(spark, sf_dir, "events")
    members = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    words = bloom_words(members, "user_id", m_bits=_BF_M, depth=_BF_D)
    real = events.groupBy("user_id").agg(
        (
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            == 1
        ).alias("actual_member")
    )
    synth = real.select(
        (F.col("user_id") + _BF_SYNTH).alias("user_id"),
        F.lit(False).alias("actual_member"),
    )
    pp = (
        real.unionByName(synth)
        .select(
            "user_id",
            "actual_member",
            F.explode(
                F.array(*[F.lit(j) for j in range(_BF_D)])
            ).alias("j"),
        )
        .withColumn(
            "pos",
            portable_hash60(
                F.concat_ws(
                    ":",
                    F.col("j").cast("string"),
                    F.col("user_id").cast("string"),
                )
            )
            % _BF_M,
        )
        .withColumn("word", (F.col("pos") / 62).cast("long"))
    )
    n_words = _BF_M // 62 + 1
    chk = pp.join(
        F.broadcast(words.limit(n_words)), "word", "left"
    ).withColumn(
        "s",
        F.expr("coalesce(shiftright(bits, CAST(pos % 62 AS INT)) & 1, 0)"),
    )
    return chk.groupBy("user_id", "actual_member").agg(
        (F.min("s") == 1).alias("claimed_member"),
        ((F.min("s") == 1) & ~F.col("actual_member")).alias(
            "false_positive"
        ),
    )


_IX_K = 64


@register(
    "q104_kmv_set_intersection",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type, {_H60_USER} AS _h FROM events
        WHERE event_type IN ('click', 'purchase')
    ),
    ranked AS (
        SELECT event_type, _h,
               row_number() OVER (PARTITION BY event_type ORDER BY _h)
                   AS rn
        FROM h
    ),
    sk AS (SELECT event_type, _h FROM ranked WHERE rn <= {_IX_K}),
    est AS (
        SELECT event_type, MAX(_h) AS kth,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM sk GROUP BY event_type
    ),
    u AS (
        SELECT MAX(_h) AS kth, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT DISTINCT _h FROM sk ORDER BY _h LIMIT {_IX_K})
    ),
    e AS (
        SELECT
            {kmv_estimate_sql(
                "(SELECT kth FROM est WHERE event_type = 'click')",
                "(SELECT n FROM est WHERE event_type = 'click')",
                _IX_K,
            )} AS est_a,
            {kmv_estimate_sql(
                "(SELECT kth FROM est WHERE event_type = 'purchase')",
                "(SELECT n FROM est WHERE event_type = 'purchase')",
                _IX_K,
            )} AS est_b,
            {kmv_estimate_sql(
                "(SELECT kth FROM u)", "(SELECT n FROM u)", _IX_K
            )} AS est_union
    ),
    ex AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS exact_overlap FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )
    )
    SELECT est_a, est_b, est_union,
           ROUND(est_a + est_b - est_union, 4) AS est_overlap,
           ex.exact_overlap
    FROM e, ex
    """,
    note="KMV set algebra (the Theta-sketch headline use, Beyer et "
    "al. multiset ops): distinct-user overlap of two event "
    "populations WITHOUT an exact distinct-intersection pass — "
    "|A INTERSECT B| = est(A) + est(B) - est(A UNION B), where the "
    "union estimate comes from MERGING the two k=64 sketches "
    "(O(k) rows, no data re-read; at 100 TB this is the "
    "audience-overlap dashboard primitive: per-population sketches "
    "maintained incrementally, intersections answered from sketch "
    "state alone). All three estimates and the inclusion-exclusion "
    "arithmetic are deterministic doubles, hash-gated; "
    "exact_overlap is the eval column",
    tags=("agg", "sketch", "approx", "setop"),
)
def q104_kmv_set_intersection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    sk = kmv_sketch(events, ["event_type"], "user_id", _IX_K)

    def _est(kth, n):
        return kmv_estimate(kth, n, _IX_K)

    # ONE ungrouped conditional aggregate for both populations: a
    # structurally-1-row frame (the guardrail's bounded-broadcast
    # criterion), where a groupBy+filter pair would read as an
    # unbounded build side
    is_a = F.col("event_type") == "click"
    per = sk.agg(
        F.max(F.when(is_a, F.col("_h"))).alias("kth_a"),
        F.count(F.when(is_a, 1)).alias("n_a"),
        F.max(F.when(~is_a, F.col("_h"))).alias("kth_b"),
        F.count(F.when(~is_a, 1)).alias("n_b"),
    ).select(
        _est(F.col("kth_a"), F.col("n_a")).alias("est_a"),
        _est(F.col("kth_b"), F.col("n_b")).alias("est_b"),
    )
    union = (
        sk.select("_h")
        .distinct()
        .orderBy("_h")
        .limit(_IX_K)
        .agg(F.max("_h").alias("kth"), F.count("*").alias("n"))
        .select(_est(F.col("kth"), F.col("n")).alias("est_union"))
    )
    exact = (
        events.where(F.col("event_type") == "click")
        .select("user_id")
        .intersect(
            events.where(F.col("event_type") == "purchase").select(
                "user_id"
            )
        )
        .agg(F.count("*").alias("exact_overlap"))
    )
    return (
        per.crossJoin(F.broadcast(union))
        .crossJoin(F.broadcast(exact))
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("est_overlap"),
            "exact_overlap",
        )
    )


_BK_N = 100
_H60_DOC = h60_sql("CAST(doc_id AS VARCHAR)")


@register(
    "q105_bottomk_sample",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, length(text) AS n_chars,
               {_H60_DOC} AS _h
        FROM documents
    ),
    picked AS (
        SELECT * FROM h ORDER BY _h, doc_id LIMIT {_BK_N}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
           MAX(_h) AS threshold_hash,
           CAST(SUM(n_chars) AS BIGINT) AS sample_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM picked
    """,
    note="bottom-k consistent sampling — the deterministic exactly-n "
    "sample a 100 TB pipeline carves eval sets with: the n=100 "
    "documents with the smallest portable hash of their id. Unlike "
    "Bernoulli predicates (tx09: approximate size), the size is "
    "exact; unlike rand()-ordered sampling, the pick is stable "
    "across engines, partitionings, and re-runs, and MERGEABLE — "
    "the bottom-k of a union is the bottom-k of per-shard "
    "bottom-ks, so shards sample independently and a coordinator "
    "folds O(shards x k) rows (same lossless-union property as "
    "KMV). threshold_hash is the handoff value: a future batch "
    "joins the sample by 'hash < threshold' without reading the "
    "sample. Plan: TakeOrderedAndProject — per-partition partial "
    "top-k, no global sort, no shuffle of the corpus",
    tags=("sampling", "sketch", "deterministic"),
)
def q105_bottomk_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cdc_spark.operators.dedup import portable_hash60

    docs = load_table(spark, sf_dir, "documents")
    picked = (
        docs.select(
            "doc_id",
            F.length("text").alias("n_chars"),
            portable_hash60(F.col("doc_id").cast("string")).alias("_h"),
        )
        .orderBy("_h", "doc_id")
        .limit(_BK_N)
    )
    return picked.agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.max("_h").alias("threshold_hash"),
        F.sum("n_chars").cast("long").alias("sample_chars"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )


_MQ_K = 256
_MQ_Q = (
    ("p25", 1, 4),
    ("p50", 1, 2),
    ("p75", 3, 4),
    ("p90", 9, 10),
    ("p99", 99, 100),
)
_MQ_VALUES = ", ".join(
    f"('{lab}', {num}, {den})" for lab, num, den in _MQ_Q
)


@register(
    "q106_mergeable_quantile_sketch",
    oracle=f"""
    WITH h AS (
        SELECT source, doc_id, CAST(length(text) AS BIGINT) AS n_chars,
               {_H60_DOC} AS _h
        FROM documents
    ),
    shard AS (
        SELECT source, doc_id, n_chars, _h FROM (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY source ORDER BY _h, doc_id
                   ) AS rn
            FROM h
        ) WHERE rn <= {_MQ_K}
    ),
    merged AS (
        SELECT doc_id, n_chars, _h FROM shard
        ORDER BY _h, doc_id LIMIT {_MQ_K}
    ),
    sr AS (
        SELECT n_chars,
               row_number() OVER (ORDER BY n_chars, doc_id) AS rn
        FROM merged
    ),
    sn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM merged),
    q(quantile, num, den) AS (VALUES {_MQ_VALUES}),
    est AS (
        SELECT q.quantile,
               CAST(FLOOR((q.num * sn.n + q.den - 1) / q.den)
                    AS BIGINT) AS sample_rank
        FROM q, sn
    ),
    est2 AS (
        SELECT est.quantile, est.sample_rank, sr.n_chars AS est_chars
        FROM est JOIN sr ON sr.rn = est.sample_rank
    ),
    fr AS (
        SELECT n_chars,
               row_number() OVER (ORDER BY n_chars, doc_id) AS rn
        FROM h
    ),
    fn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM h),
    ex AS (
        SELECT q.quantile,
               CAST(FLOOR((q.num * fn.n + q.den - 1) / q.den)
                    AS BIGINT) AS exact_rank
        FROM q, fn
    ),
    ex2 AS (
        SELECT ex.quantile, ex.exact_rank, fr.n_chars AS exact_chars
        FROM ex JOIN fr ON fr.rn = ex.exact_rank
    )
    SELECT est2.quantile, est2.sample_rank, est2.est_chars,
           ex2.exact_rank, ex2.exact_chars
    FROM est2 JOIN ex2 USING (quantile)
    """,
    note="mergeable quantile sketch — closes the approximate-quantile "
    "tier q30 (exact percentiles: not mergeable) and q31 (KLL: "
    "engine-private, rows-only) leave open. Per-source bottom-k "
    "sketches (WindowGroupLimit Partial, map-side) MERGE by "
    "union + re-limit into the global bottom-k (Cohen & Kaplan "
    "PODC'07 lossless-union, the property st27 proved for KMV), a "
    "uniform k=256 sample; quantile q then reads rank ceil(q*n) of "
    "the sorted sample via ONE bounded collect_list aggregate — no "
    "data-sized window anywhere. Estimates are actual sampled "
    "integers and rank arithmetic is IEEE-exact, so the whole path "
    "is hash-gated; exact_chars (distributed two-pass row number "
    "over the full table) is the eval column. At 100 TB: shards "
    "sample independently, a coordinator folds O(shards x k) rows, "
    "and the quantile answer never re-touches raw data",
    tags=("agg", "sketch", "approx", "sampling"),
)
def q106_mergeable_quantile_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cdc_spark.operators.ordering import distributed_row_number

    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
    )
    # per-shard sketches -> lossless merge (union + re-limit == the
    # global bottom-k; the equivalence is property-tested in
    # tests/test_sketches.py::test_bottomk_merge_equivalence)
    shards = bottomk_sample(docs, "doc_id", _MQ_K, group_col="source")
    merged = shards.orderBy("_h", "doc_id").limit(_MQ_K)
    est = sample_quantiles(merged, "n_chars", "doc_id", _MQ_Q).select(
        "quantile",
        "sample_rank",
        F.col("est").alias("est_chars"),
    )
    # exact eval column: value at rank ceil(q*N) of the FULL table —
    # distributed two-pass row number + a broadcast 5-row rank spec.
    # bucket= (round 14, guide §2.4): a fixed-width slice of the order
    # key itself replaces the sampled range partitioning — drops the
    # RangePartitioner's sampling job AND the localCheckpoint layout
    # pin (a full extra materialization of the projection) from the
    # plan; row numbers are bit-identical (the slice id is monotone
    # non-decreasing along [n_chars, doc_id], the bucket contract).
    positions = distributed_row_number(
        docs.select("doc_id", "n_chars"),
        [F.asc("n_chars"), F.asc("doc_id")],
        out_col="rn",
        bucket=F.floor(F.col("n_chars") / F.lit(16)),
    )
    total = docs.agg(F.count("*").alias("_n"))
    spec = spark.createDataFrame(
        list(_MQ_Q), "quantile string, num long, den long"
    )
    targets = spec.crossJoin(F.broadcast(total)).select(
        "quantile",
        F.floor(
            (F.col("num") * F.col("_n") + F.col("den") - 1)
            / F.col("den")
        )
        .cast("long")
        .alias("exact_rank"),
    )
    exact = positions.join(
        F.broadcast(targets), positions.rn == targets.exact_rank
    ).select("quantile", "exact_rank", F.col("n_chars").alias("exact_chars"))
    return est.join(exact, "quantile").orderBy("quantile")


_SQ_K = 128
_SQ_Q = (("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10))
_SQ_VALUES = ", ".join(
    f"('{lab}', {num}, {den})" for lab, num, den in _SQ_Q
)


@register(
    "q107_stratified_sample_quantiles",
    oracle=f"""
    WITH h AS (
        SELECT source, doc_id, CAST(length(text) AS BIGINT) AS n_chars,
               {_H60_DOC} AS _h
        FROM documents
    ),
    shard AS (
        SELECT source, doc_id, n_chars FROM (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY source ORDER BY _h, doc_id
                   ) AS rn
            FROM h
        ) WHERE rn <= {_SQ_K}
    ),
    sr AS (
        SELECT source, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id
               ) AS rn
        FROM shard
    ),
    sn AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        FROM shard GROUP BY source
    ),
    q(quantile, num, den) AS (VALUES {_SQ_VALUES}),
    est AS (
        SELECT sn.source, q.quantile,
               CAST(FLOOR((q.num * sn.n + q.den - 1) / q.den)
                    AS BIGINT) AS sample_rank
        FROM sn, q
    ),
    est2 AS (
        SELECT est.source, est.quantile, est.sample_rank,
               sr.n_chars AS est_chars
        FROM est JOIN sr
            ON sr.source = est.source AND sr.rn = est.sample_rank
    ),
    fr AS (
        SELECT source, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id
               ) AS rn
        FROM h
    ),
    fn AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        FROM h GROUP BY source
    ),
    ex AS (
        SELECT fn.source, q.quantile,
               CAST(FLOOR((q.num * fn.n + q.den - 1) / q.den)
                    AS BIGINT) AS exact_rank
        FROM fn, q
    ),
    ex2 AS (
        SELECT ex.source, ex.quantile, ex.exact_rank,
               fr.n_chars AS exact_chars
        FROM ex JOIN fr
            ON fr.source = ex.source AND fr.rn = ex.exact_rank
    )
    SELECT est2.source, est2.quantile, est2.sample_rank,
           est2.est_chars, ex2.exact_rank, ex2.exact_chars
    FROM est2 JOIN ex2 USING (source, quantile)
    """,
    note="per-stratum quantile estimates — the grouped tier of the "
    "sampling family (q105 global sample, q106 merged-global "
    "quantiles): per SOURCE, a bottom-k=128 consistent sample "
    "(WindowGroupLimit Partial, map-side) packs into one sorted "
    "array per group (bounded at k), and each quantile reads rank "
    "ceil(q*n) — the per-source length-distribution dashboard a "
    "mixture-weighted 100 TB ingest watches, at O(sources x k) "
    "state. exact_chars rides the GROUPED distributed row number "
    "(never a per-source single reducer) + a broadcast per-source "
    "rank spec; everything integer/IEEE-exact, fully hash-gated",
    tags=("agg", "sketch", "sampling", "approx"),
)
def q107_stratified_sample_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cdc_spark.operators.ordering import grouped_row_number

    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
    )
    shards = bottomk_sample(docs, "doc_id", _SQ_K, group_col="source")
    packed = shards.groupBy("source").agg(
        F.sort_array(
            F.collect_list(F.struct("n_chars", "doc_id"))
        ).alias("_arr"),
        F.count("*").alias("_n"),
    )
    spec = spark.createDataFrame(
        list(_SQ_Q), "quantile string, num long, den long"
    )

    def _rank(n):
        return (
            F.floor((F.col("num") * n + F.col("den") - 1) / F.col("den"))
            .cast("long")
        )

    est = packed.crossJoin(F.broadcast(spec)).select(
        "source",
        "quantile",
        _rank(F.col("_n")).alias("sample_rank"),
        F.element_at(
            F.col("_arr"),
            _rank(F.col("_n")).cast("int"),
        )["n_chars"]
        .cast("long")
        .alias("est_chars"),
    )
    positions = grouped_row_number(
        docs, "source", [F.asc("n_chars"), F.asc("doc_id")], out_col="rn"
    )
    totals = docs.groupBy("source").agg(F.count("*").alias("_n"))
    targets = totals.crossJoin(F.broadcast(spec)).select(
        F.col("source").alias("_tsrc"),
        F.col("quantile").alias("_tq"),
        _rank(F.col("_n")).alias("exact_rank"),
    )
    exact = positions.join(
        F.broadcast(targets),
        (positions.source == targets._tsrc)
        & (positions.rn == targets.exact_rank),
    ).select(
        "source",
        F.col("_tq").alias("quantile"),
        "exact_rank",
        F.col("n_chars").alias("exact_chars"),
    )
    return est.join(exact, ["source", "quantile"]).orderBy(
        "source", "quantile"
    )


_PS_K = 100
_PS_W = 12  # lcm of the weight domain {1,2,3,4}
_PS_DOMAIN = float(1 << 60)


@register(
    "q108_priority_weighted_sample",
    oracle=f"""
    WITH w AS (
        SELECT doc_id,
               doc_id % 4 + 1 AS wt,
               CAST({_PS_W} // (doc_id % 4 + 1) AS BIGINT) AS f,
               {_H60_DOC} AS _h
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, wt,
               CAST(_h AS DOUBLE) * CAST(f AS DOUBLE) AS k
        FROM w
    ),
    lim AS (
        SELECT doc_id, wt, k,
               row_number() OVER (ORDER BY k, doc_id) AS rn
        FROM (SELECT * FROM keyed ORDER BY k, doc_id
              LIMIT {_PS_K + 1})
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM lim),
    tau AS (
        SELECT CASE WHEN m.m > {_PS_K}
               THEN {_PS_W!r}::DOUBLE * {_PS_DOMAIN!r}
                    / (SELECT k FROM lim WHERE rn = {_PS_K + 1})
               ELSE NULL END AS tau
        FROM m
    ),
    est AS (
        SELECT CAST(SUM(CAST(ROUND(
                   greatest(CAST(l.wt AS DOUBLE),
                            COALESCE(t.tau, CAST(0 AS DOUBLE))), 6)
                   AS DECIMAL(30,6))) AS DOUBLE) AS s,
               CAST(COUNT(*) AS BIGINT) AS n_sampled
        FROM lim l, tau t WHERE l.rn <= {_PS_K}
    ),
    ex AS (
        SELECT CAST(SUM(wt) AS BIGINT) AS exact_total_weight FROM w
    )
    SELECT est.n_sampled,
           ROUND(COALESCE(t.tau, CAST(0 AS DOUBLE)), 6) AS tau,
           ROUND(est.s, 4) AS est_total_weight,
           ex.exact_total_weight
    FROM est, tau t, ex
    """,
    note="priority sampling (Duffield-Lund-Thorup JACM'07) — the "
    "WEIGHTED tier of the consistent-sampling family (q105 is the "
    "uniform case): quality-weighted docs (wt 1-4) sample with "
    "probability ~ weight via bottom-k of key = u/w, implemented "
    "as h60 * (lcm/w) — int64->double and one multiply are "
    "IEEE-exact in every engine, so the pick is deterministic and "
    "hash-gated, no float-comparison drift. The k+1-th key yields "
    "the threshold tau, and sum(max(w, tau)) over the sample is "
    "the unbiased subset-sum estimator — the 'how many tokens does "
    "this slice hold' answer a 100 TB mixture planner reads from "
    "100 sampled rows instead of a corpus scan. Per-term rounding "
    "+ decimal sum keeps the fold order-independent; "
    "exact_total_weight is the eval column. Plan: "
    "TakeOrderedAndProject (partial top-k, no corpus shuffle) + "
    "one 1-row aggregate",
    tags=("sampling", "sketch", "approx", "deterministic"),
)
def q108_priority_weighted_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cdc_spark.operators.dedup import portable_hash60
    from cdc_spark.queries.base import dsum

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    wt = (F.col("doc_id") % 4 + 1).cast("long")
    keyed = docs.select(
        "doc_id",
        wt.alias("wt"),
        (
            portable_hash60(F.col("doc_id").cast("string"))
            .cast("double")
            * (F.lit(_PS_W).cast("long") / wt).cast("double")
        ).alias("k"),
    )
    lim = keyed.orderBy("k", "doc_id").limit(_PS_K + 1)
    packed = lim.agg(
        F.sort_array(
            F.collect_list(F.struct("k", "doc_id", "wt"))
        ).alias("arr"),
        F.count("*").alias("m"),
    )
    tau = F.when(
        F.col("m") > _PS_K,
        F.lit(float(_PS_W) * _PS_DOMAIN)
        / F.element_at(F.col("arr"), _PS_K + 1)["k"],
    )
    sample = packed.select(
        "m",
        F.coalesce(tau, F.lit(0.0)).alias("tau"),
        F.explode(F.slice("arr", 1, _PS_K)).alias("e"),
    )
    est = sample.groupBy("tau").agg(
        dsum(
            F.round(
                F.greatest(F.col("e.wt").cast("double"), F.col("tau")),
                6,
            ),
            scale=6,
        ).alias("s"),
        F.count("*").alias("n_sampled"),
    )
    exact = docs.select(wt.alias("wt")).agg(
        F.sum("wt").alias("exact_total_weight")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "n_sampled",
        F.round(F.col("tau"), 6).alias("tau"),
        F.round(F.col("s"), 4).alias("est_total_weight"),
        "exact_total_weight",
    )


_JC_D, _JC_W = 4, 8192


@register(
    "q110_cms_join_cardinality",
    oracle=f"""
    WITH a AS (
        SELECT user_id FROM events WHERE event_type = 'click'
    ),
    b AS (
        SELECT user_id FROM events WHERE event_type = 'purchase'
    ),
    ca AS (
        SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (
            SELECT t.j AS j,
                   {countmin_bucket_sql('t.j', 'user_id', _JC_W)}
                       AS bucket
            FROM a, range({_JC_D}) t(j)
        ) GROUP BY j, bucket
    ),
    cb AS (
        SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (
            SELECT t.j AS j,
                   {countmin_bucket_sql('t.j', 'user_id', _JC_W)}
                       AS bucket
            FROM b, range({_JC_D}) t(j)
        ) GROUP BY j, bucket
    ),
    dots AS (
        SELECT ca.j, CAST(SUM(ca.cnt * cb.cnt) AS BIGINT) AS dot
        FROM ca JOIN cb ON ca.j = cb.j AND ca.bucket = cb.bucket
        GROUP BY ca.j
    ),
    est AS (SELECT CAST(MIN(dot) AS BIGINT) AS est_join_rows FROM dots),
    ex AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS exact_join_rows
        FROM a JOIN b ON a.user_id = b.user_id
    )
    SELECT est.est_join_rows, ex.exact_join_rows,
           est.est_join_rows - ex.exact_join_rows AS overcount
    FROM est, ex
    """,
    note="join-size estimation from sketches (the AMS/count-min "
    "inner-product estimate, Alon-Matias-Szegedy '96 / "
    "Cormode-Muthukrishnan '05): |A JOIN B on k| = sum_k a_k*b_k, "
    "estimated as min over rows j of the d=4 x w=8192 counter grids' "
    "dot products — always >= truth (same one-sided guarantee as "
    "CMS point queries). THE pre-flight planner question at 100 TB "
    "— 'can I afford this fact-fact join / which side do I "
    "broadcast' — answered from two fixed-size mergeable counter "
    "tables maintained incrementally per side, never by running "
    "the join. Each grid is one map-side-combined aggregate "
    "(d=4 x w=8192 cells - sized so the inner-product error term "
    "F1(A)*F1(B)/w stays well under the truth at sf0.1); the "
    "dot product joins d*w-bounded frames; exact_join_rows is the "
    "eval column (computed here only to grade the estimate)",
    tags=("agg", "sketch", "approx", "join"),
)
def q110_cms_join_cardinality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a = events.where(F.col("event_type") == "click").select("user_id")
    b = events.where(F.col("event_type") == "purchase").select(
        "user_id"
    )
    ca = countmin_counters(a, "user_id", _JC_D, _JC_W)
    cb = countmin_counters(b, "user_id", _JC_D, _JC_W)
    dots = (
        ca.join(
            cb.withColumnRenamed("cnt", "cnt_b"), ["j", "bucket"]
        )
        .groupBy("j")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("dot"))
    )
    est = dots.agg(F.min("dot").cast("long").alias("est_join_rows"))
    exact = a.join(b, "user_id").agg(
        F.count("*").alias("exact_join_rows")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est_join_rows",
        "exact_join_rows",
        (F.col("est_join_rows") - F.col("exact_join_rows")).alias(
            "overcount"
        ),
    )


_KA_KS = (16, 64, 256)


def _kmv_k_oracle() -> str:
    arms = []
    for k in _KA_KS:
        arms.append(f"""
        SELECT {k} AS k, MAX(_h) AS kth,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT _h FROM h ORDER BY _h LIMIT {k})""")
    unioned = " UNION ALL ".join(arms)
    # kmv_estimate_sql bakes k into its constants; this sweep needs
    # the row's OWN k, so the estimator is restated with s.k inline
    est = (
        "ROUND(CASE WHEN s.n < s.k THEN CAST(s.n AS DOUBLE) "
        f"ELSE CAST(s.k - 1 AS DOUBLE) * {float(1 << 60)!r} "
        "/ CAST(s.kth AS DOUBLE) END, 4)"
    )
    return f"""
    WITH h AS (
        SELECT DISTINCT {h60_sql('CAST(user_id AS VARCHAR)')} AS _h
        FROM events
    ),
    sk AS ({unioned}),
    ex AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS exact_users FROM h
    )
    SELECT s.k, s.n AS n_hashes, {est} AS est_users, ex.exact_users,
           ROUND(ABS({est} - ex.exact_users)
                 / ex.exact_users * 100, 4) AS abs_err_pct
    FROM sk s, ex
    ORDER BY s.k
    """


@register(
    "q111_kmv_accuracy_sweep",
    oracle=_kmv_k_oracle(),
    note="the 'is k enough' tuning harness for the cardinality "
    "sketch — the q99 counterpart of ss22's n_probe recall curve "
    "and dd19's threshold-cost curve: ONE distinct-hash pass feeds "
    "k=16/64/256 KMV estimates side by side with their exact error, "
    "so a 100 TB rollout reads the k-vs-error trade from one small "
    "table before committing sketch state everywhere. The three "
    "top-k arms share the same TakeOrdered scan shape (each bounded "
    "at k rows); estimates and the error column are deterministic "
    "doubles on exact integers — fully hash-gated",
    tags=("agg", "sketch", "approx", "eval"),
)
def q111_kmv_accuracy_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cdc_spark.operators.dedup import portable_hash60
    from cdc_spark.operators.sketches import HASH_DOMAIN

    events = load_table(spark, sf_dir, "events")
    hashes = events.select(
        portable_hash60(F.col("user_id").cast("string")).alias("_h")
    ).distinct()
    arms = None
    for k in _KA_KS:
        arm = (
            hashes.orderBy("_h")
            .limit(k)
            .agg(
                F.lit(k).cast("long").alias("k"),
                F.max("_h").alias("kth"),
                F.count("*").alias("n_hashes"),
            )
        )
        arms = arm if arms is None else arms.unionByName(arm)
    est = F.when(
        F.col("n_hashes") < F.col("k"),
        F.col("n_hashes").cast("double"),
    ).otherwise(
        (F.col("k") - 1).cast("double")
        * F.lit(HASH_DOMAIN)
        / F.col("kth").cast("double")
    )
    exact = hashes.agg(F.count("*").alias("exact_users"))
    return (
        arms.crossJoin(F.broadcast(exact))
        .select(
            "k",
            "n_hashes",
            F.round(est, 4).alias("est_users"),
            "exact_users",
            F.round(
                F.abs(F.round(est, 4) - F.col("exact_users"))
                / F.col("exact_users")
                * 100,
                4,
            ).alias("abs_err_pct"),
        )
        .orderBy("k")
    )


_HH_D, _HH_W, _HH_SHARDS, _HH_DEN = 4, 1024, 32, 20
_HH_KEY = (
    "CASE WHEN user_id % 4 = 0 THEN user_id ELSE user_id % 7 END"
)


@register(
    "q112_cms_heavy_hitters",
    oracle=f"""
    WITH keyed AS (
        SELECT {_HH_KEY} AS hot_key, event_id FROM events
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keyed),
    sharded AS (
        SELECT hot_key,
               ({h60_sql("CAST(event_id AS VARCHAR)")}) % {_HH_SHARDS}
                   AS shard
        FROM keyed
    ),
    shard_tot AS (
        SELECT shard, COUNT(*) AS st FROM sharded GROUP BY shard
    ),
    local AS (
        SELECT shard, hot_key, COUNT(*) AS c
        FROM sharded GROUP BY shard, hot_key
    ),
    cand AS (
        SELECT DISTINCT l.hot_key
        FROM local l JOIN shard_tot s ON l.shard = s.shard
        WHERE {_HH_DEN} * l.c >= s.st
    ),
    counters AS (
        SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (
            SELECT t.j AS j,
                   {countmin_bucket_sql('t.j', 'hot_key', _HH_W)}
                       AS bucket
            FROM keyed, range({_HH_D}) t(j)
        )
        GROUP BY j, bucket
    ),
    pb AS (
        SELECT c.hot_key, t.j AS j,
               {countmin_bucket_sql('t.j', 'c.hot_key', _HH_W)}
                   AS bucket
        FROM cand c, range({_HH_D}) t(j)
    ),
    est AS (
        SELECT pb.hot_key, MIN(co.cnt) AS est_n
        FROM pb JOIN counters co
            ON pb.j = co.j AND pb.bucket = co.bucket
        GROUP BY pb.hot_key
    ),
    exact AS (
        SELECT k.hot_key, CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM keyed k JOIN cand USING (hot_key)
        GROUP BY k.hot_key
    )
    SELECT est.hot_key, est.est_n, exact.exact_n,
           ({_HH_DEN} * exact.exact_n >= t.n) AS truly_heavy
    FROM est
    JOIN exact ON est.hot_key = exact.hot_key
    CROSS JOIN tot t
    WHERE {_HH_DEN} * est.est_n >= t.n
    """,
    note="CMS heavy hitters (Cormode-Muthukrishnan '05 SS4) - the "
    "skew-detection pre-flight the sketch family could not answer "
    "alone: q100 probes KNOWN keys, this EXTRACTS the hot ones. "
    "Candidate pass: a deterministic hash shard (32-way on "
    "event_id, engine-portable md5) and per-(shard,key) counts - "
    "one map-side-combinable aggregate; a key is a candidate where "
    "20*local_cnt >= shard_total. Pigeonhole guarantees the "
    "candidate set is a SUPERSET of every key with global share "
    ">= 1/20 (if cnt_s < N_s/20 in every shard, summing gives "
    "global < N/20), and each shard admits <= 20 keys, so "
    "candidates are bounded at 640 rows whatever the corpus size - "
    "the LIMIT below records that proof for the plan lint, it can "
    "never truncate. Verification: point-estimate candidates "
    "against the d=4 x w=1024 CMS grid (min over rows, never "
    "undercounts => no false negatives at the same threshold); "
    "exact_n and truly_heavy grade precision - synthetic Zipf head "
    "(7 hot keys ~10% each) makes the answer non-trivial. At "
    "100 TB: two bounded-output aggregates + one fixed-size grid, "
    "no all-pairs, no driver loop; this is the 'which keys need "
    "salting' planner feeding q52's salted agg and the AQE "
    "skew-join knobs",
    tags=("agg", "sketch", "approx", "skew"),
)
def q112_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.dedup import portable_hash60

    events = load_table(spark, sf_dir, "events")
    keyed = events.select(
        F.when(F.col("user_id") % 4 == 0, F.col("user_id"))
        .otherwise(F.col("user_id") % 7)
        .alias("hot_key"),
        "event_id",
    )
    sharded = keyed.withColumn(
        "shard",
        portable_hash60(F.col("event_id").cast("string")) % _HH_SHARDS,
    )
    local = sharded.groupBy("shard", "hot_key").agg(
        F.count("*").alias("c")
    )
    # per-shard totals FOLD FROM the per-(shard, key) counts — exactly
    # Σ_key c by definition — instead of a second full scan + groupBy
    # of the corpus (round 13, guide §2.3 "aggregate before you
    # shuffle": the second-level fold sums shards × keys rows, and the
    # shared `local` subtree is one ReusedExchange)
    shard_tot = local.groupBy("shard").agg(F.sum("c").alias("st"))
    # no broadcast hint on shard_tot: it is 32 rows (shard = h % 32),
    # but the plan lint cannot prove a modulo-literal bound — stats /
    # AQE broadcast it at runtime anyway, and a 32-key shuffle join is
    # equally fine at any scale
    cand = (
        local.join(shard_tot, "shard")
        .where(F.lit(_HH_DEN) * F.col("c") >= F.col("st"))
        .select("hot_key")
        .distinct()
        # provably <= shards * den rows (see note); the LIMIT only
        # hands the plan lint the bound, it cannot truncate
        .limit(_HH_SHARDS * _HH_DEN)
    )

    counters = countmin_counters(keyed, "hot_key", _HH_D, _HH_W)
    # stream total from the CMS row-sum invariant (each row increments
    # one bucket per CMS row, so the j=0 cells sum to COUNT(*)) — a
    # d·w-row scan instead of another full corpus pass
    # coalesce: SUM over zero rows is NULL where the count(*) this
    # replaced returned 0 (r13 ADVICE) — same rows on every non-empty
    # input, and the empty-input total now carries 0 like before
    total = (
        counters.where(F.col("j") == 0)
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n"))
    )
    pb = cand.select(
        "hot_key",
        F.explode(F.array(*[F.lit(j) for j in range(_HH_D)])).alias("j"),
    ).withColumn(
        "bucket",
        portable_hash60(
            F.concat_ws(
                ":",
                F.col("j").cast("string"),
                F.col("hot_key").cast("string"),
            )
        )
        % _HH_W,
    )
    est = (
        counters.join(F.broadcast(pb), ["j", "bucket"])
        .groupBy("hot_key")
        .agg(F.min("cnt").alias("est_n"))
    )
    exact = (
        keyed.join(F.broadcast(cand), "hot_key")
        .groupBy("hot_key")
        .agg(F.count("*").cast("long").alias("exact_n"))
    )
    return (
        est.join(exact, "hot_key")
        .crossJoin(F.broadcast(total))
        .where(F.lit(_HH_DEN) * F.col("est_n") >= F.col("n"))
        .select(
            "hot_key",
            "est_n",
            "exact_n",
            (F.lit(_HH_DEN) * F.col("exact_n") >= F.col("n")).alias(
                "truly_heavy"
            ),
        )
    )
