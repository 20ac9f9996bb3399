"""Temporal operators: as-of join, range join, tumbling/sliding windows,
percentiles — over the `events` stream table (batch semantics; the
streaming twins live in cdc_spark.streaming)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.operators.asof import asof_join
from cdc_spark.queries.base import dsum, dsum_sql, register


@register(
    "q25_asof_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           c.event_id AS click_id,
           c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    note="as-of join: latest preceding click per purchase (union+window, no O(n^2))",
    tags=("join", "asof"),
)
def q25_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_payload=["click_id", "click_ts"],
        tiebreak="click_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("click_id_matched").alias("click_id"),
        F.col("click_ts_matched").alias("click_ts"),
    )


@register(
    "q26_range_join",
    oracle="""
    SELECT c.user_id,
           COUNT(*) AS n_pairs,
           CAST(MIN(epoch_us(p.ts) - epoch_us(c.ts)) AS BIGINT) AS min_gap_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 5 MINUTE
    GROUP BY c.user_id
    """,
    note="range join: purchases within 5 min after a click, per user",
    tags=("join", "range"),
)
def q26_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("purchase_ts")
    )
    pairs = clicks.join(
        purchases,
        (clicks.user_id == purchases.p_user_id)
        & (purchases.purchase_ts >= clicks.click_ts)
        & (
            purchases.purchase_ts
            <= clicks.click_ts + F.expr("INTERVAL 5 MINUTES")
        ),
        "inner",
    )
    gap = F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts"))
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.min(gap).cast("long").alias("min_gap_us"),
    )


@register(
    "q28_tumbling_window",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    note="tumbling 1h window aggregate (batch twin of streaming window())",
    tags=("window", "temporal"),
)
def q28_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "q29_sliding_window",
    oracle="""
    SELECT make_timestamp(((epoch_us(ts) // 1800000000) - i) * 1800000000)
               AS window_start,
           COUNT(*) AS n
    FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS i)
    GROUP BY 1
    """,
    note="sliding window (1h / 30min slide): each event lands in 2 windows",
    tags=("window", "temporal"),
)
def q29_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )


@register(
    "q30_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90,
           ROUND(MAX(value), 4) AS max_value
    FROM events
    GROUP BY event_type
    """,
    note="exact linear-interpolation percentiles",
    tags=("agg", "percentile"),
)
def q30_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.9), 4).alias("p90"),
        F.round(F.max("value"), 4).alias("max_value"),
    )


@register(
    "q31_approx_stats",
    oracle=None,  # approximate by design: HLL/KLL sketches differ per engine
    note="approx_count_distinct (HLL) + percentile_approx (KLL-ish) — rows-only check",
    tags=("agg", "approx"),
)
def q31_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_p50"),
        F.count("*").alias("n"),
    )


@register(
    "q56_asof_forward",
    oracle="""
    WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
         purchases AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT c.event_id AS click_id,
           c.user_id,
           c.ts AS click_ts,
           p.event_id AS next_purchase_id,
           p.ts AS next_purchase_ts
    FROM clicks c
    LEFT JOIN LATERAL (
        SELECT event_id, ts FROM purchases p
        WHERE p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.ts, p.event_id LIMIT 1
    ) p ON TRUE
    """,
    note="forward as-of join: earliest following purchase per click "
    "(same union+window machinery, time order flipped)",
    tags=("join", "asof"),
)
def q56_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("next_purchase_id"),
        F.col("ts").alias("next_purchase_ts"),
    )
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="click_ts",
        right_ts="next_purchase_ts",
        right_payload=["next_purchase_id", "next_purchase_ts"],
        direction="forward",
        tiebreak="next_purchase_id",
    )
    return joined.select(
        "click_id",
        "user_id",
        "click_ts",
        F.col("next_purchase_id_matched").alias("next_purchase_id"),
        F.col("next_purchase_ts_matched").alias("next_purchase_ts"),
    )


@register(
    "q58_asof_hotkey_bucketed",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           c.event_id AS click_id,
           c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    note="hot-key-safe as-of join (time-bucketed windows + carry-in "
    "fix-up pass): same semantics as q25, every window partition "
    "bounded by (key, 1h bucket) instead of key popularity",
    tags=("join", "asof", "skew"),
)
def q58_asof_hotkey_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.asof import asof_join_bucketed

    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = asof_join_bucketed(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_payload=["click_id", "click_ts"],
        bucket_width=3600.0,
        tiebreak="click_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("click_id_matched").alias("click_id"),
        F.col("click_ts_matched").alias("click_ts"),
    )


@register(
    "q59_gap_fill_locf",
    oracle="""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS b,
               ROUND(arg_max(value, event_id), 4) AS v
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, MIN(b) AS mn, MAX(b) AS mx FROM hourly GROUP BY 1
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS b
        FROM bounds
    ),
    j AS (
        SELECT g.user_id, g.b, h.v
        FROM grid g LEFT JOIN hourly h USING (user_id, b)
    )
    SELECT user_id,
           b AS bucket_ts,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_filled,
           CASE WHEN v IS NULL THEN 0 ELSE 1 END AS is_observed
    FROM j
    """,
    note="time-series gap fill + LOCF: dense per-user hourly grid "
    "(sequence bounded by each key's own span), latest-by-event-id "
    "observation per bucket, forward fill via last(ignorenulls) window",
    tags=("temporal", "gapfill", "window"),
)
def q59_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.timeseries import gap_fill_locf

    events = load_table(spark, sf_dir, "events")
    return gap_fill_locf(
        events,
        ["user_id"],
        "ts",
        "value",
        order_col="event_id",
        bucket="hour",
    )


@register(
    "q60_ohlc_downsample",
    oracle="""
    WITH r AS (
        SELECT date_trunc('hour', ts) AS bucket_ts, event_type, value,
               row_number() OVER (
                   PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (
                   PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT bucket_ts, event_type,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
           COUNT(*) AS n_obs
    FROM r GROUP BY bucket_ts, event_type
    """,
    note="time-series downsample to hourly OHLC bars: one two-phase "
    "aggregate with min_by/max_by over a (ts, event_id) struct order "
    "— only group-cardinality partials cross the exchange, vs the "
    "row_number formulation which would shuffle every raw row (the "
    "oracle uses it; results are identical because the tie-break is "
    "total)",
    tags=("temporal", "downsample", "ohlc"),
)
def q60_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.timeseries import downsample_ohlc

    events = load_table(spark, sf_dir, "events")
    return downsample_ohlc(
        events,
        "ts",
        "value",
        group_cols=["event_type"],
        bucket="hour",
        order_cols=["event_id"],
    )


@register(
    "q72_time_decayed_engagement",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS m FROM events),
    terms AS (
        SELECT user_id,
               ROUND(value * exp(-0.6931471805599453
                                 * (epoch_us(m) - epoch_us(ts))
                                 / 86400000000.0), 6) AS term
        FROM events, mx
        WHERE event_type IN ('click', 'view', 'purchase')
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(30,6))) AS DOUBLE), 4)
               AS decayed_score
    FROM terms
    GROUP BY user_id
    """,
    note="time-decayed engagement score (the feature-store decay "
    "aggregate): each event contributes value * 2^(-age_days), "
    "half-life one day, anchored at the corpus max timestamp (1-row "
    "broadcast — a serving deployment anchors at now()). Ages are "
    "timestamp DIFFERENCES (timezone-invariant, so driver-env "
    "timezones cannot skew them); per-term contributions are rounded "
    "then decimal-summed, order-independent at any parallelism",
    tags=("temporal", "decay", "feature"),
)
def q72_time_decayed_engagement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view", "purchase")
    )
    anchor = (
        load_table(spark, sf_dir, "events").agg(F.max("ts").alias("__m"))
    )
    age_us = F.expr("timestampdiff(MICROSECOND, ts, __m)")
    term = F.round(
        F.col("value")
        * F.exp(
            F.lit(-0.6931471805599453) * age_us / F.lit(86400000000.0)
        ),
        6,
    )
    return (
        events.join(F.broadcast(anchor))
        .select("user_id", term.alias("__term"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("__term").cast("decimal(30,6)")).cast("double"),
                4,
            ).alias("decayed_score"),
        )
    )


@register(
    "q74_series_similarity",
    oracle="""
    WITH grid AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 4)
                   AS v
        FROM events GROUP BY 1, 2
    ),
    probe AS (SELECT bucket, v AS x FROM grid WHERE user_id = 5),
    paired AS (
        SELECT g.user_id, p.x, g.v AS y
        FROM grid g JOIN probe p ON g.bucket = p.bucket
        WHERE g.user_id <> 5
    ),
    stats AS (
        SELECT user_id,
               COUNT(*) * 1.0 AS n,
               CAST(SUM(CAST(ROUND(x, 4) AS DECIMAL(30,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(ROUND(y, 4) AS DECIMAL(30,4))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(30,6))) AS DOUBLE)
                   AS sxy,
               CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(30,6))) AS DOUBLE)
                   AS sx2,
               CAST(SUM(CAST(ROUND(y * y, 6) AS DECIMAL(30,6))) AS DOUBLE)
                   AS sy2
        FROM paired GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_shared,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)),
                 4) AS corr
    FROM stats
    WHERE n >= 5 AND (n * sx2 - sx * sx) > 0 AND (n * sy2 - sy * sy) > 0
    ORDER BY corr DESC, user_id
    LIMIT 10
    """,
    note="time-series similarity search (the EDBT 2019 streaming "
    "series-similarity shape, PAPERS.md): per-user hourly activity "
    "series on a common grid, Pearson correlation of every user "
    "against a probe user computed from five decimal-summed moments "
    "over the ALIGNED buckets only (inner join on the hour — the "
    "sparse-series intersection, never a dense matrix), top-10 by "
    "rounded correlation with id tiebreak; degenerate "
    "(zero-variance) and short overlaps filtered identically on "
    "both engines",
    tags=("timeseries", "similarity", "correlation"),
)
def q74_series_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    grid = events.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.round(dsum("value", scale=6), 4).alias("v"))
    probe = grid.where(F.col("user_id") == 5).select(
        "bucket", F.col("v").alias("x")
    )
    paired = (
        grid.where(F.col("user_id") != 5)
        .join(probe, "bucket")
        .select("user_id", "x", F.col("v").alias("y"))
    )
    stats = paired.groupBy("user_id").agg(
        F.count("*").cast("double").alias("n"),
        dsum(F.round(F.col("x"), 4), scale=4).alias("sx"),
        dsum(F.round(F.col("y"), 4), scale=4).alias("sy"),
        dsum(F.round(F.col("x") * F.col("y"), 6), scale=6).alias("sxy"),
        dsum(F.round(F.col("x") * F.col("x"), 6), scale=6).alias("sx2"),
        dsum(F.round(F.col("y") * F.col("y"), 6), scale=6).alias("sy2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sx2, sy2 = F.col("sxy"), F.col("sx2"), F.col("sy2")
    vx, vy = n * sx2 - sx * sx, n * sy2 - sy * sy
    return (
        stats.where((n >= 5) & (vx > 0) & (vy > 0))
        .select(
            "user_id",
            n.cast("long").alias("n_shared"),
            F.round(
                (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)), 4
            ).alias("corr"),
        )
        .orderBy(F.desc("corr"), F.asc("user_id"))
        .limit(10)
    )


@register(
    "q75_funnel_conversion",
    oracle="""
    WITH stage1 AS (
        SELECT user_id, MIN(event_id) AS e1
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    stage2 AS (
        SELECT e.user_id, MIN(e.event_id) AS e2
        FROM events e JOIN stage1 s ON e.user_id = s.user_id
        WHERE e.event_type = 'click' AND e.event_id > s.e1
        GROUP BY e.user_id
    ),
    stage3 AS (
        SELECT e.user_id, MIN(e.event_id) AS e3
        FROM events e JOIN stage2 s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.event_id > s.e2
        GROUP BY e.user_id
    )
    SELECT
        CAST((SELECT COUNT(*) FROM stage1) AS BIGINT) AS n_signup,
        CAST((SELECT COUNT(*) FROM stage2) AS BIGINT) AS n_clicked_after,
        CAST((SELECT COUNT(*) FROM stage3) AS BIGINT) AS n_purchased_after,
        ROUND((SELECT COUNT(*) FROM stage3) * 1.0
              / (SELECT COUNT(*) FROM stage1), 4) AS conversion
    """,
    note="ordered funnel analysis (signup -> later click -> later "
    "purchase): each stage is one conditional MIN aggregate chained "
    "through an equi-join on the previous stage's anchor event — the "
    "strictly-ordered sequence match, no window sort over the full "
    "event stream and no self-join explosion (each stage's frame "
    "shrinks monotonically). Event-id total order makes the stage "
    "anchors engine-exact",
    tags=("funnel", "sequence", "analytics"),
)
def q75_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def stage(prior, etype):
        e = events.where(F.col("event_type") == etype)
        if prior is None:
            return e.groupBy("user_id").agg(
                F.min("event_id").alias("anchor")
            )
        return (
            e.join(
                prior.select("user_id", F.col("anchor").alias("__prev")),
                "user_id",
            )
            .where(F.col("event_id") > F.col("__prev"))
            .groupBy("user_id")
            .agg(F.min("event_id").alias("anchor"))
        )

    s1 = stage(None, "signup").localCheckpoint(eager=True)
    s2 = stage(s1, "click").localCheckpoint(eager=True)
    s3 = stage(s2, "purchase")
    n1 = s1.count()
    n2 = s2.count()
    n3 = s3.count()
    return spark.createDataFrame(
        [(n1, n2, n3, round(n3 / n1, 4) if n1 else None)],
        "n_signup long, n_clicked_after long, n_purchased_after long, "
        "conversion double",
    )


@register(
    "q76_cohort_retention",
    oracle="""
    WITH cohorts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, c.cohort_week,
               CAST(floor((epoch_us(date_trunc('week', e.ts))
                           - epoch_us(c.cohort_week))
                          / 604800000000.0) AS BIGINT)
                   AS week_offset
        FROM events e JOIN cohorts c ON e.user_id = c.user_id
    ),
    sizes AS (
        SELECT cohort_week, COUNT(*) AS cohort_size
        FROM cohorts GROUP BY cohort_week
    )
    SELECT a.cohort_week, a.week_offset,
           COUNT(*) AS n_active,
           CAST(MAX(s.cohort_size) AS BIGINT) AS cohort_size,
           ROUND(COUNT(*) * 1.0 / MAX(s.cohort_size), 4) AS retention
    FROM activity a JOIN sizes s ON a.cohort_week = s.cohort_week
    GROUP BY a.cohort_week, a.week_offset
    """,
    note="cohort retention matrix: users cohorted by first-activity "
    "week, each (cohort, week-offset) cell counts distinct users "
    "still active — two hash aggregates and one distinct projection, "
    "no per-user window sort; offsets from epoch arithmetic on "
    "week-truncated timestamps (timezone-invariant integers), so "
    "the matrix is engine-exact",
    tags=("cohort", "retention", "analytics"),
)
def q76_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cohorts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        events.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                (
                    F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                    - F.unix_timestamp(F.col("cohort_week"))
                )
                / 604800.0
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        activity.join(sizes, "cohort_week")
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.count("*").alias("n_active"),
            F.max("cohort_size").cast("long").alias("cohort_size"),
            F.round(
                F.count("*") / F.max("cohort_size"), 4
            ).alias("retention"),
        )
    )


@register(
    "q77_association_rules",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    n AS (SELECT COUNT(DISTINCT user_id) * 1.0 AS n_users FROM events),
    singles AS (
        SELECT event_type, COUNT(*) AS c FROM baskets GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS ante, b.event_type AS cons,
               COUNT(*) AS c_ab
        FROM baskets a JOIN baskets b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.ante, p.cons,
           CAST(p.c_ab AS BIGINT) AS n_both,
           ROUND(p.c_ab / n_users, 4) AS support,
           ROUND(p.c_ab * 1.0 / sa.c, 4) AS confidence,
           ROUND(p.c_ab * n_users / (sa.c * 1.0 * sc.c), 4) AS lift
    FROM pairs p
    JOIN singles sa ON p.ante = sa.event_type
    JOIN singles sc ON p.cons = sc.event_type
    CROSS JOIN n
    WHERE p.c_ab / n_users >= 0.05
    """,
    note="association-rule mining over per-user event baskets "
    "(support / confidence / lift, the market-basket shape): baskets "
    "are one distinct projection, itemset-2 counts one self-equi-join "
    "on the basket key ordered a<b (each pair counted once, never "
    "all-pairs across baskets), singleton counts and the user total "
    "join back as tiny aggregates. All ratios rounded identically on "
    "both engines; 5% minimum support",
    tags=("association", "basket", "analytics"),
)
def q77_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    baskets = events.select("user_id", "event_type").distinct()
    n_agg = events.agg(
        F.countDistinct("user_id").cast("double").alias("__n")
    )
    singles = baskets.groupBy("event_type").agg(F.count("*").alias("c"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ante"),
            F.col("b.event_type").alias("cons"),
        )
        .agg(F.count("*").alias("c_ab"))
    )
    sa = singles.select(
        F.col("event_type").alias("ante"), F.col("c").alias("c_a")
    )
    sc = singles.select(
        F.col("event_type").alias("cons"), F.col("c").alias("c_c")
    )
    return (
        pairs.join(sa, "ante")
        .join(sc, "cons")
        .join(F.broadcast(n_agg))
        .where(F.col("c_ab") / F.col("__n") >= 0.05)
        .select(
            "ante",
            "cons",
            F.col("c_ab").cast("long").alias("n_both"),
            F.round(F.col("c_ab") / F.col("__n"), 4).alias("support"),
            F.round(F.col("c_ab") / F.col("c_a"), 4).alias("confidence"),
            F.round(
                F.col("c_ab") * F.col("__n") / (F.col("c_a") * F.col("c_c")),
                4,
            ).alias("lift"),
        )
    )


@register(
    "q78_anomaly_zscore",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id, ROUND(value, 4) AS value FROM events
    ),
    stats AS (
        SELECT user_id, event_id, value,
               COUNT(*) OVER w AS n_prior,
               CAST(SUM(CAST(value AS DECIMAL(30,4))) OVER w AS DOUBLE)
                   AS s1,
               CAST(SUM(CAST(ROUND(value * value, 6) AS DECIMAL(30,6)))
                    OVER w AS DOUBLE) AS s2
        FROM v
        WINDOW w AS (
            PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        )
    ),
    scored AS (
        SELECT user_id, event_id, value, n_prior,
               ROUND((value - s1 / n_prior)
                     / sqrt((s2 - s1 * s1 / n_prior) / (n_prior - 1)),
                     3) AS z
        FROM stats
        WHERE n_prior >= 10
          AND (s2 - s1 * s1 / n_prior) / (n_prior - 1) > 0
    )
    SELECT user_id, event_id, value, z
    FROM scored WHERE abs(z) > 3
    """,
    note="expanding-window anomaly detection: each event scored "
    "against the running mean/std of ITS OWN user's prior history "
    "(rows-between-preceding frame — the leakage-free online "
    "monitoring shape), |z| > 3 flags. Running moments are "
    "decimal-summed over rounded values so the expanding sums are "
    "bit-identical on both engines; z rounded before the threshold "
    "so the flag set is engine-exact",
    tags=("anomaly", "monitoring", "window"),
)
def q78_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    v = events.select(
        "user_id", "event_id", F.round("value", 4).alias("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    split = 10**6
    vd = F.col("value")
    # expanding decimal sums via the split-long trick (base.dsum is an
    # aggregate helper; windows need the same exactness inline)
    s1 = (
        F.sum(F.round(vd * 10**4).cast("long")).over(w).cast("decimal(38,0)")
        / F.lit(10**4)
    ).cast("double")
    s2 = (
        F.sum(F.round(vd * vd, 6).cast("decimal(30,6)")).over(w)
    ).cast("double")
    n = F.count("*").over(w)
    stats = v.select(
        "user_id",
        "event_id",
        "value",
        n.alias("n_prior"),
        s1.alias("s1"),
        s2.alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_prior")) / (
        F.col("n_prior") - 1
    )
    z = F.round(
        (F.col("value") - F.col("s1") / F.col("n_prior")) / F.sqrt(var), 3
    )
    return (
        stats.where((F.col("n_prior") >= 10) & (var > 0))
        .select("user_id", "event_id", "value", z.alias("z"))
        .where(F.abs(F.col("z")) > 3)
    )


@register(
    "q79_session_paths",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    )) > 1800000000
                    OR LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ),
    s AS (
        SELECT *, SUM(new_s) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING
        ) AS session_no
        FROM g
    ),
    paths AS (
        SELECT user_id, session_no,
               array_to_string(
                   (list(event_type ORDER BY ts, event_id))[1:3],
                   '>') AS path
        FROM s GROUP BY user_id, session_no
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 15
    """,
    note="session path analysis: 30-minute-gap sessionization (the "
    "q17 lag/cumsum fold), each session reduced to its first three "
    "event types in (ts, event_id) order — sort_array over bounded "
    "per-session structs, NOT a global sort — top-15 navigation "
    "paths. Deterministic tiebreaks end to end",
    tags=("session", "path", "analytics"),
)
def q79_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w)
    )
    new_s = F.when(
        gap_us.isNull() | (gap_us > 1_800_000_000), 1
    ).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(new_s).over(wc).alias("session_no"),
    )
    paths = s.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                1,
                3,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(15)
    )


_Q109_TOL_US = 120_000_000  # 120 s, in exact integer microseconds


@register(
    "q109_asof_nearest_tolerance",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_us,
           c.click_id,
           c.click_us
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
        SELECT c.event_id AS click_id, epoch_us(c.ts) AS click_us
        FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= {_Q109_TOL_US}
        ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)) ASC,
                 CASE WHEN epoch_us(c.ts) <= epoch_us(p.ts)
                      THEN 0 ELSE 1 END ASC,
                 CASE WHEN epoch_us(c.ts) <= epoch_us(p.ts)
                      THEN -c.event_id ELSE c.event_id END ASC
        LIMIT 1
    ) c ON TRUE
    """,
    note="the remaining pd.merge_asof surface: direction='nearest' "
    "with a tolerance band — per purchase, the CLOSEST click either "
    "way within 120 s, ties to the backward side (pandas "
    "convention), max-id/min-id tiebreaks per side. One shuffle of "
    "|L| + 2|R| rows: each right row enters the union twice (one "
    "role tag per direction, so exact-match semantics hold under "
    "ONE ascending sort) and a single WindowExec evaluates the "
    "preceding-frame last AND following-frame first over the same "
    "sort — never a pairwise time-band join. Timestamps compared "
    "as exact integer epoch-microseconds (< 2^53, IEEE-exact in "
    "the operator's double math), so the whole pick is hash-gated; "
    "the oracle spells the semantics as a LATERAL top-1",
    tags=("join", "asof", "temporal"),
)
def q109_asof_nearest_tolerance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_us"),
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_us",
        right_ts="click_us",
        right_payload=["click_id", "click_us"],
        direction="nearest",
        tiebreak="click_id",
        tolerance=float(_Q109_TOL_US),
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_us",
        F.col("click_id_matched").alias("click_id"),
        F.col("click_us_matched").alias("click_us"),
    )
