"""Relational operator inventory (SURVEY.md §2.3) with DuckDB oracles.

The reference repo has no relational executor (SURVEY.md §2.3 —
`examples/pgoutput/main.go` contains only the CDC decode loop); this
is the query surface its architecture patterns feed (sync-to-analytics
slides 33-37), expressed as idiomatic Spark DataFrame plans so
Catalyst handles pushdown / pruning / join strategy / AQE.

Scale notes (100 TB posture):
- Fact-side filters appear *before* joins → parquet pushdown.
- Broadcast hints only on truly bounded dims (region=5, nation=25 rows).
  supplier/part/customer grow with SF — a forced broadcast of them OOMs
  executors at 100×, so AQE picks broadcast-vs-SMJ from runtime stats.
- Every window/top-k carries a unique tiebreak; no order dependence.
- Measures sum through decimal (see queries.base) so results are
  independent of partial-aggregation order — at 1000 executors the
  combine tree differs per run, the decimal sum does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.queries.base import davg, davg_sql, dsum, dsum_sql, register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------
# Aggregation core
# ----------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    note="TPC-H Q1 shape: scan-filter-agg, 8 aggregates, map-side combine",
    tags=("agg",),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q06_revenue_filter",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    note="TPC-H Q6 shape: pure pushdown filter + global agg; no shuffle of rows",
    tags=("agg", "pushdown"),
)
def q06_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@register(
    "q11_group_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderstatus
    """,
    note="distinct aggregate (expand + two-phase agg in Spark)",
    tags=("agg",),
)
def q11_group_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )


@register(
    "q12_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           COUNT(c_custkey) AS n_customers,
           {dsum_sql('c_acctbal', 2)} AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    note="hierarchical rollup over broadcast-joined dims",
    tags=("agg", "rollup"),
)
def q12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count("c_custkey").alias("n_customers"),
        dsum("c_acctbal", 2).alias("sum_acctbal"),
    )


@register(
    "q13_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    note="cube expansion",
    tags=("agg", "cube"),
)
def q13_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "q32_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, {dsum_sql('o_totalprice', 2)} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    note="explicit grouping sets via Spark SQL",
    tags=("agg",),
)
def q32_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n, {dsum_sql('o_totalprice', 2)} AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ----------------------------------------------------------------------
# Joins
# ----------------------------------------------------------------------

@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT o_orderkey,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1999-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    note="TPC-H Q3 shape: selective dim filter, fact-fact join, top-k",
    tags=("join", "topk"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1999-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1999-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
    note="TPC-H Q5 shape: 6-way star join, bounded dims broadcast, region pushdown",
    tags=("join", "agg"),
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@register(
    "q07_broadcast_dim_join",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_items,
           {dsum_sql('l_extendedprice')} AS gross
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 25
    GROUP BY p_brand
    """,
    note="fact ⋈ dim with dim-side pushdown filter; AQE broadcasts the "
    "filtered dim when stats allow (no forced hint — part grows with SF)",
    tags=("join", "broadcast"),
)
def q07_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_size") <= 25)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice").alias("gross"),
        )
    )


@register(
    "q08_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
    )
    """,
    note="left-semi join (EXISTS) — no row multiplication",
    tags=("join", "semi"),
)
def q08_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q09_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
    )
    """,
    note="left-anti join (NOT EXISTS)",
    tags=("join", "anti"),
)
def q09_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q10_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    note="full outer join of two aggregates + null coalescing",
    tags=("join", "outer"),
)
def q10_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cust.join(supp, cust.nk == supp.snk, "full_outer").select(
        F.coalesce(cust.nk, supp.snk).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    note="TPC-H Q4 shape: correlated EXISTS decorrelated to semi join",
    tags=("join", "semi", "subquery"),
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        """
    )


# ----------------------------------------------------------------------
# Window functions
# ----------------------------------------------------------------------

@register(
    "q14_window_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS INT) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
    note="per-group top-k via ranked window; deterministic tiebreak",
    tags=("window", "topk"),
)
def q14_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@register(
    "q15_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
    note="running sum with explicit frame; decimal accumulation",
    tags=("window",),
)
def q15_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,4)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "q16_window_lag",
    oracle="""
    SELECT event_id, user_id,
           CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           )) AS BIGINT) AS gap_us,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_type
    FROM events
    """,
    note="lag/lead over event stream",
    tags=("window",),
)
def q16_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return events.select(
        "event_id",
        "user_id",
        gap.cast("long").alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q17_sessionization",
    oracle="""
    WITH g AS (
        SELECT user_id, ts,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               )) AS gap_us
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM g GROUP BY user_id
    """,
    note="sessionization: gap>30min starts a session (lag + conditional count)",
    tags=("window", "session"),
)
def q17_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = events.select(
        "user_id", gap.alias("gap_us")
    )
    return flagged.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(
                F.col("gap_us").isNull() | (F.col("gap_us") > 1_800_000_000), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_sessions"),
    )


# ----------------------------------------------------------------------
# Set operations (slide-9 snapshot diff is q18's shape)
# ----------------------------------------------------------------------

@register(
    "q18_set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    note="EXCEPT — the polling-CDC set difference (deck slide 9)",
    tags=("setop",),
)
def q18_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    p = orders.where(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.subtract(p)


@register(
    "q19_set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    note="INTERSECT distinct-set semantics over projected keys",
    tags=("setop",),
)
def q19_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    p = orders.where(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.intersect(p)


@register(
    "q20_union_distinct",
    oracle="""
    SELECT nationkey, COUNT(*) AS n_entities FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
    note="UNION ALL + regroup",
    tags=("setop",),
)
def q20_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return (
        cust.unionByName(supp)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n_entities"))
    )


# ----------------------------------------------------------------------
# Scalar function surface
# ----------------------------------------------------------------------

@register(
    "q21_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_type) AS type_upper,
           SUBSTR(p_name, 1, 8) AS name_prefix,
           CAST(REGEXP_EXTRACT(p_brand, 'Brand#([0-9]+)', 1) AS BIGINT) AS brand_num,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len
    FROM part
    WHERE p_type LIKE '%BRASS%' OR p_size > 40
    """,
    note="string function surface: upper/substr/regexp/concat/length/like",
    tags=("scalar",),
)
def q21_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.where(
        F.col("p_type").like("%BRASS%") | (F.col("p_size") > 40)
    ).select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1)
        .cast("long")
        .alias("brand_num"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias(
            "brand_type"
        ),
        F.length("p_name").cast("long").alias("name_len"),
    )


@register(
    "q22_date_funcs",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           date_trunc('month', o_orderdate) AS month_start,
           COUNT(*) AS n,
           {dsum_sql('o_totalprice', 2)} AS total
    FROM orders
    GROUP BY 1, 2, 3
    """,
    note="date extraction + truncation grouping",
    tags=("scalar", "date"),
)
def q22_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        )
        .agg(
            F.count("*").alias("n"),
            dsum("o_totalprice", 2).alias("total"),
        )
    )


@register(
    "q23_json_extract",
    oracle=f"""
    SELECT event_type,
           CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k": *([0-9]+)', 1) AS BIGINT))
                AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    note="JSON property extraction over events.props",
    tags=("scalar", "json"),
)
def q23_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"), F.count("*").alias("n")
    )


@register(
    "q33_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(SQRT(l_extendedprice), 6) AS root_price,
           ROUND(LN(l_extendedprice + 1), 6) AS log_price,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
           ABS(l_discount - 0.05) AS disc_dev
    FROM lineitem
    WHERE l_orderkey < 500
    """,
    note="math scalar surface (sqrt/ln/ceil/abs), rounded for portability",
    tags=("scalar", "math"),
)
def q33_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("root_price"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.ceil(F.col("l_quantity") / 7.0).cast("long").alias("qty_bucket"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
    )


@register(
    "q34_case_bucketing",
    oracle=f"""
    SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 8000 THEN 'mid'
                ELSE 'high' END AS bucket,
           COUNT(*) AS n,
           {davg_sql('c_acctbal', 2)} AS avg_bal
    FROM customer
    GROUP BY 1
    """,
    note="CASE WHEN bucketing + agg",
    tags=("scalar",),
)
def q34_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 8000, "mid")
        .otherwise("high")
    )
    return cust.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"), davg("c_acctbal", 2).alias("avg_bal")
    )


# ----------------------------------------------------------------------
# Sort / limit / pivot
# ----------------------------------------------------------------------

@register(
    "q24_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    note="global top-k (TakeOrderedAndProject, no full sort)",
    tags=("sort", "topk"),
)
def q24_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q27_pivot",
    oracle="""
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS BIGINT) AS view,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS BIGINT) AS signup,
           CAST(COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS BIGINT) AS error
    FROM events
    GROUP BY user_id
    """,
    note="pivot with explicit value list (single-shuffle expand)",
    tags=("pivot",),
)
def q27_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    piv = (
        events.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds],
    )
