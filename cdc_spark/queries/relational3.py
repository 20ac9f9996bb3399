"""TPC-H-shape depth: the classic analytic patterns adapted to the
driver's star schema (returned items, nation trade volume, market
share, promo share, HAVING on grouped facts, distinct-supplier stats,
disjunctive predicates)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.queries.base import dsum, dsum_sql, register

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q45_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {dsum_sql(_REV)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    note="TPC-H Q10 shape: returned-item revenue per customer, top 20",
    tags=("join", "topk"),
)
def q45_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q46_nation_trade_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS yr,
           {dsum_sql(_REV)} AS volume
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    note="TPC-H Q7 shape: cross-nation trade volume by year (two bounded "
    "nation broadcast joins with role-separated aliases; supp/cust join "
    "strategy left to AQE)",
    tags=("join", "agg"),
)
def q46_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("n1_key") != F.col("n2_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("yr"),
        )
        .agg(dsum(rev).alias("volume"))
    )


@register(
    "q47_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(CASE WHEN n2.n_name = 'CHINA'
                                  THEN {_REV} ELSE 0 END
                             AS DECIMAL(30,6))) AS DOUBLE) AS china_vol,
               {dsum_sql(_REV)} AS total_vol
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY 1
    )
    SELECT yr, ROUND(china_vol / total_vol, 6) AS mkt_share
    FROM vol
    """,
    note="TPC-H Q8 shape: one supplier-nation's share of a region's "
    "market per year (conditional decimal sum ratio)",
    tags=("join", "agg", "ratio"),
)
def q47_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    china = F.when(F.col("supp_nation") == "CHINA", rev).otherwise(F.lit(0.0))
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            dsum(china).alias("china_vol"),
            dsum(rev).alias("total_vol"),
        )
    )
    return vol.select(
        "yr", F.round(F.col("china_vol") / F.col("total_vol"), 6).alias("mkt_share")
    )


@register(
    "q48_promo_share",
    oracle=f"""
    SELECT ROUND(
        CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0 END
                      AS DECIMAL(30,6))) AS DOUBLE) * 100
        / CAST(SUM(CAST({_REV} AS DECIMAL(30,6))) AS DOUBLE), 6
    ) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-07-01 00:00:00'
    """,
    note="TPC-H Q14 shape: promo revenue percentage",
    tags=("join", "agg", "ratio"),
)
def q48_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    agg = li.join(part, li.l_partkey == part.p_partkey).agg(
        dsum(promo).alias("p"), dsum(rev).alias("t")
    )
    return agg.select(
        F.round(F.col("p") * 100 / F.col("t"), 6).alias("promo_pct")
    )


@register(
    "q49_large_orders",
    oracle=f"""
    SELECT c_custkey, o_orderkey, o_totalprice,
           {dsum_sql('l_quantity')} AS total_qty
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, o_orderkey, o_totalprice
    HAVING SUM(l_quantity) > 250
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    note="TPC-H Q18 shape: HAVING on grouped fact, top-k join-back",
    tags=("join", "having", "topk"),
)
def q49_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(
            dsum("l_quantity").alias("total_qty"),
            F.sum("l_quantity").alias("__qty_raw"),
        )
        .where(F.col("__qty_raw") > 250)
        .drop("__qty_raw")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@register(
    "q50_supplier_part_stats",
    oracle="""
    SELECT p_brand, p_type,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size NOT IN (10, 20, 30)
    GROUP BY p_brand, p_type
    """,
    note="TPC-H Q16 shape: distinct-supplier counts with NOT-IN pruning",
    tags=("join", "distinct"),
)
def q50_supplier_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & (~F.col("p_size").isin(10, 20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q51_disjunctive_predicates",
    oracle=f"""
    SELECT {dsum_sql(_REV)} AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_type = 'PROMO' AND l_quantity >= 40)
    """,
    note="TPC-H Q19 shape: disjunctive multi-attribute predicates "
    "evaluated during the part join (strategy left to AQE)",
    tags=("join", "predicate"),
)
def q51_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 40))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(dsum(rev).alias("revenue"), F.count("*").alias("n"))
    )


@register(
    "q52_salted_skew_agg",
    oracle="""
    SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS hot_key,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events GROUP BY 1
    """,
    note="skew-safe aggregation: hot key sharded across 16 salts for "
    "the partial phase, algebraic merge — identical result to the "
    "unsalted plan, no single-reducer bottleneck",
    tags=("agg", "skew"),
)
def q52_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.skew import salted_agg

    events = load_table(spark, sf_dir, "events")
    # synthesize a hot key: half of all rows collapse onto key 0
    skewed = events.withColumn(
        "hot_key",
        F.when(F.col("user_id") % 2 == 0, F.lit(0)).otherwise(
            F.col("user_id")
        ).cast("long"),
    )
    out = salted_agg(
        skewed,
        ["hot_key"],
        {
            "n": ("count", "event_id"),
            "total": ("sum", F.col("value").cast("decimal(18,6)")),
        },
        salt=16,
    )
    return out.select(
        "hot_key", "n", F.col("total").cast("double").alias("total")
    )


@register(
    "q53_collect_sorted",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(event_type)), ',') AS types_sorted,
           array_to_string(list_sort(list_distinct(list(event_type))), ',')
               AS distinct_types
    FROM events GROUP BY user_id
    """,
    note="deterministic sorted collect WITHOUT an unbounded per-key "
    "buffer (rebuilt round 9; output and oracle unchanged). The "
    "sorted full list over a LOW-CARDINALITY element domain is each "
    "distinct type repeated by its count, so the plan aggregates "
    "(user, type) -> count — fixed-size, map-side-combinable state — "
    "and reconstructs the identical string with array_repeat; the "
    "second aggregate's collect_list is bounded by the type domain "
    "(5 values), never by a hot key's event count. The only "
    "data-sized thing left is the output string itself, inherent to "
    "the requested semantics. For data-sized element domains use the "
    "bounded top-n q62 variant",
    tags=("agg", "collect"),
)
def q53_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n")
    )
    packed = per_type.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("event_type").alias("t"), F.col("n"))
            )
        ).alias("tc")
    )
    return packed.select(
        "user_id",
        F.concat_ws(
            ",",
            F.flatten(
                F.transform(
                    "tc", lambda s: F.array_repeat(s["t"], s["n"].cast("int"))
                )
            ),
        ).alias("types_sorted"),
        F.concat_ws(",", F.transform("tc", lambda s: s["t"])).alias(
            "distinct_types"
        ),
    )


@register(
    "q62_bounded_collect_topn",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           array_to_string(list(event_type ORDER BY rn), ',')
               AS recent_types
    FROM ranked WHERE rn <= 5 GROUP BY user_id
    """,
    note="Bounded-output per-key collect: 5 most recent event types "
    "per user via a salted two-stage fold — each of 16 salt buckets "
    "folds its share (worst-case buffer rows/16, sliced to 5 the "
    "moment the bucket completes), then 16 five-element arrays "
    "combine per key. The hot-key-safer twin of q53: buffer divided "
    "by the salt factor and no per-key global sort; raise the salt "
    "for hotter keys",
    tags=("agg", "collect", "topk", "skew"),
)
def q62_bounded_collect_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    item = F.struct(
        (-F.col("event_id")).alias("o"), F.col("event_type").alias("t")
    )
    part = (
        events.withColumn("__salt", F.pmod(F.col("event_id"), F.lit(16)))
        .groupBy("user_id", "__salt")
        .agg(
            F.slice(F.array_sort(F.collect_list(item)), 1, 5).alias("__top")
        )
    )
    return (
        part.groupBy("user_id")
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("__top"))), 1, 5
            ).alias("__top5")
        )
        .select(
            "user_id",
            F.concat_ws(
                ",", F.transform("__top5", lambda s: s["t"])
            ).alias("recent_types"),
        )
    )


@register(
    "q54_except_all_multiset",
    oracle="""
    SELECT l_returnflag FROM lineitem WHERE l_quantity > 25
    EXCEPT ALL
    SELECT l_returnflag FROM lineitem WHERE l_linestatus = 'F'
    """,
    note="EXCEPT ALL (bag semantics — duplicates subtract by count, "
    "unlike q18's set semantics)",
    tags=("setop",),
)
def q54_except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") > 25).select("l_returnflag")
    b = li.where(F.col("l_linestatus") == "F").select("l_returnflag")
    return a.exceptAll(b)


@register(
    "q55_intersect_all_multiset",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    """,
    note="INTERSECT ALL (bag semantics)",
    tags=("setop",),
)
def q55_intersect_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.where(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.intersectAll(b)


@register(
    "q57_lateral_topk",
    oracle="""
    SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
    FROM (SELECT * FROM customer WHERE c_mktsegment = 'MACHINERY') c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 3
    ) t
    """,
    note="lateral join: per-customer correlated top-3 subquery in FROM "
    "(Catalyst decorrelates to a ranked window under the hood — the "
    "declarative form stays shuffle-minimal)",
    tags=("join", "lateral", "topk"),
)
def q57_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
        FROM (SELECT * FROM customer WHERE c_mktsegment = 'MACHINERY') c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        ) t
        """
    )


@register(
    "q61_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               -- determinism: both sums decimal-backed (float SUM is
               -- order-dependent), and fixed-point FLOOR instead of
               -- ROUND — engines disagree on ROUND at half-way doubles
               -- (observed at sf0.1: 60.27125 -> .2712 vs .2713),
               -- while FLOOR of identical IEEE doubles always agrees
               CAST(FLOOR(CAST(SUM(CAST(l_extendedprice
                                        AS DECIMAL(30,6))) AS DOUBLE)
                     / CAST(SUM(CAST(l_quantity AS DECIMAL(30,6)))
                            AS DOUBLE) * 10000) AS BIGINT)
                   AS unit_cost_e4
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT ps.*, s_name, s_acctbal
        FROM ps
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT p_partkey, s_name, unit_cost_e4
    FROM part, eu
    WHERE p_partkey = l_partkey
      AND p_size = 15
      AND unit_cost_e4 = (
          SELECT MIN(e2.unit_cost_e4) FROM eu e2
          WHERE e2.l_partkey = p_partkey
      )
    """,
    note="TPC-H Q2 shape (partsupp derived from lineitem): min-cost "
    "supplier per part within a region via a correlated aggregate "
    "subquery — decorrelated in the Spark plan into a per-part min "
    "aggregate joined back (one extra group-cardinality shuffle "
    "instead of a per-row subquery; bounded dims broadcast, region "
    "filter pushed below the joins)",
    tags=("join", "subquery", "tpch"),
)
def q61_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.floor(
            F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).cast(
                "double"
            )
            / F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast(
                "double"
            )
            * 10000
        )
        .cast("long")
        .alias("unit_cost_e4")
    )
    eu = (
        ps.join(supp, ps.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "EUROPE")
        .select("l_partkey", "l_suppkey", "unit_cost_e4", "s_name")
    )
    # decorrelated correlated-min: per-part minimum joined back
    min_cost = eu.groupBy("l_partkey").agg(
        F.min("unit_cost_e4").alias("__min_cost")
    )
    best = eu.join(min_cost, on="l_partkey").where(
        F.col("unit_cost_e4") == F.col("__min_cost")
    )
    return (
        best.join(
            part.where(F.col("p_size") == 15),
            best.l_partkey == F.col("p_partkey"),
        )
        .select("p_partkey", "s_name", "unit_cost_e4")
    )


@register(
    "q63_sole_late_supplier",
    oracle="""
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 75 DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM late l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    note="TPC-H Q21 shape (late = shipped >75 days after order date; "
    "no receiptdate/commitdate in this schema): suppliers who were the "
    "SOLE late supplier on a multi-supplier finalized order. Double "
    "correlation — EXISTS another supplier on the order, NOT EXISTS "
    "another LATE supplier — decorrelated into one semi and one anti "
    "join on l_orderkey; nation filter broadcast-pruned before the "
    "fact joins",
    tags=("join", "subquery", "tpch"),
)
def q63_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    late = (
        li.join(
            orders.where(F.col("o_orderstatus") == "F"),
            li.l_orderkey == orders.o_orderkey,
        )
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.distinct()

    # EXISTS another supplier on the same order: semi join against
    # lineitem rows with a different suppkey
    other = li.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    has_other = l1.join(
        other,
        (l1.l_orderkey == other.o_ok) & (l1.l_suppkey != other.o_sk),
        "left_semi",
    )
    # NOT EXISTS another LATE supplier on the same order: anti join
    # against the late set itself
    other_late = late.select(
        F.col("l_orderkey").alias("a_ok"), F.col("l_suppkey").alias("a_sk")
    ).distinct()
    sole = has_other.join(
        other_late,
        (has_other.l_orderkey == other_late.a_ok)
        & (has_other.l_suppkey != other_late.a_sk),
        "left_anti",
    )

    named = sole.join(supp, sole.l_suppkey == supp.s_suppkey).join(
        F.broadcast(
            nation.where(
                F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
            )
        ),
        supp.s_nationkey == nation.n_nationkey,
    )
    return (
        named.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


@register(
    "q64_small_qty_revenue",
    oracle=f"""
    WITH avgq AS (
        SELECT l_partkey, AVG(l_quantity) AS a
        FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND({dsum_sql('l_extendedprice')} / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part ON l_partkey = p_partkey
    JOIN avgq ON avgq.l_partkey = l.l_partkey
    WHERE p_brand = 'Brand#13' AND l_quantity < 0.5 * a
    """,
    note="TPC-H Q17 shape: revenue lost to small-quantity orders for "
    "one brand. The correlated AVG-per-part subquery is decorrelated "
    "into a per-part aggregate joined back on l_partkey (one "
    "group-cardinality shuffle); the brand filter prunes the part side "
    "before the join so AQE can broadcast it",
    tags=("join", "subquery", "tpch", "agg"),
)
def q64_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    avgq = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("__a"))
    brand = part.where(F.col("p_brand") == "Brand#13").select("p_partkey")
    return (
        li.join(brand, li.l_partkey == brand.p_partkey)
        .join(avgq, "l_partkey")
        .where(F.col("l_quantity") < 0.5 * F.col("__a"))
        .agg(
            F.round(dsum("l_extendedprice") / 7.0, 4).alias("avg_yearly")
        )
    )


@register(
    "q65_dormant_rich_customers",
    oracle="""
    WITH cutoff AS (
        SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name, COUNT(*) AS numcust,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE), 4)
               AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT ab FROM cutoff)
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY n_name
    ORDER BY n_name
    """,
    note="TPC-H Q22 shape (nation stands in for the phone prefix; "
    "'dormant' = no order since 2000 stands in for 'never ordered', "
    "which is empty in this data): above-average-balance customers "
    "with no recent orders. Global-avg scalar subquery broadcast as a "
    "1-row aggregate; the NOT EXISTS is an anti join against the "
    "date-pruned orders scan",
    tags=("join", "subquery", "tpch", "agg"),
)
def q65_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")

    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__ab")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select(F.col("o_custkey"))
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(30,6)")).cast(
                    "double"
                ),
                4,
            ).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "q66_top_revenue_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1998-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    note="TPC-H Q15 shape: quarterly revenue view, suppliers at the "
    "global maximum via a 1-row broadcast scalar aggregate (ties "
    "preserved, per the spec) — no window over the whole view needed",
    tags=("join", "subquery", "tpch", "agg"),
)
def q66_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")

    lo = F.lit("1998-01-01").cast("timestamp")
    hi = F.lit("1998-04-01").cast("timestamp")
    revenue = (
        li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.expr(_REV)).alias("total_revenue"))
    )
    best = revenue.agg(F.max("total_revenue").alias("__best"))
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("__best"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q67_order_count_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    note="TPC-H Q13 shape: per-customer order counts (left outer join "
    "with the filter INSIDE the join condition, so zero-order "
    "customers survive) folded into a count-of-counts histogram — two "
    "hash aggregates, the second over at most max-orders-per-customer "
    "distinct groups",
    tags=("join", "agg", "tpch"),
)
def q67_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q68_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(l_shipdate) AS BIGINT) AS o_year,
           {dsum_sql(
               'l_extendedprice * (1 - l_discount)'
               ' - 0.1 * p_retailprice * l_quantity'
           )} AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
    note="TPC-H Q9 shape (no partsupp table in this schema, so "
    "0.1 * p_retailprice * l_quantity stands in for "
    "ps_supplycost * l_quantity): profit on name-matched parts per "
    "supplier nation per year. The part filter prunes before the fact "
    "join (AQE broadcasts the survivors); nation is a bounded "
    "broadcast; the profit sum is an exact split-long aggregate",
    tags=("join", "agg", "tpch"),
)
def q68_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    red = part.where(F.col("p_name").contains("red")).select(
        "p_partkey", "p_retailprice"
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(red, li.l_partkey == red.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q69_important_stock",
    oracle=f"""
    WITH supplied AS (
        SELECT l_partkey,
               {dsum_sql('l_extendedprice')} AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey, value
    FROM supplied
    WHERE value > (SELECT {dsum_sql('l_extendedprice')} * 0.001
                   FROM lineitem
                   JOIN supplier ON l_suppkey = s_suppkey
                   JOIN nation   ON s_nationkey = n_nationkey
                   WHERE n_name = 'NATION_3')
    ORDER BY value DESC, ps_partkey
    """,
    note="TPC-H Q11 shape (lineitem extended price per part stands in "
    "for partsupp supplycost * availqty): parts whose supplied value "
    "from one nation exceeds a fraction of that nation's total. The "
    "HAVING-over-scalar-subquery decorrelates into a 1-row broadcast "
    "aggregate computed FROM the per-part aggregate itself (one fact "
    "scan, reused; not two)",
    tags=("join", "agg", "subquery", "tpch"),
)
def q69_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    nat_supp = supp.join(
        F.broadcast(nation.where(F.col("n_name") == "NATION_3")),
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey")
    supplied = (
        li.join(nat_supp, li.l_suppkey == nat_supp.s_suppkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(dsum("l_extendedprice").alias("value"))
    )
    # Threshold from the per-part aggregate itself: the decimal-exact
    # per-part values re-sum exactly (each is an integer multiple of
    # 1e-6), matching the oracle's single global SUM.
    total = supplied.agg(
        (F.sum(F.col("value").cast("decimal(30,6)")).cast("double") * 0.001)
        .alias("__cut")
    )
    return (
        supplied.join(F.broadcast(total))
        .where(F.col("value") > F.col("__cut"))
        .select("ps_partkey", "value")
        .orderBy(F.desc("value"), "ps_partkey")
    )


@register(
    "q70_shipmode_priority",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                THEN 'SLOW' ELSE 'FAST' END AS ship_speed,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY ship_speed
    ORDER BY ship_speed
    """,
    note="TPC-H Q12 shape (no l_shipmode/receiptdate columns: the "
    "ship-delay bucket stands in for the shipmode class): lines per "
    "delay bucket split into high/low-priority conditional counts. "
    "The year filter reaches the lineitem scan; the CASE pivots are "
    "codegen'd conditional aggregates — one shuffle on a 2-row key",
    tags=("join", "agg", "tpch"),
)
def q70_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")

    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    speed = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        "SLOW",
    ).otherwise("FAST")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(speed.alias("ship_speed"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_speed")
    )


@register(
    "q71_promotion_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_3', 'NATION_8')
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'red%'
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(l_quantity) > 20
      )
    ORDER BY s_suppkey
    """,
    note="TPC-H Q20 shape (grouped lineitem quantity stands in for "
    "partsupp availqty): suppliers who moved > 20 units of any "
    "name-matched part in the year. The IN-over-grouped-HAVING "
    "subquery decorrelates into a semi join on the aggregated key; "
    "part and nation filters prune their scans before any fact work",
    tags=("join", "subquery", "agg", "tpch"),
)
def q71_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    red = part.where(F.col("p_name").startswith("red")).select("p_partkey")
    movers = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(red, li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .where(F.col("__qty") > 20)
        .select("l_suppkey")
    )
    return (
        supp.join(
            F.broadcast(
                nation.where(
                    F.col("n_name").isin(
                        "NATION_1", "NATION_3", "NATION_8"
                    )
                )
            ),
            supp.s_nationkey == nation.n_nationkey,
        )
        .join(movers, supp.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q80_observed_metrics",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(30,2)))
                AS DOUBLE) AS total_price,
           CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END)
                AS BIGINT) AS n_returned
    FROM lineitem WHERE l_quantity > 25
    """,
    note="the Observation API surface (df.observe): data-quality "
    "metrics accumulate ON THE SIDE of a real pass over the data — "
    "no second scan, no collect of the data itself; the query "
    "RETURNS the observed metrics, gating the accumulator path "
    "(exact decimal sum inside the observation, so the side-channel "
    "is engine-exact too). At scale this is how row-count/invariant "
    "checks ride along ETL writes for free",
    tags=("observe", "metrics", "quality"),
)
def q80_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity") > 25
    )
    obs = Observation("q80_stats")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round("l_extendedprice", 2).cast("decimal(30,2)"))
        .cast("double")
        .alias("total_price"),
        F.count(F.when(F.col("l_returnflag") == "R", 1))
        .cast("long")
        .alias("n_returned"),
    )
    # the observed pass must be a REAL action over the data
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["total_price"], m["n_returned"])],
        "n_rows long, total_price double, n_returned long",
    )


@register(
    "q81_grouping_id",
    oracle="""
    SELECT COALESCE(l_returnflag, '(all)') AS flag,
           COALESCE(l_linestatus, '(all)') AS status,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
    note="grouping_id over GROUPING SETS: the bitmask that "
    "disambiguates 'NULL because aggregated away' from 'NULL in the "
    "data' — subtotal and grand-total rows carry their grouping "
    "level explicitly, so downstream consumers never misread a "
    "rollup row. Identical COALESCE labeling on both engines",
    tags=("agg", "grouping-sets", "grouping-id"),
)
def q81_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("status"),
            "gid",
            "n",
        )
    )


@register(
    "q82_outer_explode",
    oracle="""
    WITH docs AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 0 THEN []
                    ELSE string_split_regex(trim(text), '\\s+')[1:3]
               END AS toks
        FROM documents
    )
    SELECT d.doc_id, u.tok, u.pos
    FROM docs d
    LEFT JOIN LATERAL (
        SELECT unnest(toks) AS tok,
               generate_subscripts(toks, 1) - 1 AS pos
    ) u ON TRUE
    """,
    note="null-preserving generator semantics (posexplode_outer vs "
    "plain explode): rows whose array is EMPTY survive with null "
    "token/position instead of vanishing — the outer-generator "
    "contract that keeps parent rows accountable through a fan-out "
    "(every 10th doc's list is emptied to exercise it). Oracle uses "
    "the LATERAL-left-join equivalent",
    tags=("lateral", "explode", "null-semantics"),
)
def q82_outer_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = F.when(
        F.col("doc_id") % 10 == 0, F.array().cast("array<string>")
    ).otherwise(F.slice(tokens(F.col("text")), 1, 3))
    return docs.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        F.posexplode_outer("toks").alias("pos", "tok"),
    ).select("doc_id", "tok", F.col("pos").cast("long").alias("pos"))


@register(
    "q83_ignore_nulls_locf",
    oracle="""
    WITH sparse AS (
        SELECT user_id, event_id,
               CASE WHEN event_id % 5 = 0 THEN event_type END AS reading
        FROM events
    ),
    filled AS (
        SELECT user_id, event_id, reading,
               last_value(reading IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS carried
        FROM sparse
    )
    SELECT user_id,
           COUNT(*) AS n,
           CAST(COUNT(reading) AS BIGINT) AS n_observed,
           CAST(COUNT(carried) AS BIGINT) AS n_filled
    FROM filled GROUP BY user_id
    """,
    note="IGNORE NULLS window semantics: last_value over a sparse "
    "sensor column carries the most recent observation forward "
    "(LOCF as a pure window expression — no self-join, no gap "
    "table); per-user observed-vs-filled accounting gated. The "
    "SQL-standard IGNORE NULLS surface q59's dense-grid gap-fill "
    "does not exercise",
    tags=("window", "ignore-nulls", "locf"),
)
def q83_ignore_nulls_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    sparse = events.select(
        "user_id",
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.col("event_type")).alias(
            "reading"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = sparse.withColumn(
        "carried", F.last("reading", ignorenulls=True).over(w)
    )
    return filled.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.count("reading").cast("long").alias("n_observed"),
        F.count("carried").cast("long").alias("n_filled"),
    )


@register(
    "q84_column_profile",
    oracle="""
    SELECT 'l_quantity' AS col,
           COUNT(*) AS n,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS ndv,
           ROUND(MIN(l_quantity), 4) AS min_v,
           ROUND(MAX(l_quantity), 4) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*),
           CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
           CAST(COUNT(DISTINCT l_discount) AS BIGINT),
           ROUND(MIN(l_discount), 4), ROUND(MAX(l_discount), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*),
           CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
           CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
           ROUND(MIN(l_extendedprice), 4), ROUND(MAX(l_extendedprice), 4)
    FROM lineitem
    """,
    note="data-profiling report (the ANALYZE/data-catalog shape): "
    "count / nulls / exact NDV / min / max per column in ONE pass "
    "over the fact table — all three columns' aggregates share the "
    "single scan (one wide aggregate, unpivoted to a row per "
    "column), where the naive per-column UNION the oracle spells "
    "out would scan three times",
    tags=("profiling", "stats", "quality"),
)
def q84_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_extendedprice"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).cast("long").alias(f"{c}__nulls"),
            F.countDistinct(c).cast("long").alias(f"{c}__ndv"),
            F.round(F.min(c), 4).alias(f"{c}__min"),
            F.round(F.max(c), 4).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    # unpivot the single wide row with one stack(): the aggregate
    # subtree (and its lineitem scan) appears ONCE in the plan — a
    # 3-branch unionByName would re-reference it three times and rely
    # on exchange reuse to dedupe the scans
    stack_args: list = [F.lit(len(cols))]
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"{c}__n"),
            F.col(f"{c}__nulls"),
            F.col(f"{c}__ndv"),
            F.col(f"{c}__min"),
            F.col(f"{c}__max"),
        ]
    return wide.select(
        F.stack(*stack_args).alias(
            "col", "n", "n_nulls", "ndv", "min_v", "max_v"
        )
    )


@register(
    "q85_pivot_matrix",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT)
               AS click,
           CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT)
               AS error,
           CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
               AS purchase,
           CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT)
               AS signup,
           CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT)
               AS view,
           CAST(COUNT(*) AS BIGINT) AS total
    FROM events GROUP BY 1
    """,
    note="PIVOT surface: per-day event-type activity matrix via "
    "groupBy().pivot() with an EXPLICIT value list — the explicit "
    "list matters at scale (without it Spark runs an eager distinct "
    "scan to discover columns before planning) and makes the output "
    "schema deterministic for the oracle, which spells the same "
    "matrix as conditional-count columns. One hash aggregate, "
    "map-side partials, no shuffle beyond the groupBy key",
    tags=("relational", "pivot", "matrix"),
)
def q85_pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    day = F.date_trunc("day", F.col("ts")).alias("day")
    pivoted = (
        events.select(day, "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
    )
    totals = (
        events.select(day)
        .groupBy("day")
        .agg(F.count("*").alias("total"))
    )
    out = pivoted.join(totals, "day")
    return out.select(
        "day", *[F.col(t).cast("long").alias(t) for t in types], "total"
    )


@register(
    "q86_sql_scalar_udf",
    oracle=f"""
    SELECT l_returnflag,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_quantity < 25
    GROUP BY l_returnflag
    """,
    note="SQL scalar UDF (Spark 4 CREATE FUNCTION ... RETURN): the "
    "reusable-expression surface that, unlike every Python UDF "
    "family, INLINES into the plan — the function body participates "
    "in whole-stage codegen, constant folding and predicate pushdown "
    "exactly as if written in place (verified: a literal call "
    "constant-folds at plan time). The oracle spells the inlined "
    "expression; matching hashes prove the function is pure "
    "substitution",
    tags=("relational", "udf", "sql-function"),
)
def q86_sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cdc_disc_price"
        "(p DOUBLE, d DOUBLE) RETURNS DOUBLE RETURN p * (1 - d)"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "__q86_lineitem"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(CAST(cdc_disc_price(l_extendedprice, l_discount)
                             AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM __q86_lineitem
        WHERE l_quantity < 25
        GROUP BY l_returnflag
        """
    )


@register(
    "q87_variant_shred",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN event_id % 3 <> 0 THEN 1 END)
                AS BIGINT) AS n_with_metric,
           CAST(SUM(CASE WHEN event_id % 3 <> 0
                         THEN CAST(floor(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS metric_sum
    FROM events GROUP BY event_type
    """,
    note="Spark 4 VARIANT (the open-lakehouse semi-structured type): "
    "heterogeneous JSON events — a third of them missing the metric "
    "field — parse_json into VARIANT once, then typed "
    "try_variant_get paths shred fields at read time (missing path "
    "-> NULL, no schema declared up front). VARIANT stores a parsed "
    "binary encoding, so repeated path extraction skips re-parsing "
    "the JSON text — the scale argument vs q23's string-functions "
    "path. Metrics emitted as integers, so the construct -> parse -> "
    "shred -> aggregate round-trip is exact and the oracle computes "
    "the same accounting straight from the base columns",
    tags=("relational", "variant", "semi-structured"),
)
def q87_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    with_metric = F.format_string(
        '{"u": %d, "t": "%s", "n": %d}',
        F.col("user_id"),
        F.col("event_type"),
        F.floor(F.col("value") * 100).cast("long"),
    )
    without = F.format_string(
        '{"u": %d, "t": "%s"}', F.col("user_id"), F.col("event_type")
    )
    doc = F.when(F.col("event_id") % 3 == 0, without).otherwise(
        with_metric
    )
    v = events.select(F.parse_json(doc).alias("v"))
    shredded = v.select(
        F.try_variant_get(F.col("v"), "$.t", "string").alias("event_type"),
        F.try_variant_get(F.col("v"), "$.n", "long").alias("metric"),
    )
    return shredded.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count("metric").cast("long").alias("n_with_metric"),
        F.coalesce(F.sum("metric"), F.lit(0))
        .cast("long")
        .alias("metric_sum"),
    )


_Q88_SQL = """
    WITH RECURSIVE nodes AS (
        SELECT c_custkey AS k,
               CAST(c_custkey / 3 AS BIGINT) AS parent
        FROM customer WHERE c_custkey < 200
    ),
    walk(node, depth) AS (
        SELECT k, 0 FROM nodes WHERE k = 1
        UNION ALL
        SELECT n.k, w.depth + 1
        FROM nodes n JOIN walk w ON n.parent = w.node
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS node_sum,
           CAST(MIN(node) AS BIGINT) AS min_node,
           CAST(MAX(node) AS BIGINT) AS max_node
    FROM walk GROUP BY depth
"""


@register(
    "q88_recursive_cte",
    oracle=_Q88_SQL.replace(
        "CAST(c_custkey / 3 AS BIGINT)", "c_custkey // 3"
    ),
    note="WITH RECURSIVE (Spark 4 recursive CTE): transitive descent "
    "of a deterministic hierarchy (node k's parent is k/3) from the "
    "root, per-depth accounting — the org-chart/BOM traversal shape "
    "that previously required a driver-side iteration loop "
    "(tx20-style) and is now a single declarative statement; the "
    "engine iterates to fixpoint internally, each round one join of "
    "the frontier against the (tiny, broadcastable) edge table. "
    "Integer-exact; DuckDB runs the same recursive SQL",
    tags=("relational", "recursive", "hierarchy"),
)
def q88_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer"
    )
    return spark.sql(_Q88_SQL)


@register(
    "q89_unpivot_api",
    oracle="""
    SELECT l_returnflag, metric, CAST(total AS BIGINT) AS total
    FROM (
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
               CAST(SUM(CAST(floor(l_extendedprice) AS BIGINT))
                    AS BIGINT) AS price_floor,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_returnflag
    ) UNPIVOT (total FOR metric IN (qty, price_floor, n))
    """,
    note="DataFrame.unpivot (the dedicated melt API, a distinct "
    "logical Unpivot node — not the stack() expression q37/q84 use): "
    "wide per-flag aggregates melt to (flag, metric, total) rows. "
    "ids/values/names declared structurally, so Catalyst sees the "
    "unpivot as an operator it can push through rather than an "
    "opaque generator expression. Integer-exact",
    tags=("relational", "unpivot", "melt"),
)
def q89_unpivot_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        F.sum(F.floor("l_extendedprice").cast("long")).alias(
            "price_floor"
        ),
        F.count("*").alias("n"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price_floor", "n"],
        variableColumnName="metric",
        valueColumnName="total",
    ).select("l_returnflag", "metric", F.col("total").cast("long"))


@register(
    "q90_null_safe_join",
    oracle="""
    WITH a AS (
        SELECT event_id,
               CASE WHEN event_id % 7 = 0 THEN NULL
                    ELSE user_id % 50 END AS k,
               value
        FROM events WHERE event_id % 2 = 0
    ),
    b AS (
        SELECT CASE WHEN user_id % 11 = 0 THEN NULL
                    ELSE user_id % 50 END AS k,
               CAST(COUNT(*) AS BIGINT) AS grp_n
        FROM events WHERE event_id % 2 = 1
        GROUP BY 1
    )
    SELECT a.k AS k,
           CAST(COUNT(*) AS BIGINT) AS n_matched,
           CAST(SUM(grp_n) AS BIGINT) AS weight
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k
    """,
    note="null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "MATCH each other instead of silently dropping — the semantic "
    "CDC pipelines need when a nullable column participates in a "
    "merge identity. Still planned as a hash join (the null-safe "
    "comparator is a join key, not a filter), so no fallback to "
    "nested-loop; NULL-group accounting gated against the oracle's "
    "IS NOT DISTINCT FROM twin",
    tags=("relational", "join", "null-safe"),
)
def q90_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a = events.where(F.col("event_id") % 2 == 0).select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("user_id") % 50)
        .alias("k"),
        "value",
    )
    b = (
        events.where(F.col("event_id") % 2 == 1)
        .select(
            F.when(F.col("user_id") % 11 == 0, F.lit(None))
            .otherwise(F.col("user_id") % 50)
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("grp_n"))
    )
    joined = a.join(b, a["k"].eqNullSafe(b["k"]))
    return joined.groupBy(a["k"].alias("k")).agg(
        F.count("*").cast("long").alias("n_matched"),
        F.sum("grp_n").cast("long").alias("weight"),
    )


@register(
    "q91_year_over_year",
    oracle=f"""
    WITH monthly AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               {dsum_sql('o_totalprice')} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1, 2
    )
    SELECT cur.yr, cur.mo,
           cur.revenue, cur.n_orders,
           prev.revenue AS prev_revenue,
           ROUND(cur.revenue / prev.revenue - 1, 6) AS yoy_growth
    FROM monthly cur
    JOIN monthly prev ON prev.yr = cur.yr - 1 AND prev.mo = cur.mo
    """,
    note="year-over-year comparison (the TPC-DS-style periodic "
    "self-join the TPC-H closure lacks): monthly revenue joined to "
    "the SAME month one year earlier, growth ratio per month. One "
    "aggregate feeding both join sides — the monthly rollup is tiny "
    "(months x years), so the self-join is a broadcast of an "
    "aggregate, never a second fact scan (exchange reuse dedupes the "
    "subtree); decimal-summed revenue keeps the ratio engine-exact "
    "at 6 digits",
    tags=("relational", "temporal", "self-join", "yoy"),
)
def q91_year_over_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(
        dsum(F.col("o_totalprice")).alias("revenue"),
        F.count("*").cast("long").alias("n_orders"),
    )
    prev = monthly.select(
        (F.col("yr") + 1).alias("p_yr"),
        F.col("mo").alias("p_mo"),
        F.col("revenue").alias("prev_revenue"),
    )
    cur = monthly
    return (
        cur.join(
            prev,
            (cur.yr == prev.p_yr) & (cur.mo == prev.p_mo),
        )
        .select(
            "yr",
            "mo",
            "revenue",
            "n_orders",
            "prev_revenue",
            F.round(
                F.col("revenue") / F.col("prev_revenue") - 1, 6
            ).alias("yoy_growth"),
        )
    )


@register(
    "q92_multiset_set_ops",
    oracle="""
    WITH a AS (
        SELECT user_id % 40 AS k FROM events WHERE event_id % 3 = 0
    ),
    b AS (
        SELECT user_id % 40 AS k FROM events WHERE event_id % 3 = 1
    ),
    i AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
    e AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    SELECT 'intersect_all' AS op, k, CAST(COUNT(*) AS BIGINT) AS n
    FROM i GROUP BY k
    UNION ALL
    SELECT 'except_all', k, CAST(COUNT(*) AS BIGINT) FROM e GROUP BY k
    """,
    note="multiset set operations (INTERSECT ALL / EXCEPT ALL — "
    "intersectAll/exceptAll on the DataFrame API): per-key "
    "MULTIPLICITIES min(a,b) and max(a-b,0), not the distinct "
    "semantics q18/q19 gate. Planned as one hash aggregate per side "
    "plus a join on the counts — no row-by-row bag subtraction; the "
    "duplicate-count accounting is exactly what log-replay "
    "reconciliation (did every change arrive the right NUMBER of "
    "times?) needs, where plain EXCEPT would mask duplicate "
    "deliveries",
    tags=("relational", "set-ops", "multiset"),
)
def q92_multiset_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a = events.where(F.col("event_id") % 3 == 0).select(
        (F.col("user_id") % 40).alias("k")
    )
    b = events.where(F.col("event_id") % 3 == 1).select(
        (F.col("user_id") % 40).alias("k")
    )
    i = (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    e = (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    return i.unionByName(e)


@register(
    "q93_trailing_window_features",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id,
               -- floor() matches Spark's unix_timestamp truncation:
               -- epoch(ts) is FRACTIONAL (events carry microseconds),
               -- and a RANGE frame bound decided on fractional vs
               -- truncated seconds flips membership at the 3600 s edge
               CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    feats AS (
        SELECT user_id, event_id,
               COUNT(*) OVER w AS n_1h,
               SUM(cents) OVER w AS cents_1h
        FROM e
        WINDOW w AS (
            PARTITION BY user_id ORDER BY sec
            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
        )
    )
    SELECT user_id,
           CAST(MAX(n_1h) AS BIGINT) AS max_events_1h,
           CAST(MAX(cents_1h) AS BIGINT) AS max_cents_1h,
           CAST(SUM(n_1h) AS BIGINT) AS feature_mass
    FROM feats GROUP BY user_id
    """,
    note="trailing event-time feature windows — the per-EVENT sliding "
    "aggregate ML feature pipelines need ('activity in the hour "
    "before this event'), which bucketed windows (q28/q29) cannot "
    "express because every event anchors its own frame: a RANGE "
    "frame over epoch seconds, partitioned per user so frames never "
    "cross entities (no global sort). Value cents are exact "
    "integers; per-user maxima and total feature mass gated",
    tags=("relational", "window", "features", "event-time"),
)
def q93_trailing_window_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, 0)
    )
    feats = e.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum("cents").over(w).alias("cents_1h"),
    )
    return feats.groupBy("user_id").agg(
        F.max("n_1h").cast("long").alias("max_events_1h"),
        F.max("cents_1h").cast("long").alias("max_cents_1h"),
        F.sum("n_1h").cast("long").alias("feature_mass"),
    )


@register(
    "q94_group_order_by_all",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum_sql('o_totalprice')} AS revenue
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
    note="GROUP BY ALL / ORDER BY ALL (the Spark-4 and DuckDB "
    "shorthand surface): grouping keys inferred from the "
    "non-aggregate select list, ordering over the full output. Same "
    "physical plan as the explicit form — one hash aggregate with "
    "map-side partials; the point is SQL-surface parity so a user's "
    "shorthand query text runs unchanged on both engines",
    tags=("relational", "sql-surface", "aggregation"),
)
def q94_group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {dsum_sql('o_totalprice')} AS revenue
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "q95_lateral_join_api",
    oracle="""
    SELECT n_name, c_custkey, c_acctbal
    FROM nation n, LATERAL (
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
    ) t
    """,
    note="DataFrame lateralJoin API (Spark 4): per-nation top-2 "
    "customers by balance, the correlated-subquery-per-row shape "
    "expressed on the DataFrame API via Column.outer() correlation "
    "(q57 gates the same semantics as SQL LATERAL text). Catalyst "
    "de-correlates it to a window rank over ONE customer scan "
    "partitioned by nation — never a per-outer-row re-scan; the "
    "25-row nation side joins broadcast",
    tags=("relational", "lateral", "api-surface"),
)
def q95_lateral_join_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    top2 = (
        customer.where(
            F.col("c_nationkey") == F.col("n_nationkey").outer()
        )
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(2)
        .select("c_custkey", "c_acctbal")
    )
    return nation.lateralJoin(top2).select(
        "n_name", "c_custkey", "c_acctbal"
    )


@register(
    "q96_equiwidth_histogram",
    oracle=f"""
    WITH h AS (
        SELECT LEAST(CAST(FLOOR(o_totalprice / 30000) AS BIGINT), 19)
                   AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {dsum_sql('o_totalprice')} AS revenue
        FROM orders GROUP BY 1
    )
    SELECT bucket, n_orders, revenue,
           CAST(SUM(n_orders) OVER (
               ORDER BY bucket ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_orders,
           ROUND(n_orders * 1.0 / SUM(n_orders) OVER (), 6) AS share
    FROM h
    """,
    note="equi-width histogram + cumulative distribution (the value "
    "profiler behind range-partition boundary picking and skew "
    "detection): 20 fixed 30k-wide price bins with count, decimal "
    "revenue, running total and share. One hash aggregate over the "
    "fact; the windows run over the 20-row bucket AGGREGATE "
    "(guardrail-bounded), never the data. Fixed literal bin edges "
    "keep the bucketing engine-portable where width_bucket() is not",
    tags=("relational", "profiling", "histogram"),
)
def q96_equiwidth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    h = orders.groupBy(
        F.least(
            F.floor(F.col("o_totalprice") / 30000).cast("long"),
            F.lit(19).cast("long"),
        ).alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("revenue"),
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    return h.select(
        "bucket",
        "n_orders",
        "revenue",
        F.sum("n_orders").over(w_cum).cast("long").alias("cum_orders"),
        F.round(
            F.col("n_orders") / F.sum("n_orders").over(w_all), 6
        ).alias("share"),
    )


@register(
    "q97_skyline_frontier",
    oracle="""
    WITH ordered AS (
        SELECT o_orderkey, o_totalprice, o_orderdate,
               MIN(o_orderdate) OVER (
                   ORDER BY o_totalprice, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS best_prev
        FROM orders
    )
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM ordered
    WHERE best_prev IS NULL OR o_orderdate < best_prev
    """,
    note="skyline / Pareto frontier (cheapest-and-earliest orders: no "
    "other order is both cheaper and at-least-as-early) via the "
    "sort-based dominance test — a row survives iff its date beats "
    "the EXCLUSIVE running minimum over all cheaper rows. The "
    "running min rides the new distributed prefix-MIN (two-pass "
    "range decomposition, operators/ordering.py) — the other classic "
    "associative scan beside prefix sum, so the frontier never "
    "funnels through a single reducer while the oracle keeps its "
    "plain MIN OVER window. Dominance pruning like this is the "
    "standard first pass of multi-criteria candidate selection",
    tags=("relational", "skyline", "ordering"),
)
def q97_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.ordering import distributed_prefix_min

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    scanned = distributed_prefix_min(
        orders,
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        "o_orderdate",
        out_col="best_prev",
        inclusive=False,
    )
    return scanned.where(
        F.col("best_prev").isNull()
        | (F.col("o_orderdate") < F.col("best_prev"))
    ).select("o_orderkey", "o_totalprice", "o_orderdate")


@register(
    "q98_quantile_binning",
    oracle="""
    WITH ranked AS (
        SELECT o_totalprice,
               ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
                   AS rn,
               COUNT(*) OVER () AS n
        FROM orders
    )
    SELECT CAST(((rn - 1) * 4) // n AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
               AS total
    FROM ranked GROUP BY bucket
    """,
    note="equi-height quantile binning (the standard ML feature "
    "bucketizer: equal-POPULATION bins, robust to skew where q96's "
    "equi-WIDTH bins collapse under heavy tails): bucket = "
    "floor((rank-1)*k/n) over the exact value order. The rank rides "
    "``distributed_row_number`` (one range shuffle + broadcast "
    "offsets — no global window) and n rides along as a broadcast "
    "scalar, so the whole binning is two scans and zero "
    "single-reducer stages; the oracle keeps the plain ROW_NUMBER. "
    "Exactness matters for reproducible feature pipelines — "
    "approxQuantile bins drift run to run, these never do",
    tags=("relational", "quantile", "binning", "ml-features"),
)
def q98_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.ordering import distributed_row_number

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    ranked = distributed_row_number(
        orders,
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        out_col="rn",
    )
    n_row = F.broadcast(ranked.agg(F.count(F.lit(1)).alias("n")))
    binned = ranked.crossJoin(n_row).withColumn(
        "bucket",
        F.expr("CAST(((rn - 1) * 4) DIV n AS INT)"),
    )
    return binned.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
        .cast("double")
        .alias("total"),
    )


@register(
    "q102_data_quality_audit",
    oracle="""
    WITH o AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS null_cust,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                   AS dup_key,
               CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                             THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
               CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS bad_price
        FROM orders
    ),
    li AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) - COUNT(DISTINCT l_orderkey) AS BIGINT)
                   AS nonuniq
        FROM lineitem
    ),
    ref AS (
        -- NULL-explicit: a NULL o_custkey is the COMPLETENESS check's
        -- finding, not a referential violation (and NOT IN vs anti-join
        -- would otherwise diverge on NULL keys)
        SELECT CAST(COUNT(*) AS BIGINT) AS viol,
               (SELECT n FROM o) AS checked
        FROM orders
        WHERE o_custkey IS NOT NULL
          AND o_custkey NOT IN (SELECT c_custkey FROM customer)
    )
    SELECT * FROM (
        SELECT 'orders.o_custkey_complete' AS check_name,
               null_cust AS violations, n AS checked FROM o
        UNION ALL
        SELECT 'orders.o_orderkey_unique', dup_key, n FROM o
        UNION ALL
        SELECT 'orders.o_orderstatus_domain', bad_status, n FROM o
        UNION ALL
        SELECT 'orders.o_totalprice_positive', bad_price, n FROM o
        UNION ALL
        SELECT 'orders.o_custkey_in_customer', viol, checked FROM ref
        UNION ALL
        SELECT 'lineitem.l_orderkey_unique_probe', nonuniq, n FROM li
    )
    """,
    note="Deequ-shape declarative data-quality audit — the pre-ingest "
    "gate every 100 TB pipeline runs: completeness, uniqueness, "
    "value-domain, range, and referential-integrity constraints. "
    "All per-table constraints fold into ONE wide aggregate per "
    "table (single scan, map-side partial; the oracle spells out "
    "the naive per-check UNION), unpivoted to a row per check via "
    "stack(); referential integrity is a broadcast-able anti-join "
    "count. The lineitem uniqueness probe fails BY DESIGN "
    "(l_orderkey repeats per line) — the audit reports violation "
    "counts, it does not rubber-stamp",
    tags=("quality", "agg", "audit"),
)
def q102_data_quality_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")

    o = orders.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
        ).alias("null_cust"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_key"),
        F.sum(
            F.when(
                ~F.col("o_orderstatus").isin("O", "F", "P"), 1
            ).otherwise(0)
        ).alias("bad_status"),
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).alias("bad_price"),
    )
    o_checks = o.select(
        F.stack(
            F.lit(4),
            F.lit("orders.o_custkey_complete"), F.col("null_cust"),
            F.lit("orders.o_orderkey_unique"), F.col("dup_key"),
            F.lit("orders.o_orderstatus_domain"), F.col("bad_status"),
            F.lit("orders.o_totalprice_positive"), F.col("bad_price"),
        ).alias("check_name", "violations"),
        F.col("n").alias("checked"),
    )
    # NULL keys belong to the completeness check above; excluding them
    # here keeps the anti-join and the oracle's NOT IN in agreement
    # (they diverge on NULLs otherwise — round-7 ADVICE)
    ref = (
        orders.where(F.col("o_custkey").isNotNull())
        .join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count("*").alias("violations"))
        .crossJoin(F.broadcast(o.select(F.col("n").alias("checked"))))
        .select(
            F.lit("orders.o_custkey_in_customer").alias("check_name"),
            F.col("violations").cast("long"),
            "checked",
        )
    )
    li_checks = li.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("l_orderkey")).alias("nonuniq"),
    ).select(
        F.lit("lineitem.l_orderkey_unique_probe").alias("check_name"),
        F.col("nonuniq").alias("violations"),
        F.col("n").alias("checked"),
    )
    return o_checks.unionByName(ref).unionByName(li_checks)


@register(
    "q113_salted_skew_join",
    oracle=f"""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('e.value')} AS total
    FROM events e
    JOIN nation n
      ON n.n_nationkey = CASE WHEN e.user_id % 3 = 0
                              THEN 0 ELSE e.user_id % 25 END
    GROUP BY n.n_name
    """,
    note="replicate-and-salt skew JOIN (operators/skew.py::salted_join"
    " - salted_agg's q52 twin for the join side): the fact side's "
    "synthetic hot key (~33% of events on nationkey 0) gets a "
    "content-derived salt in [0,16) and the dim side is replicated "
    "16x, so the join keys become (key, salt) and the hot key's rows "
    "spread across 16 tasks instead of pinning one. AQE's skew-split "
    "covers this in BATCH sort-merge plans; the explicit salt is the "
    "regime AQE cannot reach - stream-static joins (AQE is disabled "
    "in stateful workloads) and plans that must be deterministic at "
    "compile time. Broadcast is suppressed while COMPILING this "
    "entry's plan (then restored) because a 25-row dim would "
    "broadcast at test scale and erase the demonstration; the "
    "compiled plan is asserted to shuffle-join on the salted keys. "
    "Exact for inner/left/semi/anti (each fact row carries ONE salt, "
    "the dim covers all) - oracle is the plain join",
    tags=("join", "skew"),
)
def q113_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, "-1")
        joined = salted_join(events, nation, "n_nationkey", salt=16)
        out = joined.groupBy("n_name").agg(
            F.count("*").cast("long").alias("n"),
            dsum("value").alias("total"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        if "__salt" not in plan:
            raise AssertionError("salted join keys missing from plan")
        if "BroadcastHashJoin" in plan:
            raise AssertionError(
                "dim broadcast despite suppression - the salted "
                "shuffle-join demonstration did not compile"
            )
        return out
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
