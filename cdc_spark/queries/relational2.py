"""Coverage widening: array/map functions, unpivot, window frames and
rank functions, correlated scalar subqueries, and the remaining deck
patterns (strangler merge, snapshot+backfill, Debezium round-trip)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.cdc.envelope import parse_debezium
from cdc_spark.cdc.merge import apply_changes, latest_by_key
from cdc_spark.operators.ordering import grouped_row_number
from cdc_spark.queries.base import dsum, dsum_sql, register


@register(
    "q35_array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           array_to_string(list_sort(list_distinct(
               string_split(text, ' ')))[1:3], ',') AS first3_sorted,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(string_split(text, ' ')[1:2], ' ') AS head2
    FROM documents WHERE doc_id < 100
    """,
    note="array function surface: split/sort/distinct/slice/contains/join",
    tags=("scalar", "array"),
)
def q35_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    tok = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(tok).cast("long").alias("n_tokens"),
        F.concat_ws(
            ",", F.slice(F.sort_array(F.array_distinct(tok)), 1, 3)
        ).alias("first3_sorted"),
        F.array_contains(tok, "spark").alias("has_spark"),
        F.concat_ws(" ", F.slice(tok, 1, 2)).alias("head2"),
    )


@register(
    "q36_map_funcs",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(regexp_extract(props, '"k": *([0-9]+)', 1)
                         AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(CASE WHEN regexp_extract(props, '"k": *([0-9]+)', 1) <> ''
                      THEN 1 END) AS n_with_k
    FROM events GROUP BY event_type
    """,
    note="map type surface: props JSON → map<string,string>, "
    "element_at/map_keys driven aggregation",
    tags=("scalar", "map"),
)
def q36_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,string>")
    k = F.try_element_at(m, F.lit("k")).cast("long")
    return events.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"),
        F.count(k).alias("n_with_k"),
    )


@register(
    "q37_unpivot",
    oracle=f"""
    SELECT measure, {dsum_sql('value')} AS total FROM (
        SELECT 'quantity' AS measure, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT 'price', l_extendedprice FROM lineitem
        UNION ALL
        SELECT 'discount', l_discount FROM lineitem
    ) GROUP BY measure
    """,
    note="unpivot via stack(): wide measures → long (measure, value)",
    tags=("pivot", "unpivot"),
)
def q37_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.selectExpr(
        "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
        "'discount', l_discount) AS (measure, value)"
    )
    return long.groupBy("measure").agg(dsum("value").alias("total"))


@register(
    "q38_window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_30d
    FROM orders
    """,
    note="RANGE frame: per-customer trailing-30-day spend (peer rows "
    "included deterministically)",
    tags=("window", "frame"),
)
def q38_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


@register(
    "q39_rank_functions",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(DENSE_RANK() OVER w AS INT) AS drank,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS prank,
           ROUND(CUME_DIST() OVER w, 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
    note="rank-function surface: dense_rank/ntile/percent_rank/cume_dist "
    "— derived arithmetically from a distributed grouped row number + "
    "broadcast per-group totals (o_orderstatus has 3 values, so a "
    "plain partitioned window would pin ~1/3 of the table on one "
    "reducer at scale)",
    tags=("window", "rank"),
)
def q39_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The window ORDER BY carries the unique o_orderkey tiebreak, so
    # every row is its own peer group: dense_rank == rank == the
    # grouped row number, and the remaining three functions are pure
    # arithmetic in (rn, n). All divisions run in double on integer
    # operands far below 2^53, so results are IEEE-exact and match
    # the oracle's window functions bit-for-bit.
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    ranked = grouped_row_number(
        orders,
        "o_orderstatus",
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        out_col="__rn",
    )
    totals = orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("__n")
    )
    rn, n = F.col("__rn"), F.col("__n")
    # NTILE(4): q = n div 4 rows per tile, the first r = n mod 4
    # tiles get one extra row (SQL spec); ceil(a/b) on positive longs
    # via double division (exact: see docstring note).
    q, r = F.floor(n / 4), n % 4
    big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    tile = F.when(rn <= big, F.ceil(rn / (q + 1))).otherwise(
        r + F.ceil((rn - big) / F.greatest(q, F.lit(1)))
    )
    prank = F.when(n == 1, F.lit(0.0)).otherwise(
        F.round((rn - 1) / (n - 1), 6)
    )
    return (
        ranked.join(F.broadcast(totals), "o_orderstatus")
        .select(
            "o_orderkey",
            "o_orderstatus",
            rn.cast("int").alias("drank"),
            tile.cast("int").alias("quartile"),
            prank.alias("prank"),
            F.round(rn / n, 6).alias("cdist"),
        )
    )


@register(
    "q40_first_last_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER w AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    note="first/last/nth_value with full-partition frame",
    tags=("window",),
)
def q40_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@register(
    "q41_correlated_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice = (
        SELECT MAX(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
    note="correlated scalar subquery (each customer's priciest order) — "
    "Catalyst decorrelates to an aggregate+join",
    tags=("subquery",),
)
def q41_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice = (
            SELECT MAX(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "q42_strangler_merge",
    oracle="""
    WITH legacy AS (
        SELECT user_id, event_id AS lsn, value, 'legacy' AS src
        FROM events
    ),
    modern AS (
        SELECT user_id, event_id + 1000000 AS lsn,
               ROUND(value * 2, 4) AS value, 'modern' AS src
        FROM events WHERE user_id % 2 = 0
    ),
    unioned AS (
        SELECT * FROM legacy UNION ALL SELECT * FROM modern
    )
    SELECT user_id,
           arg_max(src, lsn) AS src,
           ROUND(arg_max(value, lsn), 4) AS value
    FROM unioned GROUP BY user_id
    """,
    note="strangler pattern (deck slides 41-43): legacy + modern systems "
    "writing the same entities, latest-wins by (key, lsn)",
    tags=("cdc", "strangler"),
)
def q42_strangler_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    legacy = events.select(
        "user_id",
        F.col("event_id").alias("lsn"),
        "value",
        F.lit("legacy").alias("src"),
    )
    modern = events.where(F.col("user_id") % 2 == 0).select(
        "user_id",
        (F.col("event_id") + 1000000).alias("lsn"),
        F.round(F.col("value") * 2, 4).alias("value"),
        F.lit("modern").alias("src"),
    )
    merged = latest_by_key(legacy.unionByName(modern), ["user_id"], "lsn")
    return merged.select(
        "user_id", "src", F.round("value", 4).alias("value")
    )


@register(
    "q43_snapshot_backfill",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0
                THEN ROUND(c_acctbal + 500.0, 2) ELSE c_acctbal
           END AS c_acctbal
    FROM customer
    """,
    note="snapshot + tail union (deck slides 21/30, DBLog-style): "
    "op='r' backfill rows + later op='u' tail through one apply path",
    tags=("cdc", "backfill"),
)
def q43_snapshot_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    snapshot = cust.select(
        F.lit("r").alias("op"),
        F.col("c_custkey").cast("long").alias("lsn"),  # snapshot order
        "c_custkey",
        "c_acctbal",
    )
    tail = cust.where(F.col("c_custkey") % 10 == 0).select(
        F.lit("u").alias("op"),
        (F.col("c_custkey") + 10_000_000).cast("long").alias("lsn"),
        "c_custkey",
        F.round(F.col("c_acctbal") + 500.0, 2).alias("c_acctbal"),
    )
    changes = snapshot.unionByName(tail)
    return apply_changes(None, changes, ["c_custkey"], ["c_acctbal"])


@register(
    "q44_debezium_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n, COUNT(DISTINCT c_custkey) AS n_keys,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    """,
    note="Debezium envelope round-trip: rows → to_json(envelope) → "
    "parse_debezium → typed decode — parse(serialize(x)) == x",
    tags=("cdc", "debezium"),
)
def q44_debezium_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    envelope = F.to_json(
        F.struct(
            F.lit("c").alias("op"),
            F.lit(None).cast("map<string,string>").alias("before"),
            F.map_from_arrays(
                F.array(F.lit("c_custkey"), F.lit("c_acctbal")),
                F.array(
                    F.col("c_custkey").cast("string"),
                    F.col("c_acctbal").cast("string"),
                ),
            ).alias("after"),
            F.lit(0).cast("long").alias("ts_ms"),
            F.struct(
                F.lit("public").alias("schema"),
                F.lit("customer").alias("table"),
                F.col("c_custkey").cast("long").alias("lsn"),
                F.lit(1).cast("long").alias("txId"),
            ).alias("source"),
        )
    )
    raw = cust.select(envelope.alias("value"))
    parsed = parse_debezium(raw, key_names=["c_custkey"])
    typed = parsed.select(
        F.try_element_at("after", F.lit("c_custkey")).cast("long").alias(
            "c_custkey"
        ),
        F.try_element_at("after", F.lit("c_acctbal"))
        .cast("double")
        .alias("c_acctbal"),
    )
    return typed.agg(
        F.count("*").alias("n"),
        F.countDistinct("c_custkey").alias("n_keys"),
        dsum("c_acctbal", 2).alias("total_bal"),
    )
