"""Deterministic mergeable sketches: KMV distinct-count, count-min.

The approximate-aggregation family a 100 TB pipeline actually ships —
fixed-size summaries built in ONE map-side-combinable pass, mergeable
across shards/days without re-touching raw data. Unlike HLL/KLL
(engine-private register layouts — the reason ``q31_approx_stats`` is
rows-only), these are built on the repo's portable md5-derived 60-bit
hash (``operators/dedup.py::portable_hash60``), so an external engine
recomputes every estimate EXACTLY: the whole family is value-hash-gated
against DuckDB, not recall-tested.

Reference disposition: the reference engine (main.go) has no
approximate-aggregation surface; SURVEY §2.3 lists the approx row as
engine capability. KMV is Beyer et al., "On Synopses for Distinct-Value
Estimation Under Multiset Operations" (SIGMOD'07); count-min is Cormode
& Muthukrishnan (J. Algorithms '05). Both public literature,
re-derived here Spark-first.

Scale shapes
------------
- ``kmv_sketch``: ``distinct()`` is one shuffle keyed on
  ``(group, hash)``; the ``row_number() <= k`` filter compiles to
  ``WindowGroupLimitExec`` in **Partial** mode ahead of the window's
  exchange (Spark ≥ 3.5), so every upstream task forwards at most k
  rows per group — the per-group reducer sees O(k × tasks), never the
  group's distinct set. Sketch size is fixed at k rows per group
  regardless of input size.
- ``countmin_counters``: a single hash-aggregate onto a FIXED d×w cell
  grid (map-side combine collapses each task to ≤ d·w rows before the
  shuffle) — the counter table's size is independent of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdc_spark.operators.dedup import portable_hash60

#: hash domain size: portable_hash60 is uniform on [0, 2**60).
HASH_DOMAIN = float(1 << 60)

# DuckDB twin of portable_hash60 over an arbitrary SQL expression —
# identical 60-bit value to the Spark side (proven by dd03's gate).
_H60_SQL = "CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def h60_sql(expr: str) -> str:
    """Oracle-side portable 60-bit hash of a VARCHAR SQL expression."""
    return _H60_SQL.format(expr=expr)


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, k: int
) -> DataFrame:
    """k minimum DISTINCT hash values of ``value_col`` per group.

    Returns one row per retained hash: ``group_cols + [_h]`` (at most k
    rows per group; fewer iff the group has < k distinct values). The
    KMV estimator and its merge both consume ONLY this frame.
    """
    hashed = df.select(
        *group_cols,
        portable_hash60(F.col(value_col).cast("string")).alias("_h"),
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(kth_hash: Column, n_hashes: Column, k: int) -> Column:
    """Distinct-value estimate from a KMV sketch aggregate.

    Exact when the group held fewer than k distinct values (the sketch
    IS the value set); otherwise the Beyer et al. unbiased estimator
    (k-1) / U(k) with U(k) the kth smallest hash normalized to [0,1).
    Pure double arithmetic on int64 inputs — bit-identical across
    engines, rounded to 4 decimals for the value-hash gate.
    """
    est = F.lit(float(k - 1)) * F.lit(HASH_DOMAIN) / kth_hash.cast(
        "double"
    )
    return F.round(
        F.when(n_hashes < k, n_hashes.cast("double")).otherwise(est), 4
    )


def kmv_estimate_sql(kth_hash: str, n_hashes: str, k: int) -> str:
    """Oracle twin of :func:`kmv_estimate`."""
    return (
        f"ROUND(CASE WHEN {n_hashes} < {k} "
        f"THEN CAST({n_hashes} AS DOUBLE) "
        f"ELSE {float(k - 1)!r} * {HASH_DOMAIN!r} "
        f"/ CAST({kth_hash} AS DOUBLE) END, 4)"
    )


def bottomk_sample(
    df: DataFrame, key_col: str, k: int, *, group_col: str | None = None
) -> DataFrame:
    """Bottom-k consistent sample: the k rows with the smallest
    portable hash of ``key_col`` (ties broken by the key itself).

    With ``group_col`` this is the PER-SHARD sketch — bottom-k within
    each group, computed map-side (the rank ≤ k filter compiles to
    ``WindowGroupLimitExec`` Partial) — whose union re-limited to k is
    EXACTLY the global bottom-k (Cohen & Kaplan, "Summarizing data
    using bottom-k sketches", PODC'07: the bottom-k of a union is the
    bottom-k of the per-shard bottom-ks). Without it, the global
    sample itself: ``TakeOrderedAndProject``, per-partition partial
    top-k, no corpus shuffle.
    """
    hashed = df.withColumn(
        "_h", portable_hash60(F.col(key_col).cast("string"))
    )
    if group_col is None:
        return hashed.orderBy("_h", key_col).limit(k)
    w = Window.partitionBy(group_col).orderBy("_h", key_col)
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def sample_quantiles(
    sample: DataFrame,
    value_col: str,
    key_col: str,
    quantiles: tuple[tuple[str, int, int], ...],
) -> DataFrame:
    """Rank-interpolated quantile estimates from a BOUNDED sample.

    One ungrouped aggregate packs the sample's values into a sorted
    array (bounded by the sample's LIMIT, so no data-sized state);
    each quantile ``(label, num, den)`` then reads element
    ``ceil(num·n/den)`` — the classic rank-based estimator over a
    uniform bottom-k sample. The ceiling runs as
    ``floor((num·n + den − 1) / den)`` on small-integer doubles
    (IEEE-exact), and the estimate is an ACTUAL sampled value, so the
    whole output is exact-integer reproducible by any engine.

    Returns one row per quantile: ``(quantile, sample_rank, est)``.
    """
    packed = sample.agg(
        F.sort_array(
            F.collect_list(F.struct(value_col, key_col))
        ).alias("_arr"),
        F.count("*").alias("_n"),
    )
    spec = sample.sparkSession.createDataFrame(
        list(quantiles), "quantile string, num long, den long"
    )
    # an empty sample would compute rank 0 and element_at(_arr, 0)
    # throws at runtime — gate on _n so empty input yields NULL
    # estimates (element_at with a NULL index is NULL, never an error)
    rank = F.when(
        F.col("_n") > 0,
        F.floor(
            (F.col("num") * F.col("_n") + F.col("den") - 1) / F.col("den")
        ).cast("long"),
    )
    return (
        spec.crossJoin(F.broadcast(packed))
        .withColumn("sample_rank", rank)
        .select(
            "quantile",
            "sample_rank",
            F.element_at(
                F.col("_arr"), F.col("sample_rank").cast("int")
            )[value_col]
            .cast("long")
            .alias("est"),
        )
    )


def countmin_counters(
    df: DataFrame, value_col: str, depth: int, width: int
) -> DataFrame:
    """Count-min counter table: ``(j, bucket, cnt)``, ≤ depth×width rows.

    Row j uses an independent hash via a seed prefix on the portable
    hash; bucket = h mod width (h is non-negative by construction, so
    ``%`` agrees across engines). One grouped aggregate: map-side
    combine bounds every task's output at depth×width cells.
    """
    rows = df.select(
        F.col(value_col).cast("string").alias("_v"),
        F.explode(
            F.array(*[F.lit(j) for j in range(depth)])
        ).alias("j"),
    )
    return (
        rows.select(
            "j",
            (
                portable_hash60(
                    F.concat_ws(":", F.col("j").cast("string"), F.col("_v"))
                )
                % width
            ).alias("bucket"),
        )
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def countmin_bucket_sql(seed: str, expr: str, width: int) -> str:
    """Oracle twin of the per-row bucket: h60(seed ':' value) mod width."""
    h = h60_sql(f"CAST({seed} AS VARCHAR) || ':' || CAST({expr} AS VARCHAR)")
    return f"({h}) % {width}"


def bloom_words(
    df: DataFrame, value_col: str, *, m_bits: int, depth: int
) -> DataFrame:
    """Bloom-filter bitmap as ``(word, bits)`` rows, ``<= ceil(m/62)``.

    62 usable bits per signed-long word (bit 62+ would overflow
    DuckDB's checked ``<<`` on BIGINT); position j of an element is
    ``h60(j ':' value) mod m_bits``. One grouped ``bit_or`` aggregate:
    map-side combine collapses every task to at most the word count —
    like the CMS grid, the bitmap's size is corpus-independent, and
    two bitmaps merge with a further ``bit_or`` (the mergeable-sketch
    property).
    """
    pos = df.select(
        F.col(value_col).cast("string").alias("_v"),
        F.explode(
            F.array(*[F.lit(j) for j in range(depth)])
        ).alias("j"),
    ).select(
        (
            portable_hash60(
                F.concat_ws(":", F.col("j").cast("string"), F.col("_v"))
            )
            % m_bits
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 62).cast("long").alias("word"),
            (F.col("pos") % 62).alias("bit"),
        )
        .groupBy("word")
        .agg(
            # shiftleft's Python wrapper only takes a literal count;
            # the SQL form accepts a column
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .alias("bits")
        )
    )


def bloom_pos_sql(seed: str, expr: str, m_bits: int) -> str:
    """Oracle twin of a bloom bit position."""
    h = h60_sql(f"CAST({seed} AS VARCHAR) || ':' || CAST({expr} AS VARCHAR)")
    return f"({h}) % {m_bits}"
