"""Time-series regularization: gap fill + last-observation-carried-forward.

CDC state tables and event streams are irregular in time; downstream
consumers (rollups, ML features, monitoring) want a dense per-key
grid. The declarative shape:

1. per (key, bucket) aggregate to one observation (latest by a total
   order — the CDC latest-wins rule applied to time buckets);
2. per key, explode ``sequence(min_bucket, max_bucket, step)`` into
   the dense grid — bounded by each key's own time span, so no key
   pays for the corpus' global range;
3. left-join observations onto the grid (co-partitioned: both sides
   hash on the key) and forward-fill with ``last(value, ignorenulls)``
   over an unbounded-preceding row frame.

Scale shape: two hash shuffles on the key (agg, window) — the join
reuses the aggregation's partitioning under AQE. The window sort is
per-key and bounded by grid length. No Python, no driver state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_locf(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    *,
    order_col: str,
    bucket: str = "hour",
    step: str = "INTERVAL 1 HOUR",
    round_digits: int | None = 4,
) -> DataFrame:
    """Dense per-key ``bucket`` grid with LOCF-filled ``value_col``.

    ``order_col`` breaks intra-bucket ties (latest observation wins,
    deterministically). Leading gaps before a key's first observation
    do not exist by construction (the grid starts at the key's first
    bucket). Output: keys, ``bucket_ts``, ``value_filled``,
    ``is_observed``.
    """
    keys = list(key_cols)
    b = F.date_trunc(bucket, F.col(ts_col))
    v = F.expr(f"max_by({value_col}, {order_col})")
    if round_digits is not None:
        v = F.round(v, round_digits)
    hourly = df.groupBy(*keys, b.alias("__b")).agg(v.alias("__v"))

    bounds = hourly.groupBy(*keys).agg(
        F.min("__b").alias("__mn"), F.max("__b").alias("__mx")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.expr(step))
        ).alias("__b"),
    )
    joined = grid.join(hourly, [*keys, "__b"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        *keys,
        F.col("__b").alias("bucket_ts"),
        F.last("__v", ignorenulls=True).over(w).alias("value_filled"),
        F.when(F.col("__v").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .alias("is_observed"),
    )


def downsample_ohlc(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    group_cols: Sequence[str] = (),
    bucket: str = "hour",
    order_cols: Sequence[str] = (),
    round_digits: int = 6,
) -> DataFrame:
    """Downsample an irregular series to per-bucket OHLC bars
    (open/high/low/close + count) — the standard resample for metric
    and market-style event streams.

    ``order_cols`` breaks timestamp ties deterministically (pass a
    unique id). Plan shape: a two-phase aggregate whose partial side
    runs per input partition and ships only group-cardinality rows
    through the exchange. The struct-ordered ``min_by``/``max_by``
    buffer is not a fixed-width type, so Spark plans SortAggregate
    rather than HashAggregate — but the sort is on the GROUP KEY only
    and happens map-side before any shuffle. The alternative
    row_number-window formulation would instead Exchange every raw
    row and sort within partitions; at 100 TB the agg formulation
    moves orders of magnitude less data.
    """
    keys = [F.col(c) for c in group_cols]
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    v = F.col(value_col)
    return df.groupBy(b, *keys).agg(
        F.round(F.expr(f"min_by({value_col}, struct({ts_col}"
                       + "".join(f", {c}" for c in order_cols) + "))"),
                round_digits).alias("open"),
        F.round(F.max(v), round_digits).alias("high"),
        F.round(F.min(v), round_digits).alias("low"),
        F.round(F.expr(f"max_by({value_col}, struct({ts_col}"
                       + "".join(f", {c}" for c in order_cols) + "))"),
                round_digits).alias("close"),
        F.count("*").alias("n_obs"),
    )
