"""asof_join_bucketed ≡ asof_join, under 100×-hot-key skew.

The bucketed variant must return exactly the plain operator's result
(it is a physical re-plan, not a semantic change) while bounding every
window partition to one (key, time-bucket) slice.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cdc_spark.operators.asof import asof_join, asof_join_bucketed


@pytest.fixture(scope="module")
def skewed(spark):
    """Left: one hot key with 100× the rows of 20 cold keys.
    Right: sparse quotes per key."""
    rng = random.Random(7)
    left_rows = []
    for k in range(21):
        n = 2000 if k == 0 else 20  # key 0 is 100× hot
        for i in range(n):
            left_rows.append((k, rng.randint(0, 10_000), k * 100_000 + i))
    right_rows = []
    for k in range(21):
        for i in range(40):
            right_rows.append(
                (k, rng.randint(0, 10_000), float(k * 1000 + i), i)
            )
    left = spark.createDataFrame(
        left_rows, "key int, ts long, row_id long"
    )
    right = spark.createDataFrame(
        right_rows, "key int, ts long, px double, rid int"
    )
    return left.cache(), right.cache()


def _collect(df):
    return sorted(
        tuple(r) for r in df.select(
            "key", "ts", "row_id", "px_matched"
        ).collect()
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
def test_bucketed_equals_plain(spark, skewed, direction, exact):
    left, right = skewed
    plain = asof_join(
        left, right, "key", "ts", "ts", ["px"],
        direction=direction, allow_exact_matches=exact, tiebreak="rid",
    )
    bucketed = asof_join_bucketed(
        left, right, "key", "ts", "ts", ["px"],
        bucket_width=500.0,
        direction=direction, allow_exact_matches=exact, tiebreak="rid",
    )
    assert _collect(bucketed) == _collect(plain)


def test_bucketed_carry_across_empty_buckets(spark):
    """A left row many buckets after the last right row still matches
    (carry-in fill-forwards over right-empty buckets)."""
    left = spark.createDataFrame(
        [(1, 10_000, 1)], "key int, ts long, row_id long"
    )
    right = spark.createDataFrame(
        [(1, 5, 9.9, 0)], "key int, ts long, px double, rid int"
    )
    out = asof_join_bucketed(
        left, right, "key", "ts", "ts", ["px"], bucket_width=10.0
    ).collect()
    assert out[0].px_matched == 9.9


def test_bucketed_no_match_stays_null(spark):
    left = spark.createDataFrame(
        [(1, 5, 1)], "key int, ts long, row_id long"
    )
    right = spark.createDataFrame(
        [(1, 50, 9.9, 0)], "key int, ts long, px double, rid int"
    )
    out = asof_join_bucketed(
        left, right, "key", "ts", "ts", ["px"], bucket_width=10.0
    ).collect()
    assert out[0].px_matched is None


def test_bucketed_date_column(spark):
    """DateType ordering columns must bucket via the timestamp
    intermediate cast — a raw date->double cast raises
    AnalysisException since Spark 3 (same seam test_asof_date_
    ordering_column pins for the plain operator)."""
    left = spark.createDataFrame(
        [(1, "2024-03-10", 1)], "key int, ts string, row_id long"
    ).select("key", F.col("ts").cast("date").alias("ts"), "row_id")
    right = spark.createDataFrame(
        [(1, "2024-03-01", 5.0, 0), (1, "2024-03-20", 7.0, 1)],
        "key int, ts string, px double, rid int",
    ).select("key", F.col("ts").cast("date").alias("ts"), "px", "rid")
    out = asof_join_bucketed(
        left, right, "key", "ts", "ts", ["px"],
        bucket_width=86_400.0 * 7,
    ).collect()
    assert out[0].px_matched == 5.0


def test_bucketed_timestamp_column(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1)], "key int, ts string, row_id long"
    ).select("key", F.col("ts").cast("timestamp").alias("ts"), "row_id")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 5.0, 0)],
        "key int, ts string, px double, rid int",
    ).select(
        "key", F.col("ts").cast("timestamp").alias("ts"), "px", "rid"
    )
    out = asof_join_bucketed(
        left, right, "key", "ts", "ts", ["px"], bucket_width=600.0
    ).collect()
    assert out[0].px_matched == 5.0
