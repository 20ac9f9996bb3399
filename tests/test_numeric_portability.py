"""dsum/davg engine-portability at every magnitude.

The money-sum helpers must produce the BIT-IDENTICAL double DuckDB's
``CAST(SUM(CAST(x AS DECIMAL(30,s))) AS DOUBLE)`` produces, because the
driver's correctness gate hash-compares values. Below 2^53 scaled
units every reasonable conversion agrees; above it (the round-9 sf1
probe's q01 sum_charge catch) the order of roundings matters: DuckDB
converts the exact scaled integer V to double FIRST, then divides by
10^s in double — two roundings — while a single correctly-rounded
conversion of V/10^s can land one ulp away. dsum mirrors the two-step
shape; these tests pin it with a value set where the two shapes
provably differ.
"""

from __future__ import annotations

import duckdb

from cdc_spark.queries.base import davg, dsum

# 10 six-decimal values (~9.5e8 each) whose exact scaled sum
# V = 9378529499537503 exceeds 2^53 AND rounds differently under
# one-step (…502) vs two-step (…504) conversion — found by search,
# verified against DuckDB in round 9.
_SCALED = [
    955564639800631,
    906797434004560,
    913247980736555,
    982018266106360,
    930217274347253,
    912094788948184,
    958851504383834,
    933870412123023,
    977550319106009,
    908316879981094,
]
_VALS = [v / 1e6 for v in _SCALED]


def _duck(sql: str) -> float:
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in _VALS])
    return con.execute(sql).fetchone()[0]


def test_dsum_matches_duckdb_past_2_53(spark):
    df = spark.createDataFrame([(v,) for v in _VALS], "x double")
    got = df.agg(dsum("x").alias("s")).collect()[0].s
    want = _duck(
        "SELECT CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) FROM t"
    )
    # the one-step (old) conversion yields 9378529499.537502; the
    # engines must agree bit-for-bit on 9378529499.537504
    assert got == want == 9378529499.537504


def test_davg_matches_duckdb_past_2_53(spark):
    df = spark.createDataFrame([(v,) for v in _VALS], "x double")
    got = df.agg(davg("x").alias("a")).collect()[0].a
    want = _duck(
        "SELECT ROUND(CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)"
        " / COUNT(x), 6) FROM t"
    )
    assert got == want


def test_dsum_small_magnitudes_unchanged(spark):
    """Below 2^53 both conversion shapes agree — the fix must not move
    any value the gate already pinned at sf0.01/sf0.1."""
    vals = [1234.56, 0.000001, -99999.999999, 42.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(dsum("x").alias("s")).collect()[0].s
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.execute(
        "SELECT CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) FROM t"
    ).fetchone()[0]
    assert got == want == -98723.439998
