"""Registry plumbing for the declared query inventory.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus an
optional ANSI-SQL oracle string DuckDB can run over the same parquet
tables. Determinism rules every query follows so the driver's
order-insensitive value-hash comparison is stable across engines:

- Money/measure sums go through ``decimal`` (exact, order-independent
  addition) and come back as double: ``dsum``/``davg`` below.
- Ratios / floating expressions are ``round()``-ed (both sides) so the
  last-bit noise of differing accumulation orders cannot flip a hash.
- Every window ``orderBy`` and every top-k carries a unique tiebreak
  column; no query depends on arrival order.
- Aggregate / computed columns are aliased identically in the Spark
  plan and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    note: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    note: str = "",
    tags: tuple[str, ...] = (),
) -> Callable:
    """Decorator: add a query to the inventory."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, note=note, tags=tags)
        return fn

    return deco


# --- engine-portable numeric helpers -----------------------------------

def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent exact sum of a double measure → double.

    Casting each value to decimal before summing makes the addition
    associative (no FP reordering noise between Spark partial/merge
    aggregation and DuckDB's scan order), then one final cast back.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 6, ndigits: int = 6) -> Column:
    """avg as exact-decimal sum / count, rounded — engine-portable."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.sum(c.cast(f"decimal(30,{scale})")).cast("double")
    return F.round(total / F.count(c), ndigits)


def davg_sql(expr: str, scale: int = 6, ndigits: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}), {ndigits})"
    )
