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

_SPLIT = 10**6  # hi/lo split modulus for long-backed exact sums


def _split_sums(c: Column, scale: int) -> tuple[Column, Column]:
    """Per-row fixed-point split: value → (hi, lo) longs.

    ``v = round(x * 10^scale)`` recovers the exact scaled integer
    (callers pass scale ≥ the expression's exact decimal places, and
    |x| ≲ 2e9 keeps the double product within half-ulp of it). The
    two long sums are exact and overflow-safe independently:
    Σhi ≈ Σx stays under 9.2e18 for any realistic measure total, and
    Σlo < 10^6 per row bounds row count at ~9e12 — both far beyond
    100 TB table sizes, where a single scaled-long sum would overflow.
    """
    v = F.round(c * F.lit(float(10**scale))).cast("long")
    hi = F.floor(v / F.lit(_SPLIT)).cast("long")
    lo = v - hi * F.lit(_SPLIT)
    return hi, lo


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent exact sum of a double measure → double.

    Fixed-point split-long sums (exact integer arithmetic, codegen'd
    long aggregation buffers) recombined in decimal — same exact
    rational as the oracle's decimal-cast SUM, so both sides convert
    to the identical nearest double; ~2.7× faster than summing
    decimal(30,s) values, whose wide buffers leave Spark's compact
    long-backed decimal representation.
    """
    c = F.col(col) if isinstance(col, str) else col
    hi, lo = _split_sums(c, scale)
    total = F.sum(hi).cast("decimal(38,0)") * F.lit(_SPLIT) + F.sum(lo)
    # convert EXACTLY like DuckDB's CAST(DECIMAL AS DOUBLE): first the
    # scaled integer to double (correctly rounded on both engines for
    # |V| < 2^63), THEN divide by 10^scale in double. Decimal division
    # before the cast is one correctly-rounded conversion of V/10^s —
    # one ulp off DuckDB's two-step once totals pass 2^53 scaled units
    # (the round-9 sf1 q01 sum_charge mismatch; invisible at gate SFs)
    return total.cast("double") / F.lit(float(10**scale))


def dsum_sql(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 6, ndigits: int = 6) -> Column:
    """avg as exact split-long sum / count, rounded — engine-portable."""
    c = F.col(col) if isinstance(col, str) else col
    hi, lo = _split_sums(c, scale)
    total = F.sum(hi).cast("decimal(38,0)") * F.lit(_SPLIT) + F.sum(lo)
    # same two-step conversion as dsum (match the oracle's
    # CAST(SUM(...) AS DOUBLE) / COUNT exactly at every magnitude)
    return F.round(
        total.cast("double")
        / F.lit(float(10**scale))
        / F.count(c),
        ndigits,
    )


def davg_sql(expr: str, scale: int = 6, ndigits: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}), {ndigits})"
    )


def await_stream(
    q,
    idle_timeout: float = 600.0,
    hard_timeout: float = 3600.0,
) -> None:
    """Wait until a streaming query (typically Trigger.AvailableNow)
    ACTUALLY terminates.

    ``q.awaitTermination(300)`` returns False on timeout, and 27 call
    sites ignored that return — at scale one long micro-batch outlived
    the cap and the caller read partially-folded state (caught by the
    round-11 sf10 probe: st32's fifth shard was still folding when the
    done-marker assert ran).

    Hang detection, honestly stated: ``lastProgress.batchId`` only
    advances when a micro-batch COMPLETES, so completed-batch idleness
    alone cannot tell a hang from one legitimately long batch (the
    round-11 version raised a false hang on any single batch over
    ``idle_timeout`` — the very scenario the sf10 probe produced).
    This version also polls ``q.status.isTriggerActive``: a trigger
    actively executing is a BIG BATCH, not a hang, and resets nothing
    but is never killed by ``idle_timeout``. The remaining failure
    modes and their knobs:

    - no completed batch AND no active trigger for ``idle_timeout``
      seconds → genuine stall (source wedged between triggers, or the
      no-more-data/termination handshake lost) → stop + raise;
    - one trigger active past ``hard_timeout`` seconds with no batch
      completing → a wedged task inside a batch (the one case
      indistinguishable from an arbitrarily large batch) → stop +
      raise. Scale-heavy call sites that legitimately fold for longer
      raise ``hard_timeout`` rather than suppressing the check."""
    import time as _time

    last_batch = -1
    idle_start = _time.monotonic()
    while not q.awaitTermination(10):
        progress = q.lastProgress
        batch = progress["batchId"] if progress else -1
        if batch != last_batch:
            last_batch = batch
            idle_start = _time.monotonic()
            continue
        stalled_for = _time.monotonic() - idle_start
        try:
            trigger_active = bool(q.status.get("isTriggerActive"))
        except Exception:  # noqa: BLE001 — racing termination
            trigger_active = False
        if trigger_active:
            if stalled_for > hard_timeout:
                q.stop()
                raise RuntimeError(
                    f"streaming query's trigger stayed active "
                    f"{hard_timeout:.0f}s without completing a batch "
                    "— wedged task; stopped and failed loudly "
                    "instead of reading partial state"
                )
        elif stalled_for > idle_timeout:
            q.stop()
            raise RuntimeError(
                f"streaming query made no batch progress in "
                f"{idle_timeout:.0f}s with no trigger active — "
                "stopped and failed loudly instead of reading "
                "partial state"
            )
