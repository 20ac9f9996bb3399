"""As-of and range joins — temporal operators Spark lacks natively.

As-of join semantics: for each left row, attach the single right row
with the greatest ``right_ts <= left_ts`` within the same key group
(``allow_exact_matches`` mirrors ``pd.merge_asof``).

Implementation is the **union + last-value window** strategy, not a
pairwise join: both sides are unioned with a side tag, sorted within
each key by (ts, side), and the right-side payload is carried forward
with ``last(..., ignorenulls=True)``. Cost is one shuffle of
|L| + |R| rows and a linear window pass — no row multiplication, no
O(|L|·|R|) blow-up — so it scales to fact-fact as-of joins at 100 TB
where a range-condition join would be quadratic within key groups.
A per-key skew (one hot user) is bounded by that key's own row count,
same as any windowed operator; AQE skew handling does not apply to
windows, so extremely hot keys would need key-salting with a two-pass
boundary fix-up (documented trade-off, not needed at survey scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    *,
    allow_exact_matches: bool = True,
    direction: str = "backward",
    tiebreak: str | None = None,
) -> DataFrame:
    """Attach the latest preceding (``direction='backward'``) or
    earliest following (``'forward'``) right row to every left row.

    ``right_payload`` columns appear on the output (null when no right
    row matches). ``tiebreak`` (a right-side column) makes the choice
    deterministic when several right rows share one timestamp.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    # Right rows must sort before left rows at equal timestamps iff
    # exact matches are allowed (right=0/left=1 ascending), after
    # otherwise (right=2). Forward direction flips the time order, so
    # "preceding in sort order" means "following in time".
    right_tag = 0 if allow_exact_matches else 2
    payload = list(right_payload)

    left_cols = [c for c in left.columns]
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias(_SIDE),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in keys],
    )
    l = left.select(  # noqa: E741
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in payload],
        *[F.col(c) for c in left_cols if c not in keys],
    )

    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    order: list[Column] = [ts_order, F.col(_SIDE).asc()]
    if tiebreak is not None:
        # backward keeps the max-tiebreak right row at equal ts (last
        # in ascending order); forward keeps the min-tiebreak one
        tb = F.col(f"__r_{tiebreak}")
        order.append(
            tb.asc_nulls_first() if direction == "backward" else tb.desc_nulls_first()
        )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    unioned = r.unionByName(l)
    carried = unioned.select(
        *keys,
        "__ts",
        _SIDE,
        *[c for c in left_cols if c not in keys],
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in payload
        ],
    )
    out = carried.where(F.col(_SIDE) == 1).select(
        *keys,
        F.col("__ts").alias(left_ts),
        *[c for c in left_cols if c not in keys and c != left_ts],
        *[F.col(f"__m_{c}").alias(f"{c}_matched") for c in payload],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    lower: str = "0 seconds",
    upper: str = "5 minutes",
) -> DataFrame:
    """Equi-key join restricted to ``left_ts + lower <= right_ts <=
    left_ts + upper``.

    The equi keys keep this a hash/sort-merge join (the range is a
    post-join filter Catalyst evaluates during the merge), so the only
    blow-up is genuine matches within the band — the scalable shape
    for "events within N minutes of each other" joins.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lo = F.expr(f"INTERVAL {lower}")
    hi = F.expr(f"INTERVAL {upper}")
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (right[right_ts] >= left[left_ts] + lo)
        & (right[right_ts] <= left[left_ts] + hi)
    )
    return left.join(right, cond, "inner")
