"""Snapshot diff — query-based (polling) CDC as a batch operator.

The deck's slide 9 defines polling CDC as "determining the difference
between two data sets" and calls it compute-heavy; this is that
computation done right: one full-outer join on the key (hash-
partitioned both sides, AQE-skew-safe) with null-safe column
comparison — no exceptAll double-scan, no row-multiplication. Emits
synthetic change events (op c/u/d) so the output feeds the same
`apply_changes` path as log-based CDC — also the reconciliation job
for sources with missing DELETE events (slide 48 MySQL caveat).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    *,
    compare: Sequence[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Diff two snapshots → rows with op ∈ {c,u,d}.

    Output carries the key columns plus the *new* image for c/u and
    the *old* image for d (the delete-carries-only-keys rule of the
    golden fixtures — events/delete.json:7-11 — relaxed to old image
    since we have it).
    """
    keys = list(keys)
    compare = [c for c in (compare or old.columns) if c not in keys]

    # presence markers + null-safe key equality: rows with NULL key
    # components still diff correctly (isNotNull-on-key presence checks
    # would silently drop them)
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")

    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    changed = F.lit(False)
    for c in compare:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))

    op = (
        F.when(~in_old & in_new, F.lit("c"))
        .when(in_old & ~in_new, F.lit("d"))
        .when(changed, F.lit("u"))
    )
    out = joined.withColumn(op_col, op).where(F.col(op_col).isNotNull())
    return out.select(
        op_col,
        *[
            F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
            for k in keys
        ],
        *[
            F.when(F.col(op_col) == "d", F.col(f"__o_{c}"))
            .otherwise(F.col(f"__n_{c}"))
            .alias(c)
            for c in compare
        ],
    )
