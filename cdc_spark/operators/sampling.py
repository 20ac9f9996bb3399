"""Deterministic sampling for training-data pipelines.

Sampling at corpus scale must be (a) reproducible across runs and
engines, (b) stable under data arrival order and repartitioning, and
(c) driver-free. Random() fails all three; a content-id hash
threshold satisfies them: a row is kept iff a fixed-width prefix of
``md5(id)`` falls under a per-group threshold. Rates are quantized to
1/256 steps (two hex digits) so the predicate is a plain string
comparison every engine evaluates identically.

Stratified rates are the training-mix use case: upsample
low-resource slices, downsample dominant ones, exactly and
reproducibly (rates > 1 need row multiplication — out of scope; cap
at 1.0).

Scale shape: a scan-level filter — no shuffle, no state, pushes down
to the parquet reader alongside other predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _threshold_hex(rate: float) -> str:
    """Rate (0, 1] → inclusive upper bound on the first 2 md5 hex
    digits. Quantized to ceil-free 1/256 steps: rate 0.25 → '3f'
    (64/256), 1.0 → 'ff'."""
    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    return format(max(int(rate * 256) - 1, 0), "02x")


def hash_sample_predicate(id_col: str | Column, rate: float) -> Column:
    """Keep-predicate for a flat deterministic sample."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(c.cast("string")), 1, 2) <= _threshold_hex(rate)


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-group deterministic sample: each group's rows are kept at
    that group's rate, chosen by content-id hash (reproducible, order-
    and partitioning-independent)."""
    threshold = F.lit(_threshold_hex(default_rate))
    for g, r in sorted(rates.items()):
        threshold = F.when(
            F.col(group_col) == g, F.lit(_threshold_hex(r))
        ).otherwise(threshold)
    digits = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return df.where(digits <= threshold)
