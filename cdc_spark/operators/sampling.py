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


def temperature_mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-weighted source mixing: keep source *s* at rate
    ``(n_min / n_s) ** (1 - alpha)`` so kept counts are ∝ ``n_s**alpha``
    — the standard recipe for flattening a dominant-source training mix
    (alpha=1 keeps everything, alpha=0 equalizes sources exactly).

    Rates are DERIVED FROM THE DATA (one tiny per-source count,
    broadcast back), then applied with the same deterministic
    md5-prefix predicate as :func:`stratified_hash_sample` — the
    sample is a pure function of (id, source counts), reproducible
    across engines, runs, and partitionings. The hash prefix is
    compared numerically (0..255) so external engines mirror the
    quantization with integer arithmetic.

    With the default ``alpha=0.5`` every float step (divide, sqrt,
    multiply, floor) is a correctly-rounded IEEE-754 operation, so an
    external engine recomputes bit-identical thresholds; other alphas
    go through ``pow``, whose last-ulp behavior is library-specific —
    fine for production, not for bit-exact cross-engine audits.
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    n_min = counts.agg(F.min("__n").alias("__nmin"))
    rate = (
        F.pow(F.col("__nmin") / F.col("__n"), F.lit(1.0 - alpha))
        if alpha != 0.5
        else F.sqrt(F.col("__nmin") / F.col("__n"))
    )
    rates = (
        counts.join(F.broadcast(n_min))
        .select(
            source_col,
            F.greatest(
                F.floor(rate * 256).cast("int") - F.lit(1), F.lit(0)
            ).alias("__thresh"),
        )
    )
    digits = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10
    ).cast("int")
    return df.join(F.broadcast(rates), source_col).where(
        digits <= F.col("__thresh")
    )
