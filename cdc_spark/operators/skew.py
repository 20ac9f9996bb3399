"""Skew mitigation: salted two-phase aggregation.

AQE (enabled in cdc_spark.session) already splits skewed *join*
partitions at runtime; aggregation skew — one hot group key receiving
a large share of all rows — needs salting: shard the hot key across
`salt` sub-keys for the partial aggregate, then combine the shards.
Both phases are algebraic (sum/count/min/max), so partial results
merge exactly; with the decimal-sum discipline results are identical
to the unsalted plan bit-for-bit.

Cost model: one extra (cheap, `salt`-way smaller) shuffle stage in
exchange for removing the single-reducer bottleneck. At 100 TB a hot
key (one mega-customer, one viral document) otherwise serializes the
whole stage on one task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType as T_MapType

# (partial_agg, final_merge) pairs per supported algebraic aggregate
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column | str]],
    *,
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation sharded by a salt column.

    ``aggs``: output_name → (kind, column) with kind ∈ sum|count|min|max.
    Example::

        salted_agg(events, ["user_id"],
                   {"n": ("count", "event_id"),
                    "total": ("sum", F.col("value").cast("decimal(18,6)"))})
    """
    keys = list(keys)
    # Deterministic salt from the full row content: recomputation after
    # a fetch failure re-derives the same shard per row (a salt from
    # monotonically_increasing_id would reshuffle rows between shards
    # mid-aggregation — the SPARK-23207 class of silent corruption).
    # Trade-off: fully identical rows share a shard; real hot keys are
    # hot through *distinct* rows, which spread fine.
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partials = []
    for name, (kind, col) in aggs.items():
        if kind not in _ALGEBRAIC:
            raise ValueError(f"unsupported aggregate kind {kind!r}")
        partial_fn, _ = _ALGEBRAIC[kind]
        partials.append(partial_fn(col).alias(f"__p_{name}"))
    stage1 = salted.groupBy(*keys, "__salt").agg(*partials)

    finals = []
    for name, (kind, _col) in aggs.items():
        _, final_fn = _ALGEBRAIC[kind]
        finals.append(final_fn(F.col(f"__p_{name}")).alias(name))
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    salt: int = 16,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Replicate-and-salt equi join: split a hot join key across
    ``salt`` shuffle partitions.

    AQE already splits skewed sort-merge partitions at runtime in
    BATCH plans — but AQE is disabled in stateful streaming workloads,
    so a stream-static join with one hot key (the viral-document
    enrichment, the mega-customer feed) serializes on one task with no
    runtime rescue. This is the deterministic, plan-time fix: the big
    (skewed) side gets a content-derived salt in [0, salt) — the same
    recomputation-stable discipline as :func:`salted_agg`, never a
    nondeterministic id — and the small side is replicated ``salt``
    times, so the join keys become (key, salt) and the hot key's rows
    spread across ``salt`` tasks. Cost: |right| × salt extra rows
    through the shuffle — the intended regime is a dim-like right side
    too big (or a plan too static) to broadcast.

    Exact for ``inner``, ``left``, ``left_semi``, ``left_anti``: each
    left row carries ONE salt value and the right side covers all of
    them, so every matching pair appears exactly once and unmatched
    left rows survive exactly once. ``right``/``full`` would emit
    unmatched RIGHT rows once per replica — rejected loudly.

    ``salt_cols`` picks which left columns feed the content hash
    (default: every xxhash64-hashable left column — maps are skipped,
    since xxhash64 rejects MapType at analysis time). Pass a
    higher-entropy subset explicitly when the defaults are dominated
    by the join key itself. Limitation (same as :func:`salted_agg`):
    rows that are full duplicates across ``salt_cols`` hash to ONE
    salt value and do not spread — real hot keys are hot through
    *distinct* rows (distinct event ids, timestamps), which spread
    fine; for literal-duplicate floods, include a pre-assigned unique
    id column in ``salt_cols``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got "
            f"{how!r}: unmatched right rows would appear once per "
            "replica under right/full joins"
        )
    if "__salt" in left.columns or "__salt" in right.columns:
        raise ValueError(
            "salted_join reserves the column name '__salt'; rename the "
            "existing __salt column on the input first"
        )
    if salt_cols is None:
        # xxhash64 supports atomics, arrays and structs but not maps —
        # skip unhashable columns rather than fail at analysis time.
        hashable = [
            f.name
            for f in left.schema.fields
            if not isinstance(f.dataType, T_MapType)
        ]
        if not hashable:
            raise ValueError(
                "salted_join found no xxhash64-hashable left columns; "
                "pass salt_cols explicitly"
            )
        salt_cols = hashable
    salted = left.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt)
        ).cast("int"),
    )
    replicated = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(s).cast("int") for s in range(salt)])),
    )
    out = salted.join(replicated, keys + ["__salt"], how)
    return out.drop("__salt")
