"""Distributed total-order primitives: row numbers, prefix sums, gaps.

A global ``Window.orderBy(...)`` with no partition funnels every row
through ONE reducer — the single shape that cannot survive a 100 TB
corpus. These helpers produce the SAME totals with the classic
two-pass parallel-prefix decomposition:

1. ``repartitionByRange`` on the order key — each task owns one
   contiguous key range (Spark's RangePartitioner samples boundaries;
   contiguity is what makes per-partition results stitchable);
2. a per-partition pass (local row_number / running sum — bounded by
   one partition's rows, fully parallel);
3. per-partition totals (a tiny ``groupBy`` of ``num_partitions``
   rows) turned into exclusive offsets with a window over THAT
   aggregate — the only unpartitioned window left, over input bounded
   by the partition count, never by the data;
4. a broadcast join adds each partition's offset back.

The result is bit-identical to the single-reducer window (callers
must pass a tie-free ``order_cols`` set — a trailing unique id — so
the total order is well-defined), which is why the oracles of the
queries built on these (dp05, mm05) keep their plain
``ROW_NUMBER() OVER (ORDER BY ...)`` SQL.

CORRECTNESS INVARIANT — the ranged projection is localCheckpoint'ed
(lazy: materialized by whichever consumer runs first, reused by the
rest) before fanning out to the offsets aggregate and the output
join: ``repartitionByRange`` picks its boundaries by SAMPLING with a
seed derived from the evaluation's RDD id, so two separately-planned
evaluations of the same lazy subtree can land rows in DIFFERENT
partitions. Exchange reuse normally hides this (identical subtrees
plan one exchange), but any asymmetric column pruning between the
two consumers splits them into two exchanges with two samples — and
the broadcast offsets then describe a layout the data side doesn't
have, silently corrupting every rank (found in round 7 composing two
row-number passes). The checkpoint call binds both consumers to ONE
concrete RDD (one id, one sampled layout); a lost partition fails
loudly instead of re-sampling.

``lsn_gap_audit`` applies the same decomposition to ordered
adjacent-row comparison (lag): gaps WITHIN a fixed-width id block are
found per block, gaps ACROSS blocks from the per-block min/max
aggregate — one data shuffle, no global sort. Reference parity: the
audit monitors the dense-LSN invariant the reference's single
replication slot guarantees by construction (main.go:61-74 keeps one
monotone confirmed-LSN cursor); any fan-out transport must check it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__ord_pid"
_BKT = "__ord_bkt"
_MID = "__ord_mid"
_LOCAL = "__ord_local"
_CNT = "__ord_cnt"
_OFF = "__ord_off"
_ONE = "__ord_one"
_OPID = "__ord_opid"
_OGRP = "__ord_ogrp"
_CGRP = "__ord_cgrp"  # constant group: ungrouped ops on the bucketed path


def _offsets(counts: DataFrame, total_col: str) -> DataFrame:
    """Exclusive running offsets over the tiny per-partition totals.

    The window here is unpartitioned BY DESIGN: its input is the
    grouped aggregate of partition totals (``num_partitions`` rows),
    so the 'single reducer' holds partition-count rows, not data.
    """
    w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    return counts.select(
        _PID,
        F.coalesce(F.sum(total_col).over(w), F.lit(0))
        .cast("long")
        .alias(_OFF),
    )


def distributed_row_number(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    *,
    out_col: str = "position",
    num_partitions: int = 32,
    bucket: Column | None = None,
) -> DataFrame:
    """Global 1-based row number by ``order_cols`` without a global
    window.

    One data shuffle: after ``repartitionByRange`` + per-partition
    sort, ``monotonically_increasing_id`` is ``(pid << 33) + local
    index`` — the local rank falls out arithmetically, no second
    window pass over the data at all. Offsets come from the
    per-partition counts (step 3 above). The id layout bounds a
    single partition at 2^33 (~8.6 B) rows — size ``num_partitions``
    so no range partition approaches that (at 100 TB that is ~40
    bytes/row/partition at the minimum legal partition count; any
    sane sizing is orders of magnitude below the bound).

    ``bucket`` (optional, round 10) is the DETERMINISTIC fast path —
    :func:`grouped_prefix_sum`'s slice contract applied to the global
    order: a pure row expression, monotone non-decreasing along
    ``order_cols``, replaces the sampled range partitioning, so the
    plan needs no ``localCheckpoint`` layout pin (at 100 TB the pin
    is a full extra write of the dataset). Derive it from the order
    key itself — e.g. the leading hex digits of an md5 sort key, or
    ``(band_count-1-band)*cells + hex_prefix`` for a banded DESC
    order.
    """
    if bucket is not None:
        ones = df.withColumn(_ONE, F.lit(1).cast("long")).withColumn(
            _CGRP, F.lit(0)
        )
        return _grouped_prefix_sum_bucketed(
            ones,
            _CGRP,
            order_cols,
            _ONE,
            bucket,
            out_col=out_col,
            inclusive=True,
        ).drop(_ONE, _CGRP)
    ranged = df.repartitionByRange(
        num_partitions, *order_cols
    ).sortWithinPartitions(*order_cols)
    local = ranged.select(
        "*",
        F.spark_partition_id().alias(_PID),
        F.monotonically_increasing_id().alias(_MID),
    ).withColumn(
        _LOCAL,
        (F.col(_MID) - F.shiftleft(F.col(_PID).cast("long"), 33) + 1).cast(
            "long"
        ),
    ).localCheckpoint(eager=False)  # pin ONE layout (module docstring)
    # The id layout silently corrupts past 2^33 rows in ONE partition;
    # fail loudly instead, inside the counts aggregate we already
    # compute (raise_error evaluates lazily with the plan — no extra
    # job, and _CNT is consumed so it cannot be pruned).
    counts = local.groupBy(_PID).agg(F.count("*").alias(_CNT)).select(
        _PID,
        F.when(F.col(_CNT) < F.lit(1 << 33), F.col(_CNT))
        .otherwise(
            F.raise_error(
                F.lit(
                    "distributed_row_number: a range partition exceeds"
                    " 2^33 rows; increase num_partitions"
                )
            )
        )
        .alias(_CNT),
    )
    out = local.join(F.broadcast(_offsets(counts, _CNT)), _PID)
    return out.withColumn(
        out_col, (F.col(_LOCAL) + F.col(_OFF)).cast("long")
    ).drop(_PID, _MID, _LOCAL, _OFF)


def distributed_prefix_sum(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    value_col: str,
    *,
    out_col: str = "prefix_sum",
    inclusive: bool = True,
    num_partitions: int = 32,
    bucket: Column | None = None,
) -> DataFrame:
    """Global running sum of ``value_col`` by ``order_cols`` without a
    global window: per-range-partition cumsum + broadcast partition
    offsets (the textbook distributed prefix sum).

    ``bucket`` selects the deterministic-slice fast path — see
    :func:`distributed_row_number`: a pure-row, order-monotone slice
    id replaces the sampled range partitioning and removes the
    ``localCheckpoint`` layout pin."""
    if bucket is not None:
        const = df.withColumn(_CGRP, F.lit(0))
        return _grouped_prefix_sum_bucketed(
            const,
            _CGRP,
            order_cols,
            value_col,
            bucket,
            out_col=out_col,
            inclusive=inclusive,
        ).drop(_CGRP)
    ranged = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        _LOCAL, F.sum(value_col).over(w_local).cast("long")
    ).localCheckpoint(eager=False)  # pin ONE layout (module docstring)
    totals = local.groupBy(_PID).agg(
        F.sum(value_col).cast("long").alias(_CNT)
    )
    out = local.join(F.broadcast(_offsets(totals, _CNT)), _PID)
    prefix = F.col(_LOCAL) + F.col(_OFF)
    if not inclusive:
        prefix = prefix - F.col(value_col)
    return out.withColumn(out_col, prefix.cast("long")).drop(
        _PID, _LOCAL, _OFF
    )


def distributed_prefix_min(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    value_col: str,
    *,
    out_col: str = "prefix_min",
    inclusive: bool = True,
    num_partitions: int = 32,
) -> DataFrame:
    """Global running MIN of ``value_col`` by ``order_cols`` without a
    global window — the same two-pass decomposition as
    :func:`distributed_prefix_sum` for the other classic associative
    scan (sort-based skyline / record-low tracking / monotone
    envelope). ``inclusive=False`` gives the EXCLUSIVE prefix min
    (strictly-preceding rows only; NULL when nothing precedes —
    exactly ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``),
    the form dominance tests need. Value type is preserved (works on
    dates, strings, any orderable type)."""
    ranged = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    upper = Window.currentRow if inclusive else -1
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    local = ranged.withColumn(
        _LOCAL, F.min(value_col).over(w_local)
    ).localCheckpoint(eager=False)  # pin ONE layout (module docstring)
    totals = local.groupBy(_PID).agg(F.min(value_col).alias(_CNT))
    w_off = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        _PID, F.min(_CNT).over(w_off).alias(_OFF)
    )
    out = local.join(F.broadcast(offsets), _PID)
    # least() skips NULLs, so a missing local (exclusive, first row of
    # a partition) or missing offset (first partition) falls through
    # to the other side; both NULL ⇒ NULL = "nothing precedes"
    return out.withColumn(
        out_col, F.least(F.col(_LOCAL), F.col(_OFF))
    ).drop(_PID, _LOCAL, _OFF)


def grouped_prefix_sum(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[Column | str],
    value_col: str,
    *,
    out_col: str = "prefix_sum",
    inclusive: bool = True,
    num_partitions: int = 32,
    bucket: Column | None = None,
) -> DataFrame:
    """Per-group running sum of ``value_col`` — the distributed twin of
    ``Window.partitionBy(group).orderBy(...)`` cumsum — without ever
    funneling a whole group through one reducer.

    ``Window.partitionBy(group_col)`` bounds each task by the LARGEST
    GROUP: a low-cardinality or skewed group column (one source = 99%
    of a corpus) degenerates to the single-reducer shape. Here the
    range partitioner keys on ``(group_col, *order_cols)`` instead, so
    a dominant group simply spans several contiguous range partitions:

    1. ``repartitionByRange(group_col, *order_cols)`` — group is the
       LEADING range key, so each group occupies a contiguous run of
       partitions and each partition holds a contiguous slice of at
       most a handful of groups;
    2. per ``(partition, group)`` local cumsum — bounded by one
       partition's rows regardless of group skew;
    3. per ``(partition, group)`` totals (a tiny aggregate: at most
       ``num_partitions + num_groups − 1`` rows by contiguity) turned
       into exclusive offsets with a window partitioned by group over
       THAT aggregate;
    4. broadcast join adds each slice's offset back.

    Bit-identical to the per-group window when ``order_cols`` is
    tie-free within a group, so oracles keep their plain
    ``SUM() OVER (PARTITION BY g ORDER BY ...)`` SQL.

    The broadcast offsets table holds ≤ ``num_partitions + G − 1``
    rows (G = distinct groups, by contiguity), so ``group_col``
    cardinality must be broadcast-safe — the intended regime (data
    mixtures, sources, shards: G ≪ rows). For a data-sized group
    column a plain partitioned window is already parallel enough.

    ``bucket`` (optional, round 9) is the DETERMINISTIC fast path:
    when the caller can name a slice id that is a pure expression of
    the row — monotone non-decreasing in ``order_cols`` within each
    group, bounded distinct count B with G×B broadcast-safe (the
    canonical form: ``floor(dense_id * B / N)``) — the decomposition
    keys on (group, bucket) hash partitioning instead of sampled
    ranges. Two consequences at scale: the ``localCheckpoint`` layout
    pin DISAPPEARS (re-evaluating a hash-partitioned subtree always
    reproduces the same row→slice assignment, so the round-7 resample
    hazard is structurally impossible — no pinned materialization,
    which at 100 TB is a full extra write of the dataset), and the
    boundary-sampling pass is skipped. Same bit-identical contract,
    same skew story (a hot group spans many buckets; each window
    partition is one (bucket, group) cell bounded by bucket width).

    NULL buckets: a bucket expression that evaluates NULL is kept
    (eqNullSafe join below) and the offset window places it FIRST
    (Spark ASC = NULLS FIRST) — so a NULL bucket is only valid when
    the deriving order column ALSO sorts NULLS FIRST (plain ASC). For
    a DESC order (Spark desc = NULLS LAST) a NULL-producing bucket
    expression would place those rows' slice before every real slice
    while the in-cell sort places the rows last — silently shifted
    positions, not an error. Callers with DESC components (dp05's
    banded-DESC form) must make the bucket expression total
    (coalesce the NULL case into the correct end of the slice range).
    """
    if bucket is not None:
        return _grouped_prefix_sum_bucketed(
            df,
            group_col,
            order_cols,
            value_col,
            bucket,
            out_col=out_col,
            inclusive=inclusive,
        )
    ranged = df.repartitionByRange(
        num_partitions, group_col, *order_cols
    ).withColumn(_PID, F.spark_partition_id())
    w_local = (
        Window.partitionBy(_PID, group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        _LOCAL, F.sum(value_col).over(w_local).cast("long")
    ).localCheckpoint(eager=False)  # pin ONE layout (module docstring)
    totals = local.groupBy(_PID, group_col).agg(
        F.sum(value_col).cast("long").alias(_CNT)
    )
    # exclusive offsets per group over the TINY (pid, group) aggregate
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        F.col(_PID).alias(_OPID),
        F.col(group_col).alias(_OGRP),
        F.coalesce(F.sum(_CNT).over(w_off), F.lit(0))
        .cast("long")
        .alias(_OFF),
    )
    # eqNullSafe on the group key: groupBy/Window.partitionBy treat a
    # NULL group as a regular group, so the offsets join must too — a
    # null-unsafe equi-join would silently drop every NULL-group row
    # and break the claimed bit-identity with the partitioned window.
    out = local.join(
        F.broadcast(offsets),
        (F.col(_PID) == F.col(_OPID))
        & F.col(group_col).eqNullSafe(F.col(_OGRP)),
    )
    prefix = F.col(_LOCAL) + F.col(_OFF)
    if not inclusive:
        prefix = prefix - F.col(value_col)
    return out.withColumn(out_col, prefix.cast("long")).drop(
        _PID, _LOCAL, _OFF, _OPID, _OGRP
    )


def _grouped_prefix_sum_bucketed(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[Column | str],
    value_col: str,
    bucket: Column,
    *,
    out_col: str,
    inclusive: bool,
) -> DataFrame:
    """Deterministic-slice variant of :func:`grouped_prefix_sum` (see
    its ``bucket`` contract). Identical algebra with the caller's
    bucket id standing in for the sampled range-partition id: local
    cumsum per (bucket, group) window cell, per-cell totals, exclusive
    offsets ordered by bucket within each group, broadcast join back.
    Every key is a pure row expression, so the two consumers of the
    local frame may be planned as two exchanges safely — both compute
    the same partitioning. No checkpoint, no sampling pass."""
    b = df.withColumn(_BKT, bucket.cast("long"))
    w_local = (
        Window.partitionBy(_BKT, group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn(
        _LOCAL, F.sum(value_col).over(w_local).cast("long")
    )
    totals = local.groupBy(_BKT, group_col).agg(
        F.sum(value_col).cast("long").alias(_CNT)
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(_BKT)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        F.col(_BKT).alias(_OPID),
        F.col(group_col).alias(_OGRP),
        F.coalesce(F.sum(_CNT).over(w_off), F.lit(0))
        .cast("long")
        .alias(_OFF),
    )
    # eqNullSafe on the bucket key too: a caller's bucket expression
    # may evaluate NULL (e.g. a null order column feeding floor()); a
    # plain == would silently drop those rows, diverging from the
    # non-bucketed path whose spark_partition_id key is never null.
    # Null buckets sort first in the offset window (Spark ASC NULLS
    # FIRST), so they consistently read as "before every real bucket"
    # — which matches the data order ONLY when the deriving order
    # column sorts NULLS FIRST too (see the bucket contract in
    # grouped_prefix_sum: DESC orders need a total bucket expression).
    out = local.join(
        F.broadcast(offsets),
        F.col(_BKT).eqNullSafe(F.col(_OPID))
        & F.col(group_col).eqNullSafe(F.col(_OGRP)),
    )
    prefix = F.col(_LOCAL) + F.col(_OFF)
    if not inclusive:
        prefix = prefix - F.col(value_col)
    return out.withColumn(out_col, prefix.cast("long")).drop(
        _BKT, _LOCAL, _OFF, _OPID, _OGRP
    )


def grouped_row_number(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[Column | str],
    *,
    out_col: str = "row_number",
    num_partitions: int = 32,
) -> DataFrame:
    """Per-group 1-based row number — the distributed twin of
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY ...)`` — without
    ever funneling a whole group through one reducer.

    A row number is the inclusive prefix sum of ones, so this simply
    rides :func:`grouped_prefix_sum` (same range-partitioned two-pass
    decomposition, same skew story: a dominant group spans several
    contiguous range partitions instead of pinning one task).

    With tie-free ``order_cols`` (a trailing unique id) the result
    also EQUALS ``rank`` and ``dense_rank`` over the same window —
    peers don't exist — which is how the rank-function family
    (percent_rank, cume_dist, ntile) becomes derivable from this
    number plus a broadcast per-group total: see
    ``queries/relational2.py::q39_rank_functions``.
    """
    ones = df.withColumn(_ONE, F.lit(1).cast("long"))
    return grouped_prefix_sum(
        ones,
        group_col,
        order_cols,
        _ONE,
        out_col=out_col,
        inclusive=True,
        num_partitions=num_partitions,
    ).drop(_ONE)


def lsn_gap_audit(
    df: DataFrame,
    lsn_col: str,
    *,
    partition_col: str | None = None,
    block_size: int = 8192,
) -> DataFrame:
    """Holes in a dense id sequence, found without a global sort.

    With ``partition_col`` (a Kafka-partition / slot-shard id whose
    offsets are independently dense — the multi-source deployment),
    the lag simply runs per source partition. Without it, the id
    space is cut into fixed ``block_size`` blocks: adjacent-row gaps
    are found WITHIN each block (partitioned window), and gaps that
    span block boundaries — including wholly missing blocks — fall
    out of the per-block min/max aggregate, whose unpartitioned lag
    window runs over id_range/block_size rows, not data rows.

    Returns one row per gap: ``gap_after`` (last id seen), resume id,
    and the count of missing ids between them.
    """
    lsn = F.col(lsn_col)
    if partition_col is not None:
        w = Window.partitionBy(partition_col).orderBy(lsn_col)
        return (
            df.withColumn("__prev", F.lag(lsn_col).over(w))
            .where(lsn - F.col("__prev") > 1)
            .select(
                F.col(partition_col),
                F.col("__prev").alias("gap_after"),
                lsn.alias("resume_at"),
                (lsn - F.col("__prev") - 1).alias("n_missing"),
            )
        )

    blk = df.withColumn("__blk", F.floor(lsn / block_size))
    w_in = Window.partitionBy("__blk").orderBy(lsn_col)
    within = (
        blk.withColumn("__prev", F.lag(lsn_col).over(w_in))
        .where(lsn - F.col("__prev") > 1)
        .select(
            F.col("__prev").alias("gap_after"),
            lsn.alias("resume_at"),
            (lsn - F.col("__prev") - 1).alias("n_missing"),
        )
    )
    bounds = blk.groupBy("__blk").agg(
        F.min(lsn_col).alias("__lo"), F.max(lsn_col).alias("__hi")
    )
    # unpartitioned lag over the per-block AGGREGATE (tiny), not data
    w_blk = Window.orderBy("__blk")
    across = (
        bounds.withColumn("__prev_hi", F.lag("__hi").over(w_blk))
        .where(F.col("__lo") - F.col("__prev_hi") > 1)
        .select(
            F.col("__prev_hi").alias("gap_after"),
            F.col("__lo").alias("resume_at"),
            (F.col("__lo") - F.col("__prev_hi") - 1).alias("n_missing"),
        )
    )
    return within.unionByName(across)
