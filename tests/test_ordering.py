"""Distributed total-order primitives vs their single-reducer twins.

operators/ordering.py exists so no corpus-sized input ever flows
through an unpartitioned window (the guardrail in
test_plan_guardrails.py bans that shape); these tests pin the
bit-equality claim: the two-pass decompositions produce EXACTLY the
rows a global window would.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_spark.operators.ordering import (
    distributed_prefix_min,
    distributed_prefix_sum,
    distributed_row_number,
    grouped_prefix_sum,
    grouped_row_number,
    lsn_gap_audit,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(
            "doc_id", F.md5(F.col("doc_id").cast("string")).alias("k")
        )
    )


def test_row_number_matches_global_window(spark):
    docs = _docs(spark)
    got = {
        (r.doc_id, r.position)
        for r in distributed_row_number(
            docs, [F.asc("k"), F.asc("doc_id")], num_partitions=7
        ).collect()
    }
    w = Window.orderBy("k", "doc_id")
    want = {
        (r.doc_id, r.position)
        for r in docs.select(
            "doc_id", F.row_number().over(w).cast("long").alias("position")
        ).collect()
    }
    assert got == want


def test_prefix_sum_matches_global_window(spark):
    docs = _docs(spark).withColumn(
        "n", (F.col("doc_id") % 13 + 1).cast("long")
    )
    got = {
        (r.doc_id, r.ps)
        for r in distributed_prefix_sum(
            docs,
            ["k", "doc_id"],
            "n",
            out_col="ps",
            inclusive=False,
            num_partitions=7,
        ).collect()
    }
    w = (
        Window.orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.doc_id, r.ps)
        for r in docs.select(
            "doc_id",
            (F.sum("n").over(w) - F.col("n")).cast("long").alias("ps"),
        ).collect()
    }
    assert got == want


def test_grouped_prefix_sum_matches_per_group_window(spark):
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(
            "doc_id",
            "source",
            F.md5(F.col("doc_id").cast("string")).alias("k"),
            (F.col("doc_id") % 17 + 1).cast("long").alias("n"),
        )
    )
    got = {
        (r.doc_id, r.ps)
        for r in grouped_prefix_sum(
            docs,
            "source",
            ["k", "doc_id"],
            "n",
            out_col="ps",
            inclusive=False,
            num_partitions=7,
        ).collect()
    }
    w = (
        Window.partitionBy("source")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.doc_id, r.ps)
        for r in docs.select(
            "doc_id",
            (F.sum("n").over(w) - F.col("n")).cast("long").alias("ps"),
        ).collect()
    }
    assert got == want


def test_row_number_is_dense_and_total(spark):
    docs = _docs(spark)
    out = distributed_row_number(
        docs, [F.asc("k"), F.asc("doc_id")], num_partitions=5
    )
    n = out.count()
    stats = out.agg(
        F.min("position").alias("lo"),
        F.max("position").alias("hi"),
        F.countDistinct("position").alias("d"),
    ).first()
    assert (stats.lo, stats.hi, stats.d) == (1, n, n)


def _gaps(df):
    return {
        (r.gap_after, r.resume_at, r.n_missing) for r in df.collect()
    }


def test_gap_audit_within_and_across_blocks(spark):
    present = [
        i
        for i in range(100)
        if i not in {10, 55, 56} and not (48 <= i < 64)
    ]
    df = spark.createDataFrame([(i,) for i in present], "lsn long")
    # block_size=16: block 3 (48..63) vanishes ENTIRELY (the
    # wholly-missing-block case only the per-block min/max aggregate
    # can see); 10 is interior; 55/56 are gone with their block
    got = _gaps(lsn_gap_audit(df, "lsn", block_size=16))
    want = set()
    for prev, cur in zip(present, present[1:]):
        if cur - prev > 1:
            want.add((prev, cur, cur - prev - 1))
    assert got == want


def test_gap_audit_per_partition_col(spark):
    rows = [("a", i) for i in range(20) if i != 7] + [
        ("b", i) for i in range(20) if i not in {3, 4}
    ]
    df = spark.createDataFrame(rows, "src string, lsn long")
    got = {
        (r.src, r.gap_after, r.resume_at, r.n_missing)
        for r in lsn_gap_audit(
            df, "lsn", partition_col="src"
        ).collect()
    }
    assert got == {("a", 6, 8, 1), ("b", 2, 5, 2)}


# --- property tests: the two-pass decompositions vs the single-window
# truth on arbitrary (possibly skewed, duplicate-laden) inputs -------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_vals = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),  # sort key (dups ok)
        st.integers(min_value=0, max_value=50),        # value
    ),
    min_size=1,
    max_size=120,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_vals)
def test_prefix_sum_property(spark, rows):
    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "uid long, k long, v long")
    got = {
        r.uid: r.ps
        for r in distributed_prefix_sum(
            df, ["k", "uid"], "v", out_col="ps", num_partitions=4
        ).collect()
    }
    ordered = sorted(data, key=lambda t: (t[1], t[0]))
    run, want = 0, {}
    for uid, _, v in ordered:
        run += v
        want[uid] = run
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_vals)
def test_row_number_property(spark, rows):
    data = [(i, k) for i, (k, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "uid long, k long")
    got = {
        r.uid: r.position
        for r in distributed_row_number(
            df, [F.desc("k"), F.asc("uid")], num_partitions=4
        ).collect()
    }
    ordered = sorted(data, key=lambda t: (-t[1], t[0]))
    want = {uid: i + 1 for i, (uid, _) in enumerate(ordered)}
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_vals)
def test_prefix_min_exclusive_property(spark, rows):
    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "uid long, k long, v long")
    got = {
        r.uid: r.pm
        for r in distributed_prefix_min(
            df,
            ["k", "uid"],
            "v",
            out_col="pm",
            inclusive=False,
            num_partitions=4,
        ).collect()
    }
    ordered = sorted(data, key=lambda t: (t[1], t[0]))
    want, best = {}, None
    for uid, _, v in ordered:
        want[uid] = best
        best = v if best is None else min(best, v)
    assert got == want


_grouped_vals = st.lists(
    st.tuples(
        # group id drawn so one group (0) dominates ~90% of rows —
        # the adversarial-skew shape Window.partitionBy degenerates on
        st.sampled_from([0] * 9 + [1, 2]),
        st.integers(min_value=-1000, max_value=1000),  # sort key
        st.integers(min_value=0, max_value=50),        # value
    ),
    min_size=1,
    max_size=120,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_grouped_vals)
def test_grouped_prefix_sum_property(spark, rows):
    data = [(i, g, k, v) for i, (g, k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "uid long, g long, k long, v long")
    got = {
        r.uid: r.ps
        for r in grouped_prefix_sum(
            df, "g", ["k", "uid"], "v", out_col="ps", num_partitions=4
        ).collect()
    }
    want = {}
    run = {}
    for uid, g, _, v in sorted(data, key=lambda t: (t[1], t[2], t[0])):
        run[g] = run.get(g, 0) + v
        want[uid] = run[g]
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_grouped_vals)
def test_grouped_row_number_property(spark, rows):
    data = [(i, g, k) for i, (g, k, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "uid long, g long, k long")
    got = {
        r.uid: r.rn
        for r in grouped_row_number(
            df, "g", [F.desc("k"), F.asc("uid")],
            out_col="rn", num_partitions=4,
        ).collect()
    }
    want, seen = {}, {}
    for uid, g, _ in sorted(data, key=lambda t: (t[1], -t[2], t[0])):
        seen[g] = seen.get(g, 0) + 1
        want[uid] = seen[g]
    assert got == want


def test_grouped_row_number_null_group(spark):
    """The offsets join is eqNullSafe on the group key: a NULL group
    must behave as one regular group (Window.partitionBy semantics),
    not silently drop its rows (the round-7 ADVICE finding)."""
    data = [(i, None if i % 3 == 0 else i % 2, i * 7 % 50)
            for i in range(40)]
    df = spark.createDataFrame(data, "uid long, g int, k long")
    out = grouped_row_number(
        df, "g", ["k", "uid"], out_col="rn", num_partitions=4
    )
    rows = out.collect()
    assert len(rows) == 40, "NULL-group rows must not be dropped"
    w = Window.partitionBy("g").orderBy("k", "uid")
    want = {
        r.uid: r.rn
        for r in df.select(
            "uid", F.row_number().over(w).cast("long").alias("rn")
        ).collect()
    }
    assert {r.uid: r.rn for r in rows} == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_grouped_vals)
def test_rank_family_arithmetic_property(spark, rows):
    """q39's derivation — rank family from grouped row number +
    per-group totals — vs the plain-window truth on arbitrary skewed
    inputs (hypothesis twin of the fixed-data q39 test below).
    With the unique-uid tiebreak every row is its own peer group, so
    dense_rank == rn; ntile/percent_rank/cume_dist are the integer
    arithmetic the query uses."""
    data = [(i, g, k) for i, (g, k, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "uid long, g long, k long")
    ranked = grouped_row_number(
        df, "g", [F.desc("k"), F.asc("uid")], out_col="rn",
        num_partitions=4,
    )
    totals = df.groupBy("g").agg(F.count("*").alias("n"))
    rn, n = F.col("rn"), F.col("n")
    q, r = F.floor(n / 4), n % 4
    big = r * (q + 1)
    tile = F.when(rn <= big, F.ceil(rn / (q + 1))).otherwise(
        r + F.ceil((rn - big) / F.greatest(q, F.lit(1)))
    )
    prank = F.when(n == 1, F.lit(0.0)).otherwise(
        F.round((rn - 1) / (n - 1), 6)
    )
    got = {
        row.uid: (row.drank, row.quartile, row.prank, row.cdist)
        for row in ranked.join(F.broadcast(totals), "g")
        .select(
            "uid",
            rn.cast("int").alias("drank"),
            tile.cast("int").alias("quartile"),
            prank.alias("prank"),
            F.round(rn / n, 6).alias("cdist"),
        )
        .collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("k"), F.asc("uid"))
    want = {
        row.uid: (row.drank, row.quartile, row.prank, row.cdist)
        for row in df.select(
            "uid",
            F.dense_rank().over(w).alias("drank"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("prank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        ).collect()
    }
    assert got == want


def test_q39_rank_family_matches_plain_window(spark):
    """q39's derived rank family (dense_rank/ntile/percent_rank/
    cume_dist from grouped_row_number + broadcast totals) must equal
    the plain partitioned-window truth bit-for-bit."""
    from cdc_spark.queries.relational2 import q39_rank_functions

    sf = "/root/testdata/sf0.001"
    got = {
        r.o_orderkey: (r.drank, r.quartile, r.prank, r.cdist)
        for r in q39_rank_functions(spark, sf).collect()
    }
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    want = {
        r.o_orderkey: (r.drank, r.quartile, r.prank, r.cdist)
        for r in orders.select(
            "o_orderkey",
            F.dense_rank().over(w).alias("drank"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("prank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        ).collect()
    }
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    present=st.sets(
        st.integers(min_value=0, max_value=400), min_size=2, max_size=120
    )
)
def test_gap_audit_property(spark, present):
    df = spark.createDataFrame([(i,) for i in sorted(present)], "lsn long")
    got = _gaps(lsn_gap_audit(df, "lsn", block_size=16))
    seq = sorted(present)
    want = {
        (a, b, b - a - 1)
        for a, b in zip(seq, seq[1:])
        if b - a > 1
    }
    assert got == want


def test_row_number_correct_under_asymmetric_pruning(spark):
    """Regression (round 7): repartitionByRange samples its boundaries
    with an RDD-id-derived seed, so two evaluations of the same lazy
    subtree can land rows in DIFFERENT partitions. When an extra
    column lets Catalyst prune the offsets subtree differently from
    the data subtree, exchange reuse no longer pins them together —
    without the layout checkpoint, ~90% of ranks silently corrupted
    on exactly this shape (an extra carried column + composition)."""
    ev = spark.read.parquet(
        "/root/testdata/sf0.01/events.parquet"
    ).select(
        F.col("event_id").alias("lsn"),
        (
            F.col("event_id") + (F.col("event_id") * 37 % 16) - 8
        ).alias("arrival_key"),
    )
    truth1 = {
        r.lsn: r.r
        for r in ev.select(
            "lsn",
            F.row_number()
            .over(Window.orderBy("lsn"))
            .cast("long")
            .alias("r"),
        ).collect()
    }
    truth2 = {
        r.lsn: r.r
        for r in ev.select(
            "lsn",
            F.row_number()
            .over(Window.orderBy("arrival_key", "lsn"))
            .cast("long")
            .alias("r"),
        ).collect()
    }
    one = distributed_row_number(ev, [F.asc("lsn")], out_col="lsn_rank")
    both = distributed_row_number(
        one, [F.asc("arrival_key"), F.asc("lsn")], out_col="arrival_rank"
    )
    rows = both.collect()
    assert all(r.lsn_rank == truth1[r.lsn] for r in rows)
    assert all(r.arrival_rank == truth2[r.lsn] for r in rows)


def test_grouped_prefix_sum_bucketed_matches_per_group_window(spark):
    """The deterministic-slice fast path must be bit-identical to the
    per-group window — including NULL groups and both inclusive
    modes. bucket = floor(doc_id / width) is the canonical monotone
    slice id over the dense-id order column."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.lit(None)).otherwise(
            F.col("source")
        ).alias("source"),
        (F.col("doc_id") % 17 + 1).cast("long").alias("n"),
    )
    bucket = F.floor(F.col("doc_id") / F.lit(37))
    for inclusive in (True, False):
        got = {
            (r.doc_id, r.ps)
            for r in grouped_prefix_sum(
                docs,
                "source",
                ["doc_id"],
                "n",
                out_col="ps",
                inclusive=inclusive,
                bucket=bucket,
            ).collect()
        }
        w = (
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        expr = F.sum("n").over(w)
        if not inclusive:
            expr = expr - F.col("n")
        want = {
            (r.doc_id, r.ps)
            for r in docs.select(
                "doc_id", expr.cast("long").alias("ps")
            ).collect()
        }
        assert got == want, f"inclusive={inclusive}"


def test_grouped_prefix_sum_bucketed_null_bucket_rows_survive(spark):
    """A bucket expression that evaluates NULL for some rows (e.g. a
    null order column feeding floor()) must not silently drop those
    rows: the offset join is eqNullSafe on the bucket key, and null
    buckets sort before every real bucket (Spark ASC NULLS FIRST) —
    matching the window's own NULLS FIRST order over the same column."""
    rows = [
        ("a", None, 10),
        ("a", 1, 1),
        ("a", 2, 2),
        ("b", None, 5),
        ("b", 3, 7),
    ]
    df = spark.createDataFrame(rows, "g string, k int, n long")
    bucket = F.floor(F.col("k") / F.lit(2))  # NULL k -> NULL bucket
    got = {
        (r.g, r.k, r.ps)
        for r in grouped_prefix_sum(
            df, "g", [F.asc_nulls_first("k")], "n",
            out_col="ps", bucket=bucket,
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy(F.asc_nulls_first("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.g, r.k, r.ps)
        for r in df.select(
            "g", "k", F.sum("n").over(w).cast("long").alias("ps")
        ).collect()
    }
    assert got == want
    assert len(got) == len(rows)  # no row silently dropped


def test_grouped_prefix_sum_bucketed_safe_under_asymmetric_pruning(spark):
    """The round-7 resample trap cannot occur on the bucket path: the
    slice id is a pure row expression, so even when the two consumers
    of the local frame are planned as separate exchanges (asymmetric
    pruning), both compute the same row→slice assignment. Composition
    with an extra carried column — the exact shape that corrupted the
    pid path without its checkpoint — must stay exact, with NO
    checkpoint in the bucketed plan."""
    ev = spark.read.parquet(f"{SF_SMOKE}/../sf0.01/events.parquet").select(
        F.col("event_id").alias("eid"),
        (F.col("user_id") % 5).cast("int").alias("g"),
        (F.col("event_id") % 13 + 1).cast("long").alias("n"),
        (F.col("event_id") * 37 % 1000).alias("carried"),
    )
    bucket = F.floor(F.col("eid") / F.lit(211))
    one = grouped_prefix_sum(
        ev, "g", ["eid"], "n", out_col="ps1", bucket=bucket
    )
    # second pass composes on the first's output AND carries an extra
    # column only one consumer needs (asymmetric pruning bait)
    two = grouped_prefix_sum(
        one.withColumn("m", F.col("ps1") % 7 + 1),
        "g",
        ["eid"],
        "m",
        out_col="ps2",
        bucket=bucket,
    )
    w = (
        Window.partitionBy("g")
        .orderBy("eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.eid, r.ps1, r.ps2)
        for r in ev.select(
            "eid",
            F.sum("n").over(w).cast("long").alias("ps1"),
            F.sum(
                (F.sum("n").over(w) % 7 + 1)
            ).over(w).cast("long").alias("ps2"),
        ).collect()
    }
    got = {(r.eid, r.ps1, r.ps2) for r in two.select("eid", "ps1", "ps2").collect()}
    assert got == want
    # and the plan really is checkpoint-free (no opaque ExistingRDD)
    plan = two._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan


def test_ungrouped_bucketed_row_number_and_prefix_sum(spark):
    """Round 10: the deterministic-slice bucket mode on the UNGROUPED
    primitives (dp05/mm05's md5-hex-prefix slices) must be
    bit-identical to the global window — including a banded DESC
    order whose bucket is (9-band)*cells + hex prefix."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id",
        (F.col("doc_id") % 10).cast("long").alias("band"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
        (F.col("doc_id") % 13 + 1).cast("long").alias("n"),
    )
    order = [F.desc("band"), F.asc("k"), F.asc("doc_id")]
    bucket = (F.lit(9) - F.col("band")) * 256 + F.conv(
        F.substring("k", 1, 2), 16, 10
    ).cast("long")
    got_rn = {
        (r.doc_id, r.pos)
        for r in distributed_row_number(
            docs, order, out_col="pos", bucket=bucket
        ).collect()
    }
    w = Window.orderBy(*order)
    want_rn = {
        (r.doc_id, r.pos)
        for r in docs.select(
            "doc_id",
            F.row_number().over(w).cast("long").alias("pos"),
        ).collect()
    }
    assert got_rn == want_rn

    for inclusive in (True, False):
        got_ps = {
            (r.doc_id, r.ps)
            for r in distributed_prefix_sum(
                docs, [F.asc("k"), F.asc("doc_id")], "n",
                out_col="ps", inclusive=inclusive,
                bucket=F.conv(F.substring("k", 1, 2), 16, 10).cast("long"),
            ).collect()
        }
        wf = (
            Window.orderBy(F.asc("k"), F.asc("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        expr = F.sum("n").over(wf)
        if not inclusive:
            expr = expr - F.col("n")
        want_ps = {
            (r.doc_id, r.ps)
            for r in docs.select(
                "doc_id", expr.cast("long").alias("ps")
            ).collect()
        }
        assert got_ps == want_ps, f"inclusive={inclusive}"
