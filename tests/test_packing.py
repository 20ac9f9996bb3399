from __future__ import annotations

from pyspark.sql import functions as F

from cdc_spark.operators.packing import pack_sequences, packing_efficiency


def _sized(spark, n=500, seed_mod=97):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * seed_mod % 300 + 1).alias("n_tokens"),
    )


def test_every_doc_packed_exactly_once(spark):
    df = _sized(spark)
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=512, n_groups=4)
    ids = [r.doc_id for r in packed.select("doc_id").collect()]
    assert sorted(ids) == list(range(500))


def test_budget_respected_except_oversize_singletons(spark):
    df = _sized(spark)
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=512, n_groups=4)
    bins = packed.groupBy("pack_group", "bin_idx").agg(
        F.sum("n_tokens").alias("s"),
        F.count("*").alias("n"),
        F.first("bin_fill").alias("fill"),
    )
    bad = bins.where((F.col("s") > 512) & (F.col("n") > 1)).count()
    assert bad == 0
    # bin_fill column agrees with the recomputed per-bin sum
    assert bins.where(F.col("s") != F.col("fill")).count() == 0


def test_oversize_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 9999), (3, 100)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=512, n_groups=1)
    rows = {r.doc_id: r for r in packed.collect()}
    assert rows[2].pos_in_bin == 0
    others = {rows[1].bin_idx, rows[3].bin_idx}
    assert rows[2].bin_idx not in others


def test_packing_deterministic_under_repartition(spark):
    df = _sized(spark)
    a = pack_sequences(df, "doc_id", "n_tokens", budget=512, n_groups=4)
    b = pack_sequences(
        df.repartition(13), "doc_id", "n_tokens", budget=512, n_groups=4
    )
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb


def test_packing_efficiency_accounting(spark):
    df = _sized(spark)
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=512, n_groups=4)
    eff = packing_efficiency(packed, budget=512)
    rows = eff.collect()
    total = sum(r.total_tokens for r in rows)
    assert total == df.agg(F.sum("n_tokens")).first()[0]
    assert all(0 < r.fill_ratio <= 1.0 for r in rows)
    # next-fit on many small docs should not be pathologically wasteful
    assert sum(r.total_tokens for r in rows) / (
        sum(r.n_bins for r in rows) * 512
    ) > 0.6


def test_concat_chunk_contiguous_offsets(spark):
    from cdc_spark.operators.packing import concat_chunk_plan

    out = concat_chunk_plan(
        _sized(spark), "doc_id", "n_tokens", budget=128, n_groups=4
    ).collect()
    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r.pack_group, []).append(r)
    assert set(by_group) == {0, 1, 2, 3}
    for g, rows in by_group.items():
        rows.sort(key=lambda r: r.doc_id)
        expect = 0
        for r in rows:
            assert r.pack_group == r.doc_id % 4
            assert r.start_offset == expect, (g, r)
            expect += r.n_tokens
            assert r.first_bin == r.start_offset // 128
            last_tok = r.start_offset + max(r.n_tokens, 1) - 1
            assert r.last_bin == last_tok // 128
            assert r.n_windows == r.last_bin - r.first_bin + 1 >= 1


def test_concat_chunk_zero_token_doc_pinned(spark):
    from pyspark.sql import functions as F
    from cdc_spark.operators.packing import concat_chunk_plan

    df = spark.createDataFrame(
        [(0, 100), (4, 0), (8, 50)], "doc_id long, n_tokens long"
    )
    rows = {
        r.doc_id: r
        for r in concat_chunk_plan(
            df, "doc_id", "n_tokens", budget=64, n_groups=4
        ).collect()
    }
    # all three share group 0; the empty doc occupies no tokens and
    # stays pinned to the window at its offset
    assert rows[4].start_offset == 100
    assert rows[4].first_bin == rows[4].last_bin == 100 // 64
    assert rows[4].n_windows == 1
    assert rows[8].start_offset == 100
