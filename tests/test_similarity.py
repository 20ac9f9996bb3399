"""Similarity search: brute-force correctness + ANN recall."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.operators.similarity import (
    ann_lsh_topk,
    cosine,
    cosine_topk,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def _qvec(emb, vec_id=0):
    return emb.where(F.col("vec_id") == vec_id).first().embedding


def test_cosine_expression_matches_python(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 1.0]), (2, [0.5, 0.5, 0.0])],
        "id long, v array<double>",
    )
    out = df.select(cosine(F.col("v"), F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0))).alias("c")).collect()
    assert abs(out[0].c - 1.0 / math.sqrt(2)) < 1e-12
    assert abs(out[1].c - 0.5 / math.sqrt(0.5)) < 1e-12


def test_lsh_bucket_bit_identical_to_python_fold(spark, emb):
    """lsh_bucket ships its planes as one parsed SQL literal (round
    11); signatures must stay bit-identical to the reference per-plane
    form: a sequential-fold dot per plane, bit i = sign(dot) >= 0.
    Real corpus vectors so denormal/rounding paths are exercised."""
    from cdc_spark.operators.similarity import hyperplanes, lsh_bucket

    planes = hyperplanes(64, 9, 11)
    rows = emb.limit(200).select("vec_id", "embedding").collect()
    got = {
        r.vec_id: r.b
        for r in emb.limit(200)
        .select("vec_id", lsh_bucket(F.col("embedding"), planes).alias("b"))
        .collect()
    }

    def pydot(v, p):
        acc = 0.0
        for x, y in zip(v, p):
            acc = acc + float(x) * y
        return acc

    for r in rows:
        expect = sum(
            1 << i
            for i, pl in enumerate(planes)
            if pydot(r.embedding, pl) >= 0
        )
        assert got[r.vec_id] == expect, r.vec_id


def test_topk_self_is_first(spark, emb):
    q = _qvec(emb, 0)
    rows = cosine_topk(emb, "embedding", "vec_id", q, k=5).collect()
    assert rows[0].vec_id == 0
    assert abs(rows[0].cosine_sim - 1.0) < 1e-6
    sims = [r.cosine_sim for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_ann_recall_vs_bruteforce(spark, emb):
    """multiprobe LSH(8 planes) top-10 should recover most of the true
    top-10 for a batch of query points."""
    hits = total = 0
    for qid in [0, 1, 2, 3, 4]:
        q = _qvec(emb, qid)
        exact = {
            r.vec_id
            for r in cosine_topk(emb, "embedding", "vec_id", q, k=10).collect()
        }
        approx = {
            r.vec_id
            for r in ann_lsh_topk(
                emb, "embedding", "vec_id", q, k=10
            ).collect()
        }
        hits += len(exact & approx)
        total += len(exact)
    recall = hits / total
    assert recall >= 0.5, f"ANN recall too low: {recall:.2f}"


def test_near_dup_pairs_symmetric_threshold(spark, emb):
    pairs = embedding_near_dup_pairs(
        emb, "embedding", "vec_id", threshold=0.4
    ).collect()
    assert pairs
    for r in pairs:
        assert r.id_a < r.id_b
        assert r.cosine_sim >= 0.4


def test_lsh_near_dup_subset_of_exact(spark, emb):
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            emb, "embedding", "vec_id", threshold=0.4
        ).collect()
    }
    # dd05's gated parameters: L=14 tables x 4 planes → theoretical
    # recall 1-(1-p^4)^14 ≈ 0.91 at the 0.4-cosine boundary; the seeded
    # planes make the measured value deterministic on fixed data.
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_lsh(
            emb, "embedding", "vec_id", dim=64, threshold=0.4, n_tables=14
        ).collect()
    }
    assert lsh <= exact
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"bucketed near-dup recall too low: {recall:.2f}"


def test_int8_quantization_bounds_and_recall(spark, emb):
    from pyspark.sql import functions as F

    from cdc_spark.operators.similarity import (
        cosine,
        int8_dequantize,
        int8_quantize,
        int8_scale,
        quantization_report,
    )

    rep = quantization_report(emb, "embedding", "vec_id")
    rows = rep.collect()
    # worst element error of symmetric int8 is scale/2
    assert all(r.max_abs_err <= r.scale / 2 + 1e-9 for r in rows)
    assert all(r.cos_recon >= 0.999 for r in rows)

    # codes stay inside int8 without clamping
    v = F.col("embedding")
    s = int8_scale(v)
    codes = emb.select(
        F.array_max(int8_quantize(v, s)).alias("mx"),
        F.array_min(int8_quantize(v, s)).alias("mn"),
    )
    agg = codes.agg(F.max("mx"), F.min("mn")).first()
    assert agg[0] <= 127 and agg[1] >= -127

    # top-20 by cosine over dequantized vectors ≈ exact top-20
    deq = emb.select(
        "vec_id", int8_dequantize(int8_quantize(v, s), s).alias("embedding")
    )
    qrow = emb.where(F.col("vec_id") == 0).first().embedding
    qlit = F.array(*[F.lit(float(x)) for x in qrow])
    def topk(df):
        return {
            r.vec_id
            for r in df.select(
                "vec_id", cosine(F.col("embedding"), qlit).alias("c")
            ).orderBy(F.desc("c"), F.asc("vec_id")).limit(20).collect()
        }
    exact, quant = topk(emb), topk(deq)
    recall = len(exact & quant) / 20
    assert recall >= 0.9, f"int8 top-k recall too low: {recall}"


def test_batch_topk_join_variant_is_bhj_and_matches_literal(spark, emb):
    from pyspark.sql import functions as F

    from cdc_spark.operators.similarity import (
        batch_cosine_topk,
        batch_cosine_topk_literal,
    )

    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    joined = batch_cosine_topk(emb, "embedding", "vec_id", queries, k=3)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan

    probes = [
        (r.q_id, r.q_emb) for r in queries.collect()
    ]
    lit = batch_cosine_topk_literal(emb, "embedding", "vec_id", probes, k=3)
    a = sorted((r.q_id, r.vec_id, r.sim) for r in joined.collect())
    b = sorted((r.q_id, r.vec_id, r.sim) for r in lit.collect())
    assert a == b


def test_semantic_dedup_planes_sizing():
    """2^planes cells track ~n/target so within-cluster pairwise work
    stays linear; bounded at [lo, hi]; tiny corpora keep the floor."""
    from cdc_spark.operators.similarity import semantic_dedup_planes

    assert semantic_dedup_planes(0) == 4
    assert semantic_dedup_planes(125) == 4
    assert semantic_dedup_planes(2_000) == 4       # 2^4=16 cells ~ n/125
    assert semantic_dedup_planes(20_000) == 8      # the sf1 probe point
    assert semantic_dedup_planes(2_000_000) == 14
    assert semantic_dedup_planes(10**12) == 24     # hi clamp
    # monotone non-decreasing in n
    last = 0
    for n in (1, 10, 10**3, 10**5, 10**7, 10**9):
        p = semantic_dedup_planes(n)
        assert p >= last
        last = p


def test_hyperplanes_prefix_stable():
    """The dd12 sized oracle embeds hyperplanes(dim, hi, seed) and
    gates terms by index, relying on the generator being a sequential
    draw from one seeded RNG: the first k planes of an hi-plane draw
    must equal the k-plane draw the engine uses."""
    from cdc_spark.operators.similarity import hyperplanes

    full = hyperplanes(64, 24, 11)
    for k in (1, 4, 8):
        assert hyperplanes(64, k, 11) == full[:k]


def test_semantic_dedup_planes_matches_sql_clamp():
    """The dd12 oracle recomputes the plane count in DuckDB as
    GREATEST(lo, LEAST(hi, CEIL(LOG2(n/target)))) — assert the SQL
    arithmetic agrees with the Python function across magnitudes
    including exact power-of-two ratios (the only values where a
    log2 ulp could flip CEIL)."""
    import duckdb

    from cdc_spark.operators.similarity import semantic_dedup_planes

    for n in (1, 125, 126, 250, 500, 2_000, 16_000, 20_000,
              125 * 2**10, 125 * 2**10 + 1, 10**9):
        sql = duckdb.sql(
            f"SELECT GREATEST(4, LEAST(24, "
            f"CAST(CEIL(LOG2({n} / 125.0)) AS INT)))"
        ).fetchone()[0]
        assert sql == semantic_dedup_planes(n), n


def test_ivf_sized_nlist_matches_sql_clamp():
    """ss24's oracle recomputes nlist in DuckDB as
    POWER(2, CEIL(LOG2(SQRT(n)))) clamped — assert the SQL arithmetic
    agrees with the Python function across magnitudes including exact
    powers of 4 (the only values where a log2 ulp could flip CEIL)."""
    import duckdb

    from cdc_spark.operators.ivf import ivf_sized_nlist

    for n in (1, 256, 257, 500, 2_000, 20_000, 4**6, 4**6 + 1,
              4**10, 10**9):
        sql = duckdb.sql(
            f"SELECT CASE WHEN {n} <= 256 THEN 16 ELSE "
            f"GREATEST(16, LEAST(4096, CAST(POWER(2, "
            f"CEIL(LOG2(SQRT({n})))) AS INT))) END"
        ).fetchone()[0]
        assert sql == ivf_sized_nlist(n), n
    # monotone non-decreasing, plausible values at the gate SFs
    assert ivf_sized_nlist(500) == 32
    assert ivf_sized_nlist(2_000) == 64
    assert ivf_sized_nlist(20_000) == 256


def test_dd20_clamp_hi16_matches_sql():
    """dd20 clamps at hi=16 (the oracle's embedded-literal budget) —
    assert the SQL arithmetic agrees with semantic_dedup_planes(hi=16)
    across magnitudes including the hi-saturation region."""
    import duckdb

    from cdc_spark.operators.similarity import semantic_dedup_planes

    for n in (1, 125, 525, 2_100, 21_000, 125 * 2**16,
              125 * 2**16 + 1, 10**9):
        sql = duckdb.sql(
            f"SELECT GREATEST(4, LEAST(16, "
            f"CAST(CEIL(LOG2({n} / 125.0)) AS INT)))"
        ).fetchone()[0]
        assert sql == semantic_dedup_planes(n, hi=16), n


def test_dd20_production_neardup_recall(spark):
    """dd20's sized multi-table LSH must capture >= 0.9 of the exact
    0.85-threshold pairs on its injected-re-crawl corpus, and emit
    nothing the exact baseline does not (candidates are verified by
    exact cosine, so false positives are impossible by construction)."""
    from cdc_spark.operators.similarity import embedding_near_dup_pairs
    from cdc_spark.queries.dedup_queries import dd20_production_neardup

    sf = "/root/testdata/sf0.01"
    got = {
        (r.id_a, r.id_b)
        for r in dd20_production_neardup(spark, sf).collect()
    }
    # rebuild the same corpus for the exact baseline
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    recrawl = emb.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(
                i % 5 == 0, F.lit(0.0).cast("float")
            ).otherwise(x),
        ).alias("embedding"),
    )
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            emb.unionByName(recrawl), "embedding", "vec_id", threshold=0.85
        ).collect()
    }
    assert got <= exact
    assert exact, "injection produced no 0.85 pairs — corpus drifted"
    assert len(got) / len(exact) >= 0.9


def test_tables_for_planes_algebra():
    """L = ceil(ln(1-R)/ln(1-p^k)) at the production threshold: pin
    the branch values every gated SF reaches (and the note's 10^9
    figure via the unclamped formula), plus clamps and monotonicity —
    the oracle CASE is generated from this same function, so these
    pins ARE the cross-engine contract."""
    import math

    from cdc_spark.operators.similarity import (
        semantic_dedup_tables,
        tables_for_planes,
    )

    assert tables_for_planes(4) == 7    # sf0.001 / sf0.01 (corpus 525)
    assert tables_for_planes(5) == 9    # sf0.1 (corpus 2100)
    assert tables_for_planes(8) == 17   # sf1 (corpus 21000)
    assert tables_for_planes(11) == 32  # sf10 (corpus 210000)
    # hi clamp binds from k=13 (corpus > 125*2^12 ~ 0.5M vectors)
    assert tables_for_planes(12) == 39
    assert tables_for_planes(13) == 40
    assert tables_for_planes(16) == 40
    # the note's ~86 tables at 10^9 vectors: at that corpus the plane
    # clamp pins k=16, where the unclamped formula needs L=86 (the
    # oracle-parity hi=40 clamp binds before that — documented)
    p = 1.0 - math.acos(0.85) / math.pi
    assert math.ceil(math.log(0.02) / math.log(1.0 - p**16)) == 86
    # monotone in k, and the count-driven composite hits the branches
    ls = [tables_for_planes(k) for k in range(4, 17)]
    assert ls == sorted(ls)
    assert semantic_dedup_tables(525) == 7
    assert semantic_dedup_tables(2_100) == 9
    assert semantic_dedup_tables(21_000) == 17
    assert semantic_dedup_tables(210_000) == 32


def test_neardup_tables_case_matches_python():
    """The oracle's planes->(tables, radius) CASEs must be the
    literal image of multiprobe_for_planes over every reachable k —
    evaluate the generated SQL fragment in DuckDB for each branch and
    compare."""
    import duckdb

    from cdc_spark.operators.similarity import multiprobe_for_planes
    from cdc_spark.queries.dedup_queries import (
        _NEARDUP_PLANE_HI,
        _NEARDUP_PLANE_LO,
        _NEARDUP_RADIUS_HI,
        _NEARDUP_TABLE_HI,
        _NEARDUP_TABLE_LO,
        _neardup_sizing_sql,
    )

    sizing = _neardup_sizing_sql(
        lo=_NEARDUP_PLANE_LO, hi=_NEARDUP_PLANE_HI
    )
    for k in range(_NEARDUP_PLANE_LO, _NEARDUP_PLANE_HI + 1):
        n = 125 * 2**k  # corpus count landing exactly on branch k
        got = duckdb.sql(
            f"WITH corpus AS (SELECT 1 FROM range({n})), {sizing} "
            f"SELECT kk.planes, ll.tables, rr.radius "
            f"FROM kk CROSS JOIN ll CROSS JOIN rr"
        ).fetchone()
        assert got[0] == k
        assert (got[1], got[2]) == multiprobe_for_planes(
            k,
            table_lo=_NEARDUP_TABLE_LO,
            table_hi=_NEARDUP_TABLE_HI,
            radius_hi=_NEARDUP_RADIUS_HI,
        )


def test_multiprobe_sizing_algebra():
    """The multiprobe solver: k <= 12 branches are EXACTLY the plain
    tables_for_planes sizing (radius 0 — every previously gated SF
    unchanged); k = 13..20 switch to Hamming-1 with bounded L. Pins
    are the cross-engine contract (the oracle CASEs are generated
    from the same function)."""
    from cdc_spark.operators.similarity import (
        multiprobe_collision_prob,
        multiprobe_for_planes,
        multiprobe_sizing,
        tables_for_planes,
    )

    # continuity: radius 0 and identical L through k=12
    for k in range(4, 13):
        tables, radius = multiprobe_for_planes(k)
        assert radius == 0
        assert tables == tables_for_planes(k)
    # the multiprobe branches: r=1, L = 11..35 where r=0 needs 47..189
    expect = {
        13: 11, 14: 13, 15: 16, 16: 18, 17: 21, 18: 25, 19: 29, 20: 35,
    }
    for k, want_l in expect.items():
        tables, radius = multiprobe_for_planes(k)
        assert radius == 1, k
        assert tables == want_l, k
        assert tables <= 40
    # the count-driven composite hits the branches dd20/dd21 gate:
    # the four r=0 SFs plus the 537k-vector clamp-branch gate
    assert multiprobe_sizing(525) == (4, 7, 0)
    assert multiprobe_sizing(2_100) == (5, 9, 0)
    assert multiprobe_sizing(21_000) == (8, 17, 0)
    assert multiprobe_sizing(210_000) == (11, 32, 0)
    assert multiprobe_sizing(537_600) == (13, 11, 1)
    # collision probability reduces to p^k at radius 0
    import math

    p = 1.0 - math.acos(0.85) / math.pi
    assert abs(multiprobe_collision_prob(8, 0) - p**8) < 1e-15
    assert (
        abs(
            multiprobe_collision_prob(8, 1)
            - (p**8 + 8 * p**7 * (1 - p))
        )
        < 1e-15
    )


def test_hyperplanes_prefix_stable():
    """Raising the plane budget must not move existing planes: the
    oracle's index-gated VALUES relation and every already-gated
    branch rely on hyperplanes(dim, hi)[:k] == hyperplanes(dim, k)."""
    from cdc_spark.operators.similarity import hyperplanes

    assert hyperplanes(64, 20, 11)[:16] == hyperplanes(64, 16, 11)
    assert hyperplanes(64, 16, 2011)[:4] == hyperplanes(64, 4, 2011)


def test_lsh_multiprobe_superset_of_plain(spark, emb):
    """probe_radius=1 may only ADD candidate pairs (Hamming-1 probes
    are a superset of the home bucket), every emitted pair still
    passes the exact-cosine verify, and at a deliberately starved
    (k=6, L=2) configuration the probes find strictly more of the
    exact pair set — the recall the sizing buys on k >= 13 branches."""
    from cdc_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_lsh,
    )

    kwargs = dict(dim=64, threshold=0.4, n_tables=2, n_planes=6)
    r0 = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in embedding_near_dup_pairs_lsh(
            emb, "embedding", "vec_id", probe_radius=0, **kwargs
        ).collect()
    }
    r1 = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in embedding_near_dup_pairs_lsh(
            emb, "embedding", "vec_id", probe_radius=1, **kwargs
        ).collect()
    }
    exact = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in embedding_near_dup_pairs(
            emb, "embedding", "vec_id", threshold=0.4
        ).collect()
    }
    assert r0 <= r1 <= exact
    assert len(r1) > len(r0), "multiprobe added no candidates"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        embedding_near_dup_pairs_lsh(
            emb, "embedding", "vec_id", probe_radius=2, **kwargs
        )


def test_pair_grid_matches_naive_all_pairs(spark):
    """embedding_near_dup_pairs_grid must emit exactly the naive
    inequality-join result (same pairs, same rounded cosines) — the
    grid is a plan-shape change only."""
    from cdc_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_grid,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    naive = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in embedding_near_dup_pairs(
            emb, "embedding", "vec_id", threshold=0.2
        ).collect()
    }
    grid = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in embedding_near_dup_pairs_grid(
            emb, "embedding", "vec_id", threshold=0.2, n_blocks=8
        ).collect()
    }
    assert naive == grid
    assert naive, "threshold 0.2 found nothing — fixture drifted"


def test_dd21_recall_floor(spark):
    """The gated recall evaluation must report recall >= 0.9 (the
    verdict's floor) at the small-SF clamp branches; deeper branches
    are pinned by the sf1/sf10 gates."""
    from cdc_spark.queries.dedup_queries import (
        dd21_production_recall_eval,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        row = dd21_production_recall_eval(spark, sf).first()
        assert row["planes"] == 4 and row["tables"] == 7, sf
        assert row["radius"] == 0, sf
        assert row["n_exact"] > 0, sf
        assert row["recall"] >= 0.9, (sf, row)
        assert bool(row["recall_ok"]) is True, sf


def test_dd22_multiprobe_pin_matches_dd20(spark):
    """dd22 forces radius=1 on a branch where r=0 suffices, so the
    driver gate exercises the multiprobe plan shape (XOR-mask
    explode + id-only probe join) at every SF: the radius column is
    1, the solved table count is the radius-1 L (smaller than the
    r=0 sizing — the multiprobe storage tradeoff), and the pair set
    is a subset of dd20's with >= 0.9 measured recall (the sizing
    holds 0.98 per-pair at cosine exactly 0.85; one injected pair
    sits at 0.8509 where a miss has probability (1-q)^L ~ 0.4%, and
    this deterministic draw does miss it — exact set equality is NOT
    the contract, the recall floor is)."""
    from cdc_spark.operators.similarity import (
        multiprobe_for_planes,
        tables_for_planes,
    )
    from cdc_spark.queries.dedup_queries import (
        dd20_production_neardup,
        dd22_multiprobe_neardup,
    )

    sf = "/root/testdata/sf0.001"
    rows = dd22_multiprobe_neardup(spark, sf).collect()
    assert rows, "injection produced no 0.85 pairs — corpus drifted"
    assert all(r.radius == 1 for r in rows)
    k, l1 = rows[0].planes, rows[0].tables
    assert (l1, 1) == multiprobe_for_planes(k, radius_lo=1, radius_hi=1)
    assert l1 < tables_for_planes(k)
    got = {(r.id_a, r.id_b, r.cosine_sim) for r in rows}
    want = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in dd20_production_neardup(spark, sf).collect()
    }
    assert got <= want
    assert len(got) / len(want) >= 0.9
