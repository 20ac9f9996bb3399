"""Similarity search over embedding columns (array<float>).

Two paths:

- **Brute-force cosine top-k** — the exact baseline: broadcast the
  query vector as a literal, compute the dot product with
  ``zip_with`` + ``aggregate`` (JVM-side, whole-stage codegen), global
  top-k via orderBy+limit (TakeOrderedAndProject — no full sort).
- **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (deterministic seeded planes) bucket the corpus; queries search
  only their bucket ∪ multiprobe neighbors (Hamming-1 buckets). At
  100 TB the corpus is written bucket-partitioned so a query touches
  a handful of partitions instead of the full scan.

Near-dup by embedding cosine (pairs ≥ threshold) reuses the same
bucket-join shape as MinHash-LSH.
"""

from __future__ import annotations

import math
import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# --- SQL-text twins of the Column helpers above --------------------------
#
# Plan-BUILD cost discipline (round 13): composing the multi-table LSH
# shapes through the Column API costs thousands of py4j round trips per
# plan build (measured: 4276 for dd20's build, ~0.5 ms each warm — the
# driver time the plan-build guardrail budgets). The hot operators below
# therefore compose the SAME expressions as SQL text in Python and hand
# them to the parser in ONE call (`selectExpr`/`F.expr`) — the
# lsh_bucket planes-literal lesson (round 11) applied to the whole
# expression, not just the literals. The parsed Catalyst trees are
# identical to the Column-built ones (same functions, same casts), so
# results are bit-identical; only driver-side build time changes.


def _qi(name: str) -> str:
    """Backtick-quote an identifier for SQL-text interpolation."""
    return "`" + name.replace("`", "``") + "`"


def dot_sql(a: str, b: str) -> str:
    """SQL text of :func:`dot` over two array-typed SQL expressions."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_sql(a: str) -> str:
    """SQL text of :func:`norm`."""
    return f"SQRT({dot_sql(a, a)})"


def cosine_topk(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = F.round(cosine(F.col(embedding_col), q), round_digits)
    return (
        df.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 11) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(
    embedding: Column, planes: list[list[float]]
) -> Column:
    """Random-hyperplane signature: bit i = sign(v · plane_i) ≥ 0.

    The planes ship as ONE parsed SQL literal (array of arrays of
    DOUBLE), not len(planes)×dim ``F.lit`` trees: each Column literal
    costs a py4j round trip at plan-build time, and the sized
    multi-table shapes (dd20: 10 tables × planes=11 × dim=128 ≈ 14 k
    literals) spent ~200 s of pure DRIVER time composing them — the
    ivf_assign lesson, measured at the round-11 sf10 probe where
    dd20's wall-clock was flat across ×10 data because plan build
    dominated both. ``repr(x)`` is the shortest round-trip form, so
    the ``...D`` double literal parses to the identical IEEE value
    and Catalyst constant-folds the array; bit i still comes from the
    same sequential-fold :func:`dot`, so signatures are bit-identical
    to the previous per-plane form."""
    rows = ",".join(
        "array(" + ",".join(f"{x!r}D" for x in plane) + ")"
        for plane in planes
    )
    planes_lit = F.expr(f"array({rows})")
    bits = F.transform(
        planes_lit,
        lambda p: F.when(dot(embedding, p) >= 0, F.lit(1).cast("long"))
        .otherwise(F.lit(0).cast("long")),
    )
    # Σ bitᵢ·2ⁱ as a reversed Horner fold (shiftleft needs a literal
    # shift amount, so the weight comes from fold position instead):
    # exact long arithmetic, planes ≤ 24 bits.
    return F.aggregate(
        F.reverse(bits),
        F.lit(0).cast("long"),
        lambda acc, b: acc * F.lit(2).cast("long") + b,
    )


def lsh_bucket_sql(embedding: str, planes: list[list[float]]) -> str:
    """SQL text of :func:`lsh_bucket` over a column/expression string —
    the whole signature (planes literal + sign bits + Horner fold) in
    ONE parser call. Identical expression tree to the Column form:
    same ``{x!r}D`` double literals, same CASE/CAST shapes, same
    reversed-fold weighting — bit-identical signatures."""
    rows = ",".join(
        "array(" + ",".join(f"{x!r}D" for x in plane) + ")"
        for plane in planes
    )
    return (
        f"aggregate(reverse(transform(array({rows}), p -> "
        f"CASE WHEN {dot_sql(embedding, 'p')} >= 0 "
        f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)), "
        f"CAST(0 AS BIGINT), (acc, b) -> acc * CAST(2 AS BIGINT) + b)"
    )


def ann_lsh_topk(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    n_tables: int = 8,
    n_planes: int = 4,
    seed: int = 11,
    round_digits: int = 4,
) -> DataFrame:
    """ANN top-k: multi-table random-hyperplane LSH.

    L independent tables of k-bit signatures; a row is a candidate if
    it matches the query's bucket in ANY table (classic OR-of-ANDs:
    recall 1-(1-p^k)^L where p = 1-θ/π). The candidate filter is one
    scan with L bucket equalities — no joins; at 100 TB the corpus is
    stored with the L bucket columns materialized and bucket-
    partitioned so each probe prunes to L partitions. Exact cosine
    ranks the candidates. Recall < 1 by construction; tests measure
    it against the brute-force baseline.
    """
    dim = len(query_vec)
    cond = None
    tagged = df
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + 1000 * t)
        q_bucket = 0
        for i, plane in enumerate(planes):
            if math.fsum(x * y for x, y in zip(query_vec, plane)) >= 0:
                q_bucket |= 1 << i
        eq = lsh_bucket(F.col(embedding_col), planes) == q_bucket
        cond = eq if cond is None else (cond | eq)
    near = tagged.where(cond)
    return cosine_topk(
        near, embedding_col, id_col, query_vec, k, round_digits=round_digits
    )


def lsh_radius_search(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    query_vec: Sequence[float],
    *,
    threshold: float,
    n_tables: int = 8,
    n_planes: int = 4,
    seed: int = 11,
    round_digits: int = 4,
) -> DataFrame:
    """ALL vectors within cosine >= threshold of the probe — the
    radius/range twin of ``ann_lsh_topk``. Same multi-table bucket
    prefilter, then a plain threshold FILTER on the rounded cosine:
    no orderBy, no limit — a radius query's cardinality is
    data-dependent, and funnelling it through top-k with a huge k
    preallocates a k-sized selector per task (an OOM under modest
    heaps, found by the driver-conditions smoke)."""
    dim = len(query_vec)
    cond = None
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + 1000 * t)
        q_bucket = 0
        for i, plane in enumerate(planes):
            if math.fsum(x * y for x, y in zip(query_vec, plane)) >= 0:
                q_bucket |= 1 << i
        eq = lsh_bucket(F.col(embedding_col), planes) == q_bucket
        cond = eq if cond is None else (cond | eq)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = F.round(cosine(F.col(embedding_col), q), round_digits)
    return (
        df.where(cond)
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    *,
    threshold: float = 0.4,
    round_digits: int = 4,
) -> DataFrame:
    """All pairs with cosine ≥ threshold — exact O(n²) variant.

    The scale path buckets both sides on hyperplane signatures first
    (same shape as lsh_candidate_pairs); exact mode is the correctness
    baseline and the sf-scale query."""
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(embedding_col).alias("__ea")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(embedding_col).alias("__eb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = F.round(cosine(F.col("__ea"), F.col("__eb")), round_digits)
    return pairs.select("id_a", "id_b", sim.alias("cosine_sim")).where(
        F.col("cosine_sim") >= threshold
    )


def embedding_near_dup_pairs_grid(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    *,
    threshold: float = 0.85,
    n_blocks: int = 16,
    round_digits: int = 4,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold as a DISTRIBUTED equi-join.

    Same output as :func:`embedding_near_dup_pairs`, different plan:
    the naive ``id_a < id_b`` inequality join is a cartesian /
    nested-loop shape (single task, unbounded build — the exact plan
    the repo's guardrails forbid). Here each row gets a block id
    g = id mod B; side A replicates each row to keys (g, j) for all
    j, side B to keys (i, g) for all i, and the equi-join on the
    (block_a, block_b) pair key meets every pair EXACTLY once —
    n²/B² pairs per key over B² keys, a shuffle-parallel grid. B
    scales the parallelism; replication cost is B·n rows of (id,
    vector). Intended for BOUNDED inputs (evaluation samples): it is
    still Θ(n²) work by definition — the production path is
    :func:`embedding_near_dup_pairs_lsh`."""
    blocks = "array({})".format(",".join(str(j) for j in range(n_blocks)))
    eq, iq = _qi(embedding_col), _qi(id_col)
    a = df.selectExpr(
        f"{iq} AS id_a",
        f"{eq} AS __ea",
        f"{norm_sql(eq)} AS __na",
        f"pmod({iq}, {n_blocks}) AS __ba",
        f"explode({blocks}) AS __bb",
    )
    b = df.selectExpr(
        f"{iq} AS id_b",
        f"{eq} AS __eb",
        f"{norm_sql(eq)} AS __nb",
        f"explode({blocks}) AS __ba",
        f"pmod({iq}, {n_blocks}) AS __bb",
    )
    pairs = a.join(b, ["__ba", "__bb"]).where(F.col("id_a") < F.col("id_b"))
    return pairs.selectExpr(
        "id_a",
        "id_b",
        f"ROUND({dot_sql('__ea', '__eb')} / (__na * __nb),"
        f" {int(round_digits)}) AS cosine_sim",
    ).where(F.col("cosine_sim") >= threshold)


def semantic_dedup_planes(
    n_rows: int, *, target_cluster_rows: int = 125, lo: int = 4, hi: int = 24
) -> int:
    """Corpus-sized hyperplane count for SemDeDup-style hard
    partitioning: 2^planes cells ≈ n / target, i.e. the cluster COUNT
    scales with the corpus so within-cluster pairwise work
    sum(cluster²) ≈ n·target stays LINEAR in n. With a fixed plane
    count the same pipeline is n²/2^k — quadratic, the shape the round-9
    sf1 probe measured as x71 on x10 data before this knob existed.

    The recall tradeoff is the standard LSH one: more planes → smaller
    cells → more cross-cell misses for a single table; production
    compensates with n_tables (union of partitions) exactly as the
    SemDeDup paper accepts cross-cluster misses at its k ∝ n codebook
    sizes. Bounded to [lo, hi]: 2^24 cells is plenty for any corpus
    whose per-cell target is hundreds of rows."""
    import math

    if n_rows <= target_cluster_rows:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n_rows / target_cluster_rows))))


def tables_for_planes(
    n_planes: int,
    *,
    threshold: float = 0.85,
    target_recall: float = 0.98,
    lo: int = 2,
    hi: int = 40,
) -> int:
    """OR-amplification table count L holding per-pair recall at a
    FIXED target as the plane count k grows with the corpus.

    Standard LSH algebra: a pair at cosine exactly ``threshold``
    collides in one k-bit table w.p. p^k (p = 1-θ/π), so recall over
    L independent tables is 1-(1-p^k)^L; solving for the target gives
    L = ceil(ln(1-R) / ln(1-p^k)). Because p^k = (n/target)^(log2 p)
    shrinks only polynomially at production thresholds (n^-0.28 at
    0.85), L grows as ~(n/target)^0.28 · ln(1/(1-R)) — the affordable
    amplification dd20's note derives (~86 tables at 10^9 vectors for
    R=0.98), affordable exactly because the per-table candidate work
    is linear in n. Pairs ABOVE the threshold have higher p, so the
    target is a floor: measured recall on the injected ~0.89-cosine
    pairs is 0.994-1.0 at every clamp branch (k=4/5/8/11,
    tests/test_similarity.py). The ``hi`` clamp exists for oracle
    parity (the DuckDB twin embeds hi·plane_hi plane literals); it
    binds only beyond ~0.5M-vector corpora (k ≥ 13), where production
    would keep following the unclamped formula or switch to
    multiprobe — :func:`multiprobe_sizing` implements exactly that
    continuation (round 13): it returns this function's (k, L) with
    probe_radius=0 for every k the hi clamp does not bind, and
    switches to Hamming-1 multiprobe (far smaller L) where it would."""
    p = 1.0 - math.acos(threshold) / math.pi
    need = math.ceil(
        math.log(1.0 - target_recall) / math.log(1.0 - p**n_planes)
    )
    return max(lo, min(hi, need))


def multiprobe_collision_prob(
    n_planes: int, radius: int, *, threshold: float = 0.85
) -> float:
    """Per-table candidate probability for a pair at cosine exactly
    ``threshold`` under Hamming-≤``radius`` multiprobe: the pair
    collides iff their k-bit signatures differ in at most ``radius``
    bits, so q = Σ_{j≤r} C(k,j)·p^(k-j)·(1-p)^j (p = 1-θ/π per
    hyperplane). radius=0 reduces to the plain p^k of
    :func:`tables_for_planes`."""
    p = 1.0 - math.acos(threshold) / math.pi
    return sum(
        math.comb(n_planes, j) * p ** (n_planes - j) * (1.0 - p) ** j
        for j in range(radius + 1)
    )


def multiprobe_sizing(
    n_rows: int,
    *,
    threshold: float = 0.85,
    target_recall: float = 0.98,
    target_cluster_rows: int = 125,
    plane_lo: int = 4,
    plane_hi: int = 20,
    table_lo: int = 2,
    table_hi: int = 40,
    radius_hi: int = 1,
) -> tuple[int, int, int]:
    """Corpus-sized (planes, tables, probe_radius) holding per-pair
    recall at ``target_recall`` WITHOUT the table-count clamp ever
    binding — the standard multiprobe-LSH continuation (Lv et al.,
    VLDB'07; FAISS/E2LSH practice) of :func:`tables_for_planes`.

    k comes from :func:`semantic_dedup_planes` on the same count
    (2^k cells ≈ n/target keeps per-table candidate work linear in
    n). Then the smallest probe radius r whose table count
    L = ceil(ln(1-R)/ln(1-q(k,r))) fits ``table_hi`` wins:

    - k ≤ 12 → r=0 and L identical to ``tables_for_planes`` — every
      previously gated branch (k=4/5/8/11 → L=7/9/17/32) is
      unchanged, plan and oracle;
    - k = 13..20 → r=1 (probe the home bucket plus its k Hamming-1
      neighbors per table), L = 11..35 — where the r=0 formula needs
      L=47..189 and the round-12 clamp silently froze L at 40,
      letting recall decay (measured 0.957 at k=13 falling to 0.82
      at k=16 — the gap the r12 verdict flagged).

    The tradeoff is the public one: multiprobe holds L (index
    storage, banding work, the oracle's plane-literal relation) at
    ~L/4 the tables the plain formula needs, paying with (k+1)×
    more bucket probes per vector — probes are id-only rows, so at
    cluster scale the shuffle stays ~24 bytes/probe while the
    signature store shrinks 4×. Capacity: the 0.98 target now holds
    to 125·2^20 ≈ 131 M vectors (was ~0.5 M); past that the plane
    clamp binds and per-cell occupancy (not recall) grows."""
    k = semantic_dedup_planes(
        n_rows,
        target_cluster_rows=target_cluster_rows,
        lo=plane_lo,
        hi=plane_hi,
    )
    tables, radius = multiprobe_for_planes(
        k,
        threshold=threshold,
        target_recall=target_recall,
        table_lo=table_lo,
        table_hi=table_hi,
        radius_hi=radius_hi,
    )
    return k, tables, radius


def multiprobe_for_planes(
    n_planes: int,
    *,
    threshold: float = 0.85,
    target_recall: float = 0.98,
    table_lo: int = 2,
    table_hi: int = 40,
    radius_lo: int = 0,
    radius_hi: int = 1,
) -> tuple[int, int]:
    """(tables, radius) for a FIXED plane count — the per-branch
    solver :func:`multiprobe_sizing` applies after sizing k, exposed
    separately so the DuckDB oracle's branch-literal CASE is
    generated from the identical function the Spark entry calls
    (zero cross-engine transcendental math — the tables_for_planes
    CASE pattern, now two CASEs). ``radius_lo`` forces a minimum
    probe radius: dd22's parity pin sets radius_lo=radius_hi=1 to
    run the multiprobe plan (and its smaller solved L) on branches
    where plain r=0 amplification would also fit."""
    for r in range(radius_lo, radius_hi + 1):
        q = multiprobe_collision_prob(n_planes, r, threshold=threshold)
        need = math.ceil(
            math.log(1.0 - target_recall) / math.log(1.0 - q)
        )
        if need <= table_hi:
            return max(table_lo, need), r
    return table_hi, radius_hi


def semantic_dedup_tables(
    n_rows: int,
    *,
    threshold: float = 0.85,
    target_recall: float = 0.98,
    target_cluster_rows: int = 125,
    plane_lo: int = 4,
    plane_hi: int = 16,
    lo: int = 2,
    hi: int = 40,
) -> int:
    """Corpus-sized table count: k from :func:`semantic_dedup_planes`
    on the same count, then L = :func:`tables_for_planes` (k) — both
    knobs derive from ONE COUNT(*), so the oracle re-derives the pair
    from its own count (planes via the log2 clamp, tables via a
    branch-literal CASE over the 13 reachable k values — zero
    cross-engine transcendental math on the L side)."""
    k = semantic_dedup_planes(
        n_rows,
        target_cluster_rows=target_cluster_rows,
        lo=plane_lo,
        hi=plane_hi,
    )
    return tables_for_planes(
        k, threshold=threshold, target_recall=target_recall, lo=lo, hi=hi
    )


def _shuffle_partitions(df: DataFrame) -> int:
    """Session shuffle-partition count as an int, tolerant of vendor
    runtimes that set the conf to a non-integer (e.g. ``'auto'``):
    falls back to ``defaultParallelism``, then 32 — a bad conf value
    must degrade the repartition WIDTH, not break the plan."""
    raw = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    try:
        return int(raw)
    except (TypeError, ValueError):
        try:
            return int(df.sparkSession.sparkContext.defaultParallelism)
        except Exception:  # noqa: BLE001 — e.g. Connect: no sparkContext
            return 32


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    *,
    dim: int,
    threshold: float = 0.4,
    n_tables: int = 8,
    n_planes: int = 4,
    seed: int = 11,
    round_digits: int = 4,
    probe_radius: int = 0,
) -> DataFrame:
    """Near-dup pairs, LSH-bucketed: compare only pairs colliding in at
    least one of L hyperplane tables — the 100 TB path (per-pair
    recall 1-(1-p^k)^L, measured in tests).

    ``probe_radius=1`` adds Hamming-1 MULTIPROBE: each row's bucket
    additionally probes its k bit-flip neighbors per table, so a pair
    is a candidate iff its signatures differ in ≤1 bit in some table
    — per-table collision rises from p^k to p^k + k·p^(k-1)(1-p) and
    the table count :func:`multiprobe_sizing` needs stays bounded as
    k grows past 12. The probe side is id-only (24-byte rows), built
    by exploding a k+1-mask array over the banded relation; radius 0
    keeps the exact pre-round-13 plan. A pair at Hamming distance
    d ≤ radius matches exactly ONE flip mask per table (the mask
    flipping their d differing bits... for radius 1: mask 0 when
    d=0, mask 1<<i when they differ at bit i alone), so per-table
    candidate multiplicity stays 1 and the distinct is still needed
    only across tables.

    One explode to (id, table, bucket) rows, one self-equi-join on
    (table, bucket) carrying IDS ONLY, distinct id pairs, then the
    embeddings join back for the exact-cosine verify. Identical shape
    to MinHash-LSH banding. The candidate join deliberately does NOT
    carry the embedding arrays: the join OUTPUT is Σcell² rows per
    table, and shuffling two dim-float arrays per candidate into the
    distinct was the dominant cost at scale (measured at the sf10
    probe: ~25 GB of array shuffle for 200 k vectors where the
    id-pair form moves ~16 bytes/candidate — the arrays are joined
    back only |pairs| times). With one table a pair can collide only
    once, so the distinct is skipped entirely.

    Precondition: ``id_col`` must be UNIQUE within ``df``. The
    id-only candidate join identifies a pair by its ids; a duplicated
    id would make the single-table no-distinct shortcut emit
    duplicate pairs and the embedding join-back a cross product
    (the old embedding-carrying distinct collapsed those). Every
    caller passes a primary key (vec_id / doc_id)."""
    # The whole L-table signature array is composed as SQL text and
    # parsed ONCE: the Column form cost ~4.3k py4j round trips per
    # plan build at the dd20 sizing (measured round 13; ~0.5 ms each
    # warm = seconds of pure driver time per build, paid on every
    # bench rep). Identical parsed expression tree — results unchanged.
    eq = _qi(embedding_col)
    buckets_sql = "array({})".format(
        ",".join(
            lsh_bucket_sql(eq, hyperplanes(dim, n_planes, seed + 1000 * t))
            for t in range(n_tables)
        )
    )
    # Two explicit repartitions, each curing a measured sf10 defect:
    #
    # 1. BEFORE the signature projection: the L·k plane dots are
    #    higher-order-function expressions (interpreted, outside
    #    whole-stage codegen), and Catalyst evaluates projections in
    #    the SCAN stage — whose width is the input's file-split
    #    count (1-2 tasks for one parquet file). At the sized sf10
    #    configuration that was ~10 minutes of single-core signature
    #    math on a 32-core box; a round-robin repartition first makes
    #    the banding embarrassingly parallel, for one cheap shuffle
    #    of the raw rows.
    n_part = _shuffle_partitions(df)
    banded = df.repartition(n_part).selectExpr(
        _qi(id_col),
        f"posexplode({buckets_sql}) AS (__table, __bucket)",
    )
    # 2. ON the join keys, with an explicit count: the banded
    #    relation is SMALL (n·L ids) but the self-join's output is
    #    Σcell² — ~70× its input at the sized configuration. AQE's
    #    coalescing sizes post-shuffle partitions by the SHUFFLE
    #    bytes, cannot see the explosion, and collapsed this join to
    #    ONE task. A user repartition with an explicit count is
    #    exempt from AQE coalescing, and both join sides derive from
    #    it, so the join runs co-partitioned at full width with no
    #    extra exchange.
    banded = banded.repartition(n_part, "__table", "__bucket")
    a = banded.select(F.col(id_col).alias("id_a"), "__table", "__bucket")
    if probe_radius == 0:
        b = banded.select(
            F.col(id_col).alias("id_b"), "__table", "__bucket"
        )
    elif probe_radius == 1:
        # Hamming-1 probe side: explode k+1 XOR masks (0 = the home
        # bucket itself) and re-co-partition on the join keys — the
        # same explicit-count repartition that exempts the exploding
        # join from AQE coalescing on the home side.
        masks_sql = "array({})".format(
            ",".join(
                f"CAST({m} AS BIGINT)"
                for m in [0, *(1 << i for i in range(n_planes))]
            )
        )
        b = (
            banded.selectExpr(
                f"{_qi(id_col)} AS id_b",
                "__table",
                "__bucket AS __home",
                f"explode({masks_sql}) AS __mask",
            )
            .selectExpr(
                "id_b",
                "__table",
                "(__home ^ __mask) AS __bucket",
            )
            .repartition(n_part, "__table", "__bucket")
        )
    else:
        raise ValueError(
            "probe_radius must be 0 or 1 — radius ≥ 2 needs pair "
            "flips and is never selected by multiprobe_sizing at "
            "plane_hi ≤ 20"
        )
    pairs = (
        a.join(b, ["__table", "__bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    # a pair matches at most once per table (exactly one flip mask
    # aligns two signatures at Hamming distance ≤ radius), so the
    # distinct is needed only across tables — radius notwithstanding
    if n_tables > 1:
        pairs = pairs.distinct()
    # Norms are a pure function of one vector, so they're computed in
    # the n-row projection and carried through the join — the verify
    # then runs ONE array fold per candidate (the dot) instead of
    # three (dot + both norms re-derived per pair). Same expression
    # tree over the same arrays ⇒ bit-identical doubles.
    ea = df.selectExpr(
        f"{_qi(id_col)} AS id_a",
        f"{eq} AS __ea",
        f"{norm_sql(eq)} AS __na",
    )
    eb = df.selectExpr(
        f"{_qi(id_col)} AS id_b",
        f"{eq} AS __eb",
        f"{norm_sql(eq)} AS __nb",
    )
    pairs = pairs.join(ea, "id_a").join(eb, "id_b")
    return pairs.selectExpr(
        "id_a",
        "id_b",
        f"ROUND({dot_sql('__ea', '__eb')} / (__na * __nb),"
        f" {int(round_digits)}) AS cosine_sim",
    ).where(F.col("cosine_sim") >= threshold)


# --- int8 scalar quantization ------------------------------------------

def int8_scale(vec: Column) -> Column:
    """Per-vector symmetric quantization scale: max|v| / 127.

    Guarded away from zero so an all-zero vector quantizes to zeros
    instead of dividing by zero.
    """
    max_abs = F.array_max(
        F.transform(vec, lambda x: F.abs(x.cast("double")))
    )
    return F.greatest(max_abs, F.lit(1e-30)) / F.lit(127.0)


def int8_quantize(vec: Column, scale: Column) -> Column:
    """Codes in [-127, 127]: floor(v/scale + 0.5) — explicit half-up
    so every engine reproduces the identical code-book (plain round()
    differs across engines on .5 boundaries). The bound needs no
    clamp: |v|/scale ≤ 127 by construction of the scale."""
    return F.transform(
        vec,
        lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast(
            "tinyint"
        ),
    )


def int8_dequantize(codes: Column, scale: Column) -> Column:
    return F.transform(codes, lambda c: c.cast("double") * scale)


def quantization_report(
    df: DataFrame, embedding_col: str, id_col: str
) -> DataFrame:
    """Per-vector int8 reconstruction audit: scale, worst absolute
    element error, cosine between original and dequantized vector.

    4x storage saving is the point at 100 TB: the engine stores codes
    + one float scale per vector and reconstructs on the fly. The
    64-element ``transform`` lambdas are interpreted per element but
    bounded by vector dim, not corpus size (the corpus-scale pattern
    budget from operators/text.py applies to text, where arrays are
    unbounded)."""
    v = F.col(embedding_col)
    scale = int8_scale(v)
    deq = int8_dequantize(int8_quantize(v, scale), scale)
    err = F.array_max(
        F.zip_with(v, deq, lambda x, y: F.abs(x.cast("double") - y))
    )
    return df.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        F.round(err, 6).alias("max_abs_err"),
        F.round(
            dot(v, deq) / (norm(v) * F.sqrt(dot(deq, deq))), 4
        ).alias("cos_recon"),
    )


def batch_cosine_topk(
    corpus: DataFrame,
    embedding_col: str,
    id_col: str,
    queries: DataFrame,
    *,
    q_id_col: str = "q_id",
    q_emb_col: str = "q_emb",
    k: int = 5,
    n_salt: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k neighbors for a BATCH of query vectors (DataFrame
    probe side) — the cluster-scale twin of
    ``batch_cosine_topk_literal``.

    Two deliberate plan choices keep it scale-safe:

    - **broadcast hash join on a constant-valued derived key**: both
      sides join on ``pmod(xxhash64(id), 1)`` — always 0, but not
      constant-foldable, so Catalyst plans a BroadcastHashJoin (the
      probe batch hashes, the corpus streams fully partitioned)
      instead of the BroadcastNestedLoopJoin a literal cross join
      degenerates to;
    - **salted two-stage top-k**: ranking all |corpus| scored rows in
      one window per query would funnel the whole corpus into
      |queries| partitions. Stage 1 takes top-k within (query, salt)
      — bounded partitions — stage 2 ranks the n_salt*k survivors per
      query. Both window sorts are bounded.

    Ranking uses the ROUNDED similarity with the corpus id as
    tiebreak, so results are deterministic and engine-portable.
    """
    pair_key = lambda c: F.pmod(F.xxhash64(c), F.lit(1))  # noqa: E731
    scored = (
        corpus.withColumn("__pk", pair_key(F.col(id_col)))
        .join(
            F.broadcast(
                queries.withColumn("__pk", pair_key(F.col(q_id_col)))
            ),
            "__pk",
        )
        .where(F.col(id_col) != F.col(q_id_col))
        .select(
            F.col(q_id_col),
            F.col(id_col),
            F.round(
                cosine(F.col(embedding_col), F.col(q_emb_col)),
                round_digits,
            ).alias("sim"),
        )
    )
    return _salted_topk(scored, q_id_col, id_col, k=k, n_salt=n_salt)


def _salted_topk(
    scored: DataFrame, q_id_col: str, id_col: str, *, k: int, n_salt: int
) -> DataFrame:
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt))
    w1 = Window.partitionBy(q_id_col, "__salt").orderBy(
        F.desc("sim"), F.asc(id_col)
    )
    partial = (
        scored.withColumn("__salt", salt)
        .withColumn("__r", F.row_number().over(w1))
        .where(F.col("__r") <= k)
        .drop("__salt", "__r")
    )
    w2 = Window.partitionBy(q_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        partial.withColumn("__r", F.row_number().over(w2))
        .where(F.col("__r") <= k)
        .drop("__r")
    )


def batch_cosine_topk_literal(
    corpus: DataFrame,
    embedding_col: str,
    id_col: str,
    probes: Sequence[tuple[int, Sequence[float]]],
    *,
    k: int = 5,
    n_salt: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k for a small literal probe batch: the probes are
    inlined into the plan and exploded against each corpus row — no
    join node, no shuffle of the corpus for the pairing, and the same
    salted two-stage top-k as the DataFrame variant. Bounded by plan
    size (use ``batch_cosine_topk`` beyond a few thousand probes)."""
    probe_arr = F.array(
        *[
            F.struct(
                F.lit(int(qid)).cast("long").alias("q_id"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("q_emb"),
            )
            for qid, vec in probes
        ]
    )
    scored = (
        corpus.select(
            F.col(id_col),
            F.col(embedding_col),
            F.explode(probe_arr).alias("__q"),
        )
        .where(F.col(id_col) != F.col("__q.q_id"))
        .select(
            F.col("__q.q_id").alias("q_id"),
            F.col(id_col),
            F.round(
                cosine(F.col(embedding_col), F.col("__q.q_emb")),
                round_digits,
            ).alias("sim"),
        )
    )
    return _salted_topk(scored, "q_id", id_col, k=k, n_salt=n_salt)
