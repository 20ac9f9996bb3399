"""Similarity search over `embeddings` — queries + oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    hyperplanes,
)
from cdc_spark.queries.base import register


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0):
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.where(F.col("vec_id") == vec_id).select("embedding").first()
    return row[0]


@register(
    "ss01_cosine_topk",
    oracle="""
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                        q.embedding::DOUBLE[]), 4) AS cosine_sim
    FROM embeddings e
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT 20
    """,
    note="brute-force cosine top-20 to a query vector (broadcast literal, "
    "zip_with dot product, TakeOrderedAndProject)",
    tags=("similarity", "topk"),
)
def ss01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    return cosine_topk(emb, "embedding", "vec_id", q, k=20)


_EMB_DIM = 64  # TESTDATA.md: embeddings.embedding is FLOAT[64] at every SF


def _ann_lsh_topk_oracle(
    *,
    dim: int = _EMB_DIM,
    n_tables: int = 8,
    n_planes: int = 4,
    seed: int = 11,
    k: int = 10,
) -> str:
    """DuckDB twin of ``ann_lsh_topk`` (the dd05 technique): the
    seeded hyperplanes are embedded as literals, so the oracle
    recomputes BOTH the corpus signatures and the probe's bucket per
    table in SQL — the ANN candidate filter itself is hash-checked,
    not just the exact-cosine ranking of the survivors."""

    def bucket_expr(t: int, col: str) -> str:
        terms = []
        for i, plane in enumerate(
            hyperplanes(dim, n_planes, seed + 1000 * t)
        ):
            arr = "[" + ",".join(repr(x) for x in plane) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product({col}::DOUBLE[], {arr})"
                f" >= 0 THEN {1 << i} ELSE 0 END)"
            )
        return "(" + " + ".join(terms) + ")"

    any_table = "\n           OR ".join(
        f"{bucket_expr(t, 'e.embedding')} = {bucket_expr(t, 'q.qe')}"
        for t in range(n_tables)
    )
    return f"""
    WITH q AS (
        SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                        q.qe::DOUBLE[]), 4) AS cosine_sim
    FROM embeddings e, q
    WHERE {any_table}
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT {k}
    """


@register(
    "ss02_ann_lsh_topk",
    oracle=_ann_lsh_topk_oracle(),
    note="ANN top-10 via multi-table random-hyperplane LSH (8 tables x "
    "4 bits) — at scale the corpus stores materialized bucket columns "
    "and is bucket-partitioned, so a probe prunes to a few partitions. "
    "Hash-checked end to end: the oracle re-derives the seeded planes, "
    "corpus signatures AND probe buckets in SQL (recall vs exact stays "
    "measured in tests)",
    tags=("similarity", "ann", "lsh"),
)
def ss02_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    return ann_lsh_topk(emb, "embedding", "vec_id", q, k=10)


def _ivf_det_oracle(
    *, k_centroids: int = 16, scale: int = 64, n_probe: int = 4, k: int = 10
) -> str:
    """DuckDB twin of the deterministic-codebook IVF path: centroids
    are the first ``k_centroids`` corpus vectors integer-quantized
    (half-up at ``scale``), so assignment argmax, probe pruning AND
    the final exact-cosine ranking are all recomputed in SQL — the
    integer dot products are exact in every engine, which is what
    upgrades the IVF entries from rows-only to hash-checked."""
    return f"""
    WITH iq AS (
        SELECT vec_id, embedding,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) * {scale} + 0.5)) AS e
        FROM embeddings
    ),
    cb AS (
        SELECT vec_id AS cid, e AS c FROM iq WHERE vec_id < {k_centroids}
    ),
    qv AS (SELECT e AS qe, embedding AS qemb FROM iq WHERE vec_id = 0),
    probes AS (
        SELECT cid FROM (
            SELECT cb.cid,
                   ROW_NUMBER() OVER (
                       ORDER BY list_dot_product(cb.c, qv.qe) DESC, cb.cid
                   ) AS rn
            FROM cb, qv
        ) WHERE rn <= {n_probe}
    ),
    assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT iq.vec_id, iq.embedding, cb.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY iq.vec_id
                       ORDER BY list_dot_product(iq.e, cb.c) DESC, cb.cid
                   ) AS rn
            FROM iq, cb
        ) WHERE rn = 1
    )
    SELECT a.vec_id,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                        qv.qemb::DOUBLE[]), 4) AS cosine_sim
    FROM assigned a JOIN probes p ON a.cid = p.cid CROSS JOIN qv
    ORDER BY cosine_sim DESC, a.vec_id
    LIMIT {k}
    """


def _ivf_sized_oracle(
    *,
    lo: int = 16,
    hi: int = 4096,
    scale: int = 64,
    n_probe: int = 4,
    k: int = 10,
) -> str:
    """_ivf_det_oracle with the centroid count derived from COUNT(*)
    by the exact ``ivf_sized_nlist`` clamp — every CTE is data-derived
    (no embedded literals), so the oracle sizes with the corpus just
    like the engine does.

    Memory discipline (first sf10 oracle gate catch, two stages of
    it): the assignment ranks n·nlist rows (102 M at sf10's
    nlist=512). The original form computed the argmax with a window
    whose ORDER BY was ``list_dot_product(iq.e, cb.c)`` — a window
    MATERIALIZES its whole input, and because the order expression
    references the list columns, that input carried both 64-float
    lists: ~100 GB of blocking state, spill-disk death. The argmax is
    now two streaming HASH AGGREGATES over a narrow materialized
    (vec_id, cid, dot) projection: max(dot) per vector, then min(cid)
    among the exact-dot ties — the quantized dots are integer-valued
    doubles (|dot| < 2^24), so the tie equality is exact in every
    engine and the tiebreak matches the window's (DESC dot, ASC cid)
    order bit-for-bit. No sort anywhere until the final top-k."""
    return f"""
    WITH kk AS (
        SELECT CASE WHEN COUNT(*) <= {lo * lo} THEN {lo}
               ELSE GREATEST({lo}, LEAST({hi},
                    CAST(POWER(2, CEIL(LOG2(SQRT(COUNT(*))))) AS INT)))
               END AS nlist
        FROM embeddings
    ),
    iq AS (
        SELECT vec_id, embedding,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) * {scale} + 0.5)) AS e
        FROM embeddings
    ),
    cb AS (
        SELECT vec_id AS cid, e AS c FROM iq CROSS JOIN kk
        WHERE vec_id < kk.nlist
    ),
    qv AS (SELECT e AS qe, embedding AS qemb FROM iq WHERE vec_id = 0),
    probes AS (
        SELECT cid FROM (
            SELECT cb.cid,
                   ROW_NUMBER() OVER (
                       ORDER BY list_dot_product(cb.c, qv.qe) DESC, cb.cid
                   ) AS rn
            FROM cb, qv
        ) WHERE rn <= {n_probe}
    ),
    scored AS MATERIALIZED (
        SELECT iq.vec_id, cb.cid, list_dot_product(iq.e, cb.c) AS d
        FROM iq, cb
    ),
    best AS (
        SELECT vec_id, MAX(d) AS md FROM scored GROUP BY vec_id
    ),
    assigned AS (
        SELECT s.vec_id, MIN(s.cid) AS cid
        FROM scored s JOIN best b
          ON s.vec_id = b.vec_id AND s.d = b.md
        GROUP BY s.vec_id
    )
    SELECT a.vec_id,
           ROUND(list_cosine_similarity(iq.embedding::DOUBLE[],
                                        qv.qemb::DOUBLE[]), 4) AS cosine_sim
    FROM assigned a
    JOIN probes p ON a.cid = p.cid
    JOIN iq ON iq.vec_id = a.vec_id
    CROSS JOIN qv
    ORDER BY cosine_sim DESC, a.vec_id
    LIMIT {k}
    """


@register(
    "ss24_ivf_sized_nlist",
    oracle=_ivf_sized_oracle(),
    note="IVF ANN top-10 with the coarse-cluster count SIZED to the "
    "corpus — the knob ss03's fixed 16 clusters leaves unturned and "
    "the ANN analog of dd12/ss13's sized partitions: "
    "operators/ivf.py::ivf_sized_nlist gives nlist ~ sqrt(n) rounded "
    "up to a power of two (the FAISS guideline), so a probe scans "
    "n_probe*sqrt(n) rows instead of n_probe*n/16 — sublinear per "
    "probe at any corpus size (32 cells at sf0.01, 64 at sf0.1, 256 "
    "at sf1). The oracle derives the SAME nlist from COUNT(*) and "
    "recomputes centroids/assignment/pruning/ranking entirely from "
    "data (no embedded literals), so the sized path is hash-checked "
    "at every SF. Cost split (measured, BENCH_sf1): this gate entry "
    "re-BUILDS the index per run to stay oracle-checkable, and build "
    "is n*nlist*dim = n^1.5 with the sized nlist — FAISS's own "
    "build/probe tradeoff; the steady-state SERVING cost (untimed "
    "build, timed probe: bench.py::bench_ivf_sized_probe) is the "
    "sublinear n_probe*sqrt(n) number. At scale the corpus is "
    "written partitioned by the sized cluster id exactly as ss17's "
    "IVF-PQ layout",
    tags=("similarity", "ann", "ivf", "scale"),
)
def ss24_ivf_sized_nlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.ivf import (
        deterministic_codebook,
        ivf_sized_nlist,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    nlist = ivf_sized_nlist(emb.count())
    q = _query_vector(spark, sf_dir, 0)
    codebook = deterministic_codebook(
        emb, "embedding", "vec_id", k=nlist, scale=64
    )
    # arrow assignment is an explicit opt-in (executor pandas/numpy
    # dependency): bit-identical to the JVM HOF argmax, ~55 s → 7 s on
    # the sf1 build at nlist=256 (tests/test_ivf_cluster.py pins the
    # identity)
    return ivf_topk(
        emb,
        "embedding",
        "vec_id",
        q,
        codebook,
        k=10,
        n_probe=4,
        scale=64,
        assign_method="arrow",
    )


# (sf_dir, nlist) -> built index path: ss25 builds its sized index
# ONCE per process and every subsequent call (and the bench's timed
# loop) pays only the probe — the steady-state serving cost
_SS25_INDEX_PATHS: dict[tuple[str, int], str] = {}


@register(
    "ss25_ivf_sized_serving",
    oracle=_ivf_sized_oracle(),
    note="the SERVING twin of ss24: the sized-nlist IVF index is "
    "built ONCE into the persisted lake layout (ss06's "
    "cluster-partitioned corpus + sidecar codebook, arrow-assigned "
    "at build per ivf_assign's opt-in) and cached per (sf_dir, "
    "nlist) for the life of the process — the gated query then "
    "measures what production actually serves: a probe that opens "
    "n_probe of ~sqrt(n) cluster DIRECTORIES (static "
    "PartitionFilters on the probed cluster ids, asserted in the "
    "compiled plan — the dd14 mechanism) and scans n_probe*sqrt(n) "
    "rows, sublinear at any corpus size. ss24 deliberately re-builds "
    "per run so the BUILD path stays oracle-gated; this entry pins "
    "the steady-state cost next to it (bench: "
    "ivf_sized_probe_serving). Same oracle: the on-disk layout is a "
    "pure function of the data, so probe-from-index and "
    "assign-then-probe must agree bit-for-bit",
    tags=("similarity", "ann", "ivf", "index", "scale"),
)
def ss25_ivf_sized_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from cdc_spark.operators.ivf import (
        IvfIndex,
        deterministic_codebook,
        ivf_sized_nlist,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    nlist = ivf_sized_nlist(emb.count())
    key = (sf_dir, nlist)
    path = _SS25_INDEX_PATHS.get(key)
    if path is None:
        codebook = deterministic_codebook(
            emb, "embedding", "vec_id", k=nlist, scale=64
        )
        path = tempfile.mkdtemp(prefix="ss25_ivf_")
        IvfIndex.build(
            spark,
            path,
            emb,
            "embedding",
            "vec_id",
            codebook=codebook,
            scale=64,
            assign_method="arrow",
        )
        _SS25_INDEX_PATHS[key] = path
    idx = IvfIndex(spark, path)
    q = _query_vector(spark, sf_dir, 0)
    out = idx.topk(q, k=10, n_probe=4)
    # serving contract, asserted per query: the probe's corpus scan
    # must carry a cluster PartitionFilter — only the probed cluster
    # directories are planned, the other ~sqrt(n) are never opened
    plan = out._jdf.queryExecution().executedPlan().toString()
    chunks = plan.split("PartitionFilters: [")
    if len(chunks) < 2:
        raise AssertionError("serving probe plans no PartitionFilters")
    for c in chunks[1:]:
        if "cluster" not in c[: c.find("]") + 1]:
            raise AssertionError(
                "a corpus scan does not prune on cluster:\n" + c[:200]
            )
    return out


@register(
    "ss03_ivf_topk",
    oracle=_ivf_det_oracle(),
    note="IVF ANN top-10 with a deterministic integer-quantized "
    "coarse quantizer (first-16-by-id seed centroids, half-up codes "
    "at scale 64 — ss04's trick): assignment and probe pruning are "
    "exact integer argmaxes, so the WHOLE ANN path is hash-checked "
    "in SQL (the k-means trainer remains for learned codebooks; its "
    "float iterations are measured by recall tests instead). Scans "
    "only the 4 nearest clusters — at scale the corpus is "
    "partitioned by cluster id",
    tags=("similarity", "ann", "ivf"),
)
def ss03_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.ivf import deterministic_codebook, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    codebook = deterministic_codebook(
        emb, "embedding", "vec_id", k=16, scale=64
    )
    return ivf_topk(
        emb, "embedding", "vec_id", q, codebook, k=10, n_probe=4, scale=64
    )


@register(
    "ss04_int8_quantization",
    oracle="""
    WITH q AS (
        SELECT vec_id, embedding,
               greatest(list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))), 1e-30) / 127.0 AS scale
        FROM embeddings
    ),
    d AS (
        SELECT vec_id, embedding, scale,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) / scale + 0.5) * scale)
                   AS deq
        FROM q
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale,
           ROUND(list_max(list_transform(
               generate_series(1, len(embedding)),
               i -> abs(CAST(embedding[i] AS DOUBLE) - deq[i]))), 6)
               AS max_abs_err,
           ROUND(list_cosine_similarity(embedding::DOUBLE[], deq), 4)
               AS cos_recon
    FROM d
    """,
    note="int8 scalar quantization audit: per-vector symmetric scale "
    "(max|v|/127), explicit half-up codes so the codebook is identical "
    "across engines, worst element error + reconstruction cosine — 4x "
    "storage saving for the 100 TB embedding store",
    tags=("similarity", "quantization"),
)
def ss04_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.similarity import quantization_report

    emb = load_table(spark, sf_dir, "embeddings")
    return quantization_report(emb, "embedding", "vec_id")


@register(
    "ss05_batch_cosine_topk",
    oracle="""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb
        FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
        SELECT q.q_id, e.vec_id,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.q_emb::DOUBLE[]), 4) AS sim
        FROM embeddings e, q
        WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, sim FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY sim DESC, vec_id
        ) AS r FROM scored
    ) WHERE r <= 5
    """,
    note="batch exact top-5 for 8 query vectors: literal probe batch "
    "exploded against the corpus (no join node, corpus never shuffles "
    "for the pairing) + salted two-stage top-k (both window sorts "
    "bounded); batch_cosine_topk is the DataFrame-probe twin",
    tags=("similarity", "topk", "batch"),
)
def ss05_batch_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.similarity import batch_cosine_topk_literal

    emb = load_table(spark, sf_dir, "embeddings")
    probes = [
        (r.vec_id, r.embedding)
        for r in emb.where(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ]
    return batch_cosine_topk_literal(
        emb, "embedding", "vec_id", probes, k=5, n_salt=64
    )


@register(
    "ss06_ivf_persisted_index",
    oracle=_ivf_det_oracle(),
    note="persisted IVF index (the serving shape): corpus parquet "
    "partitioned by cluster id + sidecar codebook; a probe query "
    "prunes to n_probe cluster DIRECTORIES at planning time "
    "(PartitionFilters), never opening the rest — and incremental "
    "adds append to their cluster partitions only. Uses the "
    "deterministic integer-quantized codebook, so the oracle "
    "recomputes the on-disk partitioning AND the probe pruning "
    "bit-for-bit — the index LAYOUT itself is hash-checked",
    tags=("similarity", "ann", "ivf", "index"),
)
def ss06_ivf_persisted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from cdc_spark.operators.ivf import IvfIndex, deterministic_codebook

    emb = load_table(spark, sf_dir, "embeddings")
    codebook = deterministic_codebook(
        emb, "embedding", "vec_id", k=16, scale=64
    )
    idx = IvfIndex.build(
        spark,
        tempfile.mkdtemp(prefix="ss06_ivf_"),
        emb,
        "embedding",
        "vec_id",
        codebook=codebook,
        scale=64,
    )
    q = _query_vector(spark, sf_dir, 0)
    return idx.topk(q, k=10, n_probe=4)


@register(
    "ss07_matryoshka_rerank",
    oracle="""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    s1 AS (
        SELECT e.vec_id, e.embedding,
               ROUND(list_cosine_similarity(
                   (e.embedding::DOUBLE[])[1:16],
                   (q.embedding::DOUBLE[])[1:16]), 6) AS coarse_sim
        FROM embeddings e CROSS JOIN q
        ORDER BY coarse_sim DESC, e.vec_id
        LIMIT 50
    )
    SELECT s1.vec_id,
           ROUND(list_cosine_similarity(s1.embedding::DOUBLE[],
                                        q.embedding::DOUBLE[]), 4)
               AS cosine_sim
    FROM s1 CROSS JOIN q
    ORDER BY cosine_sim DESC, s1.vec_id
    LIMIT 10
    """,
    note="Matryoshka-style two-stage retrieval: coarse top-50 by the "
    "first 16 dimensions (at scale the truncated prefix is a stored "
    "column ~dim/8 the bytes, scanned instead of the full vector), "
    "exact full-dim re-rank to top-10 — fully SQL-expressible, so "
    "unlike the LSH/IVF entries this ANN pattern is hash-checked",
    tags=("similarity", "ann", "matryoshka"),
)
def ss07_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    q16 = F.array(*[F.lit(float(x)) for x in q[:16]])
    qfull = F.array(*[F.lit(float(x)) for x in q])
    coarse = F.round(
        cosine(F.slice("embedding", 1, 16), q16), 6
    ).alias("coarse_sim")
    s1 = (
        emb.select("vec_id", "embedding", coarse)
        .orderBy(F.desc("coarse_sim"), F.asc("vec_id"))
        .limit(50)
    )
    return (
        s1.select(
            "vec_id",
            F.round(cosine(F.col("embedding"), qfull), 4).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "ss08_quantized_rerank",
    oracle="""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    qs AS (
        SELECT embedding,
               greatest(list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))), 1e-30) / 127.0 AS s
        FROM q
    ),
    qc AS (
        SELECT s,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) / s + 0.5)) AS c
        FROM qs
    ),
    cs AS (
        SELECT vec_id, embedding,
               greatest(list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))), 1e-30) / 127.0 AS s
        FROM embeddings
    ),
    cc AS (
        SELECT vec_id, embedding, s,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) / s + 0.5)) AS c
        FROM cs
    ),
    coarse AS (
        SELECT cc.vec_id, cc.embedding,
               ROUND(list_dot_product(cc.c, qc.c) * cc.s * qc.s, 6)
                   AS qscore
        FROM cc CROSS JOIN qc
        ORDER BY qscore DESC, cc.vec_id
        LIMIT 50
    )
    SELECT coarse.vec_id, qscore,
           ROUND(list_cosine_similarity(coarse.embedding::DOUBLE[],
                                        q.embedding::DOUBLE[]), 4)
               AS cosine_sim
    FROM coarse CROSS JOIN q
    ORDER BY cosine_sim DESC, coarse.vec_id
    LIMIT 10
    """,
    note="int8-quantized retrieval: coarse top-50 by quantized dot "
    "product (integer code products x two scales — at scale the codes "
    "column is 1/4 the bytes of the float vectors and the scan stays "
    "JVM-side), exact float re-rank to top-10. The half-up codebook "
    "(ss04) is engine-portable, so unlike LSH/IVF this quantized ANN "
    "path is fully hash-checked",
    tags=("similarity", "ann", "quantization"),
)
def ss08_quantized_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.similarity import (
        cosine,
        dot,
        int8_quantize,
        int8_scale,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    # query-side quantization, driver-side: same IEEE-754 double ops
    # as the corpus-side expressions
    import math

    scale_q = max(max(abs(float(x)) for x in q), 1e-30) / 127.0
    codes_q = [float(math.floor(float(x) / scale_q + 0.5)) for x in q]
    qc = F.array(*[F.lit(c) for c in codes_q])

    scale_c = int8_scale(F.col("embedding"))
    codes_c = int8_quantize(F.col("embedding"), scale_c)
    qscore = F.round(
        dot(codes_c, qc) * scale_c * F.lit(scale_q), 6
    ).alias("qscore")
    coarse = (
        emb.select("vec_id", "embedding", qscore)
        .orderBy(F.desc("qscore"), F.asc("vec_id"))
        .limit(50)
    )
    qfull = F.array(*[F.lit(float(x)) for x in q])
    return (
        coarse.select(
            "vec_id",
            "qscore",
            F.round(cosine(F.col("embedding"), qfull), 4).alias(
                "cosine_sim"
            ),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "ss09_filtered_topk",
    oracle="""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb
        FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
        SELECT q.q_id, e.vec_id,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.q_emb::DOUBLE[]), 4) AS sim
        FROM embeddings e, q
        WHERE e.vec_id <> q.q_id AND e.label IN (0, 1, 2)
    )
    SELECT q_id, vec_id, sim FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY sim DESC, vec_id
        ) AS r FROM scored
    ) WHERE r <= 5
    """,
    note="pre-filtered vector search (the vector-DB 'filtered ANN' "
    "shape): the metadata predicate (label IN ...) prunes the corpus "
    "BEFORE any scoring — pushed to the parquet scan, so at 100 TB "
    "only matching row groups are read — then exact top-5 per probe "
    "over the survivors. Post-filtering an unfiltered ANN result "
    "under-fills k when the filter is selective; pre-filtering never "
    "does",
    tags=("similarity", "topk", "filtered"),
)
def ss09_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.similarity import batch_cosine_topk_literal

    emb = load_table(spark, sf_dir, "embeddings")
    probes = [
        (r.vec_id, r.embedding)
        for r in emb.where(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ]
    filtered = emb.where(F.col("label").isin(0, 1, 2))
    return batch_cosine_topk_literal(
        filtered, "embedding", "vec_id", probes, k=5, n_salt=64
    )


@register(
    "ss10_hybrid_rrf",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
        FROM documents
    ),
    n AS (SELECT COUNT(*) * 1.0 AS n_docs FROM documents),
    dfs AS (SELECT term, COUNT(*) AS df FROM tok GROUP BY term),
    ptok AS (
        SELECT doc_id AS q_id, term FROM tok WHERE doc_id IN (3, 11, 23, 37)
    ),
    kw_scored AS (
        SELECT p.q_id, t.doc_id,
               CAST(SUM(CAST(ROUND(ln(n_docs / df) ^ 2, 6)
                             AS DECIMAL(30,6))) AS DOUBLE) AS kw_score
        FROM ptok p
        JOIN tok t ON p.term = t.term AND t.doc_id <> p.q_id
        JOIN dfs d ON d.term = p.term
        CROSS JOIN n
        GROUP BY p.q_id, t.doc_id
    ),
    kw AS (
        SELECT q_id, doc_id, kw_rank FROM (
            SELECT q_id, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id
                       ORDER BY ROUND(kw_score, 4) DESC, doc_id
                   ) AS kw_rank
            FROM kw_scored
        ) WHERE kw_rank <= 20
    ),
    vec_scored AS (
        SELECT q.vec_id AS q_id, e.vec_id AS doc_id,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[]), 4) AS sim
        FROM embeddings e
        JOIN embeddings q
          ON q.vec_id IN (3, 11, 23, 37) AND e.vec_id <> q.vec_id
    ),
    vec AS (
        SELECT q_id, doc_id, vec_rank FROM (
            SELECT q_id, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY sim DESC, doc_id
                   ) AS vec_rank
            FROM vec_scored
        ) WHERE vec_rank <= 20
    ),
    fused AS (
        SELECT COALESCE(k.q_id, v.q_id) AS q_id,
               COALESCE(k.doc_id, v.doc_id) AS doc_id,
               COALESCE(k.kw_rank, -1) AS kw_rank,
               COALESCE(v.vec_rank, -1) AS vec_rank,
               ROUND(COALESCE(1.0 / (60 + k.kw_rank), 0)
                     + COALESCE(1.0 / (60 + v.vec_rank), 0), 6) AS rrf
        FROM kw k
        FULL OUTER JOIN vec v ON k.q_id = v.q_id AND k.doc_id = v.doc_id
    )
    SELECT q_id, doc_id, kw_rank, vec_rank, rrf FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY rrf DESC, doc_id
        ) AS r FROM fused
    ) WHERE r <= 10
    """,
    note="hybrid retrieval with reciprocal-rank fusion (the RAG "
    "serving shape): keyword side = idf^2-weighted token-overlap "
    "scored through an inverted-index equi-join (candidates share a "
    "token with the probe, never all-pairs), vector side = exact "
    "cosine top-20 over broadcast literal probes; both rankings use "
    "rounded scores + id tiebreaks, fused by 1/(60+rank) — every "
    "per-term idf contribution rounded then decimal-summed so the "
    "score is order-independent across engines. Window top-ks are "
    "salted two-stage on the Spark side (bounded sorts)",
    tags=("similarity", "hybrid", "rrf", "retrieval"),
)
def ss10_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from cdc_spark.operators.similarity import (
        _salted_topk,
        batch_cosine_topk_literal,
    )
    from cdc_spark.operators.text import tokens
    from cdc_spark.queries.base import dsum

    probe_ids = [3, 11, 23, 37]
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    tok = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("term"),
    )
    n_agg = docs.agg(F.count("*").cast("double").alias("__n"))
    # Corpus-dfs shuffle form (round 14: the round-13 "probe-bounded"
    # arm — semi-join the token table to the broadcast probe
    # vocabulary, aggregate dfs over the restriction, broadcast dfs —
    # was adopted as a same-box wash for its scale shape, but the r13
    # driver row regressed +32% normalized and a round-14 controlled
    # A/B reproduced it: 2.37/2.39 s vs 2.10/2.20 s (alternating
    # min-of-5, two rounds, one session). Mechanism: the broadcast dfs
    # serializes a dedicated corpus token pass before the main pass,
    # where this form computes dfs and the candidate join in ONE
    # parallel DAG sharing the token exchange. Reverted per the r13
    # verdict's own criterion; outputs are hash-identical either way.
    dfs = tok.groupBy("term").agg(F.count("*").alias("df"))
    ptok = tok.where(F.col("doc_id").isin(probe_ids)).select(
        F.col("doc_id").alias("q_id"), "term"
    )
    idf2 = F.round(F.pow(F.log(F.col("__n") / F.col("df")), 2), 6)
    cand = (
        ptok.join(tok, "term")
        .where(F.col("doc_id") != F.col("q_id"))
        .join(dfs, "term")
        .crossJoin(F.broadcast(n_agg))
        .select("q_id", "doc_id", idf2.alias("idf2"))
    )
    kw_scored = cand.groupBy("q_id", "doc_id").agg(
        F.round(dsum("idf2", scale=6), 4).alias("sim")
    )
    wk = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("doc_id"))
    kw = (
        _salted_topk(kw_scored, "q_id", "doc_id", k=20, n_salt=16)
        .withColumn("kw_rank", F.row_number().over(wk))
        .select("q_id", "doc_id", "kw_rank")
    )

    probes = [
        (r.vec_id, r.embedding)
        for r in emb.where(F.col("vec_id").isin(probe_ids))
        .select("vec_id", "embedding")
        .collect()
    ]
    wv = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    vec = (
        batch_cosine_topk_literal(emb, "embedding", "vec_id", probes, k=20)
        .withColumn("vec_rank", F.row_number().over(wv))
        .select("q_id", F.col("vec_id").alias("doc_id"), "vec_rank")
    )

    fused = kw.join(vec, ["q_id", "doc_id"], "full_outer").select(
        "q_id",
        "doc_id",
        F.coalesce(F.col("kw_rank"), F.lit(-1)).alias("kw_rank"),
        F.coalesce(F.col("vec_rank"), F.lit(-1)).alias("vec_rank"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("kw_rank")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(60) + F.col("vec_rank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("__r", F.row_number().over(wf))
        .where(F.col("__r") <= 10)
        .drop("__r")
    )


@register(
    "ss11_mips_topk",
    oracle="""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb
        FROM embeddings WHERE vec_id IN (2, 19)
    ),
    scored AS (
        SELECT q.q_id, e.vec_id,
               ROUND(list_dot_product(e.embedding::DOUBLE[],
                                      q.q_emb::DOUBLE[]), 4) AS ip
        FROM embeddings e, q
        WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, ip FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY ip DESC, vec_id
        ) AS r FROM scored
    ) WHERE r <= 10
    """,
    note="maximum-inner-product search (the recommender serving "
    "score, where vector norm IS signal — popular items win): exact "
    "top-10 by dot product for 2 literal probes, salted two-stage "
    "ranking on the rounded score. The query ALSO runs the published "
    "norm-augmentation reduction (Neyshabur & Srebro 2015, "
    "arXiv:1410.5518: v' = [v, sqrt(M^2-|v|^2)], q' = [q, 0] turns "
    "argmax-IP into argmax-cosine, unlocking every cosine-ANN index "
    "for MIPS) and ASSERTS both rankings agree before returning — "
    "the reduction itself is verified in-query",
    tags=("similarity", "mips", "topk"),
)
def ss11_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from pyspark.sql import Window

    from cdc_spark.operators.similarity import _salted_topk, dot

    probe_ids = [2, 19]
    emb = load_table(spark, sf_dir, "embeddings")
    probes = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id").isin(probe_ids))
        .select("vec_id", "embedding")
        .collect()
    ]
    probe_arr = F.array(
        *[
            F.struct(
                F.lit(int(qid)).cast("long").alias("q_id"),
                F.array(*[F.lit(x) for x in vec]).alias("q_emb"),
            )
            for qid, vec in probes
        ]
    )
    scored = (
        emb.select(
            "vec_id", "embedding", F.explode(probe_arr).alias("__q")
        )
        .where(F.col("vec_id") != F.col("__q.q_id"))
        .select(
            F.col("__q.q_id").alias("q_id"),
            F.col("vec_id"),
            F.round(
                dot(F.col("embedding"), F.col("__q.q_emb")), 4
            ).alias("sim"),
        )
    )
    mips = _salted_topk(scored, "q_id", "vec_id", k=10, n_salt=64)

    # Norm-augmentation reduction, self-verified: the augmented-cosine
    # ranking must agree with the direct-IP ranking (M = max corpus
    # norm, a bounded 1-row aggregate collected driver-side)
    from cdc_spark.operators.similarity import cosine, norm

    m2 = (
        emb.agg(F.max(dot(F.col("embedding"), F.col("embedding"))))
        .first()[0]
    )
    aug = emb.select(
        "vec_id",
        F.concat(
            F.col("embedding").cast("array<double>"),
            F.array(
                F.sqrt(
                    F.greatest(
                        F.lit(m2)
                        - dot(F.col("embedding"), F.col("embedding")),
                        F.lit(0.0),
                    )
                )
            ),
        ).alias("aug_emb"),
    )
    aug_scored = (
        aug.select(
            "vec_id", "aug_emb", F.explode(probe_arr).alias("__q")
        )
        .where(F.col("vec_id") != F.col("__q.q_id"))
        .select(
            F.col("__q.q_id").alias("q_id"),
            F.col("vec_id"),
            # q' = [q, 0]: the appended coordinate contributes nothing,
            # so cosine(q', v') ranks exactly by dot(q, v)
            F.round(
                dot(
                    F.col("aug_emb"),
                    F.concat(
                        F.col("__q.q_emb").cast("array<double>"),
                        F.array(F.lit(0.0)),
                    ),
                )
                / (norm(F.col("aug_emb")) * F.lit(math.sqrt(m2))),
                6,
            ).alias("sim"),
        )
    )
    aug_top = _salted_topk(aug_scored, "q_id", "vec_id", k=10, n_salt=64)
    got = {
        (r.q_id, r.vec_id)
        for r in aug_top.select("q_id", "vec_id").collect()
    }
    want = {
        (r.q_id, r.vec_id) for r in mips.select("q_id", "vec_id").collect()
    }
    if got != want:
        raise AssertionError(
            f"norm-augmentation reduction diverged from direct MIPS: "
            f"only-aug={sorted(got - want)} only-ip={sorted(want - got)}"
        )
    return mips.select("q_id", "vec_id", F.col("sim").alias("ip"))


def _recall_eval_oracle(
    probes=(0, 7, 13, 21),
    *,
    dim: int = _EMB_DIM,
    n_tables: int = 8,
    n_planes: int = 4,
    seed: int = 11,
    k: int = 10,
) -> str:
    """Per-probe recall@k of the LSH ANN path vs exact — both rankings
    re-derived in SQL (plane literals embedded), so the QUALITY METRIC
    itself is hash-checked, not just asserted in tests."""

    def bucket_expr(t: int, col: str) -> str:
        terms = []
        for i, plane in enumerate(
            hyperplanes(dim, n_planes, seed + 1000 * t)
        ):
            arr = "[" + ",".join(repr(x) for x in plane) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product({col}::DOUBLE[], {arr})"
                f" >= 0 THEN {1 << i} ELSE 0 END)"
            )
        return "(" + " + ".join(terms) + ")"

    parts = []
    for p in probes:
        any_table = "\n               OR ".join(
            f"{bucket_expr(t, 'e.embedding')} = {bucket_expr(t, 'q.qe')}"
            for t in range(n_tables)
        )
        parts.append(f"""
        SELECT {p} AS q_id, COUNT(*) AS n_hits FROM (
            SELECT e.vec_id FROM embeddings e,
                 (SELECT embedding AS qe FROM embeddings
                  WHERE vec_id = {p}) q
            ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                                  q.qe::DOUBLE[]), 4)
                     DESC, e.vec_id
            LIMIT {k}
        ) ex
        WHERE ex.vec_id IN (
            SELECT vec_id FROM (
                SELECT e.vec_id FROM embeddings e,
                     (SELECT embedding AS qe FROM embeddings
                      WHERE vec_id = {p}) q
                WHERE {any_table}
                ORDER BY ROUND(list_cosine_similarity(
                             e.embedding::DOUBLE[], q.qe::DOUBLE[]), 4)
                         DESC, e.vec_id
                LIMIT {k}
            )
        )""")
    union = "\n        UNION ALL\n        ".join(parts)
    return f"""
    SELECT q_id, CAST(n_hits AS BIGINT) AS n_hits,
           ROUND(n_hits / {k}.0, 4) AS recall
    FROM (
        {union}
    )
    """


@register(
    "ss12_ann_recall_eval",
    oracle=_recall_eval_oracle(),
    note="ANN quality evaluation as a first-class gated operator: "
    "recall@10 of the hyperplane-LSH path against the exact ranking "
    "for 4 probes — BOTH rankings (and therefore the metric) "
    "re-derived bit-for-bit by the oracle from the embedded plane "
    "literals. The evaluation harness every vector store needs, "
    "runnable as a query over any corpus slice; deterministic "
    "tiebreaks make recall itself engine-exact",
    tags=("similarity", "ann", "evaluation"),
)
def ss12_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.similarity import ann_lsh_topk, cosine_topk

    probes = [0, 7, 13, 21]
    emb = load_table(spark, sf_dir, "embeddings")
    out = []
    for p in probes:
        q = _query_vector(spark, sf_dir, p)
        exact = cosine_topk(emb, "embedding", "vec_id", q, 10).select(
            "vec_id"
        )
        approx = ann_lsh_topk(emb, "embedding", "vec_id", q, k=10).select(
            "vec_id"
        )
        hits = exact.join(approx, "vec_id", "semi").count()
        out.append((p, hits, round(hits / 10.0, 4)))
    return spark.createDataFrame(
        out, "q_id int, n_hits long, recall double"
    )


def _knn_graph_oracle(
    *,
    dim: int = _EMB_DIM,
    lo: int = 4,
    hi: int = 24,
    target: int = 125,
    seed: int = 11,
    k: int = 3,
) -> str:
    """Sized-partition twin (round 10, same scheme as dd12's oracle):
    the plane count is derived from COUNT(*) with the exact
    ``semantic_dedup_planes`` clamp, and each embedded plane literal
    is gated by its index, so both engines compute identical cells at
    any scale factor."""

    def bucket_expr(col: str) -> str:
        terms = []
        for i, plane in enumerate(hyperplanes(dim, hi, seed)):
            arr = "[" + ",".join(repr(x) for x in plane) + "]"
            terms.append(
                f"(CASE WHEN {i} < kk.planes AND "
                f"list_dot_product({col}::DOUBLE[], {arr})"
                f" >= 0 THEN {1 << i} ELSE 0 END)"
            )
        return "(" + " + ".join(terms) + ")"

    return f"""
    WITH kk AS (
        SELECT GREATEST({lo}, LEAST({hi},
               CAST(CEIL(LOG2(COUNT(*) / {target}.0)) AS INT))) AS planes
        FROM embeddings
    ),
    b AS (
        SELECT vec_id, embedding,
               {bucket_expr("embedding")} AS bucket
        FROM embeddings CROSS JOIN kk
    ),
    scored AS (
        SELECT s.vec_id AS src, d.vec_id AS dst,
               ROUND(list_cosine_similarity(s.embedding::DOUBLE[],
                                            d.embedding::DOUBLE[]), 4)
                   AS sim
        FROM b s JOIN b d
          ON s.bucket = d.bucket AND s.vec_id <> d.vec_id
    )
    SELECT src, dst, sim FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY src ORDER BY sim DESC, dst
        ) AS r FROM scored
    ) WHERE r <= {k}
    """


@register(
    "ss13_knn_graph",
    oracle=_knn_graph_oracle(),
    note="KNN-graph construction — the artifact graph-based ANN "
    "(HNSW/NSG-style serving) and SemDeDup both start from: every "
    "vector's top-3 neighbors computed WITHIN its cluster partition. "
    "Round 10: the partition is SIZED like dd12's — "
    "semantic_dedup_planes(count) gives 2^planes cells ~ n/125, so "
    "per-cell pairwise work stays linear in corpus size (fixed 16 "
    "cells was the n^2/16 shape the round-9 sf1 probe flagged on "
    "dd12); the oracle derives the same plane count from COUNT(*) "
    "with index-gated plane literals. Cross-cluster neighbor misses "
    "remain the documented SemDeDup tradeoff. Per-source ranking "
    "windows partition on the vector id, so no sort exceeds one "
    "vector's candidate list; oracle re-derives the partition and "
    "every edge bit-for-bit",
    tags=("similarity", "knn", "graph"),
)
def ss13_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from cdc_spark.operators.similarity import (
        cosine,
        hyperplanes,
        lsh_bucket,
        semantic_dedup_planes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    planes = hyperplanes(_EMB_DIM, semantic_dedup_planes(emb.count()), 11)
    from cdc_spark.operators.similarity import dot, norm

    # norm hoisted to the n-row projection (the dd12 lesson, measured
    # at the sf10 probe): the within-cell scoring runs ONE array fold
    # per candidate instead of three — same expression tree over the
    # same arrays, bit-identical doubles
    b = emb.select(
        "vec_id",
        "embedding",
        lsh_bucket(F.col("embedding"), planes).alias("bucket"),
        norm(F.col("embedding")).alias("nrm"),
    )
    s, d = b.alias("s"), b.alias("d")
    scored = s.join(
        d,
        (F.col("s.bucket") == F.col("d.bucket"))
        & (F.col("s.vec_id") != F.col("d.vec_id")),
    ).select(
        F.col("s.vec_id").alias("src"),
        F.col("d.vec_id").alias("dst"),
        F.round(
            dot(F.col("s.embedding"), F.col("d.embedding"))
            / (F.col("s.nrm") * F.col("d.nrm")),
            4,
        ).alias("sim"),
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= 3)
        .drop("__r")
    )


@register(
    "ss14_centroid_drift",
    oracle="""
    WITH comp AS (
        SELECT label, u.d, u.x FROM embeddings,
             LATERAL (
                 SELECT generate_subscripts(embedding, 1) AS d,
                        unnest(embedding::DOUBLE[]) AS x
             ) u
    ),
    lab AS (
        -- centroid SUMS, not means: cosine is scale-invariant, and
        -- the decimal sums are exact (no mean-rounding divergence)
        SELECT label, d,
               CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(30,6)))
                    AS DOUBLE) AS m
        FROM comp GROUP BY label, d
    ),
    gmean AS (
        SELECT d,
               CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(30,6)))
                    AS DOUBLE) AS g
        FROM comp GROUP BY d
    ),
    sizes AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
    dots AS (
        SELECT l.label,
               CAST(SUM(CAST(ROUND(l.m * gl.g, 9) AS DECIMAL(30,9)))
                    AS DOUBLE) AS dot,
               CAST(SUM(CAST(ROUND(l.m * l.m, 9) AS DECIMAL(30,9)))
                    AS DOUBLE) AS nl,
               CAST(SUM(CAST(ROUND(gl.g * gl.g, 9) AS DECIMAL(30,9)))
                    AS DOUBLE) AS ng
        FROM lab l JOIN gmean gl ON l.d = gl.d
        GROUP BY l.label
    )
    SELECT d.label, CAST(s.n AS BIGINT) AS n_vectors,
           ROUND(d.dot / (sqrt(d.nl) * sqrt(d.ng)), 4) AS drift_cosine
    FROM dots d JOIN sizes s ON d.label = s.label
    """,
    note="embedding drift monitoring (the vector-store data-quality "
    "check): per-label centroids vs the corpus centroid, cosine per "
    "label — a slice whose centroid swings away from the corpus "
    "flags ingestion drift. Every mean and every dot-product term "
    "is rounded then decimal-summed, so the drift metric itself is "
    "engine-exact at any cluster size; centroids are one "
    "(label, dim) hash aggregate over exploded components",
    tags=("similarity", "monitoring", "drift"),
)
def ss14_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.queries.base import dsum

    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("d0", "x")
    ).select("label", (F.col("d0") + 1).alias("d"), "x")
    # centroid SUMS, not means: cosine is scale-invariant and the
    # decimal sums are exact on both engines
    lab = comp.groupBy("label", "d").agg(
        dsum(F.round("x", 6), scale=6).alias("m")
    )
    glob = comp.groupBy("d").agg(
        dsum(F.round("x", 6), scale=6).alias("g")
    )
    sizes = emb.groupBy("label").agg(F.count("*").alias("n"))
    j = lab.join(glob, "d")
    dots = j.groupBy("label").agg(
        dsum(F.round(F.col("m") * F.col("g"), 9), scale=9).alias("dot"),
        dsum(F.round(F.col("m") * F.col("m"), 9), scale=9).alias("nl"),
        dsum(F.round(F.col("g") * F.col("g"), 9), scale=9).alias("ng"),
    )
    return dots.join(sizes, "label").select(
        "label",
        F.col("n").cast("long").alias("n_vectors"),
        F.round(
            F.col("dot") / (F.sqrt(F.col("nl")) * F.sqrt(F.col("ng"))), 4
        ).alias("drift_cosine"),
    )


def _pq_adc_oracle(
    *, m: int = 8, d_sub: int = 8, k_cent: int = 16, scale: int = 64,
    k: int = 10,
) -> str:
    """DuckDB twin of the PQ/ADC path: codebook (first-16-by-id
    subvectors, half-up integer codes), per-subspace encoding argmin,
    the query's m x k distance LUT, and the ADC fold are ALL
    recomputed in SQL — squared distances via the integer-dot identity
    ||x-c||^2 = x.x - 2 x.c + c.c, exact in any summation order."""
    lo, hi = f"1+{d_sub}*", f"{d_sub}+{d_sub}*"
    return f"""
    WITH iq AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) * {scale} + 0.5)) AS e
        FROM embeddings
    ),
    sp AS (SELECT unnest(generate_series(0, {m - 1})) AS s),
    cb AS (
        SELECT sp.s, iq.vec_id AS cid,
               iq.e[{lo}sp.s : {hi}sp.s] AS c
        FROM iq, sp WHERE iq.vec_id < {k_cent}
    ),
    codes AS (
        SELECT vec_id, s, cid AS code FROM (
            SELECT iq.vec_id, cb.s, cb.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY iq.vec_id, cb.s
                       ORDER BY list_inner_product(cb.c, cb.c)
                                - 2 * list_inner_product(
                                      iq.e[{lo}cb.s : {hi}cb.s], cb.c),
                                cb.cid
                   ) AS rn
            FROM iq, cb
        ) WHERE rn = 1
    ),
    qv AS (SELECT e AS qe FROM iq WHERE vec_id = 0),
    lut AS (
        SELECT cb.s, cb.cid,
               list_inner_product(qv.qe[{lo}cb.s : {hi}cb.s],
                                  qv.qe[{lo}cb.s : {hi}cb.s])
               - 2 * list_inner_product(qv.qe[{lo}cb.s : {hi}cb.s], cb.c)
               + list_inner_product(cb.c, cb.c) AS d
        FROM cb, qv
    )
    SELECT vec_id, adc_dist FROM (
        SELECT codes.vec_id, CAST(SUM(lut.d) AS BIGINT) AS adc_dist
        FROM codes JOIN lut ON codes.s = lut.s AND codes.code = lut.cid
        GROUP BY codes.vec_id
    ) ORDER BY adc_dist, vec_id LIMIT {k}
    """


@register(
    "ss15_pq_adc_topk",
    oracle=_pq_adc_oracle(),
    note="product-quantization ANN (the billion-scale memory shape): "
    "8 subspaces x 16 deterministic integer centroids encode each "
    "vector as 8 one-byte codes (16x compression vs float32); the "
    "query precomputes one 8x16 integer distance LUT and every "
    "corpus row scores as 8 table lookups over its codes — a "
    "compressed-domain scan with no float math and no full-vector "
    "read. Codebook, encoding argmin, LUT and ADC fold are all "
    "exact integers, so the ENTIRE PQ path is hash-checked in SQL "
    "(the ss03/ss06 technique extended to subspace quantization)",
    tags=("similarity", "ann", "pq", "quantization"),
)
def ss15_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.ivf import pq_adc_topk, pq_codebook

    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    codebook = pq_codebook(
        emb, "embedding", "vec_id", dim=_EMB_DIM, m=8, k=16, scale=64
    )
    return pq_adc_topk(
        emb, "embedding", "vec_id", q, codebook, k=10, scale=64
    )


@register(
    "ss16_pq_persisted_index",
    oracle=_pq_adc_oracle(),
    note="persisted PQ code index (the storage half of IVF-PQ "
    "serving): the corpus stores ONLY id + 8 one-byte codes (16x "
    "smaller scan than the float vectors) with the frozen integer "
    "codebook in a sidecar; queries fold the ADC LUT over the code "
    "columns and never read an embedding byte. Built from the first "
    "half of the corpus then INCREMENTALLY extended with the second "
    "half (append-only against the frozen codebook — O(batch), "
    "existing code files untouched); the probe result hash-matches "
    "ss15's one-shot encoding of the full corpus, proving the "
    "incremental build converges to the same index",
    tags=("similarity", "ann", "pq", "index", "incremental"),
)
def ss16_pq_persisted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from cdc_spark.operators.ivf import PqIndex, pq_codebook

    emb = load_table(spark, sf_dir, "embeddings")
    mid = emb.agg(
        F.percentile_approx("vec_id", 0.5, 1).cast("long")
    ).first()[0]
    codebook = pq_codebook(
        emb, "embedding", "vec_id", dim=_EMB_DIM, m=8, k=16, scale=64
    )
    idx = PqIndex.build(
        spark,
        tempfile.mkdtemp(prefix="ss16_pq_"),
        emb.where(F.col("vec_id") <= mid),
        "embedding",
        "vec_id",
        codebook=codebook,
        scale=64,
    )
    idx.add(emb.where(F.col("vec_id") > mid))
    q = _query_vector(spark, sf_dir, 0)
    return idx.topk(q, k=10)


def _ivfpq_oracle(
    *,
    k_coarse: int = 16,
    n_probe: int = 4,
    m: int = 8,
    d_sub: int = 8,
    k_cent: int = 16,
    scale: int = 64,
    k: int = 10,
    meta_filter: str | None = None,
) -> str:
    """DuckDB twin of the combined IVF-PQ layout: coarse assignment +
    probe pruning (ss03's integer argmax) restrict the candidate set,
    then PQ encoding + ADC ranking (ss15's integer identity) order
    it — the whole two-quantizer pipeline recomputed in SQL.
    ``meta_filter`` (e.g. ``em.label = 3``) narrows the candidate set
    by a metadata predicate — the filtered-ANN twin (ss23)."""
    lo, hi = f"1+{d_sub}*", f"{d_sub}+{d_sub}*"
    meta_join = (
        f"JOIN embeddings em ON em.vec_id = iq.vec_id "
        f"AND ({meta_filter})"
        if meta_filter
        else ""
    )
    return f"""
    WITH iq AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) * {scale} + 0.5)) AS e
        FROM embeddings
    ),
    coarse AS (
        SELECT vec_id AS ccid, e AS c FROM iq WHERE vec_id < {k_coarse}
    ),
    qv AS (SELECT e AS qe FROM iq WHERE vec_id = 0),
    probes AS (
        SELECT ccid FROM (
            SELECT coarse.ccid,
                   ROW_NUMBER() OVER (
                       ORDER BY list_dot_product(coarse.c, qv.qe) DESC,
                                coarse.ccid
                   ) AS rn
            FROM coarse, qv
        ) WHERE rn <= {n_probe}
    ),
    assigned AS (
        SELECT vec_id, ccid FROM (
            SELECT iq.vec_id, coarse.ccid,
                   ROW_NUMBER() OVER (
                       PARTITION BY iq.vec_id
                       ORDER BY list_dot_product(iq.e, coarse.c) DESC,
                                coarse.ccid
                   ) AS rn
            FROM iq, coarse
        ) WHERE rn = 1
    ),
    cand AS (
        SELECT iq.vec_id, iq.e FROM iq
        JOIN assigned a ON iq.vec_id = a.vec_id
        JOIN probes p ON a.ccid = p.ccid
        {meta_join}
    ),
    sp AS (SELECT unnest(generate_series(0, {m - 1})) AS s),
    cb AS (
        SELECT sp.s, iq.vec_id AS cid,
               iq.e[{lo}sp.s : {hi}sp.s] AS c
        FROM iq, sp WHERE iq.vec_id < {k_cent}
    ),
    codes AS (
        SELECT vec_id, s, cid AS code FROM (
            SELECT cand.vec_id, cb.s, cb.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY cand.vec_id, cb.s
                       ORDER BY list_inner_product(cb.c, cb.c)
                                - 2 * list_inner_product(
                                      cand.e[{lo}cb.s : {hi}cb.s], cb.c),
                                cb.cid
                   ) AS rn
            FROM cand, cb
        ) WHERE rn = 1
    ),
    lut AS (
        SELECT cb.s, cb.cid,
               list_inner_product(qv.qe[{lo}cb.s : {hi}cb.s],
                                  qv.qe[{lo}cb.s : {hi}cb.s])
               - 2 * list_inner_product(qv.qe[{lo}cb.s : {hi}cb.s], cb.c)
               + list_inner_product(cb.c, cb.c) AS d
        FROM cb, qv
    )
    SELECT vec_id, adc_dist FROM (
        SELECT codes.vec_id, CAST(SUM(lut.d) AS BIGINT) AS adc_dist
        FROM codes JOIN lut ON codes.s = lut.s AND codes.code = lut.cid
        GROUP BY codes.vec_id
    ) ORDER BY adc_dist, vec_id LIMIT {k}
    """


@register(
    "ss17_ivfpq_index",
    oracle=_ivfpq_oracle(),
    note="IVF-PQ — the production billion-scale ANN layout (public "
    "FAISS IVFPQ shape as a lake layout): code files PARTITIONED BY "
    "coarse cluster, so a probe prunes to 4 of 16 cluster "
    "directories at planning time AND scans only id + 8 one-byte "
    "codes inside them — (n_probe/k) x (1/16) of the corpus bytes, "
    "no embedding read. Both quantizers deterministic integers, so "
    "coarse assignment, partition pruning, PQ encoding and ADC "
    "ranking are ALL recomputed by the oracle",
    tags=("similarity", "ann", "ivf", "pq", "index"),
)
def ss17_ivfpq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from cdc_spark.operators.ivf import (
        IvfPqIndex,
        deterministic_codebook,
        pq_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    coarse = deterministic_codebook(
        emb, "embedding", "vec_id", k=16, scale=64
    )
    codebook = pq_codebook(
        emb, "embedding", "vec_id", dim=_EMB_DIM, m=8, k=16, scale=64
    )
    idx = IvfPqIndex.build(
        spark,
        tempfile.mkdtemp(prefix="ss17_ivfpq_"),
        emb,
        "embedding",
        "vec_id",
        coarse=coarse,
        codebook=codebook,
        scale=64,
    )
    q = _query_vector(spark, sf_dir, 0)
    return idx.topk(q, k=10, n_probe=4)


def _bq_oracle(*, dim: int = 64, coarse_k: int = 64, k: int = 10) -> str:
    """DuckDB twin of binary quantization: sign-bit pack each vector
    into ONE BIGINT (bit 63 via the signed min-long literal, the mm03
    trick), Hamming = popcount(xor), exact-cosine rerank of the
    Hamming top-``coarse_k``."""
    min_long = "(-9223372036854775807 - 1)"
    bits = " + ".join(
        (
            f"(CASE WHEN CAST(embedding[{i + 1}] AS DOUBLE) >= 0 THEN "
            + (min_long if i == 63 else str(1 << i))
            + " ELSE 0 END)"
        )
        for i in range(dim)
    )
    return f"""
    WITH bq AS (
        SELECT vec_id, embedding, CAST({bits} AS BIGINT) AS code
        FROM embeddings
    ),
    qv AS (SELECT code AS qc, embedding AS qe FROM bq WHERE vec_id = 0),
    coarse AS (
        SELECT bq.vec_id, bq.embedding,
               bit_count(xor(bq.code, qv.qc)) AS hamming
        FROM bq, qv
        ORDER BY hamming, bq.vec_id
        LIMIT {coarse_k}
    )
    SELECT c.vec_id,
           CAST(c.hamming AS INT) AS hamming,
           ROUND(list_cosine_similarity(c.embedding::DOUBLE[],
                                        qv.qe::DOUBLE[]), 4) AS cosine_sim
    FROM coarse c, qv
    ORDER BY cosine_sim DESC, c.vec_id
    LIMIT {k}
    """


@register(
    "ss18_binary_quantization",
    oracle=_bq_oracle(),
    note="binary quantization — the third compression tier beside "
    "int8 (ss04) and PQ (ss15): each 64-dim float vector packs to "
    "ONE sign-bit BIGINT (32x smaller than float32), coarse search "
    "is popcount(xor) Hamming distance — pure register arithmetic, "
    "the fastest possible scan over a compressed corpus — and the "
    "Hamming top-64 rerank exactly by full-precision cosine (the "
    "two-stage shape every modern vector store uses for BQ). "
    "Bit-packing, Hamming and the rerank are all recomputed by the "
    "oracle",
    tags=("similarity", "quantization", "binary", "rerank"),
)
def ss18_binary_quantization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cdc_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    code = F.lit(0).cast("long")
    for i in range(_EMB_DIM):
        code = code + F.when(
            F.element_at(F.col("embedding"), i + 1).cast("double") >= 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
    bq = emb.select("vec_id", "embedding", code.alias("code"))
    q = bq.where(F.col("vec_id") == 0).first()
    qc, qe = q["code"], q["embedding"]
    coarse = (
        bq.select(
            "vec_id",
            "embedding",
            F.bit_count(F.col("code").bitwiseXOR(F.lit(qc))).alias(
                "hamming"
            ),
        )
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(64)
    )
    return (
        coarse.select(
            "vec_id",
            F.col("hamming").cast("int"),
            F.round(
                cosine(
                    F.col("embedding"),
                    F.array(*[F.lit(float(x)) for x in qe]),
                ),
                4,
            ).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
    )


def _lsh_radius_oracle(
    *,
    dim: int = _EMB_DIM,
    n_tables: int = 8,
    n_planes: int = 4,
    seed: int = 11,
    threshold: float = 0.15,
) -> str:
    """DuckDB twin of the LSH radius search: same seeded planes and
    bucket filter as ss02, the threshold applied to the ROUNDED
    cosine (matching the operator's rounded output exactly)."""

    def bucket_expr(t: int, col: str) -> str:
        terms = []
        for i, plane in enumerate(
            hyperplanes(dim, n_planes, seed + 1000 * t)
        ):
            arr = "[" + ",".join(repr(x) for x in plane) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product({col}::DOUBLE[], {arr})"
                f" >= 0 THEN {1 << i} ELSE 0 END)"
            )
        return "(" + " + ".join(terms) + ")"

    any_table = "\n           OR ".join(
        f"{bucket_expr(t, 'e.embedding')} = {bucket_expr(t, 'q.qe')}"
        for t in range(n_tables)
    )
    return f"""
    WITH q AS (
        SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                        q.qe::DOUBLE[]), 4) AS cosine_sim
    FROM embeddings e, q
    WHERE ({any_table})
      AND ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                       q.qe::DOUBLE[]), 4) >= {threshold}
    """


@register(
    "ss19_radius_search",
    oracle=_lsh_radius_oracle(),
    note="radius (range) vector search — the serving twin of top-k: "
    "ALL corpus vectors within cosine >= 0.15 of the probe, not a "
    "fixed k (the 'find every near-duplicate of this item' query "
    "dedup review tools issue). Candidates come from the same "
    "multi-table hyperplane LSH filter as ss02 (bucket collisions, "
    "never a full scan at the index layout), then the exact rounded "
    "cosine threshold verifies; the oracle re-derives planes, "
    "buckets and the threshold filter. Result cardinality is "
    "data-dependent — exactly why radius search needs the LSH "
    "prefilter at scale where top-k could at least bound its scan",
    tags=("similarity", "radius", "lsh"),
)
def ss19_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.similarity import lsh_radius_search

    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    return lsh_radius_search(
        emb, "embedding", "vec_id", q, threshold=0.15
    )


def _pq_refine_oracle(*, n_cand: int = 50, k: int = 10) -> str:
    """DuckDB twin of the two-stage refine: the full ADC oracle
    (codebook, encoding, LUT fold) shortlists ``n_cand`` by
    compressed distance, then the exact rounded cosine re-ranks."""
    inner = _pq_adc_oracle(k=n_cand)
    return f"""
    WITH cand AS ({inner}),
    qv2 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                        qv2.qe::DOUBLE[]), 4)
               AS cosine_sim
    FROM embeddings e JOIN cand USING (vec_id), qv2
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT {k}
    """


@register(
    "ss20_pq_refine_rerank",
    oracle=_pq_refine_oracle(),
    note="two-stage refine (the FAISS IndexRefine serving pattern): "
    "the compressed-domain ADC scan shortlists 50 candidates reading "
    "ONLY 8-byte codes, then the exact cosine re-ranks just those 50 "
    "full vectors — the standard recall-repair for PQ's quantization "
    "error. At 100 TB the expensive float read touches 50 rows "
    "regardless of corpus size (candidate ids broadcast into the "
    "vector fetch); BOTH stages are deterministic, so the entire "
    "shortlist-then-refine pipeline hash-checks against SQL",
    tags=("similarity", "ann", "pq", "rerank"),
)
def ss20_pq_refine_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.ivf import pq_adc_topk, pq_codebook
    from cdc_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    codebook = pq_codebook(
        emb, "embedding", "vec_id", dim=_EMB_DIM, m=8, k=16, scale=64
    )
    cand = pq_adc_topk(
        emb, "embedding", "vec_id", q, codebook, k=50, scale=64
    ).select("vec_id")
    qlit = F.array(*[F.lit(float(x)) for x in q])
    return (
        emb.join(F.broadcast(cand), "vec_id")
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), qlit), 4).alias(
                "cosine_sim"
            ),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
    )


def _maxsim_oracle(
    *, n_tok: int = 4, d_tok: int = 16, k: int = 10
) -> str:
    """DuckDB twin of MaxSim: per query token, GREATEST over the doc
    token dot products on the same 1-based list slices."""

    def dot(qt: int, dt: int) -> str:
        qa, qb = qt * d_tok + 1, (qt + 1) * d_tok
        da, db = dt * d_tok + 1, (dt + 1) * d_tok
        return (
            f"list_dot_product(e.embedding[{da}:{db}]::DOUBLE[],"
            f" q.qe[{qa}:{qb}]::DOUBLE[])"
        )

    per_qt = " + ".join(
        "GREATEST("
        + ", ".join(dot(qt, dt) for dt in range(n_tok))
        + ")"
        for qt in range(n_tok)
    )
    return f"""
    WITH q AS (
        SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id, ROUND({per_qt}, 4) AS maxsim
    FROM embeddings e, q
    ORDER BY maxsim DESC, e.vec_id
    LIMIT {k}
    """


@register(
    "ss21_maxsim_multivector",
    oracle=_maxsim_oracle(),
    note="multi-vector late-interaction retrieval (the ColBERT MaxSim "
    "shape, public literature): each side's embedding is treated as "
    "4 token vectors of 16 dims; score = sum over query tokens of "
    "the MAX dot product against any doc token. All 16 token-pair "
    "dot products are flat codegen'd double arithmetic from the "
    "broadcast query literals — one scan, no shuffle before the "
    "top-k, per-row work bounded by token_count^2, which is exactly "
    "why MaxSim serves at corpus scale where cross-attention cannot",
    tags=("similarity", "multivector", "maxsim"),
)
def ss21_maxsim_multivector(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    n_tok, d_tok = 4, 16
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)

    def dot(qt: int, dt: int) -> str:
        terms = " + ".join(
            f"(CAST(element_at(embedding, {dt * d_tok + j + 1}) AS"
            f" DOUBLE) * {float(q[qt * d_tok + j])!r}D)"
            for j in range(d_tok)
        )
        return f"({terms})"

    per_qt = " + ".join(
        "GREATEST("
        + ", ".join(dot(qt, dt) for dt in range(n_tok))
        + ")"
        for qt in range(n_tok)
    )
    return (
        emb.selectExpr(
            "vec_id", f"ROUND({per_qt}, 4) AS maxsim"
        )
        .orderBy(F.desc("maxsim"), F.asc("vec_id"))
        .limit(10)
    )


def _nprobe_sweep_oracle(
    n_probes=(1, 2, 4, 8), *, k: int = 10
) -> str:
    """Recall@k of the deterministic IVF path per n_probe: the full
    IVF oracle (assignment, probe pruning, ranking) re-run as a
    subquery at each sweep point against the exact ranking."""
    parts = []
    for np_ in n_probes:
        ivf_sql = _ivf_det_oracle(n_probe=np_, k=k)
        parts.append(f"""
        SELECT CAST({np_} AS BIGINT) AS n_probe,
               CAST(COUNT(*) AS BIGINT) AS n_hits,
               ROUND(COUNT(*) / {k}.0, 4) AS recall
        FROM (
            SELECT e.vec_id FROM embeddings e,
                 (SELECT embedding AS qe FROM embeddings
                  WHERE vec_id = 0) q
            ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                                  q.qe::DOUBLE[]), 4)
                     DESC, e.vec_id
            LIMIT {k}
        ) ex
        WHERE ex.vec_id IN (SELECT vec_id FROM ({ivf_sql}))
        """)
    return "\nUNION ALL\n".join(parts)


@register(
    "ss22_ivf_nprobe_sweep",
    oracle=_nprobe_sweep_oracle(),
    note="recall-vs-cost sweep of the IVF probe knob (the tuning "
    "curve every vector-store operator reads before fixing n_probe "
    "in production): recall@10 of the deterministic-codebook IVF "
    "path at n_probe = 1, 2, 4, 8 against the exact ranking. Probing "
    "n of 16 clusters scans ~n/16 of the corpus, so this curve IS "
    "the cost/quality trade; every sweep point is recomputed "
    "bit-for-bit by the oracle (integer assignment + pruning), "
    "extending the ss12 harness idea from LSH to IVF",
    tags=("similarity", "ann", "ivf", "evaluation"),
)
def ss22_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.ivf import deterministic_codebook, ivf_topk
    from cdc_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    codebook = deterministic_codebook(
        emb, "embedding", "vec_id", k=16, scale=64
    )
    exact = cosine_topk(emb, "embedding", "vec_id", q, 10).select(
        "vec_id"
    )
    out = []
    for np_ in (1, 2, 4, 8):
        approx = ivf_topk(
            emb,
            "embedding",
            "vec_id",
            q,
            codebook,
            k=10,
            n_probe=np_,
            scale=64,
        ).select("vec_id")
        hits = exact.join(approx, "vec_id", "semi").count()
        out.append((np_, hits, round(hits / 10.0, 4)))
    return spark.createDataFrame(
        out, "n_probe long, n_hits long, recall double"
    )


@register(
    "ss23_filtered_ivfpq_probe",
    oracle=_ivfpq_oracle(n_probe=8, meta_filter="em.label = 3"),
    note="FILTERED ANN on the IVF-PQ index (the hardest production "
    "serving shape: 'nearest neighbors WHERE license = permissive'): "
    "the index carries filterable metadata INSIDE its code files, so "
    "the predicate evaluates within the pruned partition scan — "
    "never a join back to the corpus, never a post-filter that "
    "starves top-k below k. n_probe doubles to 8 to compensate for "
    "filter selectivity (the standard filtered-ANN recall trade, "
    "made explicit). Both quantizers + the predicate recompute in "
    "SQL, so even this combined shape hash-checks",
    tags=("similarity", "ann", "ivfpq", "filtered"),
)
def ss23_filtered_ivfpq_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from cdc_spark.operators.ivf import (
        IvfPqIndex,
        deterministic_codebook,
        pq_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    coarse = deterministic_codebook(
        emb, "embedding", "vec_id", k=16, scale=64
    )
    codebook = pq_codebook(
        emb, "embedding", "vec_id", dim=_EMB_DIM, m=8, k=16, scale=64
    )
    idx = IvfPqIndex.build(
        spark,
        tempfile.mkdtemp(prefix="ss23_idx_"),
        emb,
        "embedding",
        "vec_id",
        coarse=coarse,
        codebook=codebook,
        scale=64,
        meta_cols=("label",),
    )
    q = _query_vector(spark, sf_dir, 0)
    return idx.topk(q, k=10, n_probe=8, where=F.col("label") == 3)
