"""Deduplication suite for training-data pipelines.

Five strategies, each with its scale story (100 TB = billions of docs):

- **exact**: group by a 128-bit content hash (never by the raw text —
  grouping keys must be fixed-width at scale), keep min id.
- **MinHash + LSH**: shingle → 64-bit hashes → k-permutation MinHash
  signature → banded LSH buckets → candidate pairs only within
  buckets → exact-Jaccard verification of candidates. All built-in
  higher-order array functions; the only joins are bucket-equi-joins,
  so the cost is O(candidates), not O(n²).
- **SimHash**: 32-bit sign-aggregated token-hash fingerprint; near-dup
  iff Hamming distance ≤ d. Banding on bit-slices gives the same
  bucket-join shape.
- **n-gram Jaccard (exact)**: distinct-shingle explode + self-join on
  shingle + count ratio — exact but O(shared-shingle pairs); the
  verifier behind MinHash, or standalone at moderate scale.
- **embedding cosine**: see cdc_spark.operators.similarity.

Signatures/fingerprints default to xxhash64 (JVM-native, fastest).
``portable=True`` switches the shingle hash to an md5-derived 60-bit
value (``conv(substr(md5(s),1,15),16,10)``) that any engine with md5
can recompute — DuckDB: ``CAST('0x'||substr(md5(s),1,15) AS BIGINT)``
— so the *banding itself* is oracle-hash-checkable, not just the
exact-Jaccard verify. md5 costs ~2× xxhash64 per shingle but both are
JVM codegen; the bucket-join shape (the thing that matters at 100 TB)
is identical.
"""

from __future__ import annotations

import random


from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_spark.operators.text import shingle_rows

# 31-bit Mersenne prime hash domain: products a*h stay < 2^62, so the
# affine permutations never overflow ANSI-mode long arithmetic.
_MERSENNE = (1 << 31) - 1


def portable_hash60(c: Column | str) -> Column:
    """md5-derived 60-bit non-negative hash, recomputable cross-engine.

    15 hex chars = 60 bits < 2^63: always positive, products with
    31-bit multipliers stay in long range."""
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _qi(name: str) -> str:
    """Backtick-quote an identifier for SQL-text interpolation."""
    return "`" + name.replace("`", "``") + "`"


def portable_hash60_sql(expr: str) -> str:
    """SQL text of :func:`portable_hash60` over an expression string —
    used by the plan-build-lean operators below (round 13: composing
    the shingle pipelines through the Column API cost thousands of
    py4j round trips per build; the text forms parse in one call with
    identical trees, so hashes are bit-identical)."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to session parallelism before a shingle
    pipeline that FANS OUT into several consumers (round 13): the
    repartition exchange is materialized once and every downstream
    aggregation branch reuses it (ReusedExchange) instead of re-running
    the scan + explode + md5 per branch, and the heavy per-shingle
    hashing runs at session width instead of the scan's file-split
    count. Measured A/B at sf0.1 (min-of-4, one session): this wins
    only for the multi-branch consumer (dd09's common_ngram_doc_stats,
    3 branches over one shingle relation: 1.53 → 1.37 s) and LOSES for
    single-branch pipelines (dd03 1.46 → 1.89, dd04 1.34 → 1.48,
    dd11 1.38 → 1.52 — the extra exchange outweighs one stage's
    parallelism at test scale, and at real scale their scans are
    already thousands of splits wide) — so it is applied ONLY where
    the fan-out makes it pay."""
    from cdc_spark.operators.similarity import _shuffle_partitions

    return df.repartition(_shuffle_partitions(df))


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact dedup: one row per distinct content, min-id representative.

    Groups on sha2-256 of the content, not the content itself — the
    shuffle key stays 32 bytes regardless of document size.
    """
    h = F.sha2(F.col(text_col), 256).alias("__h")
    return (
        df.select(h, F.col(id_col))
        .groupBy("__h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .drop("__h")
    )


def _minhash_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE - 1), rng.randrange(0, _MERSENNE - 1))
        for _ in range(num_hashes)
    ]


def minhash_signature(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k_shingle: int = 3,
    num_hashes: int = 32,
    seed: int = 7,
    keep_text: bool = False,
    portable: bool = False,
) -> DataFrame:
    """MinHash signatures as an array<long> column ``sig``.

    Per row: shingle-hash set (document-local), then for each of the
    ``num_hashes`` affine permutations take the min — all inside one
    projection of higher-order functions; no explode, no shuffle.
    ``portable=True`` swaps xxhash64 for the md5-derived shingle hash
    so an external engine can recompute the signature bit-for-bit.
    """
    # Exploded shingle rows (codegen'd; see shingle_rows) → num_hashes
    # permutation minima as plain aggregates: whole-stage-codegen'd
    # hash aggregation with map-side partial combine — one narrow
    # shuffle of (doc, 32 mins) partials. (An array-fold variant kept
    # everything row-local but evaluated interpreted lambda
    # allocations per element — 10× slower at equal output.)
    # distinct=False: the per-permutation min is duplicate-insensitive,
    # so the dedup shuffle is pure waste — the groupBy below is then
    # the ONLY exchange (map-side partial mins shrink it to one row
    # per doc per partition before it ships)
    shingle_hash = (
        portable_hash60_sql("shingle")
        if portable
        else "xxhash64(shingle)"
    )
    exploded = shingle_rows(
        df, text_col, id_col, k_shingle, distinct=False
    ).selectExpr(
        _qi(id_col),
        f"pmod({shingle_hash}, {_MERSENNE}) AS __h",
    )
    params = _minhash_params(num_hashes, seed)
    mins = [
        F.expr(f"min(pmod(__h * {a} + {b}, {_MERSENNE})) AS __m{j}")
        for j, (a, b) in enumerate(params)
    ]
    agg = exploded.groupBy(id_col).agg(*mins)
    out = agg.selectExpr(
        _qi(id_col),
        "array("
        + ",".join(f"__m{j}" for j in range(num_hashes))
        + ") AS sig",
    )
    if keep_text:
        # re-attach the text for downstream verification convenience
        return out.join(df.select(F.col(id_col), F.col(text_col)), id_col)
    return out


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    *,
    bands: int = 8,
    rows_per_band: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs.

    Shape: explode to (band, bucket-hash) — band count is a small
    constant — then a self-equi-join on (band, bucket). Output
    distinct (id_a < id_b) pairs. Never compares non-colliding docs.
    ``portable=True`` joins on the band's raw value string instead of
    its xxhash64 (wider shuffle key, engine-recomputable buckets).
    """

    key = (
        f"concat_ws(',', transform(slice(sig, b * {rows_per_band} + 1, "
        f"{rows_per_band}), x -> CAST(x AS STRING)))"
    )
    if not portable:
        key = f"xxhash64({key})"
    banded = sigs.selectExpr(
        _qi(id_col),
        f"posexplode(transform(sequence(0, {bands - 1}), b -> {key}))"
        " AS (band, bucket)",
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("band"), F.col("bucket")
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("band"), F.col("bucket")
    )
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k_shingle: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    hash_shingles: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    Distinct shingles exploded, self-joined on the shingle value,
    intersection counted, union by inclusion-exclusion. When
    ``candidates`` (id_a, id_b) is given — e.g. from LSH — only those
    pairs are verified (semi-join pushdown into both explode sides),
    and the candidate shingle rows are locally checkpointed: the
    scan→semi-join→shingle subtree feeds three consumers (sizes + both
    self-join sides), so without materialization it would run 3×.
    The checkpoint is bounded by near-dup density, never corpus size.

    ``hash_shingles=True`` joins on the md5-derived 60-bit shingle
    hash instead of the raw shingle string: the verify shuffle key
    drops from a variable-length n-gram to 8 bytes. Collisions
    (~2^-60/pair) would fold two shingles together identically in any
    engine recomputing the same hash, so oracle checks stay exact.
    """
    if candidates is not None:
        # semi-join BEFORE shingling: only candidate docs are ever
        # exploded (the filter cannot be pushed below the explode +
        # distinct by the optimizer, so place it there by hand)
        # no forced broadcast: the candidate set's size is data-
        # dependent (bounded by near-dup density, not by a constant);
        # AQE sees its actual shuffle stats and broadcasts when small
        wanted = candidates.select(
            F.explode(F.array("id_a", "id_b")).alias(id_col)
        ).distinct()
        df = df.join(wanted, id_col, "left_semi")
    key = (
        portable_hash60_sql("shingle") if hash_shingles else "shingle"
    )
    sh = shingle_rows(df, text_col, id_col, k_shingle).selectExpr(
        f"{_qi(id_col)} AS __id", f"{key} AS __s"
    )
    if candidates is not None:
        # lazy local checkpoint: materialized once on first action,
        # reused by all three consumers (candidate-bounded, small)
        sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("__id").agg(F.count("*").alias("__n"))

    a = sh.select(F.col("__id").alias("id_a"), F.col("__s"))
    b = sh.select(F.col("__id").alias("id_b"), F.col("__s"))
    common = (
        a.join(b, "__s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["id_a", "id_b"], "left_semi")
    sized = (
        common.join(
            sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb")),
            "id_b",
        )
    )
    jac = F.col("__common") / (
        F.col("__na") + F.col("__nb") - F.col("__common")
    )
    return sized.select(
        "id_a", "id_b", F.round(jac, 4).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def simhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    bits: int = 64,
    k_shingle: int = 3,
    portable: bool = False,
) -> DataFrame:
    """SimHash fingerprint: per bit, sign of Σ±1 over shingle hashes.

    Shingles (not unigrams) keep the fingerprint discriminative on
    small vocabularies. Document-local higher-order-function fold —
    no shuffle at all. ``portable=True`` uses the md5-derived 60-bit
    shingle hash (callers should pass bits<=60 with it).
    """
    # Exploded shingle hashes → `bits` sign-vote sums as plain
    # aggregates (codegen'd, map-side combine), then fold vote signs
    # into the fingerprint long.
    shingle_hash = (
        portable_hash60_sql("shingle")
        if portable
        else "xxhash64(shingle)"
    )
    exploded = shingle_rows(df, text_col, id_col, k_shingle).selectExpr(
        _qi(id_col), f"{shingle_hash} AS __h"
    )
    votes = [
        F.expr(
            f"sum(CASE WHEN (shiftright(__h, {b}) & 1) = 1 "
            f"THEN 1 ELSE -1 END) AS __v{b}"
        )
        for b in range(bits)
    ]
    agg = exploded.groupBy(id_col).agg(*votes)
    fp = " + ".join(
        f"CASE WHEN __v{b} >= 0 THEN shiftleft(CAST(1 AS BIGINT), {b}) "
        f"ELSE CAST(0 AS BIGINT) END"
        for b in range(bits)
    )
    return agg.selectExpr(_qi(id_col), f"{fp} AS simhash")


def simhash_pairs(
    fps: DataFrame,
    id_col: str,
    *,
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band on bit-slices (pigeonhole — any
    pair within Hamming ≤ bands-1 shares an identical band), verify
    with exact popcount on candidates."""
    width = bits // bands
    mask = (1 << width) - 1
    slices = ",".join(
        f"(shiftright(simhash, {i * width}) & {mask})"
        for i in range(bands)
    )
    banded = fps.selectExpr(
        _qi(id_col),
        "simhash",
        f"posexplode(array({slices})) AS (band, slice)",
    )
    a = banded.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("__fa"),
        "band",
        "slice",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("__fb"),
        "band",
        "slice",
    )
    cand = (
        a.join(b, ["band", "slice"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__fa", "__fb")
        .distinct()
    )
    ham = F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
    return cand.select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def common_ngram_doc_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k_shingle: int = 5,
    min_docs: int = 3,
    flag_fraction: float = 0.5,
    portable: bool = False,
) -> DataFrame:
    """Corpus-level duplicate-n-gram exposure per document.

    The "repeated substring" signal from training-data dedup research
    (an n-gram occurring in many documents marks boilerplate /
    cross-document duplication): count, per document, what fraction of
    its distinct k-grams occur in ≥ ``min_docs`` distinct documents,
    and flag documents above ``flag_fraction``.

    Shape: distinct (doc, shingle) rows → one hash-agg over shingles
    to find the common set → semi-join back. All joins/aggs key on the
    shingle hash (8 bytes), never the n-gram string — at 100 TB the
    shingle shuffle is the dominant cost and the fixed-width key
    roughly halves it vs ~5-word strings. ``portable=True`` uses the
    md5-derived 60-bit hash an external engine can recompute.

    Documents shorter than ``k_shingle`` tokens have no shingles and
    are absent from the output (no defined fraction), matching any
    engine computing the same definition.
    """
    key = (
        portable_hash60_sql("shingle")
        if portable
        else "xxhash64(shingle)"
    )
    sh = shingle_rows(
        _spread(df), text_col, id_col, k_shingle
    ).selectExpr(_qi(id_col), f"{key} AS __h")
    # distinct-per-doc rows: COUNT(*) per shingle == document frequency
    common = (
        sh.groupBy("__h")
        .agg(F.count("*").alias("__df"))
        .where(F.col("__df") >= min_docs)
        .select("__h")
    )
    tot = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    com = (
        sh.join(common, "__h", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("__c"))
    )
    frac = F.coalesce(F.col("__c"), F.lit(0)) / F.col("n_shingles")
    return (
        tot.join(com, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_shingles"),
            F.coalesce(F.col("__c"), F.lit(0)).alias("n_common"),
            F.round(frac, 4).alias("dup_fraction"),
            (frac >= flag_fraction).alias("flagged"),
        )
    )


def aligned_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k_shingle: int = 3,
    min_span_tokens: int = 20,
    candidates: DataFrame | None = None,
    portable: bool = False,
) -> DataFrame:
    """Longest exactly-duplicated token span per document pair.

    The exact-substring dedup signal at k-gram granularity: two docs
    sharing a contiguous run of R matching k-grams at one alignment
    share a verbatim span of R + k - 1 tokens. Shape:

    1. positioned shingle hashes (codegen'd explode, fixed-width keys),
    2. equi-join on the hash → matches annotated with the alignment
       diagonal ``pos_a - pos_b``,
    3. runs of consecutive positions per (pair, diagonal) via the
       islands trick (``pos - row_number()`` is constant within a run),
    4. max run per pair, reported as a token span.

    With ``candidates`` (e.g. from LSH) both sides are pruned to
    candidate docs before shingling and the match join is semi-join
    restricted to candidate pairs — the production path: cost is
    O(matching-shingle pairs among near-dups), never corpus².
    """
    key = (
        portable_hash60_sql("shingle")
        if portable
        else "xxhash64(shingle)"
    )
    if candidates is not None:
        wanted = candidates.select(
            F.explode(F.array("id_a", "id_b")).alias(id_col)
        ).distinct()
        df = df.join(wanted, id_col, "left_semi")
    shp = shingle_rows(
        df, text_col, id_col, k_shingle, keep_pos=True
    ).selectExpr(f"{_qi(id_col)} AS __id", "pos", f"{key} AS __h")
    if candidates is not None:
        shp = shp.localCheckpoint(eager=False)

    a = shp.select(
        F.col("__id").alias("id_a"), F.col("pos").alias("__pa"), "__h"
    )
    b = shp.select(
        F.col("__id").alias("id_b"), F.col("pos").alias("__pb"), "__h"
    )
    m = (
        a.join(b, "__h")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (F.col("__pa") - F.col("__pb")).alias("__diag"),
            "__pa",
        )
        .distinct()
    )
    if candidates is not None:
        m = m.join(candidates, ["id_a", "id_b"], "left_semi")

    from pyspark.sql import Window

    w = Window.partitionBy("id_a", "id_b", "__diag").orderBy("__pa")
    runs = m.select(
        "id_a",
        "id_b",
        "__diag",
        (F.col("__pa") - F.row_number().over(w)).alias("__grp"),
    )
    span = F.max(F.col("__run")) + F.lit(k_shingle - 1)
    return (
        runs.groupBy("id_a", "id_b", "__diag", "__grp")
        .agg(F.count("*").alias("__run"))
        .groupBy("id_a", "id_b")
        .agg(span.alias("longest_span_tokens"))
        .where(F.col("longest_span_tokens") >= min_span_tokens)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k_shingle: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """Asymmetric containment pairs: |A ∩ B| / min(|A|, |B|) ≥ threshold.

    Jaccard misses the "one document embedded inside a larger one"
    shape (a quote, a syndicated article inside a portal page): the
    union term dilutes the score. Containment normalizes the shingle
    intersection by the SMALLER document, so full embedding scores 1.0
    regardless of the host's size. Same O(shared-shingle pairs)
    inverted-index equi-join as ``jaccard_pairs`` — never all-pairs.

    Returns (id_a, id_b, containment, contained): ``contained`` is the
    smaller-shingle-set doc (id_a on ties — deterministic).
    """
    sh = shingle_rows(df, text_col, id_col, k_shingle).select(
        F.col(id_col).alias("__id"), F.col("shingle").alias("__s")
    )
    sizes = sh.groupBy("__id").agg(F.count("*").alias("__n"))
    a = sh.select(F.col("__id").alias("id_a"), "__s")
    b = sh.select(F.col("__id").alias("id_b"), "__s")
    common = (
        a.join(b, "__s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__common"))
    )
    sized = common.join(
        sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na")),
        "id_a",
    ).join(
        sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb")),
        "id_b",
    )
    cont = F.col("__common") / F.least(F.col("__na"), F.col("__nb"))
    return (
        sized.where(cont >= F.lit(threshold))
        .select(
            "id_a",
            "id_b",
            F.round(cont, 4).alias("containment"),
            F.when(F.col("__na") <= F.col("__nb"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("contained"),
        )
    )


def lsh_cross_candidates(
    sigs_a: DataFrame,
    sigs_b: DataFrame,
    id_col: str,
    *,
    bands: int = 8,
    rows_per_band: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Cross-SET banded LSH: candidates are (a, b) pairs with a from
    ``sigs_a`` and b from ``sigs_b`` sharing any band bucket — the
    decontamination / incremental-probe shape, where the two sides
    are different corpora (train vs benchmark, index vs batch) and a
    self-join would waste both sides' intra-set collisions. Same
    banding as :func:`lsh_candidate_pairs`; output columns
    ``id_a`` (from a) / ``id_b`` (from b), distinct."""

    key = (
        f"concat_ws(',', transform(slice(sig, b * {rows_per_band} + 1, "
        f"{rows_per_band}), x -> CAST(x AS STRING)))"
    )
    if not portable:
        key = f"xxhash64({key})"

    def banded(sigs, out):
        return sigs.selectExpr(
            f"{_qi(id_col)} AS {out}",
            f"posexplode(transform(sequence(0, {bands - 1}), b -> {key}))"
            " AS (band, bucket)",
        )

    return (
        banded(sigs_a, "id_a")
        .join(banded(sigs_b, "id_b"), ["band", "bucket"])
        .select("id_a", "id_b")
        .distinct()
    )
