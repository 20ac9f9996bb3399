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

Signatures/fingerprints use xxhash64 (JVM-native, engine-specific) —
fine because every *declared output* is either verified by exact
Jaccard (portable) or checked rows-only; tests validate recall against
the exact method.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_spark.operators.text import shingles, tokens

# 31-bit Mersenne prime hash domain: products a*h stay < 2^62, so the
# affine permutations never overflow ANSI-mode long arithmetic.
_MERSENNE = (1 << 31) - 1


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
) -> DataFrame:
    """MinHash signatures as an array<long> column ``sig``.

    Per row: shingle-hash set (document-local), then for each of the
    ``num_hashes`` affine permutations take the min — all inside one
    projection of higher-order functions; no explode, no shuffle.
    """
    sh = F.array_distinct(shingles(tokens(F.col(text_col)), k_shingle))
    hashes = F.transform(
        sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE))
    )
    params = _minhash_params(num_hashes, seed)
    a_arr = ", ".join(str(a) for a, _ in params)
    b_arr = ", ".join(str(b) for _, b in params)
    # Single traversal of the shingle hashes with an array<long>
    # accumulator of per-permutation minima (vs num_hashes separate
    # array_min passes — keeps the codegen'd tree small).
    staged = df.select(F.col(id_col), F.col(text_col), hashes.alias("__h"))
    sig = F.expr(
        f"""
        aggregate(
            __h,
            array_repeat(CAST({_MERSENNE} AS BIGINT), {num_hashes}),
            (acc, h) -> zip_with(
                acc,
                zip_with(array({a_arr}), array({b_arr}),
                         (a, b) -> pmod(h * a + b, {_MERSENNE})),
                (m, c) -> least(m, c)))
        """
    )
    return staged.select(
        F.col(id_col), F.col(text_col), sig.alias("sig")
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    *,
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs.

    Shape: explode to (band, bucket-hash) — band count is a small
    constant — then a self-equi-join on (band, bucket). Output
    distinct (id_a < id_b) pairs. Never compares non-colliding docs.
    """
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col("sig"),
                                b * rows_per_band + 1,
                                rows_per_band,
                            ),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "bucket"),
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
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    Distinct shingles exploded, self-joined on the shingle value,
    intersection counted, union by inclusion-exclusion. When
    ``candidates`` (id_a, id_b) is given — e.g. from LSH — only those
    pairs are verified (semi-join pushdown into both explode sides).
    """
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array_distinct(shingles(tokens(F.col(text_col)), k_shingle))
        ).alias("__s"),
    )
    if candidates is not None:
        wanted = candidates.select(
            F.explode(F.array("id_a", "id_b")).alias("__id")
        ).distinct()
        sh = sh.join(F.broadcast(wanted), "__id")
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
) -> DataFrame:
    """SimHash fingerprint: per bit, sign of Σ±1 over shingle hashes.

    Shingles (not unigrams) keep the fingerprint discriminative on
    small vocabularies. Document-local higher-order-function fold —
    no shuffle at all.
    """
    tok = F.array_distinct(
        shingles(tokens(F.col(text_col)), k_shingle)
    )
    th = F.transform(tok, lambda t: F.xxhash64(t))
    # Single pass over the hash array with an array<long> accumulator
    # of per-bit votes (one traversal instead of `bits` traversals —
    # keeps the codegen'd expression tree small), then fold the vote
    # signs back into one long.
    staged = df.select(F.col(id_col), th.alias("__th"))
    votes = F.expr(
        f"""
        aggregate(
            __th,
            array_repeat(CAST(0 AS BIGINT), {bits}),
            (acc, h) -> zip_with(
                acc, sequence(0, {bits - 1}),
                (a, b) -> a + IF((shiftright(h, CAST(b AS INT)) & 1) = 1,
                                 CAST(1 AS BIGINT), CAST(-1 AS BIGINT))))
        """
    )
    fp = F.expr(
        f"""
        aggregate(
            zip_with(__votes, sequence(0, {bits - 1}),
                     (v, b) -> IF(v >= 0,
                                  shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)),
                                  CAST(0 AS BIGINT))),
            CAST(0 AS BIGINT), (acc, x) -> acc + x)
        """
    )
    return (
        staged.withColumn("__votes", votes)
        .select(F.col(id_col), fp.alias("simhash"))
    )


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
    banded = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * width).bitwiseAND(
                        F.lit(mask)
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band", "slice"),
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
