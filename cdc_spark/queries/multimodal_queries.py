"""Multimodal binary-column plumbing — query + oracle.

The binary payloads are UTF-8-encoded document texts (the container
has no media libraries — see operators.multimodal for the stubbed
decode seam); the mapInPandas feature extraction, schema handling and
aggregation are the real plumbing a media pipeline uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.operators.multimodal import (
    attach_binary,
    decode_features,
    resize_payloads,
    sample_frames,
)
from cdc_spark.queries.base import register


@register(
    "mm01_multimodal_features",
    oracle="""
    SELECT source,
           COUNT(*) AS n_items,
           CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
           CAST(SUM(list_sum(list_transform(
               generate_series(1, least(8, length(text))),
               i -> ascii(text[i])))) AS BIGINT) AS total_header_sum
    FROM documents
    WHERE length(text) = strlen(text)
    GROUP BY source
    """,
    note="binary multimodal columns: encode → mapInPandas (Arrow) byte "
    "feature extraction → join back to metadata → aggregate",
    tags=("multimodal",),
)
def mm01_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ASCII-only scope: the features are BYTE-based (the multimodal
    # contract) while the oracle's length()/ascii() are
    # character-based — they only coincide on single-byte text, so
    # both sides filter to it explicitly
    docs = load_table(spark, sf_dir, "documents").where(
        F.length("text") == F.octet_length("text")
    )
    binary = attach_binary(docs, "text", "doc_id", modality="text")
    feats = decode_features(binary)
    joined = feats.join(
        docs.select(F.col("doc_id").alias("item_id"), "source"), "item_id"
    )
    return joined.groupBy("source").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.sum("header_sum").cast("long").alias("total_header_sum"),
    )


@register(
    "mm02_resize_frame_sample",
    oracle="""
    WITH sized AS (
        SELECT source,
               strlen(text) AS nb,
               CAST(CEIL(strlen(text) / 64.0) AS BIGINT) AS n_total
        FROM documents
    ),
    per_doc AS (
        SELECT source,
               LEAST(nb, 100) AS resized_bytes,
               CASE WHEN n_total = 0 THEN 0
                    ELSE (n_total - 1) // 4 + 1 END AS kept,
               CASE WHEN n_total = 0 THEN 0
                    WHEN (n_total - 1) % 4 = 0
                    THEN 64 * ((n_total - 1) // 4 + 1)
                         - (64 * n_total - nb)
                    ELSE 64 * ((n_total - 1) // 4 + 1) END AS frame_bytes
        FROM sized
    )
    SELECT source,
           COUNT(*) AS n_items,
           CAST(SUM(resized_bytes) AS BIGINT) AS total_resized_bytes,
           CAST(SUM(kept) AS BIGINT) AS n_frames,
           CAST(SUM(frame_bytes) AS BIGINT) AS total_frame_bytes
    FROM per_doc
    GROUP BY source
    """,
    note="media-pipeline transforms over binary columns: strided resize "
    "(payload replaced in place) and every-Nth frame sampling (fan-out "
    "mapInPandas, no shuffle) — byte accounting matches the oracle's "
    "closed-form size arithmetic",
    tags=("multimodal",),
)
def mm02_resize_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    binary = attach_binary(docs, "text", "doc_id", modality="image")
    src = docs.select(F.col("doc_id").alias("item_id"), "source")

    resized = resize_payloads(binary, 100).select(
        "item_id", F.octet_length("payload").alias("resized_bytes")
    )
    frames = sample_frames(binary, frame_bytes=64, every_n=4).groupBy(
        "item_id"
    ).agg(
        F.count("*").alias("kept"),
        F.sum(F.octet_length("frame")).alias("frame_bytes"),
    )
    per_doc = (
        src.join(resized, "item_id")
        .join(frames, "item_id", "left")
        .na.fill({"kept": 0, "frame_bytes": 0})
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_items"),
        F.sum("resized_bytes").cast("long").alias("total_resized_bytes"),
        F.sum("kept").cast("long").alias("n_frames"),
        F.sum("frame_bytes").cast("long").alias("total_frame_bytes"),
    )


def _phash_oracle(*, bands: int = 4, max_hamming: int = 12) -> str:
    """DuckDB twin of the perceptual-hash near-dup pipeline: same
    strided byte sampling, integer mean-compare bits, bit-slice
    banding, and popcount verify (ASCII text = one byte per char, so
    ascii(text[i]) IS the payload byte)."""
    width = 64 // bands
    mask = (1 << width) - 1
    min_long = "(-9223372036854775807 - 1)"  # 1<<63 as a signed long
    bit_terms = " + ".join(
        f"(CASE WHEN 64 * s > tot AND k = {k} THEN "
        + (f"{min_long}" if k == 63 else f"{1 << k}")
        + " ELSE 0 END)"
        for k in range(64)
    )
    band_rows = "\n        UNION ALL\n        ".join(
        f"SELECT item_id, simhash, {i} AS band,"
        f" (simhash >> {i * width}) & {mask} AS slice FROM fp"
        for i in range(bands)
    )
    return f"""
    WITH enc AS (
        SELECT doc_id AS item_id, text, strlen(text) AS n
        FROM documents WHERE strlen(text) > 0
    ),
    samp AS (
        SELECT item_id, k.range AS k,
               ascii(text[CAST((k.range * (n - 1)) // 63 AS INTEGER) + 1])
                   AS s
        FROM enc, range(0, 64) k
    ),
    tots AS (
        SELECT item_id, SUM(s) AS tot FROM samp GROUP BY item_id
    ),
    fp AS (
        SELECT s.item_id,
               CAST(SUM({bit_terms}) AS BIGINT) AS simhash
        FROM samp s JOIN tots t ON s.item_id = t.item_id
        GROUP BY s.item_id
    ),
    banded AS (
        {band_rows}
    ),
    cand AS (
        SELECT DISTINCT a.item_id AS id_a, b.item_id AS id_b,
               a.simhash AS fa, b.simhash AS fb
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.slice = b.slice
         AND a.item_id < b.item_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= {max_hamming}
    """


@register(
    "mm03_phash_neardup",
    oracle=_phash_oracle(),
    note="perceptual-hash near-duplicate detection over binary media "
    "payloads: aHash-style 64-bit fingerprint from the Arrow "
    "mapInPandas decode seam (strided byte samples, integer "
    "mean-compare bits — a real deployment hashes downscaled pixel "
    "luma through the same plumbing), then the SimHash bit-slice "
    "banding machinery finds candidate pairs (bucket collisions, "
    "never all-pairs) verified by exact popcount. All-integer "
    "arithmetic end-to-end, so the oracle recomputes the fingerprints "
    "bit-for-bit",
    tags=("multimodal", "dedup", "phash"),
)
def mm03_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.dedup import simhash_pairs
    from cdc_spark.operators.multimodal import perceptual_hash

    docs = load_table(spark, sf_dir, "documents").where(
        F.length("text") > 0
    )
    binary = attach_binary(docs, "text", "doc_id", modality="image")
    hashed = perceptual_hash(binary)
    return simhash_pairs(
        hashed, "item_id", bits=64, bands=4, max_hamming=12
    )


@register(
    "mm04_audio_frame_energy",
    oracle="""
    WITH ascii_docs AS (
        SELECT doc_id, text FROM documents
        WHERE length(text) = strlen(text) AND length(text) >= 64
    ),
    w AS (
        SELECT doc_id, wi,
               list_sum(list_transform(
                   generate_series(wi * 64 + 1, wi * 64 + 64),
                   i -> (ascii(text[i]) - 128) * (ascii(text[i]) - 128)
               )) AS energy
        FROM ascii_docs,
             LATERAL unnest(generate_series(
                 0, length(text) // 64 - 1)) t(wi)
    ),
    m AS (
        SELECT *, MAX(energy) OVER (PARTITION BY doc_id) AS me FROM w
    )
    SELECT doc_id AS item_id,
           COUNT(*) AS n_windows,
           CAST(MAX(energy) AS BIGINT) AS peak_energy,
           CAST(SUM(energy) AS BIGINT) AS total_energy,
           CAST(MIN(CASE WHEN energy = me THEN wi END) AS BIGINT)
               AS peak_idx
    FROM m GROUP BY doc_id
    """,
    note="audio-modality framing over the fake-decode seam: payloads "
    "treated as 8-bit PCM, per-64-sample-frame signal energy "
    "sum((s-128)^2) computed numpy-vectorized inside Arrow batches "
    "(mapInPandas) — the VAD/segmentation framing shape. Energies are "
    "exact int64, so the oracle recomputes every frame bit-for-bit "
    "from the same bytes; peak frame uses a first-max deterministic "
    "tiebreak. ASCII-only docs (byte == char) keep the SQL twin "
    "byte-faithful",
    tags=("multimodal", "audio"),
)
def mm04_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.multimodal import frame_energy

    docs = load_table(spark, sf_dir, "documents").where(
        (F.length("text") == F.octet_length("text"))
        & (F.length("text") >= 64)
    )
    binary = attach_binary(docs, "text", "doc_id", modality="audio")
    return frame_energy(binary, window=64)


@register(
    "mm05_interleaved_packing",
    oracle="""
    WITH text_items AS (
        SELECT doc_id AS item_id, 'text' AS modality,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents
    ),
    image_items AS (
        -- every 4th doc carries an image: fixed 64 patch tokens
        SELECT doc_id + 500000 AS item_id, 'image' AS modality,
               64 AS n_tokens
        FROM documents WHERE doc_id % 4 = 0
    ),
    items AS (
        SELECT *, md5(CAST(item_id AS VARCHAR)) AS ord_key
        FROM (SELECT * FROM text_items UNION ALL SELECT * FROM image_items)
    ),
    placed AS (
        SELECT *,
               SUM(n_tokens) OVER (
                   ORDER BY ord_key, item_id
                   ROWS UNBOUNDED PRECEDING
               ) - n_tokens AS start_off
        FROM items
    )
    SELECT CAST(start_off // 512 AS BIGINT) AS window_id,
           CAST(COUNT(*) FILTER (modality = 'text') AS BIGINT) AS n_text,
           CAST(COUNT(*) FILTER (modality = 'image') AS BIGINT) AS n_image,
           CAST(SUM(n_tokens) FILTER (modality = 'text') AS BIGINT)
               AS text_tokens,
           CAST(COALESCE(SUM(n_tokens) FILTER (modality = 'image'), 0)
               AS BIGINT) AS image_tokens
    FROM placed GROUP BY 1
    """,
    note="multimodal interleaved sequence packing (the VLM "
    "training-data shape): text items carry their token counts, "
    "image items a fixed 64-patch-token budget; a deterministic "
    "md5-keyed order interleaves modalities, one window cumsum "
    "assigns each item's start offset, and items bin into 512-token "
    "context windows by start (boundary spans allowed, dp03's "
    "convention). Per-window modality accounting is exact integers. "
    "The cumsum is the distributed two-pass prefix sum on the "
    "DETERMINISTIC-SLICE bucket path (operators/ordering.py, round "
    "10): the slice id is the md5 order key's leading 3 hex digits — "
    "a pure row expression, monotone along the order — so the plan "
    "needs no localCheckpoint layout pin (at 100 TB the pin was a "
    "full extra write). No single-reducer global window; the "
    "oracle's plain SUM OVER is bit-identical",
    tags=("multimodal", "packing", "interleave"),
)
def mm05_interleaved_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.ordering import distributed_prefix_sum
    from cdc_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    text_items = docs.select(
        F.col("doc_id").alias("item_id"),
        F.lit("text").alias("modality"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    image_items = docs.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 500000).alias("item_id"),
        F.lit("image").alias("modality"),
        F.lit(64).cast("long").alias("n_tokens"),
    )
    items = text_items.unionByName(image_items).withColumn(
        "ord_key", F.md5(F.col("item_id").cast("string"))
    )
    placed = distributed_prefix_sum(
        items,
        ["ord_key", "item_id"],
        "n_tokens",
        out_col="start_off",
        inclusive=False,
        # md5 is fixed-width lowercase hex: the 3-digit prefix is
        # numerically monotone with the string order — 4096 slices
        bucket=F.conv(F.substring("ord_key", 1, 3), 16, 10).cast("long"),
    )
    t, i = F.col("modality") == "text", F.col("modality") == "image"
    return placed.groupBy(
        F.floor(F.col("start_off") / 512).cast("long").alias("window_id")
    ).agg(
        F.count(F.when(t, 1)).cast("long").alias("n_text"),
        F.count(F.when(i, 1)).cast("long").alias("n_image"),
        F.sum(F.when(t, F.col("n_tokens"))).cast("long").alias("text_tokens"),
        F.coalesce(F.sum(F.when(i, F.col("n_tokens"))), F.lit(0))
        .cast("long")
        .alias("image_tokens"),
    )


@register(
    "mm06_scene_segmentation",
    oracle="""
    WITH ascii_docs AS (
        SELECT doc_id, text FROM documents
        WHERE length(text) = strlen(text) AND length(text) >= 64
    ),
    w AS (
        SELECT doc_id, wi,
               list_sum(list_transform(
                   generate_series(wi * 64 + 1, wi * 64 + 64),
                   i -> (ascii(text[i]) - 128) * (ascii(text[i]) - 128)
               )) AS energy
        FROM ascii_docs,
             LATERAL unnest(generate_series(
                 0, length(text) // 64 - 1)) t(wi)
    ),
    d AS (
        SELECT doc_id, wi, energy,
               energy - LAG(energy) OVER (
                   PARTITION BY doc_id ORDER BY wi) AS diff
        FROM w
    ),
    b AS (
        SELECT doc_id, wi,
               CASE WHEN diff IS NOT NULL AND abs(diff) > 1500
                    THEN 1 ELSE 0 END AS is_b
        FROM d
    ),
    s AS (
        SELECT doc_id, wi,
               SUM(is_b) OVER (PARTITION BY doc_id ORDER BY wi
                               ROWS UNBOUNDED PRECEDING) AS scene_id
        FROM b
    ),
    sl AS (
        SELECT doc_id, scene_id, COUNT(*) AS len
        FROM s GROUP BY doc_id, scene_id
    )
    SELECT doc_id AS item_id,
           CAST(SUM(len) AS BIGINT) AS n_frames,
           CAST(COUNT(*) AS BIGINT) AS n_scenes,
           CAST(MAX(len) AS BIGINT) AS longest_scene
    FROM sl GROUP BY doc_id
    """,
    note="video/audio scene segmentation over the fake-decode seam: "
    "per-frame energies (mm04's exact int64 framing, fan-out "
    "mapInPandas — per-FRAME rows this time) cut into scenes where "
    "the energy jumps by > 1500 between adjacent frames; "
    "islands-trick running sum of boundary flags assigns scene ids. "
    "Every window is partitioned by item (a video's frames, never "
    "the corpus), so the shape scales with the longest clip, not "
    "the archive; frame energies, boundaries and scene lengths are "
    "all exact integers — hash-checked end to end",
    tags=("multimodal", "video", "segmentation"),
)
def mm06_scene_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from cdc_spark.operators.multimodal import frame_energies

    docs = load_table(spark, sf_dir, "documents").where(
        (F.length("text") == F.octet_length("text"))
        & (F.length("text") >= 64)
    )
    binary = attach_binary(docs, "text", "doc_id", modality="video")
    frames = frame_energies(binary, window=64)
    w = Window.partitionBy("item_id").orderBy("frame_idx")
    flagged = frames.withColumn(
        "is_b",
        F.when(
            F.abs(
                F.col("energy") - F.lag("energy").over(w)
            ) > 1500,
            1,
        ).otherwise(0),
    )
    scened = flagged.withColumn(
        "scene_id",
        F.sum("is_b").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    lengths = scened.groupBy("item_id", "scene_id").agg(
        F.count("*").alias("len")
    )
    return lengths.groupBy("item_id").agg(
        F.sum("len").cast("long").alias("n_frames"),
        F.count("*").cast("long").alias("n_scenes"),
        F.max("len").cast("long").alias("longest_scene"),
    )


@register(
    "mm07_pair_similarity_filter",
    oracle="""
    WITH img AS (
        SELECT vec_id AS doc_id, embedding AS ie, label FROM embeddings
    ),
    cap AS (
        SELECT vec_id, embedding AS ce FROM embeddings
    ),
    pairs AS (
        SELECT img.doc_id, img.label,
               ROUND(list_cosine_similarity(img.ie::DOUBLE[],
                                            cap.ce::DOUBLE[]), 4) AS sim
        FROM img JOIN cap ON cap.vec_id = (img.doc_id + 7)
             % (SELECT COUNT(*) FROM embeddings)
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(CASE WHEN sim >= 0.1 THEN 1 END) AS BIGINT)
               AS n_kept,
           ROUND(MIN(sim), 4) AS min_sim,
           ROUND(MAX(sim), 4) AS max_sim
    FROM pairs GROUP BY label
    """,
    note="paired-embedding consistency filter — the LAION/CLIP-score "
    "curation shape: every document's image embedding joins its "
    "caption embedding (deterministic pairing (i+7) mod 500 stands "
    "in for the real image/text column pair), cosine >= 0.1 keeps "
    "the pair, per-label kept/dropped accounting. One equi-join + "
    "one codegen'd zip_with cosine per pair — O(pairs), embarrassingly "
    "parallel, the filter that decides what enters a multimodal "
    "training mix at 100 TB. Rounded similarities are engine-exact "
    "(ss01's precedent)",
    tags=("multimodal", "curation", "similarity", "filter"),
)
def mm07_pair_similarity_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cdc_spark.operators.similarity import dot, norm

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()  # pairing modulus (tiny scalar; table row count)
    # norms hoisted to the n-row projections (the round-11 dd12
    # lesson): the pair scoring runs one array fold instead of three,
    # same expression tree over the same arrays — bit-identical
    img = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("ie"),
        norm(F.col("embedding")).alias("inrm"),
        "label",
    )
    cap = emb.select(
        F.col("vec_id"),
        F.col("embedding").alias("ce"),
        norm(F.col("embedding")).alias("cnrm"),
    )
    pairs = img.join(
        cap, cap.vec_id == (img.doc_id + 7) % n
    ).select(
        "doc_id",
        "label",
        F.round(
            dot(F.col("ie"), F.col("ce"))
            / (F.col("inrm") * F.col("cnrm")),
            4,
        ).alias("sim"),
    )
    return pairs.groupBy("label").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.count(F.when(F.col("sim") >= 0.1, 1))
        .cast("long")
        .alias("n_kept"),
        F.round(F.min("sim"), 4).alias("min_sim"),
        F.round(F.max("sim"), 4).alias("max_sim"),
    )


@register(
    "mm08_aspect_bucket_batching",
    oracle="""
    WITH meta AS (
        SELECT doc_id,
               256 + (doc_id * 37) % 768 AS w,
               256 + (doc_id * 53) % 768 AS h,
               md5(CAST(doc_id AS VARCHAR)) AS k
        FROM documents
    ),
    bucketed AS (
        SELECT *,
               CASE WHEN w * 8 < h * 5 THEN '0.50'
                    WHEN w * 8 < h * 7 THEN '0.75'
                    WHEN w * 6 < h * 7 THEN '1.00'
                    WHEN w * 3 < h * 5 THEN '1.33'
                    ELSE '2.00' END AS bucket
        FROM meta
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY bucket ORDER BY k, doc_id
               ) AS rn
        FROM bucketed
    )
    SELECT bucket,
           CAST((rn - 1) // 8 AS BIGINT) AS batch_idx,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(w) AS BIGINT) AS sum_w,
           CAST(SUM(h) AS BIGINT) AS sum_h,
           ROUND(SUM(w) * 1.0 / SUM(h), 4) AS wh_ratio
    FROM ranked GROUP BY bucket, batch_idx
    """,
    note="aspect-ratio bucket batching (the multimodal training "
    "batcher: images batch only with near-same aspect so resize "
    "cropping stays minimal — SDXL/NaViT-style). Deterministic "
    "synthetic width/height metadata stands in for the stubbed "
    "decoder; bucket assignment is integer cross-multiplication "
    "(w*8 < h*5 etc.) so the thresholds are engine-exact, and the "
    "within-bucket batch order is the md5-seeded shuffle ranked by "
    "the GROUPED two-pass prefix sum (5 low-cardinality buckets "
    "would single-reduce under a plain partitionBy window — the "
    "dp09 lesson applied to batch assembly); batches of 8 via "
    "rank div 8. The oracle keeps its plain ROW_NUMBER",
    tags=("multimodal", "batching", "ordering"),
)
def mm08_aspect_bucket_batching(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cdc_spark.operators.ordering import grouped_prefix_sum

    docs = load_table(spark, sf_dir, "documents")
    meta = docs.select(
        "doc_id",
        (256 + (F.col("doc_id") * 37) % 768).alias("w"),
        (256 + (F.col("doc_id") * 53) % 768).alias("h"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    )
    w, h = F.col("w"), F.col("h")
    bucketed = meta.withColumn(
        "bucket",
        F.when(w * 8 < h * 5, "0.50")
        .when(w * 8 < h * 7, "0.75")
        .when(w * 6 < h * 7, "1.00")
        .when(w * 3 < h * 5, "1.33")
        .otherwise("2.00"),
    ).withColumn("one", F.lit(1).cast("long"))
    ranked = grouped_prefix_sum(
        bucketed, "bucket", ["k", "doc_id"], "one", out_col="rn"
    )
    return ranked.groupBy(
        "bucket",
        F.floor((F.col("rn") - 1) / 8).cast("long").alias("batch_idx"),
    ).agg(
        F.count("*").cast("long").alias("n_images"),
        F.sum("w").cast("long").alias("sum_w"),
        F.sum("h").cast("long").alias("sum_h"),
        F.round(F.sum("w") / F.sum("h"), 4).alias("wh_ratio"),
    )


@register(
    "mm09_modality_router",
    oracle="""
    WITH typed AS (
        SELECT doc_id, text,
               CASE doc_id % 3 WHEN 0 THEN 'text'
                               WHEN 1 THEN 'image'
                               ELSE 'audio' END AS modality
        FROM documents
        WHERE length(text) = strlen(text)
    ),
    feats AS (
        SELECT modality,
               CASE modality
                   WHEN 'text' THEN
                       len(string_split_regex(trim(text), '\\s+'))
                   WHEN 'image' THEN
                       list_sum(list_transform(
                           generate_series(1, least(8, length(text))),
                           i -> ascii(text[i])))
                   ELSE length(text)
               END AS feature
        FROM typed
    )
    SELECT modality,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(feature) AS BIGINT) AS feature_sum
    FROM feats GROUP BY modality
    """,
    note="modality router (the heterogeneous-pipeline shape: one "
    "mixed table, per-modality processing branches, recombined "
    "accounting): rows route by a modality tag to three DIFFERENT "
    "transforms — tokenizer stats for text, header-byte features "
    "for image, payload length for audio — then union back for "
    "per-modality totals. Each branch is a filter + projection over "
    "the SAME scan (no shuffle until the final aggregate), which is "
    "how a mixed 100 TB corpus avoids three separate pipeline runs; "
    "single-byte scope keeps the byte features oracle-exact (the "
    "mm01 contract)",
    tags=("multimodal", "routing", "pipeline"),
)
def mm09_modality_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.length("text") == F.octet_length("text")
    )
    typed = docs.select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") % 3 == 0, "text")
        .when(F.col("doc_id") % 3 == 1, "image")
        .otherwise("audio")
        .alias("modality"),
    )
    text_b = typed.where(F.col("modality") == "text").select(
        "modality",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("long")
        .alias("feature"),
    )
    image_b = typed.where(F.col("modality") == "image").select(
        "modality",
        F.aggregate(
            F.transform(
                F.split(
                    F.substring(F.col("text"), 1, 8), "(?!^)"
                ),
                F.ascii,
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("feature"),
    )
    audio_b = typed.where(F.col("modality") == "audio").select(
        "modality", F.length("text").cast("long").alias("feature")
    )
    routed = text_b.unionByName(image_b).unionByName(audio_b)
    return routed.groupBy("modality").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("feature").cast("long").alias("feature_sum"),
    )
