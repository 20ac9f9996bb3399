"""Sequence-packing queries — training-context assembly over `documents`."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.operators.packing import (
    concat_chunk_plan,
    pack_sequences,
    packing_efficiency,
)
from cdc_spark.queries.base import register


@register(
    "dp01_sequence_packing",
    oracle=None,  # next-fit packing is sequential per group — not
    # SQL-expressible; invariants (total assignment, budget respected,
    # determinism, fill accounting) are pytest-validated
    note="pack documents into 512-token training contexts: hash into "
    "independent pack groups (one shuffle), deterministic next-fit per "
    "group via Arrow applyInPandas — per-group memory is corpus/n_groups",
    tags=("packing", "training", "pandas"),
)
def dp01_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    return pack_sequences(
        sized, "doc_id", "n_tokens", budget=512, n_groups=8
    )


@register(
    "dp02_packing_efficiency",
    oracle=None,  # derived from dp01's non-SQL-expressible assignment
    note="padding-waste accounting for the packed corpus: bins, tokens "
    "and fill ratio per pack group",
    tags=("packing", "training"),
)
def dp02_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = dp01_sequence_packing(spark, sf_dir)
    return packing_efficiency(packed, budget=512)


@register(
    "dp03_concat_chunk_plan",
    oracle="""
    WITH sized AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(doc_id % 8 AS INT) AS pack_group
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tokens, pack_group,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY pack_group ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING
               ) - n_tokens AS BIGINT) AS start_offset
        FROM sized
    )
    SELECT doc_id, n_tokens, pack_group, start_offset,
           CAST(FLOOR(start_offset / 512.0) AS BIGINT) AS first_bin,
           CAST(FLOOR((start_offset + greatest(n_tokens, 1) - 1) / 512.0)
                AS BIGINT) AS last_bin,
           CAST(FLOOR((start_offset + greatest(n_tokens, 1) - 1) / 512.0)
                - FLOOR(start_offset / 512.0) + 1 AS BIGINT) AS n_windows
    FROM cum
    """,
    note="GPT-style concat-and-chunk packing plan: docs concatenated in "
    "id order per pack group, token stream sliced into 512-token "
    "context windows, docs spanning boundaries (zero padding waste). "
    "Pure window cumsum — the packing family's hash-checkable layout, "
    "complementing the non-SQL-expressible next-fit dp01",
    tags=("packing", "training"),
)
def dp03_concat_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    return concat_chunk_plan(sized, "doc_id", "n_tokens", budget=512, n_groups=8)


@register(
    "dp04_length_bucket_batching",
    oracle="""
    WITH sized AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    bucketed AS (
        SELECT n_tokens, n_tokens // 32 AS bucket FROM sized
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS BIGINT)
               AS pad_waste,
           CAST((SUM(n_tokens) + 4095) // 4096 AS BIGINT) AS n_batches
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
    note="length-bucketed batching plan (the padding-free alternative "
    "to concat-packing for losses that cannot cross document bounds): "
    "docs bucket by n_tokens // 32, so same-bucket sequences pad to "
    "within 31 tokens of each other. Reports per-bucket padding waste "
    "(max*count - sum) and 4096-token batch counts. Pure map + one "
    "hash agg — no global sort, unlike an ntile formulation, so the "
    "plan is shuffle-minimal at any corpus size. All-integer "
    "arithmetic; fully hash-checked",
    tags=("packing", "training"),
)
def dp04_length_bucket_batching(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    bucketed = sized.withColumn(
        "bucket", F.floor(F.col("n_tokens") / 32).cast("long")
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            (
                F.max("n_tokens").cast("long") * F.count("*")
                - F.sum("n_tokens").cast("long")
            ).alias("pad_waste"),
            F.floor(
                (F.sum("n_tokens").cast("long") + F.lit(4095)) / 4096
            ).cast("long").alias("n_batches"),
        )
        .orderBy("bucket")
    )


@register(
    "dp05_curriculum_order",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               ROUND(least(len(string_split(text, ' ')) / 64.0, 1.0)
                     * (len(list_distinct(string_split(text, ' '))) * 1.0
                        / len(string_split(text, ' ')))
                     * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                        * 1.0 / length(text)), 4) AS q
        FROM documents
    ),
    banded AS (
        SELECT doc_id, q,
               CAST(least(floor(q * 10), 9) AS BIGINT) AS band,
               md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM scored
    )
    SELECT doc_id, band,
           CAST(ROW_NUMBER() OVER (
               ORDER BY band DESC, shuffle_key, doc_id
           ) AS BIGINT) AS position
    FROM banded
    """,
    note="curriculum data ordering: docs banded by quality decile, "
    "highest band first, deterministically shuffled WITHIN each band "
    "by an md5 key (seeded-shuffle reproducibility across engines "
    "and runs — tx15's trick applied to curriculum learning). The "
    "global position is a total order any trainer can replay — "
    "computed as a distributed two-pass row number on the "
    "DETERMINISTIC-SLICE bucket path (operators/ordering.py, round "
    "10): the slice id (9-band)*4096 + the md5 key's leading 3 hex "
    "digits is a pure row expression, monotone along the (band DESC, "
    "md5 ASC) order, so the plan needs no localCheckpoint layout pin "
    "— at 100 TB the pin was a full extra write of the dataset. "
    "Never a single-reducer global window; the oracle's plain "
    "ROW_NUMBER is bit-identical",
    tags=("packing", "curriculum", "ordering"),
)
def dp05_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.ordering import distributed_row_number
    from cdc_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = F.round(quality_score("text"), 4)
    banded = docs.select(
        "doc_id",
        F.least(F.floor(q * 10), F.lit(9)).cast("long").alias("band"),
        F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
    )
    # monotone along (band DESC, shuffle_key ASC): bands are [0,9],
    # and md5 is fixed-width lowercase hex so the lexicographic order
    # of the string equals the numeric order of its 3-digit prefix
    bucket = (F.lit(9) - F.col("band")) * 4096 + F.conv(
        F.substring("shuffle_key", 1, 3), 16, 10
    ).cast("long")
    ordered = distributed_row_number(
        banded,
        [F.desc("band"), F.asc("shuffle_key"), F.asc("doc_id")],
        out_col="position",
        bucket=bucket,
    )
    return ordered.select("doc_id", "band", "position")


@register(
    "dp06_epoch_shuffles",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, e.epoch,
               md5(CAST(e.epoch AS VARCHAR) || ':'
                   || CAST(doc_id AS VARCHAR)) AS k
        FROM documents, (SELECT unnest([0, 1, 2]) AS epoch) e
    )
    SELECT epoch, doc_id, position FROM (
        SELECT epoch, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY epoch ORDER BY k, doc_id
               ) AS BIGINT) AS position
        FROM keyed
    ) WHERE position <= 10
    """,
    note="per-epoch reproducible training orders: each epoch's "
    "shuffle key is md5(epoch:doc_id) — orders are deterministic, "
    "engine-portable, and DECORRELATED across epochs (no shared "
    "prefix between epoch permutations), the property multi-epoch "
    "training needs from its data loader. First 10 positions per "
    "epoch gated; at scale the same key drives a "
    "repartitionByRange write per epoch",
    tags=("packing", "shuffle", "epochs"),
)
def dp06_epoch_shuffles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("epoch")
    ).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws(
                ":",
                F.col("epoch").cast("string"),
                F.col("doc_id").cast("string"),
            )
        ).alias("k"),
    )
    w = Window.partitionBy("epoch").orderBy("k", "doc_id")
    return (
        keyed.withColumn(
            "position", F.row_number().over(w).cast("long")
        )
        .where(F.col("position") <= 10)
        .select("epoch", "doc_id", "position")
    )


@register(
    "dp07_curriculum_shard_write",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               ROUND(least(len(string_split(text, ' ')) / 64.0, 1.0)
                     * (len(list_distinct(string_split(text, ' '))) * 1.0
                        / len(string_split(text, ' ')))
                     * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                        * 1.0 / length(text)), 4) AS q
        FROM documents
    ),
    banded AS (
        SELECT doc_id,
               CAST(least(floor(q * 10), 9) AS BIGINT) AS band,
               md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM scored
    ),
    positioned AS (
        SELECT doc_id, band,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY band DESC, shuffle_key, doc_id
               ) AS BIGINT) AS position
        FROM banded
    )
    SELECT CAST(floor((position - 1) / 1024) AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(position) AS BIGINT) AS min_pos,
           CAST(MAX(position) AS BIGINT) AS max_pos,
           CAST(MIN(band) AS BIGINT) AS min_band,
           CAST(MAX(band) AS BIGINT) AS max_band
    FROM positioned GROUP BY 1
    """,
    note="curriculum-ordered shard MATERIALIZATION — the write path "
    "dp05's note promises, actually executed: positions from the "
    "distributed two-pass row number (operators/ordering.py), docs "
    "written to parquet PARTITIONED BY 1024-doc shard, read back, "
    "per-shard accounting gated. min/max position per shard prove "
    "the shards tile the total order contiguously and min/max band "
    "prove the curriculum (band never increases across shard "
    "boundaries); hash equality through the write→read round-trip "
    "proves the materialized layout preserves the order a trainer "
    "replays",
    tags=("packing", "curriculum", "ordering", "sink"),
)
def dp07_curriculum_shard_write(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from cdc_spark.operators.ordering import distributed_row_number
    from cdc_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = F.round(quality_score("text"), 4)
    banded = docs.select(
        "doc_id",
        F.least(F.floor(q * 10), F.lit(9)).cast("long").alias("band"),
        F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
    )
    ordered = distributed_row_number(
        banded,
        [F.desc("band"), F.asc("shuffle_key"), F.asc("doc_id")],
        out_col="position",
    )
    sharded = ordered.select(
        "doc_id",
        "band",
        "position",
        F.floor((F.col("position") - 1) / 1024).cast("long").alias("shard"),
    )
    out_dir = tempfile.mkdtemp(prefix="dp07_shards_")
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    return back.groupBy(F.col("shard").cast("long").alias("shard")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("position").cast("long").alias("min_pos"),
        F.max("position").cast("long").alias("max_pos"),
        F.min("band").cast("long").alias("min_band"),
        F.max("band").cast("long").alias("max_band"),
    )


@register(
    "dp08_striped_packing",
    oracle="""
    WITH sized AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, n_tokens,
               ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
        FROM sized
    )
    SELECT CAST((rn - 1) % 64 AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens
    FROM ranked GROUP BY 1
    """,
    note="striped (longest-processing-time-ish) packing into 64 "
    "balanced worker bins: docs ranked by token count descending via "
    "the distributed two-pass row number (operators/ordering.py), "
    "bin = rank mod 64 — round-robin over the sorted order bounds "
    "every bin's total within one max-doc of the mean, the classic "
    "deterministic alternative to sequential first-fit (dp01) that "
    "IS SQL-expressible, so the balanced assignment itself is "
    "hash-checked. The shape data-parallel tokenization/training "
    "jobs use to keep stragglers bounded",
    tags=("packing", "balancing", "ordering"),
)
def dp08_striped_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.ordering import distributed_row_number

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    ranked = distributed_row_number(
        sized, [F.desc("n_tokens"), F.asc("doc_id")], out_col="rn"
    )
    return ranked.groupBy(
        ((F.col("rn") - 1) % 64).cast("long").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
    )


@register(
    "dp09_token_budget_mixture",
    oracle="""
    WITH sized AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS k
        FROM documents
    ),
    placed AS (
        SELECT *,
               SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY k, doc_id
                   ROWS UNBOUNDED PRECEDING
               ) - n_tokens AS start_off
        FROM sized
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN start_off < 3000 THEN 1 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN start_off < 3000 THEN n_tokens
                         ELSE 0 END) AS BIGINT) AS tokens_kept
    FROM placed GROUP BY source
    """,
    note="token-budget-capped source mixture (the Llama-style 'take N "
    "tokens per source' data-mix op): within each source, docs order "
    "by the deterministic md5 shuffle key (tx15's engine-portable "
    "seeded shuffle) and accumulate a running token count; a doc is "
    "kept iff its START offset is inside the 3000-token budget, so "
    "selection is reproducible across engines and runs and every "
    "source contributes a near-exact token quota. The per-source "
    "running sum rides operators/ordering.py's GROUPED two-pass "
    "prefix sum (range-partitioned on (source, k, doc_id)), so a "
    "dominant source spans many partitions instead of funneling "
    "through one reducer — bit-identical to the per-source window, "
    "so the oracle keeps its plain SUM OVER (PARTITION BY source)",
    tags=("packing", "mixture", "budget", "sampling"),
)
def dp09_token_budget_mixture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cdc_spark.operators.ordering import grouped_prefix_sum

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    )
    placed = grouped_prefix_sum(
        sized,
        "source",
        ["k", "doc_id"],
        "n_tokens",
        out_col="start_off",
        inclusive=False,
    )
    kept = F.col("start_off") < 3000
    return placed.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count(F.when(kept, 1)).cast("long").alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("tokens_kept"),
    )


@register(
    "dp10_strided_chunking",
    oracle="""
    WITH sized AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id,
           CAST(start_tok / 96 AS BIGINT) AS chunk_idx,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(LEAST(start_tok + 128, n_tokens) AS BIGINT) AS end_tok,
           CAST(LEAST(start_tok + 128, n_tokens) - start_tok
                AS BIGINT) AS chunk_tokens
    FROM (
        SELECT doc_id, n_tokens,
               unnest(generate_series(0, n_tokens - 1, 96)) AS start_tok
        FROM sized
    )
    """,
    note="strided training-window chunking (context length 128, "
    "stride 96 — the overlapping-window tokenizer-prep op every LM "
    "data pipeline runs): each document explodes into windows "
    "[start, min(start+128, n)) at 96-token strides so no token is "
    "more than one window from a boundary. sequence()+explode is "
    "pure JVM row expansion bounded by n/stride per doc — NO "
    "shuffle at all; at 100 TB chunking stays embarrassingly "
    "parallel and the (doc_id, chunk_idx) key is deterministic for "
    "downstream shard assignment",
    tags=("packing", "chunking", "stride"),
)
def dp10_strided_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias(
            "n_tokens"
        ),
    )
    exploded = sized.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.col("n_tokens") - 1,
                F.lit(96).cast("long"),
            )
        ).alias("start_tok"),
    )
    end = F.least(F.col("start_tok") + 128, F.col("n_tokens"))
    return exploded.select(
        "doc_id",
        (F.col("start_tok") / 96).cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        end.cast("long").alias("end_tok"),
        (end - F.col("start_tok")).cast("long").alias("chunk_tokens"),
    )


@register(
    "dp11_anneal_mixture_schedule",
    oracle="""
    WITH counts AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source
    ),
    shares AS (
        SELECT source, n_tokens,
               sqrt(n_tokens) / SUM(sqrt(n_tokens)) OVER () AS share,
               COUNT(*) OVER () AS n_sources
        FROM counts
    )
    SELECT CAST(e AS BIGINT) AS epoch,
           source,
           n_tokens,
           ROUND((1 - e / 2.0) / n_sources + (e / 2.0) * share, 6)
               AS weight
    FROM shares, unnest(generate_series(0, 2)) AS t(e)
    """,
    note="epoch-annealed mixture schedule (the curriculum-mixing op "
    "behind staged pretraining: start uniform across sources, anneal "
    "toward size-tempered shares by the final epoch): weight_e = "
    "(1-t)*uniform + t*sqrt-tempered share with t = epoch/(E-1). One "
    "hash aggregate over the corpus; shares and uniform come from "
    "windows over the SOURCE AGGREGATE (bounded by source count), "
    "epochs explode from a literal array — no join, no second scan. "
    "sqrt is correctly-rounded IEEE so the schedule is engine-exact "
    "at 6 digits",
    tags=("packing", "mixture", "curriculum", "sampling"),
)
def dp11_anneal_mixture_schedule(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tokens")
    )
    w_all = Window.partitionBy()
    shares = counts.select(
        "source",
        "n_tokens",
        (
            F.sqrt(F.col("n_tokens"))
            / F.sum(F.sqrt(F.col("n_tokens"))).over(w_all)
        ).alias("share"),
        F.count("*").over(w_all).alias("n_sources"),
    )
    e = F.col("epoch")
    return shares.select(
        F.explode(
            F.array(
                F.lit(0).cast("long"),
                F.lit(1).cast("long"),
                F.lit(2).cast("long"),
            )
        ).alias("epoch"),
        "source",
        "n_tokens",
        "share",
        "n_sources",
    ).select(
        "epoch",
        "source",
        "n_tokens",
        F.round(
            (1 - e / 2.0) / F.col("n_sources")
            + (e / 2.0) * F.col("share"),
            6,
        ).alias("weight"),
    )
