"""Sequence-packing queries — training-context assembly over `documents`."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.operators.packing import pack_sequences, packing_efficiency
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
