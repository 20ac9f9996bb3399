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
from cdc_spark.operators.multimodal import attach_binary, decode_features
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
