"""Pandas-UDF surface: grouped-map (applyInPandas) and grouped-agg —
the Arrow-batched escape hatch for semantics built-ins can't express
(SURVEY.md §2.3 UDF row)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.queries.base import register


@register(
    "pu01_grouped_map_centroids",
    oracle="""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(embedding[1]::DOUBLE), 6) AS dim0_mean,
           ROUND(AVG(embedding[64]::DOUBLE), 6) AS dim63_mean
    FROM embeddings GROUP BY label
    """,
    note="applyInPandas grouped-map: per-label centroid stats computed "
    "in pandas/numpy over Arrow batches (deterministic: rows sorted "
    "by vec_id before the float64 reduction)",
    tags=("udf", "pandas"),
)
def pu01_grouped_map_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")  # deterministic reduction order
        import numpy as np

        mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n": [len(pdf)],
                "dim0_mean": [round(float(mat[:, 0].mean()), 6)],
                "dim63_mean": [round(float(mat[:, 63].mean()), 6)],
            }
        )

    return emb.groupBy("label").applyInPandas(
        centroid, "label int, n long, dim0_mean double, dim63_mean double"
    )


@register(
    "pu02_grouped_agg_mad",
    oracle="""
    SELECT event_type,
           ROUND(AVG(ABS(value - m)), 4) AS mad
    FROM (
        SELECT event_type, value,
               AVG(value) OVER (PARTITION BY event_type) AS m
        FROM events
    ) GROUP BY event_type
    """,
    note="grouped-agg pandas UDF: mean absolute deviation per group "
    "(float64 numpy reduction over Arrow batches)",
    tags=("udf", "pandas"),
)
def pu02_grouped_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    @F.pandas_udf("double")
    def mad(v: pd.Series) -> float:
        import numpy as np

        arr = np.sort(v.to_numpy(dtype="float64"))  # deterministic order
        return round(float(np.abs(arr - arr.mean()).mean()), 4)

    return events.groupBy("event_type").agg(mad("value").alias("mad"))
