"""Pandas-UDF surface: grouped-map (applyInPandas) and grouped-agg —
the Arrow-batched escape hatch for semantics built-ins can't express
(SURVEY.md §2.3 UDF row)."""

from __future__ import annotations

from collections.abc import Iterator

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


@register(
    "pu03_python_udtf",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    )
    SELECT doc_id,
           CAST(j AS INT) AS win_no,
           CAST(LEAST(8, len(l) - 4 * j) AS INT) AS n_tokens,
           array_to_string(l[4 * j + 1 : 4 * j + 8], ' ') AS win_text
    FROM toks,
         UNNEST(generate_series(
             0, CAST(CEIL(len(l) / 4.0) AS BIGINT) - 1)) AS u(j)
    """,
    note="Python UDTF (the Spark 4 table-function surface, "
    "Arrow-optimized): one document row fans out to its 8-token "
    "sliding windows (stride 4) via a LATERAL table-function join — "
    "the per-row multi-row generator shape that plain UDFs cannot "
    "express. Runs executor-side with no shuffle; the window "
    "arithmetic is mirrored exactly by the oracle's slice algebra",
    tags=("udf", "udtf"),
)
def pu03_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, win_no int, n_tokens int, "
        "win_text string",
        useArrow=True,
    )
    class SlidingWindows:
        def eval(self, doc_id, text):  # noqa: ANN001 - Spark UDTF contract
            toks = text.split(" ")
            for j, start in enumerate(range(0, len(toks), 4)):
                chunk = toks[start : start + 8]
                yield doc_id, j, len(chunk), " ".join(chunk)

    suffix = uuid.uuid4().hex[:8]
    spark.udtf.register(f"sliding_windows_{suffix}", SlidingWindows)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView(f"docs_{suffix}")
    return spark.sql(
        f"SELECT s.* FROM docs_{suffix}, "
        f"LATERAL sliding_windows_{suffix}(doc_id, text) s"
    )


@register(
    "pu04_arrow_scalar_udf",
    oracle="""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) * 1000000
           + length(text) AS packed_stat,
           CAST(length(text) % 97 AS BIGINT) AS shard
    FROM documents
    """,
    note="Arrow-optimized scalar Python UDF (Spark 4 "
    "@udf(useArrow=True)): per-row Python logic shipped over Arrow "
    "batches instead of pickled rows — shows as ArrowEvalPython in "
    "the plan (the guardrail test forbids the legacy BatchEvalPython "
    "row path repo-wide). The function is pure integer arithmetic on "
    "the text, so the oracle recomputes it exactly. This is the "
    "THIRD Python surface beside pandas_udf (pu01/pu02) and UDTF "
    "(pu03) — for logic that is genuinely per-row scalar",
    tags=("udf", "arrow", "python"),
)
def pu04_arrow_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udf

    @udf(returnType="bigint", useArrow=True)
    def packed_stat(text: str) -> int:
        toks = [t for t in text.strip().split() if t]
        return len(toks) * 1_000_000 + len(text)

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        packed_stat("text").alias("packed_stat"),
        (F.length("text") % 97).cast("long").alias("shard"),
    )


@register(
    "pu05_cogrouped_asof",
    oracle="""
    WITH o AS (
        SELECT o_custkey AS user_id, o_orderkey, o_totalprice
        FROM orders WHERE o_custkey <= 120
    ),
    e AS (SELECT user_id, event_id, value FROM events),
    matched AS (
        SELECT o.user_id, o.o_orderkey, o.o_totalprice,
               (SELECT MAX(e2.event_id) FROM e e2
                WHERE e2.user_id = o.user_id
                  AND e2.event_id <= o.o_orderkey) AS last_event_id
        FROM o
    )
    SELECT user_id,
           COUNT(*) AS n_orders,
           CAST(COUNT(last_event_id) AS BIGINT) AS n_matched,
           CAST(MAX(last_event_id) AS BIGINT) AS max_event_id
    FROM matched GROUP BY user_id
    """,
    note="cogrouped applyInPandas (the two-table grouped-map surface, "
    "pandas merge_asof per key): each user's orders and events arrive "
    "as ALIGNED pandas frames in one task — the backward as-of match "
    "(latest event at-or-before each order, by the shared id order) "
    "runs as a vectorized searchsorted per group, state bounded by "
    "one user's rows. The per-user cogroup is exactly how "
    "feature-store point-in-time joins scale: shuffle once on the "
    "entity key, align in memory per entity",
    tags=("udf", "cogroup", "asof"),
)
def pu05_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") <= 120)
        .select(
            F.col("o_custkey").alias("user_id"),
            "o_orderkey",
            "o_totalprice",
        )
    )
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )

    def align(key, odf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        if odf.empty:
            return pd.DataFrame(
                columns=["user_id", "o_orderkey", "last_event_id"]
            )
        odf = odf.sort_values("o_orderkey")
        if edf.empty:
            # user has orders but no events: nothing to match
            last = np.full(len(odf), -1, dtype="int64")
        else:
            ev = np.sort(edf["event_id"].to_numpy())
            idx = (
                np.searchsorted(
                    ev, odf["o_orderkey"].to_numpy(), side="right"
                )
                - 1
            )
            last = np.where(idx >= 0, ev[np.clip(idx, 0, None)], -1)
        return pd.DataFrame(
            {
                "user_id": odf["user_id"],
                "o_orderkey": odf["o_orderkey"],
                "last_event_id": pd.array(
                    [None if x < 0 else int(x) for x in last],
                    dtype="Int64",
                ),
            }
        )

    aligned = (
        orders.groupBy("user_id")
        .cogroup(events.groupBy("user_id"))
        .applyInPandas(
            align,
            "user_id long, o_orderkey long, last_event_id long",
        )
    )
    return aligned.groupBy("user_id").agg(
        F.count("*").alias("n_orders"),
        F.count("last_event_id").cast("long").alias("n_matched"),
        F.max("last_event_id").cast("long").alias("max_event_id"),
    )


@register(
    "pu06_map_in_arrow",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    """,
    note="mapInArrow: the zero-copy Python surface below mapInPandas "
    "— the function consumes and yields pyarrow RecordBatches "
    "directly (no pandas materialization, no index/dtype "
    "round-trip), all columnar work done by Arrow compute kernels "
    "(binary_length, split_pattern list lengths). The right seam "
    "for byte-level media/tokenizer integrations where pandas "
    "object-boxing would dominate; per-doc byte and token counts "
    "are exact integers, hash-checked",
    tags=("udf", "arrow", "mapinarrow"),
)
def pu06_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches):
        for b in batches:
            text = b.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    pc.binary_length(text).cast(pa.int64()),
                    pc.list_value_length(
                        pc.split_pattern(text, " ")
                    ).cast(pa.int64()),
                ],
                ["doc_id", "n_bytes", "n_tokens"],
            )

    return docs.mapInArrow(
        stats, "doc_id long, n_bytes long, n_tokens long"
    )


@register(
    "pu07_iterator_scalar_udf",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) * 31
                + len(list_filter(toks, t -> length(t) >= 7)) * 7
                AS BIGINT) AS model_score
    FROM w
    """,
    note="iterator-of-series pandas UDF (SCALAR_ITER — the ninth "
    "Python seam): the function receives an ITERATOR of Arrow "
    "batches, so expensive per-worker initialization (loading a "
    "scoring model, a tokenizer, an ONNX session) runs ONCE per "
    "executor python process and amortizes over every batch — THE "
    "pattern for model-based quality scoring over a 100 TB corpus, "
    "where per-batch model loading would dominate. The 'model' here "
    "is a deterministic integer scorer (init observable via its "
    "loaded coefficients) so the seam is hash-checked",
    tags=("udf", "pandas", "iterator", "model-scoring"),
)
def pu07_iterator_scalar_udf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def model_score(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # expensive init — runs once per python worker, NOT per batch
        # (a real pipeline loads its model / tokenizer here)
        coef_tokens, coef_long = 31, 7
        for s in texts:
            toks = s.str.strip().str.split(r"\s+")
            n = toks.str.len()
            n_long = toks.map(
                lambda ts: sum(1 for t in ts if len(t) >= 7)
            )
            yield (n * coef_tokens + n_long * coef_long).astype("int64")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", model_score(F.col("text")).alias("model_score")
    )
