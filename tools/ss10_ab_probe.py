"""Same-session A/B: ss10 keyword arm, probe-bounded (r13, current)
vs corpus-dfs shuffle (r12 form). Alternating min-of-5, noop sink.
Also re-times dd12 and the four controls for context."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.queries import REGISTRY
from cdc_spark.session import get_spark


def ss10_r12(spark: SparkSession, sf_dir: str):
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


def tmin(fn, n=5):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "ss10_ab", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    cur = lambda: noop(REGISTRY["ss10_hybrid_rrf"].fn(spark, sf_dir))
    old = lambda: noop(ss10_r12(spark, sf_dir))
    dd12 = lambda: noop(REGISTRY["dd12_semantic_dedup"].fn(spark, sf_dir))
    ctrl = lambda: noop(REGISTRY["q01_pricing_summary"].fn(spark, sf_dir))

    # warm all plans
    cur(); old(); dd12(); ctrl()
    for rnd in range(2):
        print(f"round {rnd}: control q01   {tmin(ctrl, 3):7.3f}", flush=True)
        print(f"round {rnd}: ss10 current  {tmin(cur):7.3f}", flush=True)
        print(f"round {rnd}: ss10 r12-form {tmin(old):7.3f}", flush=True)
        print(f"round {rnd}: dd12 current  {tmin(dd12):7.3f}", flush=True)


if __name__ == "__main__":
    main()
