from __future__ import annotations

from pyspark.sql import functions as F

from cdc_spark.operators.text import (
    fingerprint_shingle_min,
    language_id,
    quality_score,
    regex_tokens,
    shingles,
    tokens,
)


def test_tokenize_and_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    row = df.select(
        tokens("text").alias("t"), shingles(tokens("text"), 3).alias("s")
    ).first()
    assert row.t == ["a", "b", "c", "d"]
    assert row.s == ["a b c", "b c d"]


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    assert df.select(shingles(tokens("text"), 3).alias("s")).first().s == []


def test_regex_tokens_bpe_ish(spark):
    df = spark.createDataFrame([("hello world42 x!y",)], "text string")
    row = df.select(regex_tokens("text").alias("t")).first()
    assert row.t == ["hello", "world", "42", "x", "!", "y"]


def test_language_id_on_clear_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog went to the park"),
            (2, "el gato y la casa de que en los"),
            (3, "der hund und die katze ist nicht ein"),
            (4, "zz qq ww rr"),
        ],
        "id long, text string",
    )
    out = {r.id: r.lang for r in df.select("id", language_id("text").alias("lang")).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "de"
    assert out[4] == "und"


def test_quality_score_range_and_ordering(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a lazy dog near the river bank today"),
            (2, "a a a a a a a a"),
        ],
        "id long, text string",
    )
    out = {r.id: r.q for r in df.select("id", quality_score("text").alias("q")).collect()}
    assert 0.0 <= out[2] < out[1] <= 1.0  # repetitive doc scores lower


def test_fingerprint_stability_and_collision(spark):
    df = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5"),
            (2, "w1 w2 w3 w4 w5"),   # identical → identical fingerprint
            (3, "x1 x2 x3 x4 x5"),   # different → different
            (4, "ab"),               # short doc → full-text md5 fallback
        ],
        "id long, text string",
    )
    out = {
        r.id: r.fp
        for r in df.select(
            "id", fingerprint_shingle_min("text").alias("fp")
        ).collect()
    }
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert out[4] is not None and len(out[4]) == 32


def test_fingerprint_robust_to_single_token_change(spark):
    # min-shingle fingerprint often survives a tail edit (winnowing
    # property): shared minimum shingle keeps the fingerprint equal
    base = "t1 t2 t3 t4 t5 t6 t7 t8"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra")], "id long, text string"
    )
    out = {
        r.id: r.fp
        for r in df.select(
            "id", fingerprint_shingle_min("text").alias("fp")
        ).collect()
    }
    assert out[1] == out[2]


def test_repetition_stats_crafted(spark):
    from cdc_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # bigrams: ab,ba,ab,ba,ab → top ab 3/5
            (2, "x y z w"),          # all bigrams unique
            (3, "a b"),              # one bigram, no trigrams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df, "text", "doc_id").collect()}
    assert got[1].n_bigrams == 5
    assert got[1].top_bigram_frac == 0.6
    assert got[1].dup_bigram_frac == 1.0   # every bigram occurs >1 time
    assert got[1].dup_trigram_frac == 1.0  # aba,bab,aba,bab → all dup
    assert got[2].dup_bigram_frac == 0.0
    assert got[2].dup_trigram_frac == 0.0
    assert got[3].n_bigrams == 1
    assert got[3].dup_trigram_frac is None  # too short for trigrams


def test_stratified_sample_deterministic_and_rate(spark):
    from cdc_spark.operators.sampling import (
        hash_sample_predicate,
        stratified_hash_sample,
    )

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    kept = stratified_hash_sample(
        df, "doc_id", "lang", {"en": 0.25, "zh": 1.0}
    )
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["zh"] == 2000                      # rate 1.0 keeps all
    assert 350 < counts["en"] < 650                  # ~25% of 2000
    # deterministic: same predicate → identical sample on re-evaluation
    again = {r.lang: r.n for r in stratified_hash_sample(
        df, "doc_id", "lang", {"en": 0.25, "zh": 1.0}
    ).groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert again == counts
    # flat predicate agrees with the stratum at the same rate
    flat = df.where(hash_sample_predicate("doc_id", 0.25))
    n_flat = flat.where(F.col("lang") == "en").count()
    assert n_flat == counts["en"]


def test_temperature_mixture_flattens_sources(spark):
    import math

    from pyspark.sql import functions as F

    from cdc_spark.operators.sampling import temperature_mixture_sample

    # 4096 docs in source A, 256 in B: alpha=0.5 should keep B whole
    # and A at sqrt(256/4096) = 1/4
    df = spark.range(4096 + 256).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 4096, "A").otherwise("B").alias("source"),
    )
    kept = temperature_mixture_sample(df, "doc_id", "source", alpha=0.5)
    by = {r.source: r.n for r in kept.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    assert by["B"] == 256  # rate 1.0 keeps everything
    # rate 0.25 quantized to 63/256: expected ~1024, binomial sd ~28
    assert abs(by["A"] - 4096 * 64 / 256) < 150
    # determinism: identical under repartitioning
    again = {r.source: r.n for r in temperature_mixture_sample(
        df.repartition(13), "doc_id", "source", alpha=0.5
    ).groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert again == by
    # kept counts approach proportionality to sqrt(n_s)
    ratio = by["A"] / by["B"]
    assert abs(ratio - math.sqrt(4096 / 256)) < 0.6


def test_unigram_logprob_matches_manual(spark):
    import math

    from cdc_spark.queries import REGISTRY

    # tiny corpus staged as a parquet dir the query loader accepts
    import os
    import tempfile

    tmp = tempfile.mkdtemp()
    docs = spark.createDataFrame(
        [
            (0, "a a b", "en", "s", 5),
            (1, "b c", "en", "s", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    out = {
        r.doc_id: r
        for r in REGISTRY["tx17_unigram_logprob"].fn(spark, tmp).collect()
    }
    # corpus: a=2, b=2, c=1 of 5 tokens
    lp = lambda n: round(math.log(n / 5.0), 6)
    exp0 = round((2 * lp(2) + lp(2)) / 3, 4)
    exp1 = round((lp(2) + lp(1)) / 2, 4)
    assert out[0].n_tokens == 3 and abs(out[0].avg_logprob - exp0) < 1e-9
    assert out[1].n_tokens == 2 and abs(out[1].avg_logprob - exp1) < 1e-9
