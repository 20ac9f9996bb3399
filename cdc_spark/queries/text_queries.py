"""Text-analysis operators over `documents` — queries + oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.operators.text import (
    STOPWORDS,
    TOKEN_PATTERN,
    fingerprint_rows,
    language_id,
    quality_features,
    quality_score,
    regex_tokens,
    repetition_stats,
    tokens,
)
from cdc_spark.queries.base import register


def _stoplist_sql(lang: str) -> str:
    inner = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"[{inner}]"


_LANG_SCORES = ",\n".join(
    f"len(list_intersect(list_distinct(string_split(text, ' ')), "
    f"{_stoplist_sql(lang)})) AS s_{lang}"
    for lang in sorted(STOPWORDS)
)
_LANG_CASE = (
    "CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und' "
    + " ".join(
        f"WHEN s_{lang} = greatest(s_de, s_en, s_es, s_fr, s_zh) "
        f"THEN '{lang}'"
        for lang in sorted(STOPWORDS)
    )
    + " END"
)


@register(
    "tx01_language_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, {_LANG_SCORES}
        FROM documents
    )
    SELECT doc_id, lang AS lang_labeled, {_LANG_CASE} AS lang_pred
    FROM scored
    """,
    note="heuristic language ID: stopword-profile overlap argmax with "
    "deterministic lexicographic tiebreak",
    tags=("text", "langid"),
)
def tx01_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_labeled"),
        language_id("text").alias("lang_pred"),
    )


@register(
    "tx02_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_distinct_tokens,
           ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                 / len(string_split(text, ' ')), 4) AS type_token_ratio,
           ROUND(length(replace(text, ' ', '')) * 1.0
                 / len(string_split(text, ' ')), 4) AS avg_token_len,
           ROUND(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                 / length(text), 4) AS alpha_ratio,
           ROUND(least(len(string_split(text, ' ')) / 64.0, 1.0)
                 * (len(list_distinct(string_split(text, ' '))) * 1.0
                    / len(string_split(text, ' ')))
                 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                    / length(text)), 4) AS quality
    FROM documents
    """,
    note="document quality features + composite score (length credit x "
    "lexical diversity x alpha density)",
    tags=("text", "quality"),
)
def tx02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    f = quality_features("text")
    return docs.select(
        "doc_id",
        f["n_chars"].alias("n_chars"),
        f["n_tokens"].alias("n_tokens"),
        f["n_distinct_tokens"].alias("n_distinct_tokens"),
        f["type_token_ratio"].alias("type_token_ratio"),
        f["avg_token_len"].alias("avg_token_len"),
        f["alpha_ratio"].alias("alpha_ratio"),
        quality_score("text").alias("quality"),
    )


@register(
    "tx03_token_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(len(regexp_extract_all(text,
               '{TOKEN_PATTERN}', 0))) AS BIGINT) AS total_bpe_tokens,
           CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
    FROM documents
    GROUP BY lang
    """,
    note="token counting per language slice: whitespace + BPE-ish regex "
    "tokenizer (letter runs / digit runs / single symbols)",
    tags=("text", "tokens"),
)
def tx03_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = tokens(F.col("text"))
    bpe = regex_tokens(F.col("text"))
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(ws)).cast("long").alias("total_tokens"),
        F.sum(F.size(bpe)).cast("long").alias("total_bpe_tokens"),
        F.max(F.size(ws)).cast("long").alias("max_tokens"),
    )


@register(
    "tx04_tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    stats AS (
        SELECT term,
               COUNT(*) AS tf,
               COUNT(DISTINCT doc_id) AS df
        FROM tok GROUP BY term
    )
    SELECT term,
           CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df,
           ROUND(tf * ln(n_docs * 1.0 / df), 4) AS tfidf
    FROM stats CROSS JOIN n
    ORDER BY tfidf DESC, term
    LIMIT 20
    """,
    note="corpus-level tf-idf: top-20 terms by tf x ln(N/df)",
    tags=("text", "tfidf"),
)
def tx04_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    # corpus size folded into the plan as a broadcast 1-row aggregate
    # (one job, no driver round-trip — the merge.py t_agg pattern)
    n_agg = docs.agg(F.count("*").cast("double").alias("__n_docs"))
    stats = tok.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    ).crossJoin(F.broadcast(n_agg))
    tfidf = F.round(
        F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 4
    )
    return (
        stats.select(
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            tfidf.alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), F.asc("term"))
        .limit(20)
    )


@register(
    "tx05_fingerprint",
    oracle="""
    WITH toks AS (
        SELECT doc_id, text, string_split(text, ' ') AS l FROM documents
    )
    SELECT doc_id,
           COALESCE(
               list_aggregate(
                   list_transform(
                       generate_series(1, greatest(len(l) - 2, 0)),
                       i -> md5(array_to_string(l[i:i+2], ' '))),
                   'min'),
               md5(text)) AS fingerprint,
           md5(text) AS content_md5
    FROM toks
    """,
    note="document fingerprinting: winnowing-style min shingle-MD5 "
    "(1-permutation MinHash, engine-portable) + full-content MD5",
    tags=("text", "fingerprint"),
)
def tx05_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fps = fingerprint_rows(docs, "text", "doc_id", k=3)
    return fps.join(
        docs.select("doc_id", F.md5(F.col("text")).alias("content_md5")),
        "doc_id",
    )


_QUALITY_SQL = """ROUND(least(len(string_split(text, ' ')) / 64.0, 1.0)
                 * (len(list_distinct(string_split(text, ' '))) * 1.0
                    / len(string_split(text, ' ')))
                 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                    / length(text)), 4)"""


@register(
    "tx06_quality_filter",
    oracle=f"""
    WITH q AS (
        SELECT doc_id, source, {_QUALITY_SQL} AS quality
        FROM documents
    ),
    m AS (SELECT ROUND(quantile_cont(quality, 0.5), 6) AS cutoff FROM q)
    SELECT source,
           COUNT(*) AS n_kept,
           ROUND(CAST(SUM(CAST(quality AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_quality
    FROM q, m
    WHERE quality >= cutoff
    GROUP BY source
    """,
    note="corpus-quantile quality filtering: keep documents at or above "
    "the exact median quality score (two-pass: tiny cutoff aggregate "
    "broadcast back over the corpus — no sort of the full data)",
    tags=("text", "quality", "filter"),
)
def tx06_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id", "source", quality_score("text").alias("quality")
    )
    cutoff = q.agg(
        F.round(F.expr("percentile(quality, 0.5)"), 6).alias("cutoff")
    )
    kept = q.join(F.broadcast(cutoff)).where(
        F.col("quality") >= F.col("cutoff")
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.round(
            F.sum(F.col("quality").cast("decimal(38,6)")).cast("double")
            / F.count("*"),
            4,
        ).alias("avg_quality"),
    )


@register(
    "tx07_hash_split",
    oracle="""
    WITH s AS (
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      BETWEEN '0' AND 'b' THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('c', 'd') THEN 'val'
                 ELSE 'test'
               END AS split,
               length(text) AS n_chars
        FROM documents
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY split
    """,
    note="deterministic train/val/test split by content-id hash "
    "(md5 first hex digit: 12/2/2 of 16) — reproducible across runs "
    "and engines, no sampling state, stable under data arrival order",
    tags=("text", "split", "sampling"),
)
def tx07_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    digit = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(digit.between("0", "b"), "train")
        .when(digit.isin("c", "d"), "val")
        .otherwise("test")
    )
    return docs.select(
        split.alias("split"), F.length("text").alias("n_chars")
    ).groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "tx08_repetition_stats",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    grams AS (
        SELECT doc_id, 2 AS k,
               unnest(list_transform(
                   generate_series(1, greatest(len(l) - 1, 0)),
                   i -> array_to_string(l[i:i+1], ' '))) AS g
        FROM toks
        UNION ALL
        SELECT doc_id, 3 AS k,
               unnest(list_transform(
                   generate_series(1, greatest(len(l) - 2, 0)),
                   i -> array_to_string(l[i:i+2], ' '))) AS g
        FROM toks
    ),
    counts AS (
        SELECT doc_id, k, g, COUNT(*) AS c FROM grams GROUP BY ALL
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN k = 2 THEN c END) AS BIGINT) AS n_bigrams,
           ROUND(MAX(CASE WHEN k = 2 THEN c END) * 1.0
                 / SUM(CASE WHEN k = 2 THEN c END), 4) AS top_bigram_frac,
           ROUND(SUM(CASE WHEN k = 2 AND c > 1 THEN c ELSE 0 END) * 1.0
                 / SUM(CASE WHEN k = 2 THEN c END), 4) AS dup_bigram_frac,
           ROUND(SUM(CASE WHEN k = 3 AND c > 1 THEN c ELSE 0 END) * 1.0
                 / SUM(CASE WHEN k = 3 THEN c END), 4) AS dup_trigram_frac
    FROM counts GROUP BY doc_id
    """,
    note="Gopher-style repetition quality signals: top-bigram share, "
    "duplicated-bigram share, duplicated-trigram share per document — "
    "one unioned gram aggregation, no window sort",
    tags=("text", "quality", "repetition"),
)
def tx08_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs, "text", "doc_id")


@register(
    "tx09_stratified_sample",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(length(text)) AS BIGINT) AS kept_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          <= CASE lang WHEN 'en' THEN '3f'
                       WHEN 'zh' THEN 'ff'
                       ELSE '7f' END
    GROUP BY lang
    """,
    note="deterministic stratified sampling for a training mix: "
    "downsample dominant en to 25%, keep low-resource zh at 100%, "
    "others at 50% — md5(doc_id) prefix threshold, reproducible across "
    "engines/runs/partitionings, pure scan-level filter",
    tags=("text", "sampling", "split"),
)
def tx09_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.sampling import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_hash_sample(
        docs,
        "doc_id",
        "lang",
        {"en": 0.25, "zh": 1.0},
        default_rate=0.5,
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.sum(F.length("text")).cast("long").alias("kept_chars"),
    )


_PII_DOCS = [
    (1, "contact John.Doe+spam@example.co.uk or call +1 555-123-4567 now"),
    (2, "server 192.168.10.1 responded; fallback 10.0.0.255 was idle"),
    (3, "email bob@test.org, phone (020) 7946 0958, ip 8.8.8.8"),
    (4, "no sensitive content in this perfectly ordinary sentence"),
    (5, "mixed: a@b.io then 255.255.255.255 then +48 22 123 45 67 end"),
]


@register(
    "tx10_pii_redaction",
    oracle="""
    WITH docs(doc_id, text) AS (VALUES
        (1, 'contact John.Doe+spam@example.co.uk or call +1 555-123-4567 now'),
        (2, 'server 192.168.10.1 responded; fallback 10.0.0.255 was idle'),
        (3, 'email bob@test.org, phone (020) 7946 0958, ip 8.8.8.8'),
        (4, 'no sensitive content in this perfectly ordinary sentence'),
        (5, 'mixed: a@b.io then 255.255.255.255 then +48 22 123 45 67 end')
    )
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
               '\\+?\\d{1,3}[ -]?\\(?\\d{2,3}\\)?[ -]?\\d{3}[ -]?\\d{2,4}',
               '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
               AS BIGINT) AS n_emails
    FROM docs
    """,
    note="PII scrub for pre-training text: chained engine-portable "
    "RE2-compatible regexes (emails -> IPs -> phones, order prevents "
    "cross-matching), pure scan-level projection",
    tags=("text", "pii", "redaction"),
)
def tx10_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.text import PII_PATTERNS, redact_pii

    docs = spark.createDataFrame(_PII_DOCS, "doc_id int, text string")
    return docs.select(
        "doc_id",
        redact_pii("text").alias("redacted"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(PII_PATTERNS["EMAIL"]), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_emails"),
    )


@register(
    "tx11_decontamination",
    oracle="""
    WITH sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(l) - 4, 0)),
                   i -> array_to_string(l[i:i+4], ' ')))) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    ),
    probe AS (
        SELECT DISTINCT doc_id AS probe_id, shingle
        FROM sh WHERE doc_id % 17 = 0
    ),
    train AS (SELECT * FROM sh WHERE doc_id % 17 <> 0)
    SELECT t.doc_id,
           COUNT(DISTINCT t.shingle) AS n_overlap_ngrams,
           COUNT(DISTINCT p.probe_id) AS n_probe_docs
    FROM train t JOIN probe p USING (shingle)
    GROUP BY t.doc_id
    """,
    note="benchmark decontamination: 5-gram shingle overlap between "
    "the training split and a probe (benchmark) split via an "
    "inverted-index equi-join on the shingle — O(shared-shingle "
    "pairs), never all-pairs; at 100 TB join on xxhash64(shingle) and "
    "cap probe-side shingle document frequency to bound skew",
    tags=("text", "dedup", "decontamination"),
)
def tx11_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.text import contamination_overlap

    docs = load_table(spark, sf_dir, "documents")
    probe = docs.where(F.col("doc_id") % 17 == 0)
    train = docs.where(F.col("doc_id") % 17 != 0)
    return contamination_overlap(train, probe, "text", "doc_id", k=5)


@register(
    "tx12_chunking",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    SELECT doc_id,
           CAST((i - 1) // 24 AS BIGINT) AS chunk_idx,
           CAST(i AS BIGINT) AS start_token,
           CAST(len(l[i:i+31]) AS BIGINT) AS n_tokens,
           md5(array_to_string(l[i:i+31], ' ')) AS chunk_md5
    FROM d, UNNEST(generate_series(1, greatest(len(l), 1), 24)) AS u(i)
    """,
    note="token-window chunking (size 32, stride 24): overlapping "
    "pre-training/RAG chunks via sequence+explode+slice — all "
    "codegen'd, fan-out bounded by corpus tokens / stride, no shuffle "
    "(chunks inherit the scan's partitioning)",
    tags=("text", "chunking"),
)
def tx12_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.text import chunk_rows

    docs = load_table(spark, sf_dir, "documents")
    return chunk_rows(docs, "text", "doc_id", chunk_size=32, stride=24)


@register(
    "tx13_unicode_normalize",
    oracle="""
    WITH deco AS (
        SELECT doc_id,
               'cafe' || chr(769) || ' no' || chr(776) || 'el ' ||
               substr(text, 1, 40) AS raw
        FROM documents
    )
    SELECT doc_id,
           length(raw) AS len_raw,
           length(nfc_normalize(raw)) AS len_nfc,
           md5(nfc_normalize(raw)) AS nfc_md5
    FROM deco
    """,
    note="Unicode NFC normalization — the honest Arrow-UDF case (no "
    "Spark built-in can express canonical composition): vectorized "
    "pandas str.normalize over Arrow batches, hash-checked against "
    "DuckDB's nfc_normalize on text decorated with combining marks "
    "(the corpus is ASCII, so the marks are added deterministically)",
    tags=("text", "unicode", "udf"),
)
def tx13_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.text import normalize_unicode

    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("café nöel "), F.substring("text", 1, 40)
    )
    deco = docs.select("doc_id", raw.alias("raw"))
    norm = normalize_unicode("raw", "NFC")
    return deco.select(
        "doc_id",
        F.length("raw").alias("len_raw"),
        F.length(norm).alias("len_nfc"),
        F.md5(norm).alias("nfc_md5"),
    )


@register(
    "tx14_url_domain_stats",
    oracle="""
    WITH deco AS (
        SELECT doc_id,
               substr(text, 1, 30) || ' https://site' ||
               CAST(doc_id % 7 AS VARCHAR) || '.example/p/' ||
               CAST(doc_id AS VARCHAR) ||
               CASE WHEN doc_id % 3 = 0
                    THEN ' http://mirror.example/p/' ||
                         CAST(doc_id % 50 AS VARCHAR)
                    ELSE '' END AS body
        FROM documents
    ),
    u AS (
        SELECT doc_id,
               unnest(regexp_extract_all(body, 'https?://[^\\s]+')) AS url
        FROM deco
    )
    SELECT regexp_extract(url, 'https?://([^/\\s]+)', 1) AS domain,
           COUNT(*) AS n_urls,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(DISTINCT url) AS n_unique_urls
    FROM u GROUP BY domain
    """,
    note="web-corpus curation: URL extraction + per-domain stats "
    "(blocklists, per-site caps, URL dedup) — regexp_extract_all → "
    "explode → domain parse → one hash aggregate, all JVM-side; the "
    "ASCII corpus is decorated with deterministic synthetic URLs",
    tags=("text", "url", "web"),
)
def tx14_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.text import url_stats

    docs = load_table(spark, sf_dir, "documents")
    body = F.concat(
        F.substring("text", 1, 30),
        F.lit(" https://site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example/p/"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" http://mirror.example/p/"),
                (F.col("doc_id") % 50).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    deco = docs.select("doc_id", body.alias("body"))
    return url_stats(deco, "body", "doc_id")


@register(
    "tx15_seeded_corpus_shuffle",
    oracle="""
    WITH keyed AS (
        SELECT doc_id,
               CAST('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)),
                                   1, 15) AS BIGINT) AS k
        FROM documents
    )
    SELECT doc_id,
           k % 64 AS shard,
           row_number() OVER (PARTITION BY k % 64
                              ORDER BY k, doc_id) AS pos
    FROM keyed
    """,
    note="Deterministic seeded corpus shuffle for training-order "
    "reproducibility: md5('seed:'||doc_id) keys each doc to one of 64 "
    "shards with a position inside it. Positions come from the "
    "distributed grouped row number (a 64-value window PARTITION "
    "would cap parallelism at 64 corpus/64-sized reducers — the q39 "
    "class); re-running with the same seed on any engine yields the "
    "identical (shard, pos) assignment — the property a resumable "
    "data loader needs",
    tags=("text", "sampling", "shuffle"),
)
def tx15_seeded_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.dedup import portable_hash60
    from cdc_spark.operators.ordering import grouped_row_number

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        portable_hash60(
            F.concat(F.lit("42:"), F.col("doc_id").cast("string"))
        ).alias("__k"),
    ).withColumn("shard", F.col("__k") % 64)
    return grouped_row_number(
        keyed, "shard", ["__k", "doc_id"], out_col="pos"
    ).select("doc_id", "shard", "pos")


@register(
    "tx16_temperature_mixture",
    oracle="""
    WITH counts AS (
        SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    rates AS (
        SELECT source,
               greatest(CAST(floor(
                   sqrt((SELECT MIN(n) FROM counts) * 1.0 / n) * 256
               ) AS INT) - 1, 0) AS t
        FROM counts
    )
    SELECT d.source,
           COUNT(*) AS n_kept,
           MAX(t) AS threshold
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INT)
          <= t
    GROUP BY d.source
    """,
    note="temperature-weighted source mixing (alpha=0.5): per-source "
    "keep rates sqrt(n_min/n_s) DERIVED FROM THE DATA (kept counts "
    "become proportional to sqrt(n_s), flattening dominant sources), "
    "applied via the deterministic md5-prefix predicate — every float "
    "step is correctly-rounded IEEE, so the oracle recomputes "
    "bit-identical thresholds",
    tags=("text", "sampling", "mixture"),
)
def tx16_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.operators.sampling import temperature_mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = temperature_mixture_sample(docs, "doc_id", "source", alpha=0.5)
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.max("__thresh").alias("threshold"),
    )


@register(
    "tx17_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    ),
    freq AS (SELECT term, COUNT(*) AS tok_n FROM tok GROUP BY term),
    tot AS (SELECT COUNT(*) * 1.0 AS n FROM tok)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(CAST(ROUND(ln(tok_n / n), 6) AS DECIMAL(30,6)))
                      AS DOUBLE) / COUNT(*), 4) AS avg_logprob
    FROM tok JOIN freq USING (term) CROSS JOIN tot
    GROUP BY doc_id
    """,
    note="corpus-unigram language-model scoring (the classic "
    "perplexity-proxy quality filter): train the unigram LM on the "
    "corpus itself (one token hash-agg), score every document by its "
    "mean token log-probability. The token->frequency join is an "
    "inverted-index equi-join (never all-pairs); the corpus total is "
    "a broadcast 1-row aggregate; per-token logprobs are rounded then "
    "decimal-summed so the mean is order-independent across engines "
    "and cluster sizes",
    tags=("text", "quality", "lm"),
)
def tx17_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.queries.base import davg

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    freq = tok.groupBy("term").agg(F.count("*").alias("__tok_n"))
    total = tok.agg(F.count("*").cast("double").alias("__n"))
    lp = F.round(F.log(F.col("__tok_n") / F.col("__n")), 6)
    return (
        tok.join(freq, "term")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            davg(lp, scale=6, ndigits=4).alias("avg_logprob"),
        )
    )


@register(
    "tx18_curation_pipeline",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source, text,
               ROUND(least(len(string_split(text, ' ')) / 64.0, 1.0)
                     * (len(list_distinct(string_split(text, ' '))) * 1.0
                        / len(string_split(text, ' ')))
                     * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                        * 1.0 / length(text)), 4) AS quality
        FROM documents
        WHERE lang IN ('en', 'de', 'es', 'fr')
    ),
    kept AS (SELECT * FROM scored WHERE quality >= 0.25),
    keepers AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text),
    final AS (
        SELECT k.source, k.text, k.quality
        FROM kept k JOIN keepers USING (doc_id)
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
               AS total_tokens,
           ROUND(CAST(SUM(CAST(quality AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 4) AS mean_quality
    FROM final
    GROUP BY source
    ORDER BY source
    """,
    note="end-to-end corpus curation composite — the LLM-pretraining "
    "shape run as ONE declarative plan: language filter -> quality "
    "score gate (>= 0.25 on the rounded score, so the cut is "
    "engine-identical) -> exact-dedup keep-min-id -> per-source kept "
    "docs / token budget / mean quality. Catalyst pipelines the "
    "filter+score map-side; the only shuffles are the dedup group and "
    "the final per-source agg — demonstrating the individually-gated "
    "stages compose without materialization between them",
    tags=("text", "pipeline", "dedup", "quality"),
)
def tx18_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("lang").isin("en", "de", "es", "fr")
    )
    kept = docs.select(
        "doc_id", "source", "text", quality_score("text").alias("quality")
    ).where(F.col("quality") >= 0.25)
    keepers = kept.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    final = kept.join(keepers.select("doc_id"), "doc_id", "left_semi")
    return (
        final.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("long")
            .alias("total_tokens"),
            F.round(
                F.sum(F.col("quality").cast("decimal(30,6)")).cast("double")
                / F.count("*"),
                4,
            ).alias("mean_quality"),
        )
        .orderBy("source")
    )


@register(
    "tx19_quality_percentile_prune",
    oracle=f"""
    WITH scored AS (
        SELECT lang, {_QUALITY_SQL} AS q FROM documents
    ),
    thr AS (
        SELECT lang, COUNT(*) AS n_docs,
               ROUND(quantile_cont(q, 0.7), 4) AS threshold
        FROM scored GROUP BY lang
    )
    SELECT t.lang, t.n_docs, t.threshold,
           COUNT(*) AS n_kept,
           ROUND(CAST(SUM(CAST(s.q AS DECIMAL(30,4))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_kept_quality
    FROM scored s JOIN thr t ON s.lang = t.lang
    WHERE s.q >= t.threshold
    GROUP BY t.lang, t.n_docs, t.threshold
    """,
    note="per-slice percentile pruning (keep the top 30% by quality "
    "within each language): the threshold is an exact interpolated "
    "p70 per slice computed as ONE hash aggregate — no per-slice "
    "window sort over the corpus — broadcast back and applied as a "
    "filter. Scores and thresholds rounded to 4 decimals on both "
    "engines so the boundary comparison cannot flip on last-bit "
    "interpolation noise",
    tags=("text", "quality", "curation", "percentile"),
)
def tx19_quality_percentile_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.queries.base import davg

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang", F.round(quality_score("text"), 4).alias("q")
    )
    thr = scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.percentile("q", 0.7), 4).alias("threshold"),
    )
    # no forced broadcast: the threshold table is |languages| rows, but
    # that bound is semantic, not structural — AQE's runtime stats
    # broadcast it at any scale (plan-guardrail discipline: only 1-row
    # aggregates and fixed dims get an explicit broadcast hint)
    kept = scored.join(thr, "lang").where(
        F.col("q") >= F.col("threshold")
    )
    return kept.groupBy("lang", "n_docs", "threshold").agg(
        F.count("*").alias("n_kept"),
        davg("q", scale=4, ndigits=6).alias("avg_kept_quality"),
    )


def _pagerank_oracle(iters: int = 3) -> str:
    """Unrolled-iteration PageRank twin: each iteration's per-target
    contributions are rounded then decimal-summed, so the fold is
    order-independent and both engines produce bit-identical ranks."""
    ctes = [
        "n AS (SELECT COUNT(*) AS n_docs FROM documents)",
        "nodes AS (SELECT doc_id FROM documents)",
        """edges AS (
        SELECT doc_id AS src,
               (doc_id * 31 + 7) % (SELECT n_docs FROM n) AS dst
        FROM documents
        UNION ALL
        SELECT doc_id,
               (doc_id * 17 + 3) % (SELECT n_docs FROM n)
        FROM documents
    )""",
        """r0 AS (
        SELECT doc_id,
               CAST(1.0 AS DOUBLE) / (SELECT n_docs FROM n) AS rank
        FROM nodes
    )""",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""c{i} AS (
        SELECT e.dst,
               SUM(CAST(ROUND(r.rank * CAST(0.425 AS DOUBLE), 12)
                        AS DECIMAL(30,12))) AS s
        FROM edges e JOIN r{i - 1} r ON e.src = r.doc_id
        GROUP BY e.dst
    )""")
        ctes.append(f"""r{i} AS (
        SELECT nd.doc_id,
               ROUND(CAST(0.15 AS DOUBLE) / (SELECT n_docs FROM n)
                     + COALESCE(CAST(c{i}.s AS DOUBLE), 0), 12) AS rank
        FROM nodes nd LEFT JOIN c{i} ON c{i}.dst = nd.doc_id
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT doc_id, ROUND(rank, 9) AS pagerank
    FROM r{iters}
    ORDER BY pagerank DESC, doc_id
    LIMIT 20
    """
    )


@register(
    "tx20_link_pagerank",
    oracle=_pagerank_oracle(3),
    note="link-authority scoring for web curation (the domain-rank "
    "quality prior, cf. Common Crawl harmonic centrality): 3 "
    "power-iteration rounds of PageRank (damping 0.85, uniform "
    "out-degree 2) over a deterministic synthetic link graph "
    "derived from doc ids. Each round is one equi-join + one hash "
    "aggregate (contributions rounded then decimal-summed, so the "
    "distributed fold is order-independent); iterations unrolled in "
    "the SQL oracle. The Spark loop localCheckpoints per round — at "
    "scale, lineage truncation is what keeps iteration k from "
    "re-running rounds 1..k-1",
    tags=("text", "web", "graph", "pagerank"),
)
def tx20_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.queries.base import dsum

    docs = load_table(spark, sf_dir, "documents")
    # corpus size rides along as a broadcast scalar column instead of a
    # driver-side docs.count(): the whole graph construction stays one
    # lazy plan with zero eager driver jobs. The crossJoin happens ONCE
    # (the ranks seed); every later round re-derives n_docs from the
    # previous checkpointed ranks instead of re-scanning + re-attaching
    # it to a fresh nodes frame (the round-7 +29% was 3 extra scans +
    # broadcasts riding the iterations).
    n_row = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    nodes = docs.select("doc_id").crossJoin(n_row)
    src = F.col("doc_id")
    n_col = F.col("n_docs")
    edges = nodes.select(
        src.alias("src"),
        F.explode(
            F.array((src * 31 + 7) % n_col, (src * 17 + 3) % n_col)
        ).alias("dst"),
    ).localCheckpoint(eager=True)  # reused every round
    # lazy pin: the seed feeds BOTH round-1 consumers (contrib join +
    # the rank rewrite); without it each would re-scan documents
    ranks = nodes.select(
        "doc_id",
        (F.lit(1.0) / n_col.cast("double")).alias("rank"),
        "n_docs",
    ).localCheckpoint(eager=False)
    for _ in range(3):
        contrib = edges.join(
            ranks, edges.src == ranks.doc_id
        ).select(
            "dst",
            F.round(F.col("rank") * F.lit(0.425), 12).alias("c"),
        )
        agg = contrib.groupBy("dst").agg(dsum("c", scale=12).alias("s"))
        # ranks always holds EVERY node (seeded from nodes, preserved
        # by the left join), so iterate on ranks itself — no per-round
        # nodes re-scan
        ranks = (
            ranks.join(agg, ranks.doc_id == agg.dst, "left")
            .select(
                ranks.doc_id,
                F.round(
                    F.lit(0.15) / n_col.cast("double")
                    + F.coalesce(F.col("s"), F.lit(0.0)),
                    12,
                ).alias("rank"),
                "n_docs",
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.select("doc_id", F.round("rank", 9).alias("pagerank"))
        .orderBy(F.desc("pagerank"), F.asc("doc_id"))
        .limit(20)
    )


@register(
    "tx21_bigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
        FROM documents
    ),
    tok AS (SELECT doc_id, unnest(l) AS term FROM toks),
    uni AS (SELECT term, COUNT(*) AS c1 FROM tok GROUP BY term),
    tot AS (SELECT COUNT(*) * 1.0 AS n FROM tok),
    bi AS (
        SELECT doc_id, b['w1'] AS w1, b['w2'] AS w2 FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(l) - 1),
                       i -> struct_pack(w1 := l[i], w2 := l[i + 1])
                   )) AS b
            FROM toks WHERE len(l) >= 2
        )
    ),
    bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(ROUND(ln(
                     CAST(0.75 AS DOUBLE) * c12 / u1.c1
                     + CAST(0.25 AS DOUBLE) * u2.c1 / n), 6)
                 AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 4)
               AS avg_logprob
    FROM bi
    JOIN bc USING (w1, w2)
    JOIN uni u1 ON bi.w1 = u1.term
    JOIN uni u2 ON bi.w2 = u2.term
    CROSS JOIN tot
    GROUP BY doc_id
    """,
    note="corpus-bigram LM scoring with unigram interpolation "
    "(KenLM-ish backoff shape, the stronger perplexity-proxy filter "
    "over tx17): P(w2|w1) = 0.75*c12/c1 + 0.25*c2/N, trained on the "
    "corpus itself — bigram and unigram models are each ONE hash "
    "aggregate, scoring is inverted-index equi-joins (never "
    "all-pairs), the corpus total a broadcast 1-row aggregate. "
    "Per-bigram logprobs rounded then decimal-summed so the mean is "
    "order-independent across engines and cluster sizes. Single-token "
    "docs have no bigrams and drop out (same rule both engines)",
    tags=("text", "quality", "lm", "bigram"),
)
def tx21_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.queries.base import davg

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("__l"))
    tok = toks.select("doc_id", F.explode("__l").alias("term"))
    uni = tok.groupBy("term").agg(F.count("*").alias("__c1"))
    total = tok.agg(F.count("*").cast("double").alias("__n"))
    bi = toks.where(F.size("__l") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(__l) - 1), "
                "i -> struct(element_at(__l, i) AS w1, "
                "element_at(__l, i + 1) AS w2))"
            )
        ).alias("__b"),
    ).select("doc_id", F.col("__b.w1").alias("w1"), F.col("__b.w2").alias("w2"))
    bc = bi.groupBy("w1", "w2").agg(F.count("*").alias("__c12"))
    u1 = uni.select(F.col("term").alias("w1"), F.col("__c1").alias("__cw1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("__c1").alias("__cw2"))
    lp = F.round(
        F.log(
            F.lit(0.75) * F.col("__c12") / F.col("__cw1")
            + F.lit(0.25) * F.col("__cw2") / F.col("__n")
        ),
        6,
    )
    return (
        bi.join(bc, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            davg(lp, scale=6, ndigits=4).alias("avg_logprob"),
        )
    )


# Stand-in blocklist over the synthetic vocabulary; a production safety
# filter swaps in its real term list — the plan shape is identical.
_BLOCKLIST = ("slow", "dup", "crash")


@register(
    "tx22_blocklist_filter",
    oracle=f"""
    WITH flagged AS (
        SELECT doc_id, source,
               len(list_intersect(
                   list_distinct(string_split_regex(trim(text), '\\s+')),
                   [{", ".join(repr(w) for w in _BLOCKLIST)}]
               )) AS n_hits
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) FILTER (n_hits = 0) AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (n_hits > 0) AS BIGINT) AS n_flagged,
           CAST(MAX(n_hits) AS BIGINT) AS max_hits
    FROM flagged GROUP BY source
    """,
    note="blocklist safety filtering (the C4-style badwords stage "
    "every curation pipeline runs): token-boundary matching via "
    "tokenize + set-intersect — NOT substring contains, so 'dup' "
    "cannot flag 'dedupe' — entirely codegen'd array expressions, "
    "zero Python. Per-source kept/flagged accounting; the term list "
    "is a stand-in over the synthetic vocabulary, the plan shape is "
    "what production swaps its real list into",
    tags=("text", "safety", "curation"),
)
def tx22_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hits = F.size(
        F.array_intersect(
            F.array_distinct(tokens(F.col("text"))),
            F.array(*[F.lit(w) for w in _BLOCKLIST]),
        )
    )
    flagged = docs.select("source", hits.alias("n_hits"))
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("n_hits") == 0, 1)).cast("long").alias("n_kept"),
        F.count(F.when(F.col("n_hits") > 0, 1))
        .cast("long")
        .alias("n_flagged"),
        F.max("n_hits").cast("long").alias("max_hits"),
    )


@register(
    "tx23_intradoc_dedup",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
        FROM documents
    ),
    spans AS (
        SELECT doc_id, wi,
               array_to_string(l[wi * 8 + 1 : wi * 8 + 8], ' ') AS span
        FROM toks,
             LATERAL unnest(generate_series(
                 0, greatest((len(l) + 7) // 8 - 1, 0))) t(wi)
        WHERE len(l) > 0
    ),
    marked AS (
        SELECT doc_id, wi, span,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id, span ORDER BY wi
               ) AS occ
        FROM spans
    )
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(COUNT(*) FILTER (occ = 1) AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (occ > 1) AS BIGINT) AS n_dropped
    FROM marked GROUP BY doc_id
    """,
    note="intra-document repetition removal (the dolma-style cleaning "
    "stage): each doc splits into contiguous 8-token spans, repeated "
    "spans WITHIN a doc keep only their first occurrence (row_number "
    "per (doc, span) ordered by position — deterministic). Per-doc "
    "kept/dropped accounting; the span partition key means the "
    "window state is bounded by one document, never corpus-wide",
    tags=("text", "dedup", "cleaning"),
)
def tx23_intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("__l")).where(
        F.size("__l") > 0
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(int((size(__l) + 7) / 8)"
                " - 1, 0)), wi -> struct(wi, array_join(slice(__l, "
                "wi * 8 + 1, 8), ' ') AS span))"
            )
        ).alias("__s"),
    ).select("doc_id", F.col("__s.wi").alias("wi"), F.col("__s.span").alias("span"))
    w = Window.partitionBy("doc_id", "span").orderBy("wi")
    marked = spans.withColumn("occ", F.row_number().over(w))
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.count(F.when(F.col("occ") == 1, 1)).cast("long").alias("n_kept"),
        F.count(F.when(F.col("occ") > 1, 1)).cast("long").alias("n_dropped"),
    )


_POS_WORDS = ("fast", "big", "value")
_NEG_WORDS = ("slow", "small", "dup")


@register(
    "tx24_lexicon_sentiment",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source,
               len(list_filter(string_split_regex(trim(text), '\\s+'),
                   t -> list_contains(
                       [{", ".join(repr(w) for w in _POS_WORDS)}], t)))
                   AS n_pos,
               len(list_filter(string_split_regex(trim(text), '\\s+'),
                   t -> list_contains(
                       [{", ".join(repr(w) for w in _NEG_WORDS)}], t)))
                   AS n_neg,
               len(string_split_regex(trim(text), '\\s+')) AS n_tok
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_pos) AS BIGINT) AS total_pos,
           CAST(SUM(n_neg) AS BIGINT) AS total_neg,
           ROUND(CAST(SUM(CAST(ROUND((n_pos - n_neg) * 1.0 / n_tok, 6)
                               AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_polarity
    FROM scored GROUP BY source
    """,
    note="lexicon-based sentiment scoring at corpus scale (the "
    "EDBT-2016 Spark-sentiment shape from PAPERS.md): per-doc "
    "positive/negative token counts against a broadcast-literal "
    "lexicon — pure codegen'd array expressions, token-boundary "
    "matched — polarity = (pos-neg)/tokens, per-source aggregate "
    "with rounded-then-decimal-summed means. The lexicon is a "
    "stand-in over the synthetic vocabulary; production swaps in "
    "SentiWordNet-style lists with the identical plan",
    tags=("text", "sentiment", "analytics"),
)
def tx24_lexicon_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_spark.queries.base import davg

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    pos = F.array(*[F.lit(w) for w in _POS_WORDS])
    neg = F.array(*[F.lit(w) for w in _NEG_WORDS])
    n_pos = F.size(F.filter(toks, lambda t: F.array_contains(pos, t)))
    n_neg = F.size(F.filter(toks, lambda t: F.array_contains(neg, t)))
    scored = docs.select(
        "source",
        n_pos.alias("n_pos"),
        n_neg.alias("n_neg"),
        F.size(toks).alias("n_tok"),
    )
    polarity = F.round(
        (F.col("n_pos") - F.col("n_neg")) / F.col("n_tok"), 6
    )
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_pos").cast("long").alias("total_pos"),
        F.sum("n_neg").cast("long").alias("total_neg"),
        davg(polarity, scale=6, ndigits=4).alias("avg_polarity"),
    )


@register(
    "tx25_paragraph_dedup",
    oracle="""
    WITH split AS (
        SELECT doc_id, string_split(text, '.') AS parts FROM documents
    ),
    paras AS (
        SELECT doc_id, u.i AS para_idx, trim(parts[u.i]) AS para
        FROM split, UNNEST(generate_series(1, len(parts))) AS u(i)
        WHERE length(trim(parts[u.i])) >= 20
    ),
    keeper AS (
        SELECT md5(para) AS h,
               MIN(doc_id * 100000 + para_idx) AS first_slot
        FROM paras GROUP BY md5(para)
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_paras,
           CAST(COUNT(CASE WHEN p.doc_id * 100000 + p.para_idx
                                = k.first_slot THEN 1 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN p.doc_id * 100000 + p.para_idx
                              <> k.first_slot
                         THEN length(p.para) ELSE 0 END)
                AS BIGINT) AS dropped_chars
    FROM paras p JOIN keeper k ON md5(p.para) = k.h
    GROUP BY p.doc_id
    """,
    note="cross-document paragraph dedup (the CCNet preprocessing "
    "shape — dedup at PARAGRAPH granularity across the whole corpus, "
    "not whole-document dd01 nor within-document tx23): sentences "
    "split on '.', short fragments dropped, each distinct paragraph "
    "hash keeps only its first occurrence corpus-wide (min "
    "(doc,position) slot — deterministic keeper). One explode + one "
    "hash-agg + one equi-join on the md5 — the shuffle key is the "
    "16-byte hash, never paragraph text; per-doc kept/dropped "
    "accounting gated",
    tags=("text", "dedup", "paragraph", "ccnet"),
)
def tx25_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    paras = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), "\\.")).alias(
                "idx", "raw"
            ),
        )
        .select(
            "doc_id",
            (F.col("idx") + 1).alias("para_idx"),
            F.trim(F.col("raw")).alias("para"),
        )
        .where(F.length("para") >= 20)
    )
    slot = F.col("doc_id") * 100000 + F.col("para_idx")
    hashed = paras.select(
        "doc_id", "para_idx", "para", F.md5("para").alias("h"), slot.alias("slot")
    )
    keeper = hashed.groupBy("h").agg(F.min("slot").alias("first_slot"))
    joined = hashed.join(keeper, "h")
    kept = F.col("slot") == F.col("first_slot")
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_paras"),
        F.count(F.when(kept, 1)).cast("long").alias("n_kept"),
        F.sum(F.when(~kept, F.length("para")).otherwise(0))
        .cast("long")
        .alias("dropped_chars"),
    )


@register(
    "tx26_gopher_quality_rules",
    oracle="""
    WITH feat AS (
        SELECT doc_id, source,
               string_split_regex(trim(text), '\\s+') AS w,
               string_split(text, chr(10)) AS ln,
               length(text) - length(replace(text, '#', '')) AS n_hash,
               (length(text) - length(replace(text, '...', ''))) // 3
                   AS n_ell
        FROM documents
    ),
    m AS (
        SELECT doc_id, source, n_hash, n_ell,
               len(w) AS n_words,
               list_sum(list_transform(w, x -> length(x))) AS sum_len,
               len(list_filter(w,
                   x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
               len(ln) AS n_lines,
               len(list_filter(ln, x ->
                   starts_with(ltrim(x), '-')
                   OR starts_with(ltrim(x), '*'))) AS n_bullet,
               len(list_filter(ln, x ->
                   x LIKE '%...')) AS n_endell,
               (CASE WHEN list_contains(list_transform(w,
                    x -> lower(x)), 'the') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(list_transform(w,
                    x -> lower(x)), 'of') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(list_transform(w,
                    x -> lower(x)), 'and') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(list_transform(w,
                    x -> lower(x)), 'to') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(list_transform(w,
                    x -> lower(x)), 'in') THEN 1 ELSE 0 END)
                   AS n_stop
        FROM feat
    ),
    rules AS (
        SELECT doc_id, source,
               CASE WHEN n_words BETWEEN 50 AND 100000
                    THEN 1 ELSE 0 END AS r_count,
               CASE WHEN 3 * n_words <= sum_len
                         AND sum_len <= 10 * n_words
                    THEN 1 ELSE 0 END AS r_wordlen,
               CASE WHEN 10 * (n_hash + n_ell) <= n_words
                    THEN 1 ELSE 0 END AS r_symbol,
               CASE WHEN 10 * n_bullet <= 9 * n_lines
                    THEN 1 ELSE 0 END AS r_bullet,
               CASE WHEN 10 * n_endell <= 3 * n_lines
                    THEN 1 ELSE 0 END AS r_ellipsis,
               CASE WHEN 10 * n_alpha >= 8 * n_words
                    THEN 1 ELSE 0 END AS r_alpha,
               CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop
        FROM m
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN r_count + r_wordlen + r_symbol
                              + r_bullet + r_ellipsis + r_alpha
                              + r_stop = 7
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(1 - r_count) AS BIGINT) AS fail_count,
           CAST(SUM(1 - r_wordlen) AS BIGINT) AS fail_wordlen,
           CAST(SUM(1 - r_symbol) AS BIGINT) AS fail_symbol,
           CAST(SUM(1 - r_bullet) AS BIGINT) AS fail_bullet,
           CAST(SUM(1 - r_ellipsis) AS BIGINT) AS fail_ellipsis,
           CAST(SUM(1 - r_alpha) AS BIGINT) AS fail_alpha,
           CAST(SUM(1 - r_stop) AS BIGINT) AS fail_stop
    FROM rules GROUP BY source
    """,
    note="the Gopher rule battery (Rae et al. 2021, public — the "
    "canonical pretraining quality gate): word-count bounds, mean "
    "word length in [3,10], symbol-to-word ratio, bullet-line and "
    "ellipsis-line ratios, alphabetic-word ratio >= 80%, >= 2 stop "
    "words. Every ratio test is INTEGER cross-multiplication (3n <= "
    "sumlen <= 10n, not sumlen/n in [3,10]) so the battery is "
    "engine-exact with no float anywhere; per-source pass counts and "
    "per-rule failure attribution — the report an operator reads "
    "before committing a 100 TB filter sweep. One projection of "
    "array HOFs + one hash aggregate; no shuffle before the agg",
    tags=("text", "quality", "gopher", "curation"),
)
def tx26_gopher_quality_rules(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    w = F.split(F.trim(text), r"\s+")
    ln = F.split(text, "\n")
    lw = F.transform(w, F.lower)
    feat = docs.select(
        "doc_id",
        "source",
        F.size(w).alias("n_words"),
        F.aggregate(
            F.transform(w, F.length), F.lit(0), lambda a, x: a + x
        ).alias("sum_len"),
        F.size(
            F.filter(w, lambda x: x.rlike("[A-Za-z]"))
        ).alias("n_alpha"),
        F.size(ln).alias("n_lines"),
        F.size(
            F.filter(
                ln,
                lambda x: F.ltrim(x).startswith("-")
                | F.ltrim(x).startswith("*"),
            )
        ).alias("n_bullet"),
        F.size(
            F.filter(ln, lambda x: x.endswith("..."))
        ).alias("n_endell"),
        (
            F.length(text) - F.length(F.replace(text, F.lit("#")))
        ).alias("n_hash"),
        F.floor(
            (F.length(text) - F.length(F.replace(text, F.lit("..."))))
            / 3
        ).alias("n_ell"),
        (
            F.array_contains(lw, "the").cast("int")
            + F.array_contains(lw, "of").cast("int")
            + F.array_contains(lw, "and").cast("int")
            + F.array_contains(lw, "to").cast("int")
            + F.array_contains(lw, "in").cast("int")
        ).alias("n_stop"),
    )
    c = F.col
    rules = feat.select(
        "source",
        c("n_words").between(50, 100000).cast("int").alias("r_count"),
        (
            (3 * c("n_words") <= c("sum_len"))
            & (c("sum_len") <= 10 * c("n_words"))
        ).cast("int").alias("r_wordlen"),
        (10 * (c("n_hash") + c("n_ell")) <= c("n_words"))
        .cast("int")
        .alias("r_symbol"),
        (10 * c("n_bullet") <= 9 * c("n_lines"))
        .cast("int")
        .alias("r_bullet"),
        (10 * c("n_endell") <= 3 * c("n_lines"))
        .cast("int")
        .alias("r_ellipsis"),
        (10 * c("n_alpha") >= 8 * c("n_words"))
        .cast("int")
        .alias("r_alpha"),
        (c("n_stop") >= 2).cast("int").alias("r_stop"),
    )
    all_pass = (
        c("r_count")
        + c("r_wordlen")
        + c("r_symbol")
        + c("r_bullet")
        + c("r_ellipsis")
        + c("r_alpha")
        + c("r_stop")
        == 7
    )
    return rules.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(all_pass.cast("int")).cast("long").alias("n_pass"),
        F.sum(1 - c("r_count")).cast("long").alias("fail_count"),
        F.sum(1 - c("r_wordlen")).cast("long").alias("fail_wordlen"),
        F.sum(1 - c("r_symbol")).cast("long").alias("fail_symbol"),
        F.sum(1 - c("r_bullet")).cast("long").alias("fail_bullet"),
        F.sum(1 - c("r_ellipsis")).cast("long").alias("fail_ellipsis"),
        F.sum(1 - c("r_alpha")).cast("long").alias("fail_alpha"),
        F.sum(1 - c("r_stop")).cast("long").alias("fail_stop"),
    )


_SEG_LANG_SCORES = ",\n".join(
    f"len(list_intersect(list_distinct(seg), "
    f"{_stoplist_sql(lang)})) AS s_{lang}"
    for lang in sorted(STOPWORDS)
)


@register(
    "tx27_segment_language_consistency",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(trim(text), '\\s+') AS t
        FROM documents
    ),
    segs AS (
        SELECT doc_id,
               t[40 * g + 1 : 40 * g + 40] AS seg
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(
                       0, CAST(CEIL(len(t) / 40.0) AS BIGINT) - 1))
                       AS g
            FROM toks
        )
    ),
    scored AS (
        SELECT doc_id, {_SEG_LANG_SCORES} FROM segs
    ),
    labeled AS (
        SELECT doc_id, {_LANG_CASE} AS seg_lang FROM scored
    ),
    per_lang AS (
        SELECT doc_id, seg_lang, COUNT(*) AS n_segs,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY COUNT(*) DESC, seg_lang
               ) AS rn
        FROM labeled GROUP BY doc_id, seg_lang
    )
    SELECT d.doc_id,
           CAST(SUM(p.n_segs) AS BIGINT) AS n_segments,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           MAX(CASE WHEN p.rn = 1 THEN p.seg_lang END) AS majority_lang,
           CAST(CASE WHEN COUNT(*) > 1 THEN 1 ELSE 0 END AS BIGINT)
               AS mixed
    FROM per_lang p JOIN documents d ON p.doc_id = d.doc_id
    GROUP BY d.doc_id
    """,
    note="segment-level language consistency (the code-switching / "
    "boilerplate-contamination probe doc-level lang-ID misses): each "
    "document splits into 40-token segments, every segment gets the "
    "tx01 stopword-argmax language, and the doc reports segment "
    "count, distinct language count, majority language "
    "(deterministic count-then-lex tiebreak) and a mixed flag — the "
    "filter signal for 'mostly-English page with an embedded French "
    "nav bar'. Row expansion bounded by n/40 per doc, per-doc "
    "windows bounded by language count; one scan, one aggregate "
    "chain",
    tags=("text", "langid", "segmentation", "curation"),
)
def tx27_segment_language_consistency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from cdc_spark.operators.text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    # explode the window index first, then slice the token array
    segged = (
        docs.select("doc_id", toks.alias("t"))
        .select(
            "doc_id",
            "t",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.ceil(F.size("t") / 40.0).cast("long") - 1,
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            F.slice(
                F.col("t"), (F.col("g") * 40 + 1).cast("int"), 40
            ).alias("seg"),
        )
    )
    langs = sorted(STOPWORDS)
    scores = {
        lang: F.size(
            F.array_intersect(
                F.array_distinct(F.col("seg")),
                F.array(*[F.lit(w) for w in STOPWORDS[lang]]),
            )
        )
        for lang in langs
    }
    best = F.greatest(*scores.values())
    lang_case = F.when(best == 0, "und")
    for lang in langs:
        lang_case = lang_case.when(scores[lang] == best, lang)
    labeled = segged.select(
        "doc_id", lang_case.alias("seg_lang")
    )
    per_lang = labeled.groupBy("doc_id", "seg_lang").agg(
        F.count("*").alias("n_segs")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("n_segs"), F.asc("seg_lang")
    )
    ranked = per_lang.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.sum("n_segs").cast("long").alias("n_segments"),
        F.count("*").cast("long").alias("n_langs"),
        F.max(F.when(F.col("rn") == 1, F.col("seg_lang"))).alias(
            "majority_lang"
        ),
        F.when(F.count("*") > 1, 1).otherwise(0).cast("long").alias(
            "mixed"
        ),
    )
