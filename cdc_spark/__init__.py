"""cdc_spark — a PySpark-native CDC + analytics engine.

Re-expresses the capability surface of the reference repo
``mateuszdyminski/cdc`` (a PostgreSQL logical-replication CDC consumer +
the architecture patterns from its talk) as an idiomatic Spark engine:

- ``cdc_spark.cdc``       — change-event envelope parsing (wal2json /
  Debezium / pgoutput-JSON dialects), PG→Spark type mapping, schema
  registry with mid-stream evolution, LSN-ordered latest-wins merge
  (upsert/delete/truncate apply), snapshot diff, log compaction,
  outbox routing.
- ``cdc_spark.operators`` — relational extensions Spark lacks natively
  (as-of join, range join) plus the large-scale training-data pipeline
  ops: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding-cosine), similarity search (brute-force + LSH-bucketed
  ANN), text analysis (language-ID, quality, tokens, fingerprints),
  multimodal binary-column plumbing.
- ``cdc_spark.queries``   — the declared query inventory (SURVEY.md §2)
  exposed through ``__spark_entry__.py``.
- ``cdc_spark.streaming`` — Structured Streaming pipelines: stream
  parse → watermark → foreachBatch merge, windowed aggregation,
  streaming dedup.

Everything is DataFrame-level: Catalyst plans, Tungsten executes.
"""

__version__ = "0.1.0"
