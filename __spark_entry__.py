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


# Rotated for round 8: the driver samples a 50-row prefix, so the
# ordering below IS the gate. Tier 0 (_R8_PREFIX) is exactly 50
# entries: the 39 never-gated oracled round-7 additions (q31 stays
# excluded — no oracle by design, a slot would only record a
# guaranteed no_oracle row) plus 11 freshness re-gates:
# q39_rank_functions (rebuilt this round on the grouped rank family —
# oracle unchanged, plan changed) and 10 of the oldest r1-era rows.
# Tier 1 (_R9_NEXT) is this round's new additions, staged for the
# round-9 gate; tier 2 the previous prefix; tier 3 everything else.
_R8_PREFIX = (
    # 39 round-7 additions — never gated, first in line
    "q30_percentiles",
    "ss20_pq_refine_rerank",
    "ss21_maxsim_multivector",
    "ss22_ivf_nprobe_sweep",
    "ss23_filtered_ivfpq_probe",
    "dd17_minhash_accuracy_eval",
    "dd18_soft_dedup_weights",
    "dd19_jaccard_threshold_curve",
    "dp10_strided_chunking",
    "dp11_anneal_mixture_schedule",
    "tx26_gopher_quality_rules",
    "tx27_segment_language_consistency",
    "mm08_aspect_bucket_batching",
    "st24_stream_partitioned_sink",
    "st25_rocksdb_state_backend",
    "cdc31_schema_compat_gate",
    "cdc32_arrival_disorder_metrics",
    "io20_max_records_per_file",
    "io21_codec_matrix_roundtrip",
    "io22_nested_column_pruning",
    "io23_cbo_stats_broadcast",
    "mm09_modality_router",
    "pu07_iterator_scalar_udf",
    "q94_group_order_by_all",
    "q95_lateral_join_api",
    "q96_equiwidth_histogram",
    "q97_skyline_frontier",
    "io24_dynamic_partition_pruning",
    "cdc33_consistent_cut_read",
    "q98_quantile_binning",
    "st26_rate_limited_backfill",
    "q99_kmv_distinct",
    "q100_countmin_freq",
    "q101_kmv_merge",
    "q102_data_quality_audit",
    "q103_bloom_membership",
    "st27_streaming_kmv_cardinality",
    "q104_kmv_set_intersection",
    "q105_bottomk_sample",
    # rebuilt this round (grouped rank family; oracle unchanged)
    "q39_rank_functions",
    # 10 freshness re-gates — oldest (r1-era) driver rows
    "q06_revenue_filter",
    "q12_rollup",
    "q14_window_topk",
    "q17_sessionization",
    "q25_asof_join",
    "q41_correlated_scalar_subquery",
    "q47_market_share",
    "q52_salted_skew_agg",
    "q53_collect_sorted",
    "q54_except_all_multiset",
)

# Round-8 additions — never gated; first in line for the round-9
# rotation (tier 1, immediately after this round's 50-entry prefix).
_R9_NEXT = (
    "q106_mergeable_quantile_sketch",
    "q107_stratified_sample_quantiles",
    "q108_priority_weighted_sample",
    "st28_streaming_quantile_sketch",
    "q109_asof_nearest_tolerance",
    "q110_cms_join_cardinality",
    "q111_kmv_accuracy_sweep",
    "io25_nested_schema_evolution",
    "st29_streaming_cms_maintenance",
)

_R7_PREFIX = (
    # new in round 6 — never gated, first in line
    "ss15_pq_adc_topk",
    "dp07_curriculum_shard_write",
    "mm06_scene_segmentation",
    "io15_zorder_layout",
    "dp08_striped_packing",
    "pu06_map_in_arrow",
    "q85_pivot_matrix",
    # stale r4 no_oracle rows — oracles exist since r5; re-gate
    "st06_stateful_running_counts",
    "dd03_minhash_lsh",
    "dd04_simhash",
    "ss16_pq_persisted_index",
    "ss17_ivfpq_index",
    "cdc27_overlap_replay_dedup",
    "q86_sql_scalar_udf",
    "st20_stream_vector_index_ingest",
    "dd15_fuzzy_decontamination",
    "q87_variant_shred",
    "io16_python_datasource_writer",
    "q88_recursive_cte",
    "st21_state_store_inspection",
    "mm07_pair_similarity_filter",
    "q89_unpivot_api",
    "q90_null_safe_join",
    "cdc28_as_of_lsn_read",
    "dp09_token_budget_mixture",
    "q91_year_over_year",
    "ss18_binary_quantization",
    "cdc29_vacuum_survivor_state",
    "q92_multiset_set_ops",
    "io17_type_widening_read",
    "tx25_paragraph_dedup",
    "st22_stream_scd2_build",
    "ss19_radius_search",
    "io18_write_audit_publish",
    "q93_trailing_window_features",
    "st23_stream_watchlist_alerts",
    "io19_python_stream_sink",
    "dd16_quality_keeper_dedup",
    "cdc30_idempotent_consumer",
    "q75_funnel_conversion",
    "q76_cohort_retention",
    "q78_anomaly_zscore",
    "q80_observed_metrics",
    "q81_grouping_id",
    "q82_outer_explode",
    "q83_ignore_nulls_locf",
    "q26_range_join",
    "q28_tumbling_window",
    "q29_sliding_window",
    # semantics changed round 7 (unit_cost -> fixed-point unit_cost_e4
    # after the sf0.1 rounding-boundary fix): its r1 driver row is
    # schema-stale, so it re-enters the gate; q30 moved to the front
    # of the round-8 tier to make room
    "q61_min_cost_supplier",
)

_R7_RANK = {n: i for i, n in enumerate(_R7_PREFIX)}
_R8_RANK = {n: i for i, n in enumerate(_R8_PREFIX)}
_R9_RANK = {n: i for i, n in enumerate(_R9_NEXT)}


def _rank(name: str) -> tuple[int, int, str]:
    if name in _R8_RANK:
        return (0, _R8_RANK[name], name)
    if name in _R9_RANK:
        return (1, _R9_RANK[name], name)
    if name in _R7_RANK:
        return (2, _R7_RANK[name], name)
    return (3, 0, name)


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
