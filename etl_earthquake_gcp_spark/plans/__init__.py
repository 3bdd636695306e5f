from .registry import QUERIES, Query, oracle_map, query_map, register

# import for side effects: each module registers its queries. Topical
# placement is free — the explicit priority list below, not module import
# order, decides what the external driver sees first.
from . import olap_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import asof_queries  # noqa: E402,F401
from . import session_queries  # noqa: E402,F401
from . import vector_queries  # noqa: E402,F401
from . import ml_queries  # noqa: E402,F401
from . import multimodal_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import core_queries  # noqa: E402,F401
from . import function_queries  # noqa: E402,F401

# The external correctness driver checks the first 50 queries in dict
# order per round. All 139 round-3 queries have cumulatively green rows
# (r1∪r2∪r3), so round 4's head is: (1) the five NEW queries, (2) the five
# whose SEMANTICS or output schema changed this round and therefore need
# fresh rows (banded-substrate canonical dedup, degree-capped triangles,
# is_total-flagged HLL rollup, value-bucketed skyline, shuffle-join
# pagerank), then (3) the 40 stalest re-confirmations — queries whose
# last driver row is from round 1; the driver regenerates testdata with
# different physical types between rounds, so old greens decay. The
# remaining r1 suites + all r2-rowed queries rotate into round 5.
_DRIVER_PRIORITY = [
    # -- round-4 additions (second wave) -----------------------------------
    "segment_dedup_rewrite", "decontaminate_by_embedding",
    "mmr_diversified_topk", "heavy_hitters_mergeable",
    "interpolate_linear_gaps", "group_shuffle_split",
    "streaming_topk_state", "quantile_summary_mergeable",
    "holt_linear_state", "random_projection_reduce",
    "trimmed_mean_grouped_agg", "bfs_hops_user_graph",
    "moving_median_7", "funnel_3step_strict", "rag_index_pipeline",
    "skipgram_pairs", "distribution_drift_metrics", "grouped_bootstrap_ci",
    "passjoin_edit_pairs", "time_weighted_avg_user",
    "incremental_rollup_merge", "cumulative_unique_users",
    "pareto_revenue_share", "seasonal_decompose_dow", "rfm_segmentation",
    "cusum_changepoints", "session_path_trigrams", "ml_lag_features",
    "hll_sliding_7d_users",
    # -- round-4 additions (first wave) ------------------------------------
    "ann_recall_audit", "multimodal_real_decode",
    "doc_chunks_udtf", "doc_chunks_catalyst", "chunk_fixed_context",
    "approx_distinct_audit", "approx_percentile_audit",
    "stratified_sample_audit", "equidepth_approx_audit",
    "ml_accuracy_audit", "semantic_dedup_signbucket",
    "incremental_dedup_probe", "ppjoin_prefix_pairs", "cosine_topk_arrow",
    "char_entropy_scores", "zorder_layout_stats", "multimodal_resize_nn",
    "grouped_ols_trend", "corpus_curation_pipeline",
    # -- changed semantics/schema this round: need rows under the new defs -
    "dedup_keep_canonical", "triangle_count_user_graph",
    "hll_mergeable_rollup", "skyline_pareto_orders", "pagerank_3iter",
    # -- stalest re-confirmations (last row = round 1) ---------------------
    "cosine_topk_bruteforce", "embedding_norm_stats", "explode_token_counts",
    "bpe_token_counts", "countmin_token_freq", "array_access_first_last",
    "exact_dedup_docs", "text_quality_stats", "lang_score",
    "jaccard_near_dup_pairs", "near_dup_components", "clean_corpus_by_source",
    "minhash_lsh_near_dup", "minhash_shingle_near_dup", "tf_idf_scores",
    "fuzzy_pairs_levenshtein", "token_pmi", "doc_fingerprints",
    "scrub_mask_tokens", "jaccard_bigram_pairs", "containment_subset_pairs",
    "flagship_events_by_region", "pricing_summary", "validation_filter",
    "case_buckets", "regex_extract", "latest_event_dedup",
    "latest_event_dedup_maxby", "distinct_dim_with_key",
    "date_hierarchy_rollup", "global_kpis", "approx_distinct_events",
    "sum_by_two_keys", "top_orders", "union_priorities", "nation_set_ops",
    "window_rank_suite", "moving_average", "date_parts",
    "dim_date_generated", "json_extract_props", "tumbling_daily_counts",
    "window_distribution_suite",
    # -- next-stalest (last row = round 2) fill the remaining order --------
    "stats_agg_suite", "string_ops_suite", "array_ops_suite",
    "null_handling_suite", "weighted_avg_order_price", "value_mad_robust",
    "range_frame_running_sum", "semi_anti_join_customers",
    "sql_entry_correlated_subquery", "unpivot_order_counts",
    "gap_fill_user_daily", "value_histogram", "bloom_prefilter_semi_join",
    "stratified_sample_counts", "grouping_sets_order_stats",
    "conversion_funnel", "cohort_retention", "value_outliers_zscore",
    "inverted_index_postings", "profile_events_columns",
    "scd2_user_value_intervals", "event_type_bigrams", "equidepth_histogram",
    "snapshot_reconciliation", "deterministic_hash_sample",
    "rolling_7d_active_users", "sales_share_by_region",
    "hll_distinct_users",
    "streaming_tumbling_counts", "streaming_sliding_counts",
    "streaming_stream_stream_join", "streaming_static_enrich",
    "streaming_upsert_merge", "streaming_dedup_watermark",
    "asof_purchase_prior_click", "asof_cogroup_pandas", "asof_nearest_click",
    "sessionize_events", "session_window_agg", "streaming_sessionize_state",
    "embedding_cosine_near_dup", "cosine_topk_pandas", "ann_ivf_topk",
    "ann_lsh_bucketed", "embedding_centroids_by_label",
]


def _apply_driver_priority() -> None:
    ordered = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
    missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    if missing:  # a rename must update the list, loudly
        raise ValueError(f"_DRIVER_PRIORITY names unknown queries: {missing}")
    for name, q in QUERIES.items():
        ordered.setdefault(name, q)
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_driver_priority()

__all__ = ["QUERIES", "Query", "register", "query_map", "oracle_map"]
