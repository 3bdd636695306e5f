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
# order per round. Round-5 head, per the r4 verdict: (1) the three
# queries whose r4 rework/schema change postdated their last driver row
# (the verdict's #1 ask — pagerank's shuffle-hash plan, the HLL rollup's
# is_total column, skyline's quantile buckets), (2) the queries NEW or
# CHANGED in round 5 (streaming_dedup_audit closes the last rows-only
# family member; holt_linear_state now folds the daily series, emits
# n_days, and requires >= 2 days; incremental_rollup_merge /
# funnel_3step_strict / decontaminate_by_embedding carry the r4 ADVICE
# determinism fixes; ann_recall_audit's floors recalibrated to a uniform
# 2-flip slack under the minimum recall across check scales;
# ml_lag_features / interpolate_linear_gaps / seasonal_decompose_dow /
# bigram_lm_loglik / source_kl_divergence hardened against the
# quantized-then-coarser-re-round boundary divergence found by the r5
# value-permutation rehearsal — integer-unit sums and display
# arithmetic, proved bit-identical off the boundary on current data,
# but fresh rows close the loop), then (3) the stalest
# re-confirmations — the 36 oldest queries whose last driver row is
# from round 1 (testdata regenerates between rounds, so old greens
# decay). The 5 determinism-hardened queries took head slots over
# stale refreshes: that is the verdict's own priority order (#1
# changed queries before #2 stale debt — a stale-but-valid row beats a
# fresh row that can silently go wrong at the next regeneration). The
# remaining r1 set (window_rank_suite, moving_average, date_parts,
# dim_date_generated, json_extract_props, tumbling_daily_counts,
# window_distribution_suite — positions 51-57) + the r2-rowed set
# rotate into round 6.
_DRIVER_PRIORITY = [
    # -- r4-changed queries whose driver rows predate the change -----------
    "pagerank_3iter", "hll_mergeable_rollup", "skyline_pareto_orders",
    # -- new in round 5 ----------------------------------------------------
    "streaming_dedup_audit",
    # -- changed in round 5 (rework / determinism fixes) -------------------
    "holt_linear_state", "incremental_rollup_merge", "funnel_3step_strict",
    "decontaminate_by_embedding", "ann_recall_audit", "ml_lag_features",
    "interpolate_linear_gaps", "seasonal_decompose_dow",
    "bigram_lm_loglik", "source_kl_divergence",
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
