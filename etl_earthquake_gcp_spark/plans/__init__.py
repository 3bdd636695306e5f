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
from . import mixing_queries  # noqa: E402,F401

# The external correctness driver checks the first 50 queries in dict
# order per round. Round-6 head, per the SURVEY.md forward schedule
# (written at the end of round 5): (1) the three NEW round-6
# registrations promoted from the preview bank (temperature mixing,
# epoch shuffle order, int8 embedding quantization — parity pairs
# proven in round 5, including the perturbed-testdata rehearsal),
# (2) the two queries REWORKED this round — weighted_sample_ares
# (second hash round squaring -> multiply-add, the r5 ADVICE defect
# class) and boilerplate_ngrams (reach threshold 5 -> 3; the old floor
# was vacuous-empty on regenerated data) — changed queries need fresh
# rows under their current definitions, and the schedule's own rule is
# that each round-6 rework displaces an r2 refresh, (3) the 7 remaining
# queries whose last driver row is from round 1 (the r1 set is then
# fully cleared), (4) the 45-query r2-rowed re-confirmation set — the
# first 38 fit the 50-slot head; the last 7 (session_window_agg ..
# embedding_centroids_by_label) rotate into round 7 together with the
# round-7 preview-bank registrations. Everything r4/r5-rowed is fresh
# and stays behind the refresh debt.
_DRIVER_PRIORITY = [
    # -- new in round 6 (promoted from the round-5 preview bank) -----------
    "temperature_mix_weights", "epoch_shuffle_order",
    "embedding_int8_quantize",
    # -- reworked in round 6 (hash second round: squaring -> multiply-add) -
    "weighted_sample_ares",
    # -- reworked in round 6 (threshold 5 -> 3: the regenerated corpus
    #    peaks at 3-4 docs per shared 8-gram, so the old floor returned a
    #    vacuous empty result; a changed query needs a fresh row) --------
    "boilerplate_ngrams",
    # -- last remaining r1-rowed re-confirmations --------------------------
    "window_rank_suite", "moving_average", "date_parts",
    "dim_date_generated", "json_extract_props", "tumbling_daily_counts",
    "window_distribution_suite",
    # -- r2-rowed re-confirmations (positions 12-50 land round-6 rows) -----
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
    "sessionize_events",
    # -- positions 51-57: complete the r2 set in round 7 -------------------
    "session_window_agg", "streaming_sessionize_state",
    "embedding_cosine_near_dup", "cosine_topk_pandas", "ann_ivf_topk",
    "ann_lsh_bucketed", "embedding_centroids_by_label",
    # -- round-5-rowed (fresh; retain explicit order behind the debt) ------
    "pagerank_3iter", "hll_mergeable_rollup", "skyline_pareto_orders",
    "streaming_dedup_audit",
    "holt_linear_state", "incremental_rollup_merge", "funnel_3step_strict",
    "decontaminate_by_embedding", "ann_recall_audit", "ml_lag_features",
    "interpolate_linear_gaps", "seasonal_decompose_dow",
    "bigram_lm_loglik", "source_kl_divergence",
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
