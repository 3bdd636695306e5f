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
from . import curation_queries  # noqa: E402,F401
from . import calibration_queries  # noqa: E402,F401

# The external correctness driver checks the first 50 queries in dict
# order per round. Round-8 head, per the SURVEY.md forward schedule:
# (1) the six NEW round-8 registrations promoted from the rounds-6/7
# preview bank (quantile normalization, BPE fertility, top-p budget,
# weighted sampling, robust MAD, epoch shuffle ranges — parity pairs
# proven in tests/test_round8_previews.py including the perturbed-
# testdata rehearsals), (2) the two NEW scale-safe siblings that
# retire the r7 VERDICT's two `weak`s (pareto_revenue_share_scaled
# shares the primary's oracle — bit-identity certified by the driver
# hash; rfm_segmentation_scaled carries its own rank()-quintile
# oracle; plan pins in tests/test_scaled_siblings.py assert neither
# sorts the customer frame in one task), (3) the 16 r3-last-rowed
# queries deferred from the round-7 head (positions 51-66 there —
# this completes the r3 cohort), (4) 26 of the 39 r4-last-rowed
# queries, ordered by overall row HISTORY age (the two names with
# r3-history first, then the r4-only names in their round-4 driver
# order). The NAME LISTS here and in SURVEY.md's forward schedule are
# the schedule of record; re-derive nothing from prose. That fills
# exactly 50; the 13 deferred r4-rowed queries (positions 51-63
# below) complete in round 9 together with the round-9 preview bank.
_DRIVER_PRIORITY = [
    # -- new in round 8 (promoted from the rounds-6/7 preview bank) --------
    "quantile_normalize_scores", "bpe_fertility_stats",
    "top_p_token_budget", "weighted_sample_docs", "robust_scale_mad",
    "epoch_shuffle_ranges",
    # -- new in round 8: scale-safe siblings retiring the r7 `weak`s -------
    "pareto_revenue_share_scaled", "rfm_segmentation_scaled",
    # -- last r3-rowed re-confirmations (completes the r3 cohort; the
    #    16 names deferred from the round-7 head in its 51-66 order) -------
    "source_mixing_weights", "select_top_quality_within_budget",
    "top_bigram_share", "dup_ngram_ratio", "cross_source_exact_dups",
    "resample_ohlc_5min", "map_ops_suite", "join_shufflehash_hint",
    "bm25_scores", "pq_adc_topk", "minhash_candidate_quality",
    "sql_entry_lateral_topk", "merge_overlapping_intervals",
    "streaming_ewma_state", "fpgrowth_brand_itemsets", "ivf_pq_topk",
    # -- stalest r4-rowed re-confirmations (positions 25-50): r3-history
    #    names first, then round-4 driver order -----------------------------
    "dedup_keep_canonical", "triangle_count_user_graph",
    "segment_dedup_rewrite", "mmr_diversified_topk",
    "heavy_hitters_mergeable", "group_shuffle_split",
    "streaming_topk_state", "quantile_summary_mergeable",
    "random_projection_reduce", "trimmed_mean_grouped_agg",
    "bfs_hops_user_graph", "moving_median_7", "rag_index_pipeline",
    "skipgram_pairs", "distribution_drift_metrics", "grouped_bootstrap_ci",
    "passjoin_edit_pairs", "time_weighted_avg_user",
    "cumulative_unique_users", "pareto_revenue_share", "rfm_segmentation",
    "cusum_changepoints", "session_path_trigrams", "hll_sliding_7d_users",
    "multimodal_real_decode", "doc_chunks_udtf",
    # -- positions 51-63: the r4 cohort tail, completes in round 9 ---------
    "doc_chunks_catalyst", "chunk_fixed_context", "approx_distinct_audit",
    "approx_percentile_audit", "stratified_sample_audit",
    "equidepth_approx_audit", "ml_accuracy_audit",
    "semantic_dedup_signbucket", "cosine_topk_arrow",
    "char_entropy_scores", "zorder_layout_stats", "multimodal_resize_nn",
    "grouped_ols_trend",
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
