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
# order per round. Round-9 head, per the SURVEY.md forward schedule:
# (1) the five NEW round-9 registrations promoted from the round-9
# preview bank (stratified split, source-overlap MinHash, Zipf slope,
# n-gram novelty, lexical diversity — parity pairs proven in
# tests/test_round9_previews.py across rounds 7-8 including the
# perturbed-testdata rehearsals), (2) the 13 r4-rowed tail names
# (round-8 positions 51-63 — this completes the r4 cohort), (3) the
# 32 stalest of the 43 r5-last-rowed queries by the standing
# history-age rule: the 30 r1-history names in their r1 driver order,
# then pagerank_3iter (r2 history), then skyline_pareto_orders (first
# r3-history name in r3 driver order). That fills exactly 50; the 11
# deferred r5-rowed names hold positions 51-61 and complete in round
# 10 together with the round-10 preview bank. The NAME LISTS here and
# in SURVEY.md's forward schedule are the schedule of record;
# re-derive nothing from prose.
#
# PAIRING RULE (r8 VERDICT next-step #4): whenever a ROWS-ONLY query
# takes a head slot in any future rotation (r10+, r16-r20 refreshes,
# or any rework wave), its hash-green AUDIT SIBLING goes in the SAME
# head (approx_distinct_events+approx_distinct_audit — both below —
# streaming_dedup_watermark+streaming_dedup_audit, ml_predictions+
# ml_accuracy_audit, pq_adc_topk/ivf_pq_topk+ann_recall_audit), so
# the driver certifies the pair in one round.
_DRIVER_PRIORITY = [
    # -- new in round 9 (promoted from the round-9 preview bank) -----------
    "exact_stratified_split", "source_overlap_minhash", "zipf_slope_fit",
    "doc_novelty_ngram", "lexical_diversity_stats",
    # -- the r4 cohort tail (round-8 positions 51-63; completes r4) --------
    "doc_chunks_catalyst", "chunk_fixed_context", "approx_distinct_audit",
    "approx_percentile_audit", "stratified_sample_audit",
    "equidepth_approx_audit", "ml_accuracy_audit",
    "semantic_dedup_signbucket", "cosine_topk_arrow",
    "char_entropy_scores", "zorder_layout_stats", "multimodal_resize_nn",
    "grouped_ols_trend",
    # -- stalest r5-rowed re-confirmations (positions 19-50): the 30
    #    r1-history names in r1 driver order, then pagerank_3iter (r2
    #    history), then skyline_pareto_orders (r3 history) ----------------
    "pricing_summary", "validation_filter", "case_buckets",
    "latest_event_dedup", "latest_event_dedup_maxby",
    "distinct_dim_with_key", "date_hierarchy_rollup", "global_kpis",
    "approx_distinct_events", "sum_by_two_keys", "top_orders",
    "union_priorities", "nation_set_ops", "explode_token_counts",
    "bpe_token_counts", "countmin_token_freq", "array_access_first_last",
    "exact_dedup_docs", "text_quality_stats", "lang_score",
    "jaccard_near_dup_pairs", "near_dup_components",
    "clean_corpus_by_source", "minhash_shingle_near_dup",
    "fuzzy_pairs_levenshtein", "doc_fingerprints", "scrub_mask_tokens",
    "containment_subset_pairs", "cosine_topk_bruteforce",
    "embedding_norm_stats", "pagerank_3iter", "skyline_pareto_orders",
    # -- positions 51-61: the 11 deferred r5-rowed names, complete in
    #    round 10 (streaming_dedup_audit pairs with its rows-only
    #    partner streaming_dedup_watermark per the pairing rule when
    #    the partner next takes a head slot) ------------------------------
    "bigram_lm_loglik", "hll_mergeable_rollup", "source_kl_divergence",
    "holt_linear_state", "incremental_rollup_merge", "funnel_3step_strict",
    "decontaminate_by_embedding", "ml_lag_features",
    "interpolate_linear_gaps", "seasonal_decompose_dow",
    "streaming_dedup_audit",
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
