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
# order per round. Round-13 head, per the SURVEY.md forward schedule
# (its r13 bullet is the prose twin of this list):
# (1) the five NEW round-13 registrations promoted from the round-13
# preview bank (Mann-Kendall trend test over the daily-count series,
# exact two-sample KS distance between per-source length
# distributions, deterministic 5-fold CV assignment audit, NDCG@10
# retrieval quality with integer-unit discounts, and two
# integer-exact Lloyd k-means iterations — parity pairs proven in
# tests/test_round13_previews.py across rounds 11-12 including the
# perturbed-testdata rehearsals, four with pure-Python replays),
# (2) 44 refresh slots by the standing history-age rule (computed at
# the end of round 12): all 30 r8-last-rowed names — 22 with r4
# history in r4 driver order (heavy_hitters_mergeable, the
# r12-displaced name, leads naturally), then the 8 r8-banked
# surfaces in r8 driver order — then the 14 stalest r9-last-rowed
# names, all with r1 history, in r1 driver order,
# (3) ONE pairing-rule addition closing the head:
# approx_distinct_audit (hash-green, r9-rowed) lands in the SAME
# head as its rows-only sibling approx_distinct_events (refresh
# slot 9 of the r1-history group) per the standing rule.
# 5 + 44 + 1 = 50. The one name the pairing addition displaces
# (bpe_token_counts, the least-stale of the natural 45) holds
# position 51 and rolls to round 14 per the standing displacement
# rule. The NAME LISTS here and in SURVEY.md's forward schedule are
# the schedule of record; re-derive nothing from prose.
#
# PAIRING RULE (r8 VERDICT next-step #4): whenever a ROWS-ONLY query
# takes a head slot in any rotation (r10+, r16-r20 refreshes, or any
# rework wave), its hash-green AUDIT SIBLING goes in the SAME head.
# In THIS head the only rows-only name is approx_distinct_events,
# paired with approx_distinct_audit (position 50). Standing ledger
# exception (SCALING.md pairing ledger): stratified_sample_counts
# refreshed in r10 while stratified_sample_audit holds its hash-green
# r9 row — pair them whenever the counts query next takes a slot:
# per the computed r14/r15 schedule (SURVEY r14 bullet) that is r15,
# where the counts query lands naturally and the audit (r14-rowed by
# then) joins as that head's pairing addition.
_DRIVER_PRIORITY = [
    # -- positions 1-5: new in round 13 (promoted from the round-13
    #    preview bank) ------------------------------------------------------
    "mann_kendall_trend", "ks_exact_pairs", "kfold_assign_audit",
    "ndcg_at10_exact", "kmeans_lloyd_2iter",
    # -- positions 6-27: the 22 r8-rowed names with r4 history, in r4
    #    driver order (heavy_hitters_mergeable — the r12-displaced name —
    #    leads naturally) ---------------------------------------------------
    "heavy_hitters_mergeable", "group_shuffle_split",
    "streaming_topk_state", "quantile_summary_mergeable",
    "random_projection_reduce", "trimmed_mean_grouped_agg",
    "bfs_hops_user_graph", "moving_median_7", "rag_index_pipeline",
    "skipgram_pairs", "distribution_drift_metrics",
    "grouped_bootstrap_ci", "passjoin_edit_pairs",
    "time_weighted_avg_user", "cumulative_unique_users",
    "pareto_revenue_share", "rfm_segmentation", "cusum_changepoints",
    "session_path_trigrams", "hll_sliding_7d_users",
    "multimodal_real_decode", "doc_chunks_udtf",
    # -- positions 28-35: the 8 r8-banked surfaces in r8 driver order -------
    "quantile_normalize_scores", "bpe_fertility_stats",
    "top_p_token_budget", "weighted_sample_docs", "robust_scale_mad",
    "epoch_shuffle_ranges", "pareto_revenue_share_scaled",
    "rfm_segmentation_scaled",
    # -- positions 36-49: the 14 stalest r9-rowed names, all with r1
    #    history, in r1 driver order ----------------------------------------
    "pricing_summary", "validation_filter", "case_buckets",
    "latest_event_dedup", "latest_event_dedup_maxby",
    "distinct_dim_with_key", "date_hierarchy_rollup", "global_kpis",
    "approx_distinct_events", "sum_by_two_keys", "top_orders",
    "union_priorities", "nation_set_ops", "explode_token_counts",
    # -- position 50: the pairing-rule addition — approx_distinct_audit
    #    certifies rows-only approx_distinct_events (position 44) in
    #    the SAME head (see PAIRING RULE above) -----------------------------
    "approx_distinct_audit",
    # -- position 51: the name the pairing addition displaced, rolling to
    #    round 14 per the standing displacement rule ------------------------
    "bpe_token_counts",
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
