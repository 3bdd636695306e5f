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
# order per round. Round-15 head, per the SURVEY.md forward schedule
# (its r15 bullet is the prose twin of this list; membership and order
# re-verified programmatically against the r1-r14 correctness ledger
# at registration):
# (1) the five NEW round-15 registrations promoted from the round-15
# preview bank (count-min join-cardinality estimation, heavy-change
# detection, the trigram LIKE prefilter, the quantity-weighted median
# price, and the dedup cluster-size histogram — parity pairs proven in
# round 6, rehearsed on three perturbed variants and stress-tested
# 120/120 end-of-r14, three with pure-Python replays),
# (2) 44 refresh slots by the standing history-age rule (computed at
# the end of round 14): all 38 r10-last-rowed names — led naturally by
# the r14-displaced value_mad_robust (r1 history), then the 21 with r2
# history in r2 driver order, 3 with r3 history, 7 with r4 history in
# r4 driver order, 1 with r5 history (streaming_dedup_audit), and the
# 5 r10-banked surfaces in r10 driver order — then the 6 stalest
# r11-last-rowed names, all with r1 history, in r1 driver order,
# (3) ONE pairing-rule addition closing the head:
# stratified_sample_audit (hash-green, r14-rowed) lands in the SAME
# head as its rows-only sibling stratified_sample_counts (refresh
# slot 8 of the r2-history group), CLOSING the standing pairing-ledger
# exception. The head's OTHER rows-only name,
# streaming_dedup_watermark, needs no addition: its audit sibling
# streaming_dedup_audit lands naturally in this head on its own
# staleness.
# 5 + 44 + 1 = 50. The one name the pairing addition displaces
# (jaccard_bigram_pairs, the least-stale of the natural 45) holds
# position 51 and rolls to round 16 per the standing displacement
# rule. The NAME LISTS here and in SURVEY.md's forward schedule are
# the schedule of record; re-derive nothing from prose.
#
# PAIRING RULE (r8 VERDICT next-step #4): whenever a ROWS-ONLY query
# takes a head slot in any rotation (r16-r20 refreshes, or any rework
# wave), its hash-green AUDIT SIBLING goes in the SAME head. THIS head
# satisfies it twice (see above) and leaves NO open ledger exception.
_DRIVER_PRIORITY = [
    # -- positions 1-5: new in round 15 (promoted from the round-15
    #    preview bank) ------------------------------------------------------
    "countmin_join_size", "heavy_change_detect",
    "trigram_like_prefilter", "weighted_median_price",
    "dedup_cluster_size_histogram",
    # -- position 6: the r14-displaced name, leading the r10-rowed
    #    refreshes naturally (r1 history) ------------------------------------
    "value_mad_robust",
    # -- positions 7-27: the 21 r10-rowed names with r2 history, in r2
    #    driver order -------------------------------------------------------
    "range_frame_running_sum", "semi_anti_join_customers",
    "sql_entry_correlated_subquery", "unpivot_order_counts",
    "gap_fill_user_daily", "value_histogram",
    "bloom_prefilter_semi_join", "stratified_sample_counts",
    "grouping_sets_order_stats", "conversion_funnel",
    "cohort_retention", "value_outliers_zscore",
    "inverted_index_postings", "profile_events_columns",
    "scd2_user_value_intervals", "event_type_bigrams",
    "equidepth_histogram", "snapshot_reconciliation",
    "deterministic_hash_sample", "rolling_7d_active_users",
    "streaming_dedup_watermark",
    # -- positions 28-30: the 3 r10-rowed names with r3 history -------------
    "bigram_lm_loglik", "hll_mergeable_rollup", "source_kl_divergence",
    # -- positions 31-37: the 7 r10-rowed names with r4 history, in r4
    #    driver order -------------------------------------------------------
    "decontaminate_by_embedding", "interpolate_linear_gaps",
    "holt_linear_state", "funnel_3step_strict",
    "incremental_rollup_merge", "seasonal_decompose_dow",
    "ml_lag_features",
    # -- position 38: the 1 r10-rowed name with r5 history (the audit
    #    sibling certifying streaming_dedup_watermark in this head) ---------
    "streaming_dedup_audit",
    # -- positions 39-43: the 5 r10-banked surfaces in r10 driver order -----
    "shared_span_islands", "label_centroid_shift",
    "label_propagation_3iter", "bellman_ford_3relax",
    "greedy_assign_topmatch",
    # -- positions 44-49: the 6 stalest r11-rowed names, all with r1
    #    history, in r1 driver order ----------------------------------------
    "flagship_events_by_region", "regex_extract",
    "minhash_lsh_near_dup", "simhash_near_pairs", "tf_idf_scores",
    "token_pmi",
    # -- position 50: the pairing-rule addition certifying rows-only
    #    stratified_sample_counts (position 14) in the SAME head —
    #    closes the standing pairing-ledger exception ------------------------
    "stratified_sample_audit",
    # -- position 51: the name the pairing addition displaced, rolling
    #    to round 16 per the standing displacement rule ----------------------
    "jaccard_bigram_pairs",
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
