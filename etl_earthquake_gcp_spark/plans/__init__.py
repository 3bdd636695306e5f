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
# order per round. Round-11 head, per the SURVEY.md forward schedule
# (its r11 bullet is the prose twin of this list):
# (1) the seven NEW round-11 registrations promoted from the round-11
# preview bank (RFM quartiles, the composed per-source datacard, the
# HLL inclusion-exclusion intersection audit, length-distribution EMD
# pairs, the vocabulary coverage curve, conditional bigram entropy,
# the Kaplan-Meier session survival curve — parity pairs proven in
# tests/test_round11_previews.py across rounds 9-10 including the
# perturbed-testdata rehearsals, six with pure-Python replays),
# (2) the 15 deferred r6-rowed names (round-10 positions 51-65 — this
# retires the r6 cohort: after this round no query's newest driver row
# is older than r7), (3) 28 refresh slots from the 50 r7-last-rowed
# queries by the standing history-age rule (computed at the end of
# round 10): the 7 r1-history names in r1 driver order, then 15
# r2-history names in r2 driver order, then ml_predictions (first
# r3-history name), then FIVE pairing-rule additions that certify
# every rows-only name in this head beside its hash-green audit
# sibling in one round (the r10 watermark-pair template — and exactly
# the ANN-family consolidation the r9 verdict asked for):
# pq_adc_topk, ivf_pq_topk, ann_recall_audit (certifies
# ann_lsh_bucketed / ann_ivf_topk / pq_adc_topk / ivf_pq_topk),
# approx_percentile_audit (certifies approx_value_percentiles),
# ml_accuracy_audit (certifies ml_predictions). 7 + 15 + 28 = 50.
# The five least-stale names the pairing additions displace
# (embedding_cosine_near_dup, cosine_topk_pandas,
# embedding_centroids_by_label, ml_class_balance,
# multimodal_meta_stats) hold positions 51-55 and roll to round 12
# per the standing displacement rule. The NAME LISTS here and in
# SURVEY.md's forward schedule are the schedule of record; re-derive
# nothing from prose.
#
# PAIRING RULE (r8 VERDICT next-step #4): whenever a ROWS-ONLY query
# takes a head slot in any rotation (r10+, r16-r20 refreshes, or any
# rework wave), its hash-green AUDIT SIBLING goes in the SAME head.
# In THIS head every rows-only name is paired: ann_lsh_bucketed /
# ann_ivf_topk / pq_adc_topk / ivf_pq_topk with ann_recall_audit,
# approx_value_percentiles with approx_percentile_audit,
# ml_predictions with ml_accuracy_audit, streaming_sessionize_state
# with the hash-green session pair classes (sessionize_events /
# session_window_agg, both in this head). Standing ledger exception
# (SCALING.md pairing ledger): stratified_sample_counts refreshed in
# r10 while stratified_sample_audit holds its hash-green r9 row —
# pair them whenever the counts query next takes a slot (r16+).
_DRIVER_PRIORITY = [
    # -- positions 1-7: new in round 11 (promoted from the round-11
    #    preview bank) ------------------------------------------------------
    "rfm_quartile_scores", "source_datacard_pipeline",
    "hll_intersection_audit", "length_emd_pairs",
    "vocab_coverage_curve", "bigram_entropy_stats",
    "session_survival_curve",
    # -- positions 8-22: the 15 deferred r6-rowed names (round-10
    #    positions 51-65; retires the r6 cohort) ----------------------------
    "hll_distinct_users", "streaming_tumbling_counts",
    "streaming_sliding_counts", "streaming_stream_stream_join",
    "streaming_static_enrich", "streaming_upsert_merge",
    "asof_purchase_prior_click", "asof_cogroup_pandas",
    "asof_nearest_click", "sessionize_events", "boilerplate_ngrams",
    "weighted_sample_ares", "temperature_mix_weights",
    "epoch_shuffle_order", "embedding_int8_quantize",
    # -- positions 23-29: the 7 stalest r7-rowed names with r1 history,
    #    in r1 driver order -------------------------------------------------
    "flagship_events_by_region", "regex_extract", "minhash_lsh_near_dup",
    "simhash_near_pairs", "tf_idf_scores", "token_pmi",
    "jaccard_bigram_pairs",
    # -- positions 30-44: 15 r7-rowed names with r2 history in r2 driver
    #    order ---------------------------------------------------------------
    "cube_order_counts", "pivot_status_by_priority",
    "range_join_value_buckets", "date_part_join_weekday",
    "event_value_percentiles", "salted_join_user_nation",
    "join_broadcast_hint", "join_sortmerge_hint",
    "approx_value_percentiles", "sales_share_by_region",
    "ewma_user_values", "session_window_agg",
    "streaming_sessionize_state", "ann_ivf_topk", "ann_lsh_bucketed",
    # -- position 45: first r3-history name ---------------------------------
    "ml_predictions",
    # -- positions 46-50: the five pairing-rule additions (the ANN-family
    #    + approx-percentile + ml consolidation; see PAIRING RULE above) ----
    "pq_adc_topk", "ivf_pq_topk", "ann_recall_audit",
    "approx_percentile_audit", "ml_accuracy_audit",
    # -- positions 51-55: the five names the pairing additions displaced,
    #    rolling to round 12 per the standing displacement rule -------------
    "embedding_cosine_near_dup", "cosine_topk_pandas",
    "embedding_centroids_by_label", "ml_class_balance",
    "multimodal_meta_stats",
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
