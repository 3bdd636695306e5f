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
# order per round. Round-16 head, per the SURVEY.md forward schedule
# (its r16 bullet is the prose twin of this list; membership, order,
# and the pairing check re-verified programmatically against the
# post-r15 correctness ledger — latest-row histogram r11:44, r12:50,
# r13:50, r14:49, r15:50 = 243): FULLY NATURAL — no reworks pending,
# no pairing additions needed, no displacement. All 44 r11-last-rowed
# names by the standing history-age rule, then the 6 stalest
# r12-rowed names. 44 + 6 = 50.
#
# PAIRING RULE (r8 VERDICT next-step #4): whenever a ROWS-ONLY query
# takes a head slot in any rotation, its hash-green AUDIT SIBLING
# goes in the SAME head. All six rows-only names in this head
# (approx_value_percentiles, ann_ivf_topk, ann_lsh_bucketed,
# pq_adc_topk, ivf_pq_topk, ml_predictions) have their audit siblings
# (approx_percentile_audit, ann_recall_audit, ml_accuracy_audit)
# landing NATURALLY in the same head on their own staleness — zero
# additions, nothing displaced. ANN recall floors re-probed at sf0.01
# before this registration (SCALING.md round-16 notes): slacks 4.0 /
# 4.2 / 5.0 flips, exact control 1.0 — floors unchanged.
_DRIVER_PRIORITY = [
    # -- position 1: the r15-displaced name, leading naturally
    #    (r1 history) --------------------------------------------------------
    "jaccard_bigram_pairs",
    # -- positions 2-26: the 25 r11-rowed names with r2 history, in r2
    #    driver order --------------------------------------------------------
    "cube_order_counts", "pivot_status_by_priority",
    "range_join_value_buckets", "date_part_join_weekday",
    "event_value_percentiles", "salted_join_user_nation",
    "join_broadcast_hint", "join_sortmerge_hint",
    "approx_value_percentiles", "sales_share_by_region",
    "ewma_user_values", "hll_distinct_users",
    "streaming_tumbling_counts", "streaming_sliding_counts",
    "streaming_stream_stream_join", "streaming_static_enrich",
    "streaming_upsert_merge", "asof_purchase_prior_click",
    "asof_cogroup_pandas", "asof_nearest_click",
    "sessionize_events", "session_window_agg",
    "streaming_sessionize_state", "ann_ivf_topk", "ann_lsh_bucketed",
    # -- positions 27-31: the 5 r11-rowed names with r3 history, in r3
    #    driver order --------------------------------------------------------
    "ml_predictions", "pq_adc_topk", "boilerplate_ngrams",
    "weighted_sample_ares", "ivf_pq_topk",
    # -- positions 32-34: the 3 r11-rowed names with r4 history (the
    #    audit siblings certifying this head's six rows-only names) ----------
    "ann_recall_audit", "approx_percentile_audit", "ml_accuracy_audit",
    # -- positions 35-37: the 3 r11-rowed names with r6 history --------------
    "temperature_mix_weights", "epoch_shuffle_order",
    "embedding_int8_quantize",
    # -- positions 38-44: the 7 r11-banked surfaces in r11 driver order ------
    "rfm_quartile_scores", "source_datacard_pipeline",
    "hll_intersection_audit", "length_emd_pairs",
    "vocab_coverage_curve", "bigram_entropy_stats",
    "session_survival_curve",
    # -- positions 45-50: the 6 stalest r12-rowed names: 3 with r2
    #    history in r2 driver order, then 3 with r3 history ------------------
    "embedding_cosine_near_dup", "cosine_topk_pandas",
    "embedding_centroids_by_label", "ml_class_balance",
    "multimodal_meta_stats", "multimodal_decode_features",
    # -- position 51: leads round 17's natural refresh set -------------------
    "multimodal_frame_sample",
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
