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

# The external correctness driver checks the first 50 queries in dict
# order per round. Round-7 head, per the SURVEY.md forward schedule
# (written at the end of round 5, refined in round 6): (1) the six NEW
# round-7 registrations promoted from the preview bank (hard-negative
# mining, cluster-quota sampling, BPE merge induction, DSIR selection,
# winnowing match, RRF fusion — parity pairs proven in rounds 5-6
# including the perturbed-testdata rehearsals), (2) the TWELVE queries
# REWORKED this round, TEN of which needed new head slots (the other
# two — unigram_logprob_scores, minhash_grouped_mask_near_dup —
# already held one in their refresh sections): jaccard_bigram_pairs
# (its helper jaccard_pairs_inverted dropped the corpus-cardinality
# sizes broadcast, the r6 VERDICT `weak`) plus the broadcast-audit
# reworks that dropped forced broadcasts of corpus/SF-scaling frames
# (a changed plan needs a fresh row; the standing rule is that each
# rework displaces a refresh slot), (3) the 7 queries whose last driver row
# is from round 2 — the oldest external signal in the repo, four
# testdata regenerations old (this completes the r2 cohort), plus
# ann_recall_audit re-rowed alongside them so the two rows-only ANN
# refreshes (ann_ivf_topk, ann_lsh_bucketed) land WITH their hash-green
# audit sibling in the same round, (4) 26 of the 42 r3-last-rowed
# queries. Section (4) is ordered by overall row HISTORY age (names
# first rowed in r1 before r2-history before r3-only names, each
# sub-group in its first round's driver order) — NOT by round-3 driver
# order — and the deferred names were hand-picked, not derived from
# a position rule. The NAME LISTS here and in SURVEY.md's forward
# schedule are the schedule of record; re-derive nothing from prose.
# That fills exactly 50; the 16 deferred r3-rowed queries (positions
# 51-66 below: 9 displaced by the rework wave + the original 7-query
# tail) complete in round 8 together with the round-8 preview bank,
# then the 42-query r4 cohort follows.
_DRIVER_PRIORITY = [
    # -- new in round 7 (promoted from the rounds-5/6 preview bank) --------
    "hard_negative_mining", "cluster_quota_sample", "bpe_merge_induction",
    "dsir_importance_weights", "winnowing_match_pairs", "rrf_fusion_topk",
    # -- reworked in round 7 (plan changes need fresh rows; each displaced
    #    a refresh slot; two further reworks sit in their refresh sections
    #    below): jaccard's inverted-index helper dropped its sizes
    #    broadcast, and the broadcast audit dropped FORCED broadcasts of
    #    corpus/SF-scaling frames (customer dims, token vocabularies,
    #    per-doc bitmask maps) in favor of stats/AQE-picked strategies —
    #    results identical, physical plans at driver scale verified
    #    unchanged; pins in test_physical_strategies.py ----------------------
    "jaccard_bigram_pairs", "flagship_events_by_region", "regex_extract",
    "sales_share_by_region", "tf_idf_scores", "token_pmi",
    "minhash_lsh_near_dup", "corpus_curation_pipeline", "ppjoin_prefix_pairs",
    "incremental_dedup_probe",
    # -- last r2-rowed re-confirmations (completes the r2 cohort) ----------
    "session_window_agg", "streaming_sessionize_state",
    "embedding_cosine_near_dup", "cosine_topk_pandas", "ann_ivf_topk",
    "ann_lsh_bucketed", "embedding_centroids_by_label",
    # -- audit sibling for the two rows-only ANN refreshes above -----------
    "ann_recall_audit",
    # -- stalest r3-rowed re-confirmations (positions 25-50) ---------------
    "simhash_near_pairs", "cube_order_counts", "pivot_status_by_priority",
    "range_join_value_buckets", "date_part_join_weekday",
    "event_value_percentiles", "salted_join_user_nation",
    "join_broadcast_hint", "join_sortmerge_hint", "approx_value_percentiles",
    "ewma_user_values", "ml_predictions", "ml_class_balance",
    "multimodal_meta_stats", "multimodal_decode_features",
    "multimodal_frame_sample", "minhash_grouped_mask_near_dup",
    "equidepth_histogram_approx", "bucketed_join_orders_customer",
    "minhash_open_vocab_near_dup", "pack_sequences_by_budget",
    "decontaminate_ngram_overlap", "quality_filter_verdicts",
    "variant_extract_props", "recursive_event_chains",
    "unigram_logprob_scores",
    # -- positions 51-59: refreshes displaced by the round-7 rework wave ---
    "source_mixing_weights", "select_top_quality_within_budget",
    "top_bigram_share", "dup_ngram_ratio", "cross_source_exact_dups",
    "resample_ohlc_5min", "map_ops_suite", "join_shufflehash_hint",
    "bm25_scores",
    # -- positions 60-66: the r3 cohort tail, completes in round 8 ---------
    "pq_adc_topk", "minhash_candidate_quality", "sql_entry_lateral_topk",
    "merge_overlapping_intervals", "streaming_ewma_state",
    "fpgrowth_brand_itemsets", "ivf_pq_topk",
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
