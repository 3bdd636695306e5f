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
# order per round. Round-12 head, per the SURVEY.md forward schedule
# (its r12 bullet is the prose twin of this list):
# (1) the five NEW round-12 registrations promoted from the round-12
# preview bank (exact Mann-Whitney ROC AUC, per-source Gini length
# concentration, 8-gram eval-set decontamination — the n-gram sibling
# of decontaminate_by_embedding, completing the GPT-3-protocol
# contamination pair — daily-count autocorrelation at lags 1..3, and
# the chi-squared token-x-source association — parity pairs proven in
# tests/test_round12_previews.py across rounds 10-11 including the
# perturbed-testdata rehearsals, two with pure-Python replays),
# (2) 44 refresh slots by the standing history-age rule (computed at
# the end of round 11): the 26 r7-last-rowed names — 3 with r2
# history in r2 driver order (the five r11-displaced names lead
# naturally: embedding_cosine_near_dup, cosine_topk_pandas,
# embedding_centroids_by_label), then 14 with r3 history in r3 driver
# order (ml_class_balance and multimodal_meta_stats — the other two
# r11-displaced — open this group), then 3 with r4 history, then the
# 6 r7-banked curation surfaces — then the 18 stalest r8-last-rowed
# names: 16 with r3 history in r3 driver order, then 2 with r4
# history, (3) ONE pairing-rule addition closing the head:
# equidepth_approx_audit (hash-green, r9-rowed) lands in the SAME
# head as its rows-only sibling equidepth_histogram_approx (refresh
# slot 9 of the r3-history group) per the standing rule.
# 5 + 44 + 1 = 50. The one name the pairing addition displaces
# (heavy_hitters_mergeable, the least-stale of the natural 45) holds
# position 51 and rolls to round 13 per the standing displacement
# rule. The NAME LISTS here and in SURVEY.md's forward schedule are
# the schedule of record; re-derive nothing from prose.
#
# PAIRING RULE (r8 VERDICT next-step #4): whenever a ROWS-ONLY query
# takes a head slot in any rotation (r10+, r16-r20 refreshes, or any
# rework wave), its hash-green AUDIT SIBLING goes in the SAME head.
# In THIS head the only rows-only name is equidepth_histogram_approx,
# paired with equidepth_approx_audit (position 50). Standing ledger
# exception (SCALING.md pairing ledger): stratified_sample_counts
# refreshed in r10 while stratified_sample_audit holds its hash-green
# r9 row — pair them whenever the counts query next takes a slot
# (r16+).
_DRIVER_PRIORITY = [
    # -- positions 1-5: new in round 12 (promoted from the round-12
    #    preview bank) ------------------------------------------------------
    "roc_auc_exact", "gini_concentration", "ngram_decontaminate",
    "acf_daily_counts", "chi2_token_source",
    # -- positions 6-8: the 3 stalest r7-rowed names with r2 history, in
    #    r2 driver order (the r11-displaced names lead naturally) ----------
    "embedding_cosine_near_dup", "cosine_topk_pandas",
    "embedding_centroids_by_label",
    # -- positions 9-22: 14 r7-rowed names with r3 history in r3 driver
    #    order (ml_class_balance / multimodal_meta_stats — the other two
    #    r11-displaced — open the group) ------------------------------------
    "ml_class_balance", "multimodal_meta_stats",
    "multimodal_decode_features", "multimodal_frame_sample",
    "minhash_grouped_mask_near_dup", "equidepth_histogram_approx",
    "bucketed_join_orders_customer", "minhash_open_vocab_near_dup",
    "pack_sequences_by_budget", "decontaminate_ngram_overlap",
    "quality_filter_verdicts", "variant_extract_props",
    "recursive_event_chains", "unigram_logprob_scores",
    # -- positions 23-25: 3 r7-rowed names with r4 history ------------------
    "incremental_dedup_probe", "ppjoin_prefix_pairs",
    "corpus_curation_pipeline",
    # -- positions 26-31: the 6 r7-banked curation surfaces -----------------
    "hard_negative_mining", "cluster_quota_sample",
    "bpe_merge_induction", "dsir_importance_weights",
    "winnowing_match_pairs", "rrf_fusion_topk",
    # -- positions 32-47: the 16 stalest r8-rowed names with r3 history,
    #    in r3 driver order -------------------------------------------------
    "source_mixing_weights", "select_top_quality_within_budget",
    "dedup_keep_canonical", "top_bigram_share", "dup_ngram_ratio",
    "cross_source_exact_dups", "resample_ohlc_5min",
    "triangle_count_user_graph", "map_ops_suite",
    "join_shufflehash_hint", "bm25_scores", "minhash_candidate_quality",
    "sql_entry_lateral_topk", "merge_overlapping_intervals",
    "streaming_ewma_state", "fpgrowth_brand_itemsets",
    # -- positions 48-49: 2 r8-rowed names with r4 history ------------------
    "segment_dedup_rewrite", "mmr_diversified_topk",
    # -- position 50: the pairing-rule addition — equidepth_approx_audit
    #    certifies rows-only equidepth_histogram_approx (position 14) in
    #    the SAME head (see PAIRING RULE above) -----------------------------
    "equidepth_approx_audit",
    # -- position 51: the name the pairing addition displaced, rolling to
    #    round 13 per the standing displacement rule ------------------------
    "heavy_hitters_mergeable",
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
