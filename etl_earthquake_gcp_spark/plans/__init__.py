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
# order per round. Round-17 head, computed mechanically by
# tools/ledger_check.py from the post-r16 correctness ledger
# (latest-row histogram r12:44, r13:50, r14:49, r15:50, r16:50 = 243;
# --emit-python output registered verbatim, --verify-current exit 0 at
# registration): the four r16-era NEW registrations (zero driver
# history) lead in registry order per the bank-promotion precedent,
# then trigram_like_prefilter's pending post-rework row (r7
# displacement rule; REWORKS entry clears once this lands), then the
# 45 stalest natural names — multimodal_frame_sample leads the natural
# refresh set exactly as the r16 list's position-51 comment scheduled.
#
# PAIRING RULE (r8 VERDICT next-step #4): whenever a ROWS-ONLY query
# takes a head slot in any rotation, its hash-green AUDIT SIBLING goes
# in the SAME head. One rows-only name rides this head
# (equidepth_histogram_approx); its sibling equidepth_approx_audit
# lands NATURALLY on its own staleness — zero additions, nothing
# displaced.
_DRIVER_PRIORITY = [
    "join_skew_diagnosis",  # NEW this round
    "attribution_time_decay",  # NEW this round
    "fs_linkage_scores",  # NEW this round
    "multimodal_png_decode",  # NEW this round
    "trigram_like_prefilter",  # rework (latest r15)
    "multimodal_frame_sample",  # latest r12, history r3
    "minhash_grouped_mask_near_dup",  # latest r12, history r3
    "equidepth_histogram_approx",  # latest r12, history r3
    "bucketed_join_orders_customer",  # latest r12, history r3
    "minhash_open_vocab_near_dup",  # latest r12, history r3
    "pack_sequences_by_budget",  # latest r12, history r3
    "decontaminate_ngram_overlap",  # latest r12, history r3
    "quality_filter_verdicts",  # latest r12, history r3
    "variant_extract_props",  # latest r12, history r3
    "recursive_event_chains",  # latest r12, history r3
    "unigram_logprob_scores",  # latest r12, history r3
    "source_mixing_weights",  # latest r12, history r3
    "select_top_quality_within_budget",  # latest r12, history r3
    "dedup_keep_canonical",  # latest r12, history r3
    "top_bigram_share",  # latest r12, history r3
    "dup_ngram_ratio",  # latest r12, history r3
    "cross_source_exact_dups",  # latest r12, history r3
    "resample_ohlc_5min",  # latest r12, history r3
    "triangle_count_user_graph",  # latest r12, history r3
    "map_ops_suite",  # latest r12, history r3
    "join_shufflehash_hint",  # latest r12, history r3
    "bm25_scores",  # latest r12, history r3
    "minhash_candidate_quality",  # latest r12, history r3
    "sql_entry_lateral_topk",  # latest r12, history r3
    "merge_overlapping_intervals",  # latest r12, history r3
    "streaming_ewma_state",  # latest r12, history r3
    "fpgrowth_brand_itemsets",  # latest r12, history r3
    "segment_dedup_rewrite",  # latest r12, history r4
    "mmr_diversified_topk",  # latest r12, history r4
    "equidepth_approx_audit",  # latest r12, history r4
    "incremental_dedup_probe",  # latest r12, history r4
    "ppjoin_prefix_pairs",  # latest r12, history r4
    "corpus_curation_pipeline",  # latest r12, history r4
    "hard_negative_mining",  # latest r12, history r7
    "cluster_quota_sample",  # latest r12, history r7
    "bpe_merge_induction",  # latest r12, history r7
    "dsir_importance_weights",  # latest r12, history r7
    "winnowing_match_pairs",  # latest r12, history r7
    "rrf_fusion_topk",  # latest r12, history r7
    "roc_auc_exact",  # latest r12, history r12
    "gini_concentration",  # latest r12, history r12
    "ngram_decontaminate",  # latest r12, history r12
    "acf_daily_counts",  # latest r12, history r12
    "chi2_token_source",  # latest r12, history r12
    "pricing_summary",  # latest r13, history r1
    # -- positions 51+: the standing registry order (driver reads 50) --
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
