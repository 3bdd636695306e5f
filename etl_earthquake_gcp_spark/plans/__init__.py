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
# order per round. Round-14 head, per the SURVEY.md forward schedule
# (its r14 bullet is the prose twin of this list):
# (1) the five NEW round-14 registrations promoted from the round-14
# preview bank (order-sensitive event-pair lift, three k-core peeling
# rounds, the Benford first-digit audit, exact market-basket pair
# rules, and the per-user inter-arrival CV — parity pairs proven in
# tests/test_round14_previews.py across rounds 12-13 including the
# perturbed-testdata rehearsals, three with pure-Python replays),
# (2) the proven OPTIONAL rework pair rfm_quartile_scores_scaled
# (r11 verdict next-step #7) taking its displacement slot at
# position 6 — closing the last global-orderBy baseline without a
# registered scale twin,
# (3) 44 refresh slots by the standing history-age rule (computed at
# the end of round 13): all 32 r9-last-rowed names — 16 with r1
# history in r1 driver order (bpe_token_counts, the r13-displaced
# name, leads naturally), then 1 with r2 history (pagerank_3iter),
# 1 with r3 history (skyline_pareto_orders), 9 with r4 history in r4
# driver order, and the 5 r9-banked surfaces in r9 driver order —
# then the 12 stalest r10-last-rowed names, all with r1 history, in
# r1 driver order.
# 6 + 44 = 50. NO rows-only name sits in this head, so no
# pairing-rule addition (stratified_sample_audit refreshes here on
# its own staleness; see the PAIRING RULE below for its sibling's
# r15 slot). The one name the rfm displacement pushes out
# (value_mad_robust, the least-stale of the natural 45) holds
# position 51 and rolls to round 15 per the standing displacement
# rule. The NAME LISTS here and in SURVEY.md's forward schedule are
# the schedule of record; re-derive nothing from prose.
#
# PAIRING RULE (r8 VERDICT next-step #4): whenever a ROWS-ONLY query
# takes a head slot in any rotation (r10+, r16-r20 refreshes, or any
# rework wave), its hash-green AUDIT SIBLING goes in the SAME head.
# THIS head holds no rows-only name. Standing ledger exception
# (SCALING.md pairing ledger): stratified_sample_counts refreshed in
# r10 while stratified_sample_audit holds an older hash-green row —
# pair them whenever the counts query next takes a slot: per the
# computed r15 schedule (SURVEY r15 bullet) the counts query lands
# naturally in r15 and the audit (r14-rowed after THIS head) joins
# as that head's pairing addition, closing the exception.
_DRIVER_PRIORITY = [
    # -- positions 1-5: new in round 14 (promoted from the round-14
    #    preview bank) ------------------------------------------------------
    "sequence_pair_lift", "kcore_3peel", "benford_first_digit",
    "basket_pair_rules", "interarrival_cv",
    # -- position 6: the r11-verdict rework pair in its displacement
    #    slot (proven in tests/test_round13_previews.py) --------------------
    "rfm_quartile_scores_scaled",
    # -- positions 7-22: the 16 r9-rowed names with r1 history, in r1
    #    driver order (bpe_token_counts — the r13-displaced name —
    #    leads naturally) ---------------------------------------------------
    "bpe_token_counts", "countmin_token_freq",
    "array_access_first_last", "exact_dedup_docs",
    "text_quality_stats", "lang_score", "jaccard_near_dup_pairs",
    "near_dup_components", "clean_corpus_by_source",
    "minhash_shingle_near_dup", "fuzzy_pairs_levenshtein",
    "doc_fingerprints", "scrub_mask_tokens",
    "containment_subset_pairs", "cosine_topk_bruteforce",
    "embedding_norm_stats",
    # -- position 23: r2 history --------------------------------------------
    "pagerank_3iter",
    # -- position 24: r3 history --------------------------------------------
    "skyline_pareto_orders",
    # -- positions 25-33: the 9 r9-rowed names with r4 history, in r4
    #    driver order -------------------------------------------------------
    "doc_chunks_catalyst", "chunk_fixed_context",
    "stratified_sample_audit", "semantic_dedup_signbucket",
    "cosine_topk_arrow", "char_entropy_scores", "zorder_layout_stats",
    "multimodal_resize_nn", "grouped_ols_trend",
    # -- positions 34-38: the 5 r9-banked surfaces in r9 driver order -------
    "exact_stratified_split", "source_overlap_minhash",
    "zipf_slope_fit", "doc_novelty_ngram", "lexical_diversity_stats",
    # -- positions 39-50: the 12 stalest r10-rowed names, all with r1
    #    history, in r1 driver order ----------------------------------------
    "window_rank_suite", "moving_average", "date_parts",
    "dim_date_generated", "json_extract_props",
    "tumbling_daily_counts", "window_distribution_suite",
    "stats_agg_suite", "string_ops_suite", "array_ops_suite",
    "null_handling_suite", "weighted_avg_order_price",
    # -- position 51: the name the rfm displacement pushed out, rolling
    #    to round 15 per the standing displacement rule ---------------------
    "value_mad_robust",
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
