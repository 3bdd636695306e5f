"""Physical-plan pins for banked preview surfaces (rounds 8-15) and
recently reworked registered heads: the scale-critical shape claims
their SURVEY/SCALING entries make must hold in the executed plan, not
just in prose — the same contract tests/test_physical_strategies.py
enforces for long-registered queries.
"""

from __future__ import annotations

from .conftest import SF_DIR


def _plan_of(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_epoch_shuffle_order_is_take_ordered(spark):
    """The registered round-6 rework: head-k selection must be
    TakeOrderedAndProject, never a single-partition corpus window."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["epoch_shuffle_order"].spark_fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_ndcg_query_side_broadcasts(spark):
    """The 5-query anchor frame must broadcast against the corpus scan —
    a shuffle of the corpus onto 5 keys would be the skew anti-pattern."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["ndcg_at10_exact"].spark_fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan, plan


def test_kmeans_centroids_broadcast_not_sortmerge(spark):
    """Every Lloyd distance join must broadcast the k x dims centroid
    side; the exploded coordinate table must never sort-merge."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["kmeans_lloyd_2iter"].spark_fn(spark, SF_DIR))
    assert "SortMergeJoin" not in plan, plan


def test_ngram_decontaminate_eval_side_broadcasts(spark):
    """The eval gram set joins broadcast (the production contract:
    eval suites are dimension-sized)."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["ngram_decontaminate"].spark_fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_roc_auc_window_runs_on_histogram_not_facts(spark):
    """The cumulative window must consume the distinct-score histogram
    (post-aggregation), i.e. the plan aggregates BEFORE the window."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["roc_auc_exact"].spark_fn(spark, SF_DIR))
    # window over the aggregated frame: the Window node appears above
    # a HashAggregate in the tree (string order: Window printed before
    # its child aggregate)
    assert "Window" in plan and "HashAggregate" in plan
    assert plan.index("Window") < plan.index(
        "HashAggregate", plan.index("Window")
    ), plan


def test_countmin_sketch_join_is_not_broadcast_of_facts(spark):
    """The sketch-side join runs on |D x W| frames; neither raw fact
    table may appear under a broadcast exchange (only the tiny lags
    frame and the 1-row exact count broadcast)."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["countmin_join_size"].spark_fn(spark, SF_DIR))
    # the d/w-keyed sketch join aggregates both sides before joining
    assert plan.count("HashAggregate") >= 4, plan


def test_basket_prefilter_join_broadcasts_part_marginals(spark):
    """The a-priori prefilter joins the part marginals broadcast
    against the basket scan. The registered form carries NO hint on
    the SF-scaling part frames (the r7 audit rule) — at test SF the
    stats-based planner must still CHOOSE broadcast, and nothing may
    degrade to a cartesian product."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["basket_pair_rules"].spark_fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_hard_negative_anchor_scan_is_single_broadcast_nlj(spark):
    """The contrastive anchor set broadcasts against one corpus scan —
    no sort-merge, no cartesian."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["hard_negative_mining"].spark_fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_stratified_split_bounds_join_broadcasts(spark):
    """The |strata x splits| quota-interval table broadcasts against
    the ranked corpus (the builder's explicit F.broadcast(bounds))."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["exact_stratified_split"].spark_fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_source_overlap_no_cartesian_or_sortmerge(spark):
    """The |sources|^2 pair frame is dimension-sized: every join is a
    broadcast, never a cartesian product or a fact-sized sort-merge."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["source_overlap_minhash"].spark_fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_epoch_ranges_no_corpus_range_exchange(spark):
    """The banked full-order certificate (epoch_shuffle_ranges): the
    whole point is certifying the total order WITHOUT materializing it,
    so the plan must contain no range-partitioning exchange (a global
    sort of the corpus) — just the bucket hash-agg; the only
    single-partition stage is the |buckets|-row window."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["epoch_shuffle_ranges"].spark_fn(spark, SF_DIR))
    assert "Exchange rangepartitioning" not in plan, plan
    assert "TakeOrderedAndProject" not in plan, plan


def test_quantile_normalize_hist_cached_no_corpus_sort(spark):
    """The grouped histogram must be persisted and reused (ranks, sizes,
    global total, global histogram all read the cache — the docstring's
    'scanned exactly twice' contract), and the corpus must never reach a
    sort-merge join or cartesian product: every selection is a broadcast
    range join against the bounded histogram."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["quantile_normalize_scores"].spark_fn(spark, SF_DIR))
    assert "InMemoryTableScan" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_robust_scale_mad_selection_broadcasts_histogram(spark):
    """Median/MAD are rank selections via broadcast joins against the
    per-group histogram — the corpus side must never sort-merge."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["robust_scale_mad"].spark_fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_top_p_token_budget_single_scan_no_join(spark):
    """Per-source top-p truncation is one corpus scan + per-source
    windows — no join of any kind, no second scan (the group totals
    ride the same windows)."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["top_p_token_budget"].spark_fn(spark, SF_DIR))
    assert plan.count("Scan parquet") == 1, plan
    for node in ("Join", "CartesianProduct"):
        assert node not in plan, plan


def test_weighted_sample_docs_is_take_ordered(spark):
    """Efraimidis-Spirakis top-N selection must be
    TakeOrderedAndProject (map-side partial top-N), never a global
    sort."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["weighted_sample_docs"].spark_fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_heavy_change_topk_is_take_ordered(spark):
    """The scored top-k head must be TakeOrderedAndProject over the
    per-user aggregate, never a global sort of the score frame."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["heavy_change_detect"].spark_fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_doc_novelty_ngram_equijoins_only(spark):
    """The distinct-gram doc-frequency join-back must stay an
    equi-join: no cartesian product, no nested-loop join of
    gram-scale frames."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["doc_novelty_ngram"].spark_fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_trigram_prefilter_no_cartesian_no_sortmerge(spark):
    """Posting lookups are hash equi-joins on the bounded pattern-
    trigram set; the only nested-loop nodes are the 1-row summary
    combines. No cartesian product, no sort-merge of the postings."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["trigram_like_prefilter"].spark_fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_vocab_coverage_head_is_take_ordered(spark):
    """The top-maxK vocabulary head must be TakeOrderedAndProject (the
    post-limit row_number pattern), never a row_number single-partition
    sort of the full corpus-growing vocabulary."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["vocab_coverage_curve"].spark_fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_zipf_rank_window_partitions_by_source(spark):
    """The registered zipf_slope_fit's only window is the per-source
    rank over the vocabulary-sized frequency frame — every
    windowspecdefinition must open with the source column; an empty
    partitionBy here would be a global vocabulary sort in one task."""
    import re

    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["zipf_slope_fit"].spark_fn(spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs, "expected the per-source rank window in the plan"
    assert all(c == "source" for c in specs), specs


def test_datacard_freq_cached_no_cartesian(spark):
    """The banked source_datacard_pipeline: the token-frequency frame
    must be persisted (it feeds the lexical aggregate AND the zipf
    ranks — one tokenize pass) and the composed plan must never degrade
    to a cartesian product."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["source_datacard_pipeline"].spark_fn(spark, SF_DIR))
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_span_islands_gram_frame_cached_equijoins_only(spark):
    """The banked shared_span_islands: the position-gram frame must be
    persisted (the reach groupBy AND the join-back read the cache — one
    tokenize pass, not two) and the doc-frequency join-back must stay an
    equi-join on gram; the island window partitions by doc_id (a global
    window here would sort every shared position in one task)."""
    import re

    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["shared_span_islands"].spark_fn(spark, SF_DIR))
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(c == "doc_id" for c in specs), specs


def test_centroid_shift_joins_aggregated_frames_only(spark):
    """The banked label_centroid_shift: the pair join runs on the
    |labels| x dims centroid frames (post-aggregation) — BOTH join
    children must aggregate below the join (a half-degraded plan that
    joins the raw exploded fact frame against one aggregated side must
    fail), and nothing may degrade to a cartesian product."""
    import re

    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["label_centroid_shift"].spark_fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    # root-first printing: the join line, then each child subtree in
    # sequence ending at its scan — so every scan under the join must
    # have a HashAggregate between the previous child's scan and itself
    tail = plan[plan.index("Join") :]
    scans = [m.start() for m in re.finditer(r"FileScan|Scan parquet", tail)]
    aggs = [m.start() for m in re.finditer(r"HashAggregate", tail)]
    assert scans, plan
    prev = 0
    for s in scans:
        assert any(prev < a < s for a in aggs), plan
        prev = s


def test_label_propagation_edges_cached_argmax_partitioned(spark):
    """The banked label_propagation_3iter: the symmetrized edge frame
    must be persisted (traversed once per iteration — the pagerank
    pattern), every per-iteration argmax window must partition by the
    node column (src), and no iteration may degrade to a cartesian
    product."""
    import re

    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["label_propagation_3iter"].spark_fn(spark, SF_DIR))
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(c == "src" for c in specs), specs


def test_bellman_ford_lineage_truncated(spark):
    """The banked bellman_ford_3relax: the returned frame must read the
    final localCheckpoint (ExistingRDD scan), not replay the 3-iteration
    join lineage — the connected_components discipline that keeps plan
    size constant per round."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["bellman_ford_3relax"].spark_fn(spark, SF_DIR))
    assert "ExistingRDD" in plan, plan
    assert "Join" not in plan, plan


def test_greedy_assign_step_reads_cache_take_ordered(spark):
    """The registered greedy_assign_topmatch: each of the five argmax
    steps must be a TakeOrderedAndProject over a Filter of the CACHED
    scored-pair frame — never a global sort, and never a per-step
    recompute of the corpus x anchor crossJoin (the broadcast NLJ is
    built once, inside the cache). The registered callable returns a
    driver-local 5-row frame, so the pin drives the factored
    _ga_scored helper plus one representative step filter — the exact
    plan the loop executes."""
    from pyspark.sql import functions as F

    from etl_earthquake_gcp_spark.plans.vector_queries import _ga_scored

    scored = _ga_scored(spark, SF_DIR)
    step = (
        scored.filter(
            ~F.col("query_id").isin([0]) & ~F.col("item_id").isin([7])
        )
        .orderBy(F.desc("s_u"), "query_id", "item_id")
        .limit(1)
    )
    plan = _plan_of(step)
    assert "TakeOrderedAndProject" in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the crossJoin lives only inside the cached relation's build plan;
    # the step itself must not re-join anything. Membership first, so a
    # Spark rename of either node fails as a readable pin, not a
    # ValueError (r10 ADVICE).
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert plan.index("InMemoryTableScan") < plan.index(
        "BroadcastNestedLoopJoin"
    ), plan


def test_kcore_survivors_cached_lineage_truncated(spark):
    """The banked kcore_3peel: each round's survivor set must be
    persisted (census + both edge-filter joins read it) and the edge
    frame checkpoint must truncate the per-round lineage, so the final
    census plan reads cached/checkpointed frames instead of replaying
    the peel joins."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["kcore_3peel"].spark_fn(spark, SF_DIR))
    assert "InMemoryTableScan" in plan, plan
    assert "ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_gini_single_scan_source_partitioned_window(spark):
    """The banked gini_concentration: one documents scan, the rank
    window partitioned by source (a global window would sort the corpus
    in one task), and no join of any kind."""
    import re

    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["gini_concentration"].spark_fn(spark, SF_DIR))
    # "Scan parquet" is a substring of "FileScan parquet", so this
    # counts both spellings — and pins EXACTLY one corpus scan
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(c == "source" for c in specs), specs


def test_mann_kendall_daily_cached_equijoins_only(spark):
    """The banked mann_kendall_trend: the daily series must be
    persisted (it feeds the pair join twice, n, and the tie groups) and
    the |days|^2-per-type pair stage must stay an equi-join on
    event_type — no cartesian product."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["mann_kendall_trend"].spark_fn(spark, SF_DIR))
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ks_exact_hist_cached_no_cartesian_no_sortmerge(spark):
    """The banked ks_exact_pairs: the length histogram is persisted
    (sizes, support, and both cdf sides read it), every join runs on
    dimension-sized frames — no cartesian product, no fact-sized
    sort-merge."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["ks_exact_pairs"].spark_fn(spark, SF_DIR))
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_acf_residuals_cached_no_sortmerge(spark):
    """The banked acf_daily_counts: the |days|-row residual frame is
    persisted (den + three lag joins), and the lag joins stay on
    dimension-sized frames — no sort-merge of anything fact-sized."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["acf_daily_counts"].spark_fn(spark, SF_DIR))
    assert "InMemoryTableScan" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_stratified_split_no_single_partition_stage(spark):
    """The registered exact_stratified_split must keep every stage
    partitioned: per-stratum rank windows, broadcast bounds join, no
    global sort or single-partition exchange of the corpus."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(
        QUERIES["exact_stratified_split"].spark_fn(spark, SF_DIR)
    )
    assert "Exchange SinglePartition" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_hll_intersection_registers_cached_equijoins_only(spark):
    """The registered hll_intersection_audit: the filled register frame
    must be persisted (per-type estimates AND both pair sides read it)
    and both the pairwise register merge and the exact-set
    intersection must stay bucket/user equi-joins — no cartesian
    product anywhere (an all-pairs register compare without the bucket
    key would be 2^2p per type pair)."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["hll_intersection_audit"].spark_fn(spark, SF_DIR))
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_length_emd_hist_cached_no_cartesian(spark):
    """The registered length_emd_pairs: the per-source length histogram
    must be persisted (sizes, the support union, and both cdf sides
    read it — one fact scan total) and the pair fan-out must stay
    broadcast-NLJ over dimension-bounded frames, never a cartesian
    product of anything fact-sized."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["length_emd_pairs"].spark_fn(spark, SF_DIR))
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bigram_entropy_counts_cached_windows_partitioned(spark):
    """The registered bigram_entropy_stats: the observed-bigram count
    frame must be persisted (the marginal agg AND the term join read it
    — one tokenize pass), the marginal join must stay a (source, a)
    equi-join, and the plan must carry no window at all (pure aggs) —
    a global window here would mean a single-partition sort of the
    bigram frame."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["bigram_entropy_stats"].spark_fn(spark, SF_DIR))
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "windowspecdefinition" not in plan, plan


def test_chi2_cells_cached_top_is_take_ordered_no_sortmerge(spark):
    """The registered chi2_token_source: the (token, source) cell frame
    must be persisted (row/col/grand totals AND the grid join read it —
    one tokenize pass), the top-K head must be TakeOrderedAndProject
    (map-side partial top-k, never a global vocabulary sort), and the
    fixed-grid joins must stay broadcast — no sort-merge of the
    vocabulary-sized cell frame onto a 20-row grid."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["chi2_token_source"].spark_fn(spark, SF_DIR))
    assert "InMemoryTableScan" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_weighted_median_windows_run_on_histogram_not_facts(spark):
    """The r14 rework of the banked weighted_median_price: every
    window must consume the per-(flag, price) quantity histogram
    (post-aggregation, the quantile_normalize shape) — the plan
    aggregates BELOW the window — and every windowspecdefinition
    opens with the flag column (a fact-level cumulative walk in
    |flags| partitions would be the global-orderBy baseline class the
    rfm rework retired)."""
    import re

    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["weighted_median_price"].spark_fn(spark, SF_DIR))
    assert "Window" in plan and "HashAggregate" in plan
    # root-first printing puts a node ABOVE its children: the histogram
    # aggregate must sit BELOW the first window (print later), i.e. the
    # windows consume the aggregate's output. A fact-level cumulative
    # walk would put the window directly on the scan with any aggregate
    # above it (or none — caught by the line above). The r15 ADVICE
    # found the previous disjunctive form was a tautology.
    assert plan.index("HashAggregate") > plan.index("Window"), plan
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(c == "flag" for c in specs), specs


def test_sequence_pair_lift_span_cached_equijoins_only(spark):
    """The registered sequence_pair_lift: the span reduction must be
    persisted (the census, the marginals, and both pair sides read
    it) and the |types|^2-per-group pair stage must stay an equi-join
    on (user_id, day) — no cartesian product; the only nested-loop
    node is the 1-row census fan-out."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["sequence_pair_lift"].spark_fn(spark, SF_DIR))
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_interarrival_window_partitions_by_user(spark):
    """The registered interarrival_cv: the one lag window must
    partition by user_id — an empty partitionBy would sort every
    event in one task."""
    import re

    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["interarrival_cv"].spark_fn(spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(c == "user_id" for c in specs), specs


def test_benford_single_scan_one_bounded_fanout(spark):
    """The registered benford_first_digit: one orders scan, no join
    other than the 1-row-total broadcast fan-out onto the fixed
    9-digit frame."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(QUERIES["benford_first_digit"].spark_fn(spark, SF_DIR))
    assert plan.count("Scan parquet") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cluster_histogram_rides_banded_resolution_plan(spark):
    """The r15-registered dedup_cluster_size_histogram (banded rework):
    one parquet scan feeds the checkpointed banded-components chain
    (the rest of the lineage is the localCheckpoint RDD scan), the
    only window is the canonical resolution's per-component spec
    (never a global window), and nothing degrades to a cartesian
    product or a sort-merge join — the banded substrate is equi-join-
    shaped end to end."""
    import re

    from etl_earthquake_gcp_spark.plans import QUERIES

    plan = _plan_of(
        QUERIES["dedup_cluster_size_histogram"].spark_fn(spark, SF_DIR)
    )
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(c == "component" for c in specs), specs
