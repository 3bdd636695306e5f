"""Product/behavioral analytics queries over ``events`` + ``documents``.

Classic warehouse workloads a user of the reference's gold layer would run
downstream (funnel, cohort retention, outlier flags, profiling), plus a
fixed-iteration PageRank over the near-dup graph — the unrolled-iteration
pattern that certifies iterative algorithms against a plain SQL oracle
(near_dup_components covers the data-dependent-iteration variant with a
recursive CTE).

Conventions per plans/registry.py: identical aliases both sides, BIGINT
casts on computed ints, round() on float aggregates, sentinel fills so
compared frames are NULL-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import quantized_half_away
from ..operators import calibrate, sampling
from ..operators.dedup import jaccard_pairs_bitmask
from ..sources.tables import load_table
from .registry import register
from .oracle_shared import _pairs_cte

_EPOCH = "1970-01-01 00:00:00"


# --------------------------------------------------------------------------
# Conversion funnel — first click → first purchase at-or-after it
# --------------------------------------------------------------------------


@register(
    "conversion_funnel",
    oracle=f"""
        WITH f AS (
            SELECT user_id, min(ts) FILTER (WHERE event_type = 'click')
                       AS first_click
            FROM events GROUP BY user_id
        ), p AS (
            SELECT e.user_id, min(e.ts) AS first_purchase
            FROM events e JOIN f ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= f.first_click
            GROUP BY e.user_id
        )
        SELECT f.user_id, f.first_click,
               coalesce(p.first_purchase, TIMESTAMP '{_EPOCH}')
                   AS first_purchase,
               p.first_purchase IS NOT NULL AS converted,
               CAST(coalesce(epoch_ms(p.first_purchase)
                             - epoch_ms(f.first_click), -1) AS BIGINT)
                   AS ms_to_convert
        FROM f LEFT JOIN p ON f.user_id = p.user_id
        WHERE f.first_click IS NOT NULL
    """,
    doc="two-step conversion funnel: per user, first click and first "
    "purchase at-or-after it, with time-to-convert. Two partial-agg "
    "shuffles on user_id + one co-partitioned join — AQE turns the "
    "user-level join into a local join since both sides share the "
    "user_id partitioning. Epoch sentinel keeps the compared frame "
    "NULL-free.",
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_click = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
                "first_click"
            )
        )
        .filter(F.col("first_click").isNotNull())
    )
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        first_click.join(first_purchase, "user_id", "left")
        .select(
            "user_id",
            "first_click",
            F.coalesce(
                "first_purchase", F.lit(_EPOCH).cast("timestamp")
            ).alias("first_purchase"),
            F.col("first_purchase").isNotNull().alias("converted"),
            F.coalesce(
                F.unix_millis("first_purchase") - F.unix_millis("first_click"),
                F.lit(-1),
            )
            .cast("long")
            .alias("ms_to_convert"),
        )
    )


# --------------------------------------------------------------------------
# Cohort retention — weekly cohorts × activity-week offsets
# --------------------------------------------------------------------------


@register(
    "cohort_retention",
    oracle="""
        WITH fu AS (
            SELECT user_id, date_trunc('week', min(ts)) AS cohort
            FROM events GROUP BY user_id
        ), act AS (
            SELECT DISTINCT e.user_id, fu.cohort,
                   date_diff('day', fu.cohort,
                             date_trunc('week', e.ts)) // 7 AS week_offset
            FROM events e JOIN fu ON e.user_id = fu.user_id
        )
        SELECT cohort, CAST(week_offset AS BIGINT) AS week_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM act GROUP BY cohort, week_offset
    """,
    doc="cohort retention triangle: users grouped by first-activity week, "
    "distinct-user counts per (cohort, week-offset). first-touch agg + "
    "co-partitioned join on user_id + distinct + small final agg — the "
    "distinct is the only wide row set and it's (user, cohort, offset)-"
    "sized, bounded by |users| x active-weeks. Week truncation is "
    "Monday-based in both engines; offsets are exact multiples of 7 "
    "days, so the floor-division is engine-portable.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fu = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    act = (
        ev.join(fu, "user_id")
        .select(
            "user_id",
            "cohort",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort"))
                / 7
            ).alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort", F.col("week_offset").cast("long").alias("week_offset")).agg(
        F.count("*").alias("n_users")
    )


# --------------------------------------------------------------------------
# Outlier detection — per-group z-score flags
# --------------------------------------------------------------------------


@register(
    "value_outliers_zscore",
    oracle="""
        WITH s AS (
            SELECT event_type, round(avg(value), 6) AS mu,
                   round(stddev_samp(value), 6) AS sigma
            FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type,
               round(e.value, 2) AS value,
               round((e.value - s.mu) / s.sigma, 3) + 0.0 AS z,
               abs(e.value - s.mu) > 2 * s.sigma AS is_outlier
        FROM events e JOIN s ON e.event_type = s.event_type
    """,
    doc="per-group z-score outlier flags: tiny per-event_type moment table "
    "(one partial-agg shuffle), broadcast back onto the fact rows — the "
    "fact side never shuffles, unlike the window-function formulation "
    "which would sort every partition. The 100 TB anomaly-scan shape. "
    "The moments are rounded to 6 decimals BEFORE the z computation: "
    "partial-agg combine order varies run to run, so raw mu/sigma drift "
    "in the last ulp and would flip round-3 z boundaries; pinning the "
    "moments makes every downstream scalar op bit-identical.",
)
def value_outliers_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_samp("value"), 6).alias("sigma"),
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
        # + 0.0 normalizes IEEE -0.0 → +0.0: Spark's round() drops the sign
        # of tiny negatives, DuckDB's keeps it — the sum makes both agree
        (
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 3) + F.lit(0.0)
        ).alias("z"),
        (F.abs(F.col("value") - F.col("mu")) > 2 * F.col("sigma")).alias(
            "is_outlier"
        ),
    )


# --------------------------------------------------------------------------
# Inverted index — token → ordered posting list
# --------------------------------------------------------------------------


@register(
    "inverted_index_postings",
    oracle="""
        WITH tok AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        )
        SELECT token, CAST(count(*) AS BIGINT) AS df,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                   AS postings
        FROM tok GROUP BY token
    """,
    doc="inverted-index build: token → document frequency + ordered "
    "posting list (the search-index / near-dup-blocking primitive). "
    "Postings serialize as a canonical comma-joined string so the "
    "variable-length list is hashable cross-engine. One distinct + one "
    "agg shuffle on token; at 100 TB hot tokens would be range-split "
    "into posting segments (doc_id buckets) to bound cell size.",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    return tok.groupBy("token").agg(
        F.count("*").alias("df"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


# --------------------------------------------------------------------------
# Column profiling — one scan, long-form per-column metrics
# --------------------------------------------------------------------------

_PROFILE_COLS = ["event_id", "user_id", "event_type", "value", "props"]


@register(
    "profile_events_columns",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM events
        """
        for c in _PROFILE_COLS
    ),
    doc="data-profiling summary in long form: per-column row/null/distinct "
    "counts over events — the ingest-quality report the reference's "
    "validation filter (b2s.py:103) implies. Implemented as one "
    "multi-count-distinct aggregate over a single scan (Catalyst expands "
    "distinct aggregates into one grouped pass) + a stack() unpivot; the "
    "oracle states it as per-column UNION ALL scans.",
)
def profile_events_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
        ]
    wide = ev.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (col, n_rows, n_nulls, n_distinct)"
        )
    )


# --------------------------------------------------------------------------
# PageRank (3 unrolled iterations) over the ≥0.8 Jaccard near-dup graph
# --------------------------------------------------------------------------

_DAMPING = 0.85


def _pagerank_iter_sql(prev: str, out: str) -> str:
    """One PageRank update as SQL: out = teleport + damping * in-sum."""
    return f"""
        {out} AS (
            SELECT v.doc_id AS id,
                   0.15 / (SELECT count(*) FROM documents)
                   + {_DAMPING} * coalesce(sum(p.rank / dg.outdeg), 0.0)
                       AS rank
            FROM cand v
            LEFT JOIN edges e ON e.b = v.doc_id
            LEFT JOIN {prev} p ON p.id = e.a
            LEFT JOIN deg dg ON dg.id = e.a
            GROUP BY v.doc_id
        )
    """


@register(
    "pagerank_3iter",
    oracle=f"""
        WITH RECURSIVE {_pairs_cte()},
        deg AS (
            SELECT a AS id, CAST(count(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY a
        ),
        r0 AS (
            SELECT doc_id AS id,
                   1.0 / (SELECT count(*) FROM documents) AS rank
            FROM cand
        ),
        {_pagerank_iter_sql("r0", "r1")},
        {_pagerank_iter_sql("r1", "r2")},
        {_pagerank_iter_sql("r2", "r3")}
        SELECT id AS doc_id, round(rank, 6) AS pagerank FROM r3
    """,
    doc="PageRank, 3 fixed iterations, over the symmetric ≥0.8 Jaccard "
    "near-dup graph (damping 0.85; isolated docs hold teleport mass). "
    "Edges are hash-partitioned on src ONCE and persisted; each "
    "iteration is a co-partitioned edge⋈rank shuffle join (only the "
    "node-sized rank table moves) + one partial-agg shuffle on dst — no "
    "vertex-sized broadcast anywhere in the plan, so the same plan runs "
    "when ranks outgrow broadcast limits at 100 TB (AQE may still pick "
    "a runtime broadcast when sizes allow). Oracle = the same three "
    "updates unrolled as CTEs — the iterative-algorithm class held to a "
    "full differential check (near_dup_components covers the "
    "data-dependent-iteration variant).",
    bench=True,
)
def pagerank_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar constant for the teleport term
    # Edge-substrate adjudication (r10 verdict): the bitmask pair
    # generator is the certified-quadratic BASELINE, sound here because
    # its <=64-token vocabulary contract hard-bounds the distinct-mask
    # NLJ (explicit raise at operators/dedup.py past the bound — the
    # driver corpus satisfies it). A 100 TB near-dup graph would build
    # `pairs` from the banded MinHash generator instead
    # (operators/dedup.py::minhash_band_pairs, demonstrated end-to-end
    # by the registered near_dup_components); the iteration loop below
    # is substrate-agnostic — swap the one line, keep the plan.
    pairs = jaccard_pairs_bitmask(d, threshold=0.8)
    # symmetrize via explode, NOT union: a self-union would run the whole
    # pair pipeline twice (once per branch) while building the edge cache —
    # explode emits both directions in the same single pass over pairs.
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                ),
                F.struct(
                    F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # One hash exchange on src, reused everywhere: deg's partial agg, the
    # deg join, and every iteration's rank join all consume this layout,
    # so NOTHING vertex- or edge-sized is ever broadcast (r3 verdict #1 —
    # at 100 TB the rank table outgrows any broadcast limit; AQE is still
    # free to pick a runtime broadcast when the actual size allows).
    # PERSIST: edge list in its reused hash layout (see note above);
    # read by deg + every iteration; session-LRU lifetime
    edges = edges.repartition("src").persist()
    # PERSIST: out-degree table (one row per distinct src — node-sized),
    # read by the edges_deg build AND by both in-loop joins of every
    # iteration (r16: the deg-keyed loop below); without it each reference
    # re-aggregated the cached edge list. Session-LRU lifetime.
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    # shuffle_hash on the vertex-sized deg side: skips sorting the edge
    # side while building the edges_deg cache (same rationale as the
    # per-iteration rank join below).
    # PERSIST: degree-weighted edges, read by all three PageRank
    # iterations; session-LRU lifetime
    edges_deg = edges.join(deg.hint("shuffle_hash"), "src").persist()

    vertices = d.select(F.col("doc_id").alias("id"))
    # r16 perf: iterate over the SRC set (deg), not the full vertex table.
    # Only vertices with outdegree ever feed the next contrib join (it is
    # an inner join on src), so the in-loop rank table can live on deg —
    # which inherits the cached edges' hash(src) layout — and contrib's
    # groupBy(dst) output is hash(dst)-partitioned with the same partition
    # count. Every in-loop join is therefore co-partitioned end to end:
    # the ONLY per-iteration exchange left is contrib's own partial-agg
    # shuffle (was three: ranks→hash(src), the agg, vertices→hash(id) —
    # guide §2.4, operations keyed the same way share one exchange).
    # Vertices outside the src set (isolated docs and pure sinks) never
    # influence any contrib, so attaching them ONCE after the last
    # iteration — same left join + teleport formula as before — yields
    # bit-identical ranks for every vertex.
    src_ranks = deg.select("src").withColumn("rank", F.lit(1.0 / n_docs))
    contrib = None
    for it in range(3):
        # shuffle_hash (NOT broadcast) on the node-sized rank side: a hash
        # join streams the edge partitions without the per-iteration SORT a
        # sort-merge join would pay on the edge-sized side (at 5.9M edges
        # that sort dominated the iteration cost). Build side is one
        # hash-partition's worth of ranks — |V|/numPartitions, sized by
        # shuffle-partition count at scale, never a whole-table broadcast.
        contrib = (
            edges_deg.alias("e")
            .join(
                src_ranks.alias("r").hint("shuffle_hash"),
                F.col("e.src") == F.col("r.src"),
            )
            .select(
                F.col("e.dst").alias("dst"),
                (F.col("r.rank") / F.col("e.outdeg")).alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        # NOTE on lineage: iteration k's plan nests the earlier iterations'
        # joins. For the fixed 3 rounds here that tree is bounded and the
        # per-round frames are node-sized, so nesting is cheaper than
        # truncation. r17 re-A/B'd localCheckpoint(eager=True) on
        # src_ranks per the r16 verdict: it won a warm same-session
        # alternating A/B (3.4-3.8 s vs 4.1-4.8 s, values bit-identical)
        # but REGRESSED full-bench conditions (fresh best-of-3 with
        # clearCache per rep: 2.91 s nested vs 4.67 s checkpointed) — the
        # eager per-iteration jobs pay their scheduling + materialization
        # every rep while the single nested plan amortizes everything
        # into one job. Kept nested. Data-dependent iteration counts
        # (graph.py) DO truncate per round, where unbounded lineage is
        # the bigger hazard.
        if it < 2:
            src_ranks = deg.join(
                contrib.hint("shuffle_hash"), deg.src == contrib.dst, "left"
            ).select(
                "src",
                (
                    F.lit(0.15 / n_docs)
                    + F.lit(_DAMPING) * F.coalesce("in_sum", F.lit(0.0))
                ).alias("rank"),
            )
    ranks = vertices.join(
        contrib.hint("shuffle_hash"), vertices.id == contrib.dst, "left"
    ).select(
        "id",
        (
            F.lit(0.15 / n_docs)
            + F.lit(_DAMPING) * F.coalesce("in_sum", F.lit(0.0))
        ).alias("rank"),
    )
    return ranks.select(
        F.col("id").alias("doc_id"), F.round("rank", 6).alias("pagerank")
    )


# --------------------------------------------------------------------------
# SCD Type 2 — event stream → validity-interval dimension rows
# --------------------------------------------------------------------------

_SCD2_END = "2200-01-01 00:00:00"  # far-future yet within pandas ns range


@register(
    "scd2_user_value_intervals",
    oracle=f"""
        SELECT user_id, event_id, ts AS valid_from,
               coalesce(lead(ts) OVER w, TIMESTAMP '{_SCD2_END}') AS valid_to,
               round(value, 2) AS value,
               lead(ts) OVER w IS NULL AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="SCD Type-2 construction: each user's event stream becomes "
    "validity-interval rows [valid_from, valid_to) with an is_current "
    "flag — the slowly-changing-dimension build every warehouse load "
    "needs. One hash-partition(user_id) + sort, a single lead() pass; "
    "at 100 TB this is the same plan as the dedup window, partitioned "
    "by the dimension key. Far-future sentinel keeps the frame NULL-free.",
)
def scd2_user_value_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("valid_from"),
        F.coalesce(nxt, F.lit(_SCD2_END).cast("timestamp")).alias("valid_to"),
        F.round("value", 2).alias("value"),
        nxt.isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# Sequential patterns — event-type transition (bigram) counts
# --------------------------------------------------------------------------


@register(
    "event_type_bigrams",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        )
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    """,
    doc="sequential-pattern mining (first order): per-user event-type "
    "transition counts via lead() — the Markov-transition / user-path "
    "matrix. One user-partitioned sort + a tiny |types|^2 aggregate; "
    "the window and the following partial agg pipeline without a second "
    "wide shuffle.",
)
def event_type_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Equi-depth histogram — ntile bucketing + per-bucket bounds
# --------------------------------------------------------------------------


@register(
    "equidepth_histogram",
    oracle="""
        WITH b AS (
            SELECT value,
                   ntile(8) OVER (ORDER BY value, event_id) AS bucket
            FROM events
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               round(min(value), 2) AS lo,
               round(max(value), 2) AS hi,
               CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY bucket
    """,
    doc="equi-depth (equal-count) histogram: global ntile(8) over "
    "(value, unique tie-break) + per-bucket bounds — the complement of "
    "the fixed-width value_histogram. The exact global ntile needs a "
    "total order (one single-partition sort — fine for the oracle-"
    "checked exact form); the 100 TB path swaps in approx_percentile "
    "boundaries + a broadcast range join, which approx_value_percentiles "
    "already covers.",
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("value", "event_id")
    return (
        ev.select("value", F.ntile(8).over(w).alias("bucket"))
        .groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
            F.count("*").alias("n"),
        )
    )


@register(
    "equidepth_histogram_approx",
    oracle=None,  # GK-sketch boundaries are algorithm-specific → rows-only
    doc="the 100 TB equi-depth path: approx_percentile (Greenwald-Khanna "
    "sketch, one partial-agg pass, constant state) yields the 7 interior "
    "boundaries, which broadcast onto the scan; bucket = 1 + #boundaries "
    "below the value (a higher-order array fold — no join, no sort). "
    "Unlike the exact `equidepth_histogram` (global ntile = one single-"
    "partition sort, the registered scale-killer), every stage here is "
    "scan-shaped: sketch → broadcast → per-partition bucket + partial "
    "agg. Bucket counts are approximately equal (sketch error), bounds "
    "exact per bucket; rows-only driver check (8 rows).",
)
def equidepth_histogram_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.percentile_approx(
            "value", [i / 8 for i in range(1, 8)], 10000
        ).alias("bs")
    )
    bucket = F.lit(1) + F.aggregate(
        F.col("bs"),
        F.lit(0),
        lambda acc, x: acc + F.when(F.col("value") > x, 1).otherwise(0),
    )
    return (
        # CROSSJOIN: 1-row sketch-bounds frame (7 boundaries in one array)
        ev.join(F.broadcast(bounds))
        .select("value", bucket.cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
            F.count("*").alias("n"),
        )
    )


@register(
    "equidepth_approx_audit",
    oracle="""
        SELECT CAST(b.i AS BIGINT) AS octile,
               (SELECT CAST(count(*) AS BIGINT) FROM events
                WHERE value IS NOT NULL) AS total_rows,
               TRUE AS rank_ok
        FROM (SELECT unnest(range(1, 8)) AS i) b
    """,
    doc="oracle-checkable audit of the GK-sketch equi-depth path (the "
    "ann_recall_audit pattern): each approx_percentile octile boundary "
    "b_i is re-RANKED against the data — rank_ok asserts at least "
    "(i/8 - 0.02)*n values sit at or below b_i and fewer than "
    "(i/8 + 0.02)*n sit strictly below, i.e. the sketch honored its "
    "rank-error contract at 200x slack. Rank containment (not bucket "
    "counts) is robust to tied values and duplicate boundaries, which "
    "would legitimately merge buckets on discretized data. The oracle "
    "enumerates the 7 octiles and expects TRUE, so a sketch regression "
    "hash-fails the driver row. Scan-shaped: sketch agg -> broadcast the "
    "7-row boundary grid -> one rank census pass.",
)
def equidepth_approx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    bounds = ev.agg(
        F.percentile_approx(
            "value", [i / 8 for i in range(1, 8)], 10000
        ).alias("bs")
    )
    grid = bounds.select(
        F.posexplode("bs").alias("pos", "b")
    ).select((F.col("pos") + 1).alias("octile"), "b")
    ranks = (
        # CROSSJOIN: 7-row octile-boundary grid (constant)
        ev.join(F.broadcast(grid))
        .groupBy("octile", "b")
        .agg(
            F.count("*").alias("total_rows"),
            F.sum(F.when(F.col("value") <= F.col("b"), 1).otherwise(0))
            .alias("cnt_le"),
            F.sum(F.when(F.col("value") < F.col("b"), 1).otherwise(0))
            .alias("cnt_lt"),
        )
    )
    tol = 0.02
    p = F.col("octile") / 8.0
    rank_ok = (
        F.col("cnt_le") >= F.floor((p - tol) * F.col("total_rows"))
    ) & (F.col("cnt_lt") <= F.ceil((p + tol) * F.col("total_rows")))
    return ranks.select(
        F.col("octile").cast("long").alias("octile"),
        "total_rows",
        rank_ok.alias("rank_ok"),
    )


# --------------------------------------------------------------------------
# Snapshot reconciliation — FULL OUTER diff of two per-user aggregates
# --------------------------------------------------------------------------


@register(
    "snapshot_reconciliation",
    oracle="""
        WITH old AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n
            FROM events WHERE event_id % 2 = 0 GROUP BY user_id
        ), new AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n
            FROM events WHERE event_id % 2 = 1 GROUP BY user_id
        )
        SELECT coalesce(o.user_id, n.user_id) AS user_id,
               coalesce(o.n, 0) AS n_old,
               coalesce(n.n, 0) AS n_new,
               CASE WHEN o.user_id IS NULL THEN 'added'
                    WHEN n.user_id IS NULL THEN 'removed'
                    WHEN o.n = n.n THEN 'same'
                    ELSE 'changed' END AS status
        FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
    """,
    doc="snapshot diff / reconciliation: FULL OUTER join of two per-user "
    "aggregates with added/removed/changed/same status — the data-"
    "validation pattern for comparing pipeline runs. Both aggregates "
    "partial-agg down to |users| rows before the join, and AQE plans the "
    "co-partitioned full-outer without an extra exchange.",
)
def snapshot_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    old = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_o"))
    )
    new = (
        ev.filter(F.col("event_id") % 2 == 1)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_n"))
    )
    o, n = old.alias("o"), new.alias("n")
    return o.join(n, F.col("o.user_id") == F.col("n.user_id"), "full_outer").select(
        F.coalesce(F.col("o.user_id"), F.col("n.user_id")).alias("user_id"),
        F.coalesce(F.col("n_o"), F.lit(0)).alias("n_old"),
        F.coalesce(F.col("n_n"), F.lit(0)).alias("n_new"),
        F.when(F.col("o.user_id").isNull(), F.lit("added"))
        .when(F.col("n.user_id").isNull(), F.lit("removed"))
        .when(F.col("n_o") == F.col("n_n"), F.lit("same"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


# --------------------------------------------------------------------------
# Deterministic hash sampling — portable arithmetic hash, repeatable splits
# --------------------------------------------------------------------------

_HASH_A = 2654435761  # Knuth multiplicative constant
_MOD_P = 2147483647  # 2^31 - 1


@register(
    "deterministic_hash_sample",
    oracle=f"""
        SELECT event_id, user_id, event_type, round(value, 2) AS value
        FROM events
        WHERE (event_id * {_HASH_A}) % {_MOD_P} % 10 = 0
    """,
    doc="deterministic ~10% sample via a portable arithmetic hash on the "
    "key — the repeatable-split primitive for training-data pipelines "
    "(same rows selected on every engine and every run, unlike "
    "sample()/TABLESAMPLE whose RNG is engine-specific). Pure scan-side "
    "filter: no shuffle, prunes at the parquet reader. Product stays "
    "under 2^62 for any realistic key (ANSI-safe).",
)
def deterministic_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keep = ((F.col("event_id") * _HASH_A) % _MOD_P) % 10 == 0
    return ev.filter(keep).select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
    )


# --------------------------------------------------------------------------
# Rolling 7-day distinct users — the expand trick for windowed COUNT DISTINCT
# --------------------------------------------------------------------------


@register(
    "rolling_7d_active_users",
    oracle="""
        WITH days AS (
            SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
        ), expanded AS (
            SELECT day + o.off * INTERVAL 1 DAY AS obs_day, user_id
            FROM days CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6]) AS off) o
        )
        SELECT obs_day, CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
        FROM expanded GROUP BY obs_day
    """,
    doc="rolling 7-day distinct active users: window frames can't host "
    "COUNT(DISTINCT), so each (day, user) activity row is EXPANDED to the "
    "7 observation days it contributes to, then a plain distinct-count "
    "groups per day — the standard scale-out rewrite. Input first "
    "collapses to distinct (day, user), so the 7x fan-out applies to the "
    "small deduped set, not raw events.",
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    expanded = days.select(
        "day", "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
    ).select(
        F.timestamp_add("DAY", F.col("off"), F.col("day")).alias("obs_day"),
        "user_id",
    )
    return expanded.groupBy("obs_day").agg(
        F.count_distinct("user_id").alias("active_7d")
    )


# --------------------------------------------------------------------------
# Percent-of-total — contribution analysis over the star schema
# --------------------------------------------------------------------------


@register(
    "sales_share_by_region",
    oracle="""
        WITH r AS (
            SELECT rg.r_name, round(sum(o.o_totalprice), 2) AS sales
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region rg ON n.n_regionkey = rg.r_regionkey
            GROUP BY rg.r_name
        )
        SELECT r_name, sales,
               round(sales * 100.0 / sum(sales) OVER (), 4) AS pct_of_total
        FROM r
    """,
    doc="percent-of-total contribution: regional sales shares via a global "
    "window sum over the already-aggregated (5-row) regional table — the "
    "single-partition window is free because it runs on group cells, "
    "never on facts. Dims broadcast onto the fact scan; shares are "
    "computed from the ROUNDED sales so the division is bit-identical "
    "across engines.",
)
def sales_share_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rg = load_table(spark, sf_dir, "region")
    sales = (
        # customer scales with SF → unhinted (stats broadcast it when
        # small); nation/region are fixed-size → hinted
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(rg), n.n_regionkey == rg.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("sales"))
    )
    total = Window.partitionBy()
    return sales.select(
        "r_name",
        "sales",
        F.round(F.col("sales") * 100.0 / F.sum("sales").over(total), 4).alias(
            "pct_of_total"
        ),
    )


# --------------------------------------------------------------------------
# EWMA — exponentially weighted moving average per user (Arrow path)
# --------------------------------------------------------------------------

_EWMA_ALPHA = 0.2


@register(
    "ewma_user_values",
    oracle=f"""
        WITH RECURSIVE seq AS (
            SELECT user_id, event_id, ts, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ), rec(user_id, event_id, ts, value, rn, y) AS (
            SELECT user_id, event_id, ts, value, rn, value
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.user_id, s.event_id, s.ts, s.value, s.rn,
                   {_EWMA_ALPHA} * s.value + {1 - _EWMA_ALPHA} * r.y
            FROM rec r JOIN seq s
              ON s.user_id = r.user_id AND s.rn = r.rn + 1
        )
        SELECT user_id, event_id, ts, value, round(y, 4) + 0.0 AS ewma
        FROM rec
    """,
    doc="per-user EWMA (alpha=0.2, adjust-free recurrence y_t = a*x_t + "
    "(1-a)*y_{t-1}) over the event stream via grouped applyInPandas: one "
    "hash-partition(user_id) exchange, then a linear Arrow-batched fold "
    "per group — the canonical shape for sequential recurrences that "
    "window expressions can't express without fp-order hazards. Oracle "
    "(upgraded r3 from rows-only): a recursive CTE running the SAME "
    "double recurrence step-by-step — per-level joins bounded by the "
    "longest per-user sequence; round-4 collapses pandas-vs-SQL last-ulp "
    "drift. Also pinned against a hand-rolled reference in "
    "tests/test_ewma.py.",
)
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    schema = "user_id long, event_id long, ts timestamp, value double, ewma double"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        pdf["ewma"] = (
            pdf["value"].ewm(alpha=_EWMA_ALPHA, adjust=False).mean().round(4)
            + 0.0  # fold IEEE -0.0 into +0.0, matching the oracle's + 0.0
        )
        return pdf[["user_id", "event_id", "ts", "value", "ewma"]]

    return (
        ev.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fold, schema)
    )


# --------------------------------------------------------------------------
# HyperLogLog — bit-exact portable distinct-count sketch (operators/sketch.py)
# --------------------------------------------------------------------------


def _hll_oracle() -> str:
    from ..operators.sketch import hll_oracle_sql

    return f"""
        SELECT e.est_distinct,
               (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
                   AS true_distinct
        FROM ({hll_oracle_sql("events", "user_id")}) e
    """


@register(
    "hll_distinct_users",
    oracle=_hll_oracle(),
    doc="HyperLogLog distinct-user estimate built from scratch "
    "(operators/sketch.py): seeded portable hash → 64 registers (max "
    "least-set-bit rank per bucket, rank via an integer CASE ladder — "
    "no log2/bin portability risk) → harmonic mean + small-range "
    "linear-counting correction. The harmonic sum adds exact powers of "
    "two, so it is order-independent and the WHOLE estimator is "
    "oracle-checked bit-for-bit — rare for an HLL. Constant state "
    "(64 cells) at any cardinality: one partial-agg shuffle, the "
    "approx_count_distinct capability class with the internals exposed. "
    "Exact twin emitted beside it for the error budget.",
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev.select("user_id"), "user_id")
    est = hll_estimate(regs)
    true = ev.agg(F.count_distinct("user_id").alias("true_distinct"))
    # CROSSJOIN: two 1-row aggregates (estimate vs truth)
    return est.crossJoin(F.broadcast(true))


_CHAIN_GAP_MS = 2 * 3600 * 1000  # follow next event within 2h
_CHAIN_MAX_DEPTH = 8  # identical truncation on both engines; each level
# is one materialized join pass in Spark's recursion, so depth — not data
# size — dominates cost: keep it at the funnel horizon actually needed


def _chain_sql(epoch_fn: str, inline_nxt: bool = True) -> str:
    """Shared recursive-CTE text; only the epoch-millis function differs
    (Spark ``unix_millis`` / DuckDB ``epoch_ms``). ``inline_nxt=False``
    drops the pointer-table CTE and references a pre-materialized ``nxt``
    view instead (Spark side — see recursive_event_chains)."""
    nxt_cte = f"""nxt AS (
            SELECT event_id, user_id, {epoch_fn}(ts) AS t,
                   lag({epoch_fn}(ts)) OVER w AS prev_t,
                   CASE WHEN lead({epoch_fn}(ts)) OVER w - {epoch_fn}(ts)
                             <= {_CHAIN_GAP_MS}
                        THEN lead(event_id) OVER w END AS next_id
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), """ if inline_nxt else ""
    return f"""
        WITH RECURSIVE {nxt_cte}chain(start_id, cur_id, depth) AS (
            SELECT event_id, event_id, 0
            FROM nxt WHERE prev_t IS NULL OR t - prev_t > {_CHAIN_GAP_MS}
            UNION ALL
            SELECT c.start_id, n.next_id, c.depth + 1
            FROM chain c JOIN nxt n ON c.cur_id = n.event_id
            WHERE n.next_id IS NOT NULL AND c.depth < {_CHAIN_MAX_DEPTH}
        )
        SELECT CAST(max_depth + 1 AS BIGINT) AS chain_len,
               CAST(count(*) AS BIGINT) AS n_chains
        FROM (SELECT start_id, max(depth) AS max_depth
              FROM chain GROUP BY start_id)
        GROUP BY 1
    """


@register(
    "recursive_event_chains",
    oracle=_chain_sql("epoch_ms"),
    doc="pointer-chasing recursion with Spark 4's WITH RECURSIVE (UNION "
    "ALL form): per-user next-event links are precomputed with one lead() "
    "window pass (the acyclic pointer table), then the recursive member "
    "follows links from each chain anchor (first event after a >2h gap), "
    "depth-capped identically on both engines. Chain-length distribution "
    "out. The recursion is a co-partitioned self-join per level keyed on "
    "event ids — each level is one shuffle-bounded step, and depth, not "
    "data size, bounds the level count. Same SQL text as the DuckDB "
    "oracle modulo the epoch function.",
)
def recursive_event_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # Spark INLINES non-recursive CTEs into every recursion level, so the
    # lead/lag window over events would be recomputed ~depth times (600k-row
    # windows x 20 levels measured in minutes at the 10x probe scale).
    # Materialize the pointer table once (cached temp view); the recursive
    # SQL then only joins against the cache per level.
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_millis("ts")
    nxt = ev.select(
        "event_id",
        t.alias("t"),
        F.lag(t).over(w).alias("prev_t"),
        F.when(
            F.lead(t).over(w) - t <= _CHAIN_GAP_MS, F.lead("event_id").over(w)
        ).alias("next_id"),
    # PERSIST (below): per-event successor frame (one row per event),
    # read by the chain-start filter AND the chained self-joins;
    # session-LRU lifetime
    ).persist()
    nxt.createOrReplaceTempView("nxt")
    return spark.sql(_chain_sql("unix_millis", inline_nxt=False))


_TRIANGLE_DEGREE_CAP = 10  # keep each vertex's top-K neighbors only

_TRIANGLE_EDGES_SQL = f"""
        cells AS (
            SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS day
            FROM events
        ), edges0 AS (
            SELECT a.user_id AS u, b.user_id AS v,
                   CAST(count(*) AS BIGINT) AS shared
            FROM cells a JOIN cells b
              ON a.event_type = b.event_type AND a.day = b.day
             AND a.user_id < b.user_id
            GROUP BY 1, 2
            HAVING count(*) >= 25
        ), directed AS (
            SELECT u AS src, v AS dst, shared FROM edges0
            UNION ALL
            SELECT v, u, shared FROM edges0
        ), kept AS (
            SELECT src, dst, shared FROM (
                SELECT src, dst, shared, row_number() OVER (
                    PARTITION BY src ORDER BY shared DESC, dst) AS rn
                FROM directed)
            WHERE rn <= {_TRIANGLE_DEGREE_CAP}
        ), edges_w AS (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v,
                   shared
            FROM kept
        ), edges AS (
            SELECT u, v FROM edges_w
        )
"""


def _capped_user_edges_weighted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The degree-capped co-activity graph shared by the triangle, BFS,
    and banked LPA / Bellman-Ford queries (edge semantics documented on
    triangle_count_user_graph; replayed in SQL by _TRIANGLE_EDGES_SQL's
    edges_w CTE). Keeps the symmetric ``shared`` co-activity count as
    the edge weight. Returned persisted — every consumer traverses it
    multiple times."""
    e = load_table(spark, sf_dir, "events")
    # persist: both self-join branches read this frame — without the cache
    # the events scan + distinct runs twice (measured 4× slower at sf0.1)
    # PERSIST: (user, type, day) distinct cells read by both self-join
    # branches; session-LRU lifetime
    cells = e.select(
        "user_id", "event_type", F.col("ts").cast("date").alias("day")
    ).distinct().persist()
    a, b = cells.alias("a"), cells.alias("b")
    edges0 = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 25)
    )
    directed = edges0.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "shared"
    ).unionByName(
        edges0.select(
            F.col("v").alias("src"), F.col("u").alias("dst"), "shared"
        )
    )
    w_deg = Window.partitionBy("src").orderBy(F.desc("shared"), "dst")
    return (
        directed.withColumn("rn", F.row_number().over(w_deg))
        .filter(F.col("rn") <= _TRIANGLE_DEGREE_CAP)
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            "shared",
        )
        .distinct()
        # PERSIST: degree-capped co-activity edges, read by the wedge
        # build AND the closing-edge probe; session-LRU lifetime
        .persist()
    )


def _capped_user_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unweighted view of :func:`_capped_user_edges_weighted` —
    the shape the triangle/BFS consumers traverse (projection of the
    persisted weighted frame, so both variants share one cache)."""
    return _capped_user_edges_weighted(spark, sf_dir).select("u", "v")


@register(
    "triangle_count_user_graph",
    oracle=f"""
        WITH {_TRIANGLE_EDGES_SQL}
        SELECT CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
               CAST((SELECT count(DISTINCT x) FROM (
                   SELECT u AS x FROM edges UNION SELECT v FROM edges))
                   AS BIGINT) AS n_vertices,
               CAST((SELECT count(*)
                     FROM edges e1
                     JOIN edges e2 ON e2.u = e1.v
                     JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
                   AS BIGINT) AS n_triangles
    """,
    doc="triangle counting (graph-analytics class beyond components/"
    "pagerank): co-activity graph where users are linked by >= 25 shared "
    "(event_type, day) cells, DEGREE-CAPPED to each vertex's top-"
    f"{_TRIANGLE_DEGREE_CAP} neighbors (by shared count, neighbor-id "
    "tie-break) before the two-path join — standard kNN-graph "
    "sparsification. A co-activity graph over saturating cells densifies "
    "as users² (r3 decade ratio 7.4); the cap makes the materialized "
    "edge list LINEAR in users while keeping the strongest ties, so the "
    "ordered two-path join (u < v < w, each triangle counted once) "
    "probes a bounded-degree graph at any scale. The cap is a pure "
    "function of the data (rank over shared desc, dst), replayed "
    "verbatim by the oracle.",
)
def triangle_count_user_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _capped_user_edges(spark, sf_dir)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .count()
    )
    n_edges = edges.count()
    n_vertices = (
        edges.select(F.col("u").alias("x"))
        .union(edges.select("v"))
        .distinct()
        .count()
    )
    return spark.createDataFrame(
        [(n_edges, n_vertices, tri)],
        "n_edges long, n_vertices long, n_triangles long",
    )


def _hll_rollup_oracle() -> str:
    from ..operators.sketch import hll_rollup_oracle_sql

    return hll_rollup_oracle_sql("events", "user_id", "event_type")


@register(
    "hll_mergeable_rollup",
    oracle=_hll_rollup_oracle(),
    doc="sketch MERGEABILITY, demonstrated end to end: per-event_type HLL "
    "register tables (64 cells each), per-type estimates, then the "
    "global estimate computed by MERGING registers (max per bucket "
    "across types) — never rescanning events. Exact distinct counts "
    "emitted beside every estimate for the error budget. This is the "
    "property that makes sketches the 100 TB rollup path: a cube of "
    "distinct-counts re-aggregates KB-sized sketch cells upward instead "
    "of re-shuffling raw keys per grain, and the oracle replays register "
    "merge + harmonic sum + corrections bit-for-bit.",
)
def hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import (
        hll_estimate,
        hll_estimate_by,
        hll_registers_by,
    )

    e = load_table(spark, sf_dir, "events")
    # PERSIST: |types x 2^p| register rows (sketch-sized, SF-free),
    # read by the per-type estimates AND the merged rollup; session-LRU
    regs = hll_registers_by(e, "user_id", "event_type").persist()
    # is_total disambiguates the rollup row from a hypothetical genuine
    # 'ALL' group value — the join keys on (grp, is_total) so a domain
    # collision can't fan out (ADVICE r3).
    per_type = hll_estimate_by(regs).select(
        "grp", F.lit(False).alias("is_total"), "est_distinct"
    )
    merged_regs = regs.groupBy("bucket").agg(F.max("m_j").alias("m_j"))
    merged = hll_estimate(merged_regs).select(
        F.lit("ALL").alias("grp"), F.lit(True).alias("is_total"),
        "est_distinct",
    )
    exact = (
        e.groupBy(F.col("event_type").alias("grp"))
        .agg(F.count_distinct("user_id").alias("true_distinct"))
        .select("grp", F.lit(False).alias("is_total"), "true_distinct")
        .unionByName(
            e.agg(F.count_distinct("user_id").alias("true_distinct")).select(
                F.lit("ALL").alias("grp"), F.lit(True).alias("is_total"),
                "true_distinct",
            )
        )
    )
    return (
        per_type.unionByName(merged)
        .join(exact, ["grp", "is_total"])
        .select("grp", "is_total", "est_distinct", "true_distinct")
    )


_INTERP_USER_MOD = 7  # user_id % 7 == 0 keeps output representative+bounded


@register(
    "interpolate_linear_gaps",
    oracle=f"""
        WITH obs AS (
            -- v_u: daily mean in EXACT integer 1e-6 units. The whole
            -- interpolation below is integer arithmetic over v_u — the
            -- imputed value on a gap of length den at offset off is the
            -- rational num/(den*1e6) with num = pv_u*den + (nv_u-pv_u)*off,
            -- displayed at 4dp by integer half-away:
            -- sign(num) * ((|num| + den*50) // (den*100)) / 1e4.
            -- Re-rounding an already-6dp DOUBLE at 4dp is engine-divergent
            -- exactly on ...x50 boundaries (Spark rounds the shortest
            -- decimal repr up, DuckDB the binary value down — found by the
            -- r5 value-permutation rehearsal); integers cannot drift.
            SELECT user_id, CAST(ts AS DATE) AS d,
                   CAST(round(avg(value) * 1000000, 0) AS BIGINT) AS v_u
            FROM events
            WHERE user_id % {_INTERP_USER_MOD} = 0
            GROUP BY 1, 2
        ), span AS (
            SELECT user_id, min(d) AS lo, max(d) AS hi FROM obs GROUP BY 1
        ), grid AS (
            SELECT user_id,
                   CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                        AS DATE) AS d
            FROM span
        ), j AS (
            SELECT g.user_id, g.d, o.v_u
            FROM grid g LEFT JOIN obs o USING (user_id, d)
        ), w AS (
            SELECT user_id, d, v_u,
                   last_value(v_u IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS pv_u,
                   last_value(CASE WHEN v_u IS NOT NULL THEN d END
                              IGNORE NULLS)
                       OVER (
                       PARTITION BY user_id ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS pd,
                   first_value(v_u IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY d
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS nv_u,
                   first_value(CASE WHEN v_u IS NOT NULL THEN d END
                               IGNORE NULLS)
                       OVER (
                       PARTITION BY user_id ORDER BY d
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS nd
            FROM j
        ), frac AS (
            SELECT user_id, d, v_u,
                   CASE WHEN v_u IS NOT NULL THEN v_u ELSE
                        pv_u * (nd - pd) + (nv_u - pv_u) * (d - pd)
                   END AS num,
                   CASE WHEN v_u IS NOT NULL THEN CAST(1 AS BIGINT)
                        ELSE CAST(nd - pd AS BIGINT) END AS den
            FROM w
        )
        SELECT user_id, CAST(d AS TIMESTAMP) AS day,
               sign(num) * ((abs(num) + den * 50) // (den * 100))
                   / 10000.0 + 0.0 AS value_filled,
               (v_u IS NULL) AS is_interpolated
        FROM frac
    """,
    doc="time-series LINEAR interpolation of missing daily values (the "
    "imputation sibling of gap_fill_user_daily, which fills zeros): per "
    "user, each absent day on the dense observed-range grid gets "
    "pv + (nv-pv)*(gap_position/gap_length) from its nearest observed "
    "neighbors via IGNORE NULLS last/first window frames. Grid edges are "
    "observed by construction (span = min..max of that user's own days) so "
    "every gap is interior. The whole computation runs in exact integer "
    "1e-6 units — the imputed value is the rational num/den and the 4dp "
    "display is integer half-away, so no double is ever re-rounded at a "
    "coarser scale (r5 hardening; the old round(v6dp, 4) diverged across "
    "engines on ...x50 boundaries). Scale shape: one groupBy(user,day) agg, "
    "a per-user generated sequence (no user x day cross join), and two "
    "linear window passes over user-partitioned data — single exchange on "
    "user_id, no self-joins.",
)
def interpolate_linear_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % _INTERP_USER_MOD == 0
    )
    # integer 1e-6 units end to end (see oracle header): the imputed
    # value is the exact rational num/(den*1e6); the 4dp display is
    # integer half-away — no double is ever re-rounded at a coarser scale
    obs = e.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.round(F.avg("value") * 1_000_000, 0).cast("long").alias("v_u")
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(
            "user_id", F.explode(F.sequence("lo", "hi")).alias("d")
        )
    )
    j = grid.join(obs, ["user_id", "d"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v_u").isNotNull(), F.col("d"))
    w = j.select(
        "user_id",
        "d",
        "v_u",
        F.last("v_u", ignorenulls=True).over(w_prev).alias("pv_u"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("v_u", ignorenulls=True).over(w_next).alias("nv_u"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("nd"),
    )
    num = F.when(F.col("v_u").isNotNull(), F.col("v_u")).otherwise(
        F.col("pv_u") * F.datediff("nd", "pd").cast("long")
        + (F.col("nv_u") - F.col("pv_u"))
        * F.datediff("d", "pd").cast("long")
    )
    den = F.when(
        F.col("v_u").isNotNull(), F.lit(1).cast("long")
    ).otherwise(F.datediff("nd", "pd").cast("long"))
    scaled = w.select(
        "user_id",
        "d",
        "v_u",
        num.alias("num"),
        den.alias("den"),
    )
    return scaled.select(
        "user_id",
        F.col("d").cast("timestamp").alias("day"),
        (
            F.signum("num")
            * F.expr("div(abs(num) + den * 50, den * 100)")
            / F.lit(10_000.0)
            + F.lit(0.0)
        ).alias("value_filled"),
        F.col("v_u").isNull().alias("is_interpolated"),
    )


_HH_K = 50  # sketch capacity per shard (Misra-Gries "k counters")
_HH_SHARDS = 32  # summary units; stands in for executor-local combiners
_HH_TOP = 10  # audited head


@register(
    "heavy_hitters_mergeable",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), sharded AS (
            SELECT (doc_id * 2654435761) % 2147483647 % {_HH_SHARDS} AS shard,
                   token
            FROM tok
        ), c AS (
            SELECT shard, token, count(*) AS cnt
            FROM sharded GROUP BY shard, token
        ), ranked AS (
            SELECT shard, token, cnt,
                   row_number() OVER (
                       PARTITION BY shard ORDER BY cnt DESC, token
                   ) AS rn
            FROM c
        ), thr AS (
            SELECT r.shard,
                   coalesce(max(CASE WHEN rn = {_HH_K + 1} THEN cnt END), 0)
                       AS t
            FROM ranked r GROUP BY r.shard
        ), kept AS (
            SELECT r.shard, r.token, r.cnt - th.t AS est
            FROM ranked r JOIN thr th ON r.shard = th.shard
            WHERE r.rn <= {_HH_K} AND r.cnt - th.t > 0
        ), merged AS (
            SELECT token, sum(est) AS est FROM kept GROUP BY token
        ), bound AS (
            SELECT sum(t) AS e FROM thr
        ), truth AS (
            SELECT token, count(*) AS true_count FROM tok GROUP BY token
        )
        SELECT CAST(row_number() OVER (ORDER BY m.est DESC, m.token)
                    AS BIGINT) AS rank,
               m.token,
               CAST(m.est AS BIGINT) AS est,
               CAST(t.true_count AS BIGINT) AS true_count,
               CAST(b.e AS BIGINT) AS err_bound,
               (t.true_count - m.est) <= b.e AS err_le_bound,
               m.est <= t.true_count AS is_underestimate
        FROM merged m
        JOIN truth t ON m.token = t.token
        CROSS JOIN bound b
        QUALIFY row_number() OVER (ORDER BY m.est DESC, m.token) <= {_HH_TOP}
    """,
    doc="mergeable heavy-hitter summary (Misra-Gries / Space-Saving family "
    "in the offset representation of Agarwal et al. 2012, 'Mergeable "
    f"Summaries'): each of {_HH_SHARDS} shards keeps its top-{_HH_K} token "
    "counts offset by the (k+1)-th count — a valid MG summary with error "
    "<= n_shard/(k+1) — and shard summaries MERGE by plain estimate "
    "summation with additive error Sigma t_s <= n/(k+1). Shards come from "
    "a portable doc_id hash (not spark_partition_id), so unlike classic "
    "stream-order-dependent MG the whole sketch is DETERMINISTIC and the "
    "oracle replays estimates bit-for-bit — estimates, error bound, and "
    "the top-10 head are all hash-compared, not just rows-only. The audit "
    "joins exact truth (underestimate + bound theorems checked per row); "
    "production would ship only the kept-set, "
    f"<= {_HH_SHARDS}x{_HH_K} rows per merge level regardless of corpus "
    "size — the 100 TB path never materializes the full token histogram.",
)
def heavy_hitters_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    sharded = tok.select(
        ((F.col("doc_id") * 2654435761) % 2147483647 % _HH_SHARDS).alias(
            "shard"
        ),
        "token",
    )
    c = sharded.groupBy("shard", "token").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("shard").orderBy(F.col("cnt").desc(), "token")
    ranked = c.withColumn("rn", F.row_number().over(w))
    thr = ranked.groupBy("shard").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == _HH_K + 1, F.col("cnt"))), F.lit(0)
        ).alias("t")
    )
    kept = (
        ranked.join(thr, "shard")
        .filter((F.col("rn") <= _HH_K) & (F.col("cnt") - F.col("t") > 0))
        .select("token", (F.col("cnt") - F.col("t")).alias("est"))
    )
    merged = kept.groupBy("token").agg(F.sum("est").alias("est"))
    bound = thr.agg(F.sum("t").alias("e"))
    truth = tok.groupBy("token").agg(F.count("*").alias("true_count"))
    w_top = Window.orderBy(F.col("est").desc(), "token")
    return (
        merged.join(truth, "token")
        # CROSSJOIN: 1-row error-bound aggregate
        .crossJoin(F.broadcast(bound))
        .withColumn("rank", F.row_number().over(w_top))
        .filter(F.col("rank") <= _HH_TOP)
        .select(
            F.col("rank").cast("long").alias("rank"),
            "token",
            F.col("est").cast("long").alias("est"),
            F.col("true_count").cast("long").alias("true_count"),
            F.col("e").cast("long").alias("err_bound"),
            ((F.col("true_count") - F.col("est")) <= F.col("e")).alias(
                "err_le_bound"
            ),
            (F.col("est") <= F.col("true_count")).alias("is_underestimate"),
        )
    )


_HOLT_A = 0.3  # level smoothing
_HOLT_G = 0.1  # trend smoothing


@register(
    "holt_linear_state",
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT user_id, CAST(ts AS DATE) AS d,
                   round(avg(value), 6) AS v
            FROM events GROUP BY 1, 2
        ), seq AS (
            SELECT user_id, d, v,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY d) AS rn
            FROM daily
        ), rec(user_id, rn, l, b) AS (
            SELECT user_id, rn, v, CAST(0.0 AS DOUBLE)
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.user_id, s.rn,
                   {_HOLT_A} * s.v + {1 - _HOLT_A} * (r.l + r.b),
                   {_HOLT_G} * (({_HOLT_A} * s.v
                                 + {1 - _HOLT_A} * (r.l + r.b)) - r.l)
                       + {1 - _HOLT_G} * r.b
            FROM rec r JOIN seq s
              ON s.user_id = r.user_id AND s.rn = r.rn + 1
        ), last AS (
            SELECT user_id, max(rn) AS mx FROM rec GROUP BY 1
        )
        -- mx >= 2: Holt needs two points to estimate a trend; it also
        -- removes the one case where the emitted level is still the
        -- 6dp-QUANTIZED daily mean itself (n_days = 1 -> l = v), whose
        -- 4dp re-round diverges across engines on ...x50 boundaries.
        -- From step 2 on, l/b are raw-float combinations (0.3/0.7
        -- coefficients) and the single 4dp round is the safe class.
        SELECT r.user_id, CAST(r.rn AS BIGINT) AS n_days,
               round(r.l, 4) + 0.0 AS level,
               round(r.b, 4) + 0.0 AS trend,
               round(r.l + r.b, 4) + 0.0 AS forecast_1
        FROM rec r JOIN last la ON r.user_id = la.user_id AND r.rn = la.mx
        WHERE la.mx >= 2
    """,
    doc="Holt double-exponential smoothing (level + trend — the "
    "forecasting step up from ewma_user_values' single recurrence): "
    f"l_t = {_HOLT_A}x_t + {1 - _HOLT_A}(l+b), "
    f"b_t = {_HOLT_G}(l_t - l) + {1 - _HOLT_G}b over each user's DAILY "
    "mean series (facts reduce to |user-days| rows JVM-side before any "
    "sequential work — the cusum_changepoints shape; round-4 folded raw "
    "event rows, the repo's worst decade ratio). The coupled recurrences "
    "have no window/aggregate form; users with a single observed day "
    "are excluded (two points are needed for a trend — and a 1-day "
    "level would be the quantized daily mean itself, the 4dp-boundary "
    "class); the numpy-array fold applies the "
    "exact IEEE op sequence the recursive-CTE oracle writes out, so "
    "every final state + 1-step forecast is hash-compared. Two "
    "exchanges — the (user, day) partial agg, then a SALT-BUCKET "
    "repartition (one pandas call per shuffle partition: per-user "
    "applyInPandas paid |users| tiny-frame conversions, which dominated "
    "r4's runtime) — and the Python loop walks the bounded calendar "
    "series, not the unbounded fact stream.",
)
def holt_linear_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.round(F.avg("value"), 6).alias("v")
    )
    schema = (
        "user_id long, n_days long, level double, trend double, "
        "forecast_1 double"
    )

    def fold_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "d"])
        rows = []
        # dropna=False: a NULL user_id must still produce a row (the
        # oracle's PARTITION BY keeps a NULL partition; default groupby
        # would silently drop it)
        for uid, g in pdf.groupby("user_id", sort=False, dropna=False):
            l = b = None
            for x in g["v"].to_numpy():
                x = float(x)
                if l is None:
                    l, b = x, 0.0
                else:
                    l_new = _HOLT_A * x + (1 - _HOLT_A) * (l + b)
                    b = _HOLT_G * (l_new - l) + (1 - _HOLT_G) * b
                    l = l_new
            uid_out = None if pd.isna(uid) else int(uid)
            rows.append((uid_out, len(g), l, b, l + b))
        return pd.DataFrame(
            rows,
            columns=["user_id", "n_days", "level", "trend", "forecast_1"],
        )

    # grouped by a SALT BUCKET, not user_id: per-group applyInPandas pays
    # a pandas frame per group, and |users| tiny frames dominated the r4
    # runtime (the Python fold itself is microseconds per user). One
    # bucket per shuffle partition keeps full parallelism while the
    # per-user fold happens in pandas groupby inside each call. rounding
    # happens Spark-side (F.round, house convention — Python round() is
    # half-even, the oracle's round() half-away); +0.0 folds IEEE -0.0
    # like the oracle
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return (
        daily.withColumn("bkt", F.pmod("user_id", F.lit(n_buckets)))
        .groupBy("bkt")
        .applyInPandas(fold_bucket, schema)
        # n_days >= 2: Holt needs two points for a trend (and a 1-day
        # user's level would be the 6dp-quantized mean itself — the
        # 4dp-boundary divergence class; see the oracle comment)
        .filter(F.col("n_days") >= 2)
        .select(
            "user_id",
            "n_days",
            (F.round("level", 4) + F.lit(0.0)).alias("level"),
            (F.round("trend", 4) + F.lit(0.0)).alias("trend"),
            (F.round("forecast_1", 4) + F.lit(0.0)).alias("forecast_1"),
        )
    )


_BFS_MAX_HOP = 3


@register(
    "bfs_hops_user_graph",
    oracle=f"""
        WITH RECURSIVE {_TRIANGLE_EDGES_SQL}
        , undir AS (
            SELECT u AS s, v AS d FROM edges
            UNION ALL
            SELECT v, u FROM edges
        ), srcv AS (
            SELECT min(u) AS s FROM edges
        ), walk(v, hop) AS (
            SELECT s, 0 FROM srcv
            UNION ALL
            SELECT un.d, w.hop + 1
            FROM walk w JOIN undir un ON un.s = w.v
            WHERE w.hop < {_BFS_MAX_HOP}
        ), dist AS (
            SELECT v, min(hop) AS hop FROM walk GROUP BY v
        )
        SELECT CAST(hop AS BIGINT) AS hop,
               CAST(count(*) AS BIGINT) AS n_vertices
        FROM dist GROUP BY hop
    """,
    doc="BFS hop-distance histogram from the minimum-id vertex of the "
    "degree-capped co-activity graph (graph-traversal class beside "
    "components/pagerank/triangles): "
    f"{_BFS_MAX_HOP} frontier expansions, each one equi-join of the "
    "CURRENT FRONTIER (not the full vertex set) against the edge list "
    "plus an anti-join against the visited set — the standard distributed "
    "BFS where per-iteration work is frontier-sized and the bounded-degree "
    "graph caps frontier growth at degree^hop. Oracle: recursive-CTE walk "
    "reduced by min(hop) — true BFS distance on both sides.",
)
def bfs_hops_user_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _capped_user_edges(spark, sf_dir)
    # localCheckpoint (not persist) per iteration: lazy persist chains leave
    # each anti-join's lineage referencing every earlier level, and the
    # accumulated plan re-analyzes/re-executes per level (measured 12.7 s →
    # 1.8 s warm at sf0.01). Checkpointing truncates lineage to the
    # materialized partitions — the standard shape for iterative frontier
    # algorithms.
    undir = (
        edges.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionByName(edges.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .localCheckpoint()
    )
    src = edges.agg(F.min("u").alias("v"))
    visited = src.select("v", F.lit(0).alias("hop")).localCheckpoint()
    frontier = visited.select("v")
    for hop in range(1, _BFS_MAX_HOP + 1):
        nxt = (
            frontier.join(undir, frontier["v"] == undir["s"])
            .select(F.col("d").alias("v"))
            .distinct()
            .join(visited.select("v"), "v", "left_anti")
            .localCheckpoint()
        )
        visited = visited.unionByName(
            nxt.select("v", F.lit(hop).alias("hop"))
        ).localCheckpoint()
        frontier = nxt
    return visited.groupBy(F.col("hop").cast("long").alias("hop")).agg(
        F.count("*").alias("n_vertices")
    )


@register(
    "funnel_3step_strict",
    oracle="""
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts >= s1.t1
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
            GROUP BY e.user_id
        ), counts AS (
            SELECT 1 AS stage, 'view' AS step,
                   CAST(count(*) AS BIGINT) AS n_users FROM s1
            UNION ALL
            SELECT 2, 'view>click', CAST(count(*) AS BIGINT) FROM s2
            UNION ALL
            SELECT 3, 'view>click>purchase', CAST(count(*) AS BIGINT) FROM s3
        )
        SELECT CAST(stage AS BIGINT) AS stage, step, n_users,
               -- integer half-away 1e-4 units: the top-of-funnel user
               -- count is a bounded small integer whose reduced form
               -- reaches the 2^5*5^b half-boundary grid (160, 800, ...)
               -- at material rates under subsample (the r14 audit)
               CASE WHEN first_value(n_users) OVER (ORDER BY stage) > 0
                    THEN ((2 * n_users * 10000
                           + first_value(n_users) OVER (ORDER BY stage))
                          // (2 * first_value(n_users) OVER (ORDER BY stage)))
                         / 10000.0
               END AS rate_vs_top
        FROM counts
    """,
    doc="three-step STRICT-ORDER funnel (view -> click-after-view -> "
    "purchase-after-that-click), the product-analytics generalization of "
    "conversion_funnel's two steps: each stage anchors on the previous "
    "stage's first-touch timestamp, so out-of-order events never count. "
    "Three user-keyed partial aggs chained by co-partitioned joins — "
    "every exchange is on user_id, so AQE collapses the chain into one "
    "partitioning; the 3-row result carries top-of-funnel conversion "
    "rates.",
)
def funnel_3step_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count("*").alias("n_users")).select(
            F.lit(1).cast("long").alias("stage"),
            F.lit("view").alias("step"),
            "n_users",
        )
        .unionByName(
            s2.agg(F.count("*").alias("n_users")).select(
                F.lit(2).cast("long").alias("stage"),
                F.lit("view>click").alias("step"),
                "n_users",
            )
        )
        .unionByName(
            s3.agg(F.count("*").alias("n_users")).select(
                F.lit(3).cast("long").alias("stage"),
                F.lit("view>click>purchase").alias("step"),
                "n_users",
            )
        )
    )
    w = Window.orderBy("stage")
    # symmetric zero guard: with zero top-of-funnel users Spark's /0 is
    # NULL but DuckDB's float /0 is NaN — both engines emit NULL via CASE.
    # Display is integer half-away 1e-4 units (r14 audit): the top count
    # is a bounded small integer that reaches the 2^5*5^b half-boundary
    # grid (160, 800, ...) at material rates under subsample
    return (
        counts.withColumn("top_n", F.first("n_users").over(w))
        .select(
            "stage",
            "step",
            "n_users",
            F.when(
                F.col("top_n") > 0,
                F.expr("(2 * n_users * 10000 + top_n) div (2 * top_n)")
                / F.lit(10000.0),
            ).alias("rate_vs_top"),
        )
    )


_DRIFT_BINS = 10


@register(
    "distribution_drift_metrics",
    oracle=f"""
        WITH e AS (
            SELECT value, epoch_ms(ts) AS tms FROM events
        ), bounds AS (
            SELECT min(tms) AS t0, max(tms) AS t1 FROM e
        ), tagged AS (
            SELECT value, tms < t0 + (t1 - t0) // 2 AS is_ref
            FROM e CROSS JOIN bounds
        ), refm AS (
            SELECT round(min(value), 6) AS lo, round(max(value), 6) AS hi
            FROM tagged WHERE is_ref
        ), binned AS (
            SELECT least({_DRIFT_BINS - 1}, greatest(0,
                       CAST(floor((value - lo) / ((hi - lo) / {_DRIFT_BINS}))
                            AS INT))) AS bin,
                   is_ref
            FROM tagged CROSS JOIN refm
            WHERE hi > lo  -- constant reference window -> empty (both sides)
        ), counts AS (
            SELECT b.bin,
                   count(*) FILTER (is_ref) AS n_ref,
                   count(*) FILTER (NOT is_ref) AS n_cur
            FROM binned b GROUP BY b.bin
        ), tot AS (
            SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM counts
        ), frac AS (
            SELECT bin, n_ref, n_cur,
                   (n_ref + 0.5) / (tr + {_DRIFT_BINS} * 0.5) AS p,
                   (n_cur + 0.5) / (tc + {_DRIFT_BINS} * 0.5) AS q
            FROM counts CROSS JOIN tot
        ), terms AS (
            SELECT bin, n_ref, n_cur,
                   round((q - p) * ln(q / p), 6) + 0.0 AS psi_term,
                   round(abs(sum(p) OVER (ORDER BY bin)
                             - sum(q) OVER (ORDER BY bin)), 6) AS cum_absdiff
            FROM frac
        )
        SELECT CAST(bin AS BIGINT) AS bin,
               CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur,
               psi_term, cum_absdiff,
               round(sum(psi_term) OVER (), 6) + 0.0 AS psi_total,
               round(max(cum_absdiff) OVER (), 6) AS ks_binned
        FROM terms
    """,
    doc="distribution drift report between the first and second half of "
    "the event timeline — the ML-ops monitoring pair: PSI (population "
    "stability index, the banking-standard drift score) and a binned "
    "two-sample KS statistic, over "
    f"{_DRIFT_BINS} equi-width bins anchored on the REFERENCE window's "
    "(rounded, moments-first) min/max. Laplace-smoothed fractions keep "
    "ln(q/p) defined for empty bins with zero ANSI-division risk. Scale "
    "shape: one scan to tag+bin (map-side), one 10-group agg, then "
    "10-row window arithmetic — the binned forms are exactly what "
    "monitoring computes at 100 TB because exact KS needs a global "
    "sorted ECDF walk.",
)
def distribution_drift_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "value", F.unix_millis("ts").alias("tms")
    )
    bounds = e.agg(F.min("tms").alias("t0"), F.max("tms").alias("t1"))
    # CROSSJOIN: 1-row (t0, t1) time-bounds frame
    tagged = e.crossJoin(F.broadcast(bounds)).select(
        "value",
        (
            F.col("tms")
            < F.col("t0") + F.floor((F.col("t1") - F.col("t0")) / 2)
        ).alias("is_ref"),
    )
    refm = tagged.filter("is_ref").agg(
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )
    width = (F.col("hi") - F.col("lo")) / _DRIFT_BINS
    # CROSSJOIN: 1-row reference-bounds frame (lo, hi)
    binned = tagged.crossJoin(F.broadcast(refm)).filter(
        F.col("hi") > F.col("lo")  # ANSI div-by-zero guard, both sides
    ).select(
        F.least(
            F.lit(_DRIFT_BINS - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("value") - F.col("lo")) / width).cast("int"),
            ),
        ).alias("bin"),
        "is_ref",
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.col("is_ref").cast("long")).alias("n_ref"),
        F.sum((~F.col("is_ref")).cast("long")).alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc")
    )
    # CROSSJOIN: 1-row totals frame
    frac = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        ((F.col("n_ref") + 0.5) / (F.col("tr") + _DRIFT_BINS * 0.5)).alias("p"),
        ((F.col("n_cur") + 0.5) / (F.col("tc") + _DRIFT_BINS * 0.5)).alias("q"),
    )
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    terms = frac.select(
        "bin",
        "n_ref",
        "n_cur",
        (
            F.round((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p")), 6)
            + F.lit(0.0)
        ).alias("psi_term"),
        F.round(
            F.abs(F.sum("p").over(w_cum) - F.sum("q").over(w_cum)), 6
        ).alias("cum_absdiff"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return terms.select(
        F.col("bin").cast("long").alias("bin"),
        "n_ref",
        "n_cur",
        "psi_term",
        "cum_absdiff",
        (F.round(F.sum("psi_term").over(w_all), 6) + F.lit(0.0)).alias(
            "psi_total"
        ),
        F.round(F.max("cum_absdiff").over(w_all), 6).alias("ks_binned"),
    )


_BOOT_B = 50  # bootstrap replicas


@register(
    "grouped_bootstrap_ci",
    oracle=f"""
        WITH reps AS (
            SELECT unnest(range(1, {_BOOT_B + 1})) AS r
        ), weighted AS (
            SELECT e.event_type, rp.r, e.value,
                   CASE WHEN (e.event_id * 2654435761 + rp.r * 97003)
                             % 2147483647 % 16 < 6 THEN 0
                        WHEN (e.event_id * 2654435761 + rp.r * 97003)
                             % 2147483647 % 16 < 12 THEN 1
                        WHEN (e.event_id * 2654435761 + rp.r * 97003)
                             % 2147483647 % 16 < 15 THEN 2
                        ELSE 3 END AS w
            FROM events e CROSS JOIN reps rp
        ), rep_means AS (
            -- replica means quantized ONCE to exact 1e-6-unit BIGINTs;
            -- the 4dp display below is integer half-away — re-rounding
            -- an already-6dp DOUBLE at 4dp diverges across engines
            -- exactly on ...x50 boundaries (r5 rule; the s57 subsample
            -- sweep caught this query's ci_hi on 49.368050)
            SELECT event_type, r,
                   CAST(round((sum(w * value) / sum(w)) * 1000000, 0)
                        AS BIGINT) AS m_u
            FROM weighted
            GROUP BY event_type, r
            HAVING sum(w) > 0
        ), ranked AS (
            SELECT event_type, m_u,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY m_u, r
                   ) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM rep_means
        ), sel AS (
            SELECT event_type,
                   max(CASE WHEN rn = ceil(0.025 * n) THEN m_u END) AS lo_u,
                   max(CASE WHEN rn = ceil(0.5 * n) THEN m_u END) AS mid_u,
                   max(CASE WHEN rn = ceil(0.975 * n) THEN m_u END) AS hi_u
            FROM ranked
            GROUP BY event_type
        )
        SELECT event_type,
               sign(lo_u) * ((abs(lo_u) + 50) // 100) / 10000.0 + 0.0
                   AS ci_lo,
               sign(mid_u) * ((abs(mid_u) + 50) // 100) / 10000.0 + 0.0
                   AS ci_mid,
               sign(hi_u) * ((abs(hi_u) + 50) // 100) / 10000.0 + 0.0
                   AS ci_hi
        FROM sel
    """,
    doc="bootstrap confidence intervals for per-group means via "
    f"DETERMINISTIC hash-resampling: each of {_BOOT_B} replicas assigns "
    "every row a portable-hash multiplicity in {{0,1,2,3}} (an integer "
    "surrogate for the Poisson(1) bootstrap — the resampling scheme used "
    "at scale because true with-replacement sampling needs a global row "
    "index), replica means are rank-selected (pure order statistics, no interpolation) into a 95% interval. No rand() "
    "anywhere: both engines replay the identical replicas, so even the "
    "CI bounds hash-match. Scale shape: one map-side explode x B, "
    "partial-agg to (group x replica) cells, "
    f"then {_BOOT_B}-value quantiles per group — the classic "
    "two-level-agg bootstrap that never shuffles raw rows twice. "
    "Replica means are quantized ONCE to exact 1e-6-unit BIGINTs "
    "(moments-first rule) and the 4dp CI display is integer half-away "
    "(quantized_half_away) — the coarse re-round of an already-6dp "
    "double is the r5-documented cross-engine ...x50 divergence, hit "
    "live by the seed-57 subsample sweep on ci_hi = 49.368050.",
)
def grouped_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    reps = F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("r")
    h = (
        F.col("event_id") * 2654435761 + F.col("r") * 97003
    ) % 2147483647 % 16
    w = (
        F.when(h < 6, 0).when(h < 12, 1).when(h < 15, 2).otherwise(3)
    )
    weighted = e.select("event_type", "event_id", "value", reps).select(
        "event_type", "r", "value", w.alias("w")
    )
    rep_means = (
        weighted.groupBy("event_type", "r")
        .agg(
            F.round(
                (F.sum(F.col("w") * F.col("value")) / F.sum("w"))
                * 1_000_000,
                0,
            )
            .cast("long")
            .alias("m_u"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
    )
    # CI bounds as pure ORDER STATISTICS (rank selection, replica-id
    # tie-break) — interpolating percentiles differ between engines in
    # the last ulp on even counts; a selected element cannot. Means are
    # carried as 1e-6-unit BIGINTs so the rank order is integer order
    # and the 4dp display never re-rounds a quantized double.
    w_rank = Window.partitionBy("event_type").orderBy("m_u", "r")
    w_n = Window.partitionBy("event_type")
    ranked = rep_means.select(
        "event_type",
        "m_u",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_n).alias("n"),
    )

    def _sel(q: float):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col("m_u")
            )
        )

    def _disp4(col: str):  # 1e-6 units -> half-away 4dp double, exactly
        return quantized_half_away(col, unit=100, out_scale=10_000.0)

    sel = ranked.groupBy("event_type").agg(
        _sel(0.025).alias("lo_u"),
        _sel(0.5).alias("mid_u"),
        _sel(0.975).alias("hi_u"),
    )
    return sel.select(
        "event_type",
        _disp4("lo_u").alias("ci_lo"),
        _disp4("mid_u").alias("ci_mid"),
        _disp4("hi_u").alias("ci_hi"),
    )


@register(
    "cumulative_unique_users",
    oracle="""
        WITH firsts AS (
            SELECT user_id, CAST(min(ts) AS DATE) AS first_day
            FROM events GROUP BY user_id
        ), per_day AS (
            SELECT first_day, CAST(count(*) AS BIGINT) AS new_users
            FROM firsts GROUP BY first_day
        )
        SELECT CAST(first_day AS TIMESTAMP) AS day, new_users,
               CAST(sum(new_users) OVER (
                   ORDER BY first_day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cumulative_users
        FROM per_day
    """,
    doc="cumulative distinct-user growth curve: each user collapses to a "
    "first-seen day (one user_id partial agg), daily new-user counts, "
    "then a running sum over the DAY-SIZED series — the only ordered "
    "walk touches |days| rows, never facts, which is why first-seen "
    "reduction (not windowed count-distinct) is the 100 TB growth-curve "
    "shape.",
)
def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("first_day")
    )
    per_day = firsts.groupBy("first_day").agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        F.col("first_day").cast("timestamp").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


_PARETO_TIERS = (10, 20, 50)  # top-% customer tiers

# shared by the certified-baseline form and its scale-safe sibling: the
# sibling reproduces these EXACT values from a revenue histogram (tier
# revenue only ever sums whole tied runs plus a count x value remainder
# at the boundary, so the row_number is never actually needed), which
# is what sharing one oracle string certifies.
_PARETO_ORACLE = f"""
    WITH rev AS (
        SELECT o_custkey, round(sum(o_totalprice), 2) AS r
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT r,
               row_number() OVER (ORDER BY r DESC, o_custkey) AS rn,
               count(*) OVER () AS n,
               round(sum(r) OVER (), 2) AS total
        FROM rev
    ), tiers AS (
        SELECT unnest([{", ".join(str(t) for t in _PARETO_TIERS)}]) AS pct
    )
    SELECT CAST(t.pct AS BIGINT) AS top_pct,
           CAST(ceil(max(rk.n) * t.pct / 100.0) AS BIGINT) AS n_customers,
           round(sum(rk.r), 2) AS tier_revenue,
           round(sum(rk.r) / max(rk.total), 4) AS revenue_share
    FROM tiers t
    JOIN ranked rk ON rk.rn <= ceil(rk.n * t.pct / 100.0)
    GROUP BY t.pct
"""


@register(
    "pareto_revenue_share",
    oracle=_PARETO_ORACLE,
    doc="Pareto (80/20) revenue-concentration analysis: per-customer "
    "revenue (rounded BEFORE ranking — moments-first, so the rank order "
    "is engine-identical), ranked desc with id tie-break, cumulative "
    "share of each top-N% tier. The ordered walk runs over CUSTOMER "
    "aggregates, not order facts — |customers| rows after one partial "
    "agg. |customers| still grows with SF, so this exact global "
    "row_number is the certified BASELINE form; the registered sibling "
    "pareto_revenue_share_scaled produces the identical result (same "
    "oracle string) from a revenue histogram + bucketed rank selection "
    "and never sorts the customer frame in one task — that is the "
    "100 TB plan. Tie-broken row_number (not rank) keeps tier "
    "boundaries deterministic under equal revenues.",
)
def pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("r")
    )
    w_rank = Window.orderBy(F.col("r").desc(), "o_custkey")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = rev.select(
        "r",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("n"),
        F.round(F.sum("r").over(w_all), 2).alias("total"),
    )
    tiers = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in _PARETO_TIERS])).alias("pct")
    )
    cut = F.ceil(F.col("n") * F.col("pct") / 100.0)
    return (
        F.broadcast(tiers)
        .join(ranked, F.col("rn") <= cut)
        .groupBy("pct")
        .agg(
            F.ceil(F.max("n") * F.col("pct") / 100.0)
            .cast("long")
            .alias("n_customers"),
            F.round(F.sum("r"), 2).alias("tier_revenue"),
            F.round(F.sum("r") / F.max("total"), 4).alias("revenue_share"),
        )
        .select(
            F.col("pct").cast("long").alias("top_pct"),
            "n_customers",
            "tier_revenue",
            "revenue_share",
        )
    )


@register(
    "pareto_revenue_share_scaled",
    oracle=_PARETO_ORACLE,
    doc="the scale-safe form of pareto_revenue_share (SAME oracle "
    "string — the driver hash certifies bit-identity of the two "
    "plans): per-customer revenue carried as exact integer cents, the "
    "top-C tier sum computed purely from VALUE arithmetic — boundary "
    "value v at descending rank C via the two-level bucketed histogram "
    "selection (operators/calibrate.py::desc_rank_boundaries: coarse "
    "range buckets -> cumsum over <= 1024 bucket rows -> refinement "
    "over the boundary bucket's histogram slice), then tier_cents = "
    "sum(u > v) + (C - n_above) * v, exact because every row tied at "
    "the boundary contributes the same value, so the per-row custkey "
    "tie-break can never change the sum. The customer frame is scanned "
    "(once for the histogram, once for the above-boundary sum) but "
    "NEVER sorted in one task — the row_number/SinglePartition-sort of "
    "the baseline form is gone (plan-pinned in "
    "tests/test_physical_strategies.py). Displays divide the exact "
    "cents once (tier_cents/100.0 equals the oracle's round(sum,2) "
    "while float-sum drift < half a cent; the share is the single "
    "int/int ratio round — the measured-safe class). BIGINT cents stay "
    "exact below 2^53 for the display division; beyond (~10^15 "
    "dollars) widen to DECIMAL — noted, not paid here.",
)
def pareto_revenue_share_scaled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("r")
    )
    # exact integer cents: r is the double nearest a 2dp decimal, so
    # r*100 is within ~1e-9 of an integer and the round is exact.
    # PERSIST: |customers| single-column frame read by three consumers
    # (totals, the boundary selection's histogram, the above-boundary
    # sum); session-LRU lifetime (lazy return)
    revu = rev.select(
        F.round(F.col("r") * 100, 0).cast("long").alias("u")
    ).persist()
    tot = revu.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("u").cast("long").alias("total_u"),
    )
    tiers = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in _PARETO_TIERS])).alias("pct")
    )
    targets = (
        # CROSSJOIN: 1-row total-count frame onto the 3-row tier frame
        tiers.crossJoin(F.broadcast(tot))
        # integer ceil(n*pct/100): exact twin of the oracle's float
        # ceil while n*pct is exact in double (n < 2^46)
        .withColumn("cut", F.expr("(n * pct + 99) div 100").cast("long"))
        .withColumn("_tag", F.col("pct"))
    )
    bnd = calibrate.desc_rank_boundaries(revu, "u", targets, "cut", "v")
    above = (
        revu.join(
            F.broadcast(bnd.select("_tag", "v")), revu["u"] > F.col("v")
        )
        .groupBy("_tag")
        .agg(F.sum("u").cast("long").alias("sum_above"))
    )
    return (
        bnd.join(above, "_tag", "left")
        .withColumn("sum_above", F.coalesce("sum_above", F.lit(0)))
        .withColumn(
            "tier_cents",
            F.col("sum_above")
            + (F.col("cut") - F.col("n_above")) * F.col("v"),
        )
        .select(
            F.col("pct").cast("long").alias("top_pct"),
            F.col("cut").alias("n_customers"),
            (F.col("tier_cents") / F.lit(100.0)).alias("tier_revenue"),
            F.round(F.col("tier_cents") * 1.0 / F.col("total_u"), 4).alias(
                "revenue_share"
            ),
        )
    )


@register(
    "seasonal_decompose_dow",
    oracle="""
        WITH daily AS (
            -- the whole decomposition runs in EXACT integer 1e-6 units
            -- (v_u/trend_u/s_u/r_u BIGINT): every 6dp intermediate is an
            -- integer, the residual is pure integer subtraction, and the
            -- 4dp display step is integer half-away — re-rounding an
            -- already-6dp DOUBLE at 4dp diverges across engines exactly
            -- on ...x50 boundaries (r5 value-permutation rehearsal)
            SELECT CAST(ts AS DATE) AS d,
                   CAST(round(avg(value) * 1000000, 0) AS BIGINT) AS v_u
            FROM events GROUP BY 1
        ), trended AS (
            SELECT d, v_u,
                   CAST(round(avg(v_u) OVER (
                       ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                   ), 0) AS BIGINT) AS trend_u
            FROM daily
        ), seasonal AS (
            SELECT dayofweek(d) AS dow,
                   CAST(round(avg(v_u - trend_u), 0) AS BIGINT) AS s_u
            FROM trended GROUP BY 1
        ), resid AS (
            SELECT t.d, t.v_u, t.trend_u, se.s_u,
                   t.v_u - t.trend_u - se.s_u AS r_u
            FROM trended t JOIN seasonal se ON dayofweek(t.d) = se.dow
        ), sigma AS (
            SELECT round(stddev_samp(r_u / 1000000.0), 6) AS sd FROM resid
        )
        SELECT CAST(d AS TIMESTAMP) AS day,
               sign(v_u) * ((abs(v_u) + 50) // 100) / 10000.0 + 0.0
                   AS daily_value,
               sign(trend_u) * ((abs(trend_u) + 50) // 100) / 10000.0 + 0.0
                   AS trend,
               sign(s_u) * ((abs(s_u) + 50) // 100) / 10000.0 + 0.0
                   AS seasonal_dow,
               sign(r_u) * ((abs(r_u) + 50) // 100) / 10000.0 + 0.0
                   AS residual,
               abs(r_u) / 1000000.0 > 2 * sd AS is_anomaly
        FROM resid CROSS JOIN sigma
        WHERE sd > 0
    """,
    doc="STL-lite seasonal decomposition of the daily series: 7-day "
    "centered moving-average TREND, day-of-week SEASONAL means of the "
    "detrended series, RESIDUAL anomaly flags at 2 sigma — the classic "
    "additive decomposition every monitoring stack runs before alerting "
    "on raw values. Every intermediate lives in exact integer 1e-6 "
    "units (the residual is pure integer subtraction) and the 4dp "
    "display step is integer half-away, so the chain of window avg -> "
    "group avg -> residual -> stddev is bit-identical across engines "
    "(r5 hardening of the 6dp->4dp re-round divergence); the "
    "zero-variance ANSI guard filters on sd > 0 both sides. Ordered "
    "walks touch the DAY-sized series only; facts are reduced by one "
    "(day) partial agg up front.",
)
def seasonal_decompose_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # exact integer 1e-6 units end to end (see oracle header)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.round(F.avg("value") * 1_000_000, 0).cast("long").alias("v_u")
    )
    w_trend = Window.orderBy("d").rowsBetween(-3, 3)
    trended = daily.select(
        "d",
        "v_u",
        F.round(F.avg("v_u").over(w_trend), 0).cast("long").alias("trend_u"),
    )
    seasonal = trended.groupBy(F.dayofweek("d").alias("dow")).agg(
        F.round(F.avg(F.col("v_u") - F.col("trend_u")), 0)
        .cast("long")
        .alias("s_u")
    )
    resid = (
        trended.withColumn("dow", F.dayofweek("d"))
        .join(F.broadcast(seasonal), "dow")
        .select(
            "d",
            "v_u",
            "trend_u",
            "s_u",
            (F.col("v_u") - F.col("trend_u") - F.col("s_u")).alias("r_u"),
        )
    )
    sigma = resid.agg(
        F.round(F.stddev_samp(F.col("r_u") / F.lit(1_000_000.0)), 6).alias(
            "sd"
        )
    )

    def disp4(col: str):  # 1e-6 units -> half-away 4dp double, exactly
        return quantized_half_away(col, unit=100, out_scale=10_000.0)

    return (
        # CROSSJOIN: 1-row sigma aggregate
        resid.crossJoin(F.broadcast(sigma))
        .filter(F.col("sd") > 0)
        .select(
            F.col("d").cast("timestamp").alias("day"),
            disp4("v_u").alias("daily_value"),
            disp4("trend_u").alias("trend"),
            disp4("s_u").alias("seasonal_dow"),
            disp4("r_u").alias("residual"),
            (F.abs("r_u") / F.lit(1_000_000.0) > 2 * F.col("sd")).alias(
                "is_anomaly"
            ),
        )
    )


@register(
    "rfm_segmentation",
    oracle="""
        WITH base AS (
            SELECT o_custkey,
                   max(epoch_ms(o_orderdate_ts)) AS last_ms,
                   count(*) AS freq,
                   round(sum(o_totalprice), 2) AS monetary
            FROM (
                SELECT o_custkey, o_totalprice,
                       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate_ts
                FROM orders
            ) GROUP BY o_custkey
        ), scored AS (
            SELECT o_custkey,
                   ntile(5) OVER (ORDER BY last_ms DESC, o_custkey) AS r_score,
                   ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
                   ntile(5) OVER (ORDER BY monetary DESC, o_custkey)
                       AS m_score
            FROM base
        )
        SELECT CAST(r_score AS BIGINT) AS r_score,
               CAST(f_score AS BIGINT) AS f_score,
               CAST(m_score AS BIGINT) AS m_score,
               CAST(count(*) AS BIGINT) AS n_customers,
               CASE WHEN r_score = 1 AND f_score <= 2 AND m_score <= 2
                    THEN 'champion'
                    WHEN r_score >= 4 AND f_score >= 4 THEN 'lapsed'
                    ELSE 'regular' END AS segment
        FROM scored
        GROUP BY r_score, f_score, m_score
    """,
    doc="RFM customer segmentation (recency/frequency/monetary quintiles "
    "— the standard CRM scoring): one customer-level partial agg, three "
    "ntile(5) rankings with (metric, custkey) total orders so quintile "
    "boundaries are deterministic under ties, then segment labels and "
    "cell counts. The ordered walks rank CUSTOMER aggregates (one row "
    "per customer), not order facts — but |customers| grows with SF, "
    "so the exact global ntiles are the certified BASELINE form; the "
    "registered sibling rfm_segmentation_scaled is the 100 TB plan — "
    "quintile boundaries per metric by bucketed histogram-rank "
    "selection (operators/calibrate.py::desc_rank_boundaries) and "
    "broadcast-compare score assignment under tie-coherent min-rank "
    "quintile semantics, never sorting the customer frame in one "
    "task.",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max(F.unix_millis(F.col("o_orderdate").cast("timestamp"))).alias(
            "last_ms"
        ),
        F.count("*").alias("freq"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    scored = base.select(
        "o_custkey",
        F.ntile(5)
        .over(Window.orderBy(F.col("last_ms").desc(), "o_custkey"))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("freq").desc(), "o_custkey"))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary").desc(), "o_custkey"))
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count("*").alias("n_customers"))
        .select(
            F.col("r_score").cast("long").alias("r_score"),
            F.col("f_score").cast("long").alias("f_score"),
            F.col("m_score").cast("long").alias("m_score"),
            "n_customers",
            _rfm_segment_case().alias("segment"),
        )
    )


def _rfm_segment_case() -> F.Column:
    """Shared segment labels for both RFM forms."""
    return (
        F.when(
            (F.col("r_score") == 1)
            & (F.col("f_score") <= 2)
            & (F.col("m_score") <= 2),
            "champion",
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "lapsed")
        .otherwise("regular")
    )


@register(
    "rfm_segmentation_scaled",
    oracle="""
        WITH base AS (
            SELECT o_custkey,
                   max(epoch_ms(CAST(o_orderdate AS TIMESTAMP))) AS last_ms,
                   count(*) AS freq,
                   round(sum(o_totalprice), 2) AS monetary
            FROM orders GROUP BY o_custkey
        ), scored AS (
            -- min-rank quintiles: score = 1 + floor(5*cnt_above/n),
            -- every tied run shares one score (rank(), not ntile)
            SELECT o_custkey,
                   1 + (5 * (rank() OVER (ORDER BY last_ms DESC) - 1))
                       // (count(*) OVER ()) AS r_score,
                   1 + (5 * (rank() OVER (ORDER BY freq DESC) - 1))
                       // (count(*) OVER ()) AS f_score,
                   1 + (5 * (rank() OVER (ORDER BY monetary DESC) - 1))
                       // (count(*) OVER ()) AS m_score
            FROM base
        )
        SELECT CAST(r_score AS BIGINT) AS r_score,
               CAST(f_score AS BIGINT) AS f_score,
               CAST(m_score AS BIGINT) AS m_score,
               CAST(count(*) AS BIGINT) AS n_customers,
               CASE WHEN r_score = 1 AND f_score <= 2 AND m_score <= 2
                    THEN 'champion'
                    WHEN r_score >= 4 AND f_score >= 4 THEN 'lapsed'
                    ELSE 'regular' END AS segment
        FROM scored
        GROUP BY r_score, f_score, m_score
    """,
    doc="the scale-safe form of rfm_segmentation, under tie-COHERENT "
    "min-rank quintiles (score = 1 + floor(5*cnt_above/n); rank() in "
    "the oracle): equal metric values always land in the same "
    "quintile, which is both the honest CRM semantics and exactly "
    "what removes the per-row custkey tie-split that forces ntile's "
    "global single-task sort (ntile splits a tied run across a "
    "boundary by raw position — reproducing that at scale means "
    "totally ordering customer-sized tie groups, the one thing a "
    "histogram cannot do and a 100 TB plan should not do). The four "
    "quintile boundary values per metric come from the two-level "
    "bucketed histogram selection "
    "(operators/calibrate.py::desc_rank_boundaries, cumsum over "
    "<= 1024 bucket rows + boundary-bucket refinement); scores are "
    "then pure column compares against a broadcast 1-row boundary "
    "frame — score(x) = 1 + #(s: x < v_s), provably equal to the "
    "rank() form because cnt_above(x) >= c  <=>  x < v_c. Monetary is "
    "carried as exact integer cents (order-isomorphic to the 2dp "
    "double). One shuffle to the customer agg (persisted: it feeds "
    "three histogram builds + the final assignment scan), windows "
    "only over bucket frames — the customer frame is never sorted in "
    "one task (plan-pinned in tests/test_physical_strategies.py). "
    "All integer end to end; no floats anywhere.",
)
def rfm_segmentation_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max(
                F.unix_millis(F.col("o_orderdate").cast("timestamp"))
            ).alias("last_ms"),
            F.count("*").alias("freq"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        # exact cents (see pareto_revenue_share_scaled)
        .withColumn(
            "m_u", F.round(F.col("monetary") * 100, 0).cast("long")
        )
        # PERSIST: bounded lifetime — materialized and re-read within
        # this one query (3 histogram builds + the assignment scan),
        # LRU-evicted after; |customers| rows, storage-level default
        .persist()
    )
    n_row = base.agg(F.count("*").cast("long").alias("n"))

    def quintile_bounds(metric: str, prefix: str) -> DataFrame:
        """1-row frame with the 4 descending-rank boundary values."""
        targets = (
            spark.range(1, 5)
            .select(F.col("id").cast("long").alias("_tag"))
            # CROSSJOIN: 1-row count frame onto the 4-row tag frame
            .crossJoin(F.broadcast(n_row))
            # c_s = ceil(s*n/5) as pure integers
            .withColumn("cut", F.expr("(_tag * n + 4) div 5").cast("long"))
        )
        bnd = calibrate.desc_rank_boundaries(
            base.select(metric), metric, targets, "cut", "v"
        )
        return bnd.agg(
            *[
                F.max(F.when(F.col("_tag") == s, F.col("v"))).alias(
                    f"{prefix}{s}"
                )
                for s in range(1, 5)
            ]
        )

    def score(metric: str, prefix: str) -> F.Column:
        c = F.lit(1)
        for s in range(1, 5):
            c = c + F.when(
                F.col(metric) < F.col(f"{prefix}{s}"), 1
            ).otherwise(0)
        return c.cast("long")

    scored = (
        # CROSSJOIN: three 1-row quintile-boundary pivots (4 boundary columns
        # each)
        base.crossJoin(F.broadcast(quintile_bounds("last_ms", "rv")))
        .crossJoin(F.broadcast(quintile_bounds("freq", "fv")))  # CROSSJOIN: 1-row pivot
        .crossJoin(F.broadcast(quintile_bounds("m_u", "mv")))  # CROSSJOIN: 1-row pivot
        .select(
            score("last_ms", "rv").alias("r_score"),
            score("freq", "fv").alias("f_score"),
            score("m_u", "mv").alias("m_score"),
        )
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count("*").alias("n_customers"))
        .select(
            "r_score",
            "f_score",
            "m_score",
            "n_customers",
            _rfm_segment_case().alias("segment"),
        )
    )


_CUSUM_K = 0.5  # slack (in sigma units) — standard one-sided CUSUM tuning
_CUSUM_H = 4.0  # decision threshold (in sigma units)
# integer twins for the exact-rational recurrence (den = 2*sigma_u):
# z - k = (2*(v_u - mu_u) - _CUSUM_K2*sigma_u) / (2*sigma_u) and the
# alarm s > H is S > _CUSUM_H2*sigma_u — both exact in BIGINT
_CUSUM_K2 = int(2 * _CUSUM_K)
_CUSUM_H2 = int(2 * _CUSUM_H)
assert 2 * _CUSUM_K == _CUSUM_K2 and 2 * _CUSUM_H == _CUSUM_H2


@register(
    "cusum_changepoints",
    oracle=f"""
        WITH RECURSIVE daily AS (
            -- daily means quantized ONCE to 1e-6-unit BIGINTs; with
            -- k = {_CUSUM_K} the whole recurrence is EXACT integer
            -- arithmetic over the fixed denominator 2*sigma_u, so no
            -- cumulative float ever reaches a display round — the
            -- round(float_chain, 4) form split on a ...x50 boundary
            -- (1.18355) in the seed-5 subsample stress (r13)
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(round(avg(value) * 1000000, 0) AS BIGINT) AS v_u
            FROM events GROUP BY 1, 2
        ), m AS (
            SELECT event_type,
                   CAST(round(avg(v_u * 1.0), 0) AS BIGINT) AS mu_u,
                   CAST(round(stddev_samp(v_u * 1.0), 0) AS BIGINT)
                       AS sigma_u
            FROM daily GROUP BY 1
            HAVING CAST(round(stddev_samp(v_u * 1.0), 0) AS BIGINT) > 0
        ), seq AS (
            SELECT d.event_type, d.d, d.v_u, m.mu_u, m.sigma_u,
                   row_number() OVER (PARTITION BY d.event_type
                                      ORDER BY d.d) AS rn
            FROM daily d JOIN m ON d.event_type = m.event_type
        ), rec(event_type, rn, d, sigma_u, s_hi_n, s_lo_n) AS (
            SELECT event_type, rn, d, sigma_u,
                   greatest(0, 2 * (v_u - mu_u) - {_CUSUM_K2} * sigma_u),
                   greatest(0, 2 * (mu_u - v_u) - {_CUSUM_K2} * sigma_u)
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.event_type, s.rn, s.d, s.sigma_u,
                   greatest(0, r.s_hi_n + 2 * (s.v_u - s.mu_u)
                               - {_CUSUM_K2} * s.sigma_u),
                   greatest(0, r.s_lo_n + 2 * (s.mu_u - s.v_u)
                               - {_CUSUM_K2} * s.sigma_u)
            FROM rec r JOIN seq s
              ON s.event_type = r.event_type AND s.rn = r.rn + 1
        )
        SELECT event_type, CAST(d AS TIMESTAMP) AS day,
               ((s_hi_n * 20000 + 2 * sigma_u) // (4 * sigma_u))
                   / 10000.0 AS cusum_hi,
               ((s_lo_n * 20000 + 2 * sigma_u) // (4 * sigma_u))
                   / 10000.0 AS cusum_lo,
               s_hi_n > {_CUSUM_H2} * sigma_u
                   OR s_lo_n > {_CUSUM_H2} * sigma_u AS is_changepoint
        FROM rec
    """,
    doc="one-sided CUSUM control charts (Page 1954) per event_type over "
    "the daily series — the changepoint detector monitoring stacks run "
    f"on KPIs: S_hi = max(0, S + z - {_CUSUM_K}), mirrored low side, "
    f"alarm at {_CUSUM_H} sigma. The max(0,·) recurrence is another "
    "window-inexpressible sequential fold: grouped applyInPandas applies "
    "the recursive-CTE oracle's exact op order. With k a half-integer "
    "the fold is EXACT INTEGER arithmetic in 1e-6 units over the fixed "
    "denominator 2*sigma_u (the MMR quantize-all-scores rule): S' = "
    f"max(0, S + 2*(v_u-mu_u) - {_CUSUM_K2}*sigma_u), display is "
    "integer half-away (S is nonnegative), and the alarm compares "
    f"S > {_CUSUM_H2}*sigma_u exactly — no cumulative float ever "
    "reaches a display round (the r13 stress caught the float form on "
    "a 1.18355 boundary). Bound: |S|*20000 <= days*4*max|v_u|*2e4 "
    "= 8e18 at 10k days x value<=1e4 (v_u <= 1e10 in 1e-6 units) — "
    "~13% under the 9.22e18 BIGINT max, so the envelope is tight: "
    "past ~11.5k such days ANSI mode/DuckDB raise (loudly, never "
    "wrap) and the Python fold's unbounded ints error at the Arrow "
    "long conversion; beyond that, drop to 1e-4 value units (bound "
    "/100) or widen the display product to DECIMAL(38,0) on both "
    "engines. Facts reduce to the daily series before any sequential "
    "work.",
)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.round(F.avg("value") * 1_000_000, 0).cast("long").alias("v_u"))
    m = (
        daily.groupBy("event_type")
        .agg(
            F.round(F.avg(F.col("v_u").cast("double")), 0)
            .cast("long")
            .alias("mu_u"),
            F.round(F.stddev_samp(F.col("v_u").cast("double")), 0)
            .cast("long")
            .alias("sigma_u"),
        )
        .filter(F.col("sigma_u") > 0)
    )
    seq = daily.join(m, "event_type")
    schema = (
        "event_type string, day timestamp, sigma_u long, "
        "s_hi_n long, s_lo_n long"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        # exact integer recurrence in 1e-6 units, denominator 2*sigma_u —
        # Python ints, so no cumulative float exists to drift or to land
        # a display round on a half boundary
        pdf = pdf.sort_values("d").reset_index(drop=True)
        mu_u = int(pdf["mu_u"].iloc[0])
        sigma_u = int(pdf["sigma_u"].iloc[0])
        s_hi = s_lo = 0
        out = []
        et = pdf["event_type"].iloc[0]
        for d, v_u in zip(pdf["d"].to_numpy(), pdf["v_u"].to_numpy()):
            v_u = int(v_u)
            s_hi = max(0, s_hi + 2 * (v_u - mu_u) - _CUSUM_K2 * sigma_u)
            s_lo = max(0, s_lo + 2 * (mu_u - v_u) - _CUSUM_K2 * sigma_u)
            out.append((et, d, sigma_u, s_hi, s_lo))
        df = pd.DataFrame(
            out,
            columns=["event_type", "day", "sigma_u", "s_hi_n", "s_lo_n"],
        )
        df["day"] = pd.to_datetime(df["day"])
        return df

    # display + alarm in BIGINT expr, textually mirroring the oracle:
    # integer half-away 4dp of the nonnegative rational S/(2*sigma_u),
    # alarm S > _CUSUM_H2*sigma_u exact (ANSI raises, not wraps, if the
    # documented |S|*20000 <= 8e18 bound — ~13% under BIGINT max, see
    # the docstring — were ever exceeded)
    folded = seq.groupBy("event_type").applyInPandas(fold, schema)
    return folded.select(
        "event_type",
        "day",
        (
            F.expr("(s_hi_n * 20000 + 2 * sigma_u) div (4 * sigma_u)")
            / F.lit(10_000.0)
        ).alias("cusum_hi"),
        (
            F.expr("(s_lo_n * 20000 + 2 * sigma_u) div (4 * sigma_u)")
            / F.lit(10_000.0)
        ).alias("cusum_lo"),
        (
            (F.col("s_hi_n") > _CUSUM_H2 * F.col("sigma_u"))
            | (F.col("s_lo_n") > _CUSUM_H2 * F.col("sigma_u"))
        ).alias("is_changepoint"),
    )


_HLL_SLIDE_DAYS = 7


def _hll_sliding_oracle() -> str:
    from ..operators.sketch import hll_sliding_oracle_sql

    return hll_sliding_oracle_sql("events", "user_id", "ts", _HLL_SLIDE_DAYS)


@register(
    "hll_sliding_7d_users",
    oracle=_hll_sliding_oracle(),
    doc="SLIDING-WINDOW sketch merge — the window form of HLL "
    "mergeability (hll_mergeable_rollup is the group form): per-day "
    "64-cell register tables, max-merged per bucket over a trailing "
    f"{_HLL_SLIDE_DAYS}-day RANGE frame, estimated per day, exact "
    "windowed distinct joined beside for the error budget. This is how "
    "a 100 TB rolling-uniques dashboard works: the window walk touches "
    "|days|x64 register cells — facts are scanned ONCE to build day "
    "registers, never per window position (contrast "
    "rolling_7d_active_users, which re-expands the (day,user) set). "
    "Register merge, harmonic sum (exact powers of two), and the "
    "small-range correction replay bit-for-bit in SQL.",
)
def hll_sliding_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import HLL_ALPHA, HLL_M, hll_registers_by

    ev = load_table(spark, sf_dir, "events")
    keys = ev.select(F.to_date("ts").alias("d"), "user_id")
    day_regs = hll_registers_by(keys, "user_id", "d")  # (grp=d, bucket, m_j)
    days = keys.select("d").distinct()
    buckets = spark.range(HLL_M).select(F.col("id").alias("bucket"))
    # CROSSJOIN: fixed HLL_M-row bucket frame onto the distinct-day dim
    grid = days.crossJoin(F.broadcast(buckets))
    filled = grid.join(
        day_regs,
        (grid["d"] == day_regs["grp"]) & (grid["bucket"] == day_regs["bucket"]),
        "left",
    ).select(
        grid["d"], grid["bucket"], F.coalesce("m_j", F.lit(0)).alias("m_j")
    )
    w_merge = (
        Window.partitionBy("bucket")
        .orderBy(F.datediff("d", F.lit("1970-01-01")))
        .rangeBetween(-(_HLL_SLIDE_DAYS - 1), 0)
    )
    merged = filled.select(
        "d", "bucket", F.max("m_j").over(w_merge).alias("mm")
    )
    agg = merged.groupBy("d").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mm"))).alias("s"),
        F.count_if(F.col("mm") == 0).alias("v"),
    )
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / F.col("s")
    est = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("v") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v")),
    ).otherwise(raw)
    ests = agg.select("d", F.round(est, 4).alias("est_distinct"))
    exact = (
        F.broadcast(days.select(F.col("d").alias("ed")))
        .join(
            ev.select(F.to_date("ts").alias("d"), "user_id"),
            (F.col("d") >= F.expr(f"ed - INTERVAL {_HLL_SLIDE_DAYS - 1} DAYS"))
            & (F.col("d") <= F.col("ed")),
        )
        .groupBy("ed")
        .agg(F.count_distinct("user_id").alias("exact_distinct"))
    )
    return ests.join(exact, ests["d"] == exact["ed"]).select(
        F.col("d").cast("timestamp").alias("day"),
        "est_distinct",
        "exact_distinct",
    )


# --------------------------------------------------------------------------
# round-10 bank: label propagation + Bellman-Ford on the co-activity graph
# --------------------------------------------------------------------------

_LPA_K = 3


def _lpa_oracle() -> str:
    """Unrolled-CTE replay of the three synchronous LPA rounds: the
    (count DESC, label ASC) argmax is pure integer arithmetic, so every
    iteration is bit-identical across engines."""
    ctes = [
        _TRIANGLE_EDGES_SQL.strip(),
        """d2 AS (
            SELECT u AS src, v AS dst FROM edges
            UNION ALL
            SELECT v, u FROM edges
        )""",
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM d2)",
    ]
    for i in range(1, _LPA_K + 1):
        ctes.append(f"""n{i} AS (
            SELECT d.src, l.label, CAST(count(*) AS BIGINT) AS c
            FROM d2 d JOIN l{i - 1} l ON d.dst = l.node
            GROUP BY 1, 2
        )""")
        ctes.append(f"""l{i} AS (
            SELECT src AS node, label FROM (
                SELECT src, label, row_number() OVER (
                    PARTITION BY src ORDER BY c DESC, label) AS rn
                FROM n{i})
            WHERE rn = 1
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT CAST(label AS BIGINT) AS community,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(node) AS BIGINT) AS node_sum
    FROM l{_LPA_K} GROUP BY 1
    """
    )


@register(
    "label_propagation_3iter",
    oracle=_lpa_oracle(),
    doc="community detection on the shared degree-capped co-activity "
    "graph (the triangle/BFS/pagerank substrate): three synchronous "
    "label-propagation rounds via operators/graph.py::label_propagation, "
    "made fully deterministic by the (count DESC, label ASC) argmax "
    "tie-break - pure integer arithmetic, so the unrolled-CTE oracle "
    "replays every iteration bit-for-bit. Output certifies the complete "
    "final assignment via per-community sizes + node-id sums. Scale "
    "shape per round: one vertex-keyed equi-join + one count groupBy + "
    "a per-node argmax window bounded by the degree cap - the pagerank "
    "shuffle pattern, no vertex-sized broadcast anywhere.",
)
def label_propagation_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation

    edges = _capped_user_edges(spark, sf_dir)
    # PERSIST: the symmetrized degree-capped edge list (2x the capped
    # edge count - linear in users by the cap), traversed once per LPA
    # iteration (the pagerank pattern); session-LRU lifetime
    directed = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(
            edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        .persist()
    )
    labels = label_propagation(directed, iters=_LPA_K)
    return labels.groupBy("label").agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum("node").cast("long").alias("node_sum"),
    ).select(
        F.col("label").cast("long").alias("community"),
        "n_nodes",
        "node_sum",
    )


_BF_COST = 1_000_000


def _bf_oracle() -> str:
    """Unrolled-CTE replay of the three Bellman-Ford relaxations:
    min-plus over integers, every distance exact."""
    ctes = [
        _TRIANGLE_EDGES_SQL.strip(),
        f"""wdir AS (
            SELECT u AS src, v AS dst, {_BF_COST} // shared AS cost
            FROM edges_w
            UNION ALL
            SELECT v, u, {_BF_COST} // shared FROM edges_w
        )""",
        "s AS (SELECT min(src) AS sid FROM wdir)",
        "d0 AS (SELECT sid AS node, CAST(0 AS BIGINT) AS dist FROM s)",
    ]
    for i in range(1, 4):
        ctes.append(f"""r{i} AS (
            SELECT e.dst AS node,
                   CAST(min(d.dist + e.cost) AS BIGINT) AS dist
            FROM d{i - 1} d JOIN wdir e ON e.src = d.node
            GROUP BY 1
        )""")
        ctes.append(f"""d{i} AS (
            SELECT node, CAST(min(dist) AS BIGINT) AS dist
            FROM (SELECT * FROM d{i - 1} UNION ALL SELECT * FROM r{i})
            GROUP BY node
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT CAST(node AS BIGINT) AS node, dist FROM d3"
    )


@register(
    "bellman_ford_3relax",
    oracle=_bf_oracle(),
    doc="weighted shortest paths on the SAME degree-capped co-activity "
    "graph the triangle/BFS/LPA queries ride (the weighted sibling of "
    f"bfs_hops_user_graph): edge cost = {_BF_COST} div shared (stronger "
    "co-activity = cheaper), three Bellman-Ford relaxations from the "
    "smallest user id via operators/graph.py::bellman_ford_relax. "
    "Min-plus over integers - every distance exact, the oracle unrolls "
    "the three relaxations over the shared edges_w CTE. Unreached nodes "
    "are absent (the frontier-growth formulation), matching both "
    "engines. Scale shape per round: one vertex-keyed equi-join + one "
    "min groupBy, lineage truncated per round by localCheckpoint inside "
    "the operator (the connected_components discipline).",
)
def bellman_ford_3relax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import bellman_ford_relax

    edges_w = _capped_user_edges_weighted(spark, sf_dir)  # persisted there
    cost = F.expr(f"{_BF_COST} div shared").cast("long")
    wdir = edges_w.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), cost.alias("cost")
    ).unionByName(
        edges_w.select(
            F.col("v").alias("src"),
            F.col("u").alias("dst"),
            cost.alias("cost"),
        )
    )
    src = wdir.agg(F.min("src").alias("sid"))
    dist = src.select(
        F.col("sid").alias("node"), F.lit(0).cast("long").alias("dist")
    )
    dist = bellman_ford_relax(wdir, dist, iters=3)
    return dist.select(F.col("node").cast("long").alias("node"), "dist")


# --------------------------------------------------------------------------
# Round-11 registrations (promoted from the round-11 preview bank).
# Parity pairs proven in tests/test_round11_previews.py across rounds
# 9-10 including the perturbed-testdata rehearsals — this move is
# mechanical. Reference has no counterpart (its ETL ends at a star
# schema); these extend the warehouse-analytics tier.
# --------------------------------------------------------------------------


_RFM_ORACLE = """
    WITH p AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ), per_user AS (
        SELECT user_id,
               CAST(date_diff('day', max(d),
                    (SELECT max(d) FROM p)) AS BIGINT) AS r_days,
               CAST(count(*) AS BIGINT) AS f_cnt,
               CAST(sum(cents) AS BIGINT) AS m_cents
        FROM p GROUP BY user_id
    ), ranked AS (
        SELECT *,
               row_number() OVER (ORDER BY r_days NULLS LAST,
                                  user_id) AS rr,
               row_number() OVER (ORDER BY f_cnt DESC, user_id) AS rf,
               row_number() OVER (ORDER BY m_cents DESC, user_id) AS rm,
               count(*) OVER () AS n
        FROM per_user
    )
    SELECT user_id, r_days, f_cnt, m_cents,
           CAST((4 * rr + n - 1) // n AS BIGINT) AS r_q,
           CAST((4 * rf + n - 1) // n AS BIGINT) AS f_q,
           CAST((4 * rm + n - 1) // n AS BIGINT) AS m_q,
           CAST(((4 * rr + n - 1) // n) * 100
                + ((4 * rf + n - 1) // n) * 10
                + ((4 * rm + n - 1) // n) AS BIGINT) AS rfm_code
    FROM ranked
"""


@register(
    "rfm_quartile_scores",
    oracle=_RFM_ORACLE,
    doc="classic RFM segmentation over purchase events, all-integer: "
    "recency in whole days vs the global last purchase date, "
    "frequency as a count, monetary as per-event cents (each value "
    "quantized ONCE) summed exactly, and each quartile as the pure "
    "rank formula ceil(4r/n) = (4r + n - 1) div n — no NTILE, no "
    "interpolation. The ranking windows run over the USER dimension "
    "(|users| rows, orders of magnitude below the fact table) — "
    "still a frame that GROWS with the data, so the exact global "
    "row_numbers are the certified baseline form; the 100 TB path "
    "computes the three quartile boundaries by histogram-rank "
    "selection (operators/calibrate.py, the registered "
    "rfm_segmentation_scaled pattern) and assigns scores with a "
    "broadcast range join, never sorting the user frame in one task. "
    "Reference has no counterpart.",
)
def rfm_quartile_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    p = e.select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    per_user = p.groupBy("user_id").agg(
        F.max("d").alias("last_d"),
        F.count("*").cast("long").alias("f_cnt"),
        F.sum("cents").cast("long").alias("m_cents"),
    )
    # max of per-user maxes == global max: a |users|-row aggregate
    # instead of a second fact scan
    gmax = per_user.agg(F.max("last_d").alias("gmax_d"))
    # CROSSJOIN: 1-row global-max frame fans out onto the user dim
    per_user = per_user.crossJoin(F.broadcast(gmax)).select(
        "user_id",
        F.datediff("gmax_d", "last_d").cast("long").alias("r_days"),
        "f_cnt",
        "m_cents",
    )
    rr = Window.orderBy(F.asc_nulls_last("r_days"), "user_id")
    rf = Window.orderBy(F.desc("f_cnt"), "user_id")
    rm = Window.orderBy(F.desc("m_cents"), "user_id")
    ranked = (
        per_user.withColumn("rr", F.row_number().over(rr))
        .withColumn("rf", F.row_number().over(rf))
        .withColumn("rm", F.row_number().over(rm))
        .withColumn("n", F.count("*").over(Window.partitionBy()))
    )
    q = lambda c: F.expr(f"(4 * {c} + n - 1) div n").cast("long")
    return ranked.select(
        "user_id",
        "r_days",
        "f_cnt",
        "m_cents",
        q("rr").alias("r_q"),
        q("rf").alias("f_q"),
        q("rm").alias("m_q"),
        (q("rr") * 100 + q("rf") * 10 + q("rm"))
        .cast("long")
        .alias("rfm_code"),
    )


def _hll_est_u_col(s_col, v_col):
    """The ONE sketch.py raw estimator, quantized once into 1e-4 units."""
    from ..operators.sketch import hll_raw_est_col

    return (
        F.round(hll_raw_est_col(s_col, v_col) * 10000, 0).cast("long")
    )


def _hll_intersection_oracle() -> str:
    from ..operators.sketch import hll_filled_sql_stages, hll_raw_est_sql

    est_u = (
        f"CAST(round({hll_raw_est_sql()} * 10000, 0) AS BIGINT)"
    )
    return f"""
    WITH {hll_filled_sql_stages("events", "user_id", "event_type")}, agg AS (
        SELECT grp, sum(pow(2.0, -m_j)) AS s,
               count(*) FILTER (WHERE m_j = 0) AS v
        FROM filled GROUP BY 1
    ), est AS (
        SELECT grp, {est_u} AS e_u FROM agg
    ), pagg AS (
        SELECT a.grp AS type_a, b.grp AS type_b,
               sum(pow(2.0, -greatest(a.m_j, b.m_j))) AS s,
               count(*) FILTER (WHERE greatest(a.m_j, b.m_j) = 0) AS v
        FROM filled a JOIN filled b
          ON a.bucket = b.bucket AND a.grp < b.grp
        GROUP BY 1, 2
    ), uest AS (
        SELECT type_a, type_b, {est_u} AS uu_u FROM pagg
    ), sets AS (
        SELECT DISTINCT event_type AS grp, user_id FROM events
    ), sizes AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n FROM sets GROUP BY 1
    ), inter AS (
        SELECT a.grp AS type_a, b.grp AS type_b,
               CAST(count(*) AS BIGINT) AS n_inter
        FROM sets a JOIN sets b
          ON a.user_id = b.user_id AND a.grp < b.grp
        GROUP BY 1, 2
    )
    SELECT u.type_a, u.type_b,
           ea.e_u AS est_a_u, eb.e_u AS est_b_u, u.uu_u AS est_union_u,
           CAST(ea.e_u + eb.e_u - u.uu_u AS BIGINT) AS est_inter_u,
           sa.n AS n_a, sb.n AS n_b,
           CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter
    FROM uest u
    JOIN est ea ON u.type_a = ea.grp
    JOIN est eb ON u.type_b = eb.grp
    JOIN sizes sa ON u.type_a = sa.grp
    JOIN sizes sb ON u.type_b = sb.grp
    LEFT JOIN inter i ON u.type_a = i.type_a AND u.type_b = i.type_b
    """


@register(
    "hll_intersection_audit",
    oracle=_hll_intersection_oracle(),
    doc="mergeable-sketch intersection: HLL registers cannot intersect "
    "natively, so the estimate is inclusion-exclusion over the "
    "pairwise register max-merge — the standard trick, audited here "
    "against the EXACT intersection in the same result. Every "
    "estimate is quantized ONCE into 1e-4 integer units, so the "
    "inclusion-exclusion subtraction is exact integer arithmetic "
    "(three rounded doubles subtracted as floats would re-enter the "
    "multi-step re-round hazard class). Hash, rank ladder, and "
    "corrections are the proven operators/sketch.py pipeline, "
    "constants interpolated from the one source of truth. Scale: "
    "after the one fact-scan register agg, every frame is "
    "|types| x 2^p sketch cells — the pairwise merge is "
    "bucket-equi-keyed over SF-free registers, and the exact side is "
    "the same distinct-shuffle any exact distinct-count pays. "
    "Reference has no counterpart.",
)
def hll_intersection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import (
        hll_filled_registers_by,
        hll_registers_by,
        hll_sv_agg,
    )

    e = load_table(spark, sf_dir, "events")
    regs = hll_registers_by(e, "user_id", "event_type")
    # PERSIST: |types| x 2^p filled register cells (sketch-sized,
    # SF-free; the shared sketch.py grid-fill stage), read by the
    # per-type estimates AND both sides of the pairwise max-merge;
    # session-LRU lifetime
    filled = hll_filled_registers_by(regs).persist()
    agg = hll_sv_agg(filled, "grp")
    est = agg.select(
        "grp", _hll_est_u_col(F.col("s"), F.col("v")).alias("e_u")
    )
    fa, fb = filled.alias("fa"), filled.alias("fb")
    merged = fa.join(
        fb,
        (F.col("fa.bucket") == F.col("fb.bucket"))
        & (F.col("fa.grp") < F.col("fb.grp")),
    ).select(
        F.col("fa.grp").alias("type_a"),
        F.col("fb.grp").alias("type_b"),
        F.greatest(F.col("fa.m_j"), F.col("fb.m_j")).alias("m_j"),
    )
    pagg = hll_sv_agg(merged, "type_a", "type_b")
    uest = pagg.select(
        "type_a", "type_b", _hll_est_u_col(F.col("s"), F.col("v")).alias("uu_u")
    )
    # PERSIST: |types| x |users| distinct (grp, user) pairs — the
    # user-dimension frame the exact side needs anyway; read by the
    # sizes agg AND both sides of the exact-intersection join;
    # session-LRU lifetime
    sets = e.select(
        F.col("event_type").alias("grp"), "user_id"
    ).distinct().persist()
    sizes = sets.groupBy("grp").agg(F.count("*").cast("long").alias("n"))
    sa, sb = sets.alias("sa"), sets.alias("sb")
    inter = (
        sa.join(
            sb,
            (F.col("sa.user_id") == F.col("sb.user_id"))
            & (F.col("sa.grp") < F.col("sb.grp")),
        )
        .groupBy(
            F.col("sa.grp").alias("type_a"), F.col("sb.grp").alias("type_b")
        )
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    ea = est.select(F.col("grp").alias("type_a"), F.col("e_u").alias("est_a_u"))
    eb = est.select(F.col("grp").alias("type_b"), F.col("e_u").alias("est_b_u"))
    na = sizes.select(F.col("grp").alias("type_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("grp").alias("type_b"), F.col("n").alias("n_b"))
    return (
        uest.join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .join(F.broadcast(inter), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "est_a_u",
            "est_b_u",
            F.col("uu_u").alias("est_union_u"),
            (F.col("est_a_u") + F.col("est_b_u") - F.col("uu_u"))
            .cast("long")
            .alias("est_inter_u"),
            "n_a",
            "n_b",
            F.coalesce("n_inter", F.lit(0)).cast("long").alias("n_inter"),
        )
    )


@register(
    "acf_daily_counts",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
        FROM daily
    ), r AS (
        SELECT d, n * c - s AS res FROM daily, stats
    ), den AS (
        SELECT CAST(sum(res * res) AS BIGINT) AS den FROM r
    ), lags AS (
        SELECT unnest(generate_series(1, 3)) AS lag
    ), num AS (
        SELECT l.lag,
               CAST(sum(a.res * b.res) AS BIGINT) AS num,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM lags l
        JOIN r a ON TRUE
        JOIN r b ON b.d = a.d + to_days(CAST(l.lag AS INTEGER))
        GROUP BY l.lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, num, den, n_pairs,
           round(num * 1.0 / den, 6) + 0.0 AS acf
    FROM num, den
    WHERE den > 0
    """,
    doc="sample autocorrelation of the daily event-count series at "
    "lags 1..3 (load-seasonality / burst-detection read — the "
    "time-series companion to mann_kendall_trend and resample_ohlc). "
    "ZERO quantization anywhere: with n days and S = sum of counts, "
    "the scaled residual r_d = n*c_d - S is an exact integer "
    "(= n*(c_d - mean)), both the lag products and the denominator are "
    "integer sums, and the n^2 factor cancels in the ratio — the one "
    "display round is the accepted single-ratio class (+0.0: ACF can "
    "be negative). Pairs are DATE-joined (d, d+k), so a missing day "
    "contributes no pair on either engine. Scale: facts reduce to the "
    "|days|-row daily series in one groupBy; the residual frame, the "
    "3-row lag grid, and the lag equi-join are all dimension-sized — "
    "SF enters only through the one fact scan. Overflow: |res| <= "
    "n*max_c and den <= n^3*max_c^2, inside BIGINT while max_c < "
    "sqrt(9.2e18/n^3) (~380k events/day at n = 400 days); beyond that, "
    "pre-scale counts by a fixed power of 10 (ACF is scale-invariant) "
    "or widen the products to DECIMAL(38,0) on both engines. "
    "Reference has no counterpart.",
)
def acf_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    stats = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    # CROSSJOIN: 1-row global (n, S) stats frame onto the |days|-row
    # daily series — bounded independently of data scale
    # PERSIST: |days|-row exact-residual frame — read by the
    # denominator agg AND the three lag joins; session-LRU lifetime
    r = daily.crossJoin(F.broadcast(stats)).select(
        "d", (F.col("n") * F.col("c") - F.col("s")).alias("res")
    ).persist()
    den = r.agg(F.sum(F.col("res") * F.col("res")).cast("long").alias("den"))
    lags = r.sparkSession.range(1, 4).select(F.col("id").alias("lag"))
    b = r.select(F.col("d").alias("bd"), F.col("res").alias("bres"))
    # CROSSJOIN: fixed 3-row lag grid x the |days|-row residual dim,
    # immediately equi-joined on the shifted date — both sides bounded
    num = (
        lags.crossJoin(r)
        .join(b, F.col("bd") == F.expr("date_add(d, CAST(lag AS INT))"))
        .groupBy("lag")
        .agg(
            F.sum(F.col("res") * F.col("bres")).cast("long").alias("num"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )
    # CROSSJOIN: 1-row denominator total onto the 3-row lag results
    return (
        num.crossJoin(F.broadcast(den))
        .filter(F.col("den") > 0)
        .select(
            F.col("lag").cast("long").alias("lag"),
            "num",
            "den",
            "n_pairs",
            (F.round(F.col("num") * 1.0 / F.col("den"), 6) + F.lit(0.0))
            .alias("acf"),
        )
    )


@register(
    "mann_kendall_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), s AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN b.c > a.c THEN 1
                             WHEN b.c < a.c THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
        GROUP BY 1
    ), n AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1
    ), ties AS (
        SELECT event_type,
               CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                    AS BIGINT) AS tie_term
        FROM (
            SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
            FROM daily GROUP BY 1, 2
        ) GROUP BY 1
    )
    SELECT s.event_type, n.n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                - t.tie_term AS BIGINT) AS var18,
           round((s.s_stat - CAST(sign(s.s_stat) AS BIGINT))
                 / sqrt((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                         - t.tie_term) / 18.0), 6) + 0.0 AS z
    FROM s JOIN n USING (event_type) JOIN ties t USING (event_type)
    WHERE n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie_term > 0
    """,
    doc="Mann-Kendall nonparametric trend test over each event type's "
    "daily-count series: S = sum_{i<j} sign(c_j - c_i) by date order. "
    "S and the tie-corrected variance are EXACT INTEGERS — var18 = "
    "n(n-1)(2n+5) - sum_t t(t-1)(2t+5) carries the /18 into the one "
    "float step, z = (S - sign(S)) / sqrt(var18/18.0); sqrt is IEEE "
    "correctly-rounded (not a libm approximation), so z is "
    "bit-identical across engines on identical integer inputs; single "
    "display round + 0.0 (z can be negative). All-tied series "
    "(var18 = 0) are excluded symmetrically on both engines. Scale: "
    "the facts reduce to the |types| x |days| daily series in one "
    "groupBy; the |days|^2-per-type pair self-join, the tie groups, "
    "and n all run on that dimension frame, never on the facts (a "
    "year of days is ~365 rows per type — the acf_daily_counts "
    "frame class). Companion of acf_daily_counts: ACF measures "
    "autocorrelation shape, Mann-Kendall gives the distribution-free "
    "monotone-trend verdict a drift monitor alerts on. Sibling of "
    "distribution_drift_metrics / cusum_changepoints in the drift "
    "family. Reference has no counterpart (its ETL ends at BI "
    "aggregates, scripts/process_silver_to_gold.py).",
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").cast("long").alias("c"))
        # PERSIST: |types| x |days| daily-count dimension frame (~1e3
        # rows per year-type, SF-free once the calendar saturates) —
        # read by BOTH sides of the pair self-join, the n_days count,
        # and the tie groups; session-LRU lifetime
        .persist()
    )
    a = daily.select(
        F.col("event_type"), F.col("d").alias("da"), F.col("c").alias("ca")
    )
    b = daily.select(
        F.col("event_type"), F.col("d").alias("db"), F.col("c").alias("cb")
    )
    s = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    var18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    )
    return (
        s.join(n, "event_type")
        .join(ties, "event_type")
        .withColumn("var18", var18.cast("long"))
        .filter(F.col("var18") > 0)
        .select(
            "event_type",
            "n_days",
            "s_stat",
            "var18",
            (
                F.round(
                    (F.col("s_stat") - F.signum("s_stat").cast("long"))
                    / F.sqrt(F.col("var18") / 18.0),
                    6,
                )
                + F.lit(0.0)
            ).alias("z"),
        )
    )


# --------------------------------------------------------------------------
# Round-14 registrations (promoted from tests/test_round14_previews.py —
# parity pairs proven across rounds 12-13 including perturbed-testdata
# rehearsals; this move is mechanical per the SURVEY r14 bullet)
# --------------------------------------------------------------------------


@register(
    "sequence_pair_lift",
    oracle="""
    WITH spans AS (
        SELECT user_id, CAST(ts AS DATE) AS day, event_type,
               min(ts) AS mn, max(ts) AS mx
        FROM events GROUP BY 1, 2, 3
    ), n_groups AS (
        SELECT CAST(count(DISTINCT (user_id, day)) AS BIGINT) AS n_g
        FROM spans
    ), type_n AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
        FROM spans GROUP BY 1
    ), pair_n AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM spans a JOIN spans b
          ON a.user_id = b.user_id AND a.day = b.day
         AND a.event_type != b.event_type AND a.mn < b.mx
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_ab,
           ta.n_t AS n_a, tb.n_t AS n_b, g.n_g,
           round(p.n_ab * g.n_g * 1.0 / (ta.n_t * tb.n_t), 6) AS lift6
    FROM pair_n p
    JOIN type_n ta ON ta.event_type = p.type_a
    JOIN type_n tb ON tb.event_type = p.type_b
    CROSS JOIN n_groups g
    """,
    doc="order-sensitive event-pair lift over (user, day) groups — the "
    "gapped generalization of funnel_3step_strict: for every ordered "
    "type pair (a, b), in how many groups does some a strictly precede "
    "some b, and the lift of that co-occurrence vs independence "
    "(n_ab * n_groups / (n_a * n_b)). 'a precedes b' = min_ts(a) < "
    "max_ts(b) within the group — an exact reformulation needing only "
    "per-(group, type) min/max, so the pair stage runs over the "
    "|groups x types| span reduction, never raw events; timestamp "
    "ties are excluded by the strict < on both engines. All counts "
    "are exact BIGINTs. Overflow envelope: the lift6 numerator "
    "n_ab * n_g is a BIGINT x BIGINT product evaluated BEFORE the "
    "float cast on both engines; since n_ab <= n_g, n_ab*n_g < 2^63 "
    "holds up to n_g ~ 3.0e9 (user, day) groups — far past any "
    "testdata scale, but non-ANSI Spark would WRAP silently where "
    "DuckDB raises, so past that widen the product to DECIMAL(38,0) "
    "on both engines (the basket_pair_rules escape hatch). "
    "lift6 is the accepted single-ratio round: "
    "the denominator n_a*n_b is a product of CORPUS-SCALE type "
    "marginals (thousands of spans per type), so landing on the "
    "2^a*5^b>=128 half-boundary grid needs every odd-prime factor "
    "cancelled by the numerator — the same accepted class as the "
    "registered ks6 = ks_num/(n_a*n_b) ratio, with the multi-seed "
    "stress as the standing canary (contrast basket_pair_rules, "
    "whose <=60-bounded marginals made the grid reachable and earned "
    "integer hardening; see the r14 audit note on interarrival_cv). "
    "Scale: one fact groupBy builds the span "
    "frame; the pair self-join is keyed on (user_id, day) — a "
    "co-partitioned shuffle whose per-group fan-out is bounded by "
    "|types|^2 (a fixed event vocabulary); the marginal joins "
    "broadcast |types|-row dims. Reference has no counterpart (its "
    "ETL ends at BI aggregates, scripts/process_silver_to_gold.py).",
)
def sequence_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    spans = (
        e.groupBy(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            "event_type",
        )
        .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
        # PERSIST: per-(user, day, type) span reduction — at most one
        # row per (group, type), ~|events| / per-group-multiplicity
        # rows at ~44 B each (3 keys + 2 timestamps), well under the
        # fact bytes — read FOUR times: the group census, the type
        # marginals, and both pair-join sides; session-LRU lifetime
        .persist()
    )
    n_groups = spans.select("user_id", "day").distinct().agg(
        F.count("*").cast("long").alias("n_g")
    )
    type_n = spans.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_t")
    )
    a = spans.select(
        "user_id", "day", F.col("event_type").alias("type_a"),
        F.col("mn").alias("mn_a"),
    )
    b = spans.select(
        "user_id", "day", F.col("event_type").alias("type_b"),
        F.col("mx").alias("mx_b"),
    )
    pair_n = (
        a.join(b, ["user_id", "day"])
        .filter(
            (F.col("type_a") != F.col("type_b"))
            & (F.col("mn_a") < F.col("mx_b"))
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    # |types|-row marginal dims — a fixed event-type vocabulary,
    # bounded independently of data scale (the audit rule's dim class)
    ta = type_n.select(
        F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a")
    )
    tb = type_n.select(
        F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b")
    )
    return (
        pair_n.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        # CROSSJOIN: 1-row group-census frame fans onto the <=|types|^2
        # pair dim — bounded independently of data scale
        .crossJoin(F.broadcast(n_groups))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            "n_g",
            F.round(
                F.col("n_ab") * F.col("n_g") * 1.0
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift6"),
        )
    )


_KCORE_K = 3
_KCORE_ROUNDS = 3


def _kcore_oracle_sql() -> str:
    """Unrolled three-stage CTE twin of the Spark peel loop — pure
    integer degree arithmetic, so each round replays exactly."""
    stages = []
    prev = "edges"
    for r in range(1, _KCORE_ROUNDS + 1):
        stages.append(f"""
        deg{r} AS (
            SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
                SELECT u AS node FROM {prev}
                UNION ALL
                SELECT v FROM {prev}
            ) GROUP BY 1
        ), surv{r} AS (
            SELECT node FROM deg{r} WHERE d >= {_KCORE_K}
        ), e{r} AS (
            SELECT e.u, e.v FROM {prev} e
            JOIN surv{r} a ON a.node = e.u
            JOIN surv{r} b ON b.node = e.v
        )""")
        prev = f"e{r}"
    rows = " UNION ALL ".join(
        f"""SELECT CAST({r} AS BIGINT) AS round,
             (SELECT CAST(count(*) AS BIGINT) FROM surv{r}) AS n_nodes,
             (SELECT CAST(count(*) AS BIGINT) FROM e{r}) AS n_edges,
             (SELECT CAST(coalesce(sum(node), 0) AS BIGINT)
              FROM surv{r}) AS node_sum"""
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    return (
        "WITH "
        + _TRIANGLE_EDGES_SQL.strip()
        + ","
        + ",".join(stages)
        + " "
        + rows
    )


@register(
    "kcore_3peel",
    oracle=_kcore_oracle_sql(),
    doc=f"three k-core peeling rounds (k = {_KCORE_K}) on the shared "
    "degree-capped co-activity graph (the triangle/BFS/LPA/"
    "Bellman-Ford substrate, _capped_user_edges): each round drops "
    "every node with current degree < k and keeps only edges between "
    "survivors — the classic dense-collaboration-core extraction, and "
    "the bounded-iteration shape of the full k-core decomposition. "
    "Output is one census row per round (surviving nodes, surviving "
    "edges, node-id checksum) — pure integer degree arithmetic, no "
    "rounding anywhere. Scale (operators/graph.py::kcore_peel_rounds): "
    "each round is one vertex-keyed degree groupBy plus two "
    "semi-join-shaped equi-joins against the persisted survivor set; "
    "localCheckpoint truncates the per-round lineage (the "
    "connected_components discipline) and at most two node-sized "
    "frames are cached at any time. The oracle unrolls three CTE "
    "stages over the same capped edge list. Reference has no "
    "counterpart.",
)
def kcore_3peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore_peel_rounds

    edges = _capped_user_edges(spark, sf_dir)
    out = []
    for r, (surv, cur) in enumerate(
        kcore_peel_rounds(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS), start=1
    ):
        census = surv.agg(
            F.lit(r).cast("long").alias("round"),
            F.count("*").cast("long").alias("n_nodes"),
            F.coalesce(F.sum("node"), F.lit(0)).cast("long").alias(
                "node_sum"
            ),
            # CROSSJOIN: two 1-row census aggregates combine — bounded
        ).crossJoin(
            cur.agg(F.count("*").cast("long").alias("n_edges"))
        ).select("round", "n_nodes", "n_edges", "node_sum")
        out.append(census)
    res = out[0]
    for c in out[1:]:
        res = res.unionByName(c)
    return res


@register(
    "rfm_quartile_scores_scaled",
    oracle="""
    WITH p AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ), per_user AS (
        SELECT user_id,
               CAST(date_diff('day', max(d),
                    (SELECT max(d) FROM p)) AS BIGINT) AS r_days,
               CAST(count(*) AS BIGINT) AS f_cnt,
               CAST(sum(cents) AS BIGINT) AS m_cents
        FROM p GROUP BY user_id
    ), ranked AS (
        -- min-rank quartiles: ties share one score (rank(), not
        -- row_number) — the tie-coherent scale semantics
        SELECT *,
               rank() OVER (ORDER BY r_days) AS kr,
               rank() OVER (ORDER BY f_cnt DESC) AS kf,
               rank() OVER (ORDER BY m_cents DESC) AS km,
               count(*) OVER () AS n
        FROM per_user
    )
    SELECT user_id, r_days, f_cnt, m_cents,
           CAST(1 + (4 * (kr - 1)) // n AS BIGINT) AS r_q,
           CAST(1 + (4 * (kf - 1)) // n AS BIGINT) AS f_q,
           CAST(1 + (4 * (km - 1)) // n AS BIGINT) AS m_q,
           CAST((1 + (4 * (kr - 1)) // n) * 100
                + (1 + (4 * (kf - 1)) // n) * 10
                + (1 + (4 * (km - 1)) // n) AS BIGINT) AS rfm_code
    FROM ranked
    """,
    doc="scale-safe sibling of rfm_quartile_scores (the r11-verdict "
    "rework, closing the last global-orderBy baseline without a "
    "registered scale twin): the baseline ranks the user dimension "
    "with three unpartitioned row_number windows (certified baseline); "
    "this form computes the three quartile boundary VALUES by bucketed "
    "histogram-rank selection (operators/calibrate.py::"
    "desc_rank_boundaries — the rfm_segmentation_scaled machinery) and "
    "assigns scores with broadcast column compares, under tie-COHERENT "
    "min-rank semantics: q(x) = 1 + (4*cnt_better(x)) div n, provably "
    "equal to 1 + #(s in 1..3 : x strictly worse than v_s) with v_s at "
    "better-order rank ceil(s*n/4), because cnt_better(x) >= c <=> x "
    "is strictly worse than v_c (the rfm_segmentation_scaled proof "
    "with k = 4). Recency scores on the NEGATED day count so all three "
    "metrics share the one descending-order selection operator. "
    "Oracle twin uses rank() (min-rank), and ties share a score on "
    "both engines. All outputs are exact integers — no float round "
    "anywhere. Scale: no global sort of the user frame ever happens — "
    "three bucketed-histogram selections (each one groupBy + a "
    "<=n_buckets rollup) replace the three unpartitioned windows; the "
    "assignment scan compares against three broadcast 1-row boundary "
    "pivots. Reference has no counterpart.",
)
def rfm_quartile_scores_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    p = e.select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    per_user = p.groupBy("user_id").agg(
        F.max("d").alias("last_d"),
        F.count("*").cast("long").alias("f_cnt"),
        F.sum("cents").cast("long").alias("m_cents"),
    )
    # 1-row global-max date frame — bounded
    gmax = per_user.agg(F.max("last_d").alias("gmax_d"))
    # CROSSJOIN: 1-row global-max frame fans out onto the user dim
    per_user = (
        per_user.crossJoin(F.broadcast(gmax))
        .select(
            "user_id",
            F.datediff("gmax_d", "last_d").cast("long").alias("r_days"),
            F.col("f_cnt"),
            F.col("m_cents"),
        )
        # neg_r: recency under the shared DESC selection (smaller
        # r_days = better  <=>  larger -r_days)
        .withColumn("neg_r", (-F.col("r_days")).cast("long"))
        # PERSIST: |users|-row aggregate (4 BIGINTs + key, ~40 B/row) —
        # read by the count, three histogram builds, and the
        # assignment scan; session-LRU lifetime
        .persist()
    )
    n_row = per_user.agg(F.count("*").cast("long").alias("n"))

    def quartile_bounds(metric: str, prefix: str) -> DataFrame:
        """1-row frame with the 3 better-order-rank boundary values."""
        targets = (
            per_user.sparkSession.range(1, 4)
            .select(F.col("id").cast("long").alias("_tag"))
            # CROSSJOIN: 1-row count frame onto the 3-row tag frame
            .crossJoin(F.broadcast(n_row))
            # c_s = ceil(s*n/4) as pure integers
            .withColumn("cut", F.expr("(_tag * n + 3) div 4").cast("long"))
        )
        bnd = calibrate.desc_rank_boundaries(
            per_user.select(metric), metric, targets, "cut", "v"
        )
        return bnd.agg(
            *[
                F.max(F.when(F.col("_tag") == s, F.col("v"))).alias(
                    f"{prefix}{s}"
                )
                for s in range(1, 4)
            ]
        )

    def q(metric: str, prefix: str):
        c = F.lit(1)
        for s in range(1, 4):
            c = c + F.when(
                F.col(metric) < F.col(f"{prefix}{s}"), 1
            ).otherwise(0)
        return c.cast("long")

    scored = (
        # CROSSJOIN: three 1-row quartile-boundary pivots (3 boundary
        # columns each) — bounded
        per_user.crossJoin(F.broadcast(quartile_bounds("neg_r", "rv")))
        .crossJoin(F.broadcast(quartile_bounds("f_cnt", "fv")))
        .crossJoin(F.broadcast(quartile_bounds("m_cents", "mv")))
    )
    return scored.select(
        "user_id",
        "r_days",
        "f_cnt",
        "m_cents",
        q("neg_r", "rv").alias("r_q"),
        q("f_cnt", "fv").alias("f_q"),
        q("m_cents", "mv").alias("m_q"),
        (q("neg_r", "rv") * 100 + q("f_cnt", "fv") * 10
         + q("m_cents", "mv")).cast("long").alias("rfm_code"),
    )


# --------------------------------------------------------------------------
# Round-15 registrations (promoted from tests/test_round15_previews.py —
# parity pairs proven in round 6 and rehearsed on three perturbed variants
# + the 120/120 multi-seed stress end-of-r14; this move is mechanical per
# the SURVEY r15 bullet)
# --------------------------------------------------------------------------

_CMJ_W = 65536
_CMJ_D = 4
# D INDEPENDENT affine hashes (a_d*k + c_d) mod p mod W: distinct
# multipliers AND additive constants per depth row (the minhash_coeffs
# pattern) — a shared base hash with additive offsets would leave the
# rows near-fully correlated and collapse min-over-depth to depth 1
# (caught by round-6 review). Constants: the house Knuth + xxhash
# mod-p-reduced multipliers and two classic LCG multipliers.
_CMJ_AS = [sampling.HASH_A_RED, sampling.HASH_B_RED, 48271, 69621]
_CMJ_CS = [11, sampling.HASH_C, 12345, 789221]
_CMJ_AS_SQL = "[" + ", ".join(str(a) for a in _CMJ_AS) + "]"
_CMJ_CS_SQL = "[" + ", ".join(str(c) for c in _CMJ_CS) + "]"


def _cmj_w_col(key: F.Column, d: F.Column) -> F.Column:
    """Depth-d count-min cell index for ``key``: row-independent affine
    hash mod W. (key%p)*a_d + c_d < 2^62 under ANSI (both factors
    < 2^31), matching the oracle's integer arithmetic bit-for-bit."""
    a_d = F.element_at(
        F.array(*[F.lit(a) for a in _CMJ_AS]), (d + 1).cast("int")
    )
    c_d = F.element_at(
        F.array(*[F.lit(c) for c in _CMJ_CS]), (d + 1).cast("int")
    )
    return (
        ((key.cast("long") % sampling.HASH_P) * a_d + c_d)
        % sampling.HASH_P
    ) % _CMJ_W


@register(
    "countmin_join_size",
    oracle=f"""
    WITH lags AS (
        SELECT unnest(generate_series(0, {_CMJ_D - 1})) AS d
    ), ca AS (
        SELECT d.d,
               (((o_orderkey % {sampling.HASH_P})
                 * ({_CMJ_AS_SQL})[CAST(d.d + 1 AS INT)]
                 + ({_CMJ_CS_SQL})[CAST(d.d + 1 AS INT)])
                % {sampling.HASH_P}) % {_CMJ_W} AS w,
               CAST(count(*) AS BIGINT) AS c
        FROM orders CROSS JOIN lags d
        GROUP BY 1, 2
    ), cb AS (
        SELECT d.d,
               (((l_orderkey % {sampling.HASH_P})
                 * ({_CMJ_AS_SQL})[CAST(d.d + 1 AS INT)]
                 + ({_CMJ_CS_SQL})[CAST(d.d + 1 AS INT)])
                % {sampling.HASH_P}) % {_CMJ_W} AS w,
               CAST(count(*) AS BIGINT) AS c
        FROM lineitem CROSS JOIN lags d
        GROUP BY 1, 2
    ), est AS (
        SELECT a.d, CAST(sum(a.c * b.c) AS BIGINT) AS inner_prod
        FROM ca a JOIN cb b ON a.d = b.d AND a.w = b.w
        GROUP BY 1
    ), exact AS (
        SELECT CAST(count(*) AS BIGINT) AS n
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    )
    SELECT CAST({_CMJ_W} AS BIGINT) AS width,
           CAST({_CMJ_D} AS BIGINT) AS depth,
           CAST(min(e.inner_prod) AS BIGINT) AS est_min,
           x.n AS exact_cnt,
           min(e.inner_prod) >= x.n AS overestimate_ok,
           ((2 * min(e.inner_prod) * 1000000 + x.n) // (2 * x.n))
               / 1000000.0 AS ratio6
    FROM est e CROSS JOIN exact x
    GROUP BY x.n
    """,
    doc="join-cardinality estimation via count-min inner product — the "
    f"optimizer-statistics read of the mergeable-sketch family: each "
    f"side's join keys hash into a {_CMJ_D} x {_CMJ_W} sketch and "
    "|orders JOIN lineitem| is estimated as min_d sum_w cA[d,w]*cB[d,w] "
    "(Cormode & Muthukrishnan 2005), audited in the SAME row against "
    "the exact join count with the overestimate contract asserted "
    "(collisions only inflate). ratio6 is integer half-away 1e-6 units "
    "on both engines (the r14 boundary-hazard criterion applied "
    "pre-registration: never a float round of a ratio display). "
    "Overflow envelope: 2*est_min*1e6 < 2^63 holds to est_min ~ 4.6e12 "
    "(est_min ~ |A|*|B|/W + |A JOIN B|, ~2e6 at sf0.1); beyond, widen "
    "to DECIMAL(38,0)/HUGEINT (the EMD pattern). Scale: each sketch is "
    "one fact groupBy into <= D*W = 256k cells REGARDLESS of data "
    "scale — mergeable across partitions by construction — and the "
    "sketch-vs-sketch join is cell-keyed (bounded); the exact-count "
    "join is the audit's cost, paid at test scale only (at 100 TB the "
    "sketch REPLACES that join — that is its point). Reference has no "
    "counterpart (its ETL ends at BI aggregates, "
    "scripts/process_silver_to_gold.py).",
)
def countmin_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lags = spark.range(_CMJ_D).select(F.col("id").alias("d"))

    def sketch(df: DataFrame, key: str) -> DataFrame:
        # CROSSJOIN: fixed D-row depth frame fans onto the fact scan —
        # bounded independently of data scale (D = 4)
        return (
            df.crossJoin(F.broadcast(lags))
            .groupBy("d", _cmj_w_col(F.col(key), F.col("d")).alias("w"))
            .agg(F.count("*").cast("long").alias("c"))
        )

    ca = sketch(o, "o_orderkey")
    cb = sketch(li, "l_orderkey")
    est = (
        ca.alias("a")
        .join(cb.alias("b"), ["d", "w"])
        .groupBy("d")
        .agg(
            F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias(
                "inner_prod"
            )
        )
    )
    exact = o.join(li, o["o_orderkey"] == li["l_orderkey"]).agg(
        F.count("*").cast("long").alias("n")
    )
    return (
        # CROSSJOIN: 1-row exact-count audit frame — bounded
        est.crossJoin(F.broadcast(exact))
        .groupBy("n")
        .agg(F.min("inner_prod").cast("long").alias("est_min"))
        .select(
            F.lit(_CMJ_W).cast("long").alias("width"),
            F.lit(_CMJ_D).cast("long").alias("depth"),
            "est_min",
            F.col("n").alias("exact_cnt"),
            (F.col("est_min") >= F.col("n")).alias("overestimate_ok"),
            # integer half-away 1e-6-unit ratio (see the boundary-
            # hazard note in the doc): never a float round
            (
                F.expr("(2 * est_min * 1000000 + n) div (2 * n)")
                / F.lit(1_000_000.0)
            ).alias("ratio6"),
        )
    )


_HCHANGE_TOP = 20


@register(
    "heavy_change_detect",
    oracle=f"""
    WITH bounds AS (
        SELECT min(CAST(ts AS DATE)) AS mn, max(CAST(ts AS DATE)) AS mx
        FROM events
    ), mid AS (
        SELECT mn + to_days(CAST(date_diff('day', mn, mx) // 2 AS INTEGER))
            AS m
        FROM bounds
    ), halves AS (
        SELECT user_id,
               CAST(sum(CASE WHEN CAST(ts AS DATE) < m.m
                             THEN 1 ELSE 0 END) AS BIGINT) AS cnt1,
               CAST(sum(CASE WHEN CAST(ts AS DATE) >= m.m
                             THEN 1 ELSE 0 END) AS BIGINT) AS cnt2
        FROM events CROSS JOIN mid m
        GROUP BY 1
    ), totals AS (
        SELECT CAST(sum(cnt1) AS BIGINT) AS t1,
               CAST(sum(cnt2) AS BIGINT) AS t2
        FROM halves
    )
    SELECT h.user_id, h.cnt1, h.cnt2,
           CAST(abs(h.cnt1 * t.t2 - h.cnt2 * t.t1) AS BIGINT) AS score
    FROM halves h CROSS JOIN totals t
    WHERE t.t1 > 0 AND t.t2 > 0
    ORDER BY score DESC, h.user_id
    LIMIT {_HCHANGE_TOP}
    """,
    doc="heavy-CHANGE detection (Cormode & Muthukrishnan's deltoids "
    "read, beside the registered Misra-Gries heavy WEIGHT in "
    "heavy_hitters_mergeable): the users whose activity share moved "
    "most between the first and second half of the observed date "
    "range. The change score is the exact cross-multiplied integer "
    "|cnt1*T2 - cnt2*T1| — comparing cnt1/T1 vs cnt2/T2 with ZERO "
    "floats anywhere (no ratio display at all, so the r14 boundary-"
    f"hazard audit passes vacuously); deterministic top-{_HCHANGE_TOP} "
    "by (score DESC, user_id). Overflow envelope: cnt*T < 2^63 needs "
    "cnt*T < 9.2e18 — with cnt <= T this holds to T ~ 3.0e9 events "
    "per half; beyond, widen the products to DECIMAL(38,0) (the "
    "basket_pair_rules escape hatch). Scale: facts reduce to "
    "per-(user, half) counts in ONE fact groupBy; the 1-row midpoint "
    "and totals frames broadcast; TakeOrderedAndProject handles the "
    "top-k (map-side partial top-k, never a global sort). Reference "
    "has no counterpart (its ETL ends at BI aggregates, "
    "scripts/process_silver_to_gold.py).",
)
def heavy_change_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    bounds = e.agg(F.min(d).alias("mn"), F.max(d).alias("mx"))
    mid = bounds.select(
        F.expr(
            "date_add(mn, CAST(datediff(mx, mn) div 2 AS INT))"
        ).alias("m")
    )
    halves = (
        # CROSSJOIN: 1-row date-range midpoint fans onto the fact scan —
        # bounded
        e.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(d < F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("cnt1"),
            F.sum(F.when(d >= F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("cnt2"),
        )
        # PERSIST: per-user half-count aggregate — |users| rows at
        # ~24 B each (one key + two BIGINTs), a fraction of the fact
        # bytes — read TWICE: the 1-row totals aggregate and the
        # scored select (without it the fact scan + groupBy execute
        # once per consumer — the benford r14 double-scan class);
        # session-LRU lifetime
        .persist()
    )
    totals = halves.agg(
        F.sum("cnt1").cast("long").alias("t1"),
        F.sum("cnt2").cast("long").alias("t2"),
    )
    return (
        # CROSSJOIN: 1-row half-totals frame onto the per-user counts —
        # bounded
        halves.crossJoin(F.broadcast(totals))
        .filter((F.col("t1") > 0) & (F.col("t2") > 0))
        .select(
            "user_id",
            "cnt1",
            "cnt2",
            F.abs(
                F.col("cnt1") * F.col("t2") - F.col("cnt2") * F.col("t1")
            )
            .cast("long")
            .alias("score"),
        )
        .orderBy(F.desc("score"), "user_id")
        .limit(_HCHANGE_TOP)
    )


# --------------------------------------------------------------------------
# Multi-touch attribution — time-decay revenue split over prior touches
# --------------------------------------------------------------------------

# 7-day lookback window, in microseconds (events.ts is micro-precision).
_ATTR_WINDOW_US = 7 * 86_400_000_000
# One calendar day in microseconds — the decay step.
_ATTR_DAY_US = 86_400_000_000.0


@register(
    "attribution_time_decay",
    oracle=f"""
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts, epoch_us(ts) AS pus,
               value
        FROM events WHERE event_type = 'purchase'
    ), t AS (
        SELECT user_id, epoch_us(ts) AS tus, event_type AS touch_type
        FROM events WHERE event_type IN ('click', 'view')
    ), j AS (
        SELECT p.pid, p.pts, p.value, t.touch_type,
               power(2.0, -floor((p.pus - t.tus) / {_ATTR_DAY_US})) AS w
        FROM p JOIN t ON p.user_id = t.user_id
         AND t.tus < p.pus AND p.pus - t.tus <= {_ATTR_WINDOW_US}
    ), s AS (
        SELECT pid, pts, value, touch_type,
               w, sum(w) OVER (PARTITION BY pid) AS sw
        FROM j
    )
    SELECT touch_type, CAST(date_trunc('week', pts) AS DATE) AS week,
           CAST(count(*) AS BIGINT) AS n_attributions,
           round(sum(value * w / sw), 2) + 0.0 AS attributed_value
    FROM s GROUP BY 1, 2
    """,
    doc="multi-touch revenue attribution with exponential time decay "
    "(half-life one day): every purchase's value is split across ALL of "
    "the user's click/view touches in the preceding 7-day window, "
    "weighted 2^-floor(days_elapsed) and normalized per purchase — the "
    "marketing-analytics generalization of the single-touch "
    "asof_purchase_prior_click (which keeps only the latest touch). "
    "Determinism by construction: timestamp deltas are exact BIGINT "
    "microseconds (unix_micros ≡ epoch_us); floor of an exact-integer/"
    "constant division is IEEE-identical cross-engine; the weights are "
    "exact powers of two (2^0..2^-7), so the per-purchase window sum is "
    "EXACT in binary regardless of combine order, and value*w/sw is a "
    "correctly-rounded op chain on identical inputs. Only the final "
    "cross-purchase sum is order-sensitive — collapsed by round(,2) per "
    "the house rule. Scale: the touch↔purchase join is an equi-join on "
    "user_id (hash-partitioned, never all-pairs); per-key fanout is the "
    "user's touches × purchases inside a 7-day band — bounded by "
    "activity, the same envelope as sessionization; the per-purchase "
    "normalizer is a window over that bounded group, and the final "
    "rollup is a tiny (touch_type, week) grid. Reference has no "
    "counterpart (its ETL ends at BI aggregates, "
    "scripts/process_silver_to_gold.py).",
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        F.unix_micros("ts").alias("pus"),
        "value",
    )
    t = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.unix_micros("ts").alias("tus"),
        F.col("event_type").alias("touch_type"),
    )
    j = p.join(
        t,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("tus") < F.col("pus"))
        & (F.col("pus") - F.col("tus") <= F.lit(_ATTR_WINDOW_US)),
    ).select(
        "pid",
        "pts",
        "value",
        "touch_type",
        F.pow(
            F.lit(2.0),
            -F.floor((F.col("pus") - F.col("tus")) / F.lit(_ATTR_DAY_US)),
        ).alias("w"),
    )
    sw = F.sum("w").over(Window.partitionBy("pid"))
    s = j.select("pts", "value", "touch_type", "w", sw.alias("sw"))
    return s.groupBy(
        "touch_type",
        F.date_trunc("week", "pts").cast("date").alias("week"),
    ).agg(
        F.count("*").alias("n_attributions"),
        (
            F.round(F.sum(F.col("value") * F.col("w") / F.col("sw")), 2)
            + F.lit(0.0)
        ).alias("attributed_value"),
    )


# --------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record linkage — blocked, literal weights
# --------------------------------------------------------------------------

# Published-constant m/u probabilities per comparator, folded OFFLINE into
# log2 agreement/disagreement weights and embedded as the SAME decimal
# literals in both engines' expressions — neither engine ever evaluates a
# log, so the score arithmetic is a fixed left-to-right sum of identical
# doubles (exact cross-engine determinism, no rounding hazard before the
# display round):
#   mktsegment  m=0.90 u=0.20 -> agree log2(4.5)      dis log2(0.125)=-3
#   bal bucket  m=0.85 u=0.05 -> agree log2(17)       dis log2(0.15/0.95)
#   name tail-2 m=0.95 u=0.01 -> agree log2(95)       dis log2(0.05/0.99)
_FS_W = {
    "seg": (2.169925, -3.0),
    "bal": (4.087463, -2.662965),
    "name": (6.569856, -4.307429),
}
_FS_THRESHOLD = 6.0
_FS_TOP = 50


@register(
    "fs_linkage_scores",
    oracle=f"""
    WITH c AS (
        SELECT c_custkey AS k, c_nationkey AS blk,
               c_mktsegment AS seg,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
               right(c_name, 2) AS name2
        FROM customer
    ), pairs AS (
        SELECT a.blk, a.k AS a_key, b.k AS b_key,
               CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS g_seg,
               CASE WHEN a.bal_bucket = b.bal_bucket THEN 1 ELSE 0
                    END AS g_bal,
               CASE WHEN a.name2 = b.name2 THEN 1 ELSE 0 END AS g_name
        FROM c a JOIN c b ON a.blk = b.blk AND a.k < b.k
    ), scored AS (
        SELECT CAST(blk AS BIGINT) AS block_key, a_key, b_key,
               concat(CAST(g_seg AS VARCHAR), CAST(g_bal AS VARCHAR),
                      CAST(g_name AS VARCHAR)) AS pattern,
               (CASE WHEN g_seg = 1 THEN {_FS_W["seg"][0]}
                     ELSE {_FS_W["seg"][1]} END
                + CASE WHEN g_bal = 1 THEN {_FS_W["bal"][0]}
                       ELSE {_FS_W["bal"][1]} END
                + CASE WHEN g_name = 1 THEN {_FS_W["name"][0]}
                       ELSE {_FS_W["name"][1]} END) AS score
        FROM pairs
    )
    SELECT block_key, a_key, b_key, pattern,
           round(score, 4) + 0.0 AS score4,
           score >= {_FS_THRESHOLD} AS is_match
    FROM scored
    ORDER BY score4 DESC, a_key, b_key
    LIMIT {_FS_TOP}
    """,
    doc="Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter "
    "1969; the Splink/dedupe.io model) over the customer roster: "
    "candidate pairs are generated ONLY within a c_nationkey block, each "
    "pair gets a 3-bit agreement pattern over (mktsegment, acctbal "
    "kilo-bucket, name tail-2-digits) comparators, and the match score "
    "is the sum of per-comparator log2(m/u) agreement / "
    "log2((1-m)/(1-u)) disagreement weights — classified against a "
    "fixed review threshold and reported as the deterministic top-"
    f"{_FS_TOP} by (score DESC, a_key, b_key). The m/u constants are "
    "folded offline into decimal literals shared by both engines (no "
    "engine-side log), so the score is a fixed-order sum of identical "
    "doubles; the only order-sensitive step is the display round(,4) "
    "(+0.0 because disagreement-heavy scores are negative). Scale: "
    "blocking bounds the quadratic — candidates are "
    "sum_over_blocks(n_b^2)/2, never corpus^2; the self-join is an "
    "equi-join on the block key (hash-partitioned); oversized blocks "
    "take a secondary blocking key exactly like the banded dedup "
    "family (operators/dedup.py); TakeOrderedAndProject serves the "
    "top-k without a global sort. Complements fuzzy_pairs_levenshtein "
    "(edit-distance candidates) with the probabilistic scoring + "
    "classification stage. Reference has no counterpart.",
)
def fs_linkage_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("blk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0))
        .cast("long")
        .alias("bal_bucket"),
        F.expr("right(c_name, 2)").alias("name2"),
    )
    a = c.alias("a")
    b = c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk")) & (F.col("a.k") < F.col("b.k")),
    ).select(
        F.col("a.blk").alias("blk"),
        F.col("a.k").alias("a_key"),
        F.col("b.k").alias("b_key"),
        (F.col("a.seg") == F.col("b.seg")).cast("int").alias("g_seg"),
        (F.col("a.bal_bucket") == F.col("b.bal_bucket"))
        .cast("int")
        .alias("g_bal"),
        (F.col("a.name2") == F.col("b.name2")).cast("int").alias("g_name"),
    )

    def _term(flag: str, key: str):
        wa, wd = _FS_W[key]
        return F.when(F.col(flag) == 1, F.lit(wa)).otherwise(F.lit(wd))

    score = _term("g_seg", "seg") + _term("g_bal", "bal") + _term(
        "g_name", "name"
    )
    scored = pairs.select(
        F.col("blk").cast("long").alias("block_key"),
        "a_key",
        "b_key",
        F.concat(
            F.col("g_seg").cast("string"),
            F.col("g_bal").cast("string"),
            F.col("g_name").cast("string"),
        ).alias("pattern"),
        score.alias("score"),
    )
    return (
        scored.select(
            "block_key",
            "a_key",
            "b_key",
            "pattern",
            (F.round("score", 4) + F.lit(0.0)).alias("score4"),
            (F.col("score") >= F.lit(_FS_THRESHOLD)).alias("is_match"),
        )
        .orderBy(F.desc("score4"), "a_key", "b_key")
        .limit(_FS_TOP)
    )
