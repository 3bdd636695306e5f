"""OLAP-surface extensions: cube, pivot, range join, exact/approx percentiles.

SURVEY §2.4 notes the reference's date-hierarchy drill is "semantically a
rollup"; this module rounds out the rest of the multidimensional family the
BI layer implies — cube (all grouping sets), pivot (wide conditional agg),
non-equi range join (bucket classification), and distribution quantiles
(exact for the oracle bar, approximate t-digest for the 100 TB path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sampling import HASH_B_RED, HASH_C
from ..operators.skew import salted_join
from ..sources.tables import load_table
from .registry import register


@register(
    "cube_order_counts",
    oracle="""
        SELECT CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                    AS BIGINT) AS gid,
               coalesce(o_orderstatus, '(all)') AS o_orderstatus,
               coalesce(o_orderpriority, '(all)') AS o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="full cube over (status, priority): all four grouping sets in one "
    "pass (Spark plans a single Expand + hash agg — one shuffle for every "
    "set, vs four scans if issued separately). grouping_id disambiguates "
    "rolled-up NULLs from data NULLs; string sentinels keep the compared "
    "frame NULL-free.",
)
def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            "gid",
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("o_orderpriority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "pivot_status_by_priority",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="pivot: long→wide conditional aggregation. The pivot values are "
    "DECLARED (not discovered), so Spark skips the extra distinct-values "
    "job and plans a single hash agg — the form that scales.",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_pending"),
        )
    )


_BUCKETS = [
    ("micro", 0.0, 10.0),
    ("small", 10.0, 50.0),
    ("medium", 50.0, 150.0),
    ("large", 150.0, 1000.0),
]


@register(
    "range_join_value_buckets",
    oracle=f"""
        WITH buckets(bucket, lo, hi) AS (
            VALUES {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BUCKETS)}
        )
        SELECT b.bucket,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(e.value), 2) AS sum_value
        FROM events e
        JOIN buckets b ON e.value >= b.lo AND e.value < b.hi
        GROUP BY b.bucket
    """,
    doc="non-equi range join: events classified into [lo, hi) value buckets. "
    "The bucket dim is rows-scale → BroadcastNestedLoopJoin, i.e. a "
    "map-side interval scan with zero shuffle on the fact side; at 100 TB "
    "the same shape holds for any literal-table banding.",
)
def range_join_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    buckets = e.sparkSession.createDataFrame(
        _BUCKETS, "bucket string, lo double, hi double"
    )
    return (
        e.join(
            F.broadcast(buckets),
            (e.value >= buckets.lo) & (e.value < buckets.hi),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "date_part_join_weekday",
    oracle="""
        WITH bounds AS (
            SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
            FROM events
        ), cal AS (
            SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                       AS full_date
            FROM bounds
        )
        SELECT dayname(c.full_date) AS day_name,
               dayofweek(c.full_date) IN (0, 6) AS is_weekend,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(e.value), 2) AS sum_value
        FROM events e
        JOIN cal c ON CAST(e.ts AS DATE) = c.full_date
        GROUP BY 1, 2
    """,
    doc="date-part join (J6, relationships.tmdl:1-19 datePartOnly): events "
    "joined to a generated calendar on DATE(ts). The calendar is "
    "rows-scale → broadcast; the fact side computes to_date(ts) map-side, "
    "so the only shuffle is the final small aggregate.",
)
def date_part_join_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("events_for_cal")
    cal = spark.sql(
        """
        SELECT explode(sequence(
            (SELECT to_date(min(ts)) FROM events_for_cal),
            (SELECT to_date(max(ts)) FROM events_for_cal))) AS full_date
        """
    )
    return (
        e.join(F.broadcast(cal), F.to_date(e.ts) == cal.full_date)
        .groupBy(
            F.date_format("full_date", "EEEE").alias("day_name"),
            F.dayofweek("full_date").isin(1, 7).alias("is_weekend"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "event_value_percentiles",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.25), 4) AS p25,
               round(quantile_cont(value, 0.50), 4) AS p50,
               round(quantile_cont(value, 0.75), 4) AS p75,
               round(quantile_cont(value, 0.90), 4) AS p90
        FROM events
        GROUP BY event_type
    """,
    doc="exact interpolated percentiles per group (Spark `percentile` ≡ "
    "DuckDB quantile_cont, both linear-interpolation). Exact quantiles "
    "need the full sorted group — correct at any SF but memory-bound per "
    "group; the unbounded-scale variant is approx_value_percentiles.",
)
def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        *[
            F.round(F.percentile("value", p), 4).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.50, 0.75, 0.90)
        ]
    )


@register(
    "salted_join_user_nation",
    oracle="""
        SELECT c.c_nationkey,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(e.value), 2) AS sum_value
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_nationkey
    """,
    doc="hand-salted skew join (operators/skew.py): the skewed side is "
    "salted into 8 sub-keys, the dimension replicated 8×, join on "
    "(key, salt). The oracle is the PLAIN join — proving salting is a pure "
    "physical rewrite with identical semantics. Complements AQE skew "
    "splitting for hot keys known before the exchange.",
)
def salted_join_user_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    return (
        salted_join(e, c, key="user_id", n_salts=8)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


_CUST_ORDER_ORACLE = """
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
"""


@register(
    "join_broadcast_hint",
    oracle=_CUST_ORDER_ORACLE,
    doc="orders ⋈ customer with an explicit broadcast hint: the dimension "
    "ships to every task, the fact side never shuffles for the join "
    "(SURVEY §2.3 physical note). Same oracle as join_sortmerge_hint — "
    "bench.py races the two strategies on identical semantics.",
    bench=True,
)
def join_broadcast_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "join_sortmerge_hint",
    oracle=_CUST_ORDER_ORACLE,
    doc="same join forced to sort-merge via the MERGE hint: both sides "
    "hash-partition + sort on the key — the strategy that holds when "
    "neither side fits in memory (fact ⋈ fact at 100 TB). The "
    "broadcast/SMJ bench delta quantifies what dimension broadcasting "
    "saves.",
    bench=True,
)
def join_sortmerge_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").hint("merge")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "range_frame_running_sum",
    oracle="""
        SELECT o_orderkey, o_custkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ), 2) AS trailing_30d_spend
        FROM orders
    """,
    doc="RANGE-frame window (vs the ROWS frame in moving_average): per "
    "customer, total order value in the trailing 30 days by VALUE of the "
    "order date — frame membership is data-dependent, ties share a frame. "
    "Extends W1's frameless window to both frame kinds.",
)
def range_frame_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    day = 24 * 3600
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30 * day, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_30d_spend"),
    )


@register(
    "semi_anti_join_customers",
    oracle="""
        SELECT
            CAST((SELECT count(*) FROM customer c
                  WHERE EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = c.c_custkey)) AS BIGINT)
                AS n_with_orders,
            CAST((SELECT count(*) FROM customer c
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_custkey = c.c_custkey)) AS BIGINT)
                AS n_without_orders
    """,
    doc="left-semi and left-anti joins (EXISTS / NOT EXISTS duals): "
    "existence checks that never materialize the match — the build side "
    "deduplicates to distinct keys, no row multiplication (vs inner join "
    "+ distinct, which explodes first).",
)
def semi_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    semi = c.join(o, "c_custkey", "left_semi").count()
    anti = c.join(o, "c_custkey", "left_anti").count()
    return spark.createDataFrame(
        [(semi, anti)], "n_with_orders long, n_without_orders long"
    )


@register(
    "sql_entry_correlated_subquery",
    oracle="""
        SELECT n.n_name,
               CAST(count(*) AS BIGINT) AS n_above_avg_customers
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY n.n_name
    """,
    doc="the SQL-text entry point (§3.3: ANTLR parse → analyze → optimize): "
    "the SAME SQL string runs on both engines — a correlated scalar "
    "subquery Catalyst decorrelates into an aggregate + join (visible as "
    "one extra shuffle, not a per-row loop).",
)
def sql_entry_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name,
               CAST(count(*) AS BIGINT) AS n_above_avg_customers
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY n.n_name
        """
    )


@register(
    "unpivot_order_counts",
    oracle="""
        WITH wide AS (
            SELECT o_orderpriority,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, status, n
        FROM wide
        UNPIVOT (n FOR status IN (n_open, n_filled, n_pending))
    """,
    doc="unpivot (wide→long melt, the pivot inverse): plans as a zero-"
    "shuffle Expand over the wide frame — pivot ∘ unpivot round-trips "
    "the long form.",
)
def unpivot_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = pivot_status_by_priority(spark, sf_dir)
    return wide.unpivot(
        "o_orderpriority",
        ["n_open", "n_filled", "n_pending"],
        "status",
        "n",
    )


@register(
    "gap_fill_user_daily",
    oracle="""
        WITH bounds AS (
            SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
            FROM events
        ), days AS (
            SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
            FROM bounds
        ), users AS (
            SELECT DISTINCT user_id FROM events
        ), grid AS (
            SELECT u.user_id, d.d FROM users u CROSS JOIN days d
        ), daily AS (
            SELECT user_id, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT g.user_id, CAST(g.d AS TIMESTAMP) AS day,
               coalesce(dl.n, 0) AS n_events
        FROM grid g LEFT JOIN daily dl ON g.user_id = dl.user_id AND g.d = dl.d
    """,
    doc="time-series gap filling: the dense (user × day) grid left-joins "
    "sparse daily counts, absent cells become explicit zeros — the "
    "resample-to-regular-grid operator every downstream window/forecast "
    "step needs. Grid = broadcast(users) × broadcast(days): generated, "
    "never shuffled at fact scale.",
)
def gap_fill_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("events_for_grid")
    days = spark.sql(
        """
        SELECT explode(sequence(
            (SELECT to_date(min(ts)) FROM events_for_grid),
            (SELECT to_date(max(ts)) FROM events_for_grid))) AS d
        """
    )
    users = e.select("user_id").distinct()
    # CROSSJOIN: |days|-row calendar frame (time-dimension-bounded)
    grid = users.crossJoin(F.broadcast(days))
    daily = e.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    return grid.join(daily, ["user_id", "d"], "left").select(
        "user_id",
        F.col("d").cast("timestamp").alias("day"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
    )


@register(
    "value_histogram",
    oracle="""
        SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
               CAST(floor(value / 50) * 50 AS DOUBLE) AS bucket_lo,
               CAST(count(*) AS BIGINT) AS n,
               round(min(value), 2) AS min_v,
               round(max(value), 2) AS max_v
        FROM events
        GROUP BY 1, 2
    """,
    doc="fixed-width histogram: bucket = floor(value/width) computed "
    "map-side, then a bucket-count shuffle (≤ range/width groups — the "
    "same constant-state shape as the count-min grid).",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 50)
    return e.groupBy(
        bucket.cast("long").alias("bucket"),
        (bucket * 50).cast("double").alias("bucket_lo"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 2).alias("min_v"),
        F.round(F.max("value"), 2).alias("max_v"),
    )


@register(
    "bloom_prefilter_semi_join",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o.o_totalprice), 2) AS total_price
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = o.o_custkey)
        GROUP BY o.o_orderpriority
    """,
    doc="runtime-filter pattern made explicit: a hand-rolled Bloom filter "
    "(operators/sketch.py: 512 bits, 3 portable hashes, built as one "
    "bit_or aggregate) over events.user_id prunes orders map-side via "
    "plan-literal bit tests — no false negatives, so nothing true is "
    "lost — then the left-semi join removes false positives. The oracle "
    "is the plain EXISTS, proving the bloom stage is a pure physical "
    "prefilter; at 100 TB this is the manual form of the runtime filters "
    "optimizers inject for selective joins (big side shrinks before the "
    "exchange).",
)
def bloom_prefilter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import bloom_build, bloom_might_contain

    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    words = bloom_build(e.select("user_id").distinct(), "user_id")
    pruned = o.filter(bloom_might_contain(words, F.col("o_custkey")))
    users = e.select(F.col("user_id").alias("o_custkey")).distinct()
    return (
        pruned.join(users, "o_custkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "stratified_sample_counts",
    oracle=None,  # sampling is engine-specific → rows-only + property tests
    doc="stratified sampling (sampleBy): per-event_type Bernoulli fractions "
    "{click: 0.5, purchase: 0.25, else 0}, seed 42 — the class-balancing "
    "primitive (O4 generalized; the reference downsamples the majority "
    "class the same way, train_tsunami_model.py:59-66). Per-stratum rates "
    "asserted within tolerance in tests.",
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    sampled = e.sampleBy("event_type", {"click": 0.5, "purchase": 0.25}, seed=42)
    return sampled.groupBy("event_type").agg(F.count("*").alias("n_sampled"))


@register(
    "approx_value_percentiles",
    oracle=None,  # sketch-based → engine-specific estimates, rows-only
    doc="approx_percentile (GK/t-digest-class sketch): fixed-size state per "
    "group regardless of cardinality — the 100 TB form of "
    "event_value_percentiles (same shape as approx_count_distinct vs "
    "countDistinct, A10). Accuracy vs the exact query asserted in tests. "
    "Presented long-form — (event_type, p, quantile) scalar rows via "
    "posexplode against the literal p-array — so downstream comparators "
    "see only scalar columns.",
)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (0.25, 0.5, 0.75, 0.9)
    e = load_table(spark, sf_dir, "events")
    wide = e.groupBy("event_type").agg(
        F.approx_percentile(
            "value", F.array(*[F.lit(p) for p in ps]), 10_000
        ).alias("quantiles")
    )
    return wide.select(
        "event_type",
        F.posexplode("quantiles").alias("pos", "quantile"),
    ).select(
        "event_type",
        F.element_at(F.array(*[F.lit(p) for p in ps]), F.col("pos") + 1).alias("p"),
        "quantile",
    )


@register(
    "approx_percentile_audit",
    oracle="""
        SELECT t.event_type, p.p, TRUE AS rank_ok
        FROM (SELECT DISTINCT event_type FROM events
              WHERE value IS NOT NULL) t
        CROSS JOIN (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9]) AS DOUBLE)
                    AS p) p
    """,
    doc="oracle-checkable audit of approx_percentile (the "
    "ann_recall_audit pattern applied to the sketch family): for each "
    "(event_type, p) the GK-sketch quantile is re-ranked against the "
    "actual data — rank_ok asserts at least (p-0.02)*n values sit at or "
    "below the estimate and fewer than (p+0.02)*n sit strictly below, "
    "i.e. the sketch honored its rank-error contract (1/accuracy = 1e-4, "
    "audited at 200x slack). The oracle enumerates the (event_type, p) "
    "grid and expects TRUE, so a sketch regression hash-fails the driver "
    "row instead of hiding behind approx_value_percentiles' rows-only "
    "check. Two scan-shaped passes: sketch agg, then broadcast the "
    "20-row quantile grid back onto the scan for the rank census.",
)
def approx_percentile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (0.25, 0.5, 0.75, 0.9)
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    wide = e.groupBy("event_type").agg(
        F.approx_percentile(
            "value", F.array(*[F.lit(p) for p in ps]), 10_000
        ).alias("qs"),
        F.count("*").alias("n"),
    )
    grid = wide.select(
        "event_type",
        "n",
        F.posexplode("qs").alias("pos", "q"),
    ).select(
        "event_type",
        "n",
        F.element_at(F.array(*[F.lit(p) for p in ps]), F.col("pos") + 1)
        .alias("p"),
        "q",
    )
    ranks = (
        e.join(F.broadcast(grid), "event_type")
        .groupBy("event_type", "p", "n", "q")
        .agg(
            F.sum(F.when(F.col("value") <= F.col("q"), 1).otherwise(0))
            .alias("cnt_le"),
            F.sum(F.when(F.col("value") < F.col("q"), 1).otherwise(0))
            .alias("cnt_lt"),
        )
    )
    tol = 0.02
    rank_ok = (
        F.col("cnt_le") >= F.floor((F.col("p") - tol) * F.col("n"))
    ) & (F.col("cnt_lt") <= F.ceil((F.col("p") + tol) * F.col("n")))
    return ranks.select("event_type", "p", rank_ok.alias("rank_ok"))


_STRATA_FRACTIONS = {"click": 0.5, "purchase": 0.25}


@register(
    "stratified_sample_audit",
    oracle=f"""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
               TRUE AS rate_ok
        FROM events
        WHERE event_type IN ({", ".join(repr(k) for k in _STRATA_FRACTIONS)})
        GROUP BY 1
    """,
    doc="oracle-checkable audit of sampleBy: per stratum, the realized "
    "sampling rate must sit within 6 binomial standard deviations of the "
    "requested fraction (failure probability ~1e-9 per stratum for a "
    "correct Bernoulli sampler, certainty for a broken one). Emits the "
    "exact stratum totals plus the boolean; the oracle recomputes the "
    "totals and expects TRUE — converting stratified_sample_counts' "
    "rows-only signal into a hard driver check. Both counts come from "
    "one scan each; the 2-row comparison joins broadcast.",
)
def stratified_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    fractions = _STRATA_FRACTIONS
    e = load_table(spark, sf_dir, "events")
    totals = (
        e.filter(F.col("event_type").isin(*fractions))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_total"))
    )
    sampled = (
        e.sampleBy("event_type", fractions, seed=42)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_sampled"))
    )
    # requested rate looked up from the SAME dict sampleBy used — one
    # source of truth, so editing fractions can't desync the audit
    frac = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in fractions.items() for x in kv]
        ),
        F.col("event_type"),
    )
    sigma = F.sqrt(frac * (1.0 - frac) / F.col("n_total"))
    rate = F.coalesce(F.col("n_sampled"), F.lit(0)) / F.col("n_total")
    return (
        totals.join(F.broadcast(sampled), "event_type", "left")
        .select(
            "event_type",
            "n_total",
            (F.abs(rate - frac) <= 6.0 * sigma).alias("rate_ok"),
        )
    )


_Z_BITS = 12  # bits per range-normalized dimension -> 24-bit Morton codes


def _zorder_sql_expr(a: str, b: str) -> str:
    """DuckDB bit-interleave of two ``_Z_BITS``-bit indexes (Morton code)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


@register(
    "zorder_layout_stats",
    oracle=f"""
        WITH mx AS (
            SELECT max(l_orderkey) AS ma, max(l_partkey) AS mb FROM lineitem
        ), z AS (
            SELECT l_orderkey, l_partkey,
                   ({_zorder_sql_expr(
                       f"CAST(floor((l_orderkey * {1 << _Z_BITS})"
                       " / (ma + 1.0)) AS BIGINT)",
                       f"CAST(floor((l_partkey * {1 << _Z_BITS})"
                       " / (mb + 1.0)) AS BIGINT)",
                   )}) AS morton
            FROM lineitem CROSS JOIN mx
        )
        SELECT CAST(morton >> {2 * _Z_BITS - 10} AS BIGINT) AS zbucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(l_orderkey) AS BIGINT) AS min_ok,
               CAST(max(l_orderkey) AS BIGINT) AS max_ok,
               CAST(min(l_partkey) AS BIGINT) AS min_pk,
               CAST(max(l_partkey) AS BIGINT) AS max_pk
        FROM z GROUP BY 1
    """,
    doc="Z-order (Morton-code) layout statistics — the multi-dimensional "
    "clustering technique behind Delta/Iceberg Z-ORDER file layout: "
    f"range-normalize (l_orderkey, l_partkey) to {_Z_BITS}-bit indexes "
    "(integer-exact floor arithmetic off each key's max), interleave the "
    "bits into one sort key, bucket by its top 10 bits, and emit per-"
    "bucket min/max of BOTH dimensions — every bucket is range-bounded "
    "in both keys simultaneously, so file-level min/max stats prune "
    "scans for predicates on EITHER column (a single-column sort only "
    "bounds one). Pure shift/mask arithmetic, bit-identical across "
    "engines; at 100 TB this expression feeds repartitionByRange(morton) "
    "+ sortWithinPartitions at WRITE time — one exchange, amortized over "
    "every subsequent pruned scan.",
)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.agg(
        F.max("l_orderkey").alias("ma"), F.max("l_partkey").alias("mb")
    )
    scale = 1 << _Z_BITS
    # explicit long casts: a regenerated int32 key times 4096 would hit
    # ANSI overflow at larger scales; the small literal doesn't force
    # promotion on its own
    ia = F.floor(
        (F.col("l_orderkey").cast("long") * scale) / (F.col("ma") + 1.0)
    ).cast("long")
    ib = F.floor(
        (F.col("l_partkey").cast("long") * scale) / (F.col("mb") + 1.0)
    ).cast("long")
    # CROSSJOIN: 1-row max-keys frame
    rows = li.join(F.broadcast(mx)).select(
        "l_orderkey", "l_partkey", ia.alias("ia"), ib.alias("ib")
    )
    z = None
    for i in range(_Z_BITS):
        for col, off in (("ia", 2 * i + 1), ("ib", 2 * i)):
            t = F.shiftleft(
                F.shiftrightunsigned(F.col(col), i).bitwiseAND(F.lit(1)), off
            )
            z = t if z is None else z.bitwiseOR(t)
    return (
        rows.select(
            "l_orderkey",
            "l_partkey",
            F.shiftrightunsigned(z, 2 * _Z_BITS - 10).alias("zbucket"),
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n"),
            F.min("l_orderkey").alias("min_ok"),
            F.max("l_orderkey").alias("max_ok"),
            F.min("l_partkey").alias("min_pk"),
            F.max("l_partkey").alias("max_pk"),
        )
    )


_GROUPING_SETS_SQL = """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS (
        (o_orderstatus, o_orderpriority),
        (o_orderstatus),
        (o_orderpriority),
        ()
    )
"""


@register(
    "grouping_sets_order_stats",
    oracle=_GROUPING_SETS_SQL,
    doc="explicit GROUPING SETS (the generalization cube/rollup compile "
    "to): four aggregation grains in one statement — the same SQL text "
    "runs on both engines. Spark plans a single Expand + hash aggregate: "
    "each input row fans out once per grouping set, partial aggregation "
    "still combines map-side, so the shuffle carries only group cells.",
)
def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "bucketed_join_orders_customer",
    oracle="""
        SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o.o_totalprice), 2) AS total_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    """,
    doc="co-located join over BUCKETED tables (SURVEY §4's write-time "
    "shuffle): both sides are materialized with bucketBy(8, custkey) + "
    "sortBy, so the join reads matching buckets directly and plans with "
    "NO join-time Exchange — the per-query shuffle is paid once at write "
    "time, the amortization pattern for a fact table joined on one key "
    "by many queries at 100 TB. Oracle = the plain join on the raw "
    "parquet (bucketing must not change results). Exchange elimination "
    "pinned in tests/test_physical_strategies.py.",
)
def bucketed_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bucketing import bucketed_pair

    orders, customer = bucketed_pair(
        spark,
        sf_dir,
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        "orders",
        "customer",
        "o_custkey",
        "c_custkey",
        n_buckets=8,
    )
    return (
        orders.hint("merge")
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "resample_ohlc_5min",
    oracle="""
        WITH b AS (
            SELECT event_type, value, ts, event_id,
                   make_timestamp(CAST(floor(epoch_us(ts) / 300000000)
                                       AS BIGINT) * 300000000) AS bucket,
                   row_number() OVER (
                       PARTITION BY event_type,
                           CAST(floor(epoch_us(ts) / 300000000) AS BIGINT)
                       ORDER BY ts, event_id) AS rn_asc,
                   row_number() OVER (
                       PARTITION BY event_type,
                           CAST(floor(epoch_us(ts) / 300000000) AS BIGINT)
                       ORDER BY ts DESC, event_id DESC) AS rn_desc
            FROM events
        )
        SELECT event_type, bucket,
               max(CASE WHEN rn_asc = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rn_desc = 1 THEN value END) AS close,
               CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY 1, 2
    """,
    doc="time-series resampling (downsampling) to 5-minute OHLC bars per "
    "event_type — the storage-side rollup under any metrics/market-data "
    "view. Bucket = integer floor of epoch-micros (identical arithmetic "
    "both engines); open/close = first/last by (ts, event_id) via two "
    "window ranks sharing ONE (event_type, bucket) sort, high/low/n in "
    "the same final aggregate. At scale this is one exchange keyed on "
    "(event_type, bucket) — the window sort and the groupBy share it.",
)
def resample_ohlc_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bucket = F.timestamp_micros(
        (F.floor(F.unix_micros("ts") / 300_000_000) * 300_000_000).cast("long")
    )
    b = e.select(
        "event_type", "value", "ts", "event_id", bucket.alias("bucket")
    )
    wb = Window.partitionBy("event_type", "bucket")
    rn_asc = F.row_number().over(wb.orderBy("ts", "event_id"))
    rn_desc = F.row_number().over(
        wb.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    )
    return (
        b.withColumn("rn_asc", rn_asc)
        .withColumn("rn_desc", rn_desc)
        .groupBy("event_type", "bucket")
        .agg(
            F.max(F.when(F.col("rn_asc") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_desc") == 1, F.col("value"))).alias("close"),
            F.count("*").alias("n"),
        )
    )


@register(
    "join_shufflehash_hint",
    oracle=_CUST_ORDER_ORACLE,
    doc="same join forced to shuffle-hash via the SHUFFLE_HASH hint — the "
    "third physical strategy: both sides exchange on the key but the "
    "build side hashes instead of sorting, beating sort-merge when one "
    "side is much smaller than the other yet too big to broadcast. "
    "Completes the broadcast / sort-merge / shuffle-hash hint family on "
    "one oracle; tests/test_physical_strategies.py pins the plan.",
)
def join_shufflehash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").hint("shuffle_hash")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "skyline_pareto_orders",
    oracle="""
        WITH recent AS (
            SELECT o_orderkey, o_totalprice, o_orderdate
            FROM orders
        ), ranked AS (
            SELECT o_orderkey, o_totalprice,
                   CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
                   max(CAST(o_orderdate AS TIMESTAMP)) OVER (
                       ORDER BY o_totalprice DESC, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS best_date_above
            FROM recent
        )
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderdate
        FROM ranked
        WHERE best_date_above IS NULL OR o_orderdate > best_date_above
    """,
    doc="skyline (Pareto frontier) query: orders not dominated on "
    "(totalprice, orderdate) — no other order is both pricier and more "
    "recent (o_orderkey tie-break makes equal prices dominate in key "
    "order, deterministically). DISTRIBUTED sweep, not the textbook "
    "single global sort: bucket rows by VALUE (price-quantile bounds "
    "collected once, driver-bounded), run the running-max-date sweep "
    "inside each bucket in parallel, then correct across buckets with "
    "the bucket-count-sized prefix-max of pricier buckets' dates. The "
    "bucket id is a pure function of the row's price — unlike "
    "spark_partition_id() under a re-executed range exchange, recompute "
    "of any stage reproduces the identical layout, so no persist is "
    "needed for correctness (ADVICE r3). Equal prices always share a "
    "bucket, so cross-bucket correction sees strictly-pricier rows only. "
    "The oracle keeps the one-sort formulation: identical semantics, "
    "different physical strategy.",
)
def skyline_pareto_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
    )
    # value-derived buckets: ascending price quantile bounds (≤31 scalars
    # on the driver — contract-bounded like the pack-sequences offset
    # map). pid = #bounds strictly above my price, so pid 0 is the
    # priciest bucket and ties at a bound land together in the pricier
    # bucket. Bucket balance only affects parallelism, never correctness.
    bounds = sorted(
        set(
            o.stat.approxQuantile(
                "o_totalprice", [i / 32.0 for i in range(1, 32)], 0.001
            )
        )
    )
    if bounds:  # empty input → no quantiles → single bucket
        pid = F.size(
            F.filter(
                F.array(*[F.lit(b) for b in bounds]),
                lambda b: b > F.col("o_totalprice"),
            )
        )
    else:
        pid = F.lit(0)
    r = o.withColumn("pid", pid)
    # pass 1 (parallel): running max date among better-priced rows WITHIN
    # the bucket (the window's own exchange hashes on pid)
    w = (
        Window.partitionBy("pid")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = r.withColumn("local_best_above", F.max("o_orderdate").over(w))
    # pass 2: COLLECT: bounded by contract — per-bucket max dates are
    # exactly #buckets (≤32) rows regardless of input cardinality, the
    # same KB-scale bound as the quantile bounds above; prefix-max of
    # all PRICIER buckets computed over that tiny frame and broadcast
    # back (empty-input guard: no rows → no correction needed)
    pmax_rows = sorted(
        local.groupBy("pid").agg(F.max("o_orderdate").alias("mx")).collect(),
        key=lambda row: row.pid,
    )
    prefix: list[tuple[int, object]] = []
    best = None
    for row in pmax_rows:
        prefix.append((row.pid, best))
        best = row.mx if best is None or row.mx > best else best
    spark = o.sparkSession
    pref_df = spark.createDataFrame(
        prefix, "pid int, earlier_best timestamp"
    )
    joined = local.join(F.broadcast(pref_df), "pid", "left")
    # greatest() skips NULLs (returns null only if both are), so no
    # explicit null-guard is needed for first-in-partition / partition-0
    best_above = F.greatest(F.col("local_best_above"), F.col("earlier_best"))
    return (
        joined.withColumn("best_date_above", best_above)
        .filter(
            F.col("best_date_above").isNull()
            | (F.col("o_orderdate") > F.col("best_date_above"))
        )
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "o_orderdate",
        )
    )


_LATERAL_TOPK_SQL = """
    SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
"""


@register(
    "sql_entry_lateral_topk",
    oracle=_LATERAL_TOPK_SQL,
    doc="LATERAL correlated subquery (Spark 4 SQL surface): top-2 orders "
    "per customer expressed as a per-row dependent subquery — the same "
    "SQL text runs on both engines. Catalyst decorrelates it into a "
    "window-rank plan (no per-customer re-execution), which is exactly "
    "what you want at scale: one exchange on the correlation key, not "
    "|customers| subqueries.",
)
def sql_entry_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPK_SQL)


_INTERVAL_MINS = 30


@register(
    "merge_overlapping_intervals",
    oracle=f"""
        WITH iv AS (
            SELECT user_id, ts AS s,
                   ts + INTERVAL {_INTERVAL_MINS} MINUTE AS e
            FROM events
        ), marked AS (
            SELECT user_id, s, e,
                   CASE WHEN s > max(e) OVER (
                            PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        OR max(e) OVER (
                            PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           IS NULL
                        THEN 1 ELSE 0 END AS new_island
            FROM iv
        ), islands AS (
            SELECT user_id, s, e,
                   sum(new_island) OVER (
                       PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS island
            FROM marked
        ), merged AS (
            SELECT user_id, island, min(s) AS start_ts, max(e) AS end_ts
            FROM islands GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(sum(epoch_us(end_ts) - epoch_us(start_ts)) / 60000000.0
                    AS DOUBLE) AS covered_minutes
        FROM merged GROUP BY user_id
    """,
    doc=f"interval merging (gaps-and-islands on time ranges): each event "
    f"opens a {_INTERVAL_MINS}-minute activity interval; overlapping "
    "intervals per user coalesce into islands via the classic running-"
    "max-end sweep (island boundary where start > max end of all prior "
    "intervals), then per-user merged-interval count and covered "
    "minutes. One (user_id)-partitioned sort shared by both windows — "
    "the availability/uptime primitive.",
)
def merge_overlapping_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {_INTERVAL_MINS} MINUTE")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max_e = F.max("e").over(w_prev)
    marked = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("new_island").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("start_ts"), F.max("e").alias("end_ts")
    )
    return merged.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        (
            F.sum(F.unix_micros("end_ts") - F.unix_micros("start_ts"))
            / F.lit(60_000_000.0)
        ).alias("covered_minutes"),
    )


_ARES_K = 100
# portable uniform: one linear round, then an independent multiply-add
# round of the Mersenne hash (bijective on [0, p) — a squaring round
# only lands on quadratic residues, ~half the range each hit twice,
# which skews the Efraimidis-Spirakis inclusion probabilities; reworked
# round 6 per the r5 ADVICE, constants shared with operators/sampling.py)
_ARES_P = (1 << 31) - 1
_ARES_A, _ARES_B = 48271, 11


@register(
    "weighted_sample_ares",
    oracle=f"""
        WITH keyed AS (
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
                   round(pow(
                       ((((o_orderkey * {_ARES_A} + {_ARES_B}) % {_ARES_P})
                         * {HASH_B_RED} + {HASH_C})
                        % {_ARES_P} + 1.0) / {_ARES_P + 1}.0,
                       1.0 / o_totalprice), 6) AS k
            FROM orders WHERE o_totalprice > 0
        )
        SELECT o_orderkey, o_totalprice
        FROM keyed
        ORDER BY k DESC, o_orderkey
        LIMIT {_ARES_K}
    """,
    doc=f"weighted sampling WITHOUT replacement (Efraimidis-Spirakis "
    f"A-Res): top-{_ARES_K} orders by key u^(1/w), w = o_totalprice, "
    "u = a seeded arithmetic hash of the orderkey scaled to (0,1] — "
    "fully deterministic and engine-portable, no RNG state. This is THE "
    "distributed weighted-sampling construction: each partition computes "
    "keys map-side and keeps a local top-k, the final k merge in one "
    "reduce (Spark's TakeOrderedAndProject) — no global sort, no "
    "sequential pass. Keys rounded to 6 places with an id tie-break so "
    "libm pow last-ulp drift can't flip the selection boundary.",
)
def weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    h1 = (F.col("o_orderkey") * _ARES_A + _ARES_B) % _ARES_P
    h = (h1 * HASH_B_RED + HASH_C) % _ARES_P
    u = (h + 1.0) / float(_ARES_P + 1)
    key = F.round(F.pow(u, 1.0 / F.col("o_totalprice")), 6)
    return (
        o.filter(F.col("o_totalprice") > 0)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            key.alias("k"),
        )
        .orderBy(F.col("k").desc(), "o_orderkey")
        .limit(_ARES_K)
        .select("o_orderkey", "o_totalprice")
    )


_QSUM_SHARDS = 32  # summary units (stand-in for executor-local combiners)
_QSUM_B = 64  # kept points per shard -> rank error <= n_shard/B per shard
_QSUM_QS = (10, 25, 50, 75, 90, 99)  # percent targets


@register(
    "quantile_summary_mergeable",
    oracle=f"""
        WITH v AS (
            SELECT o_orderkey AS k, o_totalprice AS val,
                   (o_orderkey * 2654435761) % 2147483647 % {_QSUM_SHARDS}
                       AS shard
            FROM orders
        ), ranked AS (
            SELECT shard, k, val,
                   row_number() OVER (
                       PARTITION BY shard ORDER BY val, k
                   ) AS r,
                   count(*) OVER (PARTITION BY shard) AS ns
            FROM v
        ), kept AS (
            SELECT shard, val, r, ns,
                   CAST(ceil(ns * 1.0 / {_QSUM_B}) AS BIGINT) AS step
            FROM ranked
            WHERE r % CAST(ceil(ns * 1.0 / {_QSUM_B}) AS BIGINT) = 0
               OR r = ns
        ), weighted AS (
            SELECT shard, val, r,
                   r - coalesce(lag(r) OVER (
                       PARTITION BY shard ORDER BY r
                   ), 0) AS w
            FROM kept
        ), cum AS (
            SELECT val, shard, r,
                   sum(w) OVER (
                       ORDER BY val, shard, r
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cw
            FROM weighted
        ), n AS (
            SELECT count(*) AS n FROM v
        ), targets AS (
            SELECT q, CAST(ceil(n.n * q / 100.0) AS BIGINT) AS target_rank,
                   n.n AS n
            FROM (SELECT unnest([{", ".join(str(q) for q in _QSUM_QS)}]) AS q),
                 n
        ), est AS (
            SELECT t.q, t.target_rank, t.n,
                   min(c.val) FILTER (c.cw >= t.target_rank) AS est_val
            FROM targets t CROSS JOIN cum c
            GROUP BY 1, 2, 3
        )
        SELECT e.q, round(e.est_val, 2) AS est_val,
               CAST(e.target_rank AS BIGINT) AS target_rank,
               CAST((SELECT count(*) FROM v WHERE v.val <= e.est_val)
                    AS BIGINT) AS true_rank,
               abs((SELECT count(*) FROM v WHERE v.val <= e.est_val)
                   - e.target_rank) <= 2 * e.n / {_QSUM_B} AS rank_err_ok
        FROM est e
    """,
    doc="mergeable QUANTILE summary (the GK/KLL shape in the deterministic "
    "offset form, completing the mergeable-sketch family beside "
    "hll_mergeable_rollup and heavy_hitters_mergeable): each of "
    f"{_QSUM_SHARDS} portable-hash shards keeps every ceil(n_s/{_QSUM_B})-th "
    "order statistic weighted by the ranks it summarizes — per-shard rank "
    f"error <= n_s/{_QSUM_B}; merging = union the weighted points and walk "
    "cumulative weight, total error <= n/B by summation. Quantile estimate "
    "for target rank t = first merged point with cumweight >= t. The audit "
    "joins the EXACT rank of each estimate (one conditional count) and "
    "asserts containment within 2x the theoretical bound (slack absorbs "
    "value ties). Everything — shard ranks, kept points, merge walk, "
    "estimates — is deterministic and replayed bit-for-bit by the oracle, "
    "unlike stream-order-dependent GK. At 100 TB the kept-set is "
    f"{_QSUM_SHARDS}x{_QSUM_B} rows per merge level regardless of data "
    "size; only the audit's exact-rank count scans the data twice.",
)
def quantile_summary_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("val"),
        ((F.col("o_orderkey") * 2654435761) % 2147483647 % _QSUM_SHARDS).alias(
            "shard"
        ),
    )
    w_rank = Window.partitionBy("shard").orderBy("val", "k")
    ranked = o.select(
        "shard",
        "val",
        F.row_number().over(w_rank).alias("r"),
        F.count("*").over(Window.partitionBy("shard")).alias("ns"),
    )
    step = F.ceil(F.col("ns") / F.lit(float(_QSUM_B))).cast("long")
    kept = ranked.filter(
        (F.col("r") % step == 0) | (F.col("r") == F.col("ns"))
    )
    w_lag = Window.partitionBy("shard").orderBy("r")
    weighted = kept.select(
        "shard",
        "val",
        "r",
        (F.col("r") - F.coalesce(F.lag("r").over(w_lag), F.lit(0))).alias("w"),
    )
    w_cum = (
        Window.orderBy("val", "shard", "r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = weighted.select(
        "val", F.sum("w").over(w_cum).alias("cw")
    )  # <= SHARDS*(B+1) rows: the bounded merge walk
    n_df = o.agg(F.count("*").alias("n"))
    targets = (
        spark.range(1)
        .select(
            F.explode(F.array(*[F.lit(q) for q in _QSUM_QS])).alias("q")
        )
        # CROSSJOIN: 1-row count frame onto the fixed quantile-target list
        .crossJoin(F.broadcast(n_df))
        .select(
            "q",
            F.ceil(F.col("n") * F.col("q") / 100.0).cast("long").alias(
                "target_rank"
            ),
            "n",
        )
    )
    est = (
        # CROSSJOIN: inequality broadcast-NLJ onto the <= SHARDS*(B+1)-row
        # merge walk (bounded sketch state)
        targets.join(F.broadcast(cum), F.col("cw") >= F.col("target_rank"))
        .groupBy("q", "target_rank", "n")
        .agg(F.min("val").alias("est_val"))
    )
    # audit: exact rank of each estimate via one conditional count over v
    est_b = F.broadcast(est.select("q", "target_rank", "n", "est_val"))
    true_ranks = (
        # CROSSJOIN: |targets|-row estimate frame (fixed quantile list)
        o.crossJoin(est_b)
        .groupBy("q", "target_rank", "n", "est_val")
        .agg(
            F.sum((F.col("val") <= F.col("est_val")).cast("long")).alias(
                "true_rank"
            )
        )
    )
    return true_ranks.select(
        "q",
        F.round("est_val", 2).alias("est_val"),
        F.col("target_rank").cast("long").alias("target_rank"),
        F.col("true_rank").cast("long").alias("true_rank"),
        (
            F.abs(F.col("true_rank") - F.col("target_rank"))
            <= 2 * F.col("n") / _QSUM_B
        ).alias("rank_err_ok"),
    )


@register(
    "moving_median_7",
    oracle="""
        SELECT user_id, event_id, med7 FROM (
            SELECT user_id, event_id,
                   round(quantile_cont(value, 0.5) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
                   ), 4) AS med7,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ) WHERE rn >= 7
    """,
    doc="exact moving MEDIAN over a 7-row trailing frame per user — the "
    "robust smoother beside moving_average's mean (order statistics "
    "ignore spikes a mean absorbs). Output is restricted to FULL frames "
    "(rn >= 7): a 7-value median is a pure order statistic — "
    "permutation-invariant, no interpolation — so the engines agree "
    "bit-for-bit; partial even-count frames would interpolate, and "
    "Spark's lower+(upper-lower)*frac vs DuckDB's convex form differ in "
    "the last ulp (measured ~13% of random 2-value frames). One user_id "
    "exchange + per-partition sort shared by the frame and the "
    "row_number.",
)
def moving_median_7(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = w_ord.rowsBetween(-6, Window.currentRow)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.expr("percentile(value, 0.5)").over(w), 4).alias(
                "med7"
            ),
            F.row_number().over(w_ord).alias("rn"),
        )
        .filter(F.col("rn") >= 7)
        .drop("rn")
    )


@register(
    "time_weighted_avg_user",
    oracle="""
        WITH w AS (
            SELECT user_id, value,
                   epoch_ms(lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   )) - epoch_ms(ts) AS w_ms
            FROM events
        ), s AS (
            SELECT user_id,
                   round(sum(w_ms * value), 6) AS swx,
                   sum(w_ms) AS sw,
                   CAST(count(w_ms) AS BIGINT) AS n_intervals
            FROM w
            WHERE w_ms IS NOT NULL
            GROUP BY user_id
            HAVING sum(w_ms) > 0
        )
        SELECT user_id, n_intervals,
               CAST(sw AS BIGINT) AS total_ms,
               round(swx / sw, 4) + 0.0 AS twap
        FROM s
    """,
    doc="time-weighted average price/value per user (TWAP — the "
    "financial/IoT estimator that weights each observation by how long "
    "it REMAINED the current value, vs the naive mean that overweights "
    "bursts): interval weights from one lead() pass, then "
    "sum(w*x)/sum(w). Weight sums are exact integer milliseconds "
    "(BIGINT), the float numerator is rounded before the division "
    "(moments-first rule), so the ratio is bit-identical across "
    "engines. One user_id exchange total — window and aggregation "
    "share the same partitioning.",
)
def time_weighted_avg_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    weighted = ev.select(
        "user_id",
        "value",
        (F.unix_millis(F.lead("ts").over(w)) - F.unix_millis("ts")).alias(
            "w_ms"
        ),
    ).filter(F.col("w_ms").isNotNull())
    return (
        weighted.groupBy("user_id")
        .agg(
            F.round(F.sum(F.col("w_ms") * F.col("value")), 6).alias("swx"),
            F.sum("w_ms").alias("sw"),
            F.count("w_ms").alias("n_intervals"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "user_id",
            "n_intervals",
            F.col("sw").cast("long").alias("total_ms"),
            (F.round(F.col("swx") / F.col("sw"), 4) + F.lit(0.0)).alias(
                "twap"
            ),
        )
    )


@register(
    "incremental_rollup_merge",
    oracle="""
        WITH e AS (
            SELECT event_type, value, epoch_ms(ts) AS tms FROM events
        ), bounds AS (
            SELECT min(tms) AS t0, max(tms) AS t1 FROM e
        ), state AS (  -- "yesterday's" stored partial-agg state
            SELECT event_type, count(*) AS n, sum(value) AS s,
                   min(value) AS mn, max(value) AS mx
            FROM e CROSS JOIN bounds
            WHERE tms < t0 + (t1 - t0) // 2
            GROUP BY event_type
        ), delta AS (  -- today's new rows
            SELECT event_type, count(*) AS n, sum(value) AS s,
                   min(value) AS mn, max(value) AS mx
            FROM e CROSS JOIN bounds
            WHERE tms >= t0 + (t1 - t0) // 2
            GROUP BY event_type
        ), unioned AS (
            SELECT * FROM state UNION ALL SELECT * FROM delta
        ), merged AS (
            SELECT event_type, sum(n) AS n, sum(s) AS s,
                   min(mn) AS mn, max(mx) AS mx
            FROM unioned GROUP BY event_type
        ), full_rec AS (
            SELECT event_type, count(*) AS n, sum(value) AS s,
                   min(value) AS mn, max(value) AS mx
            FROM e GROUP BY event_type
        )
        SELECT m.event_type,
               CAST(m.n AS BIGINT) AS n_rows,
               round(m.s, 2) AS total,
               round(m.mn, 2) AS min_v,
               round(m.mx, 2) AS max_v,
               -- mean from the display-rounded sum in EXACT integer
               -- arithmetic: s_c = cents(s); mean_4dp = s_c*100/n rounded
               -- half-away as integers. round(round(s,2)/n, 4) re-rounds
               -- a terminating decimal at a coarser scale whenever n
               -- divides a power of 10 (n=2000 here) — the engine-
               -- divergent ...x50 boundary class (r5 hardening).
               sign(CAST(round(m.s * 100, 0) AS BIGINT))
                   * ((2 * abs(CAST(round(m.s * 100, 0) AS BIGINT)) * 100
                       + m.n) // (2 * m.n)) / 10000.0 + 0.0 AS mean_v,
               m.n = f.n AND m.mn = f.mn AND m.mx = f.mx
                   AND round(m.s, 2) = round(f.s, 2) AS matches_full_recompute
        FROM merged m JOIN full_rec f ON m.event_type = f.event_type
    """,
    doc="incremental materialized-view maintenance: 'yesterday's' stored "
    "partial-agg state (count/sum/min/max over the first half of the "
    "timeline) MERGED with today's delta by pure state algebra — "
    "sum-of-counts, sum-of-sums, min-of-mins, max-of-maxes — with the "
    "derived mean computed from merged state, never from raw history. "
    "The audit column proves merged state == full recompute per group "
    "(counts/min/max exactly; sums at display rounding — float "
    "summation order differs by construction, which is exactly why "
    "production incremental rollups store compensated or decimal sums). "
    "This is the algebraic-aggregate contract that lets a 100 TB rollup "
    "process only the daily delta: the history is never rescanned, only "
    "its O(groups) state vector is.",
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "value", F.unix_millis("ts").alias("tms")
    )
    bounds = e.agg(F.min("tms").alias("t0"), F.max("tms").alias("t1"))
    # CROSSJOIN: 1-row (t0, t1) time-bounds frame
    tagged = e.crossJoin(F.broadcast(bounds)).withColumn(
        "is_state",
        F.col("tms") < F.col("t0") + F.floor((F.col("t1") - F.col("t0")) / 2),
    )

    def _partial(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    state = _partial(tagged.filter("is_state"))
    delta = _partial(tagged.filter("NOT is_state"))
    merged = (
        state.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    full_rec = _partial(e).select(
        F.col("event_type"),
        F.col("n").alias("fn"),
        F.col("s").alias("fs"),
        F.col("mn").alias("fmn"),
        F.col("mx").alias("fmx"),
    )
    return merged.join(full_rec, "event_type").select(
        "event_type",
        F.col("n").cast("long").alias("n_rows"),
        F.round("s", 2).alias("total"),
        F.round("mn", 2).alias("min_v"),
        F.round("mx", 2).alias("max_v"),
        # mean from the DISPLAY-ROUNDED sum in EXACT integer arithmetic
        # (see oracle comment): round(round(s,2)/n, 4) re-rounds a
        # terminating decimal at a coarser scale when n | 10^k — the
        # engine-divergent ...x50 boundary class
        (
            F.signum(F.round(F.col("s") * 100, 0))
            * F.expr(
                "div(2 * abs(cast(round(s * 100, 0) as bigint)) * 100 + n,"
                " 2 * n)"
            )
            / F.lit(10_000.0)
            + F.lit(0.0)
        ).alias("mean_v"),
        (
            (F.col("n") == F.col("fn"))
            & (F.col("mn") == F.col("fmn"))
            & (F.col("mx") == F.col("fmx"))
            & (F.round("s", 2) == F.round("fs", 2))
        ).alias("matches_full_recompute"),
    )


# --------------------------------------------------------------------------
# Join-skew diagnosis — the profiling twin of salted_join_user_nation
# --------------------------------------------------------------------------

_SKEW_TOP = 20


@register(
    "join_skew_diagnosis",
    oracle=f"""
    WITH l AS (
        SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt_left
        FROM events GROUP BY 1
    ), r AS (
        SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS cnt_right
        FROM orders GROUP BY 1
    ), d AS (
        SELECT l.key, l.cnt_left, r.cnt_right,
               l.cnt_left * r.cnt_right AS est_rows
        FROM l JOIN r ON l.key = r.key
    ), tot AS (
        SELECT CAST(sum(est_rows) AS BIGINT) AS total_est,
               CAST(sum(cnt_left) AS BIGINT) AS total_left,
               CAST(count(*) AS BIGINT) AS nkeys
        FROM d
    )
    SELECT d.key, d.cnt_left, d.cnt_right,
           CAST(d.est_rows AS BIGINT) AS est_rows,
           CAST((d.est_rows * 1000 * t.nkeys) // t.total_est AS BIGINT)
               AS amp_x1000,
           CAST((d.cnt_left * t.nkeys + t.total_left - 1) // t.total_left
                AS BIGINT) AS salt_n
    FROM d CROSS JOIN tot t
    ORDER BY est_rows DESC, d.key
    LIMIT {_SKEW_TOP}
    """,
    doc="join-skew diagnosis for events⋈orders on user_id=o_custkey — the "
    "pre-flight profiling step whose OUTPUT feeds the registered "
    "mitigation (salted_join_user_nation / operators/skew.py): per join "
    "key, both sides' row counts, the exact join output this key will "
    "produce (cnt_left*cnt_right — the quantity AQE's skew-join splits "
    "on), its amplification vs the average key in exact integer "
    "per-mille (est*1000*nkeys // total_est; no float ratio anywhere, "
    "so the r14 boundary-hazard audit passes vacuously), and the "
    "recommended salting fan-out ceil(cnt_left/avg_left) computed as "
    "pure-BIGINT ceiling division (cnt*nkeys + total - 1) // total. "
    f"Deterministic top-{_SKEW_TOP} hot keys by (est_rows DESC, key). "
    "Overflow envelope: est_rows*1000*nkeys < 2^63 holds to ~9.2e15 "
    "key-pair products — beyond, widen to DECIMAL(38,0) (the "
    "basket_pair_rules escape hatch). Scale: both inputs reduce to "
    "per-key count tables in ONE groupBy each (map-side partial "
    "aggregation), the diagnosis join is key-count-sized (not "
    "fact-sized), the totals frame is 1 row broadcast back, and the "
    "top-k is TakeOrderedAndProject — the whole profile costs two "
    "fact scans regardless of corpus size. Reference has no "
    "counterpart (its joins are dimension lookups, "
    "scripts/process_silver_to_gold.py:101).",
)
def join_skew_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    left = e.groupBy(F.col("user_id").alias("key")).agg(
        F.count("*").alias("cnt_left")
    )
    right = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("cnt_right")
    )
    d = left.join(right, "key").select(
        "key",
        "cnt_left",
        "cnt_right",
        (F.col("cnt_left") * F.col("cnt_right")).alias("est_rows"),
    )
    tot = d.agg(
        F.sum("est_rows").cast("long").alias("total_est"),
        F.sum("cnt_left").cast("long").alias("total_left"),
        F.count("*").alias("nkeys"),
    )
    return (
        # CROSSJOIN: 1-row totals frame onto the key-count table — bounded
        d.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt_left",
            "cnt_right",
            F.col("est_rows").cast("long").alias("est_rows"),
            F.expr("div(est_rows * 1000 * nkeys, total_est)")
            .cast("long")
            .alias("amp_x1000"),
            F.expr("div(cnt_left * nkeys + total_left - 1, total_left)")
            .cast("long")
            .alias("salt_n"),
        )
        .orderBy(F.desc("est_rows"), "key")
        .limit(_SKEW_TOP)
    )
