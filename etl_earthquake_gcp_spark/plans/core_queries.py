"""Core relational queries — SURVEY.md §2.2-§2.8 operator coverage.

Each query cites the reference operator(s) it re-expresses (file:line refer to
/root/reference). All run on the driver testdata star schema (TESTDATA.md).

Scale notes are inline: the local plan is checked with .explain("formatted")
in tests/test_plans.py — broadcast joins for KB-scale dims, partial aggregation
before every shuffle, filters/projections pushed into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

# --------------------------------------------------------------------------
# Tier 0 flagship — multi-hop star join + group-count
# (§2.8-6 "events by country" re-targeted; J1/J2 joins, A6 agg;
#  reference: process_silver_to_gold.py:115-119 + visuals/c9ef1058)
# --------------------------------------------------------------------------


@register(
    "flagship_events_by_region",
    oracle="""
        SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_events,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    doc="5-way star join + group-count/sum (SURVEY §2.8-6, J1/J2, A6). "
    "nation/region are broadcast; customer⋈orders⋈lineitem shuffle on keys.",
    bench=True,
)
def flagship_events_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # nation/region are FIXED-size dims (25/5 rows) → hint them broadcast.
    # customer GROWS with SF (15B rows at the 100 TB point) → unhinted:
    # the planner's size stats broadcast it at small SF and shuffle
    # orders⋈customer on custkey at scale — the doc contract ("customer ⋈
    # orders ⋈ lineitem shuffle on keys") without forcing either shape.
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


# --------------------------------------------------------------------------
# Pricing summary — TPC-H Q1 shape (A1/A2/A7 aggregate suite, P5 casts)
# --------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 2) AS avg_qty,
               round(avg(l_extendedprice), 2) AS avg_price,
               round(avg(l_discount), 2) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped aggregate suite (A1/A7 global+grouped aggs). "
    "Single scan, map-side partial agg, 6-group output.",
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# P6 — conjunctive validation filter (process_bronze_to_silver.py:103-109:
# isNotNull × N AND between-range × N), row-level output
# --------------------------------------------------------------------------


@register(
    "validation_filter",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_returnflag, l_shipdate
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
          AND l_discount IS NOT NULL AND l_returnflag IS NOT NULL
          AND l_quantity BETWEEN 1 AND 30
          AND l_discount BETWEEN 0.02 AND 0.08
          AND l_extendedprice >= 0 AND l_extendedprice < 50000
    """,
    doc="11-term conjunctive validation filter (P6, b2s.py:103-109). "
    "Catalyst pushes the whole predicate into the parquet scan.",
)
def validation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
        & F.col("l_discount").isNotNull()
        & F.col("l_returnflag").isNotNull()
        & F.col("l_quantity").between(1, 30)
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_extendedprice") >= 0)
        & (F.col("l_extendedprice") < 50000)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
        "l_shipdate",
    )


# --------------------------------------------------------------------------
# F3 — when/otherwise CASE buckets (magnitude_category analog,
# process_bronze_to_silver.py:119-130) + A6 count-by-group
# --------------------------------------------------------------------------

# bucket edges mirror the reference's 7-way magnitude CASE (Micro..Great)
_PRICE_BUCKETS = (
    ("Micro", 500.0),
    ("Minor", 1000.0),
    ("Light", 2000.0),
    ("Moderate", 5000.0),
    ("Strong", 10000.0),
    ("Major", 50000.0),
)


def price_category(col: F.Column) -> F.Column:
    """7-way CASE chain, same shape as magnitude_category (b2s.py:119-126)."""
    expr = None
    for label, hi in _PRICE_BUCKETS:
        cond = col < hi
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise("Great")


@register(
    "case_buckets",
    oracle="""
        SELECT CASE WHEN p_retailprice < 500 THEN 'Micro'
                    WHEN p_retailprice < 1000 THEN 'Minor'
                    WHEN p_retailprice < 2000 THEN 'Light'
                    WHEN p_retailprice < 5000 THEN 'Moderate'
                    WHEN p_retailprice < 10000 THEN 'Strong'
                    WHEN p_retailprice < 50000 THEN 'Major'
                    ELSE 'Great' END AS price_category,
               CASE WHEN p_size <= 15 THEN 'Shallow'
                    WHEN p_size <= 35 THEN 'Intermediate'
                    ELSE 'Deep' END AS size_category,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(p_retailprice), 2) AS avg_price
        FROM part
        GROUP BY 1, 2
    """,
    doc="7-way + 3-way when/otherwise CASE chains (F3, b2s.py:119-130) "
    "+ count-by-group (A6).",
)
def case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    size_cat = (
        F.when(F.col("p_size") <= 15, "Shallow")
        .when(F.col("p_size") <= 35, "Intermediate")
        .otherwise("Deep")
    )
    return (
        p.withColumn("price_category", price_category(F.col("p_retailprice")))
        .withColumn("size_category", size_cat)
        .groupBy("price_category", "size_category")
        .agg(F.count("*").alias("n"), F.round(F.avg("p_retailprice"), 2).alias("avg_price"))
    )


# --------------------------------------------------------------------------
# F5/F6 — regexp_extract + trim (region extraction analog, b2s.py:138-141)
# --------------------------------------------------------------------------


@register(
    "regex_extract",
    oracle="""
        SELECT p_partkey,
               trim(regexp_extract(p_name, '^(\\w+)', 1)) AS first_word,
               CAST(regexp_extract(p_brand, '#(\\d+)$', 1) AS BIGINT) AS brand_num,
               CAST(regexp_extract(c.c_name, '(\\d+)$', 1) AS BIGINT) AS cust_num
        FROM part p
        JOIN customer c ON p.p_partkey % 1500 = c.c_custkey
    """,
    doc="regexp_extract group-1 + trim + cast (F5/F6, b2s.py:138-141 "
    "extracted_region/extracted_country pattern).",
)
def regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    c = load_table(spark, sf_dir, "customer")
    return (
        # both part and customer scale with SF — no broadcast hint; the
        # planner broadcasts the smaller side at test scale, shuffles at 100 TB
        p.join(c, p.p_partkey % 1500 == c.c_custkey)
        .select(
            "p_partkey",
            F.trim(F.regexp_extract("p_name", r"^(\w+)", 1)).alias("first_word"),
            F.regexp_extract("p_brand", r"#(\d+)$", 1).cast("long").alias("brand_num"),
            F.regexp_extract("c_name", r"(\d+)$", 1).cast("long").alias("cust_num"),
        )
    )


# --------------------------------------------------------------------------
# A5/W1 — ordered dedup: latest row per key via row_number window
# (b2s.py:112-113) and the scale-friendly max_by rewrite (SURVEY §4)
# --------------------------------------------------------------------------

_LATEST_EVENT_ORACLE = """
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


@register(
    "latest_event_dedup",
    oracle=_LATEST_EVENT_ORACLE,
    doc="argmax-per-group dedup via row_number window (A5/W1, b2s.py:112-113). "
    "Deterministic tie-break on event_id.",
    bench=True,
)
def latest_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@register(
    "latest_event_dedup_maxby",
    oracle=_LATEST_EVENT_ORACLE,
    doc="Same semantics as latest_event_dedup but as a max_by aggregate — "
    "partial (map-side) aggregation instead of a full per-key sort; the plan "
    "that survives 100 TB (SURVEY §4 'dedup strategy').",
    bench=True,
)
def latest_event_dedup_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # order key (ts, event_id) packed in a struct → lexicographic max;
    # payload struct carries the row. Aggregate combines map-side, so the
    # shuffle moves one row per (partition, key) instead of every row.
    payload = F.struct("event_id", "ts", "user_id", "event_type", "value")
    order = F.struct("ts", "event_id")
    return (
        e.groupBy("user_id")
        .agg(F.max_by(payload, order).alias("r"))
        .select("r.event_id", "r.ts", "r.user_id", "r.event_type", "r.value")
    )


# --------------------------------------------------------------------------
# A3 — distinct projection (dim_location/dim_event_type builders,
# process_silver_to_gold.py:82-86,105-106) with deterministic surrogate key
# --------------------------------------------------------------------------


@register(
    "distinct_dim_with_key",
    oracle="""
        SELECT CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS type_key,
               event_type
        FROM (SELECT DISTINCT event_type FROM events)
    """,
    doc="distinct projection + deterministic surrogate key (A3 + F9 rewrite: "
    "row_number over natural key instead of monotonically_increasing_id, "
    "per SURVEY §5.1).",
)
def distinct_dim_with_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.orderBy("event_type")
    return (
        e.select("event_type")
        .distinct()
        .withColumn("type_key", F.row_number().over(w).cast("long"))
        .select("type_key", "event_type")
    )


# --------------------------------------------------------------------------
# A6 hierarchy — rollup over the date hierarchy (the BI line chart's
# Year/Quarter/Month drill, visuals/5f9dd473; SURVEY §2.4 note)
# --------------------------------------------------------------------------


@register(
    "date_hierarchy_rollup",
    oracle="""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
               CAST(month(o_orderdate) AS BIGINT) AS o_month,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY ROLLUP (1, 2, 3)
    """,
    doc="ROLLUP over Year/Quarter/Month (A6 hierarchy, visuals/5f9dd473). "
    "Spark plans one Expand + single shuffle — no per-level rescans.",
    bench=True,
)
def date_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.quarter("o_orderdate").cast("long").alias("o_quarter"),
            F.month("o_orderdate").cast("long").alias("o_month"),
            "o_totalprice",
        )
        .rollup("o_year", "o_quarter", "o_month")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# A1/A7/A8/A9/A10 — global KPI card aggregates (§2.8-1..4)
# --------------------------------------------------------------------------


@register(
    "global_kpis",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               round(avg(o_totalprice), 2) AS avg_price,
               round(max(o_totalprice), 2) AS max_price,
               round(min(o_totalprice), 2) AS min_price,
               CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT)
                   AS n_finished,
               min(o_orderdate) AS min_date,
               max(o_orderdate) AS max_date
        FROM orders
    """,
    doc="KPI cards: count / distinct count / avg / max / min / filtered count "
    "/ global min-max timestamps (A1, A2, A7-A10; §2.8-1..4).",
)
def global_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


@register(
    "approx_distinct_events",
    oracle=None,  # approximate by design → rows-only check (SURVEY A10 note)
    doc="approx_count_distinct (HLL++) — the 100 TB tier of DistinctCount "
    "(A10). No oracle: approximate by construction; exactness asserted "
    "within rsd in tests/test_plans.py.",
)
def approx_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.approx_count_distinct("event_id", 0.01).alias("approx_events"),
    )


@register(
    "approx_distinct_audit",
    oracle="""
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
               CAST(count(DISTINCT event_id) AS BIGINT) AS exact_events,
               TRUE AS users_ok,
               TRUE AS events_ok
        FROM events
    """,
    doc="oracle-checkable audit of approx_count_distinct (the "
    "minhash_candidate_quality / ann_recall_audit pattern, r3 verdict #1 "
    "generalized): one pass computes BOTH the exact distinct counts and "
    "the HLL++ estimates (rsd 0.01), and emits the exact counts plus "
    "booleans asserting the estimate sits within 5x the configured rsd. "
    "The oracle recomputes the exact counts and expects TRUE — a broken "
    "sketch (wrong register merge, precision regression) hash-fails the "
    "driver row instead of hiding behind approx_distinct_events' "
    "rows-only check. Same single-shuffle plan as the underlying query: "
    "partial HLL registers + partial distinct maps combine map-side.",
)
def approx_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # exact and approx in SEPARATE aggregations, 1-row cross join after:
    # mixing countDistinct with approx_count_distinct in one agg makes
    # Catalyst expand per distinct column and drag the full HLL register
    # state (3k+ fields) through a per-(value, gid) group-by — gigabytes
    # of agg state at sf0.1. Split, each side is a clean one-pass plan.
    exact = e.agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count_distinct("event_id").alias("exact_events"),
    )
    approx = e.agg(
        F.approx_count_distinct("user_id", 0.01).alias("au"),
        F.approx_count_distinct("event_id", 0.01).alias("ae"),
    )
    # CROSSJOIN: two 1-row aggregates (exact vs approx)
    agg = exact.join(F.broadcast(approx))
    # 5% tolerance = 5x the configured rsd; HLL++ error at these
    # cardinalities is far inside it, a broken sketch is far outside.
    return agg.select(
        "exact_users",
        "exact_events",
        (
            F.abs(F.col("au") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("users_ok"),
        (
            F.abs(F.col("ae") - F.col("exact_events"))
            <= 0.05 * F.col("exact_events")
        ).alias("events_ok"),
    )


# --------------------------------------------------------------------------
# A11 — sum by two keys + series (geo-bubble analog, visuals/c34c0905)
# --------------------------------------------------------------------------


@register(
    "sum_by_two_keys",
    oracle="""
        SELECT l_suppkey, l_returnflag,
               round(sum(l_extendedprice), 2) AS sum_price,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY l_suppkey, l_returnflag
    """,
    doc="sum-by-2-keys + series (A11, geo bubble visuals/c34c0905).",
)
def sum_by_two_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_suppkey", "l_returnflag").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# O2 — top-k (TakeOrderedAndProject; API-limit analog cloud_function/main.py:69)
# --------------------------------------------------------------------------


@register(
    "top_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    doc="top-k with unique tie-break (O2). Spark plans TakeOrderedAndProject: "
    "per-partition heap + driver merge, no global sort.",
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


# --------------------------------------------------------------------------
# O3 + set ops — union / intersect / except (train_tsunami_model.py:66)
# --------------------------------------------------------------------------


@register(
    "union_priorities",
    oracle="""
        SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    doc="bag union of two filters (O3, train.py:66 downsample ∪ minority).",
)
def union_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey", "o_orderpriority")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_orderkey", "o_orderpriority")
    return a.unionByName(b)


@register(
    "nation_set_ops",
    oracle="""
        SELECT n_nationkey, 'both' AS side FROM (
            SELECT c_nationkey AS n_nationkey FROM customer
            INTERSECT
            SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT n_nationkey, 'customer_only' AS side FROM (
            SELECT c_nationkey AS n_nationkey FROM customer
            EXCEPT
            SELECT s_nationkey FROM supplier)
    """,
    doc="INTERSECT / EXCEPT set-op parity (SURVEY §2.6 note).",
)
def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey"))
    both = c.intersect(s).withColumn("side", F.lit("both"))
    # subtract == EXCEPT DISTINCT (set semantics, matching the SQL oracle)
    only = c.subtract(s).withColumn("side", F.lit("customer_only"))
    return both.unionByName(only)


# --------------------------------------------------------------------------
# Window suite — rank/dense_rank/lag/lead + frame-spec moving average
# (extension of W1 per SURVEY §2.5)
# --------------------------------------------------------------------------


@register(
    "window_rank_suite",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               lag(l_extendedprice) OVER w AS prev_price,
               lead(l_extendedprice) OVER w AS next_price
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
        QUALIFY rn <= 20
    """,
    doc="row_number/rank/dense_rank/lag/lead over one window (W1 extension, "
    "SURVEY §2.5); top-20 per supplier keeps output bounded.",
    bench=True,
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        l.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.lag("l_extendedprice").over(w).alias("prev_price"),
            F.lead("l_extendedprice").over(w).alias("next_price"),
        )
        .filter(F.col("rn") <= 20)
    )


@register(
    "moving_average",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(avg(l_extendedprice) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3,
               round(sum(l_quantity) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_qty
        FROM lineitem
    """,
    doc="rowsBetween frame specs: 3-row moving average + running total "
    "(SURVEY §2.5 extension).",
)
def moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.avg("l_extendedprice").over(w.rowsBetween(-2, 0)), 4).alias("ma3"),
        F.round(
            F.sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_qty"),
    )


# --------------------------------------------------------------------------
# F4/F8/F10 — date-part extraction + DateKey (b2s.py:133-137, s2g.py:64-75,112)
# --------------------------------------------------------------------------


@register(
    "date_parts",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
               CAST(month(o_orderdate) AS BIGINT) AS o_month,
               monthname(o_orderdate) AS month_name,
               CAST(day(o_orderdate) AS BIGINT) AS day_of_month,
               CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS day_of_week,
               dayname(o_orderdate) AS day_name,
               dayofweek(o_orderdate) IN (0, 6) AS is_weekend,
               CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS date_key
        FROM orders
    """,
    doc="date parts, names, weekend flag, yyyyMMdd DateKey (F4/F8/F10; "
    "b2s.py:133-137, s2g.py:64-75,112). Spark dayofweek is already Sun=1 "
    "(SURVEY §7 convention risk — DuckDB is Sun=0, oracle adds 1).",
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("o_year"),
        F.quarter(d).cast("long").alias("o_quarter"),
        F.month(d).cast("long").alias("o_month"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.dayofmonth(d).cast("long").alias("day_of_month"),
        F.dayofweek(d).cast("long").alias("day_of_week"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.dayofweek(d).isin(1, 7).alias("is_weekend"),
        F.date_format(d, "yyyyMMdd").cast("long").alias("date_key"),
    )


# --------------------------------------------------------------------------
# S8 — distributed dim_date generation: sequence + explode
# (replaces the reference's driver-side python loop, s2g.py:53-78)
# --------------------------------------------------------------------------


@register(
    "dim_date_generated",
    oracle="""
        WITH bounds AS (
            SELECT CAST(min(o_orderdate) AS DATE) AS lo,
                   CAST(max(o_orderdate) AS DATE) + INTERVAL 30 DAY AS hi
            FROM orders
        ), days AS (
            SELECT CAST(unnest(generate_series(lo, CAST(hi AS DATE),
                                               INTERVAL 1 DAY)) AS DATE) AS full_date
            FROM bounds
        )
        SELECT CAST(strftime(full_date, '%Y%m%d') AS BIGINT) AS date_key,
               CAST(full_date AS TIMESTAMP) AS full_date,
               CAST(year(full_date) AS BIGINT) AS d_year,
               CAST(quarter(full_date) AS BIGINT) AS d_quarter,
               CAST(month(full_date) AS BIGINT) AS d_month,
               monthname(full_date) AS month_name,
               CAST(day(full_date) AS BIGINT) AS day_of_month,
               CAST(dayofweek(full_date) + 1 AS BIGINT) AS day_of_week,
               dayname(full_date) AS day_name,
               dayofweek(full_date) IN (0, 6) AS is_weekend
        FROM days
    """,
    doc="dim_date built distributed via sequence()+explode over the fact's "
    "min..max+30d range (S8 idiomatic rewrite of s2g.py:53-78 driver loop; "
    "scalar-subquery bounds, no .first() driver roundtrip).",
)
def dim_date_generated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_for_dim_date")
    # scalar subqueries keep the min/max inside the plan (no driver roundtrip);
    # sequence+explode generates the calendar distributed (S8 note, SURVEY §2.1)
    return spark.sql(
        """
        WITH days AS (
            SELECT explode(sequence(
                (SELECT to_date(min(o_orderdate)) FROM orders_for_dim_date),
                date_add((SELECT to_date(max(o_orderdate))
                          FROM orders_for_dim_date), 30))) AS full_date
        )
        SELECT CAST(date_format(full_date, 'yyyyMMdd') AS BIGINT) AS date_key,
               -- TIMESTAMP (not DATE) on both sides: Spark DATE collects as
               -- python date objects while DuckDB DATE → datetime64, which
               -- can hash differently in a pandas-based comparator
               CAST(full_date AS TIMESTAMP) AS full_date,
               CAST(year(full_date) AS BIGINT) AS d_year,
               CAST(quarter(full_date) AS BIGINT) AS d_quarter,
               CAST(month(full_date) AS BIGINT) AS d_month,
               date_format(full_date, 'MMMM') AS month_name,
               CAST(day(full_date) AS BIGINT) AS day_of_month,
               CAST(dayofweek(full_date) AS BIGINT) AS day_of_week,
               date_format(full_date, 'EEEE') AS day_name,
               dayofweek(full_date) IN (1, 7) AS is_weekend
        FROM days
        """
    )


# --------------------------------------------------------------------------
# JSON extraction — events.props (Bronze-flattening capability class,
# SURVEY §2.7 JSON note; P1-P3 analog on a JSON string column)
# --------------------------------------------------------------------------


@register(
    "json_extract_props",
    oracle="""
        SELECT event_id, event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
    doc="get_json_object over a JSON-string column + filter on the extracted "
    "value (Bronze flatten capability class, SURVEY §2.7).",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.withColumn("props_k", k)
        .filter(F.col("props_k") >= 50)
        .select("event_id", "event_type", "props_k")
    )


# --------------------------------------------------------------------------
# §2.9 batch analog — tumbling daily windows over the events stream table
# (the streaming variant lives in streaming/jobs.py; same semantics)
# --------------------------------------------------------------------------


@register(
    "tumbling_daily_counts",
    oracle="""
        SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="tumbling 1-day window counts per event_type (§2.9 batch analog of "
    "the streaming job; F.window ≡ DuckDB time_bucket, both epoch-aligned).",
)
def tumbling_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "variant_extract_props",
    # same oracle shape as json_extract_props — VARIANT must not change results
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS max_k
        FROM events
        GROUP BY 1
    """,
    doc="semi-structured access through Spark 4's VARIANT type: parse_json "
    "once into a binary variant, variant_get typed paths after — the "
    "modern replacement for repeated get_json_object string re-parses "
    "(each get_json_object re-tokenizes the JSON text; a variant parses "
    "once and serves every path from the binary encoding). Differential "
    "twin of json_extract_props' capability class; oracle via DuckDB "
    "json_extract_string.",
)
def variant_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )
