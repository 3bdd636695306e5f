"""Scalar & aggregate function breadth (F-class extensions).

The reference exercises a narrow scalar surface (§2.7 F1-F12); these suites
cover the adjacent families a production engine is expected to have, each
pinned to DuckDB's implementation of the same ANSI semantics. Only
engine-agreeing functions are included (e.g. stddev_samp/corr are standard;
kurtosis is excluded — its sample correction differs across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


@register(
    "window_distribution_suite",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume,
               CAST(nth_value(o_orderkey, 1) OVER (
                   w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS first_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    doc="distribution window functions (completes the W1 extension set): "
    "ntile quartiles, percent_rank, cume_dist, nth_value — same per-key "
    "sort as the rank suite, no extra exchange.",
)
def window_distribution_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_orderkey", 1).over(wf).cast("long").alias("first_order"),
    )


@register(
    "stats_agg_suite",
    oracle="""
        SELECT event_type,
               round(stddev_samp(value), 4) AS sd_value,
               round(var_samp(value), 4) AS var_value,
               round(corr(value, epoch_ms(ts)), 4) + 0.0 AS corr_value_time,
               round(covar_samp(value, user_id), 4) + 0.0 AS covar_value_user,
               round(avg(value), 4) AS mean_value
        FROM events
        GROUP BY event_type
    """,
    doc="statistical aggregates (A-class extension): sample stddev/variance, "
    "Pearson correlation, sample covariance — all single-pass partial "
    "aggregates (sum/sum-of-squares/cross-moments combine associatively, "
    "so map-side combine holds at any scale).",
)
def stats_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.round(F.var_samp("value"), 4).alias("var_value"),
        # + 0.0 normalizes IEEE -0.0 — the signed moments can round to zero
        # from below and the engines disagree on round's sign preservation
        (F.round(F.corr("value", F.unix_millis("ts")), 4) + F.lit(0.0)).alias(
            "corr_value_time"
        ),
        (F.round(F.covar_samp("value", "user_id"), 4) + F.lit(0.0)).alias(
            "covar_value_user"
        ),
        F.round(F.avg("value"), 4).alias("mean_value"),
    )


@register(
    "grouped_ols_trend",
    oracle="""
        WITH m AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(hour(ts)) AS BIGINT) AS sx,
                   CAST(sum(hour(ts) * hour(ts)) AS BIGINT) AS sxx,
                   round(sum(value), 4) AS sy,
                   round(sum(hour(ts) * value), 4) AS sxy
            FROM events
            WHERE value IS NOT NULL AND ts IS NOT NULL
            GROUP BY event_type
        )
        SELECT event_type, n,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0
                   AS slope,
               round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                     / n, 4) + 0.0 AS intercept
        FROM m
        WHERE n * sxx - sx * sx <> 0
    """,
    doc="per-group closed-form OLS trend (value vs hour-of-day): slope and "
    "intercept from the normal equations over plain associative moments "
    "(n, Sx, Sxx, Sy, Sxy) — the grouped-regression shape MLlib cannot "
    "express without per-group model loops, done in ONE partial-agg pass "
    "that map-side-combines at any scale. Float moments are rounded "
    "BEFORE the closed-form arithmetic (registry determinism rule: "
    "combine-order drift dies at the moment boundary, so the downstream "
    "division is bit-identical across engines); integer moments stay "
    "exact longs.",
)
def grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    x = F.hour("ts").cast("long")
    m = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.round(F.sum("value"), 4).alias("sy"),
        F.round(F.sum(x * F.col("value")), 4).alias("sxy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    # zero x-variance groups (single row, or all events in one hour) have
    # no defined slope — dropped on BOTH sides rather than letting ANSI
    # mode raise DIVIDE_BY_ZERO while DuckDB returns inf
    return m.filter(den != 0).select(
        "event_type",
        "n",
        (F.round(slope, 6) + F.lit(0.0)).alias("slope"),
        (F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4) + F.lit(0.0)).alias(
            "intercept"
        ),
    )


@register(
    "string_ops_suite",
    oracle="""
        SELECT n_name,
               upper(n_name) AS upper_name,
               CAST(length(n_name) AS BIGINT) AS name_len,
               substr(n_name, 1, 3) AS prefix3,
               lpad(n_name, 12, '.') AS padded,
               replace(n_name, 'A', '@') AS replaced,
               reverse(n_name) AS reversed,
               CAST(levenshtein(n_name, 'CANADA') AS BIGINT) AS dist_to_canada,
               concat_ws('-', n_name, CAST(n_nationkey AS VARCHAR)) AS keyed
        FROM nation
    """,
    doc="string function family: case, length, substring, padding, "
    "replace, reverse, Levenshtein edit distance, delimited concat — "
    "per-row Catalyst expressions, fully codegen'd.",
)
def string_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.upper("n_name").alias("upper_name"),
        F.length("n_name").cast("long").alias("name_len"),
        F.substring("n_name", 1, 3).alias("prefix3"),
        F.lpad("n_name", 12, ".").alias("padded"),
        F.replace("n_name", F.lit("A"), F.lit("@")).alias("replaced"),
        F.reverse("n_name").alias("reversed"),
        F.levenshtein("n_name", F.lit("CANADA")).cast("long").alias("dist_to_canada"),
        F.concat_ws("-", "n_name", F.col("n_nationkey").cast("string")).alias("keyed"),
    )


@register(
    "array_ops_suite",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        )
        SELECT doc_id,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
               list_contains(toks, 'the') AS has_the,
               array_to_string(toks[1:3], '|') AS first3,
               array_to_string(list_sort(list_distinct(toks)), '|') AS vocab_joined
        FROM t
    """,
    doc="array function family over token arrays: distinct, sort, "
    "membership, slicing, join-to-string — higher-order array ops stay "
    "JVM-side (no explode needed when per-row semantics suffice). "
    "Array-valued columns are flattened to strings in the compared frame "
    "(array collection types differ across pandas bridges).",
)
def array_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    vocab = F.array_sort(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_join(F.slice(toks, 1, 3), "|").alias("first3"),
        F.array_join(vocab, "|").alias("vocab_joined"),
    )


@register(
    "null_handling_suite",
    oracle="""
        SELECT o_orderkey,
               coalesce(nullif(o_orderstatus, 'P'), '(pending)') AS status_or_tag,
               CASE WHEN o_totalprice IS NULL THEN -1.0
                    ELSE o_totalprice END AS price_nvl,
               (o_totalprice IS NOT NULL AND o_totalprice > 100000)
                   AS pricey_strict,
               ifnull(NULL, CAST(o_custkey AS BIGINT)) AS custkey_filled
        FROM orders
    """,
    doc="null-handling family: nullif/coalesce/ifnull and three-valued "
    "logic made explicit — the compared frame is NULL-free by "
    "construction, per the oracle conventions.",
)
def null_handling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("(pending)")).alias(
            "status_or_tag"
        ),
        F.when(F.col("o_totalprice").isNull(), F.lit(-1.0))
        .otherwise(F.col("o_totalprice"))
        .alias("price_nvl"),
        (F.col("o_totalprice").isNotNull() & (F.col("o_totalprice") > 100000)).alias(
            "pricey_strict"
        ),
        F.ifnull(F.lit(None), F.col("o_custkey").cast("long")).alias("custkey_filled"),
    )


@register(
    "weighted_avg_order_price",
    oracle="""
        SELECT o_orderpriority,
               round(sum(o_totalprice * (o_orderkey % 5 + 1)), 2) AS wsum,
               round(sum(o_orderkey % 5 + 1) * 1.0, 2) AS wtot,
               round(round(sum(o_totalprice * (o_orderkey % 5 + 1)), 2)
                     / round(sum(o_orderkey % 5 + 1) * 1.0, 2), 4) AS wavg
        FROM orders GROUP BY o_orderpriority
    """,
    doc="weighted average (sum(x·w)/sum(w)) per priority — the weighted-"
    "aggregate capability class. Both sums are rounded BEFORE the "
    "division (registry convention: combine-order float drift must not "
    "reach downstream arithmetic), so the quotient is bit-identical "
    "across engines. Single partial-agg shuffle.",
)
def weighted_avg_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = F.col("o_orderkey") % 5 + 1
    wsum = F.round(F.sum(F.col("o_totalprice") * w), 2)
    wtot = F.round(F.sum(w) * F.lit(1.0), 2)
    return o.groupBy("o_orderpriority").agg(
        wsum.alias("wsum"),
        wtot.alias("wtot"),
        F.round(wsum / wtot, 4).alias("wavg"),
    )


@register(
    "value_mad_robust",
    oracle="""
        WITH med AS (
            SELECT event_type,
                   round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6)
                       AS med
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               any_value(m.med) AS median_value,
               round(percentile_cont(0.5) WITHIN GROUP
                     (ORDER BY abs(e.value - m.med)), 4) AS mad
        FROM events e JOIN med m ON e.event_type = m.event_type
        GROUP BY e.event_type
    """,
    doc="median absolute deviation per group — the robust-statistics "
    "dispersion measure (outlier-resistant twin of stddev in "
    "stats_agg_suite). Two aggregation passes: group medians (rounded to "
    "6 before re-use, per the moment-pinning convention), broadcast back "
    "onto facts, then the median of absolute deviations. Exact "
    "interpolated percentiles on both engines.",
)
def value_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("median_value"),
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 4
            ).alias("mad"),
        )
    )


@register(
    "map_ops_suite",
    oracle="""
        WITH m AS (
            SELECT event_id, 'val' AS key, round(value, 4) AS v FROM events
            UNION ALL
            SELECT event_id, 'uid', round(CAST(user_id AS DOUBLE), 4)
            FROM events
            UNION ALL
            SELECT event_id, 'k',
                   round(CAST(json_extract(props, '$.k') AS DOUBLE), 4)
            FROM events
        )
        SELECT key,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(v), 4) AS avg_v,
               round(max(v), 4) AS max_v
        FROM m WHERE v IS NOT NULL AND v >= 0
        GROUP BY key
    """,
    doc="MapType surface (F10-class functions the flat reference schema "
    "never needed): create_map from heterogeneous columns, "
    "transform_values casting per entry, map_filter dropping negative/"
    "null entries, explode(map) back to long (key, value) rows, then a "
    "per-key aggregate. The oracle is the UNION ALL long form — proving "
    "map construction/explosion round-trips exactly. Maps explode "
    "map-side; the only shuffle carries 3 key groups.",
)
def map_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("val"), F.col("value"),
        F.lit("uid"), F.col("user_id").cast("double"),
        F.lit("k"), F.get_json_object("props", "$.k").cast("double"),
    )
    filtered = F.map_filter(
        F.transform_values(m, lambda _, v: F.round(v, 4)),
        lambda _, v: v.isNotNull() & (v >= 0),
    )
    return (
        e.select("event_id", F.explode(filtered).alias("key", "v"))
        .groupBy("key")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("v"), 4).alias("avg_v"),
            F.round(F.max("v"), 4).alias("max_v"),
        )
    )


_TRIM_FRAC = 0.1  # drop lowest/highest 10% by rank before the mean


@register(
    "trimmed_mean_grouped_agg",
    oracle=f"""
        WITH r AS (
            SELECT event_type, value,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY value, event_id
                   ) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_type,
               CAST(max(n) - 2 * floor(max(n) * {_TRIM_FRAC}) AS BIGINT)
                   AS n_kept,
               round(avg(value) FILTER (
                   rn > floor(n * {_TRIM_FRAC})
                   AND rn <= n - floor(n * {_TRIM_FRAC})
               ), 4) AS trimmed_mean
        FROM r
        GROUP BY event_type
    """,
    doc="robust trimmed mean per group via a GROUPED_AGG pandas_udf — the "
    "one Arrow-batched Python API the surface didn't yet exercise "
    "(mapInPandas, applyInPandas[WithState], mapInArrow, UDTF are all "
    "certified elsewhere): the UDF receives each group's value+id Series, "
    "rank-trims 10% per tail with the (value, event_id) total order the "
    "oracle's window replays, and returns one scalar per group — Spark "
    "runs it as a real partial-agg-style exchange on event_type. Trimmed "
    "mean is the robust-location estimator the pure-SQL surface can't "
    "express without a double window pass; here it's ONE grouped exchange. "
    "The Catalyst twin lives in the oracle (rank window + FILTER avg), so "
    "the Python aggregation path is hash-certified against the "
    "whole-stage-codegen formulation.",
)
def trimmed_mean_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: the type-hint path can't resolve pd.Series
    # under `from __future__ import annotations` with a local pandas import
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def trimmed_mean(v, eid):
        df = pd.DataFrame({"v": v, "e": eid}).sort_values(["v", "e"])
        k = math.floor(len(df) * _TRIM_FRAC)
        kept = df["v"].iloc[k : len(df) - k]
        return float(kept.sum() / len(kept))

    ev = load_table(spark, sf_dir, "events")
    # Spark rejects mixing a GROUPED_AGG pandas UDF with JVM aggregates in
    # one agg; two group-count-sized aggs + a join on the tiny key set
    means = ev.groupBy("event_type").agg(
        F.round(trimmed_mean("value", "event_id"), 4).alias("trimmed_mean")
    )
    counts = ev.groupBy("event_type").agg(
        (F.count("*") - 2 * F.floor(F.count("*") * F.lit(_TRIM_FRAC)))
        .cast("long")
        .alias("n_kept")
    )
    return counts.join(means, "event_type").select(
        "event_type", "n_kept", "trimmed_mean"
    )


# --------------------------------------------------------------------------
# Round-15 registration (promoted from tests/test_round15_previews.py —
# parity pair proven in round 6; display hardened to integer cents and
# the plan reworked fact-walk -> histogram windows end-of-r14 per the
# r13 boundary-hazard audit and the rfm global-orderBy precedent; this
# move is mechanical per the SURVEY r15 bullet)
# --------------------------------------------------------------------------


@register(
    "weighted_median_price",
    oracle="""
    WITH r AS (
        SELECT l_returnflag AS flag,
               l_extendedprice AS price,
               sum(CAST(floor(l_quantity) AS BIGINT)) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum,
               sum(CAST(floor(l_quantity) AS BIGINT)) OVER (
                   PARTITION BY l_returnflag
               ) AS total
        FROM lineitem
    ), hit AS (
        SELECT flag, price, total,
               row_number() OVER (
                   PARTITION BY flag ORDER BY cum, price
               ) AS rn
        FROM r
        WHERE cum >= (total + 1) // 2
    )
    SELECT flag, CAST(total AS BIGINT) AS total_qty,
           CAST(round(price * 100, 0) AS BIGINT) / 100.0 AS wmedian_price
    FROM hit WHERE rn = 1
    """,
    doc="quantity-weighted median extended price per return flag: the "
    "price at the first position whose cumulative quantity reaches "
    "ceil(total/2) — a pure rank SELECTION, never an interpolation "
    "(order statistics are permutation-invariant and bit-identical "
    "across engines). The ORACLE walks the row-level (price, orderkey, "
    "linenumber) total order; the Spark plan computes the SAME "
    "selection from the per-(flag, price) quantity HISTOGRAM — within "
    "a flag the row-level and histogram cumsums cross the target "
    "inside the same price group (zero-weight rows never advance "
    "either cumsum), so the first histogram row with cum >= target "
    "carries the identical price and the oracle string certifies the "
    "histogram plan bit-for-bit (the pareto_revenue_share_scaled "
    "precedent). Display is the SELECTED price as exact integer CENTS "
    "(house entry quantization on identical doubles, one exact /100.0) "
    "— never round(selected_double, 2), which splits the engines' "
    "repr-vs-binary round paths whenever a selected price carries "
    "sub-cent digits ending on a half (the r13 bootstrap-CI lesson: "
    "selection does not launder display rounding); the total ORDER "
    "stays on the raw double. floor() before the integer quantity "
    "cast on BOTH sides: DuckDB CAST rounds doubles, Spark truncates. "
    "Scale: one fact groupBy builds the histogram; windows run over "
    "|flag x distinct price| histogram rows only (the "
    "quantile_normalize shape — never the fact-level |flags|-partition "
    "cumulative walk the rfm rework retired); a two-level bucketed "
    "refinement a la operators/calibrate.py::desc_rank_boundaries is "
    "the named next step if distinct prices ever stop fitting a "
    "partition. Reference has no counterpart (its gold layer stops at "
    "COUNT/AVG/MAX BI aggregates, scripts/process_silver_to_gold.py).",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.floor("l_quantity").cast("long")
    hist = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(q).alias("qty"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("flag")
    r = hist.select(
        "flag",
        "price",
        F.sum("qty").over(w_cum).alias("cum"),
        F.sum("qty").over(w_all).alias("total"),
    )
    hit = r.filter(
        F.col("cum") >= F.expr("(total + 1) div 2")
    ).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("flag").orderBy("price")),
    )
    return hit.filter(F.col("rn") == 1).select(
        "flag",
        F.col("total").cast("long").alias("total_qty"),
        # integer-cents display of the SELECTED price (see the doc):
        # entry quantization on identical doubles, then one exact
        # /100.0 — never a float round of the selected value
        (
            F.round(F.col("price") * 100, 0).cast("long") / F.lit(100.0)
        ).alias("wmedian_price"),
    )
