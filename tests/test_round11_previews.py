"""Round-11 query previews: full Spark-vs-DuckDB parity pairs for RFM
quartile segmentation and the composed per-source data-card pipeline,
verified NOW so a later registration is a mechanical @register move.

Same contract as tests/test_round7_previews.py: each test runs the
planned queries() callable against the planned oracle_sql() string with
the driver-sim comparator, so the pair is already proven when promoted.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR, assert_frames_match
from . import test_round9_previews as r9


# -- rfm_quartile_scores -----------------------------------------------------
#
# Classic RFM segmentation over purchase events, all-integer: recency
# in whole days vs the global last purchase date, frequency as a count,
# monetary as per-event cents (each value quantized ONCE) summed
# exactly, and each quartile as the pure rank formula ceil(4r/n) =
# (4r + n − 1) div n — no NTILE, no interpolation. The ranking windows
# run over the USER dimension (|users| rows, orders of magnitude below
# the fact table — the skyline/SCD2 class of dimension-sized frames).

RFM_ORACLE = """
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


def rfm_quartile_scores(spark, sf_dir):
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


def test_rfm_oracle_parity(spark, oracle):
    spdf = rfm_quartile_scores(spark, SF_DIR).toPandas()
    opdf = oracle.execute(RFM_ORACLE).df()
    assert_frames_match(spdf, opdf, "rfm_quartile_scores")
    for c in ("r_q", "f_q", "m_q"):
        assert spdf[c].between(1, 4).all()
    # the quartile formula balances: no quartile holds more than
    # ceil(n/4) users
    import math

    n = len(spdf)
    for c in ("r_q", "f_q", "m_q"):
        assert spdf[c].value_counts().max() <= math.ceil(n / 4)


# -- source_datacard_pipeline ------------------------------------------------
#
# The per-source "data card" as ONE lazy plan: document counts, token
# totals, lexical diversity, the Zipf slope, and the corpus-wide
# shared-5-gram rate — the composed health report a curation run
# prints per shard. Shared-rate comes from INTEGER sums (never a mean
# of per-doc ratios), the slope from the integer-unit log OLS; the
# oracle replays the whole composition.

DATACARD_ORACLE = f"""
    WITH {r9.FREQ_SQL},
    lex AS (
        SELECT source,
               CAST(sum(cnt) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_types,
               round(count(*) * 1.0 / sum(cnt), 6) AS ttr6
        FROM freq GROUP BY source
    ),
    {r9.zipf_sql_stages(r9._ZIPF_R)},
    zipf AS (
        SELECT source, {r9.ZIPF_SLOPE_SQL} AS zipf_slope6
        FROM zs WHERE n_ranks > 1
    ),
    {r9.GRAM_SQL_STAGES},
    nov AS (
        SELECT g.source,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN r.n_docs_with > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared,
               round(sum(CASE WHEN r.n_docs_with > 1 THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6) AS shared6
        FROM grams g JOIN reach r USING (gram)
        GROUP BY g.source
    ), nd AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    )
    SELECT nd.source, n_docs, n_tokens, n_types, ttr6,
           zipf_slope6, n_grams, n_shared, shared6
    FROM nd
    JOIN lex USING (source)
    JOIN zipf USING (source)
    JOIN nov USING (source)
"""


def source_datacard_pipeline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    freq = r9.token_freq(docs).persist()
    # persisted: feeds the lexical aggregate AND the zipf ranks
    lex = freq.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.round(F.count("*") * 1.0 / F.sum("cnt"), 6).alias("ttr6"),
    )
    zipf = (
        r9.zipf_sums(freq, r9._ZIPF_R)
        .filter(F.col("n_ranks") > 1)
        .select("source", r9.zipf_slope6_col().alias("zipf_slope6"))
    )
    grams = r9.gram_frame(docs)
    shared = F.sum(
        F.when(F.col("n_docs_with") > 1, 1).otherwise(0)
    ).cast("long")
    nov = (
        grams.join(r9.reach_frame(grams), "gram")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            shared.alias("n_shared"),
            F.round(shared * 1.0 / F.count("*"), 6).alias("shared6"),
        )
    )
    nd = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    return (
        nd.join(lex, "source")
        .join(zipf, "source")
        .join(nov, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_types",
            "ttr6",
            "zipf_slope6",
            "n_grams",
            "n_shared",
            "shared6",
        )
    )


def test_source_datacard_oracle_parity(spark, oracle):
    spdf = source_datacard_pipeline(spark, SF_DIR).toPandas()
    opdf = oracle.execute(DATACARD_ORACLE).df()
    assert_frames_match(spdf, opdf, "source_datacard_pipeline")
    assert (spdf["n_shared"] <= spdf["n_grams"]).all()
    assert (spdf["zipf_slope6"] <= 0).all()
