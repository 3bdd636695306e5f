"""As-of join query: purchases ← most recent prior click per user.

The oracle mirrors the union-sort construction (not DuckDB's native ASOF
JOIN) so tie semantics are pinned identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.tables import load_table
from .registry import register


@register(
    "asof_purchase_prior_click",
    oracle="""
        WITH p AS (
            SELECT event_id, user_id, epoch_ms(ts) AS t, 1 AS is_left,
                   CAST(NULL AS BIGINT) AS click_id,
                   CAST(NULL AS DOUBLE) AS click_value
            FROM events WHERE event_type = 'purchase'
        ), c AS (
            SELECT CAST(NULL AS BIGINT), user_id, epoch_ms(ts), 0,
                   event_id, value
            FROM events WHERE event_type = 'click'
        ), u AS (
            SELECT * FROM p UNION ALL SELECT * FROM c
        ), filled AS (
            SELECT event_id, user_id, t, is_left,
                   last_value(click_id IGNORE NULLS) OVER w AS asof_click_id,
                   last_value(click_value IGNORE NULLS) OVER w AS asof_click_value
            FROM u
            WINDOW w AS (
                PARTITION BY user_id
                ORDER BY t, is_left, click_id NULLS LAST
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            )
        )
        SELECT event_id, user_id, t AS t_ms,
               coalesce(asof_click_id, -1) AS asof_click_id,
               coalesce(asof_click_value, -1.0) AS asof_click_value
        FROM filled WHERE is_left = 1
    """,
    doc="as-of (point-in-time) join via operators/asof.py: every purchase "
    "event gets the same user's latest click at-or-before it. Union-sort "
    "plan — one shuffle+sort of |L|+|R| rows, no theta-join explosion; "
    "sentinel -1 for purchases with no prior click.",
    bench=True,
)
def asof_purchase_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("t_ms", F.unix_millis("ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "t_ms"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "t_ms",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        time_col="t_ms",
        right_value_cols=["click_id", "click_value"],
        tie_col="click_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "t_ms",
        F.coalesce("asof_click_id", F.lit(-1)).alias("asof_click_id"),
        F.coalesce("asof_click_value", F.lit(-1.0)).alias("asof_click_value"),
    )
