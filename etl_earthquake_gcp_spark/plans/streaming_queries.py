"""Streaming queries registered with the driver harness (SURVEY.md §2.9).

``stream_tumbling_counts`` produces exactly the batch tumbling-window result,
so it gets a full SQL oracle — the streaming engine is held to the same
correctness bar as batch. The watermarked dedup's winning row depends on
arrival order → rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.jobs import (
    stream_dedup_within_watermark,
    stream_sliding_counts,
    stream_static_enrich,
    stream_stream_purchase_click_join,
    stream_tumbling_counts,
)
from ..streaming.upsert import stream_upsert_latest_events
from .registry import register


@register(
    "streaming_tumbling_counts",
    oracle="""
        SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="Structured Streaming tumbling 1-day counts (readStream → window agg "
    "→ memory sink, complete mode). Oracle = batch equivalent: streaming "
    "result must equal the batch answer once the stream drains (§2.9).",
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_tumbling_counts(spark, sf_dir)


@register(
    "streaming_sliding_counts",
    oracle="""
        SELECT time_bucket(INTERVAL 1 DAY, ts) - o.off * INTERVAL 1 DAY
                   AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        CROSS JOIN (SELECT unnest([0, 1]) AS off) o
        GROUP BY 1, 2
    """,
    doc="Structured Streaming sliding windows (2-day window, 1-day slide): "
    "each event contributes to 2 windows. Oracle replicates each row per "
    "window offset — the drained stream must equal the batch answer.",
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_sliding_counts(spark, sf_dir)


@register(
    "streaming_stream_stream_join",
    oracle="""
        SELECT p.event_id AS purchase_id,
               p.user_id AS user_id,
               c.event_id AS click_id,
               CAST(epoch_ms(p.ts) - epoch_ms(c.ts) AS BIGINT) AS gap_ms,
               c.value AS click_value
        FROM events p
        JOIN events c
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase'
         AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL 1 HOUR
         AND c.ts <= p.ts
    """,
    doc="stream-stream interval join (streaming/jobs.py): purchases ⋈ "
    "clicks on user_id, click within the hour before the purchase. "
    "Watermarks on BOTH event-time columns + the range condition bound "
    "the join state (clicks evict 1h+watermark past their event time). "
    "Full SQL oracle: the drained stream must equal the batch interval "
    "join.",
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_stream_purchase_click_join(spark, sf_dir)


@register(
    "streaming_static_enrich",
    oracle="""
        SELECT dayofweek(ts) IN (0, 6) AS is_weekend,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="stream-static join (streaming/jobs.py): the events stream is "
    "enriched against a broadcast static calendar dimension (generated "
    "batch-side over the events' date range), then aggregated in "
    "complete mode. The static side broadcasts into every micro-batch — "
    "no join state, no watermark — the standard dimension-snapshot "
    "enrichment shape. Drained result equals the batch group-by "
    "(weekday codes differ across engines: Spark Sun=1/Sat=7, DuckDB "
    "Sun=0/Sat=6 — both sides express the same weekend set).",
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_static_enrich(spark, sf_dir)


@register(
    "streaming_upsert_merge",
    oracle="""
        SELECT event_id, user_id, event_type, ts, value
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC
        ) = 1
    """,
    doc="foreachBatch latest-wins MERGE into a copy-on-write versioned "
    "parquet table (streaming/upsert.py): each micro-batch upserts on "
    "(user_id, event_type). Drained state must equal the batch argmax "
    "dedup — incremental merges converge to the full-recompute answer "
    "(the reference's daily-overwrite reconciliation, §2.9, without "
    "re-reading history).",
)
def streaming_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_upsert_latest_events(spark, sf_dir)


@register(
    "streaming_dedup_watermark",
    oracle=None,  # arrival-order dependent winner → rows-only
    doc="dropDuplicatesWithinWatermark over the replayed events stream "
    "(§2.9 streaming dedup; state bounded by the 1h watermark). Rows-only: "
    "row count == countDistinct(user_id), asserted in tests.",
)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_dedup_within_watermark(spark, sf_dir)


_DEDUP_AUDIT_BATCHES = 4


@register(
    "streaming_dedup_audit",
    oracle=f"""
        WITH u AS (SELECT DISTINCT user_id FROM events)
        SELECT CAST({_DEDUP_AUDIT_BATCHES} AS BIGINT) AS n_batches,
               CAST(count(*) AS BIGINT) AS n_out,
               CAST(count(*) AS BIGINT) AS n_distinct_out,
               CAST(count(*) AS BIGINT) AS n_expected,
               bit_xor(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                            1, 8)) AS BIGINT)) AS users_xor,
               TRUE AS dedup_ok
        FROM u
    """,
    doc="HARD audit for the watermark-dedup family (r4 audit pattern — "
    "closes the last rows-only query): events replayed as "
    f"{_DEDUP_AUDIT_BATCHES} deterministic time-ordered micro-batches "
    "through dropDuplicatesWithinWatermark with a span-exceeding delay, "
    "so the contract (exactly one emission per key) is order-independent "
    "and checkable; emits one scalar row whose emission count AND "
    "xor-of-portable-user-hashes the oracle recomputes from the batch "
    "table — a duplicate, dropped, or wrong emission hash-fails. "
    "streaming_dedup_watermark stays as the production 1h-delay shape; "
    "this sibling certifies its operator.",
)
def streaming_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import stream_dedup_audit

    return stream_dedup_audit(spark, sf_dir, n_batches=_DEDUP_AUDIT_BATCHES)


_EWMA_A = 0.2


@register(
    "streaming_ewma_state",
    oracle=f"""
        WITH RECURSIVE seq AS (
            SELECT user_id, event_id, ts, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ), rec(user_id, rn, y) AS (
            SELECT user_id, rn, value FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.user_id, s.rn, {_EWMA_A} * s.value + {1 - _EWMA_A} * r.y
            FROM rec r JOIN seq s
              ON s.user_id = r.user_id AND s.rn = r.rn + 1
        ), last AS (
            SELECT user_id, max(rn) AS mx FROM rec GROUP BY 1
        )
        SELECT r.user_id, CAST(r.rn AS BIGINT) AS n_events,
               round(r.y, 4) + 0.0 AS ewma
        FROM rec r JOIN last l ON r.user_id = l.user_id AND r.rn = l.mx
    """,
    doc="stateful streaming EWMA (applyInPandasWithState): per-user "
    "running recurrence carried ACROSS micro-batches in O(users) state, "
    "final value emitted after the replay drains. The fold uses the "
    "oracle's exact arithmetic (y = a*x + (1-a)*y), and the replay is "
    "event-time-ordered, so even this arbitrary-state operator is fully "
    "oracle-checked (recursive CTE, last row per user) — the streaming "
    "twin of the batch ewma_user_values.",
)
def streaming_ewma_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import stream_ewma_state

    return stream_ewma_state(spark, sf_dir, alpha=_EWMA_A)


_TOPK_STATE_K = 5


@register(
    "streaming_topk_state",
    oracle=f"""
        SELECT event_type, CAST(rank AS BIGINT) AS rank, event_id,
               round(value, 2) + 0.0 AS value
        FROM (
            SELECT event_type, event_id, value,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY value DESC, event_id
                   ) AS rank
            FROM events
        )
        WHERE rank <= {_TOPK_STATE_K}
    """,
    doc="stateful streaming top-k leaderboard (applyInPandasWithState with "
    "ARRAY-typed state): per event_type the running top-"
    f"{_TOPK_STATE_K} (value, event_id) pairs carried across micro-batches "
    "in O(groups*k) state — the live-leaderboard shape (hottest keys, top "
    "offenders) that windowed aggs can't express. Pure selection (no float "
    "arithmetic) so the drained snapshot is bit-exact vs the batch window "
    "oracle; emissions are versioned by rows-seen and the final snapshot "
    "per group wins.",
)
def streaming_topk_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import stream_topk_state

    return stream_topk_state(spark, sf_dir, k=_TOPK_STATE_K)
