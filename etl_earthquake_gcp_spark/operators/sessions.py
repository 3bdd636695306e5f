"""Sessionization operators over an event stream.

The reference's closest capability is the daily-batch window reconciliation
(SURVEY §2.9); sessionization is its tier-4 streaming-native extension — the
canonical stateful operator a training-data/behavioral pipeline needs.

Three implementations of the same semantics (gap-based sessions per user):

- ``sessionize``            — batch, pure window functions (lag → gap flag →
  running sum = session id). One shuffle on user_id; oracle-expressible.
- ``session_window_agg``    — batch, Spark's built-in ``F.session_window``
  (merging-interval aggregation; same boundaries, agg-only output).
- ``streaming/jobs.py::stream_sessionize_state`` — streaming,
  ``applyInPandasWithState``: per-user state folds batches incrementally,
  emitting a session the moment an event exceeds the gap. Scale shape: state
  is O(users), emission is incremental — this is the 100 TB/continuous form.

All timestamps compare as epoch-millis BIGINTs internally (integer math is
engine-portable; DuckDB ``epoch_ms`` ≡ Spark ``unix_millis``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MS = 12 * 3600 * 1000  # 12h: synthetic events have ~7h median gaps


def sessionize(events: DataFrame, gap_ms: int = SESSION_GAP_MS) -> DataFrame:
    """Per-user gap sessions: (user_id, session_id, n_events, session_start,
    session_end, total_value), session_id dense from 1 in time order. Boundary semantics match the
    built-in session window: a gap of exactly ``gap_ms`` starts a new session
    (windows are [start, last+gap) half-open).

    lag → boundary flag → running count: two window passes over ONE
    hash-partition(user_id) exchange — Catalyst reuses the partitioning for
    both windows and the final groupBy, so the whole operator is one shuffle.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    new_session = (
        (ms - F.lag(ms).over(w)).isNull() | ((ms - F.lag(ms).over(w)) >= gap_ms)
    ).cast("int")
    return (
        events.withColumn("is_new", new_session)
        .withColumn("session_id", F.sum("is_new").over(w).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def session_window_agg(events: DataFrame, gap_ms: int = SESSION_GAP_MS) -> DataFrame:
    """Same sessions via the built-in merging session window.

    ``F.session_window`` closes a window ``gap`` after its last event, so
    ``window.end = max(ts) + gap`` — boundaries identical to ``sessionize``.
    """
    gap = f"{gap_ms // 1000} seconds"
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def sessionize_oracle_sql(gap_ms: int = SESSION_GAP_MS) -> str:
    """DuckDB twin of ``sessionize`` (same lag/flag/running-sum construction)."""
    return f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w IS NULL
                             OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= {gap_ms}
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id, ts, value,
                   CAST(sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end,
               round(sum(value), 2) AS total_value
        FROM numbered
        GROUP BY user_id, session_id
    """


def session_window_oracle_sql(gap_ms: int = SESSION_GAP_MS) -> str:
    """DuckDB twin of ``session_window_agg`` (end = last event + gap)."""
    return f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w IS NULL
                             OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= {gap_ms}
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id, ts, value,
                   sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL {gap_ms // 1000} SECONDS AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM numbered
        GROUP BY user_id, session_id
    """
