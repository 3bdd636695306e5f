"""Sessionization queries over the ``events`` table (operators/sessions.py).

Three paths, one semantics — window-function batch, built-in session_window
batch, and arbitrary-state streaming — all DuckDB-oracle-checked (the
streaming oracle excludes each user's still-open final session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sessions import (
    SESSION_GAP_MS,
    session_window_agg,
    session_window_oracle_sql,
    sessionize,
    sessionize_oracle_sql,
)
from ..sources.tables import load_table
from ..streaming.jobs import stream_sessionize_state, stream_sessionize_tws
from .registry import register

_STREAM_SESSION_ORACLE = f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w IS NULL
                         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w
                            >= {SESSION_GAP_MS}
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM flagged
    ), sess AS (
        SELECT user_id, session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               min(epoch_ms(ts)) AS session_start_ms,
               max(epoch_ms(ts)) AS session_end_ms,
               round(sum(value), 2) AS total_value
        FROM numbered
        GROUP BY user_id, session_id
        -- streaming emits a session only when a LATER event closes it:
        -- each user's final session is still open in state
        QUALIFY session_id < max(session_id) OVER (PARTITION BY user_id)
    )
    SELECT user_id, session_start_ms, session_end_ms, n_events, total_value
    FROM sess
"""


@register(
    "sessionize_events",
    oracle=sessionize_oracle_sql(),
    doc="gap-based sessionization (12h gap) via lag → boundary flag → "
    "running-sum session ids: two window passes + final agg over a single "
    "hash-partition(user_id) exchange (one shuffle total).",
    bench=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"))


@register(
    "session_window_agg",
    oracle=session_window_oracle_sql(),
    doc="same sessions via Spark's built-in merging session window "
    "(F.session_window) — window.end = last event + gap; the oracle "
    "recomputes identical boundaries with window functions.",
)
def session_window_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_agg(load_table(spark, sf_dir, "events"))


@register(
    "streaming_sessionize_state",
    oracle=_STREAM_SESSION_ORACLE,
    doc="incremental sessionization via applyInPandasWithState over a "
    "time-ordered multi-batch replay: O(users) state, sessions emitted on "
    "gap exceedance. Oracle = batch sessions minus each user's open final "
    "session — a full differential check on the arbitrary-state API.",
)
def streaming_sessionize_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_sessionize_state(spark, sf_dir).select(
        "user_id",
        "session_start_ms",
        "session_end_ms",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    )


# NOT registered with the driver: transformWithStateInPandas (state v2)
# drives a protobuf-based state-server protocol, and this container's
# google.protobuf install is broken (ImportError: descriptor). The operator
# lives in streaming/jobs.py::stream_sessionize_tws with the SAME semantics
# and would share _STREAM_SESSION_ORACLE; tests/test_sessions_asof.py runs
# it (skipif protobuf unavailable) so it activates on codec-complete builds.
def streaming_sessionize_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_sessionize_tws(spark, sf_dir).select(
        "user_id",
        "session_start_ms",
        "session_end_ms",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    )
