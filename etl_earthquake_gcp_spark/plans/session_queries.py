"""Sessionization queries over the ``events`` table (operators/sessions.py).

Three paths, one semantics — window-function batch, built-in session_window
batch, and arbitrary-state streaming — all DuckDB-oracle-checked (the
streaming oracle excludes each user's still-open final session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


_PATH_GAP_MS = 12 * 3600 * 1000  # 12h gap (matches SESSION_GAP_MS — the
# synthetic stream is ~1 event/user/day, so web-style 30-min sessions
# would be singletons)
_PATH_MIN_COUNT = 3


@register(
    "session_path_trigrams",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                            >= {_PATH_GAP_MS}
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ), sess AS (
            SELECT user_id, event_type, ts, event_id,
                   sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_no
            FROM seq
        ), paths AS (
            SELECT user_id, session_no,
                   list(event_type ORDER BY ts, event_id) AS path
            FROM sess GROUP BY 1, 2
        ), tri AS (
            SELECT array_to_string(path[s.s : s.s + 2], '>') AS trigram
            FROM paths, LATERAL (
                SELECT unnest(range(1, len(path) - 1)) AS s
            ) s
            WHERE len(path) >= 3
        )
        SELECT trigram, CAST(count(*) AS BIGINT) AS n
        FROM tri GROUP BY trigram
        HAVING count(*) >= {_PATH_MIN_COUNT}
    """,
    doc="session path mining: 12h-gap sessionization (lag + running "
    "sum — one user_id exchange), per-session ordered event_type paths, "
    "sliding TRIGRAM extraction and global counts — the 'what do users "
    "do in a session' sequence-mining staple (the session-scoped cousin "
    "of event_type_bigrams' user-lifetime transitions). Path collection "
    "is an ordered collect_list per session (bounded by session length); "
    "trigram counts shuffle short path-string keys only.",
)
def session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tms = F.unix_millis("ts")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            tms - F.lag(tms).over(w) >= _PATH_GAP_MS, 1
        ).otherwise(0).alias("is_new"),
    )
    sess = seq.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum("is_new").over(w_run).alias("session_no"),
    )
    paths = sess.groupBy("user_id", "session_no").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ).alias("path")
    )
    tri = (
        paths.filter(F.size("path") >= 3)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("path") - 2),
                    lambda s: F.array_join(F.slice(F.col("path"), s, 3), ">"),
                )
            ).alias("trigram")
        )
    )
    return (
        tri.groupBy("trigram")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= _PATH_MIN_COUNT)
    )


# --------------------------------------------------------------------------
# Round-11 registration (promoted from the round-11 preview bank;
# parity pair proven in tests/test_round11_previews.py across rounds
# 9-10 including the perturbed-testdata rehearsals — mechanical move).
# --------------------------------------------------------------------------


_SURVIVAL_ORACLE = f"""
    WITH sess AS ({sessionize_oracle_sql()}),
    dur AS (
        SELECT (epoch_ms(session_end) - epoch_ms(session_start)) // 1000
                   AS t
        FROM sess
    ), hist AS (
        SELECT t, CAST(count(*) AS BIGINT) AS d FROM dur GROUP BY t
    ), cum AS (
        SELECT t, d,
               CAST((SELECT count(*) FROM dur)
                    - coalesce(sum(d) OVER (ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        FROM hist
    ), terms AS (
        SELECT t, d, n_risk,
               CAST(round(ln(n_risk - d) * 1000000, 0) AS BIGINT)
                   - CAST(round(ln(n_risk) * 1000000, 0) AS BIGINT)
                   AS term_u
        FROM cum WHERE n_risk > d
    ), curve AS (
        SELECT t, d, n_risk,
               CAST(sum(term_u) OVER (ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ls_u
        FROM terms
    )
    SELECT CAST(t AS BIGINT) AS t_s, n_risk, d AS d_events, ls_u,
           round(exp(ls_u / 1000000.0), 6) AS surv6
    FROM curve
"""


@register(
    "session_survival_curve",
    oracle=_SURVIVAL_ORACLE,
    doc="survival analysis on session durations (Kaplan-Meier "
    "product-limit): at-risk and event counts at each distinct "
    "duration are exact integers from a duration histogram; the "
    "cumulative log-survival is an EXACT integer sum of per-step "
    "ln(n-d) - ln(n) terms, each log of an exact integer quantized "
    "once to 1e-6 units (the DSIR libm-absorption class) — the float "
    "product the textbook formula implies never happens. One final "
    "display exp/round. Steps where survival hits zero (n_risk == d) "
    "are excluded symmetrically. Sessions come from the proven "
    "sessionize construction (operators/sessions.py, oracle SQL "
    "reused verbatim). Scale: after sessionize's single user-keyed "
    "exchange, the curve runs on the duration-domain histogram "
    "(value-bounded, SF-free); the ordered windows over it are "
    "histogram-sized, never fact-sized. Reference has no counterpart.",
)
def session_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = sessionize(load_table(spark, sf_dir, "events"))
    dur = sess.select(
        F.expr(
            "(unix_millis(session_end) - unix_millis(session_start))"
            " div 1000"
        ).alias("t")
    )
    hist = dur.groupBy("t").agg(F.count("*").cast("long").alias("d"))
    total = dur.agg(F.count("*").cast("long").alias("n_total"))
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # CROSSJOIN: 1-row session-total frame fans out onto the
    # duration-domain histogram (value-bounded, SF-free)
    cum = hist.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        (
            F.col("n_total")
            - F.coalesce(F.sum("d").over(w_prev), F.lit(0))
        )
        .cast("long")
        .alias("n_risk"),
    )
    lnq = lambda c: F.round(F.log(c) * 1_000_000, 0).cast("long")
    terms = cum.filter(F.col("n_risk") > F.col("d")).select(
        "t",
        "d",
        "n_risk",
        (lnq(F.col("n_risk") - F.col("d")) - lnq(F.col("n_risk"))).alias(
            "term_u"
        ),
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return terms.select(
        F.col("t").cast("long").alias("t_s"),
        "n_risk",
        F.col("d").alias("d_events"),
        F.sum("term_u").over(w_cum).cast("long").alias("ls_u"),
    ).withColumn(
        "surv6", F.round(F.exp(F.col("ls_u") / 1_000_000.0), 6)
    )


# --------------------------------------------------------------------------
# Round-14 registration: per-user inter-arrival burstiness (promoted
# from tests/test_round14_previews.py — the temporal-behavior sibling
# of sessionization / survival in this module)
# --------------------------------------------------------------------------


@register(
    "interarrival_cv",
    oracle="""
    WITH ordered AS (
        SELECT user_id, epoch_ms(ts) // 1000 AS sec,
               lag(epoch_ms(ts) // 1000) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_sec
        FROM events
    ), gaps AS (
        SELECT user_id, CAST(sec - prev_sec AS BIGINT) AS g
        FROM ordered WHERE prev_sec IS NOT NULL
    ), stats AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_gaps,
               CAST(sum(g) AS BIGINT) AS s,
               CAST(sum(g * g) AS BIGINT) AS sg2
        FROM gaps GROUP BY 1
    )
    SELECT user_id, n_gaps, s AS sum_gap_s,
           ((2 * s * 10000 + n_gaps) // (2 * n_gaps)) / 10000.0 AS mean_s,
           round(sqrt((n_gaps * sg2 - s * s) * 1.0
                      / (n_gaps * (n_gaps - 1)))
                 * n_gaps / s, 6) AS cv6
    FROM stats
    WHERE n_gaps >= 2 AND s > 0
    """,
    doc="per-user inter-arrival coefficient of variation from EXACT "
    "integer second gaps (bursty vs regular activity — CV >> 1 marks "
    "bursts, ~1 is memoryless): the sample variance is carried as the "
    "exact integer numerator n*sum(g^2) - S^2 over denominator "
    "n*(n-1), so cv = sqrt(num/den) * n / S needs exactly one "
    "IEEE-exact sqrt and two fixed-order float ops before the single "
    "round — bit-identical across engines on identical integers. "
    "n >= 2 gaps and S > 0 guarded symmetrically. Boundary-hazard "
    "audit (the r13 cusum criterion): mean = S/n is a "
    "small-denominator rational (n is a per-user gap count — an "
    "exhaustive n < 3000 search found 243 exact 4dp half-boundary "
    "values where the engines' float round paths diverge, reduced "
    "denominator 2^5*5^b), so mean_s is an integer half-away 1e-4 "
    "quantization — (2*S*10^4 + n) div (2*n), one exact /10^4.0 "
    "display division, never a float round; cv6 keeps the single "
    "round because the sqrt makes the true value irrational outside "
    "degenerate perfect-square cases, which carry the large S in the "
    "denominator. Scale: one per-user window lag + one groupBy — the "
    "window partitions by user_id (never global), and everything "
    "after the groupBy is |users|-row. BIGINT bound: n*sum(g^2) < "
    "2^63 — with 30-day spans (g <= 2.6e6 s) safe to ~1000 "
    "events/user; beyond, compute gaps in minutes or widen to "
    "DECIMAL(38,0) on both engines. Reference has no counterpart.",
)
def interarrival_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        F.unix_seconds("ts").alias("sec"),
        F.lag(F.unix_seconds("ts")).over(w).alias("prev_sec"),
    )
    gaps = ordered.filter(F.col("prev_sec").isNotNull()).select(
        "user_id", (F.col("sec") - F.col("prev_sec")).cast("long").alias("g")
    )
    stats = gaps.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum("g").cast("long").alias("s"),
        F.sum(F.col("g") * F.col("g")).cast("long").alias("sg2"),
    )
    return stats.filter((F.col("n_gaps") >= 2) & (F.col("s") > 0)).select(
        "user_id",
        "n_gaps",
        F.col("s").alias("sum_gap_s"),
        # integer half-away 1e-4-unit mean: S/n is a small-denominator
        # rational (see the boundary-hazard audit note in the doc) —
        # never float-round it; the only float op is the exact /10^4
        (
            F.expr("(2 * s * 10000 + n_gaps) div (2 * n_gaps)")
            / F.lit(10000.0)
        ).alias("mean_s"),
        F.round(
            F.sqrt(
                (F.col("n_gaps") * F.col("sg2") - F.col("s") * F.col("s"))
                * 1.0
                / (F.col("n_gaps") * (F.col("n_gaps") - 1))
            )
            * F.col("n_gaps")
            / F.col("s"),
            6,
        ).alias("cv6"),
    )
