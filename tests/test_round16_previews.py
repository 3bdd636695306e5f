"""Round-16 registrations (the round-16 bank): multi-touch time-decay
attribution and Fellegi-Sunter blocked record linkage live in
plans/analytics_queries.py, the join-skew diagnosis in
plans/olap_queries.py as registered driver pairs. These tests exercise
the REGISTERED pair (the exact objects the driver sees) plus the domain
asserts, full pure-Python replays, a constructed known-value attribution
case driven through the registered query, and the scale-shape plan pins.

Determinism design (per plans/registry.py conventions):
- attribution weights are exact powers of two (2^0..2^-7) from
  exact-integer microsecond deltas, so the per-purchase normalizer sum
  is EXACT regardless of combine order; only the final cross-purchase
  sum needs the house round(,2);
- FS comparator weights are log2(m/u) constants folded OFFLINE into
  decimal literals shared by both engines (no engine-side log), summed
  in fixed left-to-right order;
- the skew diagnosis is pure-BIGINT arithmetic end to end (integer
  per-mille amplification, integer ceiling-division salt fan-out) — no
  float anywhere, the r14 boundary-hazard criterion passes vacuously.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.plans import QUERIES
from etl_earthquake_gcp_spark.plans.analytics_queries import (
    _ATTR_DAY_US,
    _ATTR_WINDOW_US,
    _FS_THRESHOLD,
    _FS_TOP,
    _FS_W,
)
from etl_earthquake_gcp_spark.plans.olap_queries import _SKEW_TOP
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR
from .conftest import run_registered_pair as _run_pair
from .test_bank_plans import _plan_of

# registered query callables (the exact objects the driver sees)
attribution_time_decay = QUERIES["attribution_time_decay"].spark_fn
fs_linkage_scores = QUERIES["fs_linkage_scores"].spark_fn
join_skew_diagnosis = QUERIES["join_skew_diagnosis"].spark_fn


def _round_half_up(x: float, scale: int) -> float:
    """Spark's round(): shortest-repr decimal conversion then HALF_UP —
    Decimal(repr(x)) matches BigDecimal.valueOf(double)."""
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


# -- attribution_time_decay --------------------------------------------------


def test_attribution_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "attribution_time_decay")
    assert set(spdf["touch_type"]) == {"click", "view"}
    assert (spdf["n_attributions"] > 0).all()
    assert (spdf["attributed_value"] > 0).all()


def test_attribution_matches_python_replay(spark):
    """Replay the weight model in pure Python off the collected events:
    per-purchase 7-day touch windows, 2^-floor(days) weights, exact
    per-purchase normalizer, (touch_type, Monday-week) rollup. Counts
    compare exactly; the attributed sums compare pre-round at 1e-9
    (the registered display round(,2) is covered exactly by the
    constructed case below and by the oracle parity above)."""
    rows = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.unix_micros("ts").alias("us"),
            "ts",
        )
        .collect()
    )
    touches = [r for r in rows if r.event_type in ("click", "view")]
    by_user: dict[int, list] = {}
    for r in touches:
        by_user.setdefault(r.user_id, []).append(r)
    expected: dict[tuple, list] = {}
    for p in rows:
        if p.event_type != "purchase":
            continue
        w_touches = [
            (t, 2.0 ** -math.floor((p.us - t.us) / _ATTR_DAY_US))
            for t in by_user.get(p.user_id, [])
            if t.us < p.us and p.us - t.us <= _ATTR_WINDOW_US
        ]
        if not w_touches:
            continue
        sw = math.fsum(w for _, w in w_touches)  # exact: powers of two
        week = (p.ts - dt.timedelta(days=p.ts.weekday())).date()
        for t, w in w_touches:
            cell = expected.setdefault((t.event_type, week), [0, 0.0])
            cell[0] += 1
            cell[1] += p.value * w / sw
    spdf = attribution_time_decay(spark, SF_DIR).toPandas()
    got = {
        (r.touch_type, r.week if isinstance(r.week, dt.date) else r.week.date()): (
            int(r.n_attributions),
            float(r.attributed_value),
        )
        for r in spdf.itertuples()
    }
    assert set(got) == set(expected)
    for key, (n, total) in expected.items():
        gn, gv = got[key]
        assert gn == n, key
        assert abs(gv - total) <= 1e-9 * max(1.0, abs(total)) + 5.1e-3, key


def test_attribution_constructed_known_values(spark, tmp_path):
    """Drive a constructed micro-corpus through the REGISTERED query:
    one purchase of 100.0 with a same-day click (w=1), a day-old view
    (w=0.5), and an out-of-window click — shares must be exactly
    66.67 / 33.33 in the Monday-week of the purchase."""
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        (0, t0, 7, "purchase", 100.0, "{}"),
        (1, t0 - dt.timedelta(hours=1), 7, "click", 1.0, "{}"),
        (2, t0 - dt.timedelta(hours=25), 7, "view", 1.0, "{}"),
        (3, t0 - dt.timedelta(days=8), 7, "click", 1.0, "{}"),
        # other-user touch must not leak into user 7's attribution
        (4, t0 - dt.timedelta(hours=2), 8, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = attribution_time_decay(spark, str(tmp_path)).toPandas()
    got = {
        r.touch_type: (int(r.n_attributions), float(r.attributed_value), r.week)
        for r in out.itertuples()
    }
    week = dt.date(2024, 1, 8)  # Monday of the purchase week
    def _d(v):
        return v if isinstance(v, dt.date) else v.date()
    assert {k: (v[0], v[1], _d(v[2])) for k, v in got.items()} == {
        "click": (1, 66.67, week),
        "view": (1, 33.33, week),
    }


def test_attribution_join_is_hash_equi_not_cartesian(spark):
    """The touch↔purchase pairing must be an equi-join on user_id
    (hash-partitioned at scale), never a nested-loop cartesian."""
    plan = _plan_of(attribution_time_decay(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


# -- fs_linkage_scores -------------------------------------------------------


def _fs_replay(spark):
    rows = (
        load_table(spark, SF_DIR, "customer")
        .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal", "c_name")
        .collect()
    )
    recs = [
        (
            r.c_custkey,
            r.c_nationkey,
            r.c_mktsegment,
            math.floor(r.c_acctbal / 1000.0),
            r.c_name[-2:],
        )
        for r in rows
    ]
    by_block: dict[int, list] = {}
    for rec in recs:
        by_block.setdefault(rec[1], []).append(rec)
    out = []
    for blk, members in by_block.items():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                g = (
                    int(a[2] == b[2]),
                    int(a[3] == b[3]),
                    int(a[4] == b[4]),
                )
                # fixed left-to-right literal sum, as registered
                score = (
                    (_FS_W["seg"][0] if g[0] else _FS_W["seg"][1])
                    + (_FS_W["bal"][0] if g[1] else _FS_W["bal"][1])
                ) + (_FS_W["name"][0] if g[2] else _FS_W["name"][1])
                out.append(
                    (
                        blk,
                        a[0],
                        b[0],
                        f"{g[0]}{g[1]}{g[2]}",
                        _round_half_up(score, 4) + 0.0,
                        score >= _FS_THRESHOLD,
                    )
                )
    out.sort(key=lambda r: (-r[4], r[1], r[2]))
    return out[:_FS_TOP]


def test_fs_linkage_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "fs_linkage_scores")
    assert len(spdf) == _FS_TOP
    # the head of the ranking is the all-agree pattern when present
    assert spdf["score4"].iloc[0] == spdf["score4"].max()
    assert set(spdf["pattern"]) <= {
        f"{a}{b}{c}"
        for a in "01"
        for b in "01"
        for c in "01"
    }


def test_fs_linkage_matches_python_replay(spark):
    """Full-result replay in pure Python: blocked pair generation,
    3-bit agreement patterns, fixed-order literal-weight sums, the
    HALF_UP display round, threshold classification, and the
    (score DESC, a, b) top-k — independent of the Spark self-join and
    the oracle CTEs."""
    expected = _fs_replay(spark)
    spdf = fs_linkage_scores(spark, SF_DIR).toPandas()
    got = [
        (
            int(r.block_key),
            int(r.a_key),
            int(r.b_key),
            r.pattern,
            float(r.score4),
            bool(r.is_match),
        )
        for r in spdf.itertuples()
    ]
    assert got == expected


def test_fs_linkage_plan_blocked_join_and_topk(spark):
    """Scale shape: the pair generator must be an equi-join on the
    block key (hash- or sort-merge-partitioned), never a cartesian;
    the top-k must be TakeOrderedAndProject, never a global sort."""
    plan = _plan_of(fs_linkage_scores(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


# -- join_skew_diagnosis -----------------------------------------------------


def test_join_skew_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "join_skew_diagnosis")
    assert 0 < len(spdf) <= _SKEW_TOP
    assert (spdf["est_rows"] == spdf["cnt_left"] * spdf["cnt_right"]).all()
    assert (spdf["salt_n"] >= 1).all()


def test_join_skew_matches_python_replay(spark):
    """Full-result replay in pure Python: both per-key count tables,
    exact per-key join cardinality, integer per-mille amplification,
    integer ceiling-division salt fan-out, and the (est DESC, key)
    top-k — pure BIGINT arithmetic end to end."""
    from collections import Counter

    ev = Counter(
        r.user_id
        for r in load_table(spark, SF_DIR, "events")
        .select("user_id")
        .collect()
    )
    od = Counter(
        r.o_custkey
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_custkey")
        .collect()
    )
    keys = sorted(set(ev) & set(od))
    total_est = sum(ev[k] * od[k] for k in keys)
    total_left = sum(ev[k] for k in keys)
    nkeys = len(keys)
    expected = sorted(
        (
            (
                -(ev[k] * od[k]),
                k,
                ev[k],
                od[k],
                (ev[k] * od[k] * 1000 * nkeys) // total_est,
                (ev[k] * nkeys + total_left - 1) // total_left,
            )
            for k in keys
        )
    )[:_SKEW_TOP]
    expected = [
        (k, cl, cr, -neg, amp, salt)
        for neg, k, cl, cr, amp, salt in expected
    ]
    spdf = join_skew_diagnosis(spark, SF_DIR).toPandas()
    got = [
        (
            int(r.key),
            int(r.cnt_left),
            int(r.cnt_right),
            int(r.est_rows),
            int(r.amp_x1000),
            int(r.salt_n),
        )
        for r in spdf.itertuples()
    ]
    assert got == expected


def test_join_skew_plan_topk_and_broadcast_totals(spark):
    """Scale shape: per-key aggregation feeds a key-count-sized join,
    the 1-row totals frame broadcasts, and the top-k is
    TakeOrderedAndProject — the profile never sorts the corpus."""
    plan = _plan_of(join_skew_diagnosis(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


# -- cross-cutting semantic invariants ---------------------------------------


def test_attribution_conserves_purchase_value(spark):
    """Conservation law: per-purchase shares sum to 1, so total
    attributed value must equal the total value of purchases that HAVE
    at least one in-window touch (to display-rounding tolerance: one
    round(,2) per output cell). A weights/normalizer bug (double count,
    leaked cross-user touch, window off-by-one) breaks this joint
    property; recomputing shares from the same definition would not."""
    e = load_table(spark, SF_DIR, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("pus"),
        "value",
    )
    t = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.unix_micros("ts").alias("tus"),
    )
    attributable = (
        p.join(
            t,
            (F.col("p_user") == F.col("t_user"))
            & (F.col("tus") < F.col("pus"))
            & (F.col("pus") - F.col("tus") <= F.lit(_ATTR_WINDOW_US)),
            "left_semi",
        )
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    out = attribution_time_decay(spark, SF_DIR).toPandas()
    assert abs(out["attributed_value"].sum() - attributable) <= 0.005 * len(
        out
    ) + 1e-6


def test_join_skew_est_rows_is_exact_cardinality(spark):
    """Grounding: for an equi-join, sum(cnt_left*cnt_right) over keys
    IS the exact join output size — assert the diagnosis total against
    the actually-executed join count (not against the same per-key
    arithmetic)."""
    e = load_table(spark, SF_DIR, "events").select(
        F.col("user_id").alias("key")
    )
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_custkey").alias("key")
    )
    actual = e.join(o, "key").count()
    left = load_table(spark, SF_DIR, "events").groupBy(
        F.col("user_id").alias("key")
    ).count().withColumnRenamed("count", "cl")
    right = load_table(spark, SF_DIR, "orders").groupBy(
        F.col("o_custkey").alias("key")
    ).count().withColumnRenamed("count", "cr")
    total_est = (
        left.join(right, "key")
        .agg(F.sum(F.col("cl") * F.col("cr")))
        .collect()[0][0]
    )
    assert total_est == actual
    # and the registered query's per-key rows are a subset of that sum
    spdf = join_skew_diagnosis(spark, SF_DIR).toPandas()
    assert spdf["est_rows"].sum() <= total_est


def test_fs_linkage_match_flag_consistent_with_display(spark):
    """The classification flag is computed on the RAW score; the static
    boundary enumeration (SCALING round-16 notes) shows no score within
    0.07 of the 6.0 threshold, so the flag must equal the same
    comparison on the displayed score4 — a drift here would mean the
    display round moved a score across the threshold."""
    spdf = fs_linkage_scores(spark, SF_DIR).toPandas()
    assert (
        (spdf["score4"] >= _FS_THRESHOLD) == spdf["is_match"]
    ).all()
