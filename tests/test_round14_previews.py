"""Round-14 registrations (promoted from the round-14 preview bank):
the order-sensitive event-pair lift, three k-core peeling rounds, and
the rfm rework's quartile sibling live in plans/analytics_queries.py,
the Benford first-digit audit in plans/curation_queries.py, exact
market-basket pair rules in plans/ml_queries.py, and the per-user
inter-arrival CV in plans/session_queries.py as registered driver
pairs. These tests exercise the REGISTERED pair (the exact objects the
driver sees) plus the domain asserts, the pure-Python replays, and the
constructed known-value cases the generic oracle-parity sweep does not
check.

Registration deltas vs the proven previews (both audited, both
value-neutral or parity-symmetric):
- interarrival_cv's mean_s hardened to the integer half-away 1e-4
  pattern on BOTH engines (the r13 cusum boundary-hazard criterion —
  see the docstring audit note; hermetic boundary regression in
  tests/test_rounding_hardening.py);
- basket_pair_rules' three part-marginal F.broadcast hints REMOVED per
  the r7 audit rule (part counts scale with SF; hints don't affect
  values — stats/AQE still pick broadcast at test SF, pinned in
  tests/test_bank_plans.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.plans import QUERIES
from etl_earthquake_gcp_spark.plans.curation_queries import _BENFORD_U
from etl_earthquake_gcp_spark.plans.ml_queries import (
    _BASKET_MINSUP,
    _BASKET_TOP,
)
from etl_earthquake_gcp_spark.plans.analytics_queries import _KCORE_K
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR
from .conftest import run_registered_pair as _run_pair

# registered query callables (the exact objects the driver sees)
sequence_pair_lift = QUERIES["sequence_pair_lift"].spark_fn
kcore_3peel = QUERIES["kcore_3peel"].spark_fn
benford_first_digit = QUERIES["benford_first_digit"].spark_fn
basket_pair_rules = QUERIES["basket_pair_rules"].spark_fn
interarrival_cv = QUERIES["interarrival_cv"].spark_fn


# -- sequence_pair_lift ------------------------------------------------------


def test_sequence_pair_lift_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "sequence_pair_lift")
    assert len(spdf) > 0
    # support can never exceed either marginal
    assert (spdf["n_ab"] <= spdf[["n_a", "n_b"]].min(axis=1)).all()


def test_sequence_pair_lift_constructed_order(spark):
    """Pins the strict-precedence semantics: in a group holding only
    a-then-b, (a, b) counts and (b, a) does not; a timestamp tie counts
    for neither direction."""
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "a"),
            (1, "2024-01-01 11:00:00", "b"),
            (2, "2024-01-01 10:00:00", "c"),
            (2, "2024-01-01 10:00:00", "d"),
        ],
        "user_id long, tss string, event_type string",
    ).select(
        "user_id", F.col("tss").cast("timestamp").alias("ts"), "event_type"
    )
    spans = df.groupBy(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
    a = spans.select(
        "user_id", "day", F.col("event_type").alias("ta"),
        F.col("mn").alias("mn_a"),
    )
    b = spans.select(
        "user_id", "day", F.col("event_type").alias("tb"),
        F.col("mx").alias("mx_b"),
    )
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter((F.col("ta") != F.col("tb")) & (F.col("mn_a") < F.col("mx_b")))
        .select("ta", "tb")
        .collect()
    )
    got = {(r["ta"], r["tb"]) for r in pairs}
    assert got == {("a", "b")}  # no (b,a); no (c,d)/(d,c) tie pairs


# -- kcore_3peel -------------------------------------------------------------


def test_kcore_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "kcore_3peel")
    assert len(spdf) == 3
    s = spdf.sort_values("round")
    # peeling is monotone: nodes and edges can only shrink
    assert s["n_nodes"].is_monotonic_decreasing
    assert s["n_edges"].is_monotonic_decreasing


def test_kcore_matches_python_replay(spark):
    """The three peel rounds replayed in pure Python sets/Counters on
    the same capped edge list — a third implementation independent of
    both the Spark join pipeline and the unrolled-CTE oracle (which
    share the per-round degree-filter structure)."""
    from collections import Counter

    from etl_earthquake_gcp_spark.plans.analytics_queries import (
        _capped_user_edges,
    )

    cur = [
        (r.u, r.v) for r in _capped_user_edges(spark, SF_DIR).collect()
    ]
    expected = []
    for rnd in (1, 2, 3):
        deg = Counter()
        for u, v in cur:
            deg[u] += 1
            deg[v] += 1
        surv = {n for n, d in deg.items() if d >= _KCORE_K}
        cur = [(u, v) for u, v in cur if u in surv and v in surv]
        expected.append((rnd, len(surv), len(cur), sum(surv)))
    spdf = kcore_3peel(spark, SF_DIR).toPandas().sort_values("round")
    got = [
        tuple(int(x) for x in row)
        for row in spdf[
            ["round", "n_nodes", "n_edges", "node_sum"]
        ].itertuples(index=False, name=None)
    ]
    assert got == expected


# -- benford_first_digit -----------------------------------------------------


def test_benford_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "benford_first_digit")
    assert spdf["digit"].between(1, 9).all()
    # the expected shares are the textbook constants
    assert _BENFORD_U[0] == 301030  # log10(2)
    assert sum(_BENFORD_U) in (999999, 1000000, 1000001)  # shares sum to 1


def test_benford_matches_python_replay(spark):
    """Full-result replay in pure Python: cents via the documented
    HALF_UP-of-shortest-repr round (Decimal(repr(x)) mirrors
    BigDecimal.valueOf), digits from the integer string, shares via
    the integer half-away 1e-6 formula — every row must match
    exactly."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    prices = [
        r.o_totalprice
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_totalprice")
        .collect()
    ]
    cents = [
        int(
            Decimal(repr(p * 100)).quantize(Decimal("1"), ROUND_HALF_UP)
        )
        for p in prices
    ]
    counts = Counter(int(str(c)[0]) for c in cents if c >= 1)
    t = sum(counts.values())
    expected = {
        d: (
            n,
            # the integer half-away 1e-6-unit share, exactly
            ((2 * n * 1_000_000 + t) // (2 * t)) / 1_000_000.0,
            _BENFORD_U[d - 1],
            abs((n * 1_000_000) // t - _BENFORD_U[d - 1]),
        )
        for d, n in counts.items()
    }
    spdf = benford_first_digit(spark, SF_DIR).toPandas()
    got = {
        int(r.digit): (int(r.n), r.share6, int(r.benford_u), int(r.dev_u))
        for r in spdf.itertuples()
    }
    assert got == expected


# -- basket_pair_rules -------------------------------------------------------


def test_basket_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "basket_pair_rules")
    assert 0 < len(spdf) <= _BASKET_TOP
    # support never exceeds either item's order count
    assert (spdf["supp"] <= spdf[["n_p1", "n_p2"]].min(axis=1)).all()


def test_basket_matches_python_replay(spark):
    """Full-result replay in pure Python: distinct baskets, part
    marginals, the min-support prefilter, within-order pair Counters,
    the two integer half-away display ratios, and the (supp DESC, p1,
    p2) top-k — independent of the Spark join pipeline and the oracle
    CTEs."""
    from collections import Counter, defaultdict
    from itertools import combinations

    rows = (
        load_table(spark, SF_DIR, "lineitem")
        .select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    part_n = Counter()
    for r in rows:  # rows are already distinct (o, p) pairs
        baskets[r.o].add(r.p)
        part_n[r.p] += 1
    n_orders = len(baskets)
    supp = Counter()
    for parts in baskets.values():
        freq = sorted(p for p in parts if part_n[p] >= _BASKET_MINSUP)
        for p1, p2 in combinations(freq, 2):
            supp[(p1, p2)] += 1

    def r6(num, den):
        # the integer half-away 1e-6-unit ratio, exactly
        return ((2 * num * 1_000_000 + den) // (2 * den)) / 1_000_000.0

    ranked = sorted(supp.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = [
        (
            p1,
            p2,
            s,
            part_n[p1],
            part_n[p2],
            r6(s, part_n[p1]),
            r6(s * n_orders, part_n[p1] * part_n[p2]),
        )
        for (p1, p2), s in ranked[:_BASKET_TOP]
    ]
    spdf = basket_pair_rules(spark, SF_DIR).toPandas()
    got = [
        (
            int(r.p1),
            int(r.p2),
            int(r.supp),
            int(r.n_p1),
            int(r.n_p2),
            r.conf1,
            r.lift6,
        )
        for r in spdf.itertuples()
    ]
    assert got == expected


# -- interarrival_cv ---------------------------------------------------------


def test_interarrival_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "interarrival_cv")
    assert len(spdf) > 0
    assert (spdf["cv6"] >= 0).all()
    # the hardened mean is a 1e-4-unit quantity by construction (the
    # float re-scale below costs ~ulp(u) ~ 1e-7 at u ~ 5e8 — tolerance
    # is for the TEST's own multiply, not the query's display division)
    assert (
        (spdf["mean_s"] * 10_000).round() - spdf["mean_s"] * 10_000
    ).abs().max() < 1e-3


def test_interarrival_constructed_values(spark):
    """Regular arrivals (equal gaps) give CV = 0; gaps (1, 3) give
    sd = sqrt(2), mean = 2, CV = sqrt(2)/2 — pins the sample-variance
    formula and the strict (ts, event_id) gap order."""
    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 10:00:00"),
            (2, 1, "2024-01-01 10:00:10"),
            (3, 1, "2024-01-01 10:00:20"),
            (4, 2, "2024-01-01 10:00:00"),
            (5, 2, "2024-01-01 10:00:01"),
            (6, 2, "2024-01-01 10:00:04"),
        ],
        "event_id long, user_id long, tss string",
    ).select(
        "event_id", "user_id", F.col("tss").cast("timestamp").alias("ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        df.select(
            "user_id",
            (
                F.unix_seconds("ts")
                - F.lag(F.unix_seconds("ts")).over(w)
            ).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    stats = gaps.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("g").alias("s"),
        F.sum(F.col("g") * F.col("g")).alias("sg2"),
    ).collect()
    by_user = {r["user_id"]: r for r in stats}
    r1 = by_user[1]
    cv1 = math.sqrt(
        (r1["n"] * r1["sg2"] - r1["s"] ** 2) / (r1["n"] * (r1["n"] - 1))
    ) * r1["n"] / r1["s"]
    assert cv1 == 0.0
    r2 = by_user[2]
    cv2 = math.sqrt(
        (r2["n"] * r2["sg2"] - r2["s"] ** 2) / (r2["n"] * (r2["n"] - 1))
    ) * r2["n"] / r2["s"]
    assert abs(cv2 - math.sqrt(2) / 2) < 1e-12
