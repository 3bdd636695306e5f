"""Round-14 query previews: full Spark-vs-DuckDB parity pairs for five
new surfaces, verified NOW so a later registration is a mechanical
@register move (same contract as tests/test_round7_previews.py).

The five surfaces (each a family the registry does not yet cover):
- ``sequence_pair_lift``  — order-sensitive event-pair lift over
                            (user, day) groups: "a precedes b" support
                            and lift vs independence, all integers +
                            single-ratio rounds (the gapped
                            generalization of the strict funnel)
- ``kcore_3peel``         — three k-core peeling rounds on the shared
                            degree-capped co-activity graph (pure
                            integer degrees; per-round census rows)
- ``benford_first_digit`` — Benford's-law first-digit audit of order
                            totals: digits from exact integer cents
                            (never float formatting), expected shares
                            precomputed as integer literals
- ``basket_pair_rules``   — market-basket pair mining over lineitem
                            with the a-priori frequent-item prefilter;
                            support/confidence/lift, deterministic
                            top-50
- ``interarrival_cv``     — per-user inter-arrival coefficient of
                            variation from EXACT integer second gaps:
                            variance as (n*Σg² − S²)/(n(n−1)) — integer
                            numerator, one IEEE-exact sqrt, one round
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR, assert_frames_match

# -- sequence_pair_lift ------------------------------------------------------
#
# For every ordered event-type pair (a, b), a != b: in how many
# (user, day) groups does some a-event strictly precede some b-event
# ("a precedes b" = min_ts(a) < max_ts(b) within the group — an exact
# reformulation needing only per-(group, type) min/max, so the pair
# scan runs over |groups x types| reduced rows, never raw events), and
# the lift of that co-occurrence vs independence:
# lift = n_ab * n_groups / (n_a * n_b). Timestamp ties are excluded by
# the strict < on both engines. Integers + single-ratio rounds.

SEQ_LIFT_ORACLE = """
    WITH spans AS (
        SELECT user_id, CAST(ts AS DATE) AS day, event_type,
               min(ts) AS mn, max(ts) AS mx
        FROM events GROUP BY 1, 2, 3
    ), n_groups AS (
        SELECT CAST(count(DISTINCT (user_id, day)) AS BIGINT) AS n_g
        FROM spans
    ), type_n AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
        FROM spans GROUP BY 1
    ), pair_n AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM spans a JOIN spans b
          ON a.user_id = b.user_id AND a.day = b.day
         AND a.event_type != b.event_type AND a.mn < b.mx
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_ab,
           ta.n_t AS n_a, tb.n_t AS n_b, g.n_g,
           round(p.n_ab * g.n_g * 1.0 / (ta.n_t * tb.n_t), 6) AS lift6
    FROM pair_n p
    JOIN type_n ta ON ta.event_type = p.type_a
    JOIN type_n tb ON tb.event_type = p.type_b
    CROSS JOIN n_groups g
"""


def sequence_pair_lift(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    spans = (
        e.groupBy(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            "event_type",
        )
        .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
        .persist()  # feeds the group census, marginals, and both pair sides
    )
    n_groups = spans.select("user_id", "day").distinct().agg(
        F.count("*").cast("long").alias("n_g")
    )
    type_n = spans.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_t")
    )
    a = spans.select(
        "user_id", "day", F.col("event_type").alias("type_a"),
        F.col("mn").alias("mn_a"),
    )
    b = spans.select(
        "user_id", "day", F.col("event_type").alias("type_b"),
        F.col("mx").alias("mx_b"),
    )
    pair_n = (
        a.join(b, ["user_id", "day"])
        .filter(
            (F.col("type_a") != F.col("type_b"))
            & (F.col("mn_a") < F.col("mx_b"))
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    ta = type_n.select(
        F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a")
    )
    tb = type_n.select(
        F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b")
    )
    return (
        pair_n.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(n_groups))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            "n_g",
            F.round(
                F.col("n_ab") * F.col("n_g") * 1.0
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift6"),
        )
    )


def test_sequence_pair_lift_oracle_parity(spark, oracle):
    spdf = sequence_pair_lift(spark, SF_DIR).toPandas()
    opdf = oracle.execute(SEQ_LIFT_ORACLE).df()
    assert_frames_match(spdf, opdf, "sequence_pair_lift")
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
#
# Three rounds of k-core peeling (k = 3) on the shared degree-capped
# co-activity graph (the triangle/BFS/LPA/Bellman-Ford substrate):
# each round drops every node with current degree < k and keeps only
# edges between survivors. Pure integer degree arithmetic; output is
# one census row per round (surviving nodes, surviving edges, node-id
# checksum) — the classic "dense collaboration core" extraction, and
# the bounded-iteration shape of the full k-core decomposition. Spark
# runs the peels with localCheckpoint per round (the BFS lesson);
# the oracle unrolls three CTE stages.

_KCORE_K = 3


def _kcore_oracle() -> str:
    from etl_earthquake_gcp_spark.plans.analytics_queries import (
        _TRIANGLE_EDGES_SQL,
    )

    stages = []
    prev = "edges"
    for r in (1, 2, 3):
        stages.append(f"""
        deg{r} AS (
            SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
                SELECT u AS node FROM {prev}
                UNION ALL
                SELECT v FROM {prev}
            ) GROUP BY 1
        ), surv{r} AS (
            SELECT node FROM deg{r} WHERE d >= {_KCORE_K}
        ), e{r} AS (
            SELECT e.u, e.v FROM {prev} e
            JOIN surv{r} a ON a.node = e.u
            JOIN surv{r} b ON b.node = e.v
        )""")
        prev = f"e{r}"
    rows = " UNION ALL ".join(
        f"""SELECT CAST({r} AS BIGINT) AS round,
             (SELECT CAST(count(*) AS BIGINT) FROM surv{r}) AS n_nodes,
             (SELECT CAST(count(*) AS BIGINT) FROM e{r}) AS n_edges,
             (SELECT CAST(coalesce(sum(node), 0) AS BIGINT)
              FROM surv{r}) AS node_sum"""
        for r in (1, 2, 3)
    )
    return (
        "WITH "
        + _TRIANGLE_EDGES_SQL.strip()
        + ","
        + ",".join(stages)
        + " "
        + rows
    )


def kcore_3peel(spark, sf_dir):
    from etl_earthquake_gcp_spark.operators.graph import kcore_peel_rounds
    from etl_earthquake_gcp_spark.plans.analytics_queries import (
        _capped_user_edges,
    )

    edges = _capped_user_edges(spark, sf_dir)
    out = []
    for r, (surv, cur) in enumerate(
        kcore_peel_rounds(edges, k=_KCORE_K, rounds=3), start=1
    ):
        census = surv.agg(
            F.lit(r).cast("long").alias("round"),
            F.count("*").cast("long").alias("n_nodes"),
            F.coalesce(F.sum("node"), F.lit(0)).cast("long").alias(
                "node_sum"
            ),
        ).crossJoin(
            cur.agg(F.count("*").cast("long").alias("n_edges"))
        ).select("round", "n_nodes", "n_edges", "node_sum")
        out.append(census)
    res = out[0]
    for c in out[1:]:
        res = res.unionByName(c)
    return res


def test_kcore_oracle_parity(spark, oracle):
    spdf = kcore_3peel(spark, SF_DIR).toPandas()
    opdf = oracle.execute(_kcore_oracle()).df()
    assert_frames_match(spdf, opdf, "kcore_3peel")
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
#
# Benford's-law first-significant-digit audit of order totals (the
# classic fabricated-data forensic): the digit comes from the EXACT
# integer cents value rendered as an integer string — float formatting
# never touches the data path, so both engines agree on every digit.
# Expected Benford shares log10(1 + 1/d) are precomputed in Python as
# 1e-6-unit integer literals; the observed share is quantized by exact
# integer floor division, so the per-digit deviation is pure integer
# arithmetic. One groupBy over orders.

_BENFORD_U = [round(1_000_000 * math.log10(1 + 1 / d)) for d in range(1, 10)]
_BENFORD_SQL = "[" + ", ".join(str(u) for u in _BENFORD_U) + "]"

BENFORD_ORACLE = f"""
    WITH cents AS (
        SELECT c FROM (
            SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
            FROM orders
        ) WHERE c >= 1
    ), digits AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM cents
    ), counts AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS n
        FROM digits GROUP BY 1
    ), total AS (
        SELECT CAST(sum(n) AS BIGINT) AS t FROM counts
    )
    SELECT c.digit, c.n,
           round(c.n * 1.0 / t.t, 6) AS share6,
           CAST(({_BENFORD_SQL})[CAST(c.digit AS INT)] AS BIGINT)
               AS benford_u,
           CAST(abs((c.n * 1000000) // t.t
                    - ({_BENFORD_SQL})[CAST(c.digit AS INT)])
                AS BIGINT) AS dev_u
    FROM counts c CROSS JOIN total t
"""


def benford_first_digit(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    # guard on the INTEGER cents value, not the raw float: a total in
    # (0, 0.005) rounds to 0 cents, whose "first digit" 0 would crash
    # element_at on one engine and NULL on the other — filter it out
    # symmetrically before the digit extraction
    cents = o.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c")
    ).filter(F.col("c") >= 1)
    digits = cents.select(
        F.substring(F.col("c").cast("string"), 1, 1)
        .cast("long")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(
        F.count("*").cast("long").alias("n")
    )
    total = counts.agg(F.sum("n").cast("long").alias("t"))
    benford_arr = F.array(*[F.lit(u) for u in _BENFORD_U])
    bu = F.element_at(benford_arr, F.col("digit").cast("int"))
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        F.round(F.col("n") * 1.0 / F.col("t"), 6).alias("share6"),
        bu.cast("long").alias("benford_u"),
        F.abs(
            F.expr("(n * 1000000) div t") - bu
        ).cast("long").alias("dev_u"),
    )


def test_benford_oracle_parity(spark, oracle):
    spdf = benford_first_digit(spark, SF_DIR).toPandas()
    opdf = oracle.execute(BENFORD_ORACLE).df()
    assert_frames_match(spdf, opdf, "benford_first_digit")
    assert spdf["digit"].between(1, 9).all()
    # the expected shares are the textbook constants
    assert _BENFORD_U[0] == 301030  # log10(2)
    assert sum(_BENFORD_U) in (999999, 1000000, 1000001)  # shares sum to 1


def test_benford_matches_python_replay(spark):
    """Full-result replay in pure Python: cents via the documented
    HALF_UP-of-shortest-repr round (Decimal(repr(x)) mirrors
    BigDecimal.valueOf), digits from the integer string, shares via the
    same single float round — every row must match exactly."""
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
            float(
                Decimal(repr(n * 1.0 / t)).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP
                )
            ),
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
#
# Market-basket pair mining over lineitem: distinct (order, part)
# baskets, the a-priori frequent-item PREFILTER (parts in >= 2 orders
# — infrequent items can never form a frequent pair, so the quadratic
# pair stage only sees filtered baskets), within-order part pairs,
# support / confidence / lift, deterministic top-50 by (support DESC,
# p1, p2). The per-order pair explode is bounded by basket size
# squared — the honest market-basket cost; everything else is one
# groupBy each. Integers + single-ratio rounds.

_BASKET_TOP = 50
_BASKET_MINSUP = 2

BASKET_ORACLE = f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), part_n AS (
        SELECT p, CAST(count(*) AS BIGINT) AS n_p
        FROM items GROUP BY 1
    ), frequent AS (
        SELECT i.o, i.p FROM items i
        JOIN part_n pn ON pn.p = i.p
        WHERE pn.n_p >= {_BASKET_MINSUP}
    ), n_orders AS (
        SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM items
    ), pairs AS (
        SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS supp
        FROM frequent a JOIN frequent b
          ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2
    )
    SELECT p.p1, p.p2, p.supp, na.n_p AS n_p1, nb.n_p AS n_p2,
           round(p.supp * 1.0 / na.n_p, 6) AS conf1,
           round(p.supp * o.n * 1.0 / (na.n_p * nb.n_p), 6) AS lift6
    FROM pairs p
    JOIN part_n na ON na.p = p.p1
    JOIN part_n nb ON nb.p = p.p2
    CROSS JOIN n_orders o
    ORDER BY p.supp DESC, p.p1, p.p2
    LIMIT {_BASKET_TOP}
"""


def basket_pair_rules(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .persist()  # feeds part marginals, the order census, both pair sides
    )
    part_n = items.groupBy("p").agg(
        F.count("*").cast("long").alias("n_p")
    )
    frequent = items.join(
        F.broadcast(part_n.filter(F.col("n_p") >= _BASKET_MINSUP)), "p"
    ).select("o", "p")
    n_orders = items.select("o").distinct().agg(
        F.count("*").cast("long").alias("n")
    )
    a = frequent.select("o", F.col("p").alias("p1"))
    b = frequent.select("o", F.col("p").alias("p2"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("long").alias("supp"))
    )
    na = part_n.select(F.col("p").alias("p1"), F.col("n_p").alias("n_p1"))
    nb = part_n.select(F.col("p").alias("p2"), F.col("n_p").alias("n_p2"))
    return (
        pairs.join(F.broadcast(na), "p1")
        .join(F.broadcast(nb), "p2")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "supp",
            "n_p1",
            "n_p2",
            F.round(F.col("supp") * 1.0 / F.col("n_p1"), 6).alias("conf1"),
            F.round(
                F.col("supp") * F.col("n") * 1.0
                / (F.col("n_p1") * F.col("n_p2")),
                6,
            ).alias("lift6"),
        )
        .orderBy(F.desc("supp"), "p1", "p2")
        .limit(_BASKET_TOP)
    )


def test_basket_oracle_parity(spark, oracle):
    spdf = basket_pair_rules(spark, SF_DIR).toPandas()
    opdf = oracle.execute(BASKET_ORACLE).df()
    assert_frames_match(spdf, opdf, "basket_pair_rules")
    assert 0 < len(spdf) <= _BASKET_TOP
    # support never exceeds either item's order count
    assert (spdf["supp"] <= spdf[["n_p1", "n_p2"]].min(axis=1)).all()


def test_basket_matches_python_replay(spark):
    """Full-result replay in pure Python: distinct baskets, part
    marginals, the min-support prefilter, within-order pair Counters,
    the two display ratios, and the (supp DESC, p1, p2) top-k —
    independent of the Spark join pipeline and the oracle CTEs."""
    from collections import Counter, defaultdict
    from decimal import ROUND_HALF_UP, Decimal
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

    def r6(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    ranked = sorted(supp.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = [
        (
            p1,
            p2,
            s,
            part_n[p1],
            part_n[p2],
            r6(s * 1.0 / part_n[p1]),
            r6(s * n_orders * 1.0 / (part_n[p1] * part_n[p2])),
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
#
# Per-user inter-arrival coefficient of variation over EXACT integer
# second gaps (bursty vs regular activity — CV >> 1 marks bursts, ~1 is
# memoryless): the sample variance is carried as the exact integer
# numerator n*sum(g^2) - S^2 over denominator n*(n-1), so
# cv = sqrt(num/den) * n / S needs exactly one IEEE-exact sqrt and two
# fixed-order float ops before the single round — bit-identical across
# engines on identical integers. Needs n >= 2 gaps and S > 0
# (symmetric guards). One window lag + one groupBy; the window runs
# per user. BIGINT bound: n*sum(g^2) < 2^63 — with 30-day spans
# (g <= 2.6e6 s) safe to ~1000 events/user; beyond, compute gaps in
# minutes or widen to DECIMAL(38,0) on both engines.
#
# Boundary-hazard audit (the r13 cusum criterion — small-denominator
# rationals land on display-round boundaries at percent rates):
# mean = S/n is exactly the hazard class (n is a per-user gap count —
# hundreds; an exhaustive n < 3000 search found 243 exact 4dp
# half-boundary rationals where the engines' round paths diverge, all
# with reduced denominator 2^5*5^b), so mean_s is an integer
# half-away quantization — mean_u = (2*S*10^4 + n) div (2*n), one
# exact-integer-by-10^4.0 display division — never a float round.
# cv6 stays the accepted single-round class: sqrt makes the true
# value irrational unless the variance ratio is a perfect square, and
# those degenerate cases carry the user's total gap seconds S
# (thousands) in the denominator — not the small-denominator grid.

INTERARRIVAL_ORACLE = """
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
"""


def interarrival_cv(spark, sf_dir):
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
        # rational (see the boundary-hazard audit note above) — never
        # float-round it; the only float op is the exact /10^4 display
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


def test_interarrival_oracle_parity(spark, oracle):
    spdf = interarrival_cv(spark, SF_DIR).toPandas()
    opdf = oracle.execute(INTERARRIVAL_ORACLE).df()
    assert_frames_match(spdf, opdf, "interarrival_cv")
    assert len(spdf) > 0
    assert (spdf["cv6"] >= 0).all()


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
