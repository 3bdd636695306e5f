"""Round-11 registrations (promoted from the round-11 preview bank):
RFM quartiles and the HLL intersection audit now live in
plans/analytics_queries.py, the datacard / EMD / vocabulary-coverage /
bigram-entropy quartet in plans/curation_queries.py, and the
Kaplan-Meier survival curve in plans/session_queries.py as registered
driver pairs. These tests exercise the REGISTERED pair (the exact
objects the driver sees) plus the domain asserts and the pure-Python
replays the generic oracle-parity sweep does not check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.plans import QUERIES
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR
from .conftest import run_registered_pair as _run_pair

# registered query callables (also imported by tests/test_bank_plans.py)
rfm_quartile_scores = QUERIES["rfm_quartile_scores"].spark_fn
source_datacard_pipeline = QUERIES["source_datacard_pipeline"].spark_fn
hll_intersection_audit = QUERIES["hll_intersection_audit"].spark_fn
length_emd_pairs = QUERIES["length_emd_pairs"].spark_fn
vocab_coverage_curve = QUERIES["vocab_coverage_curve"].spark_fn
bigram_entropy_stats = QUERIES["bigram_entropy_stats"].spark_fn
session_survival_curve = QUERIES["session_survival_curve"].spark_fn


# -- rfm_quartile_scores -----------------------------------------------------


def test_rfm_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "rfm_quartile_scores")
    for c in ("r_q", "f_q", "m_q"):
        assert spdf[c].between(1, 4).all()
    # the quartile formula balances: no quartile holds more than
    # ceil(n/4) users
    import math

    n = len(spdf)
    for c in ("r_q", "f_q", "m_q"):
        assert spdf[c].value_counts().max() <= math.ceil(n / 4)


def test_rfm_matches_python_replay(spark):
    """Full-result replay in pure Python: per-event cents via the
    documented HALF_UP-of-shortest-repr round, exact per-user
    aggregates, the three (value, user_id) tie-broken rank orders, and
    the ceil-rank quartile formula — independent of both the Spark
    windows and the oracle CTEs."""
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    rows = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("date").alias("d"), "value")
        .collect()
    )
    per = defaultdict(lambda: [None, 0, 0])  # last_d, f_cnt, m_cents
    for r in rows:
        cents = int(
            Decimal(repr(r.value * 100)).quantize(
                Decimal("1"), ROUND_HALF_UP
            )
        )
        p = per[r.user_id]
        p[0] = r.d if p[0] is None or r.d > p[0] else p[0]
        p[1] += 1
        p[2] += cents
    gmax = max(p[0] for p in per.values())
    users = {
        u: ((gmax - p[0]).days, p[1], p[2]) for u, p in per.items()
    }
    n = len(users)
    rr = {
        u: i + 1
        for i, u in enumerate(
            sorted(users, key=lambda u: (users[u][0], u))
        )
    }
    rf = {
        u: i + 1
        for i, u in enumerate(
            sorted(users, key=lambda u: (-users[u][1], u))
        )
    }
    rm = {
        u: i + 1
        for i, u in enumerate(
            sorted(users, key=lambda u: (-users[u][2], u))
        )
    }
    q = lambda r: (4 * r + n - 1) // n
    expected = {
        u: (
            users[u][0],
            users[u][1],
            users[u][2],
            q(rr[u]),
            q(rf[u]),
            q(rm[u]),
            q(rr[u]) * 100 + q(rf[u]) * 10 + q(rm[u]),
        )
        for u in users
    }
    spdf = rfm_quartile_scores(spark, SF_DIR).toPandas()
    got = {
        r.user_id: (
            int(r.r_days),
            int(r.f_cnt),
            int(r.m_cents),
            int(r.r_q),
            int(r.f_q),
            int(r.m_q),
            int(r.rfm_code),
        )
        for r in spdf.itertuples()
    }
    assert got == expected


# -- source_datacard_pipeline ------------------------------------------------


def test_source_datacard_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "source_datacard_pipeline")
    assert (spdf["n_shared"] <= spdf["n_grams"]).all()
    assert (spdf["zipf_slope6"] <= 0).all()


# -- hll_intersection_audit --------------------------------------------------


def test_hll_intersection_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "hll_intersection_audit")
    n_types = spdf[["type_a", "type_b"]].stack().nunique()
    assert len(spdf) == n_types * (n_types - 1) // 2
    # structural invariants only: register-max dominance holds within
    # one estimator regime but NOT across the linear-counting boundary,
    # so it is not asserted. The exact side is always consistent:
    assert (spdf["n_inter"] <= spdf[["n_a", "n_b"]].min(axis=1)).all()
    assert (spdf["est_union_u"] > 0).all()


def test_hll_intersection_matches_python_replay(spark):
    """Full-result replay in pure Python: the seeded square-mixed hash,
    the LSB-position rho ladder, per-type register maxima, the
    alpha*m^2/s estimator with linear-counting correction (register
    sums of 2^-m_j are exact powers-of-two sums, so combine order
    cannot drift), pairwise max-merge + inclusion-exclusion in 1e-4
    integer units, and the exact set sides — independent of both the
    Spark pipeline and the oracle CTEs."""
    import math
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal
    from itertools import combinations

    from etl_earthquake_gcp_spark.operators.dedup import (
        _MERSENNE_P,
        minhash_coeffs,
    )
    from etl_earthquake_gcp_spark.operators.sketch import (
        _HLL_MAX_RHO,
        HLL_ALPHA,
        HLL_M,
        HLL_SEED,
    )

    # drift tripwire: the replay must fail LOUDLY if the register width
    # ever changes, rather than silently reproducing a changed value
    assert _HLL_MAX_RHO == 26

    a_c, b_c = minhash_coeffs(1, HLL_SEED)[0]

    def rho(w: int) -> int:
        return (
            _HLL_MAX_RHO
            if w == 0
            else min((w & -w).bit_length(), _HLL_MAX_RHO)
        )

    def est_u(m: list) -> int:
        s = sum(2.0**-mj for mj in m)
        v = sum(1 for mj in m if mj == 0)
        raw = HLL_ALPHA * HLL_M * HLL_M / s
        if raw <= 2.5 * HLL_M and v > 0:
            e = float(HLL_M) * math.log(float(HLL_M) / v)
        else:
            e = raw
        return int(
            Decimal(repr(e * 10000)).quantize(Decimal("1"), ROUND_HALF_UP)
        )

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "user_id")
        .collect()
    )
    regs = defaultdict(lambda: [0] * HLL_M)
    user_sets = defaultdict(set)
    for r in rows:
        user_sets[r.event_type].add(r.user_id)
        h1 = (r.user_id * a_c + b_c) % _MERSENNE_P
        h = (h1 * h1) % _MERSENNE_P
        bucket = h % HLL_M
        m = regs[r.event_type]
        m[bucket] = max(m[bucket], rho(h // HLL_M))
    expected = {}
    for ta, tb in combinations(sorted(regs), 2):
        ea, eb = est_u(regs[ta]), est_u(regs[tb])
        uu = est_u(
            [max(x, y) for x, y in zip(regs[ta], regs[tb])]
        )
        expected[(ta, tb)] = (
            ea,
            eb,
            uu,
            ea + eb - uu,
            len(user_sets[ta]),
            len(user_sets[tb]),
            len(user_sets[ta] & user_sets[tb]),
        )
    spdf = hll_intersection_audit(spark, SF_DIR).toPandas()
    got = {
        (r.type_a, r.type_b): (
            int(r.est_a_u),
            int(r.est_b_u),
            int(r.est_union_u),
            int(r.est_inter_u),
            int(r.n_a),
            int(r.n_b),
            int(r.n_inter),
        )
        for r in spdf.itertuples()
    }
    assert got == expected


# -- length_emd_pairs --------------------------------------------------------


def test_length_emd_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "length_emd_pairs")
    n_src = spdf[["src_a", "src_b"]].stack().nunique()
    assert len(spdf) == n_src * (n_src - 1) // 2
    assert (spdf["emd6"] >= 0).all()


def test_length_emd_matches_python_replay(spark):
    """Full-result replay in pure Python: per-source length histograms,
    the union support walk with integer cross-multiplied CDFs and gap
    weights, one display round — independent of the Spark window chain
    and the oracle CTEs."""
    from collections import Counter, defaultdict
    from decimal import ROUND_HALF_UP, Decimal
    from itertools import combinations

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("source", F.col("n_chars").cast("long").alias("v"))
        .collect()
    )
    hist = defaultdict(Counter)
    for r in docs:
        hist[r.source][r.v] += 1
    sizes = {s: sum(c.values()) for s, c in hist.items()}
    expected = {}
    for sa, sb in combinations(sorted(hist), 2):
        na, nb = sizes[sa], sizes[sb]
        support = sorted(set(hist[sa]) | set(hist[sb]))
        cum_a = cum_b = emd_num = 0
        for v, nxt in zip(support, support[1:]):
            cum_a += hist[sa].get(v, 0)
            cum_b += hist[sb].get(v, 0)
            emd_num += abs(cum_a * nb - cum_b * na) * (nxt - v)
        emd6 = float(
            Decimal(repr(emd_num * 1.0 / (na * nb))).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
        expected[(sa, sb)] = (na, nb, emd_num, emd6)
    spdf = length_emd_pairs(spark, SF_DIR).toPandas()
    got = {
        (r.src_a, r.src_b): (
            int(r.n_a),
            int(r.n_b),
            int(r.emd_num),
            r.emd6,
        )
        for r in spdf.itertuples()
    }
    assert got == expected


# -- vocab_coverage_curve ----------------------------------------------------


def test_vocab_coverage_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "vocab_coverage_curve")
    s = spdf.sort_values("k")
    assert s["covered"].is_monotonic_increasing  # more vocab, more mass
    assert (s["coverage6"] <= 1.0).all()


def test_vocab_coverage_matches_python_replay(spark):
    """Full-result replay in pure Python: global token Counter,
    (count DESC, token) rank order, exact prefix sums at each K, one
    display round — independent of the TakeOrdered-head plan and the
    oracle's rank join."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from etl_earthquake_gcp_spark.plans.curation_queries import _COV_KS

    texts = [
        r.text
        for r in load_table(spark, SF_DIR, "documents")
        .select("text")
        .collect()
    ]
    gfreq = Counter()
    for t in texts:
        gfreq.update(t.split(" "))
    n_total = sum(gfreq.values())
    n_vocab = len(gfreq)
    ranked = sorted(gfreq.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = {}
    for k in _COV_KS:
        covered = sum(c for _, c in ranked[:k])
        cov6 = float(
            Decimal(repr(covered * 1.0 / n_total)).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
        expected[k] = (covered, n_total, n_vocab, cov6)
    spdf = vocab_coverage_curve(spark, SF_DIR).toPandas()
    got = {
        int(r.k): (
            int(r.covered),
            int(r.n_total),
            int(r.n_vocab),
            r.coverage6,
        )
        for r in spdf.itertuples()
    }
    assert got == expected


# -- bigram_entropy_stats ----------------------------------------------------


def test_bigram_entropy_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "bigram_entropy_stats")
    assert (spdf["h_num_u"] >= 0).all()  # c_a >= c_ab always
    # conditional entropy is bounded by ln of the branching factor
    import numpy as np

    # slack covers the 1e-6-unit per-term log quantization plus the
    # 5e-7 display round (the DSIR-class error budget) — 1e-9 would
    # false-fail on a uniform source whose quantized logs round up
    assert (
        spdf["entropy6"]
        <= np.log(spdf["n_distinct_bigrams"].astype(float)) + 2e-6
    ).all()


def test_bigram_entropy_matches_python_replay(spark):
    """Full-result replay in pure Python: per-source bigram and
    prev-token Counters, the 1e-6-unit quantized logs (math.log then
    HALF_UP-of-shortest-repr, matching F.round(F.log(x) * 1e6, 0)),
    the exact integer weighted sum, one display ratio — independent of
    the Spark join chain and the oracle CTEs."""
    import math
    from collections import Counter, defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("source", "text")
        .collect()
    )
    cab = defaultdict(Counter)
    for r in docs:
        toks = r.text.split(" ")
        for a, b in zip(toks, toks[1:]):
            cab[r.source][(a, b)] += 1
    lnq = lambda x: int(
        Decimal(repr(math.log(x) * 1_000_000)).quantize(
            Decimal("1"), ROUND_HALF_UP
        )
    )
    expected = {}
    for src, counts in cab.items():
        ca = Counter()
        for (a, _), c in counts.items():
            ca[a] += c
        n_bigrams = sum(counts.values())
        h_num = sum(
            c * (lnq(ca[a]) - lnq(c)) for (a, _), c in counts.items()
        )
        e6 = float(
            Decimal(repr(h_num * 1.0 / (n_bigrams * 1_000_000))).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
        expected[src] = (n_bigrams, len(counts), h_num, e6)
    spdf = bigram_entropy_stats(spark, SF_DIR).toPandas()
    got = {
        r.source: (
            int(r.n_bigrams),
            int(r.n_distinct_bigrams),
            int(r.h_num_u),
            r.entropy6,
        )
        for r in spdf.itertuples()
    }
    assert got == expected


# -- session_survival_curve --------------------------------------------------


def test_session_survival_matches_python_replay(spark):
    """Kaplan-Meier replay in pure Python from the session durations:
    the duration histogram, the at-risk countdown, the integer-unit
    log terms (math.log then HALF_UP-of-shortest-repr at 1e-6 units,
    matching F.round(F.log(x) * 1e6, 0)), the cumulative ls_u, and the
    final display exp — independent of the Spark window chain and the
    oracle CTEs. The sessionize construction itself is shared (it has
    its own brute-force property test)."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from etl_earthquake_gcp_spark.operators import sessions

    sess = sessions.sessionize(load_table(spark, SF_DIR, "events"))
    durs = [
        r.t
        for r in sess.select(
            F.expr(
                "(unix_millis(session_end) - unix_millis(session_start))"
                " div 1000"
            ).alias("t")
        ).collect()
    ]
    lnq = lambda x: int(
        Decimal(repr(math.log(x) * 1_000_000)).quantize(
            Decimal("1"), ROUND_HALF_UP
        )
    )
    hist = Counter(durs)
    n_total = len(durs)
    expected, seen, ls_u = {}, 0, 0
    for t in sorted(hist):
        d = hist[t]
        n_risk = n_total - seen
        seen += d
        if n_risk <= d:
            continue
        ls_u += lnq(n_risk - d) - lnq(n_risk)
        surv6 = float(
            Decimal(repr(math.exp(ls_u / 1_000_000.0))).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
        expected[t] = (n_risk, d, ls_u, surv6)
    spdf = session_survival_curve(spark, SF_DIR).toPandas()
    got = {
        int(r.t_s): (int(r.n_risk), int(r.d_events), int(r.ls_u), r.surv6)
        for r in spdf.itertuples()
    }
    assert got == expected


def test_session_survival_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "session_survival_curve")
    s = spdf.sort_values("t_s")
    # survival is a non-increasing step function in [0, 1]: the last
    # included step is survivors/N >= 1/N, which the 6dp display
    # rounds to 0.0 once N exceeds ~2e6 sessions — so >= 0, not > 0
    assert s["surv6"].is_monotonic_decreasing
    assert ((s["surv6"] >= 0) & (s["surv6"] <= 1)).all()
    # at-risk counts shrink as duration grows
    assert s["n_risk"].is_monotonic_decreasing
