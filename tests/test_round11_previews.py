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
from etl_earthquake_gcp_spark.plans import curation_queries as r9


# -- rfm_quartile_scores -----------------------------------------------------
#
# Classic RFM segmentation over purchase events, all-integer: recency
# in whole days vs the global last purchase date, frequency as a count,
# monetary as per-event cents (each value quantized ONCE) summed
# exactly, and each quartile as the pure rank formula ceil(4r/n) =
# (4r + n − 1) div n — no NTILE, no interpolation. The ranking windows
# run over the USER dimension (|users| rows, orders of magnitude below
# the fact table) — still a frame that GROWS with the data, so the
# exact global row_numbers are the certified baseline form; the 100 TB
# path computes the three quartile boundaries by histogram-rank
# selection (operators/calibrate.py, the quantile_normalize plan) and
# assigns scores with a broadcast range join, never sorting the user
# frame in one task (same note as the registered rfm_segmentation /
# pareto_revenue_share).

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
    {r9.zipf_sql_stages(r9.ZIPF_R)},
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
        r9.zipf_sums(freq, r9.ZIPF_R)
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


# -- hll_intersection_audit --------------------------------------------------
#
# Mergeable-sketch intersection: HLL registers cannot intersect
# natively, so the estimate is inclusion-exclusion over the pairwise
# register max-merge — the standard trick, audited here against the
# EXACT intersection in the same result. Every estimate is quantized
# ONCE into 1e-4 integer units, so the inclusion-exclusion subtraction
# is exact integer arithmetic (three rounded doubles subtracted as
# floats would re-enter the multi-step re-round hazard class). Hash,
# rank ladder, and corrections are the proven sketch.py pipeline,
# constants interpolated from the one source of truth.

from etl_earthquake_gcp_spark.operators.sketch import (  # noqa: E402
    HLL_M,
    HLL_SEED,
    _rho_case_sql,
    hll_raw_est_col,
    hll_raw_est_sql,
)
from etl_earthquake_gcp_spark.operators.dedup import (  # noqa: E402
    _MERSENNE_P,
    minhash_coeffs,
)


def _hll_est_u(s_col, v_col):
    # the ONE sketch.py estimator, quantized once into 1e-4 units
    return (
        F.round(hll_raw_est_col(s_col, v_col) * 10000, 0).cast("long")
    )


def hll_intersection_oracle() -> str:
    a, b = minhash_coeffs(1, HLL_SEED)[0]
    h1 = f"((user_id * {a} + {b}) % {_MERSENNE_P})"
    h = f"(({h1} * {h1}) % {_MERSENNE_P})"
    rho = _rho_case_sql(f"({h} // {HLL_M})")
    est_u = (
        f"CAST(round({hll_raw_est_sql()} * 10000, 0) AS BIGINT)"
    )
    return f"""
    WITH regs AS (
        SELECT event_type AS grp, ({h} % {HLL_M}) AS bucket,
               max({rho}) AS m_j
        FROM events GROUP BY 1, 2
    ), grid AS (
        SELECT g.grp, t.bucket
        FROM (SELECT DISTINCT grp FROM regs) g
        CROSS JOIN range({HLL_M}) t(bucket)
    ), filled AS (
        SELECT grid.grp, grid.bucket, coalesce(r.m_j, 0) AS m_j
        FROM grid LEFT JOIN regs r USING (grp, bucket)
    ), agg AS (
        SELECT grp, sum(pow(2.0, -m_j)) AS s,
               count(*) FILTER (WHERE m_j = 0) AS v
        FROM filled GROUP BY 1
    ), est AS (
        SELECT grp, {est_u} AS e_u FROM agg
    ), pagg AS (
        SELECT a.grp AS type_a, b.grp AS type_b,
               sum(pow(2.0, -greatest(a.m_j, b.m_j))) AS s,
               count(*) FILTER (WHERE greatest(a.m_j, b.m_j) = 0) AS v
        FROM filled a JOIN filled b
          ON a.bucket = b.bucket AND a.grp < b.grp
        GROUP BY 1, 2
    ), uest AS (
        SELECT type_a, type_b, {est_u} AS uu_u FROM pagg
    ), sets AS (
        SELECT DISTINCT event_type AS grp, user_id FROM events
    ), sizes AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n FROM sets GROUP BY 1
    ), inter AS (
        SELECT a.grp AS type_a, b.grp AS type_b,
               CAST(count(*) AS BIGINT) AS n_inter
        FROM sets a JOIN sets b
          ON a.user_id = b.user_id AND a.grp < b.grp
        GROUP BY 1, 2
    )
    SELECT u.type_a, u.type_b,
           ea.e_u AS est_a_u, eb.e_u AS est_b_u, u.uu_u AS est_union_u,
           CAST(ea.e_u + eb.e_u - u.uu_u AS BIGINT) AS est_inter_u,
           sa.n AS n_a, sb.n AS n_b,
           CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter
    FROM uest u
    JOIN est ea ON u.type_a = ea.grp
    JOIN est eb ON u.type_b = eb.grp
    JOIN sizes sa ON u.type_a = sa.grp
    JOIN sizes sb ON u.type_b = sb.grp
    LEFT JOIN inter i ON u.type_a = i.type_a AND u.type_b = i.type_b
    """


def hll_intersection_audit(spark, sf_dir):
    from etl_earthquake_gcp_spark.operators import sketch

    e = load_table(spark, sf_dir, "events")
    regs = sketch.hll_registers_by(e, "user_id", "event_type")
    allb = spark.range(HLL_M).select(F.col("id").alias("bucket"))
    grid = regs.select("grp").distinct().crossJoin(F.broadcast(allb))
    filled = (
        grid.join(regs, ["grp", "bucket"], "left")
        .select("grp", "bucket", F.coalesce("m_j", F.lit(0)).alias("m_j"))
        .persist()  # feeds per-type aggs AND both pair sides
    )
    agg = filled.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("s"),
        F.count_if(F.col("m_j") == 0).alias("v"),
    )
    est = agg.select("grp", _hll_est_u(F.col("s"), F.col("v")).alias("e_u"))
    fa, fb = filled.alias("fa"), filled.alias("fb")
    mj = F.greatest(F.col("fa.m_j"), F.col("fb.m_j"))
    pagg = (
        fa.join(
            fb,
            (F.col("fa.bucket") == F.col("fb.bucket"))
            & (F.col("fa.grp") < F.col("fb.grp")),
        )
        .groupBy(
            F.col("fa.grp").alias("type_a"), F.col("fb.grp").alias("type_b")
        )
        .agg(
            F.sum(F.pow(F.lit(2.0), -mj)).alias("s"),
            F.count_if(mj == 0).alias("v"),
        )
    )
    uest = pagg.select(
        "type_a", "type_b", _hll_est_u(F.col("s"), F.col("v")).alias("uu_u")
    )
    sets = e.select(
        F.col("event_type").alias("grp"), "user_id"
    ).distinct().persist()
    sizes = sets.groupBy("grp").agg(F.count("*").cast("long").alias("n"))
    sa, sb = sets.alias("sa"), sets.alias("sb")
    inter = (
        sa.join(
            sb,
            (F.col("sa.user_id") == F.col("sb.user_id"))
            & (F.col("sa.grp") < F.col("sb.grp")),
        )
        .groupBy(
            F.col("sa.grp").alias("type_a"), F.col("sb.grp").alias("type_b")
        )
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    ea = est.select(F.col("grp").alias("type_a"), F.col("e_u").alias("est_a_u"))
    eb = est.select(F.col("grp").alias("type_b"), F.col("e_u").alias("est_b_u"))
    na = sizes.select(F.col("grp").alias("type_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("grp").alias("type_b"), F.col("n").alias("n_b"))
    return (
        uest.join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .join(F.broadcast(inter), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "est_a_u",
            "est_b_u",
            F.col("uu_u").alias("est_union_u"),
            (F.col("est_a_u") + F.col("est_b_u") - F.col("uu_u"))
            .cast("long")
            .alias("est_inter_u"),
            "n_a",
            "n_b",
            F.coalesce("n_inter", F.lit(0)).cast("long").alias("n_inter"),
        )
    )


def test_hll_intersection_oracle_parity(spark, oracle):
    spdf = hll_intersection_audit(spark, SF_DIR).toPandas()
    opdf = oracle.execute(hll_intersection_oracle()).df()
    assert_frames_match(spdf, opdf, "hll_intersection_audit")
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

    from etl_earthquake_gcp_spark.operators.sketch import (
        _HLL_MAX_RHO,
        HLL_ALPHA,
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
#
# Distribution drift between sources, third metric beside the
# registered PSI/binned-KS: exact 1-D earth mover's distance between
# per-source doc-length distributions. EMD_1D = sum over the union
# support of |cdfA - cdfB| * gap; cross-multiplying by the two counts
# keeps the whole accumulation in exact integers (|cumA*nB - cumB*nA|
# * gap), with ONE int/int ratio round at display. Everything runs on
# dimension-sized frames (per-source length histograms).

LENGTH_EMD_ORACLE = """
    WITH hist AS (
        SELECT source, CAST(n_chars AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1, 2
    ), sizes AS (
        SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM hist GROUP BY 1
    ), pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               a.n AS n_a, b.n AS n_b
        FROM sizes a JOIN sizes b ON a.source < b.source
    ), support AS (
        SELECT DISTINCT p.src_a, p.src_b, h.v
        FROM pairs p JOIN hist h
          ON h.source = p.src_a OR h.source = p.src_b
    ), joined AS (
        SELECT s.src_a, s.src_b, s.v,
               coalesce(ha.cnt, 0) AS ca, coalesce(hb.cnt, 0) AS cb
        FROM support s
        LEFT JOIN hist ha ON ha.source = s.src_a AND ha.v = s.v
        LEFT JOIN hist hb ON hb.source = s.src_b AND hb.v = s.v
    ), cum AS (
        SELECT src_a, src_b, v,
               sum(ca) OVER (PARTITION BY src_a, src_b ORDER BY v) AS cum_a,
               sum(cb) OVER (PARTITION BY src_a, src_b ORDER BY v) AS cum_b,
               lead(v) OVER (PARTITION BY src_a, src_b ORDER BY v) - v
                   AS gap
        FROM joined
    ), num AS (
        SELECT src_a, src_b,
               CAST(sum(abs(cum_a * p.n_b - cum_b * p.n_a) * gap)
                    AS BIGINT) AS emd_num
        FROM cum JOIN pairs p USING (src_a, src_b)
        WHERE gap IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT n.src_a, n.src_b, p.n_a, p.n_b, n.emd_num,
           round(n.emd_num * 1.0 / (p.n_a * p.n_b), 6) AS emd6
    FROM num n JOIN pairs p USING (src_a, src_b)
"""


def length_emd_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    hist = (
        docs.groupBy(
            "source", F.col("n_chars").cast("long").alias("v")
        )
        .agg(F.count("*").cast("long").alias("cnt"))
        .persist()  # feeds sizes, support, and both cdf sides
    )
    sizes = hist.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n")
    )
    a, b = sizes.alias("a"), sizes.alias("b")
    pairs = a.join(b, F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
    )
    h = hist.select("source", "v")
    support = (
        pairs.join(
            F.broadcast(h),
            (h["source"] == pairs["src_a"])
            | (h["source"] == pairs["src_b"]),
        )
        .select("src_a", "src_b", "v")
        .distinct()
    )
    ha = hist.select(
        F.col("source").alias("src_a"),
        F.col("v").alias("v"),
        F.col("cnt").alias("ca"),
    )
    hb = hist.select(
        F.col("source").alias("src_b"),
        F.col("v").alias("v"),
        F.col("cnt").alias("cb"),
    )
    joined = (
        support.join(F.broadcast(ha), ["src_a", "v"], "left")
        .join(F.broadcast(hb), ["src_b", "v"], "left")
        .select(
            "src_a",
            "src_b",
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    w = (
        Window.partitionBy("src_a", "src_b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wl = Window.partitionBy("src_a", "src_b").orderBy("v")
    cum = joined.select(
        "src_a",
        "src_b",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        (F.lead("v").over(wl) - F.col("v")).alias("gap"),
    )
    num = (
        cum.filter(F.col("gap").isNotNull())
        .join(F.broadcast(pairs), ["src_a", "src_b"])
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
                * F.col("gap")
            )
            .cast("long")
            .alias("emd_num")
        )
    )
    return num.join(F.broadcast(pairs), ["src_a", "src_b"]).select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        "emd_num",
        F.round(
            F.col("emd_num") * 1.0 / (F.col("n_a") * F.col("n_b")), 6
        ).alias("emd6"),
    )


def test_length_emd_oracle_parity(spark, oracle):
    spdf = length_emd_pairs(spark, SF_DIR).toPandas()
    opdf = oracle.execute(LENGTH_EMD_ORACLE).df()
    assert_frames_match(spdf, opdf, "length_emd_pairs")
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
#
# Tokenizer-design read: what share of the corpus token mass the top-K
# vocabulary entries cover, at K = 10 / 100 / 1000 — the cumulative
# companion to the Zipf slope. Ranks and cumulative masses are exact
# integers (frequency histogram + rank filter); one ratio per row.

_COV_KS = (10, 100, 1000)

VOCAB_COVERAGE_ORACLE = f"""
    WITH gfreq AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY tok
    ), tot AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n_total,
               CAST(count(*) AS BIGINT) AS n_vocab
        FROM gfreq
    ), ranked AS (
        SELECT cnt,
               row_number() OVER (ORDER BY cnt DESC, tok) AS r
        FROM gfreq
    ), ks AS (
        SELECT unnest(ARRAY{list(_COV_KS)}) AS k
    )
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(sum(r.cnt) AS BIGINT) AS covered,
           tot.n_total, tot.n_vocab,
           round(sum(r.cnt) * 1.0 / tot.n_total, 6) AS coverage6
    FROM ks JOIN ranked r ON r.r <= ks.k CROSS JOIN tot
    GROUP BY ks.k, tot.n_total, tot.n_vocab
"""


def vocab_coverage_curve(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("text")
    gfreq = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
        .persist()  # feeds totals AND the ranked prefix sums
    )
    tot = gfreq.agg(
        F.sum("cnt").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n_vocab"),
    )
    # top-maxK FIRST via TakeOrderedAndProject (map-side partial
    # top-k), THEN rank the bounded head — a row_number over the full
    # vocabulary would single-partition-sort a corpus-growing frame
    # (Heaps' law), the epoch_shuffle_order lesson
    head = gfreq.orderBy(F.desc("cnt"), "tok").limit(max(_COV_KS))
    w = Window.orderBy(F.desc("cnt"), "tok")
    ranked = head.withColumn("r", F.row_number().over(w))
    ks = spark.createDataFrame([(k,) for k in _COV_KS], "k long")
    return (
        F.broadcast(ks)
        .join(ranked, ranked["r"] <= ks["k"])
        .crossJoin(F.broadcast(tot))
        .groupBy("k", "n_total", "n_vocab")
        .agg(
            F.sum("cnt").cast("long").alias("covered"),
            F.round(F.sum("cnt") * 1.0 / F.first("n_total"), 6).alias(
                "coverage6"
            ),
        )
        .select("k", "covered", "n_total", "n_vocab", "coverage6")
    )


def test_vocab_coverage_oracle_parity(spark, oracle):
    spdf = vocab_coverage_curve(spark, SF_DIR).toPandas()
    opdf = oracle.execute(VOCAB_COVERAGE_ORACLE).df()
    assert_frames_match(spdf, opdf, "vocab_coverage_curve")
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
#
# Per-source conditional bigram entropy H(next | prev) =
# (1/N) * sum over bigrams of c_ab * (ln c_a - ln c_ab) — the
# language-health read that separates natural text from templated or
# shuffled shards. Both logs are over EXACT integer counts, quantized
# ONCE to 1e-6 units (the DSIR libm-absorption class); the weighted sum
# is exact integer arithmetic; one display ratio (entropy in nats).

BIGRAM_ENTROPY_ORACLE = """
    WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents
    ), bg AS (
        SELECT source, toks[s.i] AS a, toks[s.i + 1] AS b
        FROM t, LATERAL (SELECT unnest(generate_series(1,
                 len(toks) - 1)) AS i) s
        WHERE len(toks) >= 2
    ), cab AS (
        SELECT source, a, b, CAST(count(*) AS BIGINT) AS c_ab
        FROM bg GROUP BY 1, 2, 3
    ), ca AS (
        SELECT source, a, CAST(sum(c_ab) AS BIGINT) AS c_a
        FROM cab GROUP BY 1, 2
    ), terms AS (
        SELECT cab.source,
               cab.c_ab,
               CAST(round(ln(ca.c_a) * 1000000, 0) AS BIGINT) AS lna_u,
               CAST(round(ln(cab.c_ab) * 1000000, 0) AS BIGINT) AS lnab_u
        FROM cab JOIN ca USING (source, a)
    )
    SELECT source,
           CAST(sum(c_ab) AS BIGINT) AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
           CAST(sum(c_ab * (lna_u - lnab_u)) AS BIGINT) AS h_num_u,
           round(sum(c_ab * (lna_u - lnab_u)) * 1.0
                 / (sum(c_ab) * 1000000), 6) AS entropy6
    FROM terms GROUP BY source
"""


def bigram_entropy_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    toks = F.split("text", " ")
    bg = (
        docs.select("source", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(element_at(toks, i) AS a,"
                    "             element_at(toks, i + 1) AS b))"
                )
            ).alias("p"),
        )
        .select("source", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    cab = bg.groupBy("source", "a", "b").agg(
        F.count("*").cast("long").alias("c_ab")
    ).persist()  # feeds the prev-token marginals AND the term join
    ca = cab.groupBy("source", "a").agg(
        F.sum("c_ab").cast("long").alias("c_a")
    )
    terms = cab.join(ca, ["source", "a"]).select(
        "source",
        "c_ab",
        F.round(F.log("c_a") * 1_000_000, 0).cast("long").alias("lna_u"),
        F.round(F.log("c_ab") * 1_000_000, 0)
        .cast("long")
        .alias("lnab_u"),
    )
    h_num = F.sum(
        F.col("c_ab") * (F.col("lna_u") - F.col("lnab_u"))
    ).cast("long")
    return terms.groupBy("source").agg(
        F.sum("c_ab").cast("long").alias("n_bigrams"),
        F.count("*").cast("long").alias("n_distinct_bigrams"),
        h_num.alias("h_num_u"),
        F.round(
            h_num * 1.0 / (F.sum("c_ab") * 1_000_000), 6
        ).alias("entropy6"),
    )


def test_bigram_entropy_oracle_parity(spark, oracle):
    spdf = bigram_entropy_stats(spark, SF_DIR).toPandas()
    opdf = oracle.execute(BIGRAM_ENTROPY_ORACLE).df()
    assert_frames_match(spdf, opdf, "bigram_entropy_stats")
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
#
# Survival analysis on session durations (Kaplan-Meier product-limit):
# at-risk and event counts at each distinct duration are exact
# integers from a duration histogram; the cumulative log-survival is
# an EXACT integer sum of per-step ln(n-d) - ln(n) terms, each log of
# an exact integer quantized once to 1e-6 units (the DSIR class) — the
# float product the textbook formula implies never happens. One final
# display exp/round. Steps where survival hits zero (n_risk == d) are
# excluded symmetrically. Sessions come from the proven sessionize
# construction (operators/sessions.py, oracle SQL reused verbatim).

from etl_earthquake_gcp_spark.operators import sessions  # noqa: E402

SURVIVAL_ORACLE = f"""
    WITH sess AS ({sessions.sessionize_oracle_sql()}),
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


def session_survival_curve(spark, sf_dir):
    sess = sessions.sessionize(load_table(spark, sf_dir, "events"))
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
    spdf = session_survival_curve(spark, SF_DIR).toPandas()
    opdf = oracle.execute(SURVIVAL_ORACLE).df()
    assert_frames_match(spdf, opdf, "session_survival_curve")
    s = spdf.sort_values("t_s")
    # survival is a non-increasing step function in [0, 1]: the last
    # included step is survivors/N >= 1/N, which the 6dp display
    # rounds to 0.0 once N exceeds ~2e6 sessions — so >= 0, not > 0
    assert s["surv6"].is_monotonic_decreasing
    assert ((s["surv6"] >= 0) & (s["surv6"] <= 1)).all()
    # at-risk counts shrink as duration grows
    assert s["n_risk"].is_monotonic_decreasing
