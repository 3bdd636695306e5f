"""Round-15 query previews: full Spark-vs-DuckDB parity pairs for five
new surfaces, verified NOW so a later registration is a mechanical
@register move (same contract as tests/test_round7_previews.py).

The five surfaces:
- ``countmin_join_size``     — sketch-estimated join cardinality
                               (count-min inner product) audited
                               against the exact join count in-row —
                               the optimizer-statistics read of the
                               mergeable-sketch family
- ``heavy_change_detect``    — users whose activity share changed most
                               between the first and second half of
                               the date range (exact cross-multiplied
                               integer shares, deterministic top-20)
- ``trigram_like_prefilter`` — index-accelerated LIKE: character-
                               trigram postings candidates proven
                               LOSSLESS against the direct substring
                               scan, with in-row precision
- ``weighted_median_price``  — quantity-weighted median price per
                               return flag by cumulative-weight rank
                               SELECTION (never interpolation)
- ``dedup_cluster_size_histogram`` — size distribution of the
                               near-duplicate components (the dedup
                               run's standard report), composed on the
                               registered components query and its
                               oracle
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.operators import sampling
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR, assert_frames_match

# -- countmin_join_size ------------------------------------------------------
#
# Join-cardinality estimation via count-min inner product: each side's
# keys are hashed into a D x W sketch, and |A JOIN B| is estimated as
# min_d sum_w cA[d,w]*cB[d,w]. Each of the D rows uses an INDEPENDENT
# affine hash (a_d*k + c_d) mod p mod W with distinct multipliers (the
# minhash_coeffs pattern) — a shared base hash with additive offsets
# would leave the rows near-fully correlated and collapse min-over-
# depth to a depth-1 sketch (caught in round-6 review). The estimate
# is >= the exact count by construction (collisions only inflate);
# the query emits both plus the inflation ratio — the statistic a
# cost-based optimizer wants before choosing a join strategy, and the
# audit making the sketch hash-checkable rather than rows-only.
# Sketches are |D x W| = 4 x 65536 = 256k cells per side regardless of
# data scale (expected inflation ~ |A|*|B|/W keeps the ratio in single
# digits through sf0.1); the exact count is one join the audit pays at
# test scale (at 100 TB the sketch replaces that join — that is its
# point).

_CM_W = 65536
_CM_D = 4
# distinct multipliers mod p: the house Knuth + xxhash constants and
# two classic LCG multipliers; additive constants likewise independent
_CM_AS = [sampling.HASH_A_RED, sampling.HASH_B_RED, 48271, 69621]
_CM_CS = [11, sampling.HASH_C, 12345, 789221]
_CM_AS_SQL = "[" + ", ".join(str(a) for a in _CM_AS) + "]"
_CM_CS_SQL = "[" + ", ".join(str(c) for c in _CM_CS) + "]"

CM_JOIN_ORACLE = f"""
    WITH lags AS (
        SELECT unnest(generate_series(0, {_CM_D - 1})) AS d
    ), ca AS (
        SELECT d.d,
               (((o_orderkey % {sampling.HASH_P})
                 * ({_CM_AS_SQL})[CAST(d.d + 1 AS INT)]
                 + ({_CM_CS_SQL})[CAST(d.d + 1 AS INT)])
                % {sampling.HASH_P}) % {_CM_W} AS w,
               CAST(count(*) AS BIGINT) AS c
        FROM orders CROSS JOIN lags d
        GROUP BY 1, 2
    ), cb AS (
        SELECT d.d,
               (((l_orderkey % {sampling.HASH_P})
                 * ({_CM_AS_SQL})[CAST(d.d + 1 AS INT)]
                 + ({_CM_CS_SQL})[CAST(d.d + 1 AS INT)])
                % {sampling.HASH_P}) % {_CM_W} AS w,
               CAST(count(*) AS BIGINT) AS c
        FROM lineitem CROSS JOIN lags d
        GROUP BY 1, 2
    ), est AS (
        SELECT a.d, CAST(sum(a.c * b.c) AS BIGINT) AS inner_prod
        FROM ca a JOIN cb b ON a.d = b.d AND a.w = b.w
        GROUP BY 1
    ), exact AS (
        SELECT CAST(count(*) AS BIGINT) AS n
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    )
    SELECT CAST({_CM_W} AS BIGINT) AS width, CAST({_CM_D} AS BIGINT) AS depth,
           CAST(min(e.inner_prod) AS BIGINT) AS est_min,
           x.n AS exact_cnt,
           min(e.inner_prod) >= x.n AS overestimate_ok,
           round(min(e.inner_prod) * 1.0 / x.n, 6) AS ratio6
    FROM est e CROSS JOIN exact x
    GROUP BY x.n
"""


def _cm_w_col(key, d):
    a_d = F.element_at(
        F.array(*[F.lit(a) for a in _CM_AS]), (d + 1).cast("int")
    )
    c_d = F.element_at(
        F.array(*[F.lit(c) for c in _CM_CS]), (d + 1).cast("int")
    )
    return (
        ((key.cast("long") % sampling.HASH_P) * a_d + c_d)
        % sampling.HASH_P
    ) % _CM_W


def countmin_join_size(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lags = spark.range(_CM_D).select(F.col("id").alias("d"))

    def sketch(df, key):
        return (
            df.crossJoin(F.broadcast(lags))
            .groupBy("d", _cm_w_col(F.col(key), F.col("d")).alias("w"))
            .agg(F.count("*").cast("long").alias("c"))
        )

    ca = sketch(o, "o_orderkey")
    cb = sketch(li, "l_orderkey")
    est = (
        ca.alias("a")
        .join(cb.alias("b"), ["d", "w"])
        .groupBy("d")
        .agg(
            F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias(
                "inner_prod"
            )
        )
    )
    exact = o.join(li, o["o_orderkey"] == li["l_orderkey"]).agg(
        F.count("*").cast("long").alias("n")
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .groupBy("n")
        .agg(F.min("inner_prod").cast("long").alias("est_min"))
        .select(
            F.lit(_CM_W).cast("long").alias("width"),
            F.lit(_CM_D).cast("long").alias("depth"),
            "est_min",
            F.col("n").alias("exact_cnt"),
            (F.col("est_min") >= F.col("n")).alias("overestimate_ok"),
            F.round(F.col("est_min") * 1.0 / F.col("n"), 6).alias("ratio6"),
        )
    )


def test_countmin_join_size_oracle_parity(spark, oracle):
    spdf = countmin_join_size(spark, SF_DIR).toPandas()
    opdf = oracle.execute(CM_JOIN_ORACLE).df()
    assert_frames_match(spdf, opdf, "countmin_join_size")
    assert len(spdf) == 1
    assert bool(spdf["overestimate_ok"].iloc[0])
    # at 4 x 65536 cells, expected inflation ~ |A|*|B|/W stays in
    # single digits through sf0.1
    assert spdf["ratio6"].iloc[0] < 10


def test_countmin_matches_python_replay(spark):
    """Full-result replay in pure Python: both D x W Counter sketches
    from the same independent affine hashes, the min-over-depth inner
    product, the exact Counter-product join size, one display round —
    independent of the Spark sketch groupBys and the oracle CTEs."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    okeys = [
        r.o_orderkey
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_orderkey")
        .collect()
    ]
    lkeys = [
        r.l_orderkey
        for r in load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey")
        .collect()
    ]

    def sketch(keys):
        sk = [Counter() for _ in range(_CM_D)]
        for k in keys:
            kr = k % sampling.HASH_P
            for d in range(_CM_D):
                w = ((kr * _CM_AS[d] + _CM_CS[d]) % sampling.HASH_P) % _CM_W
                sk[d][w] += 1
        return sk

    ca, cb = sketch(okeys), sketch(lkeys)
    est_min = min(
        sum(c * cb[d][w] for w, c in ca[d].items()) for d in range(_CM_D)
    )
    oc, lc = Counter(okeys), Counter(lkeys)
    exact = sum(c * lc[k] for k, c in oc.items())
    ratio6 = float(
        Decimal(repr(est_min * 1.0 / exact)).quantize(
            Decimal("0.000001"), ROUND_HALF_UP
        )
    )
    row = countmin_join_size(spark, SF_DIR).toPandas().iloc[0]
    assert (
        int(row.width),
        int(row.depth),
        int(row.est_min),
        int(row.exact_cnt),
        bool(row.overestimate_ok),
        row.ratio6,
    ) == (_CM_W, _CM_D, est_min, exact, est_min >= exact, ratio6)


# -- heavy_change_detect -----------------------------------------------------
#
# Which users' activity share changed most between the first and
# second half of the observed date range: the change score is the
# exact cross-multiplied integer |cnt1*T2 - cnt2*T1| (zero floats
# until the display share), top-20 by (score DESC, user_id). The
# temporal sibling of the Misra-Gries heavy hitters — heavy CHANGE,
# not heavy weight. Facts reduce to per-(user, half) counts first.

_HC_TOP = 20

HEAVY_CHANGE_ORACLE = f"""
    WITH bounds AS (
        SELECT min(CAST(ts AS DATE)) AS mn, max(CAST(ts AS DATE)) AS mx
        FROM events
    ), mid AS (
        SELECT mn + to_days(CAST(date_diff('day', mn, mx) // 2 AS INTEGER))
            AS m
        FROM bounds
    ), halves AS (
        SELECT user_id,
               CAST(sum(CASE WHEN CAST(ts AS DATE) < m.m
                             THEN 1 ELSE 0 END) AS BIGINT) AS cnt1,
               CAST(sum(CASE WHEN CAST(ts AS DATE) >= m.m
                             THEN 1 ELSE 0 END) AS BIGINT) AS cnt2
        FROM events CROSS JOIN mid m
        GROUP BY 1
    ), totals AS (
        SELECT CAST(sum(cnt1) AS BIGINT) AS t1,
               CAST(sum(cnt2) AS BIGINT) AS t2
        FROM halves
    )
    SELECT h.user_id, h.cnt1, h.cnt2,
           CAST(abs(h.cnt1 * t.t2 - h.cnt2 * t.t1) AS BIGINT) AS score
    FROM halves h CROSS JOIN totals t
    WHERE t.t1 > 0 AND t.t2 > 0
    ORDER BY score DESC, h.user_id
    LIMIT {_HC_TOP}
"""


def heavy_change_detect(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    bounds = e.agg(F.min(d).alias("mn"), F.max(d).alias("mx"))
    mid = bounds.select(
        F.expr(
            "date_add(mn, CAST(datediff(mx, mn) div 2 AS INT))"
        ).alias("m")
    )
    halves = (
        e.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(d < F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("cnt1"),
            F.sum(F.when(d >= F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("cnt2"),
        )
    )
    totals = halves.agg(
        F.sum("cnt1").cast("long").alias("t1"),
        F.sum("cnt2").cast("long").alias("t2"),
    )
    return (
        halves.crossJoin(F.broadcast(totals))
        .filter((F.col("t1") > 0) & (F.col("t2") > 0))
        .select(
            "user_id",
            "cnt1",
            "cnt2",
            F.abs(
                F.col("cnt1") * F.col("t2") - F.col("cnt2") * F.col("t1")
            )
            .cast("long")
            .alias("score"),
        )
        .orderBy(F.desc("score"), "user_id")
        .limit(_HC_TOP)
    )


def test_heavy_change_oracle_parity(spark, oracle):
    spdf = heavy_change_detect(spark, SF_DIR).toPandas()
    opdf = oracle.execute(HEAVY_CHANGE_ORACLE).df()
    assert_frames_match(spdf, opdf, "heavy_change_detect")
    # sf0.001 has fewer users than the top-k cap
    assert 0 < len(spdf) <= _HC_TOP
    assert (spdf["score"] >= 0).all()


def test_heavy_change_matches_python_replay(spark):
    """Full-result replay in pure Python: the date-range midpoint, the
    per-user half counts, the exact cross-multiplied change score, and
    the (score DESC, user_id) top-k — independent of the Spark
    TakeOrdered plan and the oracle CTEs."""
    import datetime as dt
    from collections import defaultdict

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .collect()
    )
    mn = min(r.d for r in rows)
    mx = max(r.d for r in rows)
    mid = mn + dt.timedelta(days=(mx - mn).days // 2)
    halves = defaultdict(lambda: [0, 0])
    for r in rows:
        halves[r.user_id][0 if r.d < mid else 1] += 1
    t1 = sum(h[0] for h in halves.values())
    t2 = sum(h[1] for h in halves.values())
    assert t1 > 0 and t2 > 0
    scored = sorted(
        (
            (-abs(c1 * t2 - c2 * t1), u, c1, c2)
            for u, (c1, c2) in halves.items()
        )
    )[:_HC_TOP]
    expected = [(u, c1, c2, -s) for s, u, c1, c2 in scored]
    spdf = heavy_change_detect(spark, SF_DIR).toPandas()
    got = [
        (int(r.user_id), int(r.cnt1), int(r.cnt2), int(r.score))
        for r in spdf.itertuples()
    ]
    assert got == expected


# -- trigram_like_prefilter --------------------------------------------------
#
# Index-accelerated substring search, audited lossless: candidates for
# LIKE '%merge join%' are the docs containing ALL character trigrams
# of the pattern (a postings-intersection count), truth is the direct
# substring scan. A doc containing the substring necessarily contains
# every trigram, so candidates ⊇ truth ALWAYS — the same
# lossless-prefilter contract as PPJoin/PassJoin, here for the LIKE
# path. The summary row certifies the containment and the prefilter
# precision. At scale the postings build is the one-time index; the
# per-query work is |pattern trigrams| posting lookups.

_LIKE_PATTERN = "merge join"
_LIKE_TRIGRAMS = sorted(
    {_LIKE_PATTERN[i : i + 3] for i in range(len(_LIKE_PATTERN) - 2)}
)
_TRI_SQL = "[" + ", ".join(f"'{t}'" for t in _LIKE_TRIGRAMS) + "]"

TRIGRAM_ORACLE = f"""
    WITH postings AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, len(text) - 2),
                   i -> substr(text, CAST(i AS INTEGER), 3))) AS tri
        FROM documents WHERE len(text) >= 3
    ), cand AS (
        SELECT doc_id FROM postings
        WHERE tri IN (SELECT unnest({_TRI_SQL}))
        GROUP BY doc_id
        HAVING count(*) = {len(_LIKE_TRIGRAMS)}
    ), truth AS (
        SELECT doc_id FROM documents
        WHERE contains(text, '{_LIKE_PATTERN}')
    )
    SELECT CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
           (SELECT count(*) FROM truth t
            WHERE t.doc_id NOT IN (SELECT doc_id FROM cand)) = 0
               AS lossless_ok,
           round((SELECT count(*) FROM truth) * 1.0
                 / (SELECT count(*) FROM cand), 6) AS precision6
"""


def trigram_like_prefilter(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    postings = (
        docs.filter(F.length("text") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text) - 2),"
                    " i -> substring(text, i, 3))"
                )
            ).alias("tri"),
        )
        .distinct()
    )
    cand = (
        postings.filter(F.col("tri").isin(_LIKE_TRIGRAMS))
        .groupBy("doc_id")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") == len(_LIKE_TRIGRAMS))
        .select("doc_id")
        .persist()  # consumed by the count AND the containment anti-join
    )
    truth = docs.filter(
        F.instr(F.col("text"), _LIKE_PATTERN) > 0
    ).select("doc_id").persist()
    n_cand = cand.agg(F.count("*").cast("long").alias("n_candidates"))
    n_true = truth.agg(F.count("*").cast("long").alias("n_true"))
    missed = truth.join(cand, "doc_id", "left_anti").agg(
        F.count("*").alias("n_missed")
    )
    return (
        n_cand.crossJoin(n_true)
        .crossJoin(missed)
        .select(
            "n_candidates",
            "n_true",
            (F.col("n_missed") == 0).alias("lossless_ok"),
            F.round(
                F.col("n_true") * 1.0 / F.col("n_candidates"), 6
            ).alias("precision6"),
        )
    )


def test_trigram_prefilter_oracle_parity(spark, oracle):
    spdf = trigram_like_prefilter(spark, SF_DIR).toPandas()
    opdf = oracle.execute(TRIGRAM_ORACLE).df()
    assert_frames_match(spdf, opdf, "trigram_like_prefilter")
    assert bool(spdf["lossless_ok"].iloc[0])
    assert spdf["n_true"].iloc[0] > 0  # pattern chosen to be present


def test_trigram_prefilter_matches_python_replay(spark):
    """Full-result replay in pure Python: per-doc distinct character
    trigrams, the all-trigrams candidate filter, direct substring
    truth, the containment flag and precision — independent of the
    Spark postings pipeline and the oracle CTEs."""
    from decimal import ROUND_HALF_UP, Decimal

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    )
    need = set(_LIKE_TRIGRAMS)
    cand, truth = set(), set()
    for r in docs:
        t = r.text
        if len(t) >= 3:
            tris = {t[i : i + 3] for i in range(len(t) - 2)}
            if need <= tris:
                cand.add(r.doc_id)
        if _LIKE_PATTERN in t:
            truth.add(r.doc_id)
    precision6 = float(
        Decimal(repr(len(truth) * 1.0 / len(cand))).quantize(
            Decimal("0.000001"), ROUND_HALF_UP
        )
    )
    row = trigram_like_prefilter(spark, SF_DIR).toPandas().iloc[0]
    assert (
        int(row.n_candidates),
        int(row.n_true),
        bool(row.lossless_ok),
        row.precision6,
    ) == (len(cand), len(truth), truth <= cand, precision6)


# -- weighted_median_price ---------------------------------------------------
#
# Quantity-weighted median extended price per return flag: the price at
# the first position whose cumulative quantity reaches ceil(total/2) —
# a pure rank SELECTION, never an interpolation (the playbook's
# preferred class: order statistics are permutation-invariant and
# bit-identical across engines). The ORACLE walks the row-level
# (price, orderkey, linenumber) total order; the Spark plan computes
# the SAME selection from the per-(flag, price) quantity histogram —
# see the builder docstring for the equivalence argument. Quantities
# carried as exact integers.
#
# Boundary-hazard audit (r13 verdict #5 — rank-SELECTED values land on
# display-round boundaries at percent rates): the display is the
# SELECTED price carried as exact integer cents (the house entry
# quantization, round(p*100, 0) -> BIGINT on identical doubles) and
# shown by one exact /100.0 — never round(selected_double, 2), which
# splits between the engines' repr-vs-binary round paths whenever a
# selected price carries sub-cent digits ending on a half (fine today
# on 2dp TPC-H prices, a live hazard under any 3dp+ regeneration).
# The total ORDER stays on the raw double (identical bits both
# engines), so selection and display are independently engine-exact.

WEIGHTED_MEDIAN_ORACLE = """
    WITH r AS (
        SELECT l_returnflag AS flag,
               l_extendedprice AS price,
               sum(CAST(floor(l_quantity) AS BIGINT)) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum,
               sum(CAST(floor(l_quantity) AS BIGINT)) OVER (
                   PARTITION BY l_returnflag
               ) AS total
        FROM lineitem
    ), hit AS (
        SELECT flag, price, total,
               row_number() OVER (
                   PARTITION BY flag ORDER BY cum, price
               ) AS rn
        FROM r
        WHERE cum >= (total + 1) // 2
    )
    SELECT flag, CAST(total AS BIGINT) AS total_qty,
           CAST(round(price * 100, 0) AS BIGINT) / 100.0 AS wmedian_price
    FROM hit WHERE rn = 1
"""


def weighted_median_price(spark, sf_dir):
    """Histogram-shaped plan (reworked end-of-r14, the
    pareto_revenue_share_scaled precedent): the oracle's row-level
    cumulative walk totally orders the FACTS in |flags| window
    partitions — the global-orderBy baseline class the r14 rfm rework
    retired — but the selected price only depends on the per-(flag,
    price) quantity HISTOGRAM: within a flag the row-level cumsum and
    the histogram cumsum cross the ceil(total/2) target inside the
    same price group (zero-weight rows never advance either cumsum),
    so the first histogram row with cum >= target carries the
    identical price and the oracle string certifies the histogram
    plan bit-for-bit. One fact groupBy, then windows over
    |flag x distinct price| histogram rows only (the
    quantile_normalize shape; a two-level bucketed refinement a la
    calibrate.desc_rank_boundaries is the named next step if distinct
    prices ever stop fitting a partition)."""
    li = load_table(spark, sf_dir, "lineitem")
    # floor() before the integer cast on BOTH sides: DuckDB's CAST
    # rounds doubles while Spark's truncates — floor makes the
    # quantization explicit and identical (review-caught latent hazard)
    q = F.floor("l_quantity").cast("long")
    hist = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(q).alias("qty"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("flag")
    r = hist.select(
        "flag",
        "price",
        F.sum("qty").over(w_cum).alias("cum"),
        F.sum("qty").over(w_all).alias("total"),
    )
    hit = r.filter(
        F.col("cum") >= F.expr("(total + 1) div 2")
    ).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("flag").orderBy("price")),
    )
    return hit.filter(F.col("rn") == 1).select(
        "flag",
        F.col("total").cast("long").alias("total_qty"),
        # integer-cents display of the SELECTED price (see the
        # boundary-hazard audit note above): entry quantization on
        # identical doubles, then one exact /100.0 — never a float
        # round of the selected value
        (
            F.round(F.col("price") * 100, 0).cast("long") / F.lit(100.0)
        ).alias("wmedian_price"),
    )


def test_weighted_median_oracle_parity(spark, oracle):
    spdf = weighted_median_price(spark, SF_DIR).toPandas()
    opdf = oracle.execute(WEIGHTED_MEDIAN_ORACLE).df()
    assert_frames_match(spdf, opdf, "weighted_median_price")
    assert len(spdf) == 3  # A / N / R return flags


def test_weighted_median_constructed(spark):
    """Pins the selection rule: weights (1, 2, 4) over prices
    (10, 20, 30) have total 7, ceil(7/2) = 4, first cum >= 4 is the
    price 30 row? No: cum = 1, 3, 7 -> the 30 row. Reweight to
    (4, 2, 1): cum = 4, 6, 7 -> the 10 row."""
    df = spark.createDataFrame(
        [("x", 10.0, 1, 1, 1), ("x", 20.0, 2, 2, 1), ("x", 30.0, 4, 3, 1),
         ("y", 10.0, 4, 4, 1), ("y", 20.0, 2, 5, 1), ("y", 30.0, 1, 6, 1)],
        "l_returnflag string, l_extendedprice double, l_quantity long,"
        " l_orderkey long, l_linenumber long",
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("l_returnflag")
    r = df.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.sum("l_quantity").over(w_cum).alias("cum"),
        F.sum("l_quantity").over(w_all).alias("total"),
    )
    hit = (
        r.filter(F.col("cum") >= F.expr("(total + 1) div 2"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("flag").orderBy("cum", "price")
            ),
        )
        .filter(F.col("rn") == 1)
        .collect()
    )
    got = {row["flag"]: row["price"] for row in hit}
    assert got == {"x": 30.0, "y": 10.0}


# -- dedup_cluster_size_histogram --------------------------------------------
#
# The dedup run's standard report: the size distribution of the
# near-duplicate components — how many singletons, how many small
# clusters, how big is the worst nest. COMPOSED on the registered
# near_dup_components query (Spark side) and its registered oracle
# (wrapped as a subquery), so the component semantics exist exactly
# once and a future fix propagates. Two groupBys past the components.

def _cluster_hist_oracle() -> str:
    from etl_earthquake_gcp_spark.plans import QUERIES

    comp = QUERIES["near_dup_components"].oracle
    return f"""
        SELECT size, CAST(count(*) AS BIGINT) AS n_clusters
        FROM (
            SELECT component, CAST(count(*) AS BIGINT) AS size
            FROM ({comp}) GROUP BY component
        ) GROUP BY size
    """


def dedup_cluster_size_histogram(spark, sf_dir):
    from etl_earthquake_gcp_spark.plans.text_queries import (
        near_dup_components,
    )

    comp = near_dup_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(
        F.count("*").cast("long").alias("size")
    )
    return sizes.groupBy("size").agg(
        F.count("*").cast("long").alias("n_clusters")
    )


def test_cluster_histogram_oracle_parity(spark, oracle):
    spdf = dedup_cluster_size_histogram(spark, SF_DIR).toPandas()
    opdf = oracle.execute(_cluster_hist_oracle()).df()
    assert_frames_match(spdf, opdf, "dedup_cluster_size_histogram")
    assert len(spdf) > 0
    # histogram accounts for every document exactly once
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert int((spdf["size"] * spdf["n_clusters"]).sum()) == n_docs
