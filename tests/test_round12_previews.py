"""Round-12 query previews: full Spark-vs-DuckDB parity pairs for five
new analytics/curation surfaces, verified NOW so a later registration is
a mechanical @register move (same contract as tests/test_round7_previews.py:
each test runs the planned queries() callable against the planned
oracle_sql() string with the driver-sim comparator).

The five surfaces:
- ``roc_auc_exact``       — exact Mann-Whitney AUC with integer tied-rank
                            arithmetic (hash-green audit sibling of the
                            MLlib evaluator's approximate curve AUC)
- ``gini_concentration``  — per-source Gini of the doc-length
                            distribution (corpus-inequality read), exact
                            integer Lorenz sums, one display ratio
- ``ngram_decontaminate`` — 8-gram exact-overlap eval-set decontamination
                            (the n-gram sibling of the registered
                            decontaminate_by_embedding)
- ``acf_daily_counts``    — autocorrelation of the daily event-count
                            series at lags 1..3, ZERO quantization: the
                            residual n*c - S is an exact integer, so both
                            ACF sums are pure integer arithmetic
- ``chi2_token_source``   — chi-squared token-source association over the
                            top-20 tokens (feature-selection surface);
                            per-cell terms from exact integer d = O*N-R*C
                            in one fixed IEEE op order, quantized ONCE to
                            1e-6 units and integer-summed
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR, assert_frames_match

# -- roc_auc_exact -----------------------------------------------------------
#
# "How well does `value` separate purchases from clicks": pos = purchase,
# neg = click, score = the raw double (ranking raw doubles is a pure
# order statistic — permutation-invariant, no rounding hazard; the
# playbook's preferred class). Mann-Whitney over the distinct-value
# histogram: U = sum_v np_v * nn_below_v + ties/2; we carry 2U so ties
# stay integer. One |distinct values|-row window after a fact-scan
# groupBy — at 100 TB the window runs on the histogram, not the facts.
# Overflow contract: 2U < 2*n_pos*n_neg, inside BIGINT while
# n_pos*n_neg < 4.6e18 (n_pos, n_neg ~ 2e9 — beyond any per-class event
# count the driver scales reach).

ROC_AUC_ORACLE = """
    WITH lab AS (
        SELECT value AS v,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
        WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    ), h AS (
        SELECT v, CAST(sum(y) AS BIGINT) AS np,
               CAST(count(*) - sum(y) AS BIGINT) AS nn
        FROM lab GROUP BY v
    ), w AS (
        SELECT v, np, nn,
               CAST(coalesce(sum(nn) OVER (
                   ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS nn_below
        FROM h
    )
    SELECT CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(nn) AS BIGINT) AS n_neg,
           CAST(2 * sum(np * nn_below) + sum(np * nn) AS BIGINT) AS u2,
           round((2 * sum(np * nn_below) + sum(np * nn)) * 1.0
                 / (2 * sum(np) * sum(nn)), 6) AS auc
    FROM w
"""


def roc_auc_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    lab = e.filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    ).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    h = lab.groupBy("v").agg(
        F.sum("y").cast("long").alias("np"),
        (F.count("*") - F.sum("y")).cast("long").alias("nn"),
    )
    w_below = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w = h.withColumn(
        "nn_below",
        F.coalesce(F.sum("nn").over(w_below), F.lit(0)).cast("long"),
    )
    return w.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        (2 * F.sum(F.col("np") * F.col("nn_below"))
         + F.sum(F.col("np") * F.col("nn"))).cast("long").alias("u2"),
        F.round(
            (2 * F.sum(F.col("np") * F.col("nn_below"))
             + F.sum(F.col("np") * F.col("nn")))
            * 1.0
            / (2 * F.sum("np") * F.sum("nn")),
            6,
        ).alias("auc"),
    )


def test_roc_auc_oracle_parity(spark, oracle):
    spdf = roc_auc_exact(spark, SF_DIR).toPandas()
    opdf = oracle.execute(ROC_AUC_ORACLE).df()
    assert_frames_match(spdf, opdf, "roc_auc_exact")
    assert len(spdf) == 1
    assert 0.0 <= spdf["auc"].iloc[0] <= 1.0


def test_roc_auc_matches_pairwise_definition(spark):
    """AUC == P(score_pos > score_neg) + 0.5*P(tie), brute-forced over
    all pos x neg pairs on the small frame — pins the histogram-window
    formulation to the textbook definition."""
    import itertools

    e = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("event_type", "value")
        .toPandas()
    )
    pos = e[e["event_type"] == "purchase"]["value"].tolist()
    neg = e[e["event_type"] == "click"]["value"].tolist()
    if len(pos) * len(neg) > 2_000_000:
        import pytest

        pytest.skip("pairwise brute force is for the sf0.001 frame only")
    wins = ties = 0
    for p, n in itertools.product(pos, neg):
        if p > n:
            wins += 1
        elif p == n:
            ties += 1
    expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
    got = roc_auc_exact(spark, SF_DIR).toPandas()["auc"].iloc[0]
    assert abs(got - expect) < 1e-6


# -- gini_concentration ------------------------------------------------------
#
# Per-source Gini coefficient of doc lengths (is one shard dominated by
# a few huge documents?): with lengths sorted ascending and ranked
# 1..n, G = (2*sum(rank*x) - (n+1)*sum(x)) / (n*sum(x)). All three sums
# are exact integers; ties are invariant (permuting equal x among ranks
# leaves sum(rank*x) unchanged), so the doc_id tie-break only pins the
# row_number, not the value. One per-source window sort over the
# documents table — the same dimension-partitioned sort class as the
# rank suites. Overflow: sum(rank*x) <= n^2 * max_len — inside BIGINT
# while n_docs/source * sqrt(max_len) < 3e9 (beyond the driver scales).

GINI_ORACLE = """
    WITH r AS (
        SELECT source, n_chars AS x,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id
               ) AS rk
        FROM documents
    ), s AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(x) AS BIGINT) AS total_chars,
               CAST(sum(rk * x) AS BIGINT) AS lorenz_sum
        FROM r GROUP BY source
    )
    SELECT source, n_docs, total_chars,
           round((2 * lorenz_sum - (n_docs + 1) * total_chars) * 1.0
                 / (n_docs * total_chars), 6) + 0.0 AS gini
    FROM s WHERE total_chars > 0
"""


def gini_concentration(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = d.select(
        "source",
        F.col("n_chars").alias("x"),
        F.row_number().over(w).alias("rk"),
    )
    s = r.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("x").cast("long").alias("total_chars"),
        F.sum(F.col("rk") * F.col("x")).cast("long").alias("lorenz_sum"),
    )
    return s.filter(F.col("total_chars") > 0).select(
        "source",
        "n_docs",
        "total_chars",
        (
            F.round(
                (2 * F.col("lorenz_sum")
                 - (F.col("n_docs") + 1) * F.col("total_chars"))
                * 1.0
                / (F.col("n_docs") * F.col("total_chars")),
                6,
            )
            + F.lit(0.0)
        ).alias("gini"),
    )


def test_gini_oracle_parity(spark, oracle):
    spdf = gini_concentration(spark, SF_DIR).toPandas()
    opdf = oracle.execute(GINI_ORACLE).df()
    assert_frames_match(spdf, opdf, "gini_concentration")
    assert len(spdf) > 0
    # Gini of a finite sample lies in [0, 1)
    assert ((spdf["gini"] >= 0) & (spdf["gini"] < 1)).all()


def test_gini_known_values(spark):
    """Uniform lengths -> 0; one doc owns everything -> (n-1)/n."""
    df = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 100), (3, "u", 100), (4, "u", 100),
         (5, "k", 0), (6, "k", 0), (7, "k", 0), (8, "k", 1000)],
        "doc_id long, source string, n_chars long",
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = df.select(
        "source", F.col("n_chars").alias("x"),
        F.row_number().over(w).alias("rk"),
    )
    s = r.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("tot"),
        F.sum(F.col("rk") * F.col("x")).cast("long").alias("ls"),
    ).collect()
    got = {
        row["source"]: (2 * row["ls"] - (row["n"] + 1) * row["tot"])
        / (row["n"] * row["tot"])
        for row in s
    }
    assert got["u"] == 0.0
    assert abs(got["k"] - 3 / 4) < 1e-12


# -- ngram_decontaminate -----------------------------------------------------
#
# Exact 8-gram-overlap decontamination (the n-gram sibling of the
# registered decontaminate_by_embedding, and the find stage of the
# GPT-3/Llama eval-contamination protocol): the held-out eval shard is
# the deterministic doc_id % 7 == 0 slice; a corpus doc is contaminated
# if any of its distinct 8-grams appears in any eval doc. The mod-7
# shard is a TEST-HARNESS choice: the synthetic corpus is mostly
# unique text, so a 1/97 shard yields zero 8-gram overlap at sf0.01
# and the driver row would be a vacuous 0=0; production eval sets are
# fixed benchmark suites — dimension-sized regardless of corpus scale
# — which is the contract the broadcast semi-join plan encodes.
# Candidate volume is linear in corpus grams, never quadratic.
# Output: per contaminated doc, its gram count, hit count, and hit
# share (integers + one single-ratio round).

_DECON_N = 8
_DECON_MOD = 7

NGRAM_DECON_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(toks[i:i + {_DECON_N} - 1], ' ') AS gram
        FROM t, LATERAL (SELECT unnest(generate_series(1,
                 len(toks) - {_DECON_N} + 1)) AS i) s
        WHERE len(toks) >= {_DECON_N}
    ), eval_grams AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id % {_DECON_MOD} = 0
    ), corpus AS (
        SELECT doc_id, gram FROM grams WHERE doc_id % {_DECON_MOD} != 0
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           round(sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS hit_share
    FROM corpus c LEFT JOIN eval_grams e USING (gram)
    GROUP BY c.doc_id
    HAVING sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) > 0
"""


def ngram_decontaminate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= _DECON_N)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_DECON_N} + 1),"
                    f" i -> array_join(slice(toks, i, {_DECON_N}), ' '))"
                )
            ).alias("gram"),
        )
        .distinct()
        .persist()  # feeds both the eval set and the corpus side
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % _DECON_MOD == 0)
        .select("gram")
        .distinct()
    )
    corpus = grams.filter(F.col("doc_id") % _DECON_MOD != 0)
    hits = corpus.join(
        F.broadcast(eval_grams.withColumn("_hit", F.lit(1))),
        "gram",
        "left",
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hit"),
            F.round(
                F.sum(F.coalesce("_hit", F.lit(0))) * 1.0 / F.count("*"), 6
            ).alias("hit_share"),
        )
        .filter(F.col("n_hit") > 0)
    )


def test_ngram_decontaminate_oracle_parity(spark, oracle):
    spdf = ngram_decontaminate(spark, SF_DIR).toPandas()
    opdf = oracle.execute(NGRAM_DECON_ORACLE).df()
    assert_frames_match(spdf, opdf, "ngram_decontaminate")
    # the synthetic corpus repeats template sentences across docs, so
    # some contamination must be found (and shares are valid ratios)
    assert len(spdf) > 0
    assert ((spdf["hit_share"] > 0) & (spdf["hit_share"] <= 1)).all()
    assert (spdf["doc_id"] % _DECON_MOD != 0).all()


def test_ngram_decontaminate_matches_python_replay(spark):
    """Full-result replay in pure Python: distinct n-gram sets per doc,
    the doc_id-mod eval shard, hit counting against the eval union, one
    display round — independent of the Spark broadcast join and the
    oracle CTEs."""
    from decimal import ROUND_HALF_UP, Decimal

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    )
    gram_sets = {}
    for r in docs:
        toks = r.text.split(" ")
        if len(toks) < _DECON_N:
            continue
        gram_sets[r.doc_id] = {
            " ".join(toks[i : i + _DECON_N])
            for i in range(len(toks) - _DECON_N + 1)
        }
    eval_union = set()
    for did, gs in gram_sets.items():
        if did % _DECON_MOD == 0:
            eval_union |= gs
    expected = {}
    for did, gs in gram_sets.items():
        if did % _DECON_MOD == 0:
            continue
        n_hit = sum(1 for g in gs if g in eval_union)
        if n_hit > 0:
            share = float(
                Decimal(repr(n_hit * 1.0 / len(gs))).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP
                )
            )
            expected[did] = (len(gs), n_hit, share)
    spdf = ngram_decontaminate(spark, SF_DIR).toPandas()
    got = {
        int(r.doc_id): (int(r.n_grams), int(r.n_hit), r.hit_share)
        for r in spdf.itertuples()
    }
    assert got == expected


# -- acf_daily_counts --------------------------------------------------------
#
# Sample autocorrelation of the daily event-count series at lags 1..3
# (load seasonality / burst detection read). ZERO quantization anywhere:
# with n days and S = sum of counts, the scaled residual r_d = n*c_d - S
# is an exact integer (= n*(c_d - mean)), and both the lag products and
# the denominator are integer sums — the n^2 factor cancels in the
# ratio. Pairs are date-joined (d, d+k), so a missing day contributes no
# pair on either engine. Facts reduce to a |days|-row series first; the
# lag join is dimension-sized. Overflow: |res| <= n*max_c and the
# denominator sum <= n*(n*max_c)^2 = n^3*max_c^2, inside BIGINT only
# while max_c < sqrt(9.2e18 / n^3) — ~380k events/day at n = 400 days.
# Beyond that, pre-scale the counts by a fixed power of 10 (ACF is
# scale-invariant) or widen the products to DECIMAL(38,0) on both
# engines before registering at larger scales.

ACF_ORACLE = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
        FROM daily
    ), r AS (
        SELECT d, n * c - s AS res FROM daily, stats
    ), den AS (
        SELECT CAST(sum(res * res) AS BIGINT) AS den FROM r
    ), lags AS (
        SELECT unnest(generate_series(1, 3)) AS lag
    ), num AS (
        SELECT l.lag,
               CAST(sum(a.res * b.res) AS BIGINT) AS num,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM lags l
        JOIN r a ON TRUE
        JOIN r b ON b.d = a.d + to_days(CAST(l.lag AS INTEGER))
        GROUP BY l.lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, num, den, n_pairs,
           round(num * 1.0 / den, 6) + 0.0 AS acf
    FROM num, den
    WHERE den > 0
"""


def acf_daily_counts(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    stats = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    r = daily.crossJoin(F.broadcast(stats)).select(
        "d", (F.col("n") * F.col("c") - F.col("s")).alias("res")
    ).persist()  # dim-sized; feeds den + three lag joins
    den = r.agg(F.sum(F.col("res") * F.col("res")).cast("long").alias("den"))
    lags = r.sparkSession.range(1, 4).select(F.col("id").alias("lag"))
    b = r.select(F.col("d").alias("bd"), F.col("res").alias("bres"))
    num = (
        lags.crossJoin(r)
        .join(b, F.col("bd") == F.expr("date_add(d, CAST(lag AS INT))"))
        .groupBy("lag")
        .agg(
            F.sum(F.col("res") * F.col("bres")).cast("long").alias("num"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .filter(F.col("den") > 0)
        .select(
            F.col("lag").cast("long").alias("lag"),
            "num",
            "den",
            "n_pairs",
            (F.round(F.col("num") * 1.0 / F.col("den"), 6) + F.lit(0.0))
            .alias("acf"),
        )
    )


def test_acf_oracle_parity(spark, oracle):
    spdf = acf_daily_counts(spark, SF_DIR).toPandas()
    opdf = oracle.execute(ACF_ORACLE).df()
    assert_frames_match(spdf, opdf, "acf_daily_counts")
    assert len(spdf) == 3
    assert ((spdf["acf"] >= -1.000001) & (spdf["acf"] <= 1.000001)).all()


def test_acf_matches_python_replay(spark):
    """Full-result replay in pure Python: the daily Counter, the exact
    integer scaled residuals n*c - S, date-keyed lag pairs, and the one
    display round — independent of both the Spark lag join and the
    oracle CTEs."""
    import datetime as dt
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    days = [
        r.d
        for r in load_table(spark, SF_DIR, "events")
        .select(F.col("ts").cast("date").alias("d"))
        .collect()
    ]
    daily = Counter(days)
    n, s = len(daily), sum(daily.values())
    res = {d: n * c - s for d, c in daily.items()}
    den = sum(v * v for v in res.values())
    expected = {}
    for lag in (1, 2, 3):
        pairs = [
            (v, res[d + dt.timedelta(days=lag)])
            for d, v in res.items()
            if d + dt.timedelta(days=lag) in res
        ]
        num = sum(x * y for x, y in pairs)
        if den > 0:
            acf = (
                float(
                    Decimal(repr(num * 1.0 / den)).quantize(
                        Decimal("0.000001"), ROUND_HALF_UP
                    )
                )
                + 0.0
            )
            expected[lag] = (num, den, len(pairs), acf)
    spdf = acf_daily_counts(spark, SF_DIR).toPandas()
    got = {
        int(r.lag): (int(r.num), int(r.den), int(r.n_pairs), r.acf)
        for r in spdf.itertuples()
    }
    assert got == expected


# -- chi2_token_source -------------------------------------------------------
#
# Chi-squared association of token x source over the top-20 global
# tokens (the classic feature-selection / shard-shibboleth statistic:
# which frequent words are disproportionately concentrated in one
# source?). Every contingency cell contributes ((O*N - R*C)^2)/(N*R*C),
# INCLUDING O = 0 cells (top-20 x sources cross join, observed
# left-joined). d = O*N - R*C is an exact BIGINT; the float term is one
# fixed IEEE op sequence — (d*d) / ((N*R)*C) in doubles — identical
# bit-for-bit across engines on the same integers, quantized ONCE to
# 1e-6 units (half-away floor(x*1e6 + 0.5)) and summed as integers, so
# the cross-source sum has no combine-order drift. Display value is the
# exact integer / 1e6 division (one identical op, no re-round).
# Overflow contract: O*N and R*C stay in BIGINT while
# total_tokens * max_token_count < 9.2e18 (~3e9 x 3e9).

_CHI2_TOP = 20

CHI2_ORACLE = f"""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS t
        FROM documents
    ), tok_f AS (
        SELECT source, t FROM tok WHERE t != ''
    ), cells AS (
        SELECT t, source, CAST(count(*) AS BIGINT) AS o
        FROM tok_f GROUP BY t, source
    ), rtot AS (
        SELECT t, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY t
    ), ctot AS (
        SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY source
    ), n AS (
        SELECT CAST(sum(o) AS BIGINT) AS n FROM cells
    ), top AS (
        SELECT t, r FROM rtot ORDER BY r DESC, t LIMIT {_CHI2_TOP}
    ), grid AS (
        SELECT top.t, top.r, ctot.source, ctot.c, n.n,
               coalesce(cells.o, 0) AS o
        FROM top CROSS JOIN ctot CROSS JOIN n
        LEFT JOIN cells ON cells.t = top.t AND cells.source = ctot.source
    ), terms AS (
        SELECT t, r, n,
               CAST(floor(
                   (CAST(o * n - r * c AS DOUBLE)
                    * CAST(o * n - r * c AS DOUBLE))
                   / ((CAST(n AS DOUBLE) * CAST(r AS DOUBLE))
                      * CAST(c AS DOUBLE))
                   * 1000000 + 0.5) AS BIGINT) AS q
        FROM grid
    )
    SELECT t AS token, CAST(max(r) AS BIGINT) AS token_total,
           CAST(count(*) - 1 AS BIGINT) AS dof,
           CAST(sum(q) AS BIGINT) AS chi2_units,
           CAST(sum(q) AS BIGINT) / 1000000.0 AS chi2
    FROM terms
    GROUP BY t
"""


def chi2_token_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("t")
    ).filter(F.col("t") != "")
    cells = tok.groupBy("t", "source").agg(
        F.count("*").cast("long").alias("o")
    ).persist()  # feeds row/col/grand totals and the grid join
    rtot = cells.groupBy("t").agg(F.sum("o").cast("long").alias("r"))
    ctot = cells.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    top = rtot.orderBy(F.desc("r"), "t").limit(_CHI2_TOP)
    grid = (
        F.broadcast(top)
        .crossJoin(F.broadcast(ctot))
        .crossJoin(F.broadcast(n))
        .join(cells, ["t", "source"], "left")
        .select(
            "t", "r", "source", "c", "n",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
    )
    d = F.col("o") * F.col("n") - F.col("r") * F.col("c")
    term = (d.cast("double") * d.cast("double")) / (
        (F.col("n").cast("double") * F.col("r").cast("double"))
        * F.col("c").cast("double")
    )
    terms = grid.select(
        "t", "r", "n",
        F.floor(term * 1000000 + 0.5).cast("long").alias("q"),
    )
    return terms.groupBy("t").agg(
        F.max("r").cast("long").alias("token_total"),
        (F.count("*") - 1).cast("long").alias("dof"),
        F.sum("q").cast("long").alias("chi2_units"),
    ).select(
        F.col("t").alias("token"),
        "token_total",
        "dof",
        "chi2_units",
        (F.col("chi2_units") / F.lit(1000000.0)).alias("chi2"),
    )


def test_chi2_oracle_parity(spark, oracle):
    spdf = chi2_token_source(spark, SF_DIR).toPandas()
    opdf = oracle.execute(CHI2_ORACLE).df()
    assert_frames_match(spdf, opdf, "chi2_token_source")
    assert len(spdf) == _CHI2_TOP
    assert (spdf["chi2_units"] >= 0).all()


def test_chi2_constructed_uniform_vs_concentrated(spark, tmp_path):
    """Pins the statistic on a constructed corpus: a token spread across
    two equal sources exactly in proportion (O*N == R*C in every cell)
    must score chi2 = 0, and a token fully concentrated in one source
    must score its closed-form value (here exactly 20.0: each of the
    two cells contributes d^2/(N*R*C) = 2000^2/(200*20*100) = 10)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fillers_u = " ".join(f"fu{i}" for i in range(90))
    fillers_k = " ".join(f"fk{i}" for i in range(70))
    text_u = " ".join(["even"] * 10) + " " + fillers_u  # 100 tokens
    text_k = (
        " ".join(["even"] * 10) + " " + " ".join(["conc"] * 20)
        + " " + fillers_k
    )  # 100 tokens
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([text_u, text_k]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["u-src", "k-src"]),
            "n_chars": pa.array(
                [len(text_u), len(text_k)], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    pdf = chi2_token_source(spark, str(tmp_path)).toPandas()
    by_tok = pdf.set_index("token")
    assert by_tok.loc["even", "chi2_units"] == 0
    assert abs(by_tok.loc["conc", "chi2"] - 20.0) < 1e-6
    assert by_tok.loc["conc", "dof"] == 1  # two sources
