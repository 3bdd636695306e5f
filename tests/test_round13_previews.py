"""Round-13 query previews: full Spark-vs-DuckDB parity pairs for five
new surfaces, verified NOW so a later registration is a mechanical
@register move (same contract as tests/test_round7_previews.py).

The five surfaces:
- ``mann_kendall_trend``  — nonparametric per-event-type trend test over
                            the daily-count series: S and the tie-corrected
                            variance are exact integers; z uses only sqrt
                            (IEEE correctly-rounded, engine-identical)
- ``ks_exact_pairs``      — exact two-sample Kolmogorov-Smirnov distance
                            between per-source length distributions (the
                            exact upgrade of the binned-KS drift metric;
                            max of cross-multiplied integer CDFs)
- ``kfold_assign_audit``  — deterministic 5-fold cross-validation
                            assignment via the portable md5 hash + per
                            (fold, source) balance audit
- ``ndcg_at10_exact``     — NDCG@10 retrieval quality with binary
                            label relevance: position discounts are
                            PRECOMPUTED integer units (no runtime libm),
                            DCG/IDCG exact integer sums, one final ratio
- ``kmeans_lloyd_2iter``  — two deterministic Lloyd iterations on the
                            embedding table: per-dim quantized distances
                            (order-free integer sums), moments-first
                            quantized centroid recompute, oracle replays
                            both iterations via unrolled CTEs
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR, assert_frames_match

# -- mann_kendall_trend ------------------------------------------------------
#
# Mann-Kendall S over each event type's daily-count series: S =
# sum_{i<j} sign(c_j - c_i) by date order (|days|^2 pairs per type — a
# dimension-sized self-join after the facts reduce to the daily
# series). Tie-corrected variance carried as the exact integer
# var18 = n(n-1)(2n+5) - sum_t t(t-1)(2t+5) (the /18 deferred to the
# float step), z = (S - sign(S)) / sqrt(var18 / 18.0). sqrt is IEEE
# correctly-rounded (not a libm approximation), so z is bit-identical
# across engines on identical integer inputs; single round + 0.0
# (z can be negative). All-tied series (var18 = 0) are excluded
# symmetrically.

MANN_KENDALL_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), s AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN b.c > a.c THEN 1
                             WHEN b.c < a.c THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
        GROUP BY 1
    ), n AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1
    ), ties AS (
        SELECT event_type,
               CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                    AS BIGINT) AS tie_term
        FROM (
            SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
            FROM daily GROUP BY 1, 2
        ) GROUP BY 1
    )
    SELECT s.event_type, n.n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                - t.tie_term AS BIGINT) AS var18,
           round((s.s_stat - CAST(sign(s.s_stat) AS BIGINT))
                 / sqrt((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                         - t.tie_term) / 18.0), 6) + 0.0 AS z
    FROM s JOIN n USING (event_type) JOIN ties t USING (event_type)
    WHERE n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie_term > 0
"""


def mann_kendall_trend(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").cast("long").alias("c"))
        .persist()  # feeds the pair join (twice), n, and the tie groups
    )
    a = daily.select(
        F.col("event_type"), F.col("d").alias("da"), F.col("c").alias("ca")
    )
    b = daily.select(
        F.col("event_type"), F.col("d").alias("db"), F.col("c").alias("cb")
    )
    s = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    var18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    )
    return (
        s.join(n, "event_type")
        .join(ties, "event_type")
        .withColumn("var18", var18.cast("long"))
        .filter(F.col("var18") > 0)
        .select(
            "event_type",
            "n_days",
            "s_stat",
            "var18",
            (
                F.round(
                    (F.col("s_stat") - F.signum("s_stat").cast("long"))
                    / F.sqrt(F.col("var18") / 18.0),
                    6,
                )
                + F.lit(0.0)
            ).alias("z"),
        )
    )


def test_mann_kendall_oracle_parity(spark, oracle):
    spdf = mann_kendall_trend(spark, SF_DIR).toPandas()
    opdf = oracle.execute(MANN_KENDALL_ORACLE).df()
    assert_frames_match(spdf, opdf, "mann_kendall_trend")
    assert len(spdf) > 0
    # |S| is bounded by the pair count n(n-1)/2
    assert (
        spdf["s_stat"].abs()
        <= spdf["n_days"] * (spdf["n_days"] - 1) // 2
    ).all()


def test_mann_kendall_matches_python_replay(spark):
    """Every output row replayed in pure Python: the O(n^2) pairwise S,
    the tie-corrected var18, and z via the documented IEEE chain
    ((s - sign) / sqrt(var18/18.0), HALF_UP-of-shortest-repr at 6dp,
    -0.0 folded) — independent of both the Spark pair join and the
    oracle CTEs."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    pdf = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", F.col("ts").cast("date").alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count("*").cast("long").alias("c"))
        .toPandas()
    )
    expected = {}
    for et, grp in pdf.groupby("event_type"):
        cs = grp.sort_values("d")["c"].tolist()
        n = len(cs)
        s = sum(
            (cs[j] > cs[i]) - (cs[j] < cs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(cs).values()
        )
        if var18 <= 0:
            continue
        z = (s - ((s > 0) - (s < 0))) / math.sqrt(var18 / 18.0)
        z6 = (
            float(
                Decimal(repr(z)).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP
                )
            )
            + 0.0
        )
        expected[et] = (n, s, var18, z6)
    spdf = mann_kendall_trend(spark, SF_DIR).toPandas()
    got = {
        r.event_type: (int(r.n_days), int(r.s_stat), int(r.var18), r.z)
        for r in spdf.itertuples()
    }
    assert got == expected


def test_mann_kendall_monotone_series(spark):
    """A strictly increasing series must reach S = n(n-1)/2 (every pair
    concordant) and a large positive z — pins the sign convention."""
    df = spark.createDataFrame(
        [("up", f"2024-01-{d:02d}", d * 10 + 1) for d in range(1, 11)],
        "event_type string, ds string, c long",
    ).select(
        "event_type", F.col("ds").cast("date").alias("d"), "c"
    )
    # inline the S computation over the constructed series
    a = df.select("event_type", F.col("d").alias("da"), F.col("c").alias("ca"))
    b = df.select("event_type", F.col("d").alias("db"), F.col("c").alias("cb"))
    s = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            ).alias("s")
        )
        .collect()[0]["s"]
    )
    assert s == 45  # 10*9/2, all concordant


# -- ks_exact_pairs ----------------------------------------------------------
#
# Exact two-sample KS distance between every source pair's doc-length
# distribution — the exact companion of the registered binned-KS drift
# metric (same scaffold as length_emd_pairs: one histogram groupBy,
# pair-expanded union support, integer cumulative sums; the statistic
# is max|cumA*nB - cumB*nA| instead of the gap-weighted sum). Runs
# entirely on |sources x distinct lengths| frames; one final ratio.

KS_EXACT_ORACLE = """
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
        SELECT src_a, src_b,
               sum(ca) OVER (PARTITION BY src_a, src_b ORDER BY v)
                   AS cum_a,
               sum(cb) OVER (PARTITION BY src_a, src_b ORDER BY v)
                   AS cum_b
        FROM joined
    ), stat AS (
        SELECT c.src_a, c.src_b,
               CAST(max(abs(c.cum_a * p.n_b - c.cum_b * p.n_a))
                    AS BIGINT) AS ks_num
        FROM cum c JOIN pairs p USING (src_a, src_b)
        GROUP BY 1, 2
    )
    SELECT s.src_a, s.src_b, p.n_a, p.n_b, s.ks_num,
           round(s.ks_num * 1.0 / (p.n_a * p.n_b), 6) AS ks6
    FROM stat s JOIN pairs p USING (src_a, src_b)
"""


def ks_exact_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    hist = (
        docs.groupBy("source", F.col("n_chars").cast("long").alias("v"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .persist()  # feeds sizes, support, and both cdf sides
    )
    sizes = hist.groupBy("source").agg(F.sum("cnt").cast("long").alias("n"))
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
        F.col("source").alias("src_a"), "v", F.col("cnt").alias("ca")
    )
    hb = hist.select(
        F.col("source").alias("src_b"), "v", F.col("cnt").alias("cb")
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
    cum = joined.select(
        "src_a",
        "src_b",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    stat = (
        cum.join(F.broadcast(pairs), ["src_a", "src_b"])
        .groupBy("src_a", "src_b")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
            )
            .cast("long")
            .alias("ks_num")
        )
    )
    return stat.join(F.broadcast(pairs), ["src_a", "src_b"]).select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        "ks_num",
        F.round(F.col("ks_num") * 1.0 / (F.col("n_a") * F.col("n_b")), 6)
        .alias("ks6"),
    )


def test_ks_exact_oracle_parity(spark, oracle):
    spdf = ks_exact_pairs(spark, SF_DIR).toPandas()
    opdf = oracle.execute(KS_EXACT_ORACLE).df()
    assert_frames_match(spdf, opdf, "ks_exact_pairs")
    n_src = spdf[["src_a", "src_b"]].stack().nunique()
    assert len(spdf) == n_src * (n_src - 1) // 2
    assert ((spdf["ks6"] >= 0) & (spdf["ks6"] <= 1)).all()


def test_ks_exact_matches_scipy_definition(spark):
    """Cross-check one pair against the direct sup-|CDF difference|
    computed in pandas (no binning, same tie handling)."""
    import numpy as np

    spdf = ks_exact_pairs(spark, SF_DIR).toPandas()
    row = spdf.iloc[0]
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("source", "n_chars")
        .toPandas()
    )
    xa = np.sort(docs[docs["source"] == row["src_a"]]["n_chars"].values)
    xb = np.sort(docs[docs["source"] == row["src_b"]]["n_chars"].values)
    grid = np.union1d(xa, xb)
    cdfa = np.searchsorted(xa, grid, side="right") / len(xa)
    cdfb = np.searchsorted(xb, grid, side="right") / len(xb)
    d = np.max(np.abs(cdfa - cdfb))
    assert abs(row["ks_num"] / (row["n_a"] * row["n_b"]) - d) < 1e-12


# -- kfold_assign_audit ------------------------------------------------------
#
# Deterministic 5-fold cross-validation assignment: fold =
# portable md5 hash8(doc_id:cv) % 5 — no RNG state, any engine replays
# every row's fold. The audit emits the per-(fold, source) cell counts
# plus each fold's total and share of the corpus: the balance check a
# CV split needs before training. Map-side fold key + one groupBy.

_KFOLD = 5

KFOLD_ORACLE = f"""
    WITH assigned AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cv'),
                                    1, 8)) AS BIGINT) % {_KFOLD} AS fold
        FROM documents
    ), cells AS (
        SELECT fold, source, CAST(count(*) AS BIGINT) AS n_docs
        FROM assigned GROUP BY 1, 2
    ), totals AS (
        SELECT fold, CAST(sum(n_docs) AS BIGINT) AS fold_total
        FROM cells GROUP BY 1
    ), corpus AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS n_all FROM cells
    )
    SELECT c.fold, c.source, c.n_docs, t.fold_total,
           round(t.fold_total * 1.0 / x.n_all, 6) AS fold_share
    FROM cells c JOIN totals t USING (fold) CROSS JOIN corpus x
"""


def kfold_assign_audit(spark, sf_dir):
    from etl_earthquake_gcp_spark.functions.scalar import portable_hash8

    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "source",
        (
            portable_hash8(
                F.concat(F.col("doc_id").cast("string"), F.lit(":cv"))
            )
            % _KFOLD
        ).alias("fold"),
    )
    cells = assigned.groupBy("fold", "source").agg(
        F.count("*").cast("long").alias("n_docs")
    ).persist()  # feeds the totals and the final join
    totals = cells.groupBy("fold").agg(
        F.sum("n_docs").cast("long").alias("fold_total")
    )
    corpus = cells.agg(F.sum("n_docs").cast("long").alias("n_all"))
    return (
        cells.join(F.broadcast(totals), "fold")
        .crossJoin(F.broadcast(corpus))
        .select(
            "fold",
            "source",
            "n_docs",
            "fold_total",
            F.round(F.col("fold_total") * 1.0 / F.col("n_all"), 6).alias(
                "fold_share"
            ),
        )
    )


def test_kfold_oracle_parity(spark, oracle):
    spdf = kfold_assign_audit(spark, SF_DIR).toPandas()
    opdf = oracle.execute(KFOLD_ORACLE).df()
    assert_frames_match(spdf, opdf, "kfold_assign_audit")
    assert spdf["fold"].nunique() == _KFOLD
    # md5-balanced folds: no fold more than 2x off the uniform share
    assert ((spdf["fold_share"] > 0.1) & (spdf["fold_share"] < 0.4)).all()
    # cells partition the corpus exactly
    n_docs_total = spdf["n_docs"].sum()
    assert n_docs_total == spdf.groupby("fold")["fold_total"].first().sum()


def test_kfold_matches_python_replay(spark):
    """Full-result replay in pure Python: hashlib md5-hex8 fold
    assignment, cell/total Counters, one display round — independent of
    the portable_hash8 Spark expression and the oracle CTEs."""
    import hashlib
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    rows = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source")
        .collect()
    )
    cells = Counter()
    for r in rows:
        fold = (
            int(hashlib.md5(f"{r.doc_id}:cv".encode()).hexdigest()[:8], 16)
            % _KFOLD
        )
        cells[(fold, r.source)] += 1
    fold_totals = Counter()
    for (fold, _), c in cells.items():
        fold_totals[fold] += c
    n_all = sum(cells.values())
    expected = {
        (fold, src): (
            c,
            fold_totals[fold],
            float(
                Decimal(repr(fold_totals[fold] * 1.0 / n_all)).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP
                )
            ),
        )
        for (fold, src), c in cells.items()
    }
    spdf = kfold_assign_audit(spark, SF_DIR).toPandas()
    got = {
        (int(r.fold), r.source): (
            int(r.n_docs),
            int(r.fold_total),
            r.fold_share,
        )
        for r in spdf.itertuples()
    }
    assert got == expected


# -- ndcg_at10_exact ---------------------------------------------------------
#
# NDCG@10 with binary label relevance for the 5 query vectors against
# the rest of the corpus: ranking by the proven (round(cos, 6) DESC,
# vec_id) collapse order; position discounts 1/log2(i+1) are
# PRECOMPUTED in Python as 1e-6-unit integers (zero runtime libm on
# either engine), so DCG and IDCG are exact integer sums and NDCG is
# one int/int ratio round. IDCG caps the ideal at min(#relevant, 10).
# Queries with no relevant corpus item are excluded symmetrically.

_NDCG_K = 10
_NDCG_QUERIES = 5
# 1e6-quantized position discounts w[i] = round(1e6 / log2(i + 1))
_NDCG_W = [round(1_000_000 / math.log2(i + 1)) for i in range(1, _NDCG_K + 1)]
_NDCG_PREFIX = [sum(_NDCG_W[: j + 1]) for j in range(_NDCG_K)]
_W_SQL = "[" + ", ".join(str(w) for w in _NDCG_W) + "]"
_PFX_SQL = "[" + ", ".join(str(p) for p in _NDCG_PREFIX) + "]"

NDCG_ORACLE = f"""
    WITH exploded AS (
        SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ), norms AS (
        SELECT vec_id, label, sqrt(sum(x * x)) AS norm
        FROM exploded GROUP BY 1, 2
    ), q AS (
        SELECT vec_id AS query_id, label AS qlabel, norm AS qnorm
        FROM norms WHERE vec_id < {_NDCG_QUERIES} AND norm > 0
    ), c AS (
        SELECT vec_id, label, norm FROM norms
        WHERE vec_id >= {_NDCG_QUERIES} AND norm > 0
    ), dots AS (
        SELECT a.vec_id AS query_id, b.vec_id,
               sum(a.x * b.x) AS dot
        FROM exploded a JOIN exploded b ON a.i = b.i
        WHERE a.vec_id < {_NDCG_QUERIES} AND b.vec_id >= {_NDCG_QUERIES}
        GROUP BY 1, 2
    ), scored AS (
        SELECT d.query_id, q.qlabel, d.vec_id, c.label,
               round(d.dot / (q.qnorm * c.norm), 6) AS cos6
        FROM dots d
        JOIN q ON q.query_id = d.query_id
        JOIN c ON c.vec_id = d.vec_id
    ), ranked AS (
        SELECT query_id, qlabel, vec_id, label,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cos6 DESC, vec_id
               ) AS rnk
        FROM scored
    ), rel_corpus AS (
        SELECT q.query_id,
               CAST(count(*) AS BIGINT) AS n_rel
        FROM q JOIN c ON c.label = q.qlabel
        GROUP BY 1
    ), dcg AS (
        SELECT query_id, qlabel,
               CAST(coalesce(sum(CASE WHEN label = qlabel
                   THEN ({_W_SQL})[rnk] ELSE 0 END), 0) AS BIGINT)
                   AS dcg_units
        FROM ranked WHERE rnk <= {_NDCG_K}
        GROUP BY 1, 2
    )
    SELECT d.query_id, d.qlabel, r.n_rel, d.dcg_units,
           CAST(({_PFX_SQL})[CAST(least(r.n_rel, {_NDCG_K}) AS INT)]
                AS BIGINT) AS idcg_units,
           round(d.dcg_units * 1.0
                 / ({_PFX_SQL})[CAST(least(r.n_rel, {_NDCG_K}) AS INT)],
                 6) AS ndcg
    FROM dcg d JOIN rel_corpus r USING (query_id)
    WHERE r.n_rel > 0
"""


def ndcg_at10_exact(spark, sf_dir):
    from etl_earthquake_gcp_spark.functions.vectors import (
        cast_double_with_norm,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    withn = cast_double_with_norm(emb, keep=("vec_id", "label")).filter(
        F.col("norm") > 0
    )
    q = withn.filter(F.col("vec_id") < _NDCG_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    c = withn.filter(F.col("vec_id") >= _NDCG_QUERIES)
    dot = F.aggregate(
        F.zip_with("vec", "qvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "qlabel",
        "vec_id",
        "label",
        F.round(dot / (F.col("qnorm") * F.col("norm")), 6).alias("cos6"),
    )
    wrank = Window.partitionBy("query_id").orderBy(
        F.desc("cos6"), "vec_id"
    )
    ranked = scored.withColumn("rnk", F.row_number().over(wrank)).filter(
        F.col("rnk") <= _NDCG_K
    )
    w_arr = F.array(*[F.lit(w) for w in _NDCG_W])
    pfx_arr = F.array(*[F.lit(p) for p in _NDCG_PREFIX])
    dcg = ranked.groupBy("query_id", "qlabel").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("label") == F.col("qlabel"),
                    F.element_at(w_arr, F.col("rnk")),
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("dcg_units")
    )
    rel = (
        F.broadcast(q.select("query_id", "qlabel"))
        .join(c, F.col("qlabel") == c["label"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_rel"))
    )
    out = dcg.join(F.broadcast(rel), "query_id").filter(F.col("n_rel") > 0)
    idcg = F.element_at(
        pfx_arr, F.least(F.col("n_rel"), F.lit(_NDCG_K)).cast("int")
    )
    return out.select(
        "query_id",
        "qlabel",
        "n_rel",
        "dcg_units",
        idcg.cast("long").alias("idcg_units"),
        F.round(F.col("dcg_units") * 1.0 / idcg, 6).alias("ndcg"),
    )


def test_ndcg_oracle_parity(spark, oracle):
    spdf = ndcg_at10_exact(spark, SF_DIR).toPandas()
    opdf = oracle.execute(NDCG_ORACLE).df()
    assert_frames_match(spdf, opdf, "ndcg_at10_exact")
    assert len(spdf) > 0
    assert ((spdf["ndcg"] >= 0) & (spdf["ndcg"] <= 1)).all()


def test_ndcg_weights_are_the_log2_discounts(spark):
    """The precomputed integer discounts must be the textbook values:
    w1 = 1e6 (log2(2) = 1), w3 = 5e5 (log2(4) = 2), and strictly
    decreasing; prefix sums strictly increasing."""
    assert _NDCG_W[0] == 1_000_000
    assert _NDCG_W[2] == 500_000
    assert all(a > b for a, b in zip(_NDCG_W, _NDCG_W[1:]))
    assert all(a < b for a, b in zip(_NDCG_PREFIX, _NDCG_PREFIX[1:]))


def test_ndcg_matches_python_replay(spark):
    """Full-result replay in pure Python: the sequential x*x / a*b
    folds (matching the F.aggregate left-fold order exactly), the 6dp
    HALF_UP collapse, the (cos6 DESC, vec_id) rank order, and the
    integer DCG/IDCG sums — independent of the Spark window chain and
    the oracle CTEs."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def fold_norm(v):
        acc = 0.0
        for x in v:
            acc += x * x
        return math.sqrt(acc)

    def r6(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    vecs = {
        r.vec_id: ([float(x) for x in r.embedding], r.label) for r in rows
    }
    qs = {
        i: v
        for i, v in vecs.items()
        if i < _NDCG_QUERIES and fold_norm(v[0]) > 0
    }
    cs = {
        i: v
        for i, v in vecs.items()
        if i >= _NDCG_QUERIES and fold_norm(v[0]) > 0
    }
    expected = {}
    for qid, (qv, ql) in qs.items():
        qn = fold_norm(qv)
        scored = []
        for cid, (cv, cl) in cs.items():
            acc = 0.0
            for a, b in zip(cv, qv):
                acc += a * b
            scored.append((r6(acc / (qn * fold_norm(cv))), cid, cl))
        scored.sort(key=lambda t: (-t[0], t[1]))
        n_rel = sum(1 for _, (_, cl) in cs.items() if cl == ql)
        if n_rel == 0:
            continue
        dcg = sum(
            _NDCG_W[i]
            for i, (_, _, cl) in enumerate(scored[:_NDCG_K])
            if cl == ql
        )
        idcg = _NDCG_PREFIX[min(n_rel, _NDCG_K) - 1]
        expected[qid] = (ql, n_rel, dcg, idcg, r6(dcg * 1.0 / idcg))
    spdf = ndcg_at10_exact(spark, SF_DIR).toPandas()
    got = {
        int(r.query_id): (
            r.qlabel,
            int(r.n_rel),
            int(r.dcg_units),
            int(r.idcg_units),
            r.ndcg,
        )
        for r in spdf.itertuples()
    }
    assert got == expected


# -- kmeans_lloyd_2iter ------------------------------------------------------
#
# Two deterministic Lloyd iterations on the embedding table, seeds =
# the k smallest vec_ids. The ENTIRE algorithm is integer arithmetic
# after ONE quantization of the raw coordinates (xu = 1e-6-unit
# half-away ints): distances are exact integer sums of (xu - cu)^2,
# argmin is totally ordered by (dist, cluster_id), and the centroid
# recompute is the integer half-away mean sign(s)*((2|s| + n) div 2n)
# — zero float ops inside the iteration, so the oracle replays both
# iterations bit-exactly with no ulp argument anywhere (the compounding
# hazard of a quantized-float centroid feeding iteration 2's argmin
# never arises). Scale shape: per iteration one broadcast join of the
# k x dims centroid table against the exploded coordinates + one
# groupBy per (vector, cluster) — map-side combine, no collect at all;
# centroids never leave the cluster. BIGINT bound: at unit norm the
# squared distance ||x - c||^2 <= 4, i.e. dist_u <= ~4e12 units (the
# norm caps the whole sum — NOT a per-dim x dims product), so
# per-cluster inertia_u fits BIGINT only up to ~2.3e6 worst-case
# (~1e7-1e8 typical) members per cluster; past that, report
# mean-distance-per-member or widen the inertia aggregate to
# DECIMAL(38,0) on both engines.

_KM_K = 4


def _q6_int(col):
    """ONE half-away quantization of a raw coordinate to 1e-6 units."""
    return (
        F.signum(col) * F.floor(F.abs(col) * 1_000_000 + F.lit(0.5))
    ).cast("long")


KMEANS_ORACLE = f"""
    WITH exploded AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ), xu AS (
        SELECT vec_id, i,
               CAST(sign(x) * floor(abs(x) * 1000000 + 0.5) AS BIGINT)
                   AS xu
        FROM exploded
    ), c0 AS (
        SELECT vec_id AS cluster_id, i, xu AS cu FROM xu
        WHERE vec_id < {_KM_K}
    ), d1 AS (
        SELECT v.vec_id, c.cluster_id,
               CAST(sum((v.xu - c.cu) * (v.xu - c.cu)) AS BIGINT)
                   AS dist_u
        FROM xu v JOIN c0 c USING (i) GROUP BY 1, 2
    ), a1 AS (
        SELECT vec_id, cluster_id FROM (
            SELECT vec_id, cluster_id,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY dist_u, cluster_id
                   ) AS rn
            FROM d1
        ) WHERE rn = 1
    ), c1 AS (
        SELECT a.cluster_id, x.i,
               CAST(CAST(sign(sum(x.xu)) AS BIGINT)
                    * ((2 * abs(sum(x.xu)) + count(*))
                       // (2 * count(*))) AS BIGINT) AS cu
        FROM a1 a JOIN xu x USING (vec_id) GROUP BY 1, 2
    ), d2 AS (
        SELECT v.vec_id, c.cluster_id,
               CAST(sum((v.xu - c.cu) * (v.xu - c.cu)) AS BIGINT)
                   AS dist_u
        FROM xu v JOIN c1 c USING (i) GROUP BY 1, 2
    ), a2 AS (
        SELECT vec_id, cluster_id, dist_u FROM (
            SELECT vec_id, cluster_id, dist_u,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY dist_u, cluster_id
                   ) AS rn
            FROM d2
        ) WHERE rn = 1
    ), c2 AS (
        SELECT a.cluster_id, x.i,
               CAST(CAST(sign(sum(x.xu)) AS BIGINT)
                    * ((2 * abs(sum(x.xu)) + count(*))
                       // (2 * count(*))) AS BIGINT) AS cu
        FROM a2 a JOIN xu x USING (vec_id) GROUP BY 1, 2
    )
    SELECT m.cluster_id, m.n_members, m.inertia_u, s.centroid_checksum
    FROM (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(dist_u) AS BIGINT) AS inertia_u
        FROM a2 GROUP BY 1
    ) m JOIN (
        SELECT cluster_id, CAST(sum(cu) AS BIGINT) AS centroid_checksum
        FROM c2 GROUP BY 1
    ) s USING (cluster_id)
"""


def kmeans_lloyd_2iter(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    xu = (
        emb.select(
            "vec_id", F.posexplode("vec").alias("i0", "x")
        )
        .select(
            "vec_id",
            (F.col("i0") + 1).alias("i"),
            _q6_int(F.col("x")).alias("xu"),
        )
        .persist()  # every iteration's distance join and recompute reads it
    )

    def assign(cent):
        j = xu.join(F.broadcast(cent), "i")
        diff = F.col("xu") - F.col("cu")
        d = j.groupBy("vec_id", "cluster_id").agg(
            F.sum(diff * diff).cast("long").alias("dist_u")
        )
        w = Window.partitionBy("vec_id").orderBy("dist_u", "cluster_id")
        return (
            d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cluster_id", "dist_u")
        )

    def recompute(assigned):
        # shuffle_hash on the node-sized assignment side: sort-merge
        # would re-sort the |vectors x dims| coordinate table per
        # iteration (the pagerank lesson); neither side broadcasts at
        # 1e9-vector scale
        return (
            assigned.select("vec_id", "cluster_id")
            .hint("shuffle_hash")
            .join(xu, "vec_id")
            .groupBy("cluster_id", "i")
            .agg(
                F.sum("xu").alias("s"), F.count("*").alias("n")
            )
            .select(
                "cluster_id",
                "i",
                F.expr(
                    "CAST(CAST(sign(s) AS BIGINT)"
                    " * ((2 * abs(s) + n) div (2 * n)) AS BIGINT)"
                ).alias("cu"),
            )
        )

    c0 = xu.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cluster_id"), "i", F.col("xu").alias("cu")
    )
    a1 = assign(c0)
    c1 = recompute(a1)
    a2 = assign(c1)
    c2 = recompute(a2)
    members = a2.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum("dist_u").cast("long").alias("inertia_u"),
    )
    checksums = c2.groupBy("cluster_id").agg(
        F.sum("cu").cast("long").alias("centroid_checksum")
    )
    return members.join(F.broadcast(checksums), "cluster_id")


def test_kmeans_oracle_parity(spark, oracle):
    spdf = kmeans_lloyd_2iter(spark, SF_DIR).toPandas()
    opdf = oracle.execute(KMEANS_ORACLE).df()
    assert_frames_match(spdf, opdf, "kmeans_lloyd_2iter")
    assert 1 <= len(spdf) <= _KM_K
    # every vector is assigned to exactly one cluster
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert spdf["n_members"].sum() == n_vecs


def test_kmeans_matches_python_replay(spark):
    """Both Lloyd iterations replayed in pure Python on the same
    1e-6-unit quantized integers: seed centroids, exact squared
    distances, (dist, cluster_id) argmin, and the integer half-away
    centroid means — independent of both the Spark join pipeline and
    the unrolled-CTE oracle."""
    import math

    def q6(x):
        s = (x > 0) - (x < 0)
        return s * int(math.floor(abs(x) * 1_000_000 + 0.5))

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    xu = {r.vec_id: [q6(float(x)) for x in r.embedding] for r in rows}
    cent = {cid: list(xu[cid]) for cid in xu if cid < _KM_K}

    def assign(cent):
        out = {}
        for vid, v in xu.items():
            best = min(
                (
                    (
                        sum((a - b) * (a - b) for a, b in zip(v, cu)),
                        cid,
                    )
                    for cid, cu in cent.items()
                )
            )
            out[vid] = (best[1], best[0])
        return out

    def recompute(assigned):
        groups = {}
        for vid, (cid, _) in assigned.items():
            groups.setdefault(cid, []).append(xu[vid])
        cent = {}
        for cid, vs in groups.items():
            n = len(vs)
            cu = []
            for dim in zip(*vs):
                s = sum(dim)
                sg = (s > 0) - (s < 0)
                cu.append(sg * ((2 * abs(s) + n) // (2 * n)))
            cent[cid] = cu
        return cent

    a1 = assign(cent)
    c1 = recompute(a1)
    a2 = assign(c1)
    c2 = recompute(a2)
    expected = {}
    for cid, cu in c2.items():
        members = [v for v, (c, _) in a2.items() if c == cid]
        inertia = sum(d for _, (c, d) in a2.items() if c == cid)
        expected[cid] = (len(members), inertia, sum(cu))
    spdf = kmeans_lloyd_2iter(spark, SF_DIR).toPandas()
    got = {
        int(r.cluster_id): (
            int(r.n_members),
            int(r.inertia_u),
            int(r.centroid_checksum),
        )
        for r in spdf.itertuples()
    }
    assert got == expected


def test_kmeans_iteration_does_not_increase_inertia(spark):
    """Lloyd's invariant (under a fixed quantization grid): reassigning
    to the nearest recomputed centroid cannot increase the summed
    distance relative to assigning against the seed centroids."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    xu = emb.select(
        "vec_id", F.posexplode("vec").alias("i0", "x")
    ).select(
        "vec_id", (F.col("i0") + 1).alias("i"),
        _q6_int(F.col("x")).alias("xu"),
    ).persist()

    def total_inertia(cent):
        j = xu.join(F.broadcast(cent), "i")
        diff = F.col("xu") - F.col("cu")
        d = j.groupBy("vec_id", "cluster_id").agg(
            F.sum(diff * diff).alias("dist_u")
        )
        return (
            d.groupBy("vec_id").agg(F.min("dist_u").alias("best"))
            .agg(F.sum("best").alias("t")).collect()[0]["t"]
        )

    c0 = xu.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cluster_id"), "i", F.col("xu").alias("cu")
    )
    inertia0 = total_inertia(c0)
    full = kmeans_lloyd_2iter(spark, SF_DIR).toPandas()
    # After two Lloyd steps the total inertia must not exceed the
    # seed-assignment inertia PLUS the quantization penalty: each
    # centroid coordinate sits at most half a unit off the exact mean,
    # adding at most 0.25 units^2 per (vector, dim) per recompute —
    # 2 recomputes -> a slack of n_vecs * dims * 0.5, rounded up to
    # n_vecs * dims so the invariant cannot flake on a corpus already
    # at a Lloyd fixed point.
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    dims = len(
        load_table(spark, SF_DIR, "embeddings")
        .select("embedding").first()["embedding"]
    )
    assert full["inertia_u"].sum() <= inertia0 + n_vecs * dims


# -- rfm_quartile_scores_scaled (OPTIONAL rework candidate, r11 verdict
#    next-step #7 — NOT part of the five-name r13 bank) ----------------------
#
# The scale-safe sibling of the registered rfm_quartile_scores: the
# baseline ranks the user dimension with three unpartitioned
# row_number windows (certified baseline — the same pattern that
# earned rfm_segmentation its scaled twin in r8). This form computes
# the three quartile boundary values by bucketed histogram-rank
# selection (operators/calibrate.py::desc_rank_boundaries) and assigns
# scores with broadcast column compares, under tie-COHERENT min-rank
# quartile semantics: q(x) = 1 + (4*cnt_better(x)) div n, provably
# equal to 1 + #(s in 1..3 : x strictly worse than v_s) with v_s at
# better-order rank ceil(s*n/4), because cnt_better(x) >= c <=> x is
# strictly worse than v_c (the rfm_segmentation_scaled proof with
# k = 4). Recency scores on the NEGATED day count so all three metrics
# share the one descending-order selection operator. Registration
# takes a displacement head slot whenever a round frees one (standing
# rule); until then this pair is the proven preview.

RFM_QUARTILE_SCALED_ORACLE = """
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
        -- min-rank quartiles: ties share one score (rank(), not
        -- row_number) — the tie-coherent scale semantics
        SELECT *,
               rank() OVER (ORDER BY r_days) AS kr,
               rank() OVER (ORDER BY f_cnt DESC) AS kf,
               rank() OVER (ORDER BY m_cents DESC) AS km,
               count(*) OVER () AS n
        FROM per_user
    )
    SELECT user_id, r_days, f_cnt, m_cents,
           CAST(1 + (4 * (kr - 1)) // n AS BIGINT) AS r_q,
           CAST(1 + (4 * (kf - 1)) // n AS BIGINT) AS f_q,
           CAST(1 + (4 * (km - 1)) // n AS BIGINT) AS m_q,
           CAST((1 + (4 * (kr - 1)) // n) * 100
                + (1 + (4 * (kf - 1)) // n) * 10
                + (1 + (4 * (km - 1)) // n) AS BIGINT) AS rfm_code
    FROM ranked
"""


def rfm_quartile_scores_scaled(spark, sf_dir):
    from etl_earthquake_gcp_spark.operators import calibrate

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
    gmax = per_user.agg(F.max("last_d").alias("gmax_d"))
    # CROSSJOIN: 1-row global-max frame fans out onto the user dim
    per_user = (
        per_user.crossJoin(F.broadcast(gmax))
        .select(
            "user_id",
            F.datediff("gmax_d", "last_d").cast("long").alias("r_days"),
            F.col("f_cnt"),
            F.col("m_cents"),
        )
        # neg_r: recency under the shared DESC selection (smaller
        # r_days = better  <=>  larger -r_days)
        .withColumn("neg_r", (-F.col("r_days")).cast("long"))
        # PERSIST: |users|-row aggregate — read by the count, three
        # histogram builds, and the assignment scan; session-LRU
        .persist()
    )
    n_row = per_user.agg(F.count("*").cast("long").alias("n"))

    def quartile_bounds(metric, prefix):
        """1-row frame with the 3 better-order-rank boundary values."""
        targets = (
            per_user.sparkSession.range(1, 4)
            .select(F.col("id").cast("long").alias("_tag"))
            # CROSSJOIN: 1-row count frame onto the 3-row tag frame
            .crossJoin(F.broadcast(n_row))
            # c_s = ceil(s*n/4) as pure integers
            .withColumn("cut", F.expr("(_tag * n + 3) div 4").cast("long"))
        )
        bnd = calibrate.desc_rank_boundaries(
            per_user.select(metric), metric, targets, "cut", "v"
        )
        return bnd.agg(
            *[
                F.max(F.when(F.col("_tag") == s, F.col("v"))).alias(
                    f"{prefix}{s}"
                )
                for s in range(1, 4)
            ]
        )

    def q(metric, prefix):
        c = F.lit(1)
        for s in range(1, 4):
            c = c + F.when(
                F.col(metric) < F.col(f"{prefix}{s}"), 1
            ).otherwise(0)
        return c.cast("long")

    scored = (
        # CROSSJOIN: three 1-row quartile-boundary pivots (3 boundary
        # columns each)
        per_user.crossJoin(F.broadcast(quartile_bounds("neg_r", "rv")))
        .crossJoin(F.broadcast(quartile_bounds("f_cnt", "fv")))
        .crossJoin(F.broadcast(quartile_bounds("m_cents", "mv")))
    )
    return scored.select(
        "user_id",
        "r_days",
        "f_cnt",
        "m_cents",
        q("neg_r", "rv").alias("r_q"),
        q("f_cnt", "fv").alias("f_q"),
        q("m_cents", "mv").alias("m_q"),
        (q("neg_r", "rv") * 100 + q("f_cnt", "fv") * 10
         + q("m_cents", "mv")).cast("long").alias("rfm_code"),
    )


def test_rfm_quartile_scaled_oracle_parity(spark, oracle):
    spdf = rfm_quartile_scores_scaled(spark, SF_DIR).toPandas()
    opdf = oracle.execute(RFM_QUARTILE_SCALED_ORACLE).df()
    assert_frames_match(spdf, opdf, "rfm_quartile_scores_scaled")
    for c in ("r_q", "f_q", "m_q"):
        assert spdf[c].between(1, 4).all()


def test_rfm_quartile_scaled_is_tie_coherent_and_matches_baseline_sizes(
    spark,
):
    """Tie-coherence + the min-rank/baseline relationship: equal metric
    values share a quartile (recomputed row-wise in pandas and compared
    JOINTLY — the r8 vacuity lesson), and each quartile never exceeds
    the baseline's ceil(n/4) by more than its boundary tie run."""
    import math

    from etl_earthquake_gcp_spark.plans import QUERIES

    spdf = rfm_quartile_scores_scaled(spark, SF_DIR).toPandas()
    base = QUERIES["rfm_quartile_scores"].spark_fn(spark, SF_DIR).toPandas()
    assert len(spdf) == len(base)
    n = len(spdf)
    # row-wise pandas replay of the min-rank formula, compared jointly
    expect = spdf[["user_id"]].copy()
    for col, asc, out in (
        ("r_days", True, "r_q"),
        ("f_cnt", False, "f_q"),
        ("m_cents", False, "m_q"),
    ):
        k = spdf[col].rank(method="min", ascending=asc).astype("int64")
        expect[out] = 1 + (4 * (k - 1)) // n
    got = spdf[["user_id", "r_q", "f_q", "m_q"]]
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.sort_values("user_id", ignore_index=True),
        expect.sort_values("user_id", ignore_index=True),
        check_dtype=False,
    )
    # every tied run shares one score
    for col, out in (("r_days", "r_q"), ("f_cnt", "f_q"),
                     ("m_cents", "m_q")):
        assert (spdf.groupby(col)[out].nunique() == 1).all()
    # quartile sizes: within boundary-tie slack of the baseline's
    # balanced ceil(n/4)
    for col, out in (("r_days", "r_q"), ("f_cnt", "f_q"),
                     ("m_cents", "m_q")):
        sizes = spdf[out].value_counts()
        tie_max = spdf[col].value_counts().max()
        assert sizes.max() <= math.ceil(n / 4) + tie_max


def test_rfm_quartile_scaled_plan_never_sorts_user_frame(spark):
    """The executed plan carries no per-row ranking of the user frame:
    no row_number/ntile/rank anywhere, and every window spec opens
    with a selection column (_tag or _b) — the
    rfm_segmentation_scaled pin applied to the quartile sibling."""
    import re

    plan = (
        rfm_quartile_scores_scaled(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "row_number(" not in plan
    assert "ntile(" not in plan
    assert "rank(" not in plan
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs, "expected selection windows in plan"
    bad = [c for c in specs if c not in ("_tag", "_b")]
    assert not bad, f"window over non-selection frame {bad}\n{plan}"
