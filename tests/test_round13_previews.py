"""Round-13 registrations (promoted from the round-13 preview bank):
the Mann-Kendall trend test now lives in plans/analytics_queries.py,
the exact two-sample KS pair distance in plans/curation_queries.py,
the deterministic 5-fold CV assignment audit in plans/ml_queries.py,
and NDCG@10 plus the two-iteration integer-exact Lloyd k-means in
plans/vector_queries.py as registered driver pairs. These tests
exercise the REGISTERED pair (the exact objects the driver sees) plus
the domain asserts, the pure-Python replays, and the constructed
known-value cases the generic oracle-parity sweep does not check.

Also here: the rfm_quartile_scores_scaled tests (r11 verdict optional
next-step #7) — REGISTERED in round 14 (plans/analytics_queries.py,
taking the r14 head's displacement slot per the standing rule); the
tests below exercise the registered pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.plans import QUERIES
from etl_earthquake_gcp_spark.plans.ml_queries import _KFOLD_K as _KFOLD
from etl_earthquake_gcp_spark.plans.vector_queries import (
    _KM_K,
    _NDCG_K,
    _NDCG_PREFIX,
    _NDCG_QUERIES,
    _NDCG_W,
    _km_q6_int as _q6_int,
)
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR
from .conftest import run_registered_pair as _run_pair

# registered query callables (the exact objects the driver sees)
mann_kendall_trend = QUERIES["mann_kendall_trend"].spark_fn
ks_exact_pairs = QUERIES["ks_exact_pairs"].spark_fn
kfold_assign_audit = QUERIES["kfold_assign_audit"].spark_fn
ndcg_at10_exact = QUERIES["ndcg_at10_exact"].spark_fn
kmeans_lloyd_2iter = QUERIES["kmeans_lloyd_2iter"].spark_fn

# -- mann_kendall_trend ------------------------------------------------------


def test_mann_kendall_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "mann_kendall_trend")
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


def test_ks_exact_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "ks_exact_pairs")
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


def test_kfold_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "kfold_assign_audit")
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


def test_ndcg_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "ndcg_at10_exact")
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


def test_kmeans_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "kmeans_lloyd_2iter")
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
    # PERSIST-free test-local frame: read twice below, small SF only
    xu = emb.select(
        "vec_id", F.posexplode("vec").alias("i0", "x")
    ).select(
        "vec_id", (F.col("i0") + 1).alias("i"),
        _q6_int(F.col("x")).alias("xu"),
    )

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


# -- rfm_quartile_scores_scaled (r11 verdict next-step #7 — REGISTERED
#    in round 14, plans/analytics_queries.py, taking the r14 head's
#    displacement slot; semantics/proof in the registered docstring) --------

rfm_quartile_scores_scaled = QUERIES["rfm_quartile_scores_scaled"].spark_fn



def test_rfm_quartile_scaled_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "rfm_quartile_scores_scaled")
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
