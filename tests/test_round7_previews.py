"""Round-7 query previews: full Spark-vs-DuckDB parity pairs for the two
banked embedding-curation surfaces (operators/contrastive.py,
operators/cluster_sample.py), verified NOW so a later registration is a
mechanical @register move.

Same contract as tests/test_round6_previews.py: each test runs the
planned queries() callable against the planned oracle_sql() string with
the driver-sim comparator, so the pair is already proven when promoted.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.functions.scalar import quantized_half_away
from etl_earthquake_gcp_spark.functions.vectors import cast_double_with_norm
from etl_earthquake_gcp_spark.operators import (
    bpe,
    cluster_sample,
    contrastive,
    dsir,
    fusion,
    winnowing,
)
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR, assert_frames_match

_N_ANCHORS = 5  # vec_id < 5 are the anchors (house query-vector contract)
_NEG_K = 3
_N_CENTROIDS = 8  # vec_id < 8 are the deterministic centroids
_QUOTA = 40


# -- hard_negative_mining ----------------------------------------------------

HARD_NEGATIVE_ORACLE = f"""
    WITH exploded AS (
        SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ), norms AS (
        SELECT vec_id, max(label) AS label, sqrt(sum(x * x)) AS norm
        FROM exploded GROUP BY vec_id
    ), dots AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               sum(a.x * b.x) AS dot
        FROM exploded a
        JOIN exploded b ON a.i = b.i
        WHERE a.vec_id < {_N_ANCHORS} AND b.vec_id <> a.vec_id
          AND b.label <> a.label
        GROUP BY 1, 2
    )
    SELECT query_id, CAST(na.label AS BIGINT) AS query_label,
           neighbor_id, CAST(nb.label AS BIGINT) AS neighbor_label,
           round(d.dot / (na.norm * nb.norm), 4) + 0.0 AS cosine
    FROM dots d
    JOIN norms na ON d.query_id = na.vec_id
    JOIN norms nb ON d.neighbor_id = nb.vec_id
    WHERE na.norm > 0 AND nb.norm > 0
    QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY round(d.dot / (na.norm * nb.norm), 6) DESC, neighbor_id
    ) <= {_NEG_K}
"""


def hard_negative_mining(spark, sf_dir):
    emb = contrastive.with_norm_label(load_table(spark, sf_dir, "embeddings"))
    anchors = emb.filter(F.col("vec_id") < _N_ANCHORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col("label").alias("qlabel"),
    )
    return contrastive.hard_negatives(emb, anchors, k=_NEG_K)


def test_hard_negative_mining_oracle_parity(spark, oracle):
    spdf = hard_negative_mining(spark, SF_DIR).toPandas()
    opdf = oracle.execute(HARD_NEGATIVE_ORACLE).df()
    assert_frames_match(spdf, opdf, "hard_negative_mining")
    assert len(spdf) == _N_ANCHORS * _NEG_K
    # the defining property: no negative shares its anchor's label
    assert (spdf["query_label"] != spdf["neighbor_label"]).all()


# -- cluster_quota_sample ----------------------------------------------------

_KEY8 = (
    "CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)"
)

CLUSTER_QUOTA_ORACLE = f"""
    WITH exploded AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ), norms AS (
        SELECT vec_id, sqrt(sum(x * x)) AS norm FROM exploded GROUP BY vec_id
    ), dots AS (
        SELECT v.vec_id, c.vec_id AS cluster_id, sum(v.x * c.x) AS dot
        FROM exploded v
        JOIN exploded c ON v.i = c.i
        WHERE c.vec_id < {_N_CENTROIDS}
        GROUP BY 1, 2
    ), assigned AS (
        SELECT d.vec_id, d.cluster_id
        FROM dots d
        JOIN norms nv ON d.vec_id = nv.vec_id
        JOIN norms nc ON d.cluster_id = nc.vec_id
        WHERE nv.norm > 0 AND nc.norm > 0
        QUALIFY row_number() OVER (
            PARTITION BY d.vec_id
            ORDER BY round(d.dot / (nv.norm * nc.norm), 6) DESC, d.cluster_id
        ) = 1
    ), keyed AS (
        SELECT cluster_id, {_KEY8} AS keep_key,
               row_number() OVER (
                   PARTITION BY cluster_id ORDER BY {_KEY8}, vec_id
               ) AS rnk
        FROM assigned
    )
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_assigned,
           CAST(sum(CASE WHEN rnk <= {_QUOTA} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN rnk <= {_QUOTA} THEN keep_key ELSE 0 END)
                AS BIGINT) AS kept_key_sum
    FROM keyed GROUP BY 1
"""


def cluster_quota_sample(spark, sf_dir):
    corpus = cast_double_with_norm(load_table(spark, sf_dir, "embeddings"))
    cents = corpus.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cluster_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    assigned = cluster_sample.assign_to_centroids(corpus, cents)
    sampled = cluster_sample.quota_sample(assigned, quota=_QUOTA)
    return cluster_sample.cluster_quota_summary(sampled)


def test_cluster_quota_sample_oracle_parity(spark, oracle):
    spdf = cluster_quota_sample(spark, SF_DIR).toPandas()
    opdf = oracle.execute(CLUSTER_QUOTA_ORACLE).df()
    assert_frames_match(spdf, opdf, "cluster_quota_sample")
    assert len(spdf) > 0
    # quota binds: no cluster keeps more than _QUOTA, every vector assigned once
    assert (spdf["n_kept"] <= _QUOTA).all()
    assert (spdf["n_kept"] <= spdf["n_assigned"]).all()


def test_quota_sample_keeps_lowest_hash_members(spark):
    """Unit check on the library piece alone: the kept set per cluster is
    exactly the quota lowest (keep_key, id) members."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id")
    assigned = emb.withColumn("cluster_id", F.pmod("vec_id", F.lit(4)))
    out = cluster_sample.quota_sample(assigned, quota=5).toPandas()
    for _, grp in out.groupby("cluster_id"):
        ordered = grp.sort_values(["keep_key", "vec_id"])
        expect = set(ordered.head(5)["vec_id"])
        assert set(grp[grp["kept"]]["vec_id"]) == expect


# -- bpe_merge_induction -----------------------------------------------------

_BPE_K = 3
_HASH8 = "CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)"


def bpe_merge_ctes(k: int) -> tuple[list[str], list[str]]:
    """Shared unrolled k-stage BPE merge chain (also reused by the
    round-8 fertility preview): returns the CTE list (c0..ck plus the
    per-iteration pair-count/argmax/checksum stages) and the per-
    iteration audit SELECTs."""
    ctes = ["c0 AS (SELECT doc_id, text FROM documents)"]
    rows = []
    for i in range(k):
        ctes.append(f"""
    p{i} AS (
        SELECT t.toks[s.i] AS a, t.toks[s.i + 1] AS b,
               CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT string_split(text, ' ') AS toks FROM c{i}) t,
             LATERAL (SELECT unnest(generate_series(1, len(t.toks) - 1))
                      AS i) s
        GROUP BY 1, 2
    )""")
        ctes.append(
            f"b{i} AS (SELECT a, b, cnt FROM p{i}"
            " ORDER BY cnt DESC, a, b LIMIT 1)"
        )
        ctes.append(f"""
    c{i + 1} AS (
        SELECT doc_id,
               trim(replace(replace(
                   ' ' || replace(text, ' ', '  ') || ' ',
                   (SELECT ' ' || a || '  ' || b || ' ' FROM b{i}),
                   (SELECT ' ' || a || '_' || b || ' ' FROM b{i})),
                   '  ', ' ')) AS text
        FROM c{i}
    )""")
        ctes.append(
            f"h{i + 1} AS (SELECT CAST(sum({_HASH8}) AS BIGINT) AS s"
            f" FROM c{i + 1})"
        )
        rows.append(
            f"SELECT CAST({i + 1} AS BIGINT) AS iter, a AS tok_a,"
            f" b AS tok_b, cnt AS pair_count,"
            f" (SELECT s FROM h{i + 1}) AS corpus_key_sum FROM b{i}"
        )
    return ctes, rows


def bpe_oracle(k: int) -> str:
    """Unrolled k-stage BPE replay (same pattern as the MMR oracle's
    chained CTEs): each stage counts pairs, picks the (cnt DESC, a, b)
    argmax, rewrites the corpus with the doubled-space replace, and
    checksums the rewritten corpus."""
    ctes, rows = bpe_merge_ctes(k)
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rows)


def bpe_merge_induction(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = bpe.merge_induction(docs, n_merges=_BPE_K)
    return spark.createDataFrame(
        [
            (
                r["iter"],
                r["tok_a"],
                r["tok_b"],
                r["pair_count"],
                r["corpus_key_sum"],
            )
            for r in rows
        ],
        schema="iter long, tok_a string, tok_b string,"
        " pair_count long, corpus_key_sum long",
    )


def test_bpe_merge_induction_oracle_parity(spark, oracle):
    spdf = bpe_merge_induction(spark, SF_DIR).toPandas()
    opdf = oracle.execute(bpe_oracle(_BPE_K)).df()
    assert_frames_match(spdf, opdf, "bpe_merge_induction")
    assert len(spdf) == _BPE_K
    # counts are non-increasing: each merge removes the current max pair
    cnts = spdf.sort_values("iter")["pair_count"].tolist()
    assert cnts == sorted(cnts, reverse=True)


def test_bpe_rejects_joiner_and_irregular_spacing(spark):
    """r5 ADVICE: a literal '_' token (or irregular spacing) in the
    INPUT corpus would silently conflate merge-produced pairs — the
    up-front guard must refuse it loudly."""
    import pytest

    for bad_text in ("a_b c", "a  b", " a b", "a b ", None):
        df = spark.createDataFrame(
            [(1, bad_text), (2, "ok tokens")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="precondition"):
            bpe.induce_and_encode(df, n_merges=1)
    # validate=False skips the guard (re-run over a certified corpus)
    ok = spark.createDataFrame(
        [(1, "a a b"), (2, "a a c")], "doc_id long, text string"
    )
    rows, _ = bpe.induce_and_encode(ok, n_merges=1, validate=False)
    assert rows[0]["tok_a"] == "a" and rows[0]["tok_b"] == "a"


def test_apply_merge_is_greedy_leftmost(spark):
    """BPE semantics pin: "a a a" merges leftmost-first -> "a_a a"; the
    doubled-space construction never merges across a freshly-made token."""
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "x a b a b y"), (3, "solo")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["text"]
        for r in bpe.apply_merge(df, "a", "a").collect()
    }
    assert out[1] == "a_a a"
    assert out[2] == "x a b a b y"
    assert out[3] == "solo"
    out2 = {
        r["doc_id"]: r["text"]
        for r in bpe.apply_merge(df, "a", "b").collect()
    }
    assert out2[2] == "x a_b a_b y"


# -- dsir_importance_weights -------------------------------------------------

_DSIR_B = 256  # feature buckets
_DSIR_MOD = 13  # doc_id % 13 == 0 -> target-domain proxy
_DSIR_TOPN = 25

_GRAM_F = (
    "CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % " + str(_DSIR_B)
)

DSIR_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), grams AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1])) AS gram
        FROM t WHERE len(toks) >= 2
    ), feats AS (
        SELECT doc_id, {_GRAM_F} AS f, doc_id % {_DSIR_MOD} = 0 AS is_target
        FROM grams
    ), cnt AS (
        SELECT f,
               CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_t,
               CAST(sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_r
        FROM feats GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(n_t) AS BIGINT) AS t_tot,
               CAST(sum(n_r) AS BIGINT) AS r_tot FROM cnt
    ), buckets AS (
        SELECT b.f, coalesce(c.n_t, 0) AS n_t, coalesce(c.n_r, 0) AS n_r
        FROM (SELECT unnest(generate_series(0, {_DSIR_B - 1})) AS f) b
        LEFT JOIN cnt c ON b.f = c.f
    ), lr AS (
        SELECT f,
               CAST(round(ln(((n_t + 1) * 1.0 * (tot.r_tot + {_DSIR_B}))
                             / ((n_r + 1) * 1.0 * (tot.t_tot + {_DSIR_B})))
                          * 1000000, 0) AS BIGINT) AS lr_u
        FROM buckets CROSS JOIN tot
    ), scored AS (
        SELECT fe.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
               CAST(sum(lr.lr_u) AS BIGINT) AS s_u
        FROM feats fe JOIN lr ON fe.f = lr.f
        WHERE NOT fe.is_target
        GROUP BY 1
    )
    SELECT s.doc_id, d.source, s.n_feats,
           sign(s_u) * ((abs(s_u) + 500) // 1000) / 1000.0 + 0.0 AS weight
    FROM scored s JOIN documents d ON s.doc_id = d.doc_id
    ORDER BY s_u DESC, s.doc_id LIMIT {_DSIR_TOPN}
"""


def dsir_importance_weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    feats = dsir.hashed_bigram_features(docs, n_buckets=_DSIR_B)
    is_target = F.pmod(F.col("doc_id"), F.lit(_DSIR_MOD)) == 0
    ratios = dsir.bucket_log_ratio_units(
        feats, is_target=is_target, n_buckets=_DSIR_B
    )
    raw_feats = feats.filter(~(F.pmod(F.col("doc_id"), F.lit(_DSIR_MOD)) == 0))
    scored = dsir.importance_scores(raw_feats, ratios)
    return (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .orderBy(F.desc("s_u"), "doc_id")
        .limit(_DSIR_TOPN)
        .select(
            "doc_id",
            "source",
            "n_feats",
            quantized_half_away("s_u", 1000, 1000.0).alias("weight"),
        )
    )


def test_dsir_importance_weights_oracle_parity(spark, oracle):
    spdf = dsir_importance_weights(spark, SF_DIR).toPandas()
    opdf = oracle.execute(DSIR_ORACLE).df()
    assert_frames_match(spdf, opdf, "dsir_importance_weights")
    assert len(spdf) == _DSIR_TOPN
    # raw pool only: no target-residue doc may be selected
    assert (spdf["doc_id"] % _DSIR_MOD != 0).all()


# -- winnowing_match_pairs ---------------------------------------------------

_WIN_K = 4  # k-gram width
_WIN_W = 5  # window width
_WIN_MIN_SHARED = 2
_WIN_MAX_DF = 64

WINNOWING_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), hashes AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, len(toks) - {_WIN_K - 1}),
                   i -> CAST(('0x' || substr(md5(
                            toks[i] || ' ' || toks[i + 1] || ' '
                            || toks[i + 2] || ' ' || toks[i + 3]), 1, 8))
                        AS BIGINT)) AS hs
        FROM t WHERE len(toks) >= {_WIN_K + _WIN_W - 1}
    ), fps AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, len(hs) - {_WIN_W - 1}),
                   j -> list_aggregate(list_slice(hs, j, j + {_WIN_W - 1}),
                                       'min'))) AS fp
        FROM hashes
    ), rare AS (
        SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {_WIN_MAX_DF}
    ), pruned AS (
        SELECT f.doc_id, f.fp FROM fps f JOIN rare r ON f.fp = r.fp
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {_WIN_MIN_SHARED}
"""


def winnowing_match_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fps = winnowing.fingerprints(docs, k=_WIN_K, w=_WIN_W)
    return winnowing.match_pairs(
        fps, min_shared=_WIN_MIN_SHARED, max_doc_freq=_WIN_MAX_DF
    )


def test_winnowing_match_pairs_oracle_parity(spark, oracle):
    spdf = winnowing_match_pairs(spark, SF_DIR).toPandas()
    opdf = oracle.execute(WINNOWING_ORACLE).df()
    assert_frames_match(spdf, opdf, "winnowing_match_pairs")
    assert (spdf["n_shared"] >= _WIN_MIN_SHARED).all()


def test_winnowing_guarantee_on_planted_overlap(spark):
    """The winnowing contract: a shared run of >= w + k - 1 tokens yields
    at least one shared fingerprint; disjoint texts yield none."""
    shared = "q w e r t y u i"  # 8 tokens = k + w - 1
    df = spark.createDataFrame(
        [
            (1, f"zz1 zz2 {shared} aa1 aa2"),
            (2, f"bb1 {shared} cc1 cc2 cc3"),
            (3, "dd1 dd2 dd3 dd4 dd5 dd6 dd7 dd8 dd9 dd10"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing.fingerprints(df, k=_WIN_K, w=_WIN_W).toPandas()
    s1 = set(fps[fps.doc_id == 1]["fp"])
    s2 = set(fps[fps.doc_id == 2]["fp"])
    s3 = set(fps[fps.doc_id == 3]["fp"])
    assert s1 & s2, "planted overlap must share a fingerprint"
    assert not (s1 & s3) and not (s2 & s3)


# -- rrf_fusion_topk ---------------------------------------------------------

_RRF_K = 60
_RRF_LIST = 50  # each ranker contributes its top-50
_RRF_TOPN = 10

RRF_ORACLE = f"""
    WITH exploded AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ), norms AS (
        SELECT vec_id, sqrt(sum(x * x)) AS norm FROM exploded GROUP BY vec_id
    ), dots AS (
        SELECT a.vec_id AS query_id, b.vec_id AS item_id,
               sum(a.x * b.x) AS dot
        FROM exploded a JOIN exploded b ON a.i = b.i
        WHERE a.vec_id < {_N_ANCHORS} AND b.vec_id <> a.vec_id
        GROUP BY 1, 2
    ), scored AS (
        SELECT d.query_id, d.item_id,
               d.dot / (nq.norm * ni.norm) AS cos,
               nq.norm * nq.norm + ni.norm * ni.norm - 2 * d.dot AS dist2
        FROM dots d
        JOIN norms nq ON d.query_id = nq.vec_id
        JOIN norms ni ON d.item_id = ni.vec_id
        WHERE nq.norm > 0 AND ni.norm > 0
    ), r_cos AS (
        SELECT query_id, item_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY round(cos, 6) DESC, item_id) AS rank
        FROM scored
        QUALIFY rank <= {_RRF_LIST}
    ), r_l2 AS (
        SELECT query_id, item_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY round(dist2, 6) ASC, item_id) AS rank
        FROM scored
        QUALIFY rank <= {_RRF_LIST}
    ), long AS (
        SELECT * FROM r_cos UNION ALL SELECT * FROM r_l2
    ), fused AS (
        SELECT query_id, item_id,
               CAST(count(*) AS BIGINT) AS n_lists,
               CAST(sum(CAST(round(1000000.0 / ({_RRF_K} + rank), 0)
                             AS BIGINT)) AS BIGINT) AS rrf_u
        FROM long GROUP BY 1, 2
    )
    SELECT query_id, item_id,
           CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY rrf_u DESC, item_id) AS BIGINT) AS fused_rank,
           n_lists, rrf_u
    FROM fused
    QUALIFY fused_rank <= {_RRF_TOPN}
"""


def rrf_fusion_topk(spark, sf_dir):
    emb = cast_double_with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < _N_ANCHORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    pairs = (
        emb.filter(F.col("norm") > 0)
        .crossJoin(F.broadcast(q.filter(F.col("qnorm") > 0)))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # both ranking windows consume `scored` with different projections
    # (no exchange reuse), so persist the broadcast pair scan — the
    # query's dominant cost — instead of computing it twice
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("item_id"),
        (dot / (F.col("norm") * F.col("qnorm"))).alias("cos"),
        (
            F.col("qnorm") * F.col("qnorm")
            + F.col("norm") * F.col("norm")
            - 2 * dot
        ).alias("dist2"),
    ).persist()
    w_cos = Window.partitionBy("query_id").orderBy(
        F.round("cos", 6).desc(), "item_id"
    )
    w_l2 = Window.partitionBy("query_id").orderBy(
        F.round("dist2", 6).asc(), "item_id"
    )
    r_cos = (
        scored.withColumn("rank", F.row_number().over(w_cos))
        .filter(F.col("rank") <= _RRF_LIST)
        .select("query_id", "item_id", "rank")
    )
    r_l2 = (
        scored.withColumn("rank", F.row_number().over(w_l2))
        .filter(F.col("rank") <= _RRF_LIST)
        .select("query_id", "item_id", "rank")
    )
    fused = fusion.rrf_scores(r_cos.unionByName(r_l2), k=_RRF_K)
    return fusion.top_fused(fused, top_n=_RRF_TOPN)


def test_rrf_fusion_topk_oracle_parity(spark, oracle):
    spdf = rrf_fusion_topk(spark, SF_DIR).toPandas()
    opdf = oracle.execute(RRF_ORACLE).df()
    assert_frames_match(spdf, opdf, "rrf_fusion_topk")
    assert len(spdf) == _N_ANCHORS * _RRF_TOPN
    # every fused winner appears in at least one list; both-list items
    # carry two terms
    assert spdf["n_lists"].isin([1, 2]).all()
