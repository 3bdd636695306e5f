"""Round-7 registrations: training-data curation surfaces.

The six banked library surfaces (operators/contrastive.py,
cluster_sample.py, bpe.py, dsir.py, winnowing.py, fusion.py), promoted
to the driver registry per the SURVEY.md round-7 registration plan.
Each Spark/oracle pair was proven in tests/test_round7_previews.py
across rounds 5-6 (including the perturbed-testdata rehearsals) before
registration — this move is mechanical.

No reference counterpart (the reference's ETL ends at a star schema,
CarlosDiazData/etl-earthquake-gcp scripts/* stop at BI queries); these
extend the tier-4 LLM-pipeline surface: hard-negative mining is the
contrastive-training prep step, cluster-quota sampling is DCLM-style
cluster-balanced curation, BPE merge induction is the tokenizer-training
inner loop, DSIR is importance-resampled data selection (Xie et al.),
winnowing is the MOSS local-fingerprint match, and RRF is the standard
multi-ranker retrieval fusion.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import CHECKSUM_MOD, quantized_half_away
from ..functions.vectors import cast_double_with_norm
from ..operators import (
    bpe,
    cluster_sample,
    contrastive,
    dedup,
    dsir,
    fusion,
    sampling,
    winnowing,
)
from ..sources.tables import load_table
from .registry import register

N_ANCHORS = 5  # vec_id < 5 are the anchors (house query-vector contract)
NEG_K = 3
N_CENTROIDS = 8  # vec_id < 8 are the deterministic centroids
QUOTA = 40
BPE_K = 3
DSIR_B = 256  # feature buckets
DSIR_MOD = 13  # doc_id % 13 == 0 -> target-domain proxy
DSIR_TOPN = 25
WIN_K = 4  # k-gram width
WIN_W = 5  # window width
WIN_MIN_SHARED = 2
WIN_MAX_DF = 64
RRF_K = 60
RRF_LIST = 50  # each ranker contributes its top-50
RRF_TOPN = 10

_KEY8 = (
    "CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)"
)
_HASH8_TEXT = "CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)"
_GRAM_F = (
    "CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % " + str(DSIR_B)
)


@register(
    "hard_negative_mining",
    oracle=f"""
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
        WHERE a.vec_id < {N_ANCHORS} AND b.vec_id <> a.vec_id
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
    ) <= {NEG_K}
    """,
    doc="contrastive-training hard negatives: per-anchor top-k "
    "highest-cosine corpus rows with a DIFFERENT label "
    "(operators/contrastive.py::hard_negatives). Bounded anchor set "
    "broadcast against one linear corpus scan, per-anchor top-k via "
    "window over the anchor-keyed groups — the corpus is scanned once "
    "and never self-joined; at 100 TB the cost is one pass per anchor "
    "batch.",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = contrastive.with_norm_label(load_table(spark, sf_dir, "embeddings"))
    anchors = emb.filter(F.col("vec_id") < N_ANCHORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col("label").alias("qlabel"),
    )
    return contrastive.hard_negatives(emb, anchors, k=NEG_K)


@register(
    "cluster_quota_sample",
    oracle=f"""
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
        WHERE c.vec_id < {N_CENTROIDS}
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
           CAST(sum(CASE WHEN rnk <= {QUOTA} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN rnk <= {QUOTA} THEN keep_key ELSE 0 END)
                AS BIGINT) AS kept_key_sum
    FROM keyed GROUP BY 1
    """,
    doc="DCLM-style cluster-balanced curation: nearest-centroid "
    "assignment (broadcast centroids, argmax over 6dp-collapsed cosine) "
    "+ per-cluster portable-hash quota cap "
    "(operators/cluster_sample.py). The kept SET is certified by an "
    "integer keep-key hash-sum checksum (bounded by quota * 2^31, "
    "BIGINT-safe for any quota < 2^31). One corpus scan for "
    "assignment, one per-cluster window for the quota — no corpus "
    "self-join; scale-safe for any bounded centroid count.",
)
def cluster_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = cast_double_with_norm(load_table(spark, sf_dir, "embeddings"))
    cents = corpus.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cluster_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    assigned = cluster_sample.assign_to_centroids(corpus, cents)
    sampled = cluster_sample.quota_sample(assigned, quota=QUOTA)
    return cluster_sample.cluster_quota_summary(sampled)


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
            f"h{i + 1} AS (SELECT CAST(sum({_HASH8_TEXT})"
            f" % {CHECKSUM_MOD} AS BIGINT) AS s FROM c{i + 1})"
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


@register(
    "bpe_merge_induction",
    oracle=bpe_oracle(BPE_K),
    doc="the tokenizer-training inner loop (BPE / word2phrase shape): "
    "k iterations of pair-count -> integer argmax -> corpus-wide greedy "
    "leftmost merge via the doubled-space replace trick "
    "(operators/bpe.py::merge_induction). One scan + one groupBy + a "
    "map-side rewrite per iteration; the only collect is the 1-row "
    "argmax; per-iteration checkpoint keeps lineage O(1) so k scans "
    "stay O(k). Every intermediate corpus state is certified by a "
    "modular hash-sum checksum (exact decimal accumulation mod 2^61-1 "
    "— overflow-free AND multiplicity-sensitive at any corpus size); "
    "zero floats anywhere.",
)
def bpe_merge_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = bpe.merge_induction(docs, n_merges=BPE_K)
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


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), grams AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1])) AS gram
        FROM t WHERE len(toks) >= 2
    ), feats AS (
        SELECT doc_id, {_GRAM_F} AS f, doc_id % {DSIR_MOD} = 0 AS is_target
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
        FROM (SELECT unnest(generate_series(0, {DSIR_B - 1})) AS f) b
        LEFT JOIN cnt c ON b.f = c.f
    ), lr AS (
        SELECT f,
               CAST(round(ln(((n_t + 1) * 1.0 * (tot.r_tot + {DSIR_B}))
                             / ((n_r + 1) * 1.0 * (tot.t_tot + {DSIR_B})))
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
    ORDER BY s_u DESC, s.doc_id LIMIT {DSIR_TOPN}
    """,
    doc="DSIR data selection (Xie et al.): hashed-bigram features into "
    "B buckets, add-1-smoothed target/raw bucket log-ratios quantized "
    "ONCE to integer 1e-6 units (exact-integer ln inputs absorb libm "
    "ulp drift in the single quantization), per-doc score = exact "
    "integer sum, top-N on the integer score "
    "(operators/dsir.py). The B-row bucket table is broadcast; one "
    "groupBy(doc_id) shuffle; selection is TakeOrderedAndProject — "
    "scale-safe at any corpus size.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = dsir.hashed_bigram_features(docs, n_buckets=DSIR_B)
    is_target = F.pmod(F.col("doc_id"), F.lit(DSIR_MOD)) == 0
    ratios = dsir.bucket_log_ratio_units(
        feats, is_target=is_target, n_buckets=DSIR_B
    )
    raw_feats = feats.filter(~(F.pmod(F.col("doc_id"), F.lit(DSIR_MOD)) == 0))
    scored = dsir.importance_scores(raw_feats, ratios)
    return (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .orderBy(F.desc("s_u"), "doc_id")
        .limit(DSIR_TOPN)
        .select(
            "doc_id",
            "source",
            "n_feats",
            quantized_half_away("s_u", 1000, 1000.0).alias("weight"),
        )
    )


@register(
    "winnowing_match_pairs",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), hashes AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, len(toks) - {WIN_K - 1}),
                   i -> CAST(('0x' || substr(md5(
                            toks[i] || ' ' || toks[i + 1] || ' '
                            || toks[i + 2] || ' ' || toks[i + 3]), 1, 8))
                        AS BIGINT)) AS hs
        FROM t WHERE len(toks) >= {WIN_K + WIN_W - 1}
    ), fps AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, len(hs) - {WIN_W - 1}),
                   j -> list_aggregate(list_slice(hs, j, j + {WIN_W - 1}),
                                       'min'))) AS fp
        FROM hashes
    ), rare AS (
        SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {WIN_MAX_DF}
    ), pruned AS (
        SELECT f.doc_id, f.fp FROM fps f JOIN rare r ON f.fp = r.fp
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {WIN_MIN_SHARED}
    """,
    doc="MOSS winnowing: per-window minimum of k-gram portable hashes "
    "(value-emitting variant — pure integer arithmetic, no tie rule; "
    "the >= w+k-1 shared-run guarantee is pinned by test), match step "
    "= fingerprint-bucket equi-join with a doc-frequency cap "
    "(operators/winnowing.py). The banded-LSH shape — candidate pairs "
    "come from shared-fingerprint buckets, never an all-pairs join; "
    "the df cap bounds any hot bucket at 100 TB.",
)
def winnowing_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fps = winnowing.fingerprints(docs, k=WIN_K, w=WIN_W)
    return winnowing.match_pairs(
        fps, min_shared=WIN_MIN_SHARED, max_doc_freq=WIN_MAX_DF
    )


@register(
    "rrf_fusion_topk",
    oracle=f"""
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
        WHERE a.vec_id < {N_ANCHORS} AND b.vec_id <> a.vec_id
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
        QUALIFY rank <= {RRF_LIST}
    ), r_l2 AS (
        SELECT query_id, item_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY round(dist2, 6) ASC, item_id) AS rank
        FROM scored
        QUALIFY rank <= {RRF_LIST}
    ), long AS (
        SELECT * FROM r_cos UNION ALL SELECT * FROM r_l2
    ), fused AS (
        SELECT query_id, item_id,
               CAST(count(*) AS BIGINT) AS n_lists,
               CAST(sum(CAST(round(1000000.0 / ({RRF_K} + rank), 0)
                             AS BIGINT)) AS BIGINT) AS rrf_u
        FROM long GROUP BY 1, 2
    )
    SELECT query_id, item_id,
           CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY rrf_u DESC, item_id) AS BIGINT) AS fused_rank,
           n_lists, rrf_u
    FROM fused
    QUALIFY fused_rank <= {RRF_TOPN}
    """,
    doc="reciprocal rank fusion of truncated per-query ranked lists "
    "(cosine + euclidean rankers from ONE persisted pair scan): integer "
    "ranks from 6dp-collapsed windows, each 1/(k+rank) term quantized "
    "once to integer units, fused score = exact integer sum, final "
    "top-N a pure integer ordering (operators/fusion.py). Fusion runs "
    "over list-sized data (union + one groupBy); the corpus is scanned "
    "once against the bounded broadcast anchor set.",
)
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = cast_double_with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_ANCHORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    pairs = (
        emb.filter(F.col("norm") > 0)
        # CROSSJOIN: |queries|-row anchor frame — fixed eval-set size
        .crossJoin(F.broadcast(q.filter(F.col("qnorm") > 0)))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # PERSIST: both ranking windows consume `scored` with different
    # projections (no exchange reuse), so persist the broadcast pair
    # scan — the query's dominant cost — instead of computing it twice.
    # |queries| x |vectors| scored rows; no unpersist by design (the
    # returned frame is lazy — an eager unpersist would drop the cache
    # before the driver materializes it), lifetime = session LRU like
    # every persist in this package (r8 persist audit, SCALING.md)
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
        .filter(F.col("rank") <= RRF_LIST)
        .select("query_id", "item_id", "rank")
    )
    r_l2 = (
        scored.withColumn("rank", F.row_number().over(w_l2))
        .filter(F.col("rank") <= RRF_LIST)
        .select("query_id", "item_id", "rank")
    )
    fused = fusion.rrf_scores(r_cos.unionByName(r_l2), k=RRF_K)
    return fusion.top_fused(fused, top_n=RRF_TOPN)


FERT_K = 3  # merges for the fertility evaluation (round-8 registration)


def bpe_fertility_oracle(k: int) -> str:
    """Fertility-stats oracle: the shared unrolled merge chain
    (bpe_merge_ctes) encodes the corpus, then per-source token totals,
    exact vocabulary sizes and the compression ratio are computed on the
    before/after token streams."""
    ctes, _ = bpe_merge_ctes(k)
    ctes.append(f"""
    enc AS (
        SELECT c.doc_id, d.source, c.text
        FROM c{k} c JOIN documents d USING (doc_id)
    )""")
    ctes.append("""
    base AS (SELECT doc_id, source, text FROM documents)""")
    ctes.append("""
    bt AS (
        SELECT source, CAST(count(*) AS BIGINT) AS tok_before,
               CAST(count(DISTINCT tok) AS BIGINT) AS vocab_before
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM base)
        GROUP BY source
    )""")
    ctes.append("""
    att AS (
        SELECT source, CAST(count(*) AS BIGINT) AS tok_after,
               CAST(count(DISTINCT tok) AS BIGINT) AS vocab_after
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM enc)
        GROUP BY source
    )""")
    ctes.append("""
    nd AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM base GROUP BY source
    )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
    SELECT nd.source, n_docs, tok_before, vocab_before,
           tok_after, vocab_after,
           round(tok_after * 1.0 / tok_before, 6) AS compression6
    FROM nd
    JOIN bt USING (source)
    JOIN att USING (source)
    """
    )


@register(
    "bpe_fertility_stats",
    oracle=bpe_fertility_oracle(FERT_K),
    doc="tokenizer-fertility evaluation: induce the k-merge BPE table "
    "(the registered bpe_merge_induction loop), apply it to the corpus "
    "in the same pass (operators/bpe.py::induce_and_encode returns the "
    "encoded corpus directly — no re-application scan), and report "
    "per-source token totals, exact vocabulary sizes and the "
    "compression ratio — the read a tokenizer change is judged by "
    "before a production re-tokenization. Everything is exact integers "
    "but the single int/int compression ratio rounded once (the "
    "measured-safe class). Token stats are one explode + per-source "
    "groupBy each (map-side combinable); the merge loop's scale story "
    "is bpe_merge_induction's (k scans, O(1) lineage via per-iteration "
    "checkpoint).",
)
def bpe_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    # induction tolerates (and preserves) the extra source column, and
    # returns the encoded corpus directly — no re-application pass
    _, enc = bpe.induce_and_encode(docs, n_merges=FERT_K)

    def stats(df: DataFrame, suffix: str) -> DataFrame:
        tok = df.select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        )
        return tok.groupBy("source").agg(
            F.count("*").cast("long").alias(f"tok_{suffix}"),
            F.countDistinct("tok").cast("long").alias(f"vocab_{suffix}"),
        )

    nd = docs.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    return (
        nd.join(stats(docs, "before"), "source")
        .join(stats(enc, "after"), "source")
        .withColumn(
            "compression6",
            F.round(F.col("tok_after") * 1.0 / F.col("tok_before"), 6),
        )
        .select(
            "source",
            "n_docs",
            "tok_before",
            "vocab_before",
            "tok_after",
            "vocab_after",
            "compression6",
        )
    )


# -- round-9 registrations: corpus-audit surfaces ----------------------------
#
# Promoted from tests/test_round9_previews.py (proven rounds 7-8,
# perturbation-rehearsed). The SQL stage helpers below are module-level
# because the round-11 datacard previews compose them — a parity fix
# must land ONCE (tests/test_round11_previews.py imports these).

# the shared (a*x+b) mod p modulus — the ONE house value; the signature
# hash below reduces mod HASH_P while minhash_coeffs draws mod
# dedup._MERSENNE_P, so this import-time check binds all three names to
# one number (an explicit raise, not assert — a bare assert is compiled
# away under `python -O`, silently disabling the drift guard; r9 ADVICE)
HASH_P = sampling.HASH_P
if not (HASH_P == dedup._MERSENNE_P == 2147483647):
    raise ValueError(
        "modulus drift: sampling.HASH_P, dedup._MERSENNE_P and the "
        f"curation oracle literal must all be 2147483647 (got {HASH_P}, "
        f"{dedup._MERSENNE_P})"
    )
OVL_H = 16  # minhash signature width of the source-overlap audit
OVL_SEED = 42
ZIPF_R = 100  # top-R ranks entering the log-log OLS fit
NOV_N = 5  # novelty n-gram width

FREQ_SQL = """freq AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY 1, 2
    )"""


def zipf_sql_stages(top_r: int) -> str:
    """rank -> integer-log-unit -> OLS-sums oracle chain over a
    freq(source, tok, cnt) CTE, ending in zs. Both logs are quantized
    ONCE to integer 1e-3 units (exact-integer ln inputs — the DSIR
    absorption class); every OLS sum is an exact integer."""
    return f"""zr AS (
        SELECT source, cnt,
               row_number() OVER (PARTITION BY source
                   ORDER BY cnt DESC, tok) AS r
        FROM freq
        QUALIFY r <= {top_r}
    ), zu AS (
        SELECT source,
               CAST(round(ln(r) * 1000, 0) AS BIGINT) AS x_u,
               CAST(round(ln(cnt) * 1000, 0) AS BIGINT) AS y_u
        FROM zr
    ), zs AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_ranks,
               CAST(sum(x_u) AS BIGINT) AS sx,
               CAST(sum(y_u) AS BIGINT) AS sy,
               CAST(sum(x_u * y_u) AS BIGINT) AS sxy,
               CAST(sum(x_u * x_u) AS BIGINT) AS sxx
        FROM zu GROUP BY source
    )"""


# the slope is a single int/int rational rounded once; the +0.0 folds
# -0.0 -> +0.0 (slope is negative-capable; Spark F.round gives +0.0
# where DuckDB gives -0.0 on tiny negative rationals)
ZIPF_SLOPE_SQL = (
    "round((n_ranks * sxy - sx * sy) * 1.0"
    " / (n_ranks * sxx - sx * sx), 6) + 0.0"
)

GRAM_SQL_STAGES = f"""t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id, source,
               array_to_string(toks[i:i + {NOV_N} - 1], ' ') AS gram
        FROM t, LATERAL (SELECT unnest(generate_series(1,
                 len(toks) - {NOV_N} + 1)) AS i) s
        WHERE len(toks) >= {NOV_N}
    ), reach AS (
        SELECT gram, CAST(count(*) AS BIGINT) AS n_docs_with
        FROM grams GROUP BY gram
    )"""


def token_freq(docs: DataFrame) -> DataFrame:
    """(source, tok, cnt) token-frequency frame — the shared substrate
    of the Zipf fit, lexical diversity, and the round-11 datacard."""
    return (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def zipf_sums(freq: DataFrame, top_r: int) -> DataFrame:
    """Per-source integer OLS sums over the top-R log-log rank points.

    Scale note: the rank window partitions by source over the
    vocabulary-sized freq frame (Heaps-sublinear in corpus size), and
    only top_r rows per source survive into the fixed-size sums."""
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), "tok")
    zu = (
        freq.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= top_r)
        .select(
            "source",
            F.round(F.log(F.col("r")) * 1000, 0).cast("long").alias("x_u"),
            F.round(F.log(F.col("cnt")) * 1000, 0)
            .cast("long")
            .alias("y_u"),
        )
    )
    return zu.groupBy("source").agg(
        F.count("*").cast("long").alias("n_ranks"),
        F.sum("x_u").cast("long").alias("sx"),
        F.sum("y_u").cast("long").alias("sy"),
        F.sum(F.col("x_u") * F.col("y_u")).cast("long").alias("sxy"),
        F.sum(F.col("x_u") * F.col("x_u")).cast("long").alias("sxx"),
    )


def zipf_slope6_col():
    num = F.col("n_ranks") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_ranks") * F.col("sxx") - F.col("sx") * F.col("sx")
    return F.round(num * 1.0 / den, 6) + F.lit(0.0)


def gram_frame(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, source, gram) NOV_N-gram frame — tokenizes
    ONCE into a toks column (the split() stays out of the transform
    lambda, where Catalyst cannot share it). Carries BOTH doc_id and
    source (doc -> source is functional, so per-doc semantics are
    unchanged and a per-source consumer needs no second tokenize)."""
    return (
        docs.select("doc_id", "source", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= NOV_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {NOV_N} + 1),"
                    f" i -> array_join(slice(toks, i, {NOV_N}), ' '))"
                )
            ).alias("gram"),
        )
        .distinct()
        # PERSIST: distinct per-doc gram frame (corpus-gram-sized, the
        # same order as the registered dup_ngram_ratio intermediate);
        # read twice in ONE lazy plan — the doc-frequency agg and the
        # join back onto it; session-LRU lifetime (lazy return)
        .persist()
    )


def reach_frame(grams: DataFrame) -> DataFrame:
    # gram_frame is already distinct on (doc_id, source, gram) and
    # doc -> source is functional, so rows are unique per (doc_id,
    # gram) — count directly, no second distinct shuffle
    return grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("n_docs_with")
    )


def _source_overlap_oracle() -> str:
    coeffs = dedup.minhash_coeffs(OVL_H, OVL_SEED)
    hash_exprs = ",\n               ".join(
        f"min((tid * {a} + {b}) % {HASH_P}) AS h{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    match_sum = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END"
        for i in range(OVL_H)
    )
    return f"""
    WITH tok AS (
        SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), vocab AS (
        SELECT token, CAST(row_number() OVER (ORDER BY token) - 1
                           AS BIGINT) AS tid
        FROM (SELECT DISTINCT token FROM tok)
    ), tids AS (
        SELECT source, tid FROM tok JOIN vocab USING (token)
    ), sig AS (
        SELECT source,
               {hash_exprs}
        FROM tids GROUP BY source
    ), sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY source
    ), inter AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(count(*) AS BIGINT) AS n_inter
        FROM tok a JOIN tok b
          ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2
    ), pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST({match_sum} AS BIGINT) AS n_match
        FROM sig a JOIN sig b ON a.source < b.source
    )
    SELECT p.src_a, p.src_b, p.n_match,
           round(p.n_match * 1.0 / {OVL_H}, 6) AS est6,
           CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
           CAST(sa.n + sb.n - coalesce(i.n_inter, 0) AS BIGINT) AS n_union,
           round(coalesce(i.n_inter, 0) * 1.0
                 / (sa.n + sb.n - coalesce(i.n_inter, 0)), 6) AS true6
    FROM pairs p
    LEFT JOIN inter i ON p.src_a = i.src_a AND p.src_b = i.src_b
    JOIN sizes sa ON p.src_a = sa.source
    JOIN sizes sb ON p.src_b = sb.source
    """


@register(
    "source_overlap_minhash",
    oracle=_source_overlap_oracle(),
    doc="corpus-overlap audit: per-source MinHash signatures (the "
    "repo's (a*x+b) mod p family over dictionary token-ids, "
    "operators/dedup.py::minhash_coeffs) compared pairwise, WITH the "
    "exact token-set Jaccard beside the estimate — the mergeable "
    "sketch and its ground truth in one hash-checked result. Scale: "
    "token-ids come from token_dictionary_distributed (no "
    "single-partition vocabulary sort — ids proven bit-identical to "
    "the oracle's rank order); the vocab join is UNHINTED per the r7 "
    "broadcast audit (the vocabulary grows Heaps-sublinearly but "
    "grows — AQE picks the strategy per scale); the signature/size/"
    "intersection frames are |sources|-row source-dimension frames, "
    "broadcast. The exact-Jaccard tok-tok self-join is "
    "vocabulary-sized per source, the audit's ground-truth cost by "
    "design (the estimate alone is the production path). Reference "
    "has no counterpart (CarlosDiazData/etl-earthquake-gcp stops at "
    "BI); this is the cross-source contamination audit of a "
    "curation pipeline.",
)
def source_overlap_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tok = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        )
        .distinct()
        # PERSIST: distinct (source, token) frame (per-source
        # vocabulary-sized, Heaps-sublinear in corpus size); feeds five
        # consumers with differing projections in ONE lazy plan (vocab,
        # tids, sizes, both exact-intersection sides); session-LRU
        # lifetime (lazy return)
        .persist()
    )
    vocab = dedup.token_dictionary_distributed(tok)
    # vocab join unhinted: the dictionary grows with the corpus
    # (r7 broadcast-audit rule — stats/AQE pick the strategy)
    tids = tok.join(vocab, "token").select("source", "tid")
    coeffs = dedup.minhash_coeffs(OVL_H, OVL_SEED)
    mins = [
        F.min((F.col("tid") * F.lit(a) + F.lit(b)) % F.lit(HASH_P)).alias(
            f"h{i}"
        )
        for i, (a, b) in enumerate(coeffs)
    ]
    sig = tids.groupBy("source").agg(*mins)
    a, b = sig.alias("a"), sig.alias("b")
    match = sum(
        F.when(F.col(f"a.h{i}") == F.col(f"b.h{i}"), 1).otherwise(0)
        for i in range(OVL_H)
    )
    pairs = (
        # CROSSJOIN: |sources|-row signature frame — source-dimension-
        # bounded inequality broadcast-NLJ
        a.join(F.broadcast(b), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            match.cast("long").alias("n_match"),
        )
    )
    sizes = tok.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    x, y = tok.alias("x"), tok.alias("y")
    inter = (
        x.join(
            y,
            (F.col("x.token") == F.col("y.token"))
            & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("src_a"),
            F.col("y.source").alias("src_b"),
        )
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sa = sizes.select(
        F.col("source").alias("src_a"), F.col("n").alias("na")
    )
    sb = sizes.select(
        F.col("source").alias("src_b"), F.col("n").alias("nb")
    )
    n_inter = F.coalesce(F.col("n_inter"), F.lit(0)).cast("long")
    return (
        # three |sources|(^2)-row aggregate frames: source-dimension-
        # bounded (pairs of a dimension), broadcast
        pairs.join(F.broadcast(inter), ["src_a", "src_b"], "left")
        .join(F.broadcast(sa), ["src_a"])
        .join(F.broadcast(sb), ["src_b"])
        .select(
            "src_a",
            "src_b",
            "n_match",
            F.round(F.col("n_match") * 1.0 / OVL_H, 6).alias("est6"),
            n_inter.alias("n_inter"),
            (F.col("na") + F.col("nb") - n_inter).alias("n_union"),
            F.round(
                n_inter * 1.0 / (F.col("na") + F.col("nb") - n_inter), 6
            ).alias("true6"),
        )
    )


@register(
    "zipf_slope_fit",
    oracle=f"""
    WITH {FREQ_SQL},
    {zipf_sql_stages(ZIPF_R)}
    SELECT source, n_ranks, sx, sy, sxy, sxx,
           {ZIPF_SLOPE_SQL} AS slope6
    FROM zs
    WHERE n_ranks > 1
    """,
    doc="vocabulary power-law audit: per-source OLS fit of ln(freq) on "
    "ln(rank) over the top-R token ranks. Both logs are quantized ONCE "
    "to integer 1e-3 units (exact-integer ln inputs — the DSIR "
    "absorption class); every OLS sum is an exact integer; the slope "
    "is a single int/int rational rounded once, +0.0-folded (it is "
    "negative — healthy natural-language text sits near -1). Scale: "
    "the rank window partitions by source over the vocabulary-sized "
    "frequency frame; only R=100 rows per source reach the sums. "
    "Reference has no counterpart; this is the shard-health quick "
    "read of a corpus datacard (shared stages feed the round-11 "
    "datacard bank).",
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    s = zipf_sums(token_freq(docs), ZIPF_R)
    return s.filter(F.col("n_ranks") > 1).select(
        "source",
        "n_ranks",
        "sx",
        "sy",
        "sxy",
        "sxx",
        zipf_slope6_col().alias("slope6"),
    )


@register(
    "doc_novelty_ngram",
    oracle=f"""
    WITH {GRAM_SQL_STAGES}
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN r.n_docs_with > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shared,
           round(sum(CASE WHEN r.n_docs_with > 1 THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS shared6
    FROM grams g JOIN reach r USING (gram)
    GROUP BY g.doc_id
    """,
    doc="cross-document boilerplate/overlap audit: the share of each "
    "doc's DISTINCT 5-grams that also occur in at least one other "
    "document (the within-doc sibling is the registered "
    "dup_ngram_ratio). Integer counts + one int/int ratio rounded "
    "once. Scale: the gram frame shuffles once on gram for the "
    "doc-frequency count and once back on gram for the join — the "
    "same two-shuffle shape as the registered jaccard/containment "
    "inverted-index family; the persisted gram frame is read by both "
    "consumers. Reference has no counterpart; this is the novelty "
    "filter of a dedup-aware curation pipeline.",
)
def doc_novelty_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    grams = gram_frame(docs)
    shared = F.sum(
        F.when(F.col("n_docs_with") > 1, 1).otherwise(0)
    ).cast("long")
    return (
        grams.join(reach_frame(grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            shared.alias("n_shared"),
            F.round(shared * 1.0 / F.count("*"), 6).alias("shared6"),
        )
    )


@register(
    "lexical_diversity_stats",
    oracle=f"""
    WITH {FREQ_SQL}
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
           round(count(*) * 1.0 / sum(cnt), 6) AS ttr6,
           round(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS hapax6
    FROM freq GROUP BY source
    """,
    doc="per-source corpus-health metrics from ONE token-frequency "
    "table: type-token ratio and hapax share — the quick reads that "
    "flag template-generated or truncated shards before training. All "
    "integers + two independent single-ratio rounds. Scale: one "
    "tokenize + one two-key agg + one source agg; the frequency "
    "frame is vocabulary-sized per source. Reference has no "
    "counterpart; shared substrate with zipf_slope_fit and the "
    "round-11 datacard.",
)
def lexical_diversity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    freq = token_freq(docs)
    hapax = F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).cast("long")
    return freq.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        hapax.alias("n_hapax"),
        F.round(F.count("*") * 1.0 / F.sum("cnt"), 6).alias("ttr6"),
        F.round(hapax * 1.0 / F.count("*"), 6).alias("hapax6"),
    )


# --------------------------------------------------------------------------
# Round-11 registrations (promoted from the round-11 preview bank).
# Parity pairs proven in tests/test_round11_previews.py across rounds
# 9-10 including the perturbed-testdata rehearsals — this move is
# mechanical. No reference counterpart (the reference's ETL ends at a
# star schema); these are the corpus-health tier of an LLM curation run.
# --------------------------------------------------------------------------


@register(
    "source_datacard_pipeline",
    oracle=f"""
    WITH {FREQ_SQL},
    lex AS (
        SELECT source,
               CAST(sum(cnt) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_types,
               round(count(*) * 1.0 / sum(cnt), 6) AS ttr6
        FROM freq GROUP BY source
    ),
    {zipf_sql_stages(ZIPF_R)},
    zipf AS (
        SELECT source, {ZIPF_SLOPE_SQL} AS zipf_slope6
        FROM zs WHERE n_ranks > 1
    ),
    {GRAM_SQL_STAGES},
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
    """,
    doc="the per-source data card as ONE lazy plan: document counts, "
    "token totals, lexical diversity, the Zipf slope, and the "
    "corpus-wide shared-5-gram rate — the composed health report a "
    "curation run prints per shard. Shared-rate comes from INTEGER "
    "sums (never a mean of per-doc ratios), the slope from the "
    "integer-unit log OLS; the oracle replays the whole composition. "
    "Membership contract (deliberate, symmetric on both sides): a "
    "source must be slope-fittable (>= 2 distinct top-R ranks) to get "
    "a card — a degenerate shard (single-rank vocabulary) is excluded "
    "from THIS report by the inner zipf join rather than carrying a "
    "meaningless slope; the registered lexical_diversity_stats / "
    "length_emd_pairs surfaces still profile such shards (no rank "
    "filter there). Scale: one tokenize feeds lex AND zipf via the "
    "persisted frequency frame; the gram stages are the registered "
    "doc_novelty_ngram two-shuffle shape; every join after the aggs "
    "is |sources|-keyed. Reference has no counterpart.",
)
def source_datacard_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    # PERSIST: vocabulary-sized (source, tok, cnt) frame (Heaps-
    # sublinear in corpus size), read by the lexical aggregate AND the
    # zipf rank window — one tokenize pass; session-LRU lifetime
    freq = token_freq(docs).persist()
    lex = freq.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.round(F.count("*") * 1.0 / F.sum("cnt"), 6).alias("ttr6"),
    )
    zipf = (
        zipf_sums(freq, ZIPF_R)
        .filter(F.col("n_ranks") > 1)
        .select("source", zipf_slope6_col().alias("zipf_slope6"))
    )
    grams = gram_frame(docs)
    shared = F.sum(
        F.when(F.col("n_docs_with") > 1, 1).otherwise(0)
    ).cast("long")
    nov = (
        grams.join(reach_frame(grams), "gram")
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


@register(
    "length_emd_pairs",
    oracle="""
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
           round(n.emd_num
                 / CAST(CAST(p.n_a AS HUGEINT) * p.n_b AS DOUBLE), 6)
               AS emd6
    FROM num n JOIN pairs p USING (src_a, src_b)
    """,
    doc="distribution drift between sources, third metric beside the "
    "registered PSI/binned-KS: exact 1-D earth mover's distance "
    "between per-source doc-length distributions. EMD_1D = sum over "
    "the union support of |cdfA - cdfB| * gap; cross-multiplying by "
    "the two counts keeps the whole accumulation in exact integers "
    "(|cumA*nB - cumB*nA| * gap), with ONE ratio round at display. "
    "The accumulation runs in DECIMAL(38,0) on the Spark side and "
    "HUGEINT on DuckDB (exact to 1e38 — BIGINT would overflow once "
    "per-source doc counts reach ~3e7 at a 1e4 length domain); only "
    "the emitted emd_num downcasts to BIGINT, loudly under ANSI if a "
    "corpus ever outgrows it. Scale: after the one fact-scan "
    "histogram agg, every frame is value-domain x |sources|-bounded "
    "(per-source length histograms) — the pair fan-out never touches "
    "fact rows. Reference has no counterpart.",
)
def length_emd_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # PERSIST: per-source length histogram — |sources| x length-domain
    # rows, SF-free after the one fact-scan agg; read by sizes, the
    # support union, and both cdf sides; session-LRU lifetime
    hist = (
        docs.groupBy(
            "source", F.col("n_chars").cast("long").alias("v")
        )
        .agg(F.count("*").cast("long").alias("cnt"))
        .persist()
    )
    sizes = hist.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n")
    )
    a, b = sizes.alias("a"), sizes.alias("b")
    # CROSSJOIN: |sources|^2/2 ordered source pairs from the
    # |sources|-row sizes dim — inequality NLJ on a dimension-bounded
    # frame (AQE broadcasts the post-agg side)
    pairs = a.join(b, F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
    )
    h = hist.select("source", "v")
    # CROSSJOIN: OR-of-equality NLJ — broadcast side is the SF-free
    # (source, v) histogram key frame; left side is the |sources|^2/2
    # pair dim. Both bounded independently of fact-row count.
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
    # exact DECIMAL(38,0) accumulation (the checksum_modsum class): each
    # term is bounded by n_a*n_b*gap and the total by n_a*n_b*span,
    # which outgrows BIGINT once per-source doc counts reach ~3e7 at a
    # 1e4 length domain — DECIMAL keeps every product and the sum exact
    # to 1e38 (past any 100 TB corpus); DuckDB accumulates integer sums
    # in HUGEINT natively, so both engines hold the same exact value.
    # The BIGINT *emission* is the wire format both downcast from that
    # exact value; under Spark ANSI a result past 2^63 raises loudly
    # rather than wrapping (widen the emission column, not the math,
    # if a corpus ever needs it).
    dec = lambda c: c.cast("decimal(38,0)")
    num = (
        cum.filter(F.col("gap").isNotNull())
        .join(F.broadcast(pairs), ["src_a", "src_b"])
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(
                F.abs(
                    dec(F.col("cum_a")) * dec(F.col("n_b"))
                    - dec(F.col("cum_b")) * dec(F.col("n_a"))
                )
                * dec(F.col("gap"))
            )
            .cast("long")
            .alias("emd_num")
        )
    )
    # denominator = the EXACT integer product n_a*n_b (DECIMAL(38,0)
    # here, HUGEINT in the oracle — neither can overflow at any corpus
    # scale) converted to double ONCE: both engines round the same
    # exact integer to the same double, so the display ratio is the
    # accepted single-round double class at ANY scale, not just below
    # 2^53 (r11 ADVICE — the two denominators are now structurally
    # identical expressions)
    dec2 = lambda c: c.cast("decimal(38,0)")
    return num.join(F.broadcast(pairs), ["src_a", "src_b"]).select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        "emd_num",
        F.round(
            F.col("emd_num")
            / (dec2(F.col("n_a")) * dec2(F.col("n_b"))).cast("double"),
            6,
        ).alias("emd6"),
    )


_COV_KS = (10, 100, 1000)  # vocabulary sizes probed by the coverage curve


@register(
    "vocab_coverage_curve",
    oracle=f"""
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
    """,
    doc="tokenizer-design read: what share of the corpus token mass "
    "the top-K vocabulary entries cover, at K = 10 / 100 / 1000 — the "
    "cumulative companion to zipf_slope_fit. Ranks and cumulative "
    "masses are exact integers (frequency histogram + rank filter); "
    "one ratio per row. Scale: top-maxK FIRST via "
    "TakeOrderedAndProject (map-side partial top-k), THEN rank the "
    "bounded head — a row_number over the full vocabulary would "
    "single-partition-sort a corpus-growing frame (Heaps' law), the "
    "epoch_shuffle_order lesson. Reference has no counterpart.",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    # PERSIST: global vocabulary frequency frame (Heaps-sublinear),
    # read by the 1-row totals agg AND the top-maxK head; session-LRU
    gfreq = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
        .persist()
    )
    tot = gfreq.agg(
        F.sum("cnt").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n_vocab"),
    )
    head = gfreq.orderBy(F.desc("cnt"), "tok").limit(max(_COV_KS))
    w = Window.orderBy(F.desc("cnt"), "tok")
    ranked = head.withColumn("r", F.row_number().over(w))
    ks = spark.createDataFrame([(k,) for k in _COV_KS], "k long")
    # CROSSJOIN: the fixed 3-row k-grid NLJs against the bounded
    # maxK-row ranked head, then the 1-row totals frame fans out —
    # both sides constant-bounded
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


@register(
    "bigram_entropy_stats",
    oracle="""
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
    """,
    doc="per-source conditional bigram entropy H(next | prev) = "
    "(1/N) * sum over bigrams of c_ab * (ln c_a - ln c_ab) — the "
    "language-health read that separates natural text from templated "
    "or shuffled shards. Both logs are over EXACT integer counts, "
    "quantized ONCE to 1e-6 units (the DSIR libm-absorption class); "
    "the weighted sum is exact integer arithmetic; one display ratio "
    "(entropy in nats). Scale: the bigram frame is "
    "vocabulary^2-sublinear (observed bigrams only); the marginal "
    "join is (source, a)-keyed on the persisted count frame — no "
    "second tokenize, no fact re-scan. Reference has no counterpart.",
)
def bigram_entropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    bg = (
        docs.select("source", F.split("text", " ").alias("toks"))
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
    # PERSIST: observed-bigram count frame (vocabulary^2-sublinear,
    # corpus-sublinear), read by the prev-token marginal agg AND the
    # term join; session-LRU lifetime
    cab = bg.groupBy("source", "a", "b").agg(
        F.count("*").cast("long").alias("c_ab")
    ).persist()
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


@register(
    "gini_concentration",
    oracle="""
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
    """,
    doc="per-source Gini coefficient of the doc-length distribution "
    "(is one shard dominated by a few huge documents? — the corpus-"
    "inequality read beside the registered EMD/PSI/KS drift trio). "
    "With lengths ranked ascending 1..n per source, G = (2*sum(rk*x) "
    "- (n+1)*sum(x)) / (n*sum(x)); all three sums are exact integers, "
    "ties are value-invariant (permuting equal x among ranks leaves "
    "sum(rk*x) unchanged — doc_id tie-break pins only the row_number), "
    "and the one display ratio is the accepted single-round class "
    "(+0.0 because a degenerate all-equal source rounds to -0.0 on "
    "neither engine but the guard is house style for negative-capable "
    "rounds). Scale: ONE per-source window sort over documents — the "
    "same dimension-partitioned sort class as the rank suites (plan-"
    "pinned source-partitioned in tests/test_bank_plans.py, no global "
    "exchange). Overflow: sum(rk*x) <= n^2 * max_len, inside BIGINT "
    "while n_docs/source * sqrt(max_len) < 3e9 — beyond the driver "
    "scales; widen to DECIMAL(38,0) (the length_emd_pairs pattern) "
    "before registering past that. Reference has no counterpart.",
)
def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
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


_CHI2_TOP = 20  # fixed top-K token grid for the chi-squared association


@register(
    "chi2_token_source",
    oracle=f"""
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
    """,
    doc=f"chi-squared token-x-source association over the top-"
    f"{_CHI2_TOP} global tokens — the classic feature-selection / "
    "shard-shibboleth statistic (which frequent words are "
    "disproportionately concentrated in one source?). Every "
    "contingency cell contributes ((O*N - R*C)^2)/(N*R*C) INCLUDING "
    "O = 0 cells (fixed top-K x |sources| grid, observed left-joined). "
    "Parity class: d = O*N - R*C is an exact BIGINT; the float term is "
    "ONE fixed IEEE op sequence — (d*d)/((N*R)*C) in doubles — "
    "bit-identical across engines on the same integers, quantized ONCE "
    "to 1e-6 units (half-away floor(x*1e6 + 0.5)) and summed as "
    "INTEGERS, so the cross-source sum has no combine-order drift; the "
    "display chi2 is the exact integer/1e6 division (one identical op, "
    "no re-round — the playbook's quantize-then-integer-sum rule). "
    "Scale: facts reduce to the (token, source) cell frame in one "
    "groupBy (vocabulary x |sources|, Heaps-sublinear); the grid is "
    f"{_CHI2_TOP} x |sources| — SF-free. Overflow: O*N and R*C inside "
    "BIGINT while total_tokens * max_token_count < 9.2e18. Reference "
    "has no counterpart.",
)
def chi2_token_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("t")
    ).filter(F.col("t") != "")
    # PERSIST: (token, source) contingency-cell frame — vocabulary x
    # |sources| rows (Heaps-sublinear in the corpus), read by the
    # row/column/grand-total aggs AND the grid left-join; session-LRU
    cells = tok.groupBy("t", "source").agg(
        F.count("*").cast("long").alias("o")
    ).persist()
    rtot = cells.groupBy("t").agg(F.sum("o").cast("long").alias("r"))
    ctot = cells.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    top = rtot.orderBy(F.desc("r"), "t").limit(_CHI2_TOP)
    # CROSSJOIN: the contingency GRID — fixed top-K token head
    # (TakeOrderedAndProject, K = _CHI2_TOP) x |sources|-row column
    # totals x the 1-row grand total; all three sides bounded
    # independently of data scale, then equi-left-joined to cells
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


@register(
    "ks_exact_pairs",
    oracle="""
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
    """,
    doc="exact two-sample Kolmogorov-Smirnov distance between every "
    "source pair's doc-length distribution — the exact companion of "
    "the binned-KS drift metric in distribution_drift_metrics, on the "
    "length_emd_pairs scaffold (one histogram groupBy, pair-expanded "
    "union support, integer cumulative sums); the statistic is "
    "max|cum_a*n_b - cum_b*n_a| instead of the gap-weighted EMD sum. "
    "KS_num <= n_a*n_b so the integer numerator is exact in BIGINT "
    "while per-source doc counts stay under ~3e9 (past any driver "
    "scale); the display ratio multiplies by 1.0 first on both "
    "engines — one double division of identical exact integers. "
    "Scale: everything after the one fact-scan agg runs on |sources| "
    "x length-domain frames (SF-free once the length domain "
    "saturates); the unpartitioned work is per-PAIR windows over the "
    "union support, never the facts. Reference has no counterpart.",
)
def ks_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # PERSIST: per-source length histogram — |sources| x length-domain
    # rows, SF-free after the one fact-scan agg; read by sizes, the
    # support union, and both cdf sides; session-LRU lifetime
    hist = (
        docs.groupBy("source", F.col("n_chars").cast("long").alias("v"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .persist()
    )
    sizes = hist.groupBy("source").agg(F.sum("cnt").cast("long").alias("n"))
    a, b = sizes.alias("a"), sizes.alias("b")
    # CROSSJOIN: |sources|^2/2 ordered source pairs from the
    # |sources|-row sizes dim — inequality NLJ on a dimension-bounded
    # frame (AQE broadcasts the post-agg side)
    pairs = a.join(b, F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
    )
    h = hist.select("source", "v")
    # CROSSJOIN: OR-of-equality NLJ — broadcast side is the SF-free
    # (source, v) histogram key frame; left side is the |sources|^2/2
    # pair dim. Both bounded independently of fact-row count.
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
    # both cdf sides broadcast: each is the SF-free per-source length
    # histogram (the EMD adjudication)
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
    # pairs re-joins broadcast twice: the |sources|^2/2 pair dim
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


# --------------------------------------------------------------------------
# Round-14 registration: Benford first-digit audit (promoted from
# tests/test_round14_previews.py — the data-quality forensic sibling of
# chi2_token_source / length_emd_pairs in this module's audit family)
# --------------------------------------------------------------------------

# expected Benford shares log10(1 + 1/d) precomputed in Python as
# 1e-6-unit integer LITERALS — the engines never evaluate log10, so
# both compare against identical integers
_BENFORD_U = [
    round(1_000_000 * math.log10(1 + 1 / d)) for d in range(1, 10)
]
_BENFORD_SQL = "[" + ", ".join(str(u) for u in _BENFORD_U) + "]"


@register(
    "benford_first_digit",
    oracle=f"""
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
           ((2 * c.n * 1000000 + t.t) // (2 * t.t)) / 1000000.0 AS share6,
           CAST(({_BENFORD_SQL})[CAST(c.digit AS INT)] AS BIGINT)
               AS benford_u,
           CAST(abs((c.n * 1000000) // t.t
                    - ({_BENFORD_SQL})[CAST(c.digit AS INT)])
                AS BIGINT) AS dev_u
    FROM counts c CROSS JOIN total t
    """,
    doc="Benford's-law first-significant-digit audit of order totals "
    "(the classic fabricated-data forensic): the digit comes from the "
    "EXACT integer cents value rendered as an integer string — float "
    "formatting never touches the data path, so both engines agree on "
    "every digit. Expected shares log10(1 + 1/d) are precomputed in "
    "Python as 1e-6-unit integer literals and the per-digit deviation "
    "dev_u is exact integer floor division; share6 is an integer "
    "half-away 1e-6-unit quantity (never a float round): the corpus "
    "order count t is a GENERIC denominator, but under subsample "
    "perturbation its 2-adic valuation spikes past 7 at ~1/128 rates, "
    "putting n/t on the non-representable 6dp half-boundary grid — "
    "the r14 boundary-hazard class (see interarrival_cv); integer "
    "division closes it. Overflow: 2*n*1e6 < 2^63 to t ~ 4.6e12 "
    "orders. Scale: one "
    "groupBy over orders reduces everything to the fixed 9-digit "
    "frame; the 1-row total broadcasts. Guard: a total in (0, 0.005) "
    "rounds to 0 cents, whose 'first digit' 0 would crash element_at "
    "on one engine and NULL on the other — filtered symmetrically on "
    "the INTEGER cents value before digit extraction. Reference has "
    "no counterpart (its gold KPIs stop at avg/max magnitude, "
    "scripts/process_silver_to_gold.py).",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # guard on the INTEGER cents value, not the raw float (see doc)
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
    benford_arr = F.array(*[F.lit(u) for u in _BENFORD_U])
    bu = F.element_at(benford_arr, F.col("digit").cast("int"))
    # the corpus total rides a window over the FIXED <=9-row digit
    # frame (the epoch_shuffle_ranges bounded-window class) — a
    # separate 1-row aggregate would re-execute the orders scan under
    # its broadcast exchange (caught by the single-scan plan pin)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return counts.withColumn(
        "t", F.sum("n").over(w_all).cast("long")
    ).select(
        "digit",
        "n",
        # integer half-away 1e-6-unit share (see the boundary-hazard
        # note in the doc): never a float round
        (
            F.expr("(2 * n * 1000000 + t) div (2 * t)")
            / F.lit(1_000_000.0)
        ).alias("share6"),
        bu.cast("long").alias("benford_u"),
        F.abs(
            F.expr("(n * 1000000) div t") - bu
        ).cast("long").alias("dev_u"),
    )
