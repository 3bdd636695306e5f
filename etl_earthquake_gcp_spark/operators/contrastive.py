"""Contrastive-training data prep: hard-negative mining (round-7 surface;
library-first so the plan shape is tested before registration).

Embedding-model training (dual encoders, rerankers, CLIP-style heads)
needs, for each anchor, the most-similar corpus items that are NOT the
anchor's class — "hard negatives". The mining query is the exact
cosine-top-k shape with one extra predicate (``label <> anchor_label``),
so it inherits the repo's proven scale plan: the anchor set is broadcast
(training batches mine against a handful of anchors at a time), the
corpus side is scan-only, and the per-anchor top-k is a window over the
6dp-collapsed similarity with an id tie-break — the same engine-portable
ordering contract as ``cosine_topk_bruteforce``
(plans/vector_queries.py:584).

At 100 TB the corpus never shuffles: K anchors ride the broadcast, the
dot products happen in whole-stage codegen (``zip_with`` +
``aggregate``), and each partition emits at most K·k candidate rows
before the final K-partition top-k. For anchor sets too big to
broadcast, pre-bucket both sides with the ANN LSH family
(plans/vector_queries.py:411) and mine within buckets — the predicate
composes unchanged.

No reference counterpart (the reference's ETL ends at a star schema);
this extends the tier-4 LLM-pipeline surface like operators/mixing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cast_double_with_norm


def with_norm_label(emb: DataFrame) -> DataFrame:
    """Canonical cast+norm fold (functions/vectors.py) keeping the
    ``label`` column — the class the negatives must differ on."""
    return cast_double_with_norm(emb, keep=("vec_id", "label"))


def hard_negatives(corpus: DataFrame, anchors: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` highest-cosine corpus rows per anchor with a DIFFERENT
    label.

    ``corpus``: (vec_id, vec double[], norm, label) — the big side,
    scan-only. ``anchors``: (query_id, qvec, qnorm, qlabel) — small,
    broadcast. Zero-norm rows are excluded on BOTH sides (symmetric
    guard — an oracle must filter identically; cosine is undefined
    there).

    Ordering contract: rank by ``round(cos, 6) DESC, vec_id`` so Spark's
    sequential ``zip_with`` fold and an oracle's arbitrary-order SUM
    agree despite last-ulp drift; display cosine at 4dp (same-or-finer
    re-round of a raw double — the accepted ulp class, never the
    coarse-re-round hazard) with the house ``+ 0.0`` guard, since a
    near-zero negative cosine rounds to -0.0 in ANSI engines but +0.0
    in Spark.
    """
    pairs = (
        corpus.filter(F.col("norm") > 0)
        # CROSSJOIN: |anchors|-row query frame — fixed eval-set size, never
        # data-scaled
        .crossJoin(F.broadcast(anchors.filter(F.col("qnorm") > 0)))
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("qlabel"))
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = dot / (F.col("norm") * F.col("qnorm"))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_raw"), 6).desc(), F.col("neighbor_id")
    )
    return (
        pairs.select(
            "query_id",
            F.col("qlabel").cast("long").alias("query_label"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").cast("long").alias("neighbor_label"),
            sim.alias("cos_raw"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            (F.round("cos_raw", 4) + F.lit(0.0)).alias("cosine"),
        )
    )
