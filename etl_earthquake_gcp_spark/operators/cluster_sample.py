"""Cluster-balanced corpus sampling (round-7 surface; library-first so
the plan shapes are tested before registration).

The DCLM / cluster-dedup curation move: partition the corpus by
embedding-space cluster, then cap each cluster's contribution so a few
dense regions (boilerplate, templated text) can't dominate the training
mix. Two composable pieces:

- **assign_to_centroids**: nearest-centroid assignment by cosine. The
  centroid table is broadcast (even "large" real-world codebooks are
  ~1e5 rows — dim-sized, not fact-sized); ``zip_with`` dot products run
  in whole-stage codegen, and the per-vector argmax is a
  map-side-combinable ``max_by`` groupBy — partial aggregation
  collapses each partition's K candidate rows per vector BEFORE the
  exchange, so the one shuffle carries a single row per corpus vector
  (a window argmax would shuffle all N·K candidates). The argmax key is
  the 6dp-collapsed similarity with a centroid-id tie-break — the
  engine-portable ordering contract used by every similarity query in
  this repo.

- **quota_sample**: keep at most ``quota`` members per cluster,
  selected by ``portable_hash8(vec_id)`` rank — deterministic,
  seed-free, and exactly replayable by an ANSI oracle (no rand(), no
  driver round-trip). One shuffle on cluster_id.

Scale note: quota_sample's rank window partitions by cluster_id, so the
reducer parallelism equals the number of clusters. That is the correct
shape when K scales with the corpus (real pipelines use 1e4-1e5
clusters → ample partitions); for a pathological few-huge-clusters case
the hash-threshold refinement applies (take rows with hash below an
approxQuantile cutoff, then exact-rank only the boundary) — same
two-phase trick as the repo's equidepth histogram.

No reference counterpart (the reference's ETL ends at a star schema);
this extends the tier-4 LLM-pipeline surface like operators/mixing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import portable_hash8


def assign_to_centroids(corpus: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid (max-cosine) assignment.

    ``corpus``: (vec_id, vec double[], norm) — the big side, scan-only.
    ``centroids``: (cluster_id, cvec, cnorm) — tiny, broadcast.
    Zero-norm rows are excluded on BOTH sides (symmetric guard; cosine
    is undefined there). The argmax is a ``max_by`` over the key
    ``(round(cos, 6), -cluster_id)`` — ties after the 6dp similarity
    collapse break on the LOWEST cluster_id, and the key is unique per
    candidate (cluster_id is), so Spark's sequential fold and an
    oracle's arbitrary-order SUM pick the same winner deterministically.

    Returns one row per corpus vector: (vec_id, cluster_id,
    cos_raw) — cos_raw is the unrounded winning similarity; callers
    round for display.
    """
    pairs = (
        corpus.filter(F.col("norm") > 0)
        # CROSSJOIN: |centroids|-row frame — fixed model size, never data-
        # scaled
        .crossJoin(F.broadcast(centroids.filter(F.col("cnorm") > 0)))
    )
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("cvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = dot / (F.col("norm") * F.col("cnorm"))
    key = F.struct(
        F.round(F.col("cos_raw"), 6).alias("s"),
        (-F.col("cluster_id")).alias("nc"),
    )
    return (
        pairs.select("vec_id", "cluster_id", sim.alias("cos_raw"))
        .groupBy("vec_id")
        .agg(
            F.max_by("cluster_id", key).alias("cluster_id"),
            F.max_by("cos_raw", key).alias("cos_raw"),
        )
    )


def quota_sample(
    assigned: DataFrame, quota: int, id_col: str = "vec_id"
) -> DataFrame:
    """Cap each cluster at ``quota`` members, chosen by deterministic
    hash rank.

    Input: (id_col, cluster_id, ...). Adds ``keep_key`` =
    ``portable_hash8(id)`` and ``kept`` — true for the ``quota``
    lowest-keyed members of each cluster (ties broken on the id, robust
    to the ~2^-32 8-hex-digit collision). Keeping ALL rows with a flag
    (rather than filtering) lets callers audit what was dropped and
    lets the oracle replay both populations.
    """
    key = portable_hash8(F.col(id_col))
    w = Window.partitionBy("cluster_id").orderBy("keep_key", id_col)
    return (
        assigned.withColumn("keep_key", key)
        .withColumn("rnk", F.row_number().over(w))
        .withColumn("kept", F.col("rnk") <= quota)
        .drop("rnk")
    )


def cluster_quota_summary(sampled: DataFrame) -> DataFrame:
    """Per-cluster audit of a quota_sample result: assigned count, kept
    count, and the integer sum of kept members' hash keys — a set
    checksum that certifies the EXACT kept membership (not just its
    size) in an order-insensitive, oracle-replayable way. The sum is
    bounded by quota * HASH_P (< quota * 2^31): BIGINT-safe for any
    quota < 2^31, because the kept set is quota-capped per cluster —
    unlike corpus-scale membership checksums, which use the modular
    decimal sum (scalar.checksum_modsum; see bpe.induce_and_encode,
    mixing.epoch_order_ranges)."""
    return sampled.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("n_assigned"),
        F.sum(F.col("kept").cast("long")).cast("long").alias("n_kept"),
        F.sum(
            F.when(F.col("kept"), F.col("keep_key")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("kept_key_sum"),
    )
