"""LSH near-pair mining: recall on planted near-duplicates + candidate-count
scale guard (r2 VERDICT item 4 — the 16-bucket parameterization was ~n²/16;
the 2^20-bucket multiprobe design must stay sub-quadratic AND high-recall)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.plans.vector_queries import (
    _LSH_PLANES,
    _LSH_TABLES,
    _with_norm,
    lsh_near_pairs,
)
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR

N_PLANTED = 25
PLANT_COS = 0.95


def _planted_corpus(spark):
    """Real embeddings + N_PLANTED near-duplicates at cosine ≈ PLANT_COS.

    The synthetic corpus is near-random (max pairwise cos ≈ 0.51), so the
    planted pairs are the only high-similarity structure — the regime the
    operator exists for.
    """
    base = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    rows = base.collect()
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    U = V / np.linalg.norm(V, axis=1, keepdims=True)

    rng = np.random.default_rng(7)
    idx = rng.choice(len(U), N_PLANTED, replace=False)
    noise = rng.normal(0, 1, (N_PLANTED, U.shape[1]))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    planted = PLANT_COS * U[idx] + np.sqrt(1 - PLANT_COS**2) * noise
    planted /= np.linalg.norm(planted, axis=1, keepdims=True)

    next_id = int(ids.max()) + 1
    extra = [
        (next_id + a, [float(x) for x in planted[a]]) for a in range(N_PLANTED)
    ]
    expected_pairs = {
        (min(int(ids[i]), next_id + a), max(int(ids[i]), next_id + a))
        for a, i in enumerate(idx)
    }
    extra_df = spark.createDataFrame(
        extra, "vec_id long, embedding array<float>"
    )
    corpus = base.unionByName(extra_df)
    return corpus, expected_pairs, len(rows) + N_PLANTED


@pytest.fixture(scope="module")
def planted(spark):
    return _planted_corpus(spark)


def test_recall_on_planted_near_dups(spark, planted):
    corpus, expected_pairs, _ = planted
    rows = lsh_near_pairs(_with_norm(corpus), threshold=0.8).collect()
    got = {(r.vec_a, r.vec_b) for r in rows}
    hits = len(got & expected_pairs)
    recall = hits / len(expected_pairs)
    assert recall >= 0.9, f"recall {hits}/{len(expected_pairs)}"
    # exact verify: every surviving pair really is >= the threshold
    assert all(r.cosine >= 0.8 for r in rows)


def test_candidate_count_far_below_quadratic(spark, planted):
    corpus, _, n = planted
    # threshold 0 == the raw collided-candidate set (post exact verify the
    # filter keeps everything with cosine >= 0; cosines here are ±0.6 max
    # except planted pairs, so use -1.0 to disable the verify filter)
    cand = lsh_near_pairs(_with_norm(corpus), threshold=-1.0).count()
    all_pairs = n * (n - 1) / 2
    # hash-uniform expectation: L·(k+1)·n²/2^k ≈ 0.0001·n² at k=20, L=6;
    # allow 100× slack for the non-uniform synthetic corpus — still ≪ n²
    assert cand < 0.02 * all_pairs, f"{cand} candidates vs {all_pairs} pairs"


def test_registered_query_runs_nonempty_schema(spark):
    from etl_earthquake_gcp_spark.plans import QUERIES

    df = QUERIES["ann_lsh_bucketed"].spark_fn(spark, SF_DIR)
    assert [f.name for f in df.schema.fields] == ["vec_a", "vec_b", "cosine"]
    assert df.count() >= 0  # rows-only surface: runs clean at any sf
