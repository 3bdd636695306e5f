"""Product-quantization ANN: recall vs the exact answer + determinism.

The two-stage shape (ADC shortlist -> exact re-rank) must keep every
returned neighbor inside the true top-10 and recover most of the true
top-3 — on the near-random synthetic corpus, raw ADC alone cannot (its
quantization error is the size of the similarity signal), which is exactly
why the refine stage exists.
"""

from __future__ import annotations

import numpy as np

from etl_earthquake_gcp_spark.plans import QUERIES
from etl_earthquake_gcp_spark.plans.vector_queries import _with_norm
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR


def _truth(spark):
    rows = _with_norm(load_table(spark, SF_DIR, "embeddings")).collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.vec for r in rows])
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    C = V @ V.T
    np.fill_diagonal(C, -2)
    return ids, C


def test_pq_recall_vs_bruteforce(spark):
    got = QUERIES["pq_adc_topk"].spark_fn(spark, SF_DIR).collect()
    ids, C = _truth(spark)
    top3_hits = in_top10 = total = 0
    for q in range(5):
        mine = [r.neighbor_id for r in got if r.query_id == q]
        assert len(mine) == 3, (q, mine)
        top3_hits += len(set(mine) & set(ids[np.argsort(-C[q])[:3]]))
        in_top10 += len(set(mine) & set(ids[np.argsort(-C[q])[:10]]))
        total += 3
    assert in_top10 / total >= 0.9, f"{in_top10}/{total} inside true top-10"
    assert top3_hits / total >= 0.8, f"{top3_hits}/{total} exact top-3 recall"


def test_pq_deterministic(spark):
    a = sorted(
        map(tuple, QUERIES["pq_adc_topk"].spark_fn(spark, SF_DIR).collect())
    )
    b = sorted(
        map(tuple, QUERIES["pq_adc_topk"].spark_fn(spark, SF_DIR).collect())
    )
    assert a == b


def test_ivfpq_recall_vs_bruteforce(spark):
    """IVF-PQ (coarse cells + residual codes + ADC + refine) must keep its
    returned neighbors inside the true top-10 despite probing only
    4/16 cells."""
    got = QUERIES["ivf_pq_topk"].spark_fn(spark, SF_DIR).collect()
    ids, C = _truth(spark)
    in_top10 = total = 0
    for q in range(5):
        mine = [r.neighbor_id for r in got if r.query_id == q]
        assert len(mine) == 3, (q, mine)
        in_top10 += len(set(mine) & set(ids[np.argsort(-C[q])[:10]]))
        total += 3
    assert in_top10 / total >= 0.8, f"{in_top10}/{total} inside true top-10"


def test_ivfpq_deterministic(spark):
    a = sorted(
        map(tuple, QUERIES["ivf_pq_topk"].spark_fn(spark, SF_DIR).collect())
    )
    b = sorted(
        map(tuple, QUERIES["ivf_pq_topk"].spark_fn(spark, SF_DIR).collect())
    )
    assert a == b
