"""IVF ANN: structural checks + recall against the exact brute-force answer."""

from __future__ import annotations

from etl_earthquake_gcp_spark.plans import QUERIES

from .conftest import SF_DIR


def _topk_sets(rows):
    by_q: dict[int, set[int]] = {}
    for r in rows:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    return by_q


def test_ivf_recall_vs_bruteforce(spark):
    exact = _topk_sets(QUERIES["cosine_topk_bruteforce"].spark_fn(spark, SF_DIR).collect())
    ivf = _topk_sets(QUERIES["ann_ivf_topk"].spark_fn(spark, SF_DIR).collect())
    assert ivf.keys() == exact.keys()
    hits = sum(len(ivf[q] & exact[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    # 4/16 cells probed on near-random vectors: recall well above the 25%
    # random-probe floor proves the quantizer concentrates true neighbors
    assert hits / total >= 0.4, f"recall {hits}/{total}"
    # every query returns exactly k results (probed cells are never empty here)
    assert all(len(v) == 3 for v in ivf.values())
