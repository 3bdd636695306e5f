"""Property tests for the round-4 second-wave operators — semantic
invariants the oracle-parity hash can't express (diversity, sketch
theorems, reassembly identity, split disjointness, interpolation bounds).
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np

from etl_earthquake_gcp_spark.plans import QUERIES
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR


def _embeddings(spark):
    rows = load_table(spark, SF_DIR, "embeddings").collect()
    return {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}


def _cos(a, b):
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_mmr_diversifies_vs_plain_topk(spark):
    """The MMR set must be no LESS diverse (mean pairwise cosine no higher)
    than the plain relevance top-k, and its rank-1 pick must be the single
    most relevant candidate."""
    emb = _embeddings(spark)
    mmr = QUERIES["mmr_diversified_topk"].spark_fn(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in sorted(mmr, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.vec_id)
    assert len(by_q) == 5
    for qid, picked in by_q.items():
        q = emb[qid]
        rel = sorted(
            ((round(_cos(q, v), 6), -vid) for vid, v in emb.items() if vid != qid),
            reverse=True,
        )
        topk_ids = [-nid for _, nid in rel[: len(picked)]]
        # rank-1 = arg-max relevance (ties to smaller id)
        assert picked[0] == topk_ids[0]

        def mean_pairwise(ids):
            sims = [
                _cos(emb[a], emb[b]) for a, b in itertools.combinations(ids, 2)
            ]
            return sum(sims) / len(sims)

        assert mean_pairwise(picked) <= mean_pairwise(topk_ids) + 1e-9


def test_heavy_hitter_theorems_and_exactness(spark):
    """Bound/underestimate booleans must hold, and the top-1 token's
    estimate must be within err_bound of an independently computed truth."""
    rows = QUERIES["heavy_hitters_mergeable"].spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    docs = load_table(spark, SF_DIR, "documents").collect()
    true_counts: dict[str, int] = {}
    for d in docs:
        for t in d.text.split(" "):
            true_counts[t] = true_counts.get(t, 0) + 1
    for r in rows:
        assert r.err_le_bound and r.is_underestimate
        assert r.true_count == true_counts[r.token]
        assert 0 <= r.true_count - r.est <= r.err_bound


def test_segment_rewrite_identity_when_clean(spark):
    """Docs with n_dropped == 0 must reassemble to EXACTLY their original
    text (md5-certified): splitting into 3-token slices and rejoining is
    the identity on a single-space-delimited corpus."""
    out = QUERIES["segment_dedup_rewrite"].spark_fn(spark, SF_DIR).collect()
    texts = {
        d.doc_id: d.text for d in load_table(spark, SF_DIR, "documents").collect()
    }
    clean = [r for r in out if r.n_dropped == 0]
    dirty = [r for r in out if r.n_dropped > 0]
    assert clean and dirty  # corpus exercises both paths
    for r in clean:
        assert r.rewrite_md5 == hashlib.md5(texts[r.doc_id].encode()).hexdigest()
        assert r.new_len == len(texts[r.doc_id])
    for r in dirty:
        assert r.new_len < len(texts[r.doc_id])


def test_group_split_is_disjoint_and_total(spark):
    """Every source lands in exactly one split; counts cover the corpus."""
    out = QUERIES["group_shuffle_split"].spark_fn(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    assert sum(r.n_docs for r in out) == docs.count()
    n_sources = docs.select("source").distinct().count()
    assert sum(r.n_groups for r in out) == n_sources  # disjoint cover


def test_decontaminate_matches_bruteforce(spark):
    """Flagged set == numpy brute-force max-cosine >= threshold."""
    emb = _embeddings(spark)
    ev = {i: v for i, v in emb.items() if i % 97 == 0}
    tr = {i: v for i, v in emb.items() if i % 97 != 0}
    expect = {
        i for i, v in tr.items() if max(_cos(v, e) for e in ev.values()) >= 0.30
    }
    got = {
        r.train_id
        for r in QUERIES["decontaminate_by_embedding"].spark_fn(spark, SF_DIR).collect()
    }
    assert got == expect


def test_interpolation_bounded_by_neighbors(spark):
    """Interpolated values lie within [min, max] of the two anchor values;
    observed days are passed through."""
    rows = QUERIES["interpolate_linear_gaps"].spark_fn(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.day)):
        by_user.setdefault(r.user_id, []).append(r)
    n_interp = 0
    for series in by_user.values():
        obs_idx = [i for i, r in enumerate(series) if not r.is_interpolated]
        assert obs_idx[0] == 0 and obs_idx[-1] == len(series) - 1  # edges observed
        for a, b in zip(obs_idx, obs_idx[1:]):
            lo = min(series[a].value_filled, series[b].value_filled)
            hi = max(series[a].value_filled, series[b].value_filled)
            for i in range(a + 1, b):
                n_interp += 1
                assert lo - 1e-6 <= series[i].value_filled <= hi + 1e-6
    assert n_interp > 0
