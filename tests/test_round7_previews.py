"""Round-7 registrations (promoted from the rounds-5/6 preview bank):
the six curation surfaces now live in plans/curation_queries.py as
registered driver pairs. These tests exercise the REGISTERED pair (the
exact objects the driver sees) plus the domain asserts and library unit
pins the generic oracle-parity sweep does not check.
"""

from __future__ import annotations

import pytest

from etl_earthquake_gcp_spark.operators import bpe, cluster_sample, winnowing
from etl_earthquake_gcp_spark.plans import QUERIES
from etl_earthquake_gcp_spark.plans.curation_queries import (
    BPE_K,
    DSIR_MOD,
    DSIR_TOPN,
    N_ANCHORS,
    NEG_K,
    QUOTA,
    RRF_TOPN,
    WIN_K,
    WIN_MIN_SHARED,
    WIN_W,
)
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR
from .conftest import run_registered_pair as _run_pair

# registered query callables (also imported by tests/test_bank_plans.py)
hard_negative_mining = QUERIES["hard_negative_mining"].spark_fn
cluster_quota_sample = QUERIES["cluster_quota_sample"].spark_fn



# -- hard_negative_mining ----------------------------------------------------


def test_hard_negative_mining_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "hard_negative_mining")
    assert len(spdf) == N_ANCHORS * NEG_K
    # the defining property: no negative shares its anchor's label
    assert (spdf["query_label"] != spdf["neighbor_label"]).all()


# -- cluster_quota_sample ----------------------------------------------------


def test_cluster_quota_sample_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "cluster_quota_sample")
    assert len(spdf) > 0
    # quota binds: no cluster keeps more than QUOTA, every vector assigned once
    assert (spdf["n_kept"] <= QUOTA).all()
    assert (spdf["n_kept"] <= spdf["n_assigned"]).all()


def test_quota_sample_keeps_lowest_hash_members(spark):
    """Unit check on the library piece alone: the kept set per cluster is
    exactly the quota lowest (keep_key, id) members."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id")
    assigned = emb.withColumn("cluster_id", F.pmod("vec_id", F.lit(4)))
    out = cluster_sample.quota_sample(assigned, quota=5).toPandas()
    for _, grp in out.groupby("cluster_id"):
        ordered = grp.sort_values(["keep_key", "vec_id"])
        expect = set(ordered.head(5)["vec_id"])
        assert set(grp[grp["kept"]]["vec_id"]) == expect


# -- bpe_merge_induction -----------------------------------------------------


def test_bpe_merge_induction_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "bpe_merge_induction")
    assert len(spdf) == BPE_K
    # counts are non-increasing: each merge removes the current max pair
    cnts = spdf.sort_values("iter")["pair_count"].tolist()
    assert cnts == sorted(cnts, reverse=True)


def test_bpe_rejects_joiner_and_irregular_spacing(spark):
    """r5 ADVICE: a literal '_' token (or irregular spacing) in the
    INPUT corpus would silently conflate merge-produced pairs — the
    up-front guard must refuse it loudly."""
    for bad_text in (
        "a_b c", "a  b", " a b", "a b ", None,
        # r6 ADVICE: non-space whitespace and empty strings must also
        # fail — they'd be silently treated as part of a single token
        "a\tb c", "a\nb", "a\u00a0b", "",
    ):
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


def test_dsir_importance_weights_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "dsir_importance_weights")
    assert len(spdf) == DSIR_TOPN
    # raw pool only: no target-residue doc may be selected
    assert (spdf["doc_id"] % DSIR_MOD != 0).all()


# -- winnowing_match_pairs ---------------------------------------------------


def test_winnowing_match_pairs_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "winnowing_match_pairs")
    assert (spdf["n_shared"] >= WIN_MIN_SHARED).all()


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
    fps = winnowing.fingerprints(df, k=WIN_K, w=WIN_W).toPandas()
    s1 = set(fps[fps.doc_id == 1]["fp"])
    s2 = set(fps[fps.doc_id == 2]["fp"])
    s3 = set(fps[fps.doc_id == 3]["fp"])
    assert s1 & s2, "planted overlap must share a fingerprint"
    assert not (s1 & s3) and not (s2 & s3)


# -- rrf_fusion_topk ---------------------------------------------------------


def test_rrf_fusion_topk_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "rrf_fusion_topk")
    assert len(spdf) == N_ANCHORS * RRF_TOPN
    # every fused winner appears in at least one list; both-list items
    # carry two terms
    assert spdf["n_lists"].isin([1, 2]).all()
