"""Round-9 registrations (promoted from the round-9 preview bank):
the stratified-split surface now lives in plans/mixing_queries.py and
the four corpus-audit surfaces (source-overlap MinHash, Zipf slope,
n-gram novelty, lexical diversity) in plans/curation_queries.py as
registered driver pairs. These tests exercise the REGISTERED pair (the
exact objects the driver sees) plus the domain asserts the generic
oracle-parity sweep does not check.
"""

from __future__ import annotations

from etl_earthquake_gcp_spark.plans import QUERIES
from etl_earthquake_gcp_spark.plans.mixing_queries import SPLIT_SPEC

from .conftest import SF_DIR
from .conftest import run_registered_pair as _run_pair

# registered query callables (also imported by tests/test_bank_plans.py)
exact_stratified_split = QUERIES["exact_stratified_split"].spark_fn
source_overlap_minhash = QUERIES["source_overlap_minhash"].spark_fn
zipf_slope_fit = QUERIES["zipf_slope_fit"].spark_fn
doc_novelty_ngram = QUERIES["doc_novelty_ngram"].spark_fn
lexical_diversity_stats = QUERIES["lexical_diversity_stats"].spark_fn


# -- exact_stratified_split --------------------------------------------------


def test_stratified_split_oracle_parity(spark, oracle):
    _run_pair(spark, oracle, "exact_stratified_split")


def test_stratified_split_exact_proportions(spark):
    pdf = exact_stratified_split(spark, SF_DIR).toPandas()
    pv = pdf.pivot_table(
        index="source", columns="split", values="n_docs", fill_value=0
    )
    n = pv.sum(axis=1)
    # Hamilton exactness: quotas sum to the stratum size and each split
    # is within one row of its exact share
    for name, w in SPLIT_SPEC:
        assert (abs(pv[name] - w * n) < 1).all()


# -- source_overlap_minhash --------------------------------------------------


def test_source_overlap_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "source_overlap_minhash")
    n_src = spdf[["src_a", "src_b"]].stack().nunique()
    assert len(spdf) == n_src * (n_src - 1) // 2  # every pair present


# -- zipf_slope_fit ----------------------------------------------------------


def test_zipf_slope_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "zipf_slope_fit")
    # token frequencies never GROW with rank (exactly 0 only for a
    # degenerate source whose top-R counts are all equal)
    assert (spdf["slope6"] <= 0).all()


# -- doc_novelty_ngram -------------------------------------------------------


def test_doc_novelty_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "doc_novelty_ngram")
    assert (spdf["n_shared"] <= spdf["n_grams"]).all()
    assert ((spdf["shared6"] >= 0) & (spdf["shared6"] <= 1)).all()


# -- lexical_diversity_stats -------------------------------------------------


def test_lexical_diversity_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "lexical_diversity_stats")
    assert (spdf["n_hapax"] <= spdf["n_types"]).all()
    assert (spdf["n_types"] <= spdf["n_tokens"]).all()
