"""Round-8 registrations (promoted from the rounds-6/7 preview bank):
the two calibration surfaces now live in plans/calibration_queries.py,
the fertility evaluation in plans/curation_queries.py, and the three
mixing/sampling surfaces in plans/mixing_queries.py as registered
driver pairs. These tests exercise the REGISTERED pair (the exact
objects the driver sees) plus the domain asserts and library unit pins
the generic oracle-parity sweep does not check.
"""

from __future__ import annotations

import pandas as pd

from etl_earthquake_gcp_spark.operators import mixing, sampling
from etl_earthquake_gcp_spark.plans import QUERIES
from etl_earthquake_gcp_spark.plans.mixing_queries import (
    ESR_B,
    ESR_EPOCH,
    WS_N,
)
from etl_earthquake_gcp_spark.sources.tables import load_table
from pyspark.sql import functions as F

from .conftest import SF_DIR
from .conftest import run_registered_pair as _run_pair

# registered query callables (also imported by tests/test_bank_plans.py)
quantile_normalize_scores = QUERIES["quantile_normalize_scores"].spark_fn
bpe_fertility_stats = QUERIES["bpe_fertility_stats"].spark_fn
top_p_token_budget = QUERIES["top_p_token_budget"].spark_fn
weighted_sample_docs = QUERIES["weighted_sample_docs"].spark_fn
robust_scale_mad = QUERIES["robust_scale_mad"].spark_fn
epoch_shuffle_ranges = QUERIES["epoch_shuffle_ranges"].spark_fn


# -- quantile_normalize_scores -----------------------------------------------


def test_quantile_normalize_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "quantile_normalize_scores")
    n_docs = oracle.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(spdf) == n_docs  # selection always lands: one row per doc


def test_quantile_normalize_invariants(spark):
    pdf = quantile_normalize_scores(spark, SF_DIR).toPandas()
    assert ((pdf["q6"] > 0) & (pdf["q6"] < 1)).all()
    # within a source, calibration is monotone in the raw score
    for _, grp in pdf.groupby("source"):
        g = grp.sort_values(["score", "doc_id"])
        assert g["calib_score"].is_monotonic_increasing
    # the calibrated values are actual corpus scores (a selection,
    # never an interpolation)
    assert set(pdf["calib_score"]) <= set(pdf["score"])


# -- bpe_fertility_stats -----------------------------------------------------


def test_bpe_fertility_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "bpe_fertility_stats")
    # every merge only ever shrinks the token stream
    assert (spdf["tok_after"] <= spdf["tok_before"]).all()
    assert (spdf["compression6"] <= 1.0).all()


# -- top_p_token_budget ------------------------------------------------------


def test_top_p_token_budget_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "top_p_token_budget")
    # the kept prefix always covers the budget, never the whole source
    assert (spdf["chars_kept"] >= spdf["budget"]).all()
    assert (spdf["chars_kept"] <= spdf["total_chars"]).all()


# -- weighted_sample_docs ----------------------------------------------------


def test_weighted_sample_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "weighted_sample_docs")
    assert len(spdf) == WS_N
    assert (spdf["key_n"] < 0).all()  # u < 1 by construction


def test_portable_uniform_negative_ids_and_range(spark):
    """r5 ADVICE regressions: a negative id must still hash into (0, 1]
    (the pre-fix truncated % gave u <= 0 and NULLed the ln-key), and the
    multiply-add second round must populate keys for every row."""
    df = spark.createDataFrame(
        [(-5, 10), (-1, 10), (0, 10), (7, 10), (2**40, 10)],
        "doc_id long, w long",
    )
    keyed = sampling.es_sample_keys(df, "w", "doc_id").toPandas()
    assert len(keyed) == 5
    assert keyed["key_n"].notna().all()
    assert (keyed["key_n"] < 0).all()  # ln(u) < 0 for u < 1


def test_weighted_sample_biases_toward_heavy_docs(spark):
    """The point of weighting: the sampled mean weight exceeds the
    corpus mean (verified to hold under this deterministic hash at
    sf0.001 and sf0.01)."""
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select(F.col("n_chars").cast("long").alias("w"))
        .toPandas()
    )
    samp = weighted_sample_docs(spark, SF_DIR).toPandas()
    assert samp["w"].mean() > docs["w"].mean()


# -- robust_scale_mad --------------------------------------------------------


def test_robust_scale_mad_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "robust_scale_mad")
    assert (spdf["mad"] >= 0).all()
    # a median is a corpus value, so at most half the group sits
    # strictly below it
    assert (spdf["n_outliers"] < spdf["n_docs"]).all()


# -- epoch_shuffle_ranges ----------------------------------------------------


def test_epoch_shuffle_ranges_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "epoch_shuffle_ranges")
    # the certificate's own invariants: every bucket's keys inside its
    # closed-form bounds (disjointness + order), positions partition the
    # corpus exactly
    assert bool(spdf["in_bounds"].all())
    spdf = spdf.sort_values("bucket_id", ignore_index=True)
    assert (
        spdf["cum_start"] == spdf["n_docs"].cumsum() - spdf["n_docs"]
    ).all()


def test_epoch_ranges_agree_with_full_epoch_order(spark):
    """Cross-check against the registered epoch_shuffle_order sibling:
    bucketed cum_start positions must equal the global-sort row_number
    positions of each bucket's first element (proving the certificate
    describes the same total order epoch_order materializes)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    full = (
        mixing.epoch_order(docs, epoch=ESR_EPOCH)
        .toPandas()
        .sort_values(["shuffle_key", "doc_id"], ignore_index=True)
    )
    full["pos"] = range(len(full))
    full["bucket_id"] = (full["shuffle_key"] * ESR_B) // (2**32)
    first_pos = full.groupby("bucket_id")["pos"].min()
    ranges = (
        epoch_shuffle_ranges(spark, SF_DIR).toPandas().set_index("bucket_id")
    )
    pd.testing.assert_series_equal(
        ranges["cum_start"].sort_index(),
        first_pos.sort_index().astype("int64"),
        check_names=False,
    )
