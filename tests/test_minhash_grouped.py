"""The distinct-mask MinHash fast path must be row-identical to the generic
doc-space implementation (it serves the same oracle)."""

from __future__ import annotations

from etl_earthquake_gcp_spark.operators.dedup import (
    minhash_band_pairs,
    minhash_band_pairs_grouped,
)
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_grouped_equals_generic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    generic = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_band_pairs(docs).collect()
    }
    grouped = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_band_pairs_grouped(docs).collect()
    }
    assert generic == grouped
    assert generic  # non-trivial corpus: the comparison must cover real pairs


def test_bitmask_vocab_guard_raises_past_64_tokens(spark):
    """>64 distinct tokens would silently wrap shiftleft's shift amount mod
    64 and alias bit positions; the assert_true guard turns that into a
    loud error pointing at minhash_band_pairs_open."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from etl_earthquake_gcp_spark.operators.dedup import doc_bitmasks, tokenize_distinct, token_dictionary

    docs = spark.createDataFrame(
        [(0, " ".join(f"tok{i}" for i in range(70)))], "doc_id long, text string"
    )
    # default path: eager driver-side vocabulary check
    with pytest.raises(ValueError, match="64-token"):
        doc_bitmasks(docs)
    # precomputed-tids path: runtime assert_true inside the aggregation
    tok = tokenize_distinct(docs)
    tids = tok.join(token_dictionary(tok), "token")
    with pytest.raises(SparkRuntimeException, match="64-token"):
        doc_bitmasks(docs, tids=tids).collect()


def test_salted_join_rejects_outer_joins(spark):
    import pytest

    from etl_earthquake_gcp_spark.operators.skew import salted_join

    big = spark.range(10).selectExpr("id AS k", "id AS v")
    small = spark.range(3).selectExpr("id AS k")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(big, small, "k", how="full")
    # allowed types still work
    assert salted_join(big, small, "k", how="left_semi").count() == 3


def test_distributed_dictionary_ids_match_global_sort(spark):
    """token_dictionary_distributed must produce BIT-IDENTICAL ids to the
    single-partition token_dictionary (global rank is invariant to where
    the sampled range boundaries fall), so both share one oracle."""
    from etl_earthquake_gcp_spark.operators.dedup import (
        token_dictionary,
        token_dictionary_distributed,
        tokenize_distinct,
    )
    from etl_earthquake_gcp_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    tok = tokenize_distinct(docs)
    a = {r.token: r.tid for r in token_dictionary(tok).collect()}
    b = {r.token: r.tid for r in token_dictionary_distributed(tok, n_parts=7).collect()}
    assert a == b and len(a) > 0
    spark.catalog.clearCache()
