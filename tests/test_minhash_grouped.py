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
