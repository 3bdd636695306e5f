"""Differential tests: every registered oracle-backed query must match DuckDB
exactly (SURVEY.md §5.1) — the local, stricter mirror of the driver's
CORRECTNESS gate, run at sf0.001 for speed."""

from __future__ import annotations

import pytest

from etl_earthquake_gcp_spark import plans

from .conftest import SF_DIR, assert_frames_match

ORACLE_QUERIES = sorted(n for n, q in plans.QUERIES.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in plans.QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, oracle, name):
    q = plans.QUERIES[name]
    spark_pdf = q.spark_fn(spark, SF_DIR).toPandas()
    oracle_pdf = oracle.execute(q.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    q = plans.QUERIES[name]
    df = q.spark_fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
