"""Round-6 registrations (promoted from the round-5 preview bank): the
three mixing/quantize surfaces now live in plans/mixing_queries.py as
registered driver pairs. These tests exercise the REGISTERED pair (the
exact objects the driver sees) plus the domain asserts the generic
oracle-parity sweep does not check (head size, error bound).
"""

from __future__ import annotations

import duckdb

from etl_earthquake_gcp_spark.plans import QUERIES

from .conftest import SF_DIR, assert_frames_match


def _run_pair(spark, name):
    q = QUERIES[name]
    spdf = q.spark_fn(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF_DIR}/{t}.parquet')"
        )
    opdf = con.execute(q.oracle).df()
    assert_frames_match(spdf, opdf, name)
    return spdf


def test_temperature_mix_weights_oracle_parity(spark):
    spdf = _run_pair(spark, "temperature_mix_weights")
    assert len(spdf) > 0
    # temperature < 1 up-weights small sources: every oversample factor
    # for a below-average source must be >= 1 (and the shares normalize)
    assert abs(spdf["weight"].sum() - 1.0) < 1e-4
    assert abs(spdf["raw_share"].sum() - 1.0) < 1e-4


def test_epoch_shuffle_order_oracle_parity(spark):
    from etl_earthquake_gcp_spark.plans.mixing_queries import SHUFFLE_HEAD

    spdf = _run_pair(spark, "epoch_shuffle_order")
    assert len(spdf) == SHUFFLE_HEAD


def test_embedding_int8_quantize_oracle_parity(spark):
    spdf = _run_pair(spark, "embedding_int8_quantize")
    assert bool(spdf["err_bounded"].all())
    assert (spdf["max_code"] <= 127).all()
