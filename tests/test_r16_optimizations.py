"""Round-16 optimization pins: each test locks the plan/value property an
optimization introduced, so a regression resurfaces loudly.

Covers (see OPTIMIZATION_r16.md):
1. jaccard_pairs_bitmask — the quadratic mask NLJ's streamed side is
   round-robin-spread (not a single AQE-coalesced partition).
2. pagerank_3iter — the in-loop rank chain joins the deg table, not the
   full vertex table: exactly ONE vertex-id exchange (the final attach).
3. asof operators — the locally-assembled __rv struct type equals the
   analyzer-derived type it replaced.
4. _lloyd — the buffered in-place distance evaluation is bit-identical to
   the chained-broadcasting reference formula.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

from etl_earthquake_gcp_spark.plans.registry import QUERIES

from .conftest import SF_DIR as TEST_SF_DIR


def _plan(spark, name: str) -> str:
    df = QUERIES[name].spark_fn(spark, TEST_SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_jaccard_mask_nlj_streamed_side_is_spread(spark):
    """The |masks|² popcount NLJ must not run on a single AQE-coalesced
    partition: its streamed side carries an explicit round-robin
    repartition sized by spark.sql.shuffle.partitions (r16 change 1)."""
    plan = _plan(spark, "jaccard_near_dup_pairs")
    assert "BroadcastNestedLoopJoin" in plan  # the documented baseline NLJ
    assert "RoundRobinPartitioning" in plan, plan


def test_pagerank_single_vertex_attach(spark):
    """The iteration loop runs on the deg (src) table; the full vertex
    table is joined exactly once, after the last iteration (r16 change 2).
    Before the change the plan re-exchanged the vertex table once per
    iteration (4 hashpartitioning(id…) exchanges); now exactly one."""
    plan = _plan(spark, "pagerank_3iter")
    # no trailing type suffix in the pattern: a doc_id type change (or a
    # plan-format change dropping the L) must not silently match nothing
    id_exchanges = re.findall(r"hashpartitioning\(id#\d+", plan)
    assert id_exchanges, "no vertex-id exchange found at all — plan changed shape?"
    assert len(set(id_exchanges)) == 1, sorted(set(id_exchanges))


def test_asof_rv_struct_type_matches_analyzer(spark):
    """_rv_struct_type (local schema assembly) must equal the type the
    replaced right.select(rv_struct).schema analysis pass produced."""
    from pyspark.sql import functions as F

    from etl_earthquake_gcp_spark.operators.asof import _rv_struct_type
    from etl_earthquake_gcp_spark.sources.tables import load_table

    ev = load_table(spark, TEST_SF_DIR, "events").withColumn(
        "t_ms", F.unix_millis("ts")
    )
    right = ev.select(
        "user_id",
        "t_ms",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    cols = ["click_id", "click_value"]
    # backward-join variant (no __rt field) — FULL field compare
    # (name, type, nullability), r17 advisor item: nullability drift was
    # unguarded when only (name, dataType) were compared
    analyzed = right.select(
        F.struct(*[F.col(c) for c in cols])
    ).schema[0].dataType
    local = _rv_struct_type(right, cols, with_rt=False)
    assert list(analyzed.fields) == list(local.fields)
    # nearest-join variant (leading __rt long)
    analyzed_rt = right.select(
        F.struct(
            F.col("t_ms").cast("long").alias("__rt"),
            *[F.col(c) for c in cols],
        )
    ).schema[0].dataType
    local_rt = _rv_struct_type(right, cols, with_rt=True, time_col="t_ms")
    assert list(analyzed_rt.fields) == list(local_rt.fields)
    # case-insensitive resolution matches the analyzer's resolver: a
    # differently-cased caller must resolve (not KeyError) and emit the
    # SOURCE field name so both union branches' struct types agree
    local_ci = _rv_struct_type(right, ["CLICK_ID", "Click_Value"], with_rt=False)
    assert list(local_ci.fields) == list(local.fields)


@pytest.mark.parametrize("seed", [3, 42, 1234])
def test_lloyd_bit_identical_to_reference(seed):
    """The r16 buffered/in-place _lloyd evaluates the same expression tree
    as the chained-broadcasting reference — centroids must be bit-equal."""
    from etl_earthquake_gcp_spark.plans.vector_queries import _lloyd

    def lloyd_reference(X, k, rng):
        C = X[rng.choice(len(X), k, replace=False)].copy()
        x2 = (X**2).sum(axis=1)[:, None]
        d = X.shape[1]
        prev = None
        for _ in range(20):
            d2 = x2 + (C**2).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
            a = d2.argmin(axis=1)
            if prev is not None and np.array_equal(a, prev):
                break
            prev = a
            counts = np.bincount(a, minlength=k)
            sums = np.empty((k, d))
            for j in range(d):
                sums[:, j] = np.bincount(a, weights=X[:, j], minlength=k)
            nz = counts > 0
            C[nz] = sums[nz] / counts[nz, None]
        return C

    rng = np.random.default_rng(seed)
    X = rng.standard_normal((800, 8)) * 2.5 + 0.7
    ref = lloyd_reference(X, 128, np.random.default_rng(42))
    new = _lloyd(X, 128, np.random.default_rng(42))
    assert np.array_equal(ref, new)
