"""Round-8 weak-retirement surfaces: the scale-safe siblings of the two
global-sort analytics queries (r7 VERDICT items #1/#2).

`pareto_revenue_share_scaled` shares the PRIMARY's oracle string — the
driver hash certifies the bucketed-histogram plan reproduces the
row_number plan's values bit-exactly. `rfm_segmentation_scaled` has its
own rank()-based oracle (tie-coherent min-rank quintiles — the honest
scale semantics; ntile's positional tie-split is the part that cannot
be computed without totally ordering customer-sized tie runs).

Plus the unit contract of operators/calibrate.py::desc_rank_boundaries
(the shared two-level selection) under bucket-boundary and tie edge
cases, and the executed-plan pins the VERDICT asked for: no
single-partition sort of the customer frame in either scaled plan.
"""

from __future__ import annotations

import re

import pandas as pd

from etl_earthquake_gcp_spark.operators import calibrate
from etl_earthquake_gcp_spark.plans import QUERIES

from .conftest import SF_DIR
from .conftest import run_registered_pair as _run_pair


def _plan_of(df):
    return df._jdf.queryExecution().executedPlan().toString()


# -- oracle parity -----------------------------------------------------------


def test_pareto_scaled_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "pareto_revenue_share_scaled")
    assert len(spdf) == 3


def test_pareto_scaled_equals_primary(spark):
    """The whole point of sharing the oracle: the two plans are
    bit-identical on every column."""
    key = "top_pct"
    a = (
        QUERIES["pareto_revenue_share"]
        .spark_fn(spark, SF_DIR)
        .toPandas()
        .sort_values(key, ignore_index=True)
    )
    b = (
        QUERIES["pareto_revenue_share_scaled"]
        .spark_fn(spark, SF_DIR)
        .toPandas()
        .sort_values(key, ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_exact=True
    )


def test_rfm_scaled_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "rfm_segmentation_scaled")
    assert spdf["n_customers"].sum() > 0
    for c in ("r_score", "f_score", "m_score"):
        assert spdf[c].between(1, 5).all()


def test_rfm_scaled_is_tie_coherent_and_complete(spark, oracle):
    """Tie-coherence (the semantic upgrade over ntile): equal metric
    values always share a score — verified per metric by recomputing
    scores row-wise in pandas; and every customer lands in exactly one
    cell."""
    spdf = QUERIES["rfm_segmentation_scaled"].spark_fn(
        spark, SF_DIR
    ).toPandas()
    n_cust = oracle.execute(
        "SELECT count(DISTINCT o_custkey) FROM orders"
    ).fetchone()[0]
    assert spdf["n_customers"].sum() == n_cust
    base = oracle.execute(
        """
        SELECT max(epoch_ms(CAST(o_orderdate AS TIMESTAMP))) AS last_ms,
               count(*) AS freq,
               round(sum(o_totalprice), 2) AS monetary
        FROM orders GROUP BY o_custkey
        """
    ).df()
    n = len(base)
    scores = {}
    for col in ("last_ms", "freq", "monetary"):
        cnt_above = base[col].rank(method="min", ascending=False) - 1
        scores[col] = 1 + (5 * cnt_above.astype("int64")) // n
    # the recomputed JOINT cell counts must equal the Spark output —
    # this is what fails if the Spark scoring ever regresses to a
    # positional tie-split (min-rank scores are tie-coherent by
    # construction, so checking them alone would be vacuous)
    expect = (
        pd.DataFrame(
            {
                "r_score": scores["last_ms"],
                "f_score": scores["freq"],
                "m_score": scores["monetary"],
            }
        )
        .groupby(["r_score", "f_score", "m_score"])
        .size()
        .rename("n_customers")
        .reset_index()
    )
    key = ["r_score", "f_score", "m_score"]
    got = spdf[key + ["n_customers"]].sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"),
        expect.sort_values(key, ignore_index=True).astype("int64"),
    )


# -- desc_rank_boundaries unit contract --------------------------------------


def test_desc_rank_boundaries_matches_sorted_positions(spark):
    """For every cut C and several bucket fan-outs (including B=1 —
    everything in one bucket — and B larger than the value range), the
    selected boundary value equals position C of the descending sort,
    and n_above/cnt_at describe its tied run exactly."""
    vals = [7, 3, 3, 3, 11, 11, 0, -4, 5, 5, 2, 2, 2, 2, 9]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    s = sorted(vals, reverse=True)
    for n_buckets in (1, 2, 7, 1024):
        targets = spark.createDataFrame(
            [(c, c) for c in range(1, len(vals) + 1)],
            "_tag long, cut long",
        )
        out = (
            calibrate.desc_rank_boundaries(
                df, "x", targets, "cut", "v", n_buckets=n_buckets
            )
            .toPandas()
            .set_index("_tag")
            .sort_index()
        )
        assert len(out) == len(vals), n_buckets
        for c in range(1, len(vals) + 1):
            row = out.loc[c]
            expect = s[c - 1]
            assert row["v"] == expect, (n_buckets, c)
            assert row["n_above"] == sum(1 for v in vals if v > expect)
            assert row["cnt_at"] == vals.count(expect)


# -- executed-plan pins (the VERDICT's "done" criterion) ----------------------


def _assert_no_customer_frame_sort(plan: str, name: str):
    """Neither scaled plan may rank or cumulate the customer frame
    per-row: the positional window functions of the baseline forms
    must be gone, and every window spec in the executed plan must be
    one of the two selection shapes — the <=n_buckets bucket rollup
    (global cumsum ordered by `_b`) or the per-target boundary-slice
    refinement (partitioned by `_tag`). A window whose spec opens with
    any other column (e.g. a global cumsum ordered by the raw value —
    a |customers|-sized single-task walk with no rank function in it)
    fails here."""
    assert "row_number(" not in plan, name
    assert "ntile(" not in plan, name
    # capture EVERY spec's leading column, whatever its prefix (r8
    # ADVICE: the old `(_\w+)#` pattern silently skipped a window
    # ordered by a raw product column like `u` or `monetary` — exactly
    # the global-cumsum regression this pin exists to exclude), then
    # whitelist only the two selection columns
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs, f"{name}: expected selection windows in plan"
    bad = [c for c in specs if c not in ("_tag", "_b")]
    assert not bad, f"{name}: window over non-selection frame {bad}\n{plan}"


def test_pareto_scaled_plan_never_sorts_customer_frame(spark):
    plan = _plan_of(
        QUERIES["pareto_revenue_share_scaled"].spark_fn(spark, SF_DIR)
    )
    _assert_no_customer_frame_sort(plan, "pareto_revenue_share_scaled")


def test_rfm_scaled_plan_never_sorts_customer_frame(spark):
    plan = _plan_of(
        QUERIES["rfm_segmentation_scaled"].spark_fn(spark, SF_DIR)
    )
    _assert_no_customer_frame_sort(plan, "rfm_segmentation_scaled")
    # and the ntile baseline's three global sorts are gone entirely:
    # the only empty-partitionBy windows left are the bucket cumsums
    assert "rank(" not in plan
