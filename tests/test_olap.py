"""OLAP extension checks: cube set structure, approx-vs-exact quantiles."""

from __future__ import annotations

from etl_earthquake_gcp_spark.plans import QUERIES

from .conftest import SF_DIR


def test_cube_produces_all_grouping_sets(spark):
    rows = QUERIES["cube_order_counts"].spark_fn(spark, SF_DIR).collect()
    gids = {r.gid for r in rows}
    assert gids == {0, 1, 2, 3}
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1
    assert grand[0].n_orders == sum(r.n_orders for r in rows if r.gid == 0)


def test_range_join_partitions_all_events(spark):
    rows = QUERIES["range_join_value_buckets"].spark_fn(spark, SF_DIR).collect()
    from etl_earthquake_gcp_spark.sources.tables import load_table

    total = load_table(spark, SF_DIR, "events").count()
    assert sum(r.n_events for r in rows) == total  # buckets cover [0, 1000)


def test_countmin_never_undercounts(spark):
    rows = QUERIES["countmin_token_freq"].spark_fn(spark, SF_DIR).collect()
    assert rows
    assert all(r.est_n >= r.true_n for r in rows)
    # 31-token vocab in a 4×64 grid: at least one hash row should be
    # collision-free for most tokens → the large majority estimate exactly
    exact_frac = sum(r.est_n == r.true_n for r in rows) / len(rows)
    assert exact_frac >= 0.8, exact_frac


def test_bloom_no_false_negatives_and_prunes(spark):
    from pyspark.sql import functions as F

    from etl_earthquake_gcp_spark.operators.sketch import (
        bloom_build,
        bloom_might_contain,
    )
    from etl_earthquake_gcp_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "events")
    o = load_table(spark, SF_DIR, "orders")
    words = bloom_build(e.select("user_id").distinct(), "user_id")
    # no false negatives: every true member passes the bit test
    misses = (
        e.select("user_id")
        .distinct()
        .filter(~bloom_might_contain(words, F.col("user_id")))
        .count()
    )
    assert misses == 0
    # and the prefilter actually prunes most non-member orders
    kept = o.filter(bloom_might_contain(words, F.col("o_custkey"))).count()
    assert kept < o.count() * 0.5, (kept, o.count())


def test_stratified_sample_fractions(spark):
    got = {
        r.event_type: r.n_sampled
        for r in QUERIES["stratified_sample_counts"].spark_fn(spark, SF_DIR).collect()
    }
    from etl_earthquake_gcp_spark.sources.tables import load_table

    totals = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert set(got) <= {"click", "purchase"}  # strata not listed sample at 0
    for etype, frac in (("click", 0.5), ("purchase", 0.25)):
        rate = got.get(etype, 0) / totals[etype]
        assert abs(rate - frac) < 0.15, (etype, rate)


def test_approx_percentiles_close_to_exact(spark):
    exact = {
        r.event_type: (r.p25, r.p50, r.p75, r.p90)
        for r in QUERIES["event_value_percentiles"].spark_fn(spark, SF_DIR).collect()
    }
    approx: dict = {}
    for r in QUERIES["approx_value_percentiles"].spark_fn(spark, SF_DIR).collect():
        approx.setdefault(r.event_type, {})[r.p] = r.quantile
    assert exact.keys() == approx.keys()
    for etype, ex in exact.items():
        got = [approx[etype][p] for p in (0.25, 0.5, 0.75, 0.9)]
        for e, a in zip(ex, got):
            # accuracy 10_000 on a few-hundred-row group → near-exact;
            # allow 5% relative drift for the sketch
            assert abs(a - e) <= 0.05 * max(abs(e), 1.0), (etype, ex, approx[etype])
