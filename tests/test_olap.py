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


def test_approx_percentiles_close_to_exact(spark):
    exact = {
        r.event_type: (r.p25, r.p50, r.p75, r.p90)
        for r in QUERIES["event_value_percentiles"].spark_fn(spark, SF_DIR).collect()
    }
    approx = {
        r.event_type: r.quantiles
        for r in QUERIES["approx_value_percentiles"].spark_fn(spark, SF_DIR).collect()
    }
    assert exact.keys() == approx.keys()
    for etype, ex in exact.items():
        for e, a in zip(ex, approx[etype]):
            # accuracy 10_000 on a few-hundred-row group → near-exact;
            # allow 5% relative drift for the sketch
            assert abs(a - e) <= 0.05 * max(abs(e), 1.0), (etype, ex, approx[etype])
