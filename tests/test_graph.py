"""Connected components: structure, isolation, and chain propagation."""

from __future__ import annotations

from etl_earthquake_gcp_spark.operators.graph import connected_components


def test_components_basic(spark):
    verts = spark.createDataFrame([(i,) for i in range(7)], "id long")
    # component {0,1,2} (triangle), chain {3,4,5}, isolated {6}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {
        r.id: r.component for r in connected_components(verts, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 6}


def test_components_long_chain_converges(spark):
    n = 12  # diameter 11: several propagation rounds
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = connected_components(verts, edges).collect()
    assert all(r.component == 0 for r in got)
