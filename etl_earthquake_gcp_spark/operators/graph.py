"""Connected components — the iterative-algorithm class, for dedup resolution.

Near-duplicate detection yields PAIRS; deduplication needs GROUPS (keep one
representative per cluster of transitively-similar documents). Components
are computed by min-label propagation: every vertex starts labeled with its
own id; each round, labels flow across edges and vertices keep the minimum
seen; fixpoint = every vertex holds its component's minimum id.

Scale shape per round: one join (labels ⋈ edges) + one min-aggregate — two
shuffles, both keyed on vertex id, so AQE reuses partitioning. Rounds needed
= graph diameter (near-dup clusters are dense → typically 2-4). The classic
iterative-Spark pitfall is lineage growth (each round's plan nests the
last); ``localCheckpoint`` truncates it every round, keeping plan size and
scheduler overhead constant — the same discipline GraphX/GraphFrames apply
internally.

Determinism: min-label is order-independent, so the result is exactly
reproducible and oracle-checkable via a recursive reachability CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """(id, component) for every vertex; component = min reachable vertex id.

    ``vertices``: single column ``id``; ``edges``: columns ``src``, ``dst``
    (undirected — symmetrized internally). Isolated vertices keep their own
    id as component.
    """
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = vertices.select("id", F.col("id").alias("component"))
    for _ in range(max_iter):
        msgs = sym.join(labels, sym.a == labels.id).select(
            F.col("b").alias("id"), "component"
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()  # truncate lineage: constant-size plan per round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
