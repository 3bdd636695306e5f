"""Iterative graph operators: connected components, label propagation,
Bellman-Ford relaxation — the synchronous-rounds class.

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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(directed: DataFrame, iters: int = 3) -> DataFrame:
    """(node, label) after ``iters`` synchronous label-propagation rounds.

    ``directed``: columns ``src``, ``dst``, and every node MUST appear as
    ``src`` (i.e. pass a SYMMETRIZED edge list — undirected graphs are the
    contract, as in the banked co-activity queries). A dst-only node would
    get no initial label and its neighbors' votes through it would be
    dropped, so asymmetric input is outside this operator's semantics.
    Every node starts labeled with its own id; each round every node
    adopts the most common label among its out-neighbors, ties broken by
    (count DESC, label ASC) — fully deterministic, so the result is
    exactly reproducible and replayable by an unrolled-CTE oracle.

    Scale shape per round: one equi-join (edges ⋈ labels, keyed on the
    vertex id) + one count groupBy + a per-node argmax window whose
    partitions are one node's candidate labels (bounded by the input
    graph's degree cap, never corpus-sized). The label chain is kept
    LAZY (no per-round checkpoint) so bounded-``iters`` callers keep a
    pin-able plan; for large ``iters`` interpose ``localCheckpoint`` on
    the returned frame's ancestry per round (the connected_components
    discipline) or plan size grows linearly with rounds.
    """
    labels = (
        directed.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("c"), "label")
    for _ in range(iters):
        neigh = directed.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select("src", "label")
        cnt = neigh.groupBy("src", "label").agg(F.count("*").alias("c"))
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("node"), "label")
        )
    return labels


def bellman_ford_relax(
    wdir: DataFrame, dist: DataFrame, iters: int = 3
) -> DataFrame:
    """(node, dist) after ``iters`` synchronous Bellman-Ford relaxations.

    ``wdir``: directed weighted edges (src, dst, cost); ``dist``: the
    initial frontier (node, dist) — typically one source row at 0.
    Unreached nodes are absent (the frontier-growth formulation). Min-plus
    over integers, so every distance is exact and oracle-replayable.

    Each round is one equi-join + one min groupBy, both keyed on the
    vertex id; ``localCheckpoint`` truncates the per-iteration lineage
    (the connected_components discipline) so plan size and scheduler
    overhead stay constant.
    """
    for _ in range(iters):
        relaxed = wdir.join(
            dist.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("cost")).alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
            .localCheckpoint()  # truncate lineage: constant-size plan per round
        )
    return dist


def kcore_peel_rounds(
    edges: DataFrame, k: int, rounds: int = 3
) -> list[tuple[DataFrame, DataFrame]]:
    """``rounds`` synchronous k-core peels over an undirected edge list.

    ``edges``: columns ``u``, ``v`` (one row per undirected edge). Each
    round drops every node whose current degree is < ``k`` and keeps only
    edges between survivors. Returns one (survivors, remaining_edges)
    pair per round — survivors has column ``node``; callers aggregate
    their own census. Pure integer degree arithmetic, so each round is
    exactly replayable by an unrolled-CTE oracle.

    Scale shape per round: one degree groupBy + two semi-join-shaped
    equi-joins against the survivor set, all keyed on the vertex id;
    ``localCheckpoint`` truncates the per-round lineage (the
    connected_components discipline). Each survivor frame is persisted
    for its hot window — the two edge-filter joins that build the next
    round's checkpoint — then the PREVIOUS round's cache is dropped
    once that checkpoint has materialized (eager by default), so at
    most two node-sized frames are cached at any time regardless of
    ``rounds`` (r9 ADVICE: the per-round persists used to accumulate
    for the session lifetime). The final round's survivor stays cached
    for the caller's census; a caller's census over EARLIER rounds
    recomputes one degree groupBy from that round's checkpointed edge
    frame — cheap, exact, and correctness-neutral (unpersist only
    drops the cache, never the lineage).
    """
    out: list[tuple[DataFrame, DataFrame]] = []
    cur = edges
    prev_surv: DataFrame | None = None
    for _ in range(rounds):
        nodes = cur.select(F.col("u").alias("node")).unionAll(
            cur.select(F.col("v").alias("node"))
        )
        deg = nodes.groupBy("node").agg(
            F.count("*").cast("long").alias("d")
        )
        # PERSIST: node-bounded survivor set, shrinks per round; read by
        # both edge-filter joins below (and, for the FINAL round, the
        # caller's census). Bounded lifetime: dropped right after the
        # next round's checkpoint materializes — see the unpersist below.
        surv = deg.filter(F.col("d") >= k).select("node").persist()
        cur = (
            cur.join(surv.withColumnRenamed("node", "u"), "u")
            .join(surv.withColumnRenamed("node", "v"), "v")
            .select("u", "v")
            .localCheckpoint()  # truncate lineage: constant-size plan per round
        )
        # the checkpoint above ran eagerly, so the previous survivor's
        # consumers have all executed; cap the cache at two frames
        if prev_surv is not None:
            prev_surv.unpersist()
        prev_surv = surv
        out.append((surv, cur))
    return out


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
