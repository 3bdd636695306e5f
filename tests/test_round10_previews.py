"""Round-10 query previews: full Spark-vs-DuckDB parity pairs for the
exact duplicated-span finder (the Lee-et-al substring-dedup shape on
maximal islands) and the embedding centroid-shift audit, verified NOW
so a later registration is a mechanical @register move.

Same contract as tests/test_round7_previews.py: each test runs the
planned queries() callable against the planned oracle_sql() string with
the driver-sim comparator, so the pair is already proven when promoted.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR, assert_frames_match


# -- shared_span_islands -----------------------------------------------------
#
# Exact cross-document duplicated spans: every position whose k-gram
# occurs in ≥2 DISTINCT documents, merged into maximal runs with the
# gap-and-island trick (pos − row_number is constant within a
# consecutive run — pure integer arithmetic). The maximal-span
# companion to the fixed-segment segment_dedup_rewrite: this is the
# find stage of exact substring deduplication, where a shared run of
# ≥ w+k−1 tokens is recovered as ONE span, not ceil(w/seg) fragments.

_SPAN_K = 5

SPAN_ISLANDS_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), g AS (
        SELECT doc_id, s.i AS pos,
               array_to_string(toks[s.i:s.i + {_SPAN_K} - 1], ' ') AS gram
        FROM t, LATERAL (SELECT unnest(generate_series(1,
                 len(toks) - {_SPAN_K} + 1)) AS i) s
        WHERE len(toks) >= {_SPAN_K}
    ), reach AS (
        SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM g GROUP BY gram
    ), shared AS (
        SELECT g.doc_id, g.pos
        FROM g JOIN reach USING (gram)
        WHERE reach.n_docs >= 2
    ), isl AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id
                   ORDER BY pos) AS grp
        FROM shared
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS start_pos,
           CAST(max(pos) + {_SPAN_K} - 1 AS BIGINT) AS end_pos,
           CAST(max(pos) - min(pos) + {_SPAN_K} AS BIGINT) AS span_tokens
    FROM isl GROUP BY doc_id, grp
"""


def shared_span_islands(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams = (
        d.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= _SPAN_K)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_SPAN_K} + 1),"
                    f" i -> array_join(slice(toks, i, {_SPAN_K}), ' '))"
                )
            ).alias("idx", "gram"),
        )
        .select("doc_id", (F.col("idx") + 1).alias("pos"), "gram")
        .persist()  # feeds the reach groupBy AND the join back
    )
    reach = grams.groupBy("gram").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs")
    )
    shared = (
        grams.join(reach, "gram")
        .filter(F.col("n_docs") >= 2)
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = shared.withColumn(
        "grp", F.col("pos") - F.row_number().over(w)
    )
    return isl.groupBy("doc_id", "grp").agg(
        F.min("pos").cast("long").alias("start_pos"),
        (F.max("pos") + _SPAN_K - 1).cast("long").alias("end_pos"),
        (F.max("pos") - F.min("pos") + _SPAN_K)
        .cast("long")
        .alias("span_tokens"),
    ).drop("grp")


def test_shared_span_islands_oracle_parity(spark, oracle):
    spdf = shared_span_islands(spark, SF_DIR).toPandas()
    opdf = oracle.execute(SPAN_ISLANDS_ORACLE).df()
    assert_frames_match(spdf, opdf, "shared_span_islands")
    assert (spdf["span_tokens"] >= _SPAN_K).all()
    assert (
        spdf["end_pos"] - spdf["start_pos"] + 1 == spdf["span_tokens"]
    ).all()


def test_span_islands_are_maximal(spark):
    """Within a doc, merged islands never touch: consecutive spans are
    separated by at least one non-shared position."""
    pdf = shared_span_islands(spark, SF_DIR).toPandas()
    for _, grp in pdf.groupby("doc_id"):
        g = grp.sort_values("start_pos")
        # next span's first shared k-gram starts after this island's
        # last shared position (end_pos - k + 1), with a gap
        assert (
            g["start_pos"].shift(-1).dropna().to_numpy()
            > (g["end_pos"] - _SPAN_K + 1).to_numpy()[:-1] + 1
        ).all()


def test_span_islands_matches_python_replay(spark):
    """Full-result replay in pure Python: k-gram extraction, the
    distinct-doc reach sets, and the consecutive-run merge — independent
    of both the Spark gap-and-island window and the oracle CTEs."""
    from collections import defaultdict

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    )
    reach = defaultdict(set)
    per_doc = {}
    for r in docs:
        toks = r.text.split(" ")
        if len(toks) < _SPAN_K:
            continue
        ps = []
        for i in range(len(toks) - _SPAN_K + 1):
            g = " ".join(toks[i : i + _SPAN_K])
            ps.append((i + 1, g))
            reach[g].add(r.doc_id)
        per_doc[r.doc_id] = ps
    expected = set()
    for doc_id, ps in per_doc.items():
        shared = sorted(p for p, g in ps if len(reach[g]) >= 2)
        runs = []
        for p in shared:
            if runs and p == runs[-1][1] + 1:
                runs[-1][1] = p
            else:
                runs.append([p, p])
        for st, en in runs:
            expected.add((doc_id, st, en + _SPAN_K - 1, en - st + _SPAN_K))
    spdf = shared_span_islands(spark, SF_DIR).toPandas()
    got = set(
        (int(a), int(b), int(c), int(d))
        for a, b, c, d in spdf[
            ["doc_id", "start_pos", "end_pos", "span_tokens"]
        ].itertuples(index=False, name=None)
    )
    assert got == expected


# -- label_centroid_shift ----------------------------------------------------
#
# Embedding distribution-shift audit: per-label centroids (per-dim
# means quantized ONCE to 1e-6 integer units — the moments-first rule;
# avg combine-order ulp drift is absorbed by the single quantization),
# then EXACT integer squared distances between every label pair. The
# only float op is the final display ratio (d2_u / 1e12, one int/int
# ratio rounded once).

CENTROID_SHIFT_ORACLE = """
    WITH x AS (
        SELECT label, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ), cent AS (
        SELECT label, i,
               CAST(round(avg(v) * 1000000, 0) AS BIGINT) AS u
        FROM x GROUP BY label, i
    )
    SELECT a.label AS label_a, b.label AS label_b,
           CAST(count(*) AS BIGINT) AS n_dims,
           CAST(sum((a.u - b.u) * (a.u - b.u)) AS BIGINT) AS dist2_u,
           round(sum((a.u - b.u) * (a.u - b.u)) * 1.0
                 / 1000000000000, 6) AS dist2_6
    FROM cent a JOIN cent b ON a.i = b.i AND a.label < b.label
    GROUP BY 1, 2
"""


def label_centroid_shift(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "label", F.posexplode("embedding").alias("i0", "v")
    ).select(
        "label", (F.col("i0") + 1).alias("i"), F.col("v").cast("double")
    )
    cent = x.groupBy("label", "i").agg(
        F.round(F.avg("v") * 1_000_000, 0).cast("long").alias("u")
    )
    a = cent.select(
        F.col("label").alias("label_a"), "i", F.col("u").alias("ua")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "i", F.col("u").alias("ub")
    )
    d2 = F.sum(
        (F.col("ua") - F.col("ub")) * (F.col("ua") - F.col("ub"))
    ).cast("long")
    return (
        a.join(b, (a["i"] == b["i"]) & (a["label_a"] < b["label_b"]))
        .groupBy("label_a", "label_b")
        .agg(
            F.count("*").cast("long").alias("n_dims"),
            d2.alias("dist2_u"),
            F.round(d2 * 1.0 / 1_000_000_000_000, 6).alias("dist2_6"),
        )
    )


def test_label_centroid_shift_oracle_parity(spark, oracle):
    spdf = label_centroid_shift(spark, SF_DIR).toPandas()
    opdf = oracle.execute(CENTROID_SHIFT_ORACLE).df()
    assert_frames_match(spdf, opdf, "label_centroid_shift")
    n_lab = spdf[["label_a", "label_b"]].stack().nunique()
    assert len(spdf) == n_lab * (n_lab - 1) // 2
    assert (spdf["n_dims"] == 64).all()
    assert (spdf["dist2_u"] > 0).all()  # distinct label clusters


# -- label_propagation_3iter -------------------------------------------------
#
# Community detection on the shared degree-capped co-activity graph
# (the triangle/BFS substrate): three synchronous label-propagation
# iterations, made fully deterministic by the (count DESC, label ASC)
# argmax tie-break — pure integer arithmetic, so the unrolled-CTE
# oracle replays every iteration bit-for-bit. Output certifies the
# complete final assignment via per-community node-id sums.

_LPA_K = 3


def lpa_oracle() -> str:
    from etl_earthquake_gcp_spark.plans.analytics_queries import (
        _TRIANGLE_EDGES_SQL,
    )

    ctes = [
        _TRIANGLE_EDGES_SQL.strip(),
        """d2 AS (
            SELECT u AS src, v AS dst FROM edges
            UNION ALL
            SELECT v, u FROM edges
        )""",
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM d2)",
    ]
    for i in range(1, _LPA_K + 1):
        ctes.append(f"""n{i} AS (
            SELECT d.src, l.label, CAST(count(*) AS BIGINT) AS c
            FROM d2 d JOIN l{i - 1} l ON d.dst = l.node
            GROUP BY 1, 2
        )""")
        ctes.append(f"""l{i} AS (
            SELECT src AS node, label FROM (
                SELECT src, label, row_number() OVER (
                    PARTITION BY src ORDER BY c DESC, label) AS rn
                FROM n{i})
            WHERE rn = 1
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT CAST(label AS BIGINT) AS community,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(node) AS BIGINT) AS node_sum
    FROM l{_LPA_K} GROUP BY 1
    """
    )


def label_propagation_3iter(spark, sf_dir):
    from etl_earthquake_gcp_spark.operators.graph import label_propagation
    from etl_earthquake_gcp_spark.plans.analytics_queries import (
        _capped_user_edges,
    )

    edges = _capped_user_edges(spark, sf_dir)
    directed = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).persist()  # traversed once per iteration (the pagerank pattern)
    labels = label_propagation(directed, iters=_LPA_K)
    return labels.groupBy("label").agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum("node").cast("long").alias("node_sum"),
    ).select(
        F.col("label").cast("long").alias("community"),
        "n_nodes",
        "node_sum",
    )


def test_label_propagation_oracle_parity(spark, oracle):
    from etl_earthquake_gcp_spark.plans.analytics_queries import (
        _capped_user_edges,
    )

    spdf = label_propagation_3iter(spark, SF_DIR).toPandas()
    opdf = oracle.execute(lpa_oracle()).df()
    assert_frames_match(spdf, opdf, "label_propagation_3iter")
    # communities PARTITION the node set: sizes sum to the independent
    # distinct-node count of the shared graph (a bug dropping nodes
    # identically in plan AND oracle would pass parity; this won't)
    edges = _capped_user_edges(spark, SF_DIR).toPandas()
    nodes = set(edges["u"]) | set(edges["v"])
    assert spdf["n_nodes"].sum() == len(nodes)
    # every surviving community label is a real node id
    assert set(spdf["community"]) <= nodes
    assert (spdf["n_nodes"] >= 1).all()


# -- bellman_ford_3relax -----------------------------------------------------
#
# Weighted shortest paths on the SAME degree-capped co-activity graph
# the triangle/BFS/LPA queries ride (the weighted sibling of
# bfs_hops_user_graph): edge cost = _BF_COST div shared (stronger
# co-activity = cheaper), three Bellman-Ford relaxations from the
# smallest user id. Min-plus over integers — every distance exact, the
# oracle unrolls the three relaxations over the shared edges_w CTE.
# Unreached nodes are absent (the frontier-growth formulation),
# matching both engines.

_BF_COST = 1_000_000


def bf_oracle() -> str:
    from etl_earthquake_gcp_spark.plans.analytics_queries import (
        _TRIANGLE_EDGES_SQL,
    )

    ctes = [
        _TRIANGLE_EDGES_SQL.strip(),
        f"""wdir AS (
            SELECT u AS src, v AS dst, {_BF_COST} // shared AS cost
            FROM edges_w
            UNION ALL
            SELECT v, u, {_BF_COST} // shared FROM edges_w
        )""",
        "s AS (SELECT min(src) AS sid FROM wdir)",
        "d0 AS (SELECT sid AS node, CAST(0 AS BIGINT) AS dist FROM s)",
    ]
    for i in range(1, 4):
        ctes.append(f"""r{i} AS (
            SELECT e.dst AS node,
                   CAST(min(d.dist + e.cost) AS BIGINT) AS dist
            FROM d{i - 1} d JOIN wdir e ON e.src = d.node
            GROUP BY 1
        )""")
        ctes.append(f"""d{i} AS (
            SELECT node, CAST(min(dist) AS BIGINT) AS dist
            FROM (SELECT * FROM d{i - 1} UNION ALL SELECT * FROM r{i})
            GROUP BY node
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT CAST(node AS BIGINT) AS node, dist FROM d3"
    )


def bellman_ford_3relax(spark, sf_dir):
    from etl_earthquake_gcp_spark.operators.graph import bellman_ford_relax
    from etl_earthquake_gcp_spark.plans.analytics_queries import (
        _capped_user_edges_weighted,
    )

    edges_w = _capped_user_edges_weighted(spark, sf_dir)  # persisted
    cost = F.expr(f"{_BF_COST} div shared").cast("long")
    wdir = edges_w.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), cost.alias("cost")
    ).unionByName(
        edges_w.select(
            F.col("v").alias("src"),
            F.col("u").alias("dst"),
            cost.alias("cost"),
        )
    )
    src = wdir.agg(F.min("src").alias("sid"))
    dist = src.select(
        F.col("sid").alias("node"), F.lit(0).cast("long").alias("dist")
    )
    dist = bellman_ford_relax(wdir, dist, iters=3)
    return dist.select(F.col("node").cast("long").alias("node"), "dist")


def test_bellman_ford_oracle_parity(spark, oracle):
    spdf = bellman_ford_3relax(spark, SF_DIR).toPandas()
    opdf = oracle.execute(bf_oracle()).df()
    assert_frames_match(spdf, opdf, "bellman_ford_3relax")
    assert (spdf["dist"] >= 0).all()
    assert (spdf["dist"] == 0).sum() == 1  # exactly the source


# -- greedy_assign_topmatch --------------------------------------------------
#
# Global one-to-one assignment: greedily match each of the 5 anchor
# queries to a distinct corpus vector by highest cosine (the
# unique-assignment variant of cosine top-k — dedup-aware retrieval /
# annotator routing). Scores quantized ONCE to 1e-6 integer units, the
# greedy argmax totally ordered by (score DESC, query, item); the
# oracle unrolls all five steps with NOT-IN exclusions (the MMR
# pattern). Each Spark step is a 1-row argmax collect (the BPE
# pattern) — the pair table itself never leaves the cluster.

_GA_STEPS = 5


def ga_oracle() -> str:
    base = f"""
    exploded AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ), norms AS (
        SELECT vec_id, sqrt(sum(x * x)) AS norm FROM exploded GROUP BY vec_id
    ), dots AS (
        SELECT a.vec_id AS query_id, b.vec_id AS item_id,
               sum(a.x * b.x) AS dot
        FROM exploded a JOIN exploded b ON a.i = b.i
        WHERE a.vec_id < {_GA_STEPS} AND b.vec_id >= {_GA_STEPS}
        GROUP BY 1, 2
    ), scored AS (
        SELECT d.query_id, d.item_id,
               CAST(round(d.dot / (nq.norm * ni.norm) * 1000000, 0)
                    AS BIGINT) AS s_u
        FROM dots d
        JOIN norms nq ON d.query_id = nq.vec_id
        JOIN norms ni ON d.item_id = ni.vec_id
        WHERE nq.norm > 0 AND ni.norm > 0
    )"""
    ctes = [base.strip()]
    sel = []
    for j in range(1, _GA_STEPS + 1):
        excl = ""
        if j > 1:
            prev = " UNION ALL ".join(
                f"SELECT query_id FROM g{p}" for p in range(1, j)
            )
            previ = " UNION ALL ".join(
                f"SELECT item_id FROM g{p}" for p in range(1, j)
            )
            excl = (
                f" WHERE query_id NOT IN ({prev})"
                f" AND item_id NOT IN ({previ})"
            )
        ctes.append(
            f"g{j} AS (SELECT {j} AS step, query_id, item_id, s_u"
            f" FROM scored{excl}"
            f" ORDER BY s_u DESC, query_id, item_id LIMIT 1)"
        )
        sel.append(
            f"SELECT CAST(step AS BIGINT) AS step, query_id, item_id,"
            f" s_u FROM g{j}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sel)


def greedy_assign_topmatch(spark, sf_dir):
    from etl_earthquake_gcp_spark.functions.vectors import (
        cast_double_with_norm,
    )

    emb = cast_double_with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(
        (F.col("vec_id") < _GA_STEPS) & (F.col("norm") > 0)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    items = emb.filter(
        (F.col("vec_id") >= _GA_STEPS) & (F.col("norm") > 0)
    )
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        items.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            F.col("vec_id").alias("item_id"),
            F.round(dot / (F.col("norm") * F.col("qnorm")) * 1_000_000, 0)
            .cast("long")
            .alias("s_u"),
        )
        .persist()  # five argmax passes read it
    )
    rows = []
    taken_q: list[int] = []
    taken_i: list[int] = []
    for step in range(1, _GA_STEPS + 1):
        best = (
            scored.filter(
                ~F.col("query_id").isin(taken_q)
                & ~F.col("item_id").isin(taken_i)
            )
            .orderBy(F.desc("s_u"), "query_id", "item_id")
            .limit(1)
            .collect()
        )
        if not best:
            break
        r = best[0]
        rows.append((step, r["query_id"], r["item_id"], r["s_u"]))
        taken_q.append(r["query_id"])
        taken_i.append(r["item_id"])
    return spark.createDataFrame(
        rows, schema="step long, query_id long, item_id long, s_u long"
    )


def test_greedy_assign_oracle_parity(spark, oracle):
    spdf = greedy_assign_topmatch(spark, SF_DIR).toPandas()
    opdf = oracle.execute(ga_oracle()).df()
    assert_frames_match(spdf, opdf, "greedy_assign_topmatch")
    assert len(spdf) == _GA_STEPS
    # one-to-one: no query or item repeats
    assert spdf["query_id"].is_unique and spdf["item_id"].is_unique
    # greedy scores are non-increasing
    s = spdf.sort_values("step")["s_u"].tolist()
    assert s == sorted(s, reverse=True)
