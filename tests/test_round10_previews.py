"""Round-10 registrations (promoted from the round-10 preview bank):
the duplicated-span finder now lives in plans/text_queries.py, the
centroid-shift audit and greedy assignment in plans/vector_queries.py,
and the two graph iterations (LPA, Bellman-Ford — cores in
operators/graph.py) in plans/analytics_queries.py as registered driver
pairs. These tests exercise the REGISTERED pair (the exact objects the
driver sees) plus the domain asserts and the pure-Python replay the
generic oracle-parity sweep does not check.
"""

from __future__ import annotations

from etl_earthquake_gcp_spark.plans import QUERIES
from etl_earthquake_gcp_spark.plans.text_queries import _SPAN_K
from etl_earthquake_gcp_spark.plans.vector_queries import _GA_STEPS
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR
from .conftest import run_registered_pair as _run_pair

# registered query callables (also imported by tests/test_bank_plans.py)
shared_span_islands = QUERIES["shared_span_islands"].spark_fn
label_centroid_shift = QUERIES["label_centroid_shift"].spark_fn
label_propagation_3iter = QUERIES["label_propagation_3iter"].spark_fn
bellman_ford_3relax = QUERIES["bellman_ford_3relax"].spark_fn
greedy_assign_topmatch = QUERIES["greedy_assign_topmatch"].spark_fn


# -- shared_span_islands -----------------------------------------------------


def test_shared_span_islands_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "shared_span_islands")
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


def test_label_centroid_shift_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "label_centroid_shift")
    n_lab = spdf[["label_a", "label_b"]].stack().nunique()
    assert len(spdf) == n_lab * (n_lab - 1) // 2
    assert (spdf["n_dims"] == 64).all()
    assert (spdf["dist2_u"] > 0).all()  # distinct label clusters


# -- label_propagation_3iter -------------------------------------------------


def test_label_propagation_oracle_parity(spark, oracle):
    from etl_earthquake_gcp_spark.plans.analytics_queries import (
        _capped_user_edges,
    )

    spdf = _run_pair(spark, oracle, "label_propagation_3iter")
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


def test_bellman_ford_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "bellman_ford_3relax")
    assert (spdf["dist"] >= 0).all()
    assert (spdf["dist"] == 0).sum() == 1  # exactly the source


# -- greedy_assign_topmatch --------------------------------------------------


def test_greedy_assign_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "greedy_assign_topmatch")
    assert len(spdf) == _GA_STEPS
    # one-to-one: no query or item repeats
    assert spdf["query_id"].is_unique and spdf["item_id"].is_unique
    # greedy scores are non-increasing
    s = spdf.sort_values("step")["s_u"].tolist()
    assert s == sorted(s, reverse=True)


def test_greedy_assign_step_margins_no_boundary_ties(spark, tmp_path):
    """Rehearsal guard (r10 ADVICE): greedy_assign_topmatch is a
    CHAINED argmax — unlike the quantize-once queries where a
    0.5-boundary ulp flip would perturb one independent row, a single
    flipped s_u unit here can change step j's winner and cascade
    divergence through every later step. Assert each step's winning
    s_u beats the runner-up by >= 2 quantization units on the base
    corpus AND a values-perturbed variant, so boundary-tie fragility
    is detected before the driver sees it."""
    import pathlib
    import sys

    from pyspark.sql import functions as F

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from tools.regeneration_rehearsal import build_variant

    from etl_earthquake_gcp_spark.plans.vector_queries import _ga_scored

    pert = str(tmp_path / "greedy_margin_values_29")
    build_variant("values", SF_DIR, pert, 29)
    for sf_dir in (SF_DIR, pert):
        scored = _ga_scored(spark, sf_dir)
        taken_q: list[int] = []
        taken_i: list[int] = []
        for step in range(1, _GA_STEPS + 1):
            top2 = (
                scored.filter(
                    ~F.col("query_id").isin(taken_q)
                    & ~F.col("item_id").isin(taken_i)
                )
                .orderBy(F.desc("s_u"), "query_id", "item_id")
                .limit(2)
                .collect()
            )
            if not top2:
                break
            win = top2[0]
            if len(top2) == 2:
                margin = win["s_u"] - top2[1]["s_u"]
                assert margin >= 2, (
                    f"{sf_dir} step {step}: winner "
                    f"({win['query_id']},{win['item_id']},{win['s_u']}) "
                    f"leads runner-up by only {margin} quantization "
                    "units — boundary-tie fragile"
                )
            taken_q.append(win["query_id"])
            taken_i.append(win["item_id"])
        scored.unpersist()
