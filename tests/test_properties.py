"""Property-based differential tests (hypothesis) — SURVEY §5's randomized
layer: each operator is checked against a brute-force Python oracle on
arbitrary small inputs, catching edge shapes the fixed fixtures miss
(empty docs, all-identical corpora, single-user streams, tie storms).

Spark jobs are slow, so examples are few but adversarially shrunk by
hypothesis on failure; deadlines are off (JVM warmup would trip them).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_earthquake_gcp_spark.operators.asof import asof_join
from etl_earthquake_gcp_spark.operators.dedup import (
    jaccard_pairs_bitmask,
    jaccard_pairs_inverted,
)
from etl_earthquake_gcp_spark.operators.sessions import sessionize

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# documents: 1-8 docs over a tiny closed vocabulary (≤10 tokens → far under
# the 64-bit mask limit), repetition encouraged so identical token sets occur
_doc_texts = st.lists(
    st.lists(
        st.sampled_from([f"t{i}" for i in range(10)]), min_size=1, max_size=6
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


def _brute_jaccard_pairs(texts: list[str], threshold: float) -> set[tuple]:
    out = set()
    sets = [frozenset(t.split(" ")) for t in texts]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if union and inter / union >= threshold:
                out.add((i, j, round(inter / union, 4)))
    return out


@_SETTINGS
@given(texts=_doc_texts, threshold=st.sampled_from([0.5, 0.8, 1.0]))
def test_jaccard_bitmask_equals_inverted_equals_brute(spark, texts, threshold):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    expected = _brute_jaccard_pairs(texts, threshold)
    got_mask = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs_bitmask(docs, threshold=threshold).collect()
    }
    got_inv = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs_inverted(docs, threshold=threshold).collect()
    }
    assert got_mask == expected
    assert got_inv == expected
    spark.catalog.clearCache()


# as-of: small integer timelines with deliberate collisions (0-5 range)
_asof_frames = st.tuples(
    st.lists(st.integers(0, 5), min_size=1, max_size=6),  # left times
    st.lists(  # right rows: (time, value)
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=0,
        max_size=6,
    ),
)


@_SETTINGS
@given(frames=_asof_frames)
def test_asof_join_matches_brute_force(spark, frames):
    lts, rrows = frames
    left = spark.createDataFrame(
        [(i, 1, t) for i, t in enumerate(lts)],
        "event_id long, user_id long, t_ms long",
    )
    right = spark.createDataFrame(
        [(1, t, i, v) for i, (t, v) in enumerate(rrows)],
        "user_id long, t_ms long, click_id long, v long",
    )
    got = {
        r.event_id: (r.asof_click_id, r.asof_v)
        for r in asof_join(
            left, right, "user_id", "t_ms", ["click_id", "v"], "click_id"
        ).collect()
    }
    for i, t in enumerate(lts):
        # brute force: all right rows at-or-before t; (time, tie) max wins
        cands = [(rt, ci, v) for ci, (rt, v) in enumerate(rrows) if rt <= t]
        if cands:
            rt, ci, v = max(cands, key=lambda c: (c[0], c[1]))
            assert got[i] == (ci, v)
        else:
            assert got[i] == (None, None)


@_SETTINGS
@given(
    times=st.lists(st.integers(0, 50), min_size=1, max_size=12),
    gap=st.sampled_from([5, 10]),
)
def test_sessionize_matches_brute_force(spark, times, gap):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, base + dt.timedelta(seconds=t), 1.0)
        for i, t in enumerate(sorted(times))
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = sorted(
        (r.session_id, r.n_events)
        for r in sessionize(events, gap_ms=gap * 1000).collect()
    )
    # brute force: a gap >= `gap` seconds starts a new session
    ordered = sorted(times)
    sizes, cur = [], 1
    for a, b in zip(ordered, ordered[1:]):
        if b - a >= gap:
            sizes.append(cur)
            cur = 1
        else:
            cur += 1
    sizes.append(cur)
    assert got == [(i + 1, n) for i, n in enumerate(sizes)]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=40
    )
)
def test_checksum_modsum_matches_python_and_duckdb(spark, vals):
    """The modular membership checksum (exact decimal accumulation
    reduced mod 2^61-1) must equal the plain Python big-int sum mod M
    AND DuckDB's HUGEINT twin on arbitrary hash-range inputs —
    including duplicate values (the multiplicity sensitivity that
    bit_xor lacks)."""
    import duckdb

    from etl_earthquake_gcp_spark.functions.scalar import (
        CHECKSUM_MOD,
        checksum_modsum,
    )
    from pyspark.sql import functions as F

    expected = sum(vals) % CHECKSUM_MOD
    df = spark.createDataFrame([(v,) for v in vals], "h long")
    got_spark = df.agg(checksum_modsum(F.col("h")).alias("s")).collect()[0][
        "s"
    ]
    con = duckdb.connect()
    got_duck = con.execute(
        f"SELECT CAST(sum(h) % {CHECKSUM_MOD} AS BIGINT) FROM "
        f"(SELECT unnest(?::BIGINT[]) AS h)",
        [vals],
    ).fetchone()[0]
    assert got_spark == expected == got_duck


# -- desc_rank_boundaries (round 8: the scaled siblings' selection core) ----

_val_lists = st.lists(
    st.integers(min_value=-(10**12), max_value=10**12),
    min_size=1,
    max_size=12,
)


@_SETTINGS
@given(
    vals=_val_lists,
    n_buckets=st.sampled_from([1, 3, 1024]),
    data=st.data(),
)
def test_desc_rank_boundaries_equals_brute_sort(spark, vals, n_buckets, data):
    """For arbitrary BIGINT values (wide ranges, duplicates, negatives)
    and arbitrary cuts, the bucketed two-level selection returns exactly
    the value at the cut position of the descending sort, with n_above /
    cnt_at describing its tied run — the invariant both scaled siblings
    (pareto tier sums, RFM quintile boundaries) are built on."""
    from etl_earthquake_gcp_spark.operators.calibrate import (
        desc_rank_boundaries,
    )

    cuts = data.draw(
        st.lists(
            st.integers(min_value=1, max_value=len(vals)),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    targets = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cuts)], "_tag long, cut long"
    )
    out = {
        r._tag: r
        for r in desc_rank_boundaries(
            df, "x", targets, "cut", "v", n_buckets=n_buckets
        ).collect()
    }
    s = sorted(vals, reverse=True)
    assert set(out) == set(range(len(cuts)))
    for i, c in enumerate(cuts):
        expect = s[c - 1]
        assert out[i].v == expect
        assert out[i].n_above == sum(1 for v in vals if v > expect)
        assert out[i].cnt_at == vals.count(expect)


# -- stratified_split_assign vs brute-force Hamilton (round 9) ---------------
#
# The registered exact_stratified_split certifies the assignment via a
# checksum; this differential test checks the ROW-LEVEL assignment on
# arbitrary small frames against a from-scratch Python replay of the
# documented semantics (1e-6 weight quantization -> per-stratum floor
# quotas -> largest-remainder top-up with (rem DESC, split) ties ->
# md5-shuffle-key rank intervals), including the all-zero-weight
# uniform fallback and empty strata edge shapes.

def _brute_stratified_split(rows, splits, salt="split"):
    import hashlib
    from collections import defaultdict

    def hash8(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    by_g = defaultdict(list)
    for rid, g in rows:
        by_g[g].append(rid)
    out = {}
    for g, ids in by_g.items():
        n = len(ids)
        w_u = [round(w * 1_000_000) for _, w in splits]
        t = sum(w_u)
        if t == 0:  # documented deterministic uniform fallback
            w_u = [1] * len(splits)
            t = len(splits)
        floor_q = [wu * n // t for wu in w_u]
        rem = [wu * n % t for wu in w_u]
        shortfall = n - sum(floor_q)
        order = sorted(
            range(len(splits)), key=lambda i: (-rem[i], splits[i][0])
        )
        quota = list(floor_q)
        for rr, i in enumerate(order, start=1):
            if rr <= shortfall:
                quota[i] += 1
        ranked = sorted(ids, key=lambda rid: (hash8(f"{rid}:{salt}"), rid))
        pos = 0
        for (name, _), q in zip(splits, quota):
            for rid in ranked[pos : pos + q]:
                out[(g, rid)] = name
            pos += q
    return out


_split_specs = st.sampled_from(
    [
        [("train", 0.8), ("val", 0.1), ("test", 0.1)],
        [("a", 0.5), ("b", 0.5)],
        [("x", 0.7), ("y", 0.3), ("z", 0.0)],  # zero-weight split
        [("p", 0.0), ("q", 0.0)],  # degenerate: uniform fallback
        [("one", 1.0)],
    ]
)
_strata_rows = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=10_000),
        st.sampled_from(["s0", "s1", "s2"]),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: r[0],
)


# -- label_propagation / bellman_ford_relax (round-10 bank cores) ------------
#
# The banked label_propagation_3iter / bellman_ford_3relax oracles
# unroll the same CTE structure the Spark plans execute; these tests add
# a genuinely independent third implementation (pure-Python dict/Counter
# replays) on adversarial small graphs — parallel edges, tie storms
# (every node id a candidate label), disconnected nodes, self-loops
# excluded by construction like the degree-capped substrate.

_graph_edges = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=10,
)


def _brute_lpa(pairs: list[tuple], iters: int) -> dict:
    from collections import Counter, defaultdict

    labels = {s for s, _ in pairs}
    labels = {n: n for n in labels}
    for _ in range(iters):
        cand = defaultdict(Counter)
        for s, d in pairs:
            cand[s][labels[d]] += 1
        labels = {
            s: min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            for s, c in cand.items()
        }
    return labels


@_SETTINGS
@given(edges=_graph_edges, iters=st.sampled_from([1, 2, 3]))
def test_label_propagation_matches_brute(spark, edges, iters):
    from etl_earthquake_gcp_spark.operators.graph import label_propagation

    pairs = edges + [(d, s) for s, d in edges]  # symmetrized, like callers
    directed = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r.node: r.label
        for r in label_propagation(directed, iters=iters).collect()
    }
    assert got == _brute_lpa(pairs, iters)


@_SETTINGS
@given(
    edges=_graph_edges,
    extra_nodes=st.lists(st.integers(6, 9), max_size=3, unique=True),
)
def test_connected_components_matches_brute(spark, edges, extra_nodes):
    """Min-label components vs a pure-Python union-find, including
    isolated vertices (which must keep their own id as component)."""
    from etl_earthquake_gcp_spark.operators.graph import (
        connected_components,
    )

    und = sorted({(min(a, b), max(a, b)) for a, b in edges})
    nodes = sorted({n for e in und for n in e} | set(extra_nodes))
    vdf = spark.createDataFrame([(n,) for n in nodes], "id long")
    edf = spark.createDataFrame(und, "src long, dst long")
    got = {
        r.id: r.component for r in connected_components(vdf, edf).collect()
    }
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in und:
        parent[find(u)] = find(v)
    comp_min: dict = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    expected = {n: comp_min[find(n)] for n in nodes}
    assert got == expected


@_SETTINGS
@given(edges=_graph_edges, k=st.sampled_from([1, 2, 3]))
def test_kcore_peel_matches_brute(spark, edges, k):
    from collections import Counter

    from etl_earthquake_gcp_spark.operators.graph import kcore_peel_rounds

    und = sorted({(min(a, b), max(a, b)) for a, b in edges})
    df = spark.createDataFrame(und, "u long, v long")
    got = [
        (
            sorted(r.node for r in surv.collect()),
            sorted((r.u, r.v) for r in cur.collect()),
        )
        for surv, cur in kcore_peel_rounds(df, k=k, rounds=3)
    ]
    cur = und
    expected = []
    for _ in range(3):
        deg = Counter()
        for u, v in cur:
            deg[u] += 1
            deg[v] += 1
        surv = {n for n, d in deg.items() if d >= k}
        cur = [(u, v) for u, v in cur if u in surv and v in surv]
        expected.append((sorted(surv), sorted(cur)))
    assert got == expected
    spark.catalog.clearCache()


_weighted_edges = st.lists(
    st.tuples(
        st.integers(0, 5), st.integers(0, 5), st.integers(1, 4)
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=10,
)


def _brute_bf(pairs: list[tuple], source: int, iters: int) -> dict:
    dist = {source: 0}
    for _ in range(iters):
        new = dict(dist)
        for s, d, c in pairs:
            if s in dist:
                nd = dist[s] + c
                if d not in new or nd < new[d]:
                    new[d] = nd
        dist = new
    return dist


@_SETTINGS
@given(edges=_weighted_edges, iters=st.sampled_from([1, 2, 3]))
def test_bellman_ford_matches_brute(spark, edges, iters):
    from etl_earthquake_gcp_spark.operators.graph import bellman_ford_relax

    pairs = edges + [(d, s, c) for s, d, c in edges]
    source = min(s for s, _, _ in pairs)
    wdir = spark.createDataFrame(pairs, "src long, dst long, cost long")
    dist0 = spark.createDataFrame([(source, 0)], "node long, dist long")
    got = {
        r.node: r.dist
        for r in bellman_ford_relax(wdir, dist0, iters=iters).collect()
    }
    assert got == _brute_bf(pairs, source, iters)


@_SETTINGS
@given(rows=_strata_rows, splits=_split_specs)
def test_stratified_split_assign_matches_brute(spark, rows, splits):
    from etl_earthquake_gcp_spark.operators.splits import (
        stratified_split_assign,
    )

    df = spark.createDataFrame(rows, "doc_id long, src string")
    got = {
        (r.src, r.doc_id): r.split
        for r in stratified_split_assign(
            df, "src", "doc_id", splits
        ).collect()
    }
    expected = _brute_stratified_split(rows, splits)
    assert got == expected
