"""Similarity-search queries over the ``embeddings`` table.

SURVEY.md §7 tier 4(b): brute-force cosine top-k as the exact baseline
(oracle-checked against DuckDB double-precision math), plus an LSH-bucketed
approximate variant as the 100 TB scale path (rows-only check — hash families
aren't bit-identical across engines).

All vector math stays JVM-side: ``zip_with`` + ``aggregate`` higher-order
functions, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

_N_QUERIES = 5  # vec_id < 5 are the query vectors
_TOP_K = 3


def _with_norm(df: DataFrame) -> DataFrame:
    """Cast embedding float[] → double[] and attach its L2 norm."""
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x))
    return df.select("vec_id", arr.alias("vec"), norm.alias("norm"))


_NEAR_DUP_THRESHOLD = 0.35  # corpus is near-random; 0.35 keeps ~0.2% of pairs


@register(
    "embedding_cosine_near_dup",
    oracle=f"""
        WITH exploded AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ), norms AS (
            SELECT vec_id, sqrt(sum(x * x)) AS norm FROM exploded GROUP BY vec_id
        ), dots AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.x * b.x) AS dot
            FROM exploded a
            JOIN exploded b ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2
        )
        SELECT vec_a, vec_b,
               round(d.dot / (na.norm * nb.norm), 4) AS cosine
        FROM dots d
        JOIN norms na ON d.vec_a = na.vec_id
        JOIN norms nb ON d.vec_b = nb.vec_id
        WHERE d.dot / (na.norm * nb.norm) >= {_NEAR_DUP_THRESHOLD}
    """,
    doc="embedding-cosine near-duplicate pairs (dedup family, exact "
    f"baseline): all pairs with cosine >= {_NEAR_DUP_THRESHOLD}. O(n²) by "
    "construction — the certified reference output; the sub-quadratic scale "
    "path over the same semantics is ann_lsh_bucketed (LSH prefilter, exact "
    "verify), mirroring the jaccard↔minhash pairing on text.",
)
def embedding_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    a, b = emb.alias("a"), emb.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.vec"), F.col("b.vec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = dot / (F.col("a.norm") * F.col("b.norm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= _NEAR_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cosine"))
    )


@register(
    "cosine_topk_pandas",
    # identical semantics to cosine_topk_bruteforce → same oracle
    oracle=f"""
        WITH exploded AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ), norms AS (
            SELECT vec_id, sqrt(sum(x * x)) AS norm FROM exploded GROUP BY vec_id
        ), dots AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   sum(a.x * b.x) AS dot
            FROM exploded a
            JOIN exploded b ON a.i = b.i
            WHERE a.vec_id < {_N_QUERIES} AND b.vec_id <> a.vec_id
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id,
               round(d.dot / (na.norm * nb.norm), 4) AS cosine
        FROM dots d
        JOIN norms na ON d.query_id = na.vec_id
        JOIN norms nb ON d.neighbor_id = nb.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY query_id
            ORDER BY round(d.dot / (na.norm * nb.norm), 6) DESC, neighbor_id
        ) <= {_TOP_K}
    """,
    doc="cosine top-k via Arrow-vectorized numpy matmul (mapInPandas): the "
    "query matrix (tiny) is closure-broadcast to every batch; the corpus "
    "streams through Python once, one BLAS sgemm per Arrow batch, no "
    "shuffle until the final per-query top-k. Same oracle as the JVM "
    "zip_with variant — the differential check certifies the Arrow path; "
    "bench.py races the two implementations.",
    bench=True,
)
def cosine_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    qrows = sorted(
        emb.filter(F.col("vec_id") < _N_QUERIES).collect(),
        key=lambda r: r.vec_id,
    )
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    qmat = np.array([r.vec for r in qrows], dtype=np.float64)
    qnorm = np.array([r.norm for r in qrows], dtype=np.float64)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cmat = np.array(pdf["vec"].tolist(), dtype=np.float64)
            # (batch × dim) @ (dim × queries) → every dot in one BLAS call
            dots = cmat @ qmat.T
            cos = dots / np.outer(pdf["norm"].to_numpy(), qnorm)
            n, q = cos.shape
            yield pd.DataFrame(
                {
                    "query_id": np.tile(qids, n),
                    "neighbor_id": np.repeat(pdf["vec_id"].to_numpy(), q),
                    "cos_raw": cos.ravel(),
                }
            )

    scored = emb.mapInPandas(
        score_batches, schema="query_id long, neighbor_id long, cos_raw double"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_raw"), 6).desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cosine"))
    )


_IVF_CELLS = 16
_IVF_NPROBE = 4


@register(
    "ann_ivf_topk",
    oracle=None,  # cluster assignment is trainer-specific → rows-only check
    doc=f"IVF (inverted-file) ANN: MLlib KMeans (k={_IVF_CELLS}, seed 42) "
    "coarse-quantizes unit vectors into cells; each query probes its "
    f"{_IVF_NPROBE} nearest cells and reranks exactly inside them. At scale "
    "the corpus is partitioned/bucketed BY cell id, so a query touches "
    f"{_IVF_NPROBE}/{_IVF_CELLS} of the data — complementary to "
    "ann_lsh_bucketed (hash buckets vs learned cells). Recall vs brute "
    "force asserted in tests/test_ann_ivf.py.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    unit = emb.select(
        "vec_id",
        "vec",
        "norm",
        array_to_vector(
            F.transform("vec", lambda x: x / F.col("norm"))
        ).alias("features"),
    )
    km = KMeans(k=_IVF_CELLS, seed=42, maxIter=10).fit(unit.select("features"))
    assigned = km.transform(unit).select(
        "vec_id", "vec", "norm", F.col("prediction").alias("cell")
    )

    centroids = np.vstack(km.clusterCenters())
    qrows = sorted(
        assigned.filter(F.col("vec_id") < _N_QUERIES).collect(),
        key=lambda r: r.vec_id,
    )
    # query→probe-cell fan-out computed driver-side (queries × cells is tiny)
    probe_rows = []
    for r in qrows:
        q = np.array(r.vec) / r.norm
        order = np.argsort(((centroids - q) ** 2).sum(axis=1))
        probe_rows.extend(
            (int(r.vec_id), list(r.vec), float(r.norm), int(c))
            for c in order[:_IVF_NPROBE]
        )
    probes = spark.createDataFrame(
        probe_rows, "query_id long, qvec array<double>, qnorm double, cell int"
    )

    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = dot / (F.col("norm") * F.col("qnorm"))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_raw"), 6).desc(), F.col("neighbor_id")
    )
    return (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cos_raw")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cosine"))
    )


_LSH_TABLES = 2  # OR-amplification: a pair collides if ANY table buckets it
_LSH_PLANES = 4  # AND within a table: 4 sign bits per bucket id
_LSH_SIM_THRESHOLD = 0.25  # corpus is near-random (max pairwise cos ≈ 0.51)


@register(
    "ann_lsh_bucketed",
    oracle=None,  # hash-family dependent → rows-only driver check
    doc="approximate near-pair search via random-hyperplane LSH: "
    f"{_LSH_TABLES} tables × {_LSH_PLANES} signed projections (fixed seed, "
    "plan-literal planes) → bucket equi-join per table → union → exact "
    "cosine only on collided pairs. The sub-quadratic ANN scale path "
    "(tier-4): candidate pairs ≪ n², shuffle keyed on 4-bit bucket ids. "
    "Rows-only check (hash family engine-specific); recall vs brute force "
    "asserted in tests/test_plans.py.",
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import random

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    dim = 64
    rng = random.Random(42)

    def projection_bits(n_planes: int) -> F.Column:
        planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
        # sign bits of fixed projections (planes are literals baked into the
        # plan — deterministic across runs, no runtime randomness)
        return F.concat(
            *[
                (
                    F.aggregate(
                        F.zip_with(
                            F.col("vec"),
                            F.array(*[F.lit(p) for p in plane]),
                            lambda x, y: x * y,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    >= 0
                ).cast("int").cast("string")
                for plane in planes
            ]
        )

    sigd = emb.select(
        "vec_id",
        "vec",
        "norm",
        *[projection_bits(_LSH_PLANES).alias(f"b{t}") for t in range(_LSH_TABLES)],
    )

    dot = F.aggregate(
        F.zip_with(F.col("a.vec"), F.col("b.vec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = dot / (F.col("a.norm") * F.col("b.norm"))

    candidates = None
    for t in range(_LSH_TABLES):
        pairs_t = (
            sigd.alias("a")
            .join(
                sigd.alias("b"),
                (F.col(f"a.b{t}") == F.col(f"b.b{t}"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                F.round(sim, 4).alias("cosine"),
            )
        )
        candidates = pairs_t if candidates is None else candidates.unionByName(pairs_t)

    return (
        candidates.filter(F.col("cosine") >= _LSH_SIM_THRESHOLD)
        .dropDuplicates(["vec_a", "vec_b"])  # same pair may collide in both tables
    )


@register(
    "embedding_centroids_by_label",
    oracle="""
        WITH exploded AS (
            SELECT CAST(label AS BIGINT) AS label,
                   generate_subscripts(embedding, 1) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        )
        SELECT label, CAST(pos AS BIGINT) AS pos,
               round(avg(x), 4) AS centroid,
               CAST(count(*) AS BIGINT) AS n_vectors
        FROM exploded GROUP BY 1, 2
    """,
    doc="per-label centroid vectors — the reduce step of k-means / the "
    "class-prototype computation for embedding pipelines: posexplode the "
    "vector, partial-agg avg per (label, dimension). One dimension-"
    "factored shuffle of |labels|x|dims| cells regardless of row count — "
    "the map-side combine does the 100 TB heavy lifting. Emitted in "
    "(label, pos, value) long form, 1-based pos to match SQL "
    "generate_subscripts.",
)
def embedding_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(
            F.col("label").cast("long").alias("label"),
            F.posexplode(
                F.transform(F.col("embedding"), lambda x: x.cast("double"))
            ).alias("pos0", "x"),
        )
        .groupBy("label", (F.col("pos0") + 1).cast("long").alias("pos"))
        .agg(
            F.round(F.avg("x"), 4).alias("centroid"),
            F.count("*").alias("n_vectors"),
        )
    )


# --- round-1 driver-verified queries register LAST: the driver checks
# registration order and these two already have green CORRECTNESS_r01 rows,
# so the five queries above take the earlier driver slots (plans/__init__.py) ---
@register(
    "cosine_topk_bruteforce",
    oracle=f"""
        WITH exploded AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ), norms AS (
            SELECT vec_id, sqrt(sum(x * x)) AS norm FROM exploded GROUP BY vec_id
        ), dots AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   sum(a.x * b.x) AS dot
            FROM exploded a
            JOIN exploded b ON a.i = b.i
            WHERE a.vec_id < {_N_QUERIES} AND b.vec_id <> a.vec_id
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id,
               round(d.dot / (na.norm * nb.norm), 4) AS cosine
        FROM dots d
        JOIN norms na ON d.query_id = na.vec_id
        JOIN norms nb ON d.neighbor_id = nb.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY query_id
            ORDER BY round(d.dot / (na.norm * nb.norm), 6) DESC, neighbor_id
        ) <= {_TOP_K}
    """,
    doc=f"brute-force cosine top-{_TOP_K} for {_N_QUERIES} query vectors "
    "(tier-4 ANN exact baseline). zip_with+aggregate dot product (JVM "
    "higher-order fns, no UDF); queries broadcast, so the big side never "
    "shuffles — at 100 TB this is one scan + per-partition top-k.",
    bench=True,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    # broadcast the tiny query set against the full corpus (scan-only big side)
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = dot / (F.col("norm") * F.col("qnorm"))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_raw"), 6).desc(), F.col("neighbor_id")
    )
    return (
        pairs.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cos_raw")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cosine"))
    )


@register(
    "embedding_norm_stats",
    oracle="""
        WITH exploded AS (
            SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        )
        SELECT label,
               CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vectors,
               round(avg(x), 4) AS avg_component,
               round(min(x), 4) AS min_component,
               round(max(x), 4) AS max_component
        FROM exploded
        GROUP BY label
    """,
    doc="per-label embedding component stats via array explode (vector "
    "column plumbing sanity; F.explode over array<float> ≡ DuckDB lateral "
    "range join).",
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "vec_id",
            "label",
            F.explode(F.transform("embedding", lambda x: x.cast("double"))).alias("x"),
        )
        .groupBy("label")
        .agg(
            F.countDistinct("vec_id").alias("n_vectors"),
            F.round(F.avg("x"), 4).alias("avg_component"),
            F.round(F.min("x"), 4).alias("min_component"),
            F.round(F.max("x"), 4).alias("max_component"),
        )
    )
