"""Round-7 query previews: full Spark-vs-DuckDB parity pairs for the two
banked embedding-curation surfaces (operators/contrastive.py,
operators/cluster_sample.py), verified NOW so a later registration is a
mechanical @register move.

Same contract as tests/test_round6_previews.py: each test runs the
planned queries() callable against the planned oracle_sql() string with
the driver-sim comparator, so the pair is already proven when promoted.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.operators import cluster_sample, contrastive
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR, assert_frames_match

_N_ANCHORS = 5  # vec_id < 5 are the anchors (house query-vector contract)
_NEG_K = 3
_N_CENTROIDS = 8  # vec_id < 8 are the deterministic centroids
_QUOTA = 40


def _duck(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{sf_dir}/embeddings.parquet')"
    )
    return con


# -- hard_negative_mining ----------------------------------------------------

HARD_NEGATIVE_ORACLE = f"""
    WITH exploded AS (
        SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ), norms AS (
        SELECT vec_id, max(label) AS label, sqrt(sum(x * x)) AS norm
        FROM exploded GROUP BY vec_id
    ), dots AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               sum(a.x * b.x) AS dot
        FROM exploded a
        JOIN exploded b ON a.i = b.i
        WHERE a.vec_id < {_N_ANCHORS} AND b.vec_id <> a.vec_id
          AND b.label <> a.label
        GROUP BY 1, 2
    )
    SELECT query_id, CAST(na.label AS BIGINT) AS query_label,
           neighbor_id, CAST(nb.label AS BIGINT) AS neighbor_label,
           round(d.dot / (na.norm * nb.norm), 4) AS cosine
    FROM dots d
    JOIN norms na ON d.query_id = na.vec_id
    JOIN norms nb ON d.neighbor_id = nb.vec_id
    WHERE na.norm > 0 AND nb.norm > 0
    QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY round(d.dot / (na.norm * nb.norm), 6) DESC, neighbor_id
    ) <= {_NEG_K}
"""


def hard_negative_mining(spark, sf_dir):
    emb = contrastive.with_norm_label(load_table(spark, sf_dir, "embeddings"))
    anchors = emb.filter(F.col("vec_id") < _N_ANCHORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col("label").alias("qlabel"),
    )
    return contrastive.hard_negatives(emb, anchors, k=_NEG_K)


def test_hard_negative_mining_oracle_parity(spark):
    spdf = hard_negative_mining(spark, SF_DIR).toPandas()
    opdf = _duck(SF_DIR).execute(HARD_NEGATIVE_ORACLE).df()
    assert_frames_match(spdf, opdf, "hard_negative_mining")
    assert len(spdf) == _N_ANCHORS * _NEG_K
    # the defining property: no negative shares its anchor's label
    assert (spdf["query_label"] != spdf["neighbor_label"]).all()


# -- cluster_quota_sample ----------------------------------------------------

_KEY8 = (
    "CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)"
)

CLUSTER_QUOTA_ORACLE = f"""
    WITH exploded AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ), norms AS (
        SELECT vec_id, sqrt(sum(x * x)) AS norm FROM exploded GROUP BY vec_id
    ), dots AS (
        SELECT v.vec_id, c.vec_id AS cluster_id, sum(v.x * c.x) AS dot
        FROM exploded v
        JOIN exploded c ON v.i = c.i
        WHERE c.vec_id < {_N_CENTROIDS}
        GROUP BY 1, 2
    ), assigned AS (
        SELECT d.vec_id, d.cluster_id
        FROM dots d
        JOIN norms nv ON d.vec_id = nv.vec_id
        JOIN norms nc ON d.cluster_id = nc.vec_id
        WHERE nv.norm > 0 AND nc.norm > 0
        QUALIFY row_number() OVER (
            PARTITION BY d.vec_id
            ORDER BY round(d.dot / (nv.norm * nc.norm), 6) DESC, d.cluster_id
        ) = 1
    ), keyed AS (
        SELECT cluster_id, {_KEY8} AS keep_key,
               row_number() OVER (
                   PARTITION BY cluster_id ORDER BY {_KEY8}, vec_id
               ) AS rnk
        FROM assigned
    )
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_assigned,
           CAST(sum(CASE WHEN rnk <= {_QUOTA} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN rnk <= {_QUOTA} THEN keep_key ELSE 0 END)
                AS BIGINT) AS kept_key_sum
    FROM keyed GROUP BY 1
"""


def cluster_quota_sample(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x))
    corpus = emb.select("vec_id", arr.alias("vec"), norm.alias("norm"))
    cents = corpus.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cluster_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    assigned = cluster_sample.assign_to_centroids(corpus, cents)
    sampled = cluster_sample.quota_sample(assigned, quota=_QUOTA)
    return cluster_sample.cluster_quota_summary(sampled)


def test_cluster_quota_sample_oracle_parity(spark):
    spdf = cluster_quota_sample(spark, SF_DIR).toPandas()
    opdf = _duck(SF_DIR).execute(CLUSTER_QUOTA_ORACLE).df()
    assert_frames_match(spdf, opdf, "cluster_quota_sample")
    assert len(spdf) > 0
    # quota binds: no cluster keeps more than _QUOTA, every vector assigned once
    assert (spdf["n_kept"] <= _QUOTA).all()
    assert (spdf["n_kept"] <= spdf["n_assigned"]).all()


def test_quota_sample_keeps_lowest_hash_members(spark):
    """Unit check on the library piece alone: the kept set per cluster is
    exactly the quota lowest (keep_key, id) members."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id")
    assigned = emb.withColumn("cluster_id", F.pmod("vec_id", F.lit(4)))
    out = cluster_sample.quota_sample(assigned, quota=5).toPandas()
    for _, grp in out.groupby("cluster_id"):
        ordered = grp.sort_values(["keep_key", "vec_id"])
        expect = set(ordered.head(5)["vec_id"])
        assert set(grp[grp["kept"]]["vec_id"]) == expect
