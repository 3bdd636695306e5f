"""Round-6 query previews: the full Spark-vs-DuckDB parity pairs for the
three banked library surfaces (operators/mixing.py, operators/quantize.py),
verified NOW so round-6 registration is a mechanical @register move.

Each test runs the planned queries() callable against the planned
oracle_sql() string with the same comparator the driver sim uses —
when these are promoted to the registry, the pairs are already proven.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.operators import mixing, quantize
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR, assert_frames_match

_MIX_ALPHA = 0.3


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# -- temperature_mix_weights ------------------------------------------------

TEMPERATURE_MIX_ORACLE = f"""
    WITH counts AS (
        SELECT source,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1
    ), powed AS (
        SELECT source, n_tokens,
               pow(n_tokens, {_MIX_ALPHA}) AS p
        FROM counts WHERE n_tokens > 0
    )
    SELECT source, n_tokens,
           round(n_tokens * 1.0 / sum(n_tokens) OVER (), 6) AS raw_share,
           round(p / sum(p) OVER (), 6) AS weight,
           round((p / sum(p) OVER ())
                 / (n_tokens * 1.0 / sum(n_tokens) OVER ()), 4)
               AS oversample
    FROM powed
"""


def temperature_mix_weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    )
    w = mixing.temperature_weights(
        counts, key_col="source", count_col="n_tokens", alpha=_MIX_ALPHA
    )
    return w.select(
        "source",
        "n_tokens",
        F.round("raw_share", 6).alias("raw_share"),
        F.round("weight", 6).alias("weight"),
        F.round("oversample", 4).alias("oversample"),
    )


def test_temperature_mix_weights_oracle_parity(spark):
    spdf = temperature_mix_weights(spark, SF_DIR).toPandas()
    opdf = _duck(SF_DIR).execute(TEMPERATURE_MIX_ORACLE).df()
    assert_frames_match(spdf, opdf, "temperature_mix_weights")
    assert len(spdf) > 0


# -- epoch_shuffle_order ----------------------------------------------------

_EPOCH = 3
_SHUFFLE_HEAD = 100

EPOCH_SHUFFLE_ORACLE = f"""
    SELECT doc_id, shuffle_key, CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                         || ':{_EPOCH}'), 1, 8)) AS BIGINT)
                   AS shuffle_key,
               row_number() OVER (
                   ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                     || ':{_EPOCH}'), 1, 8))
                                 AS BIGINT), doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= {_SHUFFLE_HEAD}
"""


def epoch_shuffle_order(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ordered = mixing.epoch_order(docs, epoch=_EPOCH)
    from pyspark.sql import Window

    w = Window.orderBy("shuffle_key", "doc_id")
    return (
        ordered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SHUFFLE_HEAD)
        .select("doc_id", "shuffle_key", F.col("rn").cast("long").alias("rn"))
    )


def test_epoch_shuffle_order_oracle_parity(spark):
    spdf = epoch_shuffle_order(spark, SF_DIR).toPandas()
    opdf = _duck(SF_DIR).execute(EPOCH_SHUFFLE_ORACLE).df()
    assert_frames_match(spdf, opdf, "epoch_shuffle_order")
    assert len(spdf) == _SHUFFLE_HEAD


# -- embedding_int8_quantize ------------------------------------------------

EMBEDDING_INT8_ORACLE = """
    WITH exploded AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ), scales AS (
        SELECT vec_id,
               CASE WHEN max(abs(x)) > 0 THEN max(abs(x)) / 127.0 END AS sc
        FROM exploded GROUP BY 1
    ), codes AS (
        SELECT e.vec_id,
               CASE WHEN s.sc IS NULL THEN 0
                    ELSE CAST(sign(e.x) * floor(abs(e.x) / s.sc + 0.5)
                              AS INT) END AS q,
               CASE WHEN s.sc IS NULL THEN 0.0
                    ELSE abs(e.x - CAST(sign(e.x)
                             * floor(abs(e.x) / s.sc + 0.5) AS INT) * s.sc)
               END AS err
        FROM exploded e JOIN scales s USING (vec_id)
    )
    SELECT c.vec_id,
           round(coalesce(s.sc, 0.0), 6) AS scale,
           CAST(max(abs(c.q)) AS BIGINT) AS max_code,
           CAST(sum(CASE WHEN c.q = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero,
           max(c.err) <= coalesce(s.sc, 0.0) / 2 + 1e-12 AS err_bounded
    FROM codes c JOIN scales s USING (vec_id)
    GROUP BY c.vec_id, s.sc
"""


def embedding_int8_quantize(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    scale = quantize.int8_scale(F.col("vec"))
    q = emb.select(
        "vec_id",
        "vec",
        scale.alias("sc"),
        quantize.quantize_int8(F.col("vec"), scale).alias("codes"),
    )
    q = q.withColumn(
        "deq", quantize.dequantize(F.col("codes"), F.col("sc"))
    )
    return q.select(
        "vec_id",
        F.round(F.coalesce("sc", F.lit(0.0)), 6).alias("scale"),
        F.aggregate(
            "codes",
            F.lit(0),
            lambda acc, c: F.greatest(acc, F.abs(c)),
        )
        .cast("long")
        .alias("max_code"),
        F.aggregate(
            "codes",
            F.lit(0),
            lambda acc, c: acc + F.when(c == 0, 1).otherwise(0),
        )
        .cast("long")
        .alias("n_zero"),
        (
            quantize.reconstruction_error(F.col("vec"), F.col("deq"))
            <= F.coalesce("sc", F.lit(0.0)) / 2 + F.lit(1e-12)
        ).alias("err_bounded"),
    )


def test_embedding_int8_quantize_oracle_parity(spark):
    spdf = embedding_int8_quantize(spark, SF_DIR).toPandas()
    opdf = _duck(SF_DIR).execute(EMBEDDING_INT8_ORACLE).df()
    assert_frames_match(spdf, opdf, "embedding_int8_quantize")
    assert bool(spdf["err_bounded"].all())
