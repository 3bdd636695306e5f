"""Round-6 registrations: data-mixing and quantization surfaces.

The three banked library surfaces from operators/mixing.py and
operators/quantize.py, promoted to the driver registry per the SURVEY.md
round-6 registration plan. Each Spark/oracle pair was proven in
tests/test_round6_previews.py across round 5 (including the perturbed-
testdata rehearsal) before registration — this move is mechanical.

No reference counterpart (the reference's ETL ends at a star schema,
CarlosDiazData/etl-earthquake-gcp scripts/* stop at BI queries); these
extend the tier-4 LLM-pipeline surface: temperature mixing is the
multilingual-pretraining sampling pattern, the epoch shuffle is the
deterministic training-order primitive, and int8 quantization is the
embedding-store compression step of a retrieval index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import mixing, quantize
from ..sources.tables import load_table
from .registry import register

MIX_ALPHA = 0.3
SHUFFLE_EPOCH = 3
SHUFFLE_HEAD = 100


@register(
    "temperature_mix_weights",
    oracle=f"""
        WITH counts AS (
            SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY 1
        ), powed AS (
            SELECT source, n_tokens,
                   pow(n_tokens, {MIX_ALPHA}) AS p
            FROM counts WHERE n_tokens > 0
        )
        SELECT source, n_tokens,
               round(n_tokens * 1.0 / sum(n_tokens) OVER (), 6) AS raw_share,
               round(p / sum(p) OVER (), 6) AS weight,
               round((p / sum(p) OVER ())
                     / (n_tokens * 1.0 / sum(n_tokens) OVER ()), 4)
                   AS oversample
        FROM powed
    """,
    doc="temperature sampling weights (mC4/XLM-R mixing pattern) at "
    "alpha=0.3 over per-source token counts: one corpus scan to the "
    "count table, then a |sources|-row window stage "
    "(operators/mixing.py::temperature_weights). The facts are never "
    "rescanned — at 100 TB the mixing math runs on a dimension-sized "
    "frame.",
)
def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    )
    w = mixing.temperature_weights(
        counts, key_col="source", count_col="n_tokens", alpha=MIX_ALPHA
    )
    return w.select(
        "source",
        "n_tokens",
        F.round("raw_share", 6).alias("raw_share"),
        F.round("weight", 6).alias("weight"),
        F.round("oversample", 4).alias("oversample"),
    )


@register(
    "epoch_shuffle_order",
    oracle=f"""
        SELECT doc_id, shuffle_key, CAST(rn AS BIGINT) AS rn
        FROM (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                             || ':{SHUFFLE_EPOCH}'), 1, 8))
                        AS BIGINT) AS shuffle_key,
                   row_number() OVER (
                       ORDER BY
                           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                     || ':{SHUFFLE_EPOCH}'),
                                                1, 8)) AS BIGINT),
                           doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= {SHUFFLE_HEAD}
    """,
    doc="deterministic per-epoch training order: map-side "
    "portable_hash8(doc_id:epoch) key, no RNG state "
    "(operators/mixing.py::epoch_order). The head-100 selection is "
    "TakeOrderedAndProject (per-partition top-k, one k-sized merge) — "
    "the row_number that replays the exact order for the oracle runs "
    "AFTER the limit, over the 100-row head, never a single-partition "
    "window over the corpus.",
)
def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    head = (
        mixing.epoch_order(docs, epoch=SHUFFLE_EPOCH)
        .orderBy("shuffle_key", "doc_id")
        .limit(SHUFFLE_HEAD)
    )
    w = Window.orderBy("shuffle_key", "doc_id")
    return head.select(
        "doc_id",
        "shuffle_key",
        F.row_number().over(w).cast("long").alias("rn"),
    )


@register(
    "embedding_int8_quantize",
    oracle="""
        WITH exploded AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ), scales AS (
            SELECT vec_id,
                   CASE WHEN max(abs(x)) > 0 THEN max(abs(x)) / 127.0 END
                       AS sc
            FROM exploded GROUP BY 1
        ), codes AS (
            SELECT e.vec_id,
                   CASE WHEN s.sc IS NULL THEN 0
                        ELSE CAST(sign(e.x) * floor(abs(e.x) / s.sc + 0.5)
                                  AS INT) END AS q,
                   CASE WHEN s.sc IS NULL THEN 0.0
                        ELSE abs(e.x - CAST(sign(e.x)
                                 * floor(abs(e.x) / s.sc + 0.5) AS INT)
                                 * s.sc)
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
    """,
    doc="symmetric per-vector int8 quantization of the embedding store "
    "(operators/quantize.py): max-abs/127 scale, round-half-away codes, "
    "dequantize + reconstruction-error audit (err <= scale/2 certified "
    "in-row). Pure Catalyst array expressions — one scan, no shuffle, "
    "no Python; 4x store compression at 100 TB.",
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    q = q.withColumn("deq", quantize.dequantize(F.col("codes"), F.col("sc")))
    return q.select(
        "vec_id",
        F.round(F.coalesce("sc", F.lit(0.0)), 6).alias("scale"),
        F.aggregate(
            "codes", F.lit(0), lambda acc, c: F.greatest(acc, F.abs(c))
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
