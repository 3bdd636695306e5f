"""DSIR-style importance weighting for data selection (round-7 surface;
library-first so the plan shapes are tested before registration).

Data Selection with Importance Resampling (Xie et al., 2023): score
every raw-pool document by how much its hashed n-gram feature
distribution looks like a target domain, then sample the raw pool
proportionally to the importance weight. The classic recipe:

1. hash each word bigram into one of B buckets (hashed n-gram features);
2. estimate bucket distributions p_target and p_raw with add-1
   smoothing over the B buckets;
3. a document's log importance weight is the sum over its bigram
   occurrences of ``ln(p_target[f] / p_raw[f])``.

Engine-portable numerics follow the repo's quantized-term-sum rule
(bigram_lm_loglik, r5 hardening): each bucket's log-ratio is computed
from EXACT integer counts (one double division + one ``ln`` — libm can
differ in the last ulp across engines, which the single 1e-6
quantization absorbs as the accepted ulp class), quantized ONCE to
integer 1e-6 units, and the per-document score is an exact integer sum
— no combine-order drift, no coarser re-round hazard (display goes
through the integer half-away helper).

Scale shape: bucket stats are a B-row table (B ≈ 1e4 in the paper;
always broadcastable), so scoring is one bigram explode + a broadcast
join + one groupBy(doc_id) — the corpus shuffles once, on doc_id-sized
partial sums. The target/raw split here is a deterministic doc_id
residue (a stand-in for "docs matching the target domain"); callers
substitute any boolean column.

No reference counterpart (the reference's ETL ends at a star schema);
this extends the tier-4 LLM-pipeline surface like operators/mixing.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import portable_hash8


def hashed_bigram_features(
    docs: DataFrame, n_buckets: int = 256, text_col: str = "text"
) -> DataFrame:
    """One row per bigram occurrence: (doc_id, f) with
    ``f = portable_hash8(w1 || ' ' || w2) mod n_buckets`` — the hashed
    n-gram featurizer. Documents with < 2 tokens contribute nothing
    (symmetric on both engines: no bigrams exist)."""
    grams = (
        docs.select("doc_id", F.split(text_col, " ").alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> concat(element_at(toks, i), ' ',"
                    " element_at(toks, i + 1)))"
                )
            ).alias("gram"),
        )
    )
    return grams.select(
        "doc_id",
        F.pmod(portable_hash8(F.col("gram")), F.lit(n_buckets)).alias("f"),
    )


def bucket_log_ratio_units(
    feats: DataFrame, is_target: Column, n_buckets: int = 256
) -> DataFrame:
    """Per-bucket quantized log importance ratio: one row per bucket id
    in [0, n_buckets) with ``lr_u`` = round(1e6 · ln(p_t[f] / p_r[f]))
    as BIGINT, add-1 smoothed over the n_buckets vocabulary.

    The ratio is formed as (n_t+1)(R+B) / (n_r+1)(T+B): every factor is
    an exact integer below 2^53, so both engines feed ``ln`` the
    IDENTICAL double and the single quantization is the only float
    round. Unseen buckets get the smoothed floor (the generated
    bucket-id spine left-joins the counts)."""
    spark = feats.sparkSession
    cnt = feats.groupBy("f").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(is_target, 0).otherwise(1)).cast("long").alias("n_r"),
    )
    spine = spark.range(n_buckets).select(F.col("id").alias("f"))
    buckets = (
        spine.join(cnt, "f", "left")
        .fillna(0, subset=["n_t", "n_r"])
    )
    tot = cnt.agg(
        F.sum("n_t").cast("long").alias("t_tot"),
        F.sum("n_r").cast("long").alias("r_tot"),
    )
    b = int(n_buckets)
    num = (F.col("n_t") + 1).cast("double") * (F.col("r_tot") + b)
    den = (F.col("n_r") + 1).cast("double") * (F.col("t_tot") + b)
    # CROSSJOIN: 1-row corpus-totals frame
    return buckets.crossJoin(F.broadcast(tot)).select(
        "f",
        F.round(F.log(num / den) * 1_000_000, 0).cast("long").alias("lr_u"),
    )


def importance_scores(
    feats: DataFrame, ratios: DataFrame
) -> DataFrame:
    """Per-document integer importance score: (doc_id, n_feats, s_u)
    where ``s_u`` is the EXACT integer sum of the document's bucket
    log-ratio units. The ratio table is bucket-sized → broadcast; the
    only shuffle is the groupBy(doc_id) partial-sum exchange."""
    return (
        feats.join(F.broadcast(ratios), "f")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("lr_u").cast("long").alias("s_u"),
        )
    )
