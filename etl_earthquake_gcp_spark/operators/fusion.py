"""Reciprocal rank fusion for multi-retriever search (round-7 surface;
library-first so the plan shapes are tested before registration).

RRF (Cormack/Clarke/Buettcher): fuse any number of rankers by scoring
each item ``sum over rankers of 1 / (k + rank)`` — the standard hybrid-
search combiner (lexical + semantic retrieval) because it needs no
score calibration, only ranks. This implementation keeps the whole
computation engine-exact: ranks are integers from deterministic
(6dp-collapsed key, id tie-break) windows, each reciprocal term is
quantized ONCE to integer units (``round(unit / (k + rank))`` — a
single round of a raw double, the accepted ulp class; every ties-at-.5
case is dyadic-exact and both engines round it away from zero), and the
fused score is an EXACT integer sum — no combine-order drift, fully
replayable by an ANSI oracle.

Scale shape: rankers produce truncated top-K lists per query (K rows ×
queries — tiny relative to the corpus scan that produced them), so
fusion is a union + one groupBy on (query, item) partial-sum exchange
over list-sized data. The expensive part is the retrieval itself, which
reuses the repo's proven cosine/ANN plans.

No reference counterpart (the reference's ETL ends at a star schema);
this extends the tier-4 LLM-pipeline surface like operators/mixing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_scores(
    ranked: DataFrame, k: int = 60, unit: int = 1_000_000
) -> DataFrame:
    """Fuse ranked lists: input one row per (query_id, item_id, rank)
    per ranker (an item absent from a ranker's list simply contributes
    no term — the standard truncated-list semantics). Output one row
    per (query_id, item_id) with ``n_lists`` (how many rankers surfaced
    it) and the exact integer fused score ``rrf_u``."""
    term = F.round(F.lit(float(unit)) / (F.lit(k) + F.col("rank")), 0).cast(
        "long"
    )
    return (
        ranked.select("query_id", "item_id", term.alias("t"))
        .groupBy("query_id", "item_id")
        .agg(
            F.count("*").cast("long").alias("n_lists"),
            F.sum("t").cast("long").alias("rrf_u"),
        )
    )


def top_fused(fused: DataFrame, top_n: int = 10) -> DataFrame:
    """Per-query top-N by the exact integer fused score (item id
    tie-break — a pure integer ordering, no float hazard anywhere)."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_u"), F.col("item_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= top_n)
        .select(
            "query_id",
            "item_id",
            F.col("fused_rank").cast("long").alias("fused_rank"),
            "n_lists",
            "rrf_u",
        )
    )
