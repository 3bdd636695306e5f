"""Winnowing document fingerprints (round-7 surface; library-first so
the plan shapes are tested before registration).

Schleimer/Wilkerson/Aiken's winnowing (the MOSS algorithm): hash every
k-gram, slide a window of w consecutive k-gram hashes, and keep the
minimum hash of each window as a fingerprint. Guarantees: any shared
substring of length ≥ w + k − 1 tokens produces at least one shared
fingerprint, while the fingerprint density stays ~2/(w+1) — the
partial-overlap detector that whole-document hashing
(plans/text_queries.py doc_fingerprints) cannot provide and MinHash
only approximates. This is the value-emitting variant (fingerprint =
min VALUE per window, not its position), which makes the operator pure
integer arithmetic and bit-identical across engines — no tie rule
needed, since equal values are one fingerprint.

Scale shape: fingerprint extraction is a map-side array pipeline in
whole-stage codegen (no shuffle); the match step is a bucket equi-join
on the fingerprint key — the banded-LSH shape, never all-pairs — with a
frequency cap that drops ubiquitous fingerprints (boilerplate) before
the join, exactly as deployed winnowing systems do. Candidate volume is
bounded by cap² per fingerprint bucket.

No reference counterpart (the reference's ETL ends at a star schema);
this extends the tier-4 LLM-pipeline surface like operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprints(
    docs: DataFrame, k: int = 4, w: int = 5, text_col: str = "text"
) -> DataFrame:
    """Distinct winnowing fingerprints per document: one row per
    (doc_id, fp) where ``fp`` is the min ``portable_hash8`` of a
    w-window of token k-gram hashes. Documents shorter than
    ``k + w - 1`` tokens emit nothing (no full window exists —
    symmetric on both engines)."""
    toks = F.split(F.col(text_col), " ")
    # k-gram hash array, then per-window minima — all inside codegen
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {k - 1}),"
        f" i -> cast(conv(substr(md5(array_join(slice(toks, i, {k}), ' ')),"
        " 1, 8), 16, 10) as bigint))"
    )
    mins = F.expr(
        f"transform(sequence(1, size(hs) - {w - 1}),"
        f" j -> array_min(slice(hs, j, {w})))"
    )
    return (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= k + w - 1)
        .select("doc_id", grams.alias("hs"))
        .select("doc_id", F.explode(mins).alias("fp"))
        .distinct()
    )


def match_pairs(
    fps: DataFrame, min_shared: int = 2, max_doc_freq: int = 64
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` fingerprints.

    Fingerprints present in more than ``max_doc_freq`` documents are
    dropped BEFORE the join (ubiquitous = boilerplate, and the cap
    bounds each bucket's candidate volume at cap²); the remaining
    equi-join on ``fp`` is the banded-LSH bucket shape. Ordered pairs
    (doc_a < doc_b) with the exact shared-fingerprint count."""
    rare = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_doc_freq)
        .select("fp")
    )
    pruned = fps.join(rare, "fp")
    a = pruned.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    b = pruned.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
