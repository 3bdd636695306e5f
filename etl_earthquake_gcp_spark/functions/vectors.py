"""Shared vector-column plumbing.

One canonical copy of the embedding cast+norm fold: the repo's
similarity parity contract depends on this EXACT expression shape (cast
each component to double BEFORE the sequential ``aggregate`` fold, so
Spark's arithmetic matches an ANSI oracle's DOUBLE sums up to the
accepted last-ulp class, which the 6dp ordering collapse absorbs).
Keeping it in one place means a future precision/ordering fix cannot
silently miss a copy (plans/vector_queries.py, operators/contrastive.py
and the round-7 preview tests all route through here).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cast_double_with_norm(
    df: DataFrame, keep: Sequence[str] = ("vec_id",)
) -> DataFrame:
    """Cast ``embedding`` float[] → double[] and attach its L2 norm.

    Returns ``(*keep, vec double[], norm double)`` — pass extra id/label
    columns via ``keep`` instead of re-deriving the fold at call sites.
    """
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x))
    return df.select(*keep, arr.alias("vec"), norm.alias("norm"))
