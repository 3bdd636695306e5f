"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For every left row, attach the most recent right row with the same key and
time ≤ the left row's time. The naive formulation (theta-join on
``r.t <= l.t`` + argmax) explodes to O(|L|·|R|) pairs per key; this
implementation uses the union-sort trick instead:

    tag both streams → unionByName → one hash-partition(key) exchange →
    sort (t, is_right_first) → last(value, ignorenulls) running window →
    keep left rows.

Cost is a single shuffle + sort of |L|+|R| rows — the same plan shape as a
window aggregate, which is what survives at 100 TB (DuckDB/kdb implement
ASOF JOIN with the equivalent merge pass). Ties at equal t: the right row
sorts before the left row (at-or-before semantics), and among equal-t right
rows the largest tie-break key wins (deterministic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    right_value_cols: Sequence[str],
    tie_col: str,
) -> DataFrame:
    """Left as-of-backward join on ``key``/``time_col`` (epoch-ms long).

    Returns all left columns plus ``asof_<c>`` for each right value column
    (NULL when no right row precedes the left row).
    """
    left_cols = [c for c in left.columns]
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(time_col).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tie"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"asof_{c}") for c in right_value_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(time_col).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(tie_col).cast("long").alias("__tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"asof_{c}") for c in right_value_cols],
    )
    # right rows sort before left rows at equal t → "at-or-before" includes
    # same-instant right rows; __tie orders equal-t right rows (max wins)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__is_left", F.col("__tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *left_cols,
        "__is_left",
        *[
            F.last(f"asof_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")
