"""Deterministic stratified dataset splits (round-9 surface;
library-first so the plan shapes are tested before registration).

Train/val/test assignment that is (a) exactly proportioned per stratum
— each stratum's split sizes are a largest-remainder (Hamilton)
apportionment of its row count, so they sum to the stratum size and
never drift more than one row from the requested share — and (b) fully
deterministic: the order inside a stratum is the portable md5-derived
shuffle key (no rand(), no seed state), so any engine replays the exact
assignment. The apportionment is
operators/mixing.py::grouped_budget_allocation — the per-group
Hamilton the global budget_allocation delegates to (windows
partitioned by the group; every window runs over |splits| rows per
group).

Everything after the single 1e-6 weight quantization is integer
arithmetic — floor quotas, mod remainders, an integer shortfall in
[0, |splits|) topped up by largest remainder with a fixed
(remainder DESC, split name) tie order — so an ANSI oracle replays the
apportionment bit-for-bit.

Scale shape: quota computation is |groups × splits| rows; rank
assignment is one per-group window sort (the shuffle-key order must be
materialized anyway to write split files); the quota join is a
broadcast range join on (group, rank interval).

No reference counterpart (the reference's ML job uses a seeded
randomSplit); this is the deterministic, stratum-exact version a
100 TB corpus needs so re-runs and engines agree on every row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import portable_hash8
from .mixing import grouped_budget_allocation


def stratified_split_assign(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    splits: list[tuple[str, float]],
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split, exactly proportioned within
    its stratum. Rows are ordered by (portable_hash8(id:salt), id)
    inside each stratum; split boundaries are the running Hamilton
    quotas in the caller-given split order. Adds ``split``."""
    sizes = df.groupBy(strata_col).agg(
        F.count("*").cast("long").alias("_n")
    )
    split_rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("split"),
                F.lit(float(w)).alias("weight"),
                F.lit(i).alias("ord"),
            )
            for i, (name, w) in enumerate(splits)
        ]
    )
    weights = sizes.select(
        strata_col, "_n", F.explode(split_rows).alias("s")
    ).select(strata_col, "_n", "s.split", "s.weight", "s.ord")
    quotas = grouped_budget_allocation(
        weights, strata_col, "_n", "split", "weight"
    ).join(
        weights.select(strata_col, "split", "ord"), [strata_col, "split"]
    )
    cum_w = (
        Window.partitionBy(strata_col)
        .orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bounds = quotas.select(
        F.col(strata_col).alias("_g"),
        "split",
        (F.sum("quota").over(cum_w) - F.col("quota")).alias("lo"),
        F.sum("quota").over(cum_w).alias("hi"),
    )
    rank_w = Window.partitionBy(strata_col).orderBy(
        portable_hash8(
            F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))
        ),
        id_col,
    )
    ranked = df.withColumn("_rn", F.row_number().over(rank_w))
    return (
        ranked.join(
            F.broadcast(bounds),
            (ranked[strata_col] == bounds["_g"])
            & (bounds["lo"] < F.col("_rn"))
            & (F.col("_rn") <= bounds["hi"]),
        )
        .drop("_g", "lo", "hi", "_rn")
    )
