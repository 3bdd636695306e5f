"""Skew mitigation: salted join.

AQE's skew-join splitting (session.py turns it on) handles most skew at
runtime, but it only splits *sort-merge* partitions; a hand-salted join is
the explicit fallback when a hot key must be spread BEFORE the exchange —
e.g. a power-law user_id joining a non-broadcastable dimension.

Construction: the big (skewed) side gets a deterministic salt in
[0, n_salts); the small side is replicated once per salt value; the join key
becomes (key, salt), so a hot key's rows land on ``n_salts`` reducers
instead of one. Result is row-identical to the unsalted join — which the
DuckDB oracle proves (the salted query's oracle is the PLAIN join).

Cost model: small side inflates ×n_salts (acceptable when |small| ≪ |big|);
the big side's shuffle is unchanged in volume but balanced in placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 8, how: str = "inner"
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key spread applied.

    The salt must be deterministic per row (not ``rand()``) so retried tasks
    and oracle comparisons see stable placement — a hash of the whole row
    spreads even single-key hotspots uniformly.

    Only join types where an unmatched SMALL-side row is dropped (or merely
    filters) are allowed: for right/full outer joins the small side's
    replication would surface each unmatched small row ``n_salts`` times.
    """
    if how not in {"inner", "left", "left_semi", "left_anti"}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}:"
            " right/full outer would duplicate unmatched small-side rows"
            " once per salt"
        )
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return big_s.join(small_s, [key, "__salt"], how).drop("__salt")
