"""Deterministic weighted sampling (round-8 surface; library-first so
the plan shapes are tested before registration).

Efraimidis–Spirakis A-Res: to draw N items WITHOUT replacement with
probability proportional to a weight ``w``, give every item the key
``u^(1/w)`` for an independent uniform ``u`` and keep the N largest —
equivalently the N largest ``ln(u)/w``, which is what we compute. The
"randomness" is the repo's portable two-round hash of the item id
(Knuth multiplicative round, then an independent multiply-add round —
bijective on [0, p), unlike a squaring round, which only lands on
quadratic residues and skews the draw), so the draw is fully
deterministic and replayable by an ANSI oracle: both engines hash,
transform, and select the exact same set.

Parity note: ``ln`` is the one libm call; its argument is an exact
dyadic rational (hash/2^31) and the result is immediately floored at
1e-9 units into a BIGINT key, so a cross-engine last-ulp difference
would have to straddle an exact integer boundary to flip the key — the
same absorbed-by-single-quantization argument as operators/dsir.py's
log-ratio features. All comparisons after that are pure integer.

Scale shape: key assignment is a map-side expression (no shuffle); the
top-N selection is Spark's TakeOrdered (per-partition top-N, then a
driver-side merge of N-sized heads) — no global sort ever materializes.

No reference counterpart (the reference's ETL ends at a star schema);
this extends the tier-4 LLM-pipeline surface like operators/mixing.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_A = 2654435761  # Knuth multiplicative constant (shared house hash)
HASH_P = 2147483647  # 2^31 - 1; products stay below 2^62 under ANSI
HASH_A_RED = HASH_A % HASH_P  # 506952114: (A·x) mod p == ((A mod p)·x) mod p
HASH_B = 2246822519  # xxhash PRIME32_2 — second, independent multiplier
HASH_B_RED = HASH_B % HASH_P  # 99338872, same mod-p reduction argument
HASH_C = 1013904223  # Numerical Recipes LCG increment (odd additive)
KEY_UNIT = 1_000_000_000  # 1e-9-unit integer keys


def portable_uniform(id_col: Column) -> Column:
    """Deterministic uniform in (0, 1]: two multiplicative-hash rounds
    (one round is not mixed enough for sequential ids — measured on the
    HLL sketch), then scale into the unit interval as an exact dyadic
    rational.

    The second round is a MULTIPLY-ADD with an independent constant,
    not a squaring: h → (h·h) mod p only lands on quadratic residues
    (~half the range, each hit twice — r5 ADVICE), which skews
    Efraimidis–Spirakis inclusion probabilities; (h·B + C) mod p is a
    bijection on [0, p), so the output is exactly as equidistributed
    as h1. The id is pmod-reduced first — Spark/DuckDB ``%`` keeps the
    dividend's sign, and a negative remainder would push u ≤ 0 and
    NULL the ln-key (same ADVICE item).

    All products stay below 2^62 under ANSI for ARBITRARY BIGINT ids:
    r < p, so r·A_RED < p·5.07e8 ≈ 1.1e18 and h1·B_RED + C <
    p·9.94e7 + 1e9 ≈ 2.2e17 (a raw ``id * A`` would overflow past
    id ≈ 3.47e9, well inside a 100 TB corpus)."""
    r = (id_col.cast("long") % F.lit(HASH_P) + F.lit(HASH_P)) % F.lit(
        HASH_P
    )
    h1 = (r * F.lit(HASH_A_RED)) % F.lit(HASH_P)
    h2 = (h1 * F.lit(HASH_B_RED) + F.lit(HASH_C)) % F.lit(HASH_P)
    return (h2 + 1) / F.lit(2147483648.0)


def es_sample_keys(
    df: DataFrame, weight_col: str, id_col: str
) -> DataFrame:
    """Attach the integer Efraimidis–Spirakis key ``key_n =
    floor(1e9 * ln(u) / w)`` (always negative: u < 1 by construction).
    Rows with non-positive weight are dropped — symmetric with the
    oracle's guard."""
    u = portable_uniform(F.col(id_col))
    key = F.floor(
        F.lit(float(KEY_UNIT)) * F.ln(u) / F.col(weight_col)
    ).cast("long")
    return df.filter(F.col(weight_col) > 0).withColumn("key_n", key)


def top_weighted(df: DataFrame, n: int, id_col: str) -> DataFrame:
    """The N sampled items: largest keys (closest to zero), item id as
    the total-order tie-break. orderBy + limit = TakeOrdered — each
    partition contributes at most N rows to the driver-side merge."""
    return df.orderBy(F.desc("key_n"), F.col(id_col)).limit(n)
