"""Embedding int8 quantization (round-6 surface; library-first).

The standard vector-database compression step: per-vector symmetric
int8 — scale = max|x| / 127, q_i = round_half_away(x_i / scale) — cuts
an embedding column to 1/4 the bytes with bounded reconstruction error
(|x - q*scale| <= scale/2 per component). Everything is expressed with
Catalyst higher-order functions (``transform`` / ``aggregate``) so the
quantize -> dequantize -> error chain runs JVM-side over 100 TB with no
Python in the loop, and every arithmetic step (floor-based half-away
rounding, max via aggregate) replays exactly in ANSI SQL for oracle
checks.

Rounding is ``sign(x) * floor(|x|/scale + 0.5)`` rather than round():
floor on doubles is exact and engine-identical, while round() half-even
vs half-up conventions differ across engines — the same hazard class as
the repo's F.round house rules, solved here by never using round() at
all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def vec_abs_max(vec: Column) -> Column:
    """max |x_i| via a fold — the symmetric-quantization range."""
    return F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x)),
    )


def int8_scale(vec: Column) -> Column:
    """Per-vector scale; NULL for an all-zero vector (quantize() maps
    that to all-zero codes — the symmetric zero-norm guard both engines
    express identically as a CASE)."""
    mx = vec_abs_max(vec)
    return F.when(mx > 0, mx / F.lit(127.0))


def quantize_int8(vec: Column, scale: Column) -> Column:
    """array<int> codes in [-127, 127], half-away-from-zero."""
    return F.transform(
        vec,
        lambda x: F.when(scale.isNull(), F.lit(0))
        .otherwise(
            F.signum(x) * F.floor(F.abs(x) / scale + F.lit(0.5))
        )
        .cast("int"),
    )


def dequantize(codes: Column, scale: Column) -> Column:
    """array<double> reconstruction q_i * scale (all-zero when scale is
    NULL, matching the zero-vector input)."""
    return F.transform(
        codes, lambda q: q.cast("double") * F.coalesce(scale, F.lit(0.0))
    )


def reconstruction_error(vec: Column, deq: Column) -> Column:
    """max_i |x_i - x̂_i| — bounded by scale/2 for half-away rounding."""
    return F.aggregate(
        F.zip_with(vec, deq, lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, e: F.greatest(acc, e),
    )
