"""Scalar enrichment expressions — SURVEY.md §2.7 (F1-F10).

Pure Column-expression builders (no I/O, no actions) so jobs stay fully
Catalyst-codegen'd. Each cites the reference expression it re-expresses;
implementations differ (data-driven bucketizer, timestamp_millis built-in,
SQL-string CASE where clearer) but semantics are verified equal by
tests/test_functions.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucketize(
    col: Column,
    edges: Sequence[float],
    labels: Sequence[str],
    final_label: str,
    inclusive: bool = False,
) -> Column:
    """Data-driven CASE chain: label[i] when col < edges[i] (or <= when
    ``inclusive``), else final_label.

    Generalizes the reference's hand-unrolled when-chains
    (process_bronze_to_silver.py:119-130).
    """
    if len(edges) != len(labels):
        raise ValueError("edges and labels must align")
    expr: Column | None = None
    for edge, label in zip(edges, labels):
        cond = col <= edge if inclusive else col < edge
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(final_label) if expr is not None else F.lit(final_label)


# 7-bucket USGS-style magnitude classes (b2s.py:119-126)
MAGNITUDE_EDGES = (3.0, 4.0, 5.0, 6.0, 7.0)
MAGNITUDE_LABELS = ("Micro", "Minor", "Light", "Moderate", "Strong")


def magnitude_category(col: Column) -> Column:
    """Micro <3.0 | Minor <4.0 | Light <5.0 | Moderate <6.0 | Strong <7.0 |
    Major <8.0 | Great (b2s.py:119-126)."""
    return bucketize(
        col,
        edges=(*MAGNITUDE_EDGES, 8.0),
        labels=(*MAGNITUDE_LABELS, "Major"),
        final_label="Great",
    )


def depth_category(col: Column) -> Column:
    """Shallow ≤70 | Intermediate ≤300 | Deep (b2s.py:127-130).
    Note the boundary semantics differ from magnitude: inclusive ≤."""
    return bucketize(
        col,
        edges=(70.0, 300.0),
        labels=("Shallow", "Intermediate"),
        final_label="Deep",
        inclusive=True,
    )


def hemisphere_ns(lat: Column) -> Column:
    """Northern when lat ≥ 0 else Southern (b2s.py:131)."""
    return F.when(lat >= 0, "Northern").otherwise("Southern")


def hemisphere_ew(lon: Column) -> Column:
    """Eastern when lon ≥ 0 else Western (b2s.py:132)."""
    return F.when(lon >= 0, "Eastern").otherwise("Western")


def epoch_millis_to_ts(col: Column) -> Column:
    """Epoch-milliseconds → TimestampType (b2s.py:84-85 used
    ``(col/1000).cast(timestamp)``; ``timestamp_millis`` is the exact
    integer built-in — no double roundtrip, P5 note in SURVEY §2.2)."""
    return F.timestamp_millis(col.cast("long"))


def region_detail(place: Column) -> Column:
    """Everything after the first comma, trimmed (b2s.py:138).
    Empty string when the place has no comma."""
    return F.trim(F.regexp_extract(place, r",\s*(.*)$", 1))


def country_guess(place: Column) -> Column:
    """region_detail when non-empty, else the trimmed place itself
    (b2s.py:139-141)."""
    detail = region_detail(place)
    return F.when(detail != "", detail).otherwise(F.trim(place))


def date_key(ts: Column) -> Column:
    """yyyyMMdd integer DateKey (s2g.py:112)."""
    return F.date_format(ts, "yyyyMMdd").cast("int")


def date_parts(ts: Column) -> dict[str, Column]:
    """The silver date-part bundle (b2s.py:133-137). Spark ``dayofweek`` is
    Sun=1..Sat=7, which equals the reference's ``isoweekday() % 7 + 1``
    (verified in tests/test_functions.py)."""
    return {
        "year": F.year(ts),
        "month": F.month(ts),
        "day": F.dayofmonth(ts),
        "hour": F.hour(ts),
        "day_of_week": F.dayofweek(ts),
    }


def portable_hash8(col: Column) -> Column:
    """First 8 md5 hex digits of a column as BIGINT — the engine-portable
    string hash used wherever Spark and an ANSI-SQL oracle must agree
    bit-for-bit (deterministic splits, feature hashing, set-equality
    xors). DuckDB twin: ``CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)``.
    Always hashes the CAST-to-string form so integer keys render
    identically in both engines; NULL hashes to NULL in both (aggregate
    xors skip it symmetrically).
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


def quantized_half_away(
    col_name: str, unit: int, out_scale: float
) -> Column:
    """Integer half-away display of a quantized-unit BIGINT column:
    ``sign(u) * ((|u| + unit/2) div unit) / out_scale + 0.0``.

    The engine-portable coarser-display step for series carried as exact
    integer units (1e-6, 1e-8, cents): re-rounding an already-quantized
    DOUBLE at a coarser scale diverges between Spark (shortest-decimal-
    repr rounding) and ANSI engines (binary-value rounding) exactly on
    ...x50 half boundaries; integer division cannot. ``unit`` must be
    even (100 = 6dp->4dp, 1000 = 6dp->3dp, 10000 = 8dp->4dp). The
    ``+ 0.0`` folds the -0.0 that signum(-small)*0 would produce.
    DuckDB twin: ``sign(u) * ((abs(u) + unit//2) // unit) / out_scale
    + 0.0``.
    """
    if unit % 2:
        raise ValueError("unit must be even for an exact half offset")
    return (
        F.signum(col_name)
        * F.expr(f"div(abs({col_name}) + {unit // 2}, {unit})")
        / F.lit(float(out_scale))
        + F.lit(0.0)
    )


# Modulus for corpus-scale membership checksums: 2^61 - 1 (prime).
# A raw BIGINT sum of 2^32-range hash keys overflows past ~2^31 rows; a
# bit_xor fold never overflows but is multiplicity-BLIND (an even number
# of identical divergent rows cancels out — and the corpus contains
# exact-duplicate texts by construction, so that failure mode is live).
# The modular sum keeps both properties: accumulate exactly in
# DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact to ~4e28 rows of
# 2^32-range keys, ~1e19 rows of full-range BIGINTs — then reduce mod
# 2^61-1 and emit BIGINT. Multiplicity-sensitive, order-insensitive,
# engine-portable: both engines use sign-of-dividend remainder, so the
# emitted value is in [0, M) for non-negative inputs (hash keys) and in
# (-M, M) — still identical across engines — if inputs can be negative.
# DuckDB twin: CAST(sum(x) % 2305843009213693951 AS BIGINT).
CHECKSUM_MOD = 2305843009213693951


def checksum_modsum(col: Column) -> Column:
    """Aggregate: exact decimal sum of ``col`` reduced mod 2^61-1, as
    BIGINT. See CHECKSUM_MOD for the overflow/multiplicity rationale."""
    return (
        (F.sum(col.cast("decimal(38,0)")) % F.lit(CHECKSUM_MOD))
        .cast("long")
    )
