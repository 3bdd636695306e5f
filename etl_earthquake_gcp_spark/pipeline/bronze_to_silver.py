"""Bronze → Silver job: flatten, clean, validate, dedup, enrich.

Functional re-expression of scripts/process_bronze_to_silver.py (reference):
each stage is a pure ``DataFrame -> DataFrame`` so the harness and tests can
exercise them individually; the composition ``bronze_to_silver`` produces the
32-column silver schema (FIXTURES.md §B).

Deliberate differences from the reference (all behavior-preserving or
strictly-more-deterministic, SURVEY §4/§5.1):
- epoch cast uses ``timestamp_millis`` (exact integer) instead of
  ``(col/1000).cast(timestamp)``;
- dedup is ``max_by`` aggregation (map-side partial agg; no per-key sort)
  instead of a row_number window — the plan that survives 100 TB — with a
  deterministic total tie-break (updated_ts, event_ts);
- the empty-input guard uses ``df.isEmpty()`` (no RDD hop, b2s.py:41).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import (
    country_guess,
    date_parts,
    depth_category,
    epoch_millis_to_ts,
    hemisphere_ew,
    hemisphere_ns,
    magnitude_category,
    region_detail,
)

# feature.properties paths kept as-is vs renamed on projection
_PROP_FIELDS = (
    "mag",
    "place",
    "time",
    "updated",
    "url",
    "felt",
    "cdi",
    "mmi",
    "alert",
    "status",
    "tsunami",
    "sig",
    "net",
    "code",
    "nst",
    "dmin",
    "rms",
    "gap",
    "magType",
    "type",
    "title",
)


def flatten_features(bronze: DataFrame) -> DataFrame:
    """One row per GeoJSON feature: explode + nested projection + coordinate
    destructuring (P1-P3; b2s.py:46-74)."""
    f = bronze.select(F.explode("features").alias("f"))
    coords = F.col("f.geometry.coordinates")
    return f.select(
        F.col("f.id").alias("id"),
        *[F.col(f"f.properties.{p}").alias(p) for p in _PROP_FIELDS],
        coords.getItem(0).alias("longitude"),
        coords.getItem(1).alias("latitude"),
        coords.getItem(2).alias("depth"),
    )


def clean_and_type(flat: DataFrame) -> DataFrame:
    """Typed rename to the 20-column silver core (P4/P5; b2s.py:84-100)."""
    return flat.select(
        F.col("id").alias("event_id"),
        epoch_millis_to_ts(F.col("time")).alias("event_timestamp_utc"),
        epoch_millis_to_ts(F.col("updated")).alias("updated_timestamp_utc"),
        F.col("mag").cast("double").alias("magnitude"),
        F.col("depth").cast("double").alias("depth_km"),
        F.col("latitude").cast("double"),
        F.col("longitude").cast("double"),
        "place",
        F.col("type").alias("event_type"),
        "magType",
        (F.col("tsunami") == 1).cast("boolean").alias("tsunami_warning"),
        F.col("sig").cast("int").alias("significance"),
        F.col("felt").cast("int").alias("felt_reports"),
        F.col("nst").cast("int").alias("nst_stations"),
        F.col("rms").cast("double").alias("rms_travel_time"),
        F.col("gap").cast("double").alias("gap_azimuthal"),
        "alert",
        "status",
        "url",
        "title",
    )


def validity_condition() -> F.Column:
    """The P6 validity predicate as a reusable Column — shared by the
    filter and the runner's Observation metrics (so the drop-rate is
    counted inside the same action that writes silver, no second scan)."""
    c = F.col
    return (
        c("event_id").isNotNull()
        & c("event_timestamp_utc").isNotNull()
        & c("magnitude").isNotNull()
        & c("magnitude").between(-2.0, 10.0)
        & c("latitude").isNotNull()
        & c("latitude").between(-90.0, 90.0)
        & c("longitude").isNotNull()
        & c("longitude").between(-180.0, 180.0)
        & c("depth_km").isNotNull()
        & (c("depth_km") >= 0)
        & (c("depth_km") < 1000)
    )


def validate(typed: DataFrame) -> DataFrame:
    """Range/null validation (P6; b2s.py:103-109): magnitude ∈ [-2,10],
    lat ∈ [-90,90], lon ∈ [-180,180], depth ∈ [0,1000), non-null id/ts."""
    return typed.filter(validity_condition())


def dedup_latest_update(validated: DataFrame) -> DataFrame:
    """One row per event_id: the most recently *updated* revision wins
    (A5/W1; b2s.py:112-113).

    max_by over a struct order key instead of row_number-over-window:
    aggregates combine map-side so the shuffle carries one candidate row per
    (input partition × key) rather than every revision — the USGS feed
    re-sends a 365-day window per run, so revisions-per-event is the hot
    dimension at scale. Tie-break on event_timestamp keeps it total-ordered
    where the reference was arbitrary."""
    cols = validated.columns
    payload = F.struct(*cols)
    order = F.struct("updated_timestamp_utc", "event_timestamp_utc")
    latest = validated.groupBy("event_id").agg(F.max_by(payload, order).alias("r"))
    return latest.select(*[F.col(f"r.{c}").alias(c) for c in cols])


def enrich(deduped: DataFrame) -> DataFrame:
    """Feature engineering (F3-F7; b2s.py:118-142): categories, hemispheres,
    date parts, place-derived region/country, processing timestamp."""
    ts = F.col("event_timestamp_utc")
    parts = date_parts(ts)
    return deduped.select(
        "*",
        magnitude_category(F.col("magnitude")).alias("magnitude_category"),
        depth_category(F.col("depth_km")).alias("depth_category"),
        hemisphere_ns(F.col("latitude")).alias("hemisphere_ns"),
        hemisphere_ew(F.col("longitude")).alias("hemisphere_ew"),
        *[expr.alias(name) for name, expr in parts.items()],
        region_detail(F.col("place")).alias("extracted_region_detail"),
        country_guess(F.col("place")).alias("extracted_country"),
        F.current_timestamp().alias("silver_processing_timestamp_utc"),
    )


def bronze_to_silver(bronze: DataFrame) -> DataFrame:
    """Full bronze→silver composition (32 columns, FIXTURES.md §B)."""
    return enrich(dedup_latest_update(validate(clean_and_type(flatten_features(bronze)))))
