"""The BI query surface — SURVEY.md §2.8: the eight dashboard queries the
reference's Power BI report runs over the gold star schema, as Spark SQL.

These run over the gold tables produced by pipeline/silver_to_gold (not the
driver testdata), so they are exercised by tests/test_pipeline.py rather
than the DuckDB oracle harness; the same operator classes are oracle-covered
on testdata in core_queries.py.

Each function takes the gold dict (name → DataFrame) and returns a
DataFrame; ``slicers`` shows the §2.8-8 parameterized-WHERE pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def total_events(gold: dict[str, DataFrame]) -> DataFrame:
    """§2.8-1: DistinctCount(EventID) card (visuals/df2af2ba)."""
    return gold["fact_earthquake_events"].agg(
        F.countDistinct("EventID").alias("total_events")
    )


def avg_magnitude(gold: dict[str, DataFrame]) -> DataFrame:
    """§2.8-2: Avg(Magnitude) card (visuals/0236a54d)."""
    return gold["fact_earthquake_events"].agg(F.avg("Magnitude").alias("avg_magnitude"))


def max_magnitude(gold: dict[str, DataFrame]) -> DataFrame:
    """§2.8-3: Max(Magnitude) card (visuals/7acbcab6)."""
    return gold["fact_earthquake_events"].agg(F.max("Magnitude").alias("max_magnitude"))


def tsunami_warnings_issued(gold: dict[str, DataFrame]) -> DataFrame:
    """§2.8-4: filtered count card (visuals/7d6d9e15, In-filter [[true]])."""
    fact = gold["fact_earthquake_events"]
    return fact.filter(F.col("TsunamiWarning")).agg(
        F.count("TsunamiWarning").alias("tsunami_warnings")
    )


def events_over_time(gold: dict[str, DataFrame]) -> DataFrame:
    """§2.8-5: events by Year/Quarter/Month hierarchy (visuals/5f9dd473) —
    the date-hierarchy drill as a rollup (SURVEY §2.4 note)."""
    fact = gold["fact_earthquake_events"]
    dates = gold["dim_date"]
    return (
        fact.join(F.broadcast(dates), "DateKey")
        .rollup("Year", "Quarter", "Month")
        .agg(F.count("EventID").alias("n_events"))
    )


def events_by_country(gold: dict[str, DataFrame]) -> DataFrame:
    """§2.8-6: count by extracted_country, descending (visuals/c9ef1058)."""
    fact = gold["fact_earthquake_events"]
    loc = gold["dim_location"]
    return (
        fact.join(loc, "LocationKey")
        .groupBy("extracted_country")
        .agg(F.count("EventID").alias("n_events"))
        .orderBy(F.col("n_events").desc(), "extracted_country")
    )


def geo_bubbles(gold: dict[str, DataFrame]) -> DataFrame:
    """§2.8-7: Sum(Magnitude) by (lat, lon), series MagnitudeCategory
    (visuals/c34c0905)."""
    fact = gold["fact_earthquake_events"]
    loc = gold["dim_location"]
    mag = gold["dim_magnitude"]
    return (
        fact.join(loc, "LocationKey")
        .join(F.broadcast(mag), "MagnitudeKey")
        .groupBy("latitude", "longitude", "MagnitudeCategory")
        .agg(F.sum("Magnitude").alias("sum_magnitude"))
    )


def slicers(
    gold: dict[str, DataFrame],
    tsunami: bool | None = None,
    magnitude_category: str | None = None,
) -> DataFrame:
    """§2.8-8: slicer semantics — parameterized WHERE pushed through the
    star (visuals/61e62bfb, bd92d8a1, d6d98322), including the
    fact↔predictions 1:1 edge (relationships.tmdl:37-41, J5)."""
    fact = gold["fact_earthquake_events"]
    if tsunami is not None:
        fact = fact.filter(F.col("TsunamiWarning") == tsunami)
    if magnitude_category is not None:
        mag = gold["dim_magnitude"]
        fact = fact.join(F.broadcast(mag), "MagnitudeKey").filter(
            F.col("MagnitudeCategory") == magnitude_category
        )
    if "tsunami_predictions" in gold:
        pred = gold["tsunami_predictions"]
        fact = fact.join(
            pred, fact.EventID == pred.event_id, "left"
        )  # J5 bidirectional edge
    return fact.agg(
        F.countDistinct("EventID").alias("n_events"),
        F.avg("Magnitude").alias("avg_magnitude"),
    )
