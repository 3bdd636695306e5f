"""Silver → Gold job: star-schema dimensional modeling.

Functional re-expression of scripts/process_silver_to_gold.py (reference):
one builder per dimension + the fact assembly. Two deliberate upgrades over
the reference (SURVEY §4, §5.1):

- **Deterministic surrogate keys**: ``row_number() over (order by natural
  key)`` instead of ``monotonically_increasing_id()`` (s2g.py:86,101,106),
  whose values depend on partition layout — untestable and unstable across
  runs. The window is over dimension tables (small by construction), so the
  single-partition sort is fine; fact-side keys arrive via broadcast join.
- **Distributed dim_date**: ``sequence() + explode`` over the fact's
  min..max+30d range inside the plan (scalar subqueries), replacing the
  driver-side Python loop + createDataFrame roundtrip (s2g.py:53-78).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalar import date_key

# the reference's static 8-row magnitude dimension (s2g.py:90-99), kept
# verbatim as *data* parity (Spanish descriptions included)
_MAGNITUDE_ROWS = [
    ("Micro", -2.0, 2.9, "No sentido o raramente sentido."),
    ("Minor", 3.0, 3.9, "A menudo sentido, raramente causa daños."),
    ("Light", 4.0, 4.9, "Sentido por muchos, posibles daños leves."),
    ("Moderate", 5.0, 5.9, "Daños en estructuras débiles."),
    ("Strong", 6.0, 6.9, "Daños moderados en estructuras bien construidas."),
    ("Major", 7.0, 7.9, "Daños graves en la mayoría de los edificios."),
    ("Great", 8.0, 10.0, "Destrucción generalizada."),
    ("Unknown", None, None, "Categoría no determinada."),
]

_MAGNITUDE_SCHEMA = T.StructType(
    [
        T.StructField("MagnitudeCategory", T.StringType(), False),
        T.StructField("MinMagnitude", T.DoubleType(), True),
        T.StructField("MaxMagnitude", T.DoubleType(), True),
        T.StructField("Description", T.StringType(), False),
    ]
)


def _surrogate_key(df: DataFrame, name: str, order_cols: list[str]) -> DataFrame:
    """Deterministic surrogate key: dense row_number over the natural key."""
    w = Window.orderBy(*order_cols)
    return df.withColumn(name, F.row_number().over(w).cast("long"))


def build_dim_date(silver: DataFrame) -> DataFrame:
    """Calendar dimension spanning min(event ts) .. max(event ts)+30 days
    (s2g.py:53-78), generated distributed via sequence+explode.

    DayOfWeek is Sun=1..Sat=7 — Spark ``dayofweek`` natively equals the
    reference's ``isoweekday() % 7 + 1``; IsWeekend mirrors
    ``weekday() >= 5`` (Sat/Sun) as an int 0/1 (s2g.py:72-74).
    """
    spark = silver.sparkSession
    silver.select("event_timestamp_utc").createOrReplaceTempView("_s2g_silver_ts")
    return spark.sql(
        """
        WITH days AS (
            SELECT explode(sequence(
                (SELECT to_date(min(event_timestamp_utc)) FROM _s2g_silver_ts),
                (SELECT date_add(to_date(max(event_timestamp_utc)), 30)
                 FROM _s2g_silver_ts))) AS FullDate
        )
        SELECT CAST(date_format(FullDate, 'yyyyMMdd') AS INT) AS DateKey,
               FullDate,
               year(FullDate) AS Year,
               quarter(FullDate) AS Quarter,
               month(FullDate) AS Month,
               date_format(FullDate, 'MMMM') AS MonthName,
               day(FullDate) AS DayOfMonth,
               dayofweek(FullDate) AS DayOfWeek,
               date_format(FullDate, 'EEEE') AS DayName,
               CAST(dayofweek(FullDate) IN (1, 7) AS INT) AS IsWeekend
        FROM days
        """
    )


def build_dim_location(silver: DataFrame) -> DataFrame:
    """Distinct geographical attributes + surrogate key (s2g.py:82-86).
    Fact-cardinality-ish (distinct lat/lon/place) — the one dimension that
    is NOT broadcastable at scale; the fact join on it is the sort-merge
    join of the star (SURVEY §2.3 physical note)."""
    distinct = silver.select(
        "latitude",
        "longitude",
        "place",
        "extracted_country",
        "extracted_region_detail",
        "hemisphere_ns",
        "hemisphere_ew",
    ).distinct()
    return _surrogate_key(distinct, "LocationKey", ["latitude", "longitude", "place"])


def build_dim_magnitude(spark) -> DataFrame:
    """The static 8-row magnitude dimension (s2g.py:90-101)."""
    df = spark.createDataFrame(_MAGNITUDE_ROWS, schema=_MAGNITUDE_SCHEMA)
    # keyed by bucket order (Unknown last), not insertion accident
    return _surrogate_key(df, "MagnitudeKey", ["MinMagnitude", "MagnitudeCategory"])


def build_dim_event_type(silver: DataFrame) -> DataFrame:
    """Distinct (event_type, magType) pairs + surrogate key (s2g.py:105-106)."""
    distinct = silver.select("event_type", "magType").distinct()
    return _surrogate_key(distinct, "EventTypeKey", ["event_type", "magType"])


def build_fact(
    silver: DataFrame,
    dim_date: DataFrame,
    dim_location: DataFrame,
    dim_magnitude: DataFrame,
    dim_event_type: DataFrame,
) -> DataFrame:
    """Fact assembly: resolve surrogate keys via the 4-way star join, then
    project measures (s2g.py:112-139; J1-J4).

    dim_date / dim_magnitude / dim_event_type are broadcast (KB-scale
    forever); dim_location is fact-cardinality → left as a shuffled join
    for AQE to pick the strategy.
    """
    src = silver.withColumn("DateKey", date_key(F.col("event_timestamp_utc")))
    joined = (
        src.join(F.broadcast(dim_date.select("DateKey")), "DateKey")
        .join(dim_location, ["latitude", "longitude", "place"])
        .join(
            F.broadcast(dim_magnitude),
            src.magnitude_category == dim_magnitude.MagnitudeCategory,
        )
        .join(F.broadcast(dim_event_type), ["event_type", "magType"])
    )
    return joined.select(
        F.col("event_id").alias("EventID"),
        "DateKey",
        "LocationKey",
        "MagnitudeKey",
        "EventTypeKey",
        F.col("magnitude").alias("Magnitude"),
        F.col("depth_km").alias("DepthKm"),
        F.col("tsunami_warning").alias("TsunamiWarning"),
        F.col("significance").alias("Significance"),
        F.col("felt_reports").alias("FeltReports"),
        F.col("nst_stations").alias("NumberOfStations"),
        F.col("rms_travel_time").alias("RmsTravelTime"),
        F.col("gap_azimuthal").alias("AzimuthalGap"),
        F.col("url").alias("SourceURL"),
        F.col("silver_processing_timestamp_utc").alias("SilverProcessingTimestampUTC"),
        F.current_timestamp().alias("DWLoadTimestampUTC"),
    ).dropDuplicates(["EventID"])


def silver_to_gold(silver: DataFrame) -> dict[str, DataFrame]:
    """Build the full gold star schema. Returns name → DataFrame
    (s2g.py:154-158 writes the same five tables)."""
    spark = silver.sparkSession
    dim_date = build_dim_date(silver)
    dim_location = build_dim_location(silver)
    dim_magnitude = build_dim_magnitude(spark)
    dim_event_type = build_dim_event_type(silver)
    fact = build_fact(silver, dim_date, dim_location, dim_magnitude, dim_event_type)
    return {
        "dim_date": dim_date,
        "dim_location": dim_location,
        "dim_magnitude": dim_magnitude,
        "dim_event_type": dim_event_type,
        "fact_earthquake_events": fact,
    }
