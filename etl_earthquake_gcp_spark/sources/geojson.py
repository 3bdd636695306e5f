"""GeoJSON source — the raw (bronze) edge of the pipeline.

Reads USGS-style GeoJSON FeatureCollections (cloud_function/main.py writes
one document per blob; S3 in SURVEY §2.1). Supports both one-document-per-
file (``multiLine=True``) and NDJSON layouts, with an explicit schema by
default — inference is allowed only when asked (SURVEY §1.2: inference only
at the raw edge, fixed schemas after).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Explicit FeatureCollection schema (FIXTURES.md §A; field set exactly the
# 22 paths projected by process_bronze_to_silver.py:48-74)
PROPERTIES_SCHEMA = T.StructType(
    [
        T.StructField("mag", T.DoubleType()),
        T.StructField("place", T.StringType()),
        T.StructField("time", T.LongType()),
        T.StructField("updated", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("felt", T.LongType()),
        T.StructField("cdi", T.DoubleType()),
        T.StructField("mmi", T.DoubleType()),
        T.StructField("alert", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("tsunami", T.LongType()),
        T.StructField("sig", T.LongType()),
        T.StructField("net", T.StringType()),
        T.StructField("code", T.StringType()),
        T.StructField("nst", T.LongType()),
        T.StructField("dmin", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("gap", T.DoubleType()),
        T.StructField("magType", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("title", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("properties", PROPERTIES_SCHEMA),
        T.StructField(
            "geometry",
            T.StructType(
                [T.StructField("coordinates", T.ArrayType(T.DoubleType()))]
            ),
        ),
    ]
)

GEOJSON_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("features", T.ArrayType(FEATURE_SCHEMA)),
    ]
)


def read_geojson(
    spark: SparkSession,
    path: str,
    multiline: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """Read GeoJSON FeatureCollection blobs.

    ``multiline=True`` for one-document-per-file blobs (how the ingest
    function writes bronze, cloud_function/main.py:83-89 — SURVEY §7 notes
    this is NOT the line-delimited default); ``False`` for NDJSON.
    """
    reader = spark.read
    if not infer_schema:
        reader = reader.schema(GEOJSON_SCHEMA)
    return reader.json(path, multiLine=multiline)
