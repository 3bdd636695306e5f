"""Parquet table sources for the driver testdata star schema.

Analog of the reference's Delta/BigQuery scans (S5: process_silver_to_gold.py:40;
S3: process_bronze_to_silver.py:38) over the local testdata layout
(``{sf_dir}/{name}.parquet``). Reads are plain ``spark.read.parquet`` so
Catalyst gets predicate pushdown + column pruning + vectorized scan for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def fix_nanos_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Convert a TIMESTAMP(NANOS)-read-as-long column to TimestampType.

    The ``events`` table stores nanosecond timestamps, which Spark's parquet
    reader rejects (PARQUET_TYPE_ILLEGAL) unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is on — then the column arrives
    as epoch-nanos BIGINT. Integer ``div`` keeps full precision (a double
    roundtrip would lose sub-ms accuracy at 1.7e18), and flooring to micros
    matches DuckDB's own NANOS→TIMESTAMP truncation, so oracle comparisons
    stay exact. Same capability class as the reference's epoch-ms cast
    (process_bronze_to_silver.py:84-85, P5).
    """
    if dict(df.dtypes).get(col) == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one testdata table."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # the driver harness supplies its own SparkSession — pin UTC so timestamp
    # results match the naive-UTC oracle regardless of host configuration
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return fix_nanos_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql`` queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
