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
    """Normalize the events timestamp column to TimestampType (LTZ).

    The driver's testdata generator has shipped ``events.ts`` in two
    physical forms across rounds, and the engine must absorb either:

    - TIMESTAMP(NANOS): Spark's parquet reader rejects it
      (PARQUET_TYPE_ILLEGAL) unless ``spark.sql.legacy.parquet.nanosAsLong``
      is on — then the column arrives as epoch-nanos BIGINT. Integer
      ``div`` keeps full precision (a double roundtrip would lose sub-ms
      accuracy at 1.7e18), and flooring to micros matches DuckDB's own
      NANOS→TIMESTAMP truncation. Same capability class as the reference's
      epoch-ms cast (process_bronze_to_silver.py:84-85, P5).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
      TIMESTAMP_NTZ, which half the timestamp function surface
      (unix_millis, window(), to_utc_timestamp…) rejects. The session
      timezone is pinned UTC before any scan (_self_configure), so the
      NTZ→LTZ cast below is the identity on the underlying instant —
      naive-UTC semantics, matching the DuckDB oracle's naive TIMESTAMP.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _self_configure(spark: SparkSession) -> None:
    """Runtime scale-hygiene for harness-supplied vanilla sessions.

    The driver builds its own SparkSession (no tuning), so the engine sets
    runtime-settable knobs itself: UTC timezone (oracle comparison), AQE
    (post-shuffle coalescing — default-on in Spark 4 but pinned explicitly),
    and shuffle parallelism sized to the actual cores instead of the static
    200 default, which on a small local master schedules ~10× more tasks
    than data. On a real cluster `defaultParallelism` reflects total
    executor cores, so the same sizing rule (2×cores) holds.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set("spark.sql.shuffle.partitions", str(max(2 * cores, 8)))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one testdata table."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    _self_configure(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return fix_nanos_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql`` queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
