"""Layer writers: Delta when available, partitioned Parquet otherwise.

The reference writes Silver as Delta partitioned by (year, month) with
``mode("overwrite")`` (process_bronze_to_silver.py:146) and Gold via the
BigQuery connector (process_silver_to_gold.py:143-151). Locally the two are
semantically identical under overwrite-only writes (SURVEY §1.3), so the
format is an implementation detail behind ``write_table``/``read_table``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:  # delta-spark is optional in this environment
    from delta import DeltaTable  # noqa: F401

    _HAS_DELTA = True
except ImportError:
    _HAS_DELTA = False


def storage_format() -> str:
    return "delta" if _HAS_DELTA else "parquet"


def write_table(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ()
) -> None:
    """Overwrite-write a layer table, partitioned for downstream pruning.

    Partition columns become directory keys → static + dynamic partition
    pruning skip whole directories for year/month-filtered readers at any
    scale (SURVEY §4 'partition pruning')."""
    writer = df.write.format(storage_format()).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format(storage_format()).load(path)
