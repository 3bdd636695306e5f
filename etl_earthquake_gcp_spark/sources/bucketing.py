"""Bucketed tables — co-located joins with no join-time exchange.

SURVEY §4's remaining physical strategy: pre-shuffling BOTH join sides into
the same bucket layout (``bucketBy(n, key)`` + ``sortBy(key)``) moves the
join's exchange from query time to write time. Every later join on the
bucket key reads co-located buckets and sort-merges them directly — at
100 TB this is THE amortization for a fact table joined on the same key by
many queries (pay one shuffle at ingest, none per query). Spark's bucketed
scan reports its distribution to the planner, so Catalyst drops the
Exchange (and with sorted single-file buckets, the Sort) under the join —
pinned by tests/test_physical_strategies.py.

Bucket-count discipline at scale: both sides must use the SAME bucket
count (or multiples, with ``spark.sql.bucketing.coalesceBucketsInJoin``);
buckets should be sized so one bucket ≈ one task's memory budget.
"""

from __future__ import annotations

import os
import re
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Overwrite ``table`` bucketed+sorted by ``bucket_col`` (idempotent).

    Managed-table hygiene: ``mode("overwrite")`` only replaces tables the
    CURRENT catalog knows about, but a fresh session with an in-memory
    catalog can still collide with a previous session's warehouse
    directory (LOCATION_ALREADY_EXISTS) — drop both before writing.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = urlparse(warehouse)
    if loc.scheme in ("", "file"):
        shutil.rmtree(os.path.join(loc.path or warehouse, table), ignore_errors=True)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def bucketed_pair(
    spark: SparkSession,
    sf_dir: str,
    left: DataFrame,
    right: DataFrame,
    left_name: str,
    right_name: str,
    bucket_col_left: str,
    bucket_col_right: str,
    n_buckets: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Materialize two frames as same-bucket-count tables and read them back.

    Table names are namespaced by the sf_dir so different scale factors
    never read each other's buckets. The write is the one-time ingest-side
    shuffle; the returned frames carry bucket metadata, so joins on the
    bucket columns plan with no exchange.
    """
    tag = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    lt, rt = f"bkt_{left_name}_{tag}", f"bkt_{right_name}_{tag}"
    write_bucketed(left, lt, bucket_col_left, n_buckets)
    write_bucketed(right, rt, bucket_col_right, n_buckets)
    return spark.table(lt), spark.table(rt)
