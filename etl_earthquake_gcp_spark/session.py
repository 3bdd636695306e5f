"""SparkSession factory.

Mirrors the reference's session setup (scripts/process_bronze_to_silver.py:151-155
builds a plain SparkSession with Delta/GCS jars) minus the GCP plumbing, plus
the scale-hygiene settings SURVEY.md §7 tier 4(c) calls for: AQE on (runtime
partition coalescing + skew-join splitting), UTC session timezone (oracle
comparison), Arrow for any pandas exchange.

On a real cluster the same builder is used with ``master`` unset (taken from
spark-submit) and ``shuffle_partitions`` sized to ~2-3× total executor cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_earthquake_gcp_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults target the local harness (``local[$SPARK_GRAFT_CPUS]``); every
    setting below is equally valid on a multi-executor cluster.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: post-shuffle coalescing, runtime join-strategy switch, skew split
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # deterministic timestamps vs the DuckDB oracle (naive-UTC parquet)
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas_udf / toPandas exchange
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # broadcast small dims aggressively (dims here are KB-scale)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
