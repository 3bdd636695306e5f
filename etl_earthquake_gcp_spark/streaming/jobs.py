"""Structured Streaming jobs — SURVEY.md §2.9.

The reference is a daily batch pipeline whose semantics are "late-data-
tolerant upsert": re-read a window, dedup on (event_id, latest updated)
(process_bronze_to_silver.py:112-113, cloud_function/main.py:61-62). The
idiomatic Spark translation is a stream with watermarked windows and
``dropDuplicatesWithinWatermark`` — implemented here over the ``events``
table replayed through the file source.

Both jobs run the stream to completion synchronously (memory sink +
``processAllAvailable``) so they are callable from the batch-style driver
harness; on a cluster the same code targets a real source/sink with a
micro-batch or continuous trigger.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import fix_nanos_ts


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source replay of the events table (schema pinned — streaming
    reads never infer, SURVEY §1.2). Nanos→micros fix as in batch
    (sources/tables.py).

    The file source requires a *directory*; testdata ships one parquet file,
    so stage a symlink dir under /tmp (read-only testdata is never touched).
    """
    import hashlib
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = f"{sf_dir}/events.parquet"
    stage = f"/tmp/spark_stream_stage_{hashlib.md5(src.encode()).hexdigest()[:8]}"
    os.makedirs(stage, exist_ok=True)
    link = f"{stage}/events.parquet"
    if not os.path.exists(link):
        os.symlink(src, link)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    return fix_nanos_ts(stream)


def _run_to_memory(result: DataFrame, output_mode: str) -> DataFrame:
    """Drive a streaming DataFrame to completion into a memory sink and
    return the sink table."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return result.sparkSession.table(name)


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windowed counts per event_type (§2.9: F.window over
    an unbounded stream; complete mode emits every window)."""
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )
    return _run_to_memory(agg, "complete")


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup (§2.9: dropDuplicatesWithinWatermark on
    the event key — the streaming form of the batch argmax dedup A5).
    Emits one row per user_id; which row wins depends on arrival order, so
    the driver check is rows-only (count == distinct user_id)."""
    dedup = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id"])
        .select("user_id", "event_type", "value", "ts")
    )
    return _run_to_memory(dedup, "append")
