"""Partitioned write → pruned read: the reference's Silver layout contract
(Delta/parquet partitioned by year, month; process_bronze_to_silver.py:146)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.sources.writers import read_table, write_table


def _frame(spark):
    rows = [
        (i, 2023 + i % 2, 1 + i % 3, float(i))  # years 2023/2024, months 1-3
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "event_id long, year int, month int, v double")


def test_partitioned_overwrite_layout(spark, tmp_path):
    path = str(tmp_path / "silver")
    write_table(_frame(spark), path, partition_by=("year", "month"))
    # hive-style directory keys present → directory-level pruning possible
    years = {d for d in os.listdir(path) if d.startswith("year=")}
    assert years == {"year=2023", "year=2024"}
    assert {d for d in os.listdir(f"{path}/year=2023")} >= {
        "month=1", "month=2", "month=3"
    }
    # overwrite is idempotent (the reference's daily full-refresh semantics)
    write_table(_frame(spark), path, partition_by=("year", "month"))
    assert read_table(spark, path).count() == 60


def test_partition_filter_reaches_scan(spark, tmp_path):
    path = str(tmp_path / "silver")
    write_table(_frame(spark), path, partition_by=("year", "month"))
    df = read_table(spark, path).filter((F.col("year") == 2024) & (F.col("month") == 2))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicates must be in PartitionFilters (skip directories),
    # not demoted to data filters
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "year" in pf and "month" in pf, plan
    got = df.collect()
    assert got and all(r.year == 2024 and r.month == 2 for r in got)
