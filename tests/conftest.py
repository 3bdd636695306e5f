"""Shared fixtures: one local SparkSession per test run + DuckDB oracle."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_earthquake_gcp_spark.session import get_spark  # noqa: E402
from etl_earthquake_gcp_spark.sources.tables import TABLE_NAMES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        # layout-perturbed rehearsal data writes each table as a
        # DIRECTORY of part files (Spark reads both natively); DuckDB
        # needs the glob form for directories
        path = f"{SF_DIR}/{name}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    yield con
    con.close()


def run_registered_pair(spark, oracle, name: str) -> pd.DataFrame:
    """Run a registered query against its oracle with the driver-sim
    comparator — the one shared pair-runner for preview/sibling tests
    (hoisted round 8; the per-file copies drifted four deep)."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    q = QUERIES[name]
    spdf = q.spark_fn(spark, SF_DIR).toPandas()
    opdf = oracle.execute(q.oracle).df()
    assert_frames_match(spdf, opdf, name)
    return spdf


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted, tz-stripped frame for comparison —
    mirrors the driver's order-insensitive value-hash."""
    import datetime

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            col = pd.to_datetime(df[c])
            if getattr(col.dt, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = col.astype("datetime64[us]")
        elif df[c].dtype == object and df[c].map(
            lambda v: isinstance(v, datetime.date) or v is None
        ).all():
            # Spark DATE collects as python date objects; DuckDB DATE → datetime64
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str):
    a, b = normalize(spark_df), normalize(oracle_df)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch spark={list(a.columns)} oracle={list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            pd.testing.assert_series_equal(
                av.astype(float),
                bv.astype(float),
                check_names=False,
                rtol=0,
                atol=0,
                obj=f"{name}.{c}",
            )
        else:
            pd.testing.assert_series_equal(
                av, bv, check_names=False, check_dtype=False, obj=f"{name}.{c}"
            )
