"""Unit tests for the scalar enrichment expressions (SURVEY.md §5.2) —
boundary values, regex comma cases, and the reference's date conventions."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.functions import scalar


def _eval(spark, col, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r.out for r in df.select(col.alias("out")).collect()]


def test_magnitude_category_boundaries(spark):
    vals = [(2.999,), (3.0,), (3.999,), (4.0,), (5.0,), (6.0,), (7.0,), (7.999,), (8.0,), (9.5,)]
    out = _eval(spark, scalar.magnitude_category(F.col("v")), vals, "v double")
    assert out == [
        "Micro", "Minor", "Minor", "Light", "Moderate",
        "Strong", "Major", "Major", "Great", "Great",
    ]


def test_depth_category_inclusive_boundaries(spark):
    out = _eval(
        spark,
        scalar.depth_category(F.col("v")),
        [(0.0,), (70.0,), (70.001,), (300.0,), (300.001,), (700.0,)],
        "v double",
    )
    assert out == ["Shallow", "Shallow", "Intermediate", "Intermediate", "Deep", "Deep"]


def test_region_extraction_comma_cases(spark):
    rows = [
        ("no comma here",),
        ("10km N of Town, Chile",),
        ("A, B Region, Japan",),
        ("City, Peru   ",),
        ("",),
    ]
    detail = _eval(spark, scalar.region_detail(F.col("p")), rows, "p string")
    assert detail == ["", "Chile", "B Region, Japan", "Peru", ""]
    country = _eval(spark, scalar.country_guess(F.col("p")), rows, "p string")
    assert country == ["no comma here", "Chile", "B Region, Japan", "Peru", ""]


def test_epoch_millis_exact(spark):
    out = _eval(
        spark,
        scalar.epoch_millis_to_ts(F.col("t")),
        [(1700000000123,), (0,)],
        "t long",
    )
    assert out[0] == datetime.datetime(2023, 11, 14, 22, 13, 20, 123000)
    assert out[1] == datetime.datetime(1970, 1, 1, 0, 0, 0)


def test_dayofweek_matches_reference_convention(spark):
    """Reference dim_date uses python ``isoweekday() % 7 + 1`` (Sun=1..Sat=7,
    s2g.py:72); Spark's ``dayofweek`` must agree for every weekday —
    SURVEY §7 flags this convention as a parity risk."""
    days = [(datetime.date(2024, 1, d),) for d in range(1, 8)]  # Mon..Sun
    out = _eval(spark, F.dayofweek(F.col("d")), days, "d date")
    expected = [d[0].isoweekday() % 7 + 1 for d in days]
    assert out == expected


def test_is_weekend_matches_reference_convention(spark):
    """Reference: ``1 if weekday() >= 5`` → Sat/Sun (s2g.py:74)."""
    days = [(datetime.date(2024, 1, d),) for d in range(1, 8)]
    out = _eval(
        spark, F.dayofweek(F.col("d")).isin(1, 7).cast("int"), days, "d date"
    )
    expected = [1 if d[0].weekday() >= 5 else 0 for d in days]
    assert out == expected


def test_month_day_names_locale(spark):
    """date_format MMMM/EEEE must match python strftime %B/%A (s2g.py:70-73)
    — both en-US here; pinned so a locale drift fails loudly."""
    days = [(datetime.date(2024, m, 3),) for m in range(1, 13)]
    out = _eval(spark, F.date_format(F.col("d"), "MMMM"), days, "d date")
    assert out == [d[0].strftime("%B") for d in days]
    wk = [(datetime.date(2024, 1, d),) for d in range(1, 8)]
    out = _eval(spark, F.date_format(F.col("d"), "EEEE"), wk, "d date")
    assert out == [d[0].strftime("%A") for d in wk]


def test_bucketize_empty_edges(spark):
    out = _eval(spark, scalar.bucketize(F.col("v"), [], [], "only"), [(1.0,)], "v double")
    assert out == ["only"]


def test_date_key(spark):
    out = _eval(
        spark,
        scalar.date_key(F.col("t")),
        [(datetime.datetime(2024, 3, 7, 14, 30),)],
        "t timestamp",
    )
    assert out == [20240307]


def test_hll_error_within_budget(spark):
    """HLL with m=64 has ~13% standard error; assert the estimate lands
    within 3 sigma of the exact count (the oracle pins cross-engine
    equality; this pins that the estimator is actually GOOD)."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    from .conftest import SF_DIR

    row = QUERIES["hll_distinct_users"].spark_fn(spark, SF_DIR).collect()[0]
    rel_err = abs(row.est_distinct - row.true_distinct) / row.true_distinct
    assert rel_err < 0.40, (row.est_distinct, row.true_distinct)


def test_doc_chunks_catalyst_is_python_free(spark):
    """The production chunk fan-out must stay whole-stage-codegen'd: no
    Python eval node anywhere in the physical plan (the UDTF twin is the
    deliberate Python-path exception, certified by the shared oracle)."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    from .conftest import SF_DIR

    plan = (
        QUERIES["doc_chunks_catalyst"]
        .spark_fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan, plan


def test_udtf_and_catalyst_chunks_agree(spark):
    """Differential: the genuine UDTF and the Catalyst twin emit identical
    rows (the oracle certifies each against DuckDB; this pins them against
    each other without an engine in between)."""
    from etl_earthquake_gcp_spark.plans import QUERIES

    from .conftest import SF_DIR

    a = set(
        map(tuple, QUERIES["doc_chunks_udtf"].spark_fn(spark, SF_DIR).collect())
    )
    b = set(
        map(
            tuple,
            QUERIES["doc_chunks_catalyst"].spark_fn(spark, SF_DIR).collect(),
        )
    )
    assert a == b


def test_portable_hash8_matches_duckdb(spark):
    """portable_hash8 must equal DuckDB's ('0x'||substr(md5(x),1,8))::BIGINT
    for strings AND for integer keys rendered through CAST-to-string; NULL
    hashes to NULL (so aggregate xors skip it on both engines)."""
    import duckdb

    con = duckdb.connect()
    vals = ["a", "hello world", "123", ""]
    out = _eval(
        spark,
        scalar.portable_hash8(F.col("v")),
        [(v,) for v in vals] + [(None,)],
        "v string",
    )
    for v, got in zip(vals, out):
        exp = con.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 8)) AS BIGINT)", [v]
        ).fetchone()[0]
        assert got == exp, (v, got, exp)
    assert out[-1] is None  # NULL -> NULL
    (int_hash,) = _eval(
        spark, scalar.portable_hash8(F.col("k")), [(42,)], "k bigint"
    )
    exp = con.execute(
        "SELECT CAST(('0x' || substr(md5(CAST(42 AS VARCHAR)), 1, 8))"
        " AS BIGINT)"
    ).fetchone()[0]
    assert int_hash == exp
