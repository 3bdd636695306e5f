"""Unit tests for the round-6 library surfaces: temperature mixing /
epoch shuffle (operators/mixing.py) and int8 embedding quantization
(operators/quantize.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.operators import mixing, quantize


@pytest.fixture()
def counts(spark):
    return spark.createDataFrame(
        [("web", 8000), ("books", 1000), ("code", 1000), ("empty", 0)],
        "source string, n_tokens long",
    )


def test_temperature_alpha1_reproduces_natural_shares(spark, counts):
    rows = {
        r["source"]: r
        for r in mixing.temperature_weights(counts, alpha=1.0).collect()
    }
    assert "empty" not in rows  # non-positive counts excluded
    assert rows["web"]["weight"] == pytest.approx(0.8)
    assert rows["web"]["raw_share"] == pytest.approx(0.8)
    for r in rows.values():
        assert r["oversample"] == pytest.approx(1.0)


def test_temperature_alpha0_is_uniform(spark, counts):
    rows = mixing.temperature_weights(counts, alpha=0.0).collect()
    for r in rows:
        assert r["weight"] == pytest.approx(1 / 3)


def test_temperature_midrange_upweights_small_sources(spark, counts):
    rows = {
        r["source"]: r
        for r in mixing.temperature_weights(counts, alpha=0.3).collect()
    }
    # small sources oversampled, big source undersampled; weights sum to 1
    assert rows["books"]["oversample"] > 1.0 > rows["web"]["oversample"]
    assert sum(r["weight"] for r in rows.values()) == pytest.approx(1.0)
    # closed form: w = c^a / sum(c^a)
    denom = 8000**0.3 + 1000**0.3 + 1000**0.3
    assert rows["web"]["weight"] == pytest.approx(8000**0.3 / denom)


def test_epoch_shuffle_deterministic_and_epoch_decorrelated(spark):
    import duckdb

    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    o1 = [r["doc_id"] for r in mixing.epoch_order(docs, epoch=1).collect()]
    o1b = [r["doc_id"] for r in mixing.epoch_order(docs, epoch=1).collect()]
    o2 = [r["doc_id"] for r in mixing.epoch_order(docs, epoch=2).collect()]
    assert o1 == o1b  # reproducible
    assert o1 != o2  # epochs decorrelate
    assert sorted(o1) == sorted(o2) == list(range(200))  # permutations
    # engine-portable: DuckDB replays the exact epoch-1 order
    con = duckdb.connect()
    oracle = [
        r[0]
        for r in con.execute(
            """
            SELECT i FROM range(200) t(i)
            ORDER BY CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':1'),
                                          1, 8)) AS BIGINT), i
            """
        ).fetchall()
    ]
    assert o1 == oracle


def test_int8_quantize_roundtrip_error_bounded(spark):
    df = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.003, 127.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector -> zero codes
            (3, [-2.5, 2.5, 0.1, -0.1]),
        ],
        "vec_id int, vec array<double>",
    )
    scale = quantize.int8_scale(F.col("vec"))
    out = df.select(
        "vec_id",
        "vec",
        scale.alias("scale"),
        quantize.quantize_int8(F.col("vec"), scale).alias("codes"),
    )
    out = out.withColumn(
        "deq", quantize.dequantize(F.col("codes"), F.col("scale"))
    ).withColumn(
        "max_err", quantize.reconstruction_error(F.col("vec"), F.col("deq"))
    )
    rows = {r["vec_id"]: r for r in out.collect()}
    for r in rows.values():
        assert all(abs(q) <= 127 for q in r["codes"])
    assert rows[2]["scale"] is None
    assert rows[2]["codes"] == [0, 0, 0, 0]
    assert rows[2]["max_err"] == 0.0
    for vid in (1, 3):
        s = rows[vid]["scale"]
        assert rows[vid]["max_err"] <= s / 2 + 1e-12
        # the range component hits exactly +/-127
        assert max(abs(q) for q in rows[vid]["codes"]) == 127


def test_int8_quantize_matches_duckdb_arithmetic(spark):
    """The floor-based half-away rounding must replay exactly in SQL."""
    import duckdb

    vec = [0.37, -0.81, 0.005, -0.005, 1.0]
    df = spark.createDataFrame([(vec,)], "vec array<double>")
    scale = quantize.int8_scale(F.col("vec"))
    got = df.select(
        quantize.quantize_int8(F.col("vec"), scale).alias("codes")
    ).collect()[0]["codes"]
    con = duckdb.connect()
    exp = [
        r[0]
        for r in con.execute(
            """
            WITH v AS (SELECT unnest(?::DOUBLE[]) AS x),
            s AS (SELECT max(abs(x)) / 127.0 AS sc FROM v)
            SELECT CAST(sign(x) * floor(abs(x) / sc + 0.5) AS INT)
            FROM v CROSS JOIN s
            """,
            [vec],
        ).fetchall()
    ]
    assert got == exp


def test_budget_allocation_exact_hamilton(spark, counts):
    import duckdb

    w = mixing.temperature_weights(counts, alpha=0.3)
    alloc = {r["source"]: r["quota"] for r in
             mixing.budget_allocation(w, budget=1000).collect()}
    assert sum(alloc.values()) == 1000  # full budget, no float drift
    # big source gets most, small sources non-zero at alpha=0.3
    assert alloc["web"] > alloc["books"] > 0
    # oracle replay: same integer apportionment in DuckDB (renormalized
    # over the integer unit total T, so quotas always sum to B)
    con = duckdb.connect()
    wpdf = w.toPandas()
    con.register("w", wpdf)
    oracle = con.execute("""
        WITH base AS (
            SELECT source,
                   CAST(round(weight * 1000000, 0) AS BIGINT) AS w_u
            FROM w
        ), f AS (
            SELECT source,
                   (w_u * 1000) // (SELECT SUM(w_u) FROM base) AS fq,
                   (w_u * 1000) % (SELECT SUM(w_u) FROM base) AS rem,
                   row_number() OVER (
                       ORDER BY (w_u * 1000)
                                % (SELECT SUM(w_u) FROM base) DESC,
                                source) AS rr
            FROM base
        )
        SELECT source,
               fq + CASE WHEN rr <= 1000 - (SELECT SUM(fq) FROM f)
                    THEN 1 ELSE 0 END AS quota
        FROM f
    """).df()
    for _, row in oracle.iterrows():
        assert alloc[row["source"]] == row["quota"]


def test_budget_allocation_full_budget_when_units_do_not_sum_to_1e6(spark):
    """Three equal thirds quantize to 999999 units total — the naive
    //1e6 apportionment under-allocated by 1 (caught by review)."""
    w = spark.createDataFrame(
        [("a", 1 / 3), ("b", 1 / 3), ("c", 1 / 3)],
        "source string, weight double",
    )
    alloc = {r["source"]: r["quota"] for r in
             mixing.budget_allocation(w, budget=1000).collect()}
    assert sum(alloc.values()) == 1000
    assert sorted(alloc.values()) == [333, 333, 334]


def test_budget_allocation_token_scale_budget_no_overflow(spark):
    """Budgets past ~9.2e12 overflowed the naive w_u*b BIGINT product
    (r5 ADVICE); the q/r-split form must apportion a 100-TB-scale token
    budget exactly. 2^62 div 1e6 would have been the naive ceiling."""
    w = spark.createDataFrame(
        [("a", 0.5), ("b", 0.3), ("c", 0.2)],
        "source string, weight double",
    )
    budget = 30_000_000_000_000  # 30T tokens
    alloc = {r["source"]: r["quota"] for r in
             mixing.budget_allocation(w, budget=budget).collect()}
    assert sum(alloc.values()) == budget
    assert alloc["a"] == 15_000_000_000_000
    assert alloc["b"] == 9_000_000_000_000
    assert alloc["c"] == 6_000_000_000_000


def test_budget_allocation_all_zero_units_uniform_fallback(spark):
    """Every weight < 5e-7 quantizes to 0 units (t = 0): the guard falls
    back to deterministic uniform apportionment instead of NULL quotas
    from div-by-zero (r5 ADVICE)."""
    w = spark.createDataFrame(
        [("a", 1e-7), ("b", 2e-7), ("c", 3e-7)],
        "source string, weight double",
    )
    alloc = {r["source"]: r["quota"] for r in
             mixing.budget_allocation(w, budget=10).collect()}
    assert sum(alloc.values()) == 10
    # uniform: floor 3 each, shortfall 1 topped up by key order (all
    # remainders tie at 1, tie-break source ASC)
    assert alloc == {"a": 4, "b": 3, "c": 3}


def test_budget_allocation_negative_weight_fails_loudly(spark):
    """r6 ADVICE: the negative-weight raise_error path had no regression
    test — it relies on lazy CaseWhen branch evaluation that a refactor
    could silently break."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    w = spark.createDataFrame(
        [("a", 0.5), ("b", -0.1), ("c", 0.6)],
        "source string, weight double",
    )
    with pytest.raises(SparkRuntimeException, match="negative or NULL"):
        mixing.budget_allocation(w, budget=100).collect()


def test_budget_allocation_null_weight_fails_loudly(spark):
    """r6 ADVICE: NULL < 0 is NULL, so the old guard let a NULL weight
    slip through as a silently-dropped NULL quota — the extended guard
    must abort the job just as loudly as for a negative weight."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    w = spark.createDataFrame(
        [("a", 0.5), ("b", None), ("c", 0.5)],
        "source string, weight double",
    )
    with pytest.raises(SparkRuntimeException, match="negative or NULL"):
        mixing.budget_allocation(w, budget=100).collect()
