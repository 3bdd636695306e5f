"""Named-query registry: the driver correctness contract.

Every operator from SURVEY.md §2 lands here as a ``Query``:
- ``spark_fn(spark, sf_dir) -> DataFrame``  — the PySpark implementation
- ``oracle``                                — equivalent DuckDB ANSI SQL over
  the same parquet tables (views pre-registered by the driver), or ``None``
  for non-SQL-expressible ops (ML, streaming state) → rows-only check.

Conventions that make the order-insensitive value-hash comparison stable
(SURVEY.md §5.1):
- every computed column is aliased identically on both sides;
- double aggregates are ``round(x, 2)`` on both sides (summation order
  differs between engines; rounding collapses last-ulp drift);
- computed integers are cast to BIGINT on both sides (Spark ``year()`` is
  int32, DuckDB's is int64);
- no ``current_timestamp`` / ``monotonically_increasing_id`` in compared
  output; surrogate keys use ``row_number() over (order by natural key)``;
- top-k always carries a unique tie-break key in its ORDER BY;
- any rounded expression that can be NEGATIVE gets ``+ 0.0`` on both sides:
  engines disagree on whether round(-1e-5, 3) is -0.0 or +0.0, and the
  driver's value-hash is repr-exact (IEEE x + 0.0 maps -0.0 → +0.0);
- nondeterministic-combine-order float aggregates feeding further arithmetic
  (e.g. z-scores from mu/sigma) are rounded FIRST, so downstream scalar ops
  are bit-identical across engines and runs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL, or None → rows-only driver check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, Query] = {}


def register(
    name: str, oracle: str | None, doc: str = "", bench: bool = False
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (PySpark impl, oracle SQL) pair under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, spark_fn=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco


def query_map() -> dict[str, SparkQuery]:
    """The ``__spark_entry__.queries()`` payload."""
    return {name: q.spark_fn for name, q in QUERIES.items()}


def oracle_map() -> dict[str, str]:
    """The ``__spark_entry__.oracle_sql()`` payload (SQL-expressible only)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
