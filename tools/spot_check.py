"""Focused driver-sim oracle check for NAMED queries (round-16 optimization
loop): same vanilla-session + DuckDB comparator contract as
tools/perturbed_sweep.py's base axis, restricted to the queries whose plans
an optimization touched — minutes instead of the full-registry hour.

Usage:
    python tools/spot_check.py <query> [<query> ...] [--sf-dir DIR]

Exit nonzero on any MISMATCH. The full base sweep remains the commit gate;
this is the inner-loop probe.
"""

from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    if not names:
        raise SystemExit("usage: spot_check.py <query> [...] [--sf-dir DIR]")

    import duckdb
    from pyspark.sql import SparkSession

    from etl_earthquake_gcp_spark.sources.tables import TABLE_NAMES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("spot_check")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod
    from tests.conftest import assert_frames_match

    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = f"{sf_dir}/{t}.parquet"
        srcp = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{srcp}')")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    fails: list[str] = []
    for name in names:
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            if name not in os_:
                print(f"ROWS_ONLY {name}: {len(spdf)} rows", flush=True)
                continue
            opdf = con.execute(os_[name]).df()
            assert_frames_match(spdf, opdf, name)
            print(f"MATCH {name}: {len(spdf)} rows", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            msg = "".join(traceback.format_exception_only(type(e), e))[:400]
            print(f"MISMATCH {name}: {msg}", flush=True)
    print(f"DONE: {len(names)} queries, {len(fails)} failures: {fails}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
