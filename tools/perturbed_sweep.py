"""Full-registry perturbed-data sweep: build one perturbation variant of
a testdata directory and replay EVERY registered (queries(), oracle_sql())
pair against it — the round-5/6 rehearsal that caught the re-round
boundary divergence, two streaming staging bugs, and two vacuous-result
thresholds.

Usage:
    python tools/perturbed_sweep.py <axis> [sf_dir] [seed]

axis     one of: base | values | layout | subsample | subdocs | nanos
         (see tools/regeneration_rehearsal.build_variant; `base` is
         the identity variant — the repo-persistent driver sim)
sf_dir   source testdata dir (default /root/testdata/sf0.01)
seed     numpy seed for the perturbation (default 29)

Exit nonzero on any MISMATCH. Rows-only queries (no oracle) print
ROWS_ONLY and count as covered. The DuckDB views are glob-aware, so the
layout axis (directory parquet) replays like the rest.
"""

from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main() -> int:
    from tools.regeneration_rehearsal import AXES, TABLES, build_variant

    axis = sys.argv[1] if len(sys.argv) > 1 else "values"
    if axis not in AXES:
        raise SystemExit(f"unknown axis {axis!r}; expected one of {AXES}")
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 29
    dst = f"/tmp/perturbed_sweep_{axis}_{seed}"

    build_variant(axis, src, dst, seed)
    print(f"variant built: {dst}", flush=True)

    import duckdb
    from pyspark.sql import SparkSession

    # deliberately vanilla, like the external driver: engine code must
    # self-configure (UTC, nanos handling) via load_table
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("perturbed_sweep")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod
    from tests.conftest import assert_frames_match

    con = duckdb.connect()
    for t in TABLES:
        path = f"{dst}/{t}.parquet"
        srcp = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{srcp}')"
        )

    # the driver's smoke check: entry() must run and return rows
    n_entry = entrymod.entry(spark).count()
    assert n_entry > 0, "entry() returned no rows"
    print(f"ENTRY: {n_entry} rows", flush=True)

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    fails: list[str] = []
    for name in qs:
        try:
            spdf = qs[name](spark, dst).toPandas()
            if name not in os_:
                print(f"ROWS_ONLY {name}: {len(spdf)} rows", flush=True)
                continue
            opdf = con.execute(os_[name]).df()
            assert_frames_match(spdf, opdf, name)
            print(f"MATCH {name}: {len(spdf)} rows", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            msg = "".join(
                traceback.format_exception_only(type(e), e)
            )[:400]
            print(f"MISMATCH {name}: {msg}", flush=True)
    print(f"DONE: {len(qs)} queries, {len(fails)} failures: {fails}",
          flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
