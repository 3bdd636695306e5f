"""Targeted multi-seed oracle stress: replay a NAMED SUBSET of
registered (queries(), oracle_sql()) pairs against many perturbed
variants — the r13 hunt protocol (values + subsample, seeds 1-12,
suspects only) that caught the grouped_bootstrap_ci and
cusum_changepoints boundary divergences, promoted from ad-hoc scripts
to a repo-persistent tool at round 15.

Usage:
    python tools/targeted_stress.py [--axes values,subsample]
        [--seeds 1-12] name [name ...]

One vanilla Spark session for the whole run (the driver-sim
configuration contract); per (axis, seed) a fresh variant is built
under /tmp/targeted_stress/ and ONLY the named pairs replay. Exits
nonzero on any mismatch; prints one PASS/FAIL line per (axis, seed,
name). Rows-only names are rejected — stress needs an oracle.
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

    args = sys.argv[1:]
    axes, seeds, src = ["values", "subsample"], range(1, 13), None
    while args and args[0].startswith("--"):
        flag = args.pop(0)
        if flag == "--axes":
            axes = args.pop(0).split(",")
        elif flag == "--seeds":
            lo, _, hi = args.pop(0).partition("-")
            seeds = range(int(lo), int(hi or lo) + 1)
        elif flag == "--sf-dir":
            src = args.pop(0)
        else:
            raise SystemExit(f"unknown flag {flag}\n\n{__doc__}")
    if not args:
        raise SystemExit(__doc__)
    for a in axes:
        if a not in AXES:
            raise SystemExit(f"unknown axis {a!r}; expected one of {AXES}")
    src = src or "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    from etl_earthquake_gcp_spark.plans import QUERIES
    from tests.conftest import assert_frames_match

    names = args
    for n in names:
        if n not in QUERIES:
            raise SystemExit(f"unknown query {n!r}")
        if QUERIES[n].oracle is None:
            raise SystemExit(f"{n!r} is rows-only — stress needs an oracle")

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("targeted_stress")
        .getOrCreate()
    )
    fails: list[str] = []
    n_runs = 0
    for axis in axes:
        for seed in seeds:
            dst = f"/tmp/targeted_stress/{axis}_{seed}"
            build_variant(axis, src, dst, seed)
            con = duckdb.connect()
            for t in TABLES:
                path = f"{dst}/{t}.parquet"
                srcp = f"{path}/*.parquet" if os.path.isdir(path) else path
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{srcp}')"
                )
            for name in names:
                n_runs += 1
                q = QUERIES[name]
                try:
                    spdf = q.spark_fn(spark, dst).toPandas()
                    opdf = con.execute(q.oracle).df()
                    assert_frames_match(spdf, opdf, name)
                    print(
                        f"PASS {axis} s{seed} {name}: {len(spdf)} rows",
                        flush=True,
                    )
                except Exception as e:  # noqa: BLE001 — report, continue
                    fails.append(f"{axis}/s{seed}/{name}")
                    msg = "".join(
                        traceback.format_exception_only(type(e), e)
                    )[:400]
                    print(f"FAIL {axis} s{seed} {name}: {msg}", flush=True)
            con.close()
    print(f"DONE: {n_runs} runs, {len(fails)} failures: {fails}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
