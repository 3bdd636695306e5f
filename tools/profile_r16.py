"""Round-16 optimization profiler (guide §1): per-query plan capture +
noop-sink timing for the bench set (or any named queries).

Usage:
    python tools/profile_r16.py [--plans-dir plans/r16] [--tag before] \
        [--sf-dir /root/testdata/sf0.1] [--repeats 3] [name ...]

For each query:
- writes ``<plans-dir>/<name>_<tag>.txt`` with the ``explain("formatted")``
  output (the judge-facing plan evidence);
- times the computation with the noop sink (guide §1.4) best-of-N, with
  ``setJobDescription`` labels (guide §1.5);
- prints one JSON line with the timings.

The noop numbers are the ISOLATION measurement; the official bench number
stays bench.py's xxhash64-materialize harness (unchanged methodology).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_earthquake_gcp_spark import plans  # noqa: E402
from etl_earthquake_gcp_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: bench set)")
    ap.add_argument("--plans-dir", default=None, help="where to write explain files")
    ap.add_argument("--tag", default=None, help="suffix for explain files, e.g. before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="profile_r16")
    names = args.names or sorted(n for n, q in plans.QUERIES.items() if q.bench)

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    timings: dict[str, float] = {}
    for name in names:
        q = plans.QUERIES[name]
        if args.plans_dir and args.tag:
            spark.catalog.clearCache()
            df = q.spark_fn(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        best = float("inf")
        for i in range(args.repeats):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"r16-profile:{name}#{i}")
            t0 = time.perf_counter()
            df = q.spark_fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)
    spark.catalog.clearCache()

    print(json.dumps({"noop_best_sec": timings, "sf_dir": args.sf_dir,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
