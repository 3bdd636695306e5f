"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = every registry query flagged ``bench=True`` (join-heavy,
window-heavy, agg-heavy, and the similarity/text scale paths). Each query is
fully materialized via a count-ish action (``df.write.format("noop")`` is not
in OSS pyspark, so we use .foreach(lambda r: None)-free collect of a count
over the result — cheap, forces full execution).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_earthquake_gcp_spark import plans  # noqa: E402
from etl_earthquake_gcp_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    bench_queries = {n: q for n, q in plans.QUERIES.items() if q.bench}

    timings: dict[str, float] = {}
    for name, q in sorted(bench_queries.items()):
        # best-of-2: the second run amortizes JVM/JIT warmup and co-tenant
        # CPU noise; count() forces full execution of every operator in the
        # plan (aggregations, windows, joins), row count discarded.
        best = float("inf")
        for _ in range(2):
            df = q.spark_fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
