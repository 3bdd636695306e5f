"""Round-16 whole-registry plan audit: build every registered query's plan
and count the optimization-guide antipatterns (guide §7.2) —

- BatchEvalPython / ArrowEvalPython (row-at-a-time Python UDFs, §4)
- CartesianProduct (unbounded cross join, §3)
- BroadcastNestedLoopJoin (quadratic; legitimate only for the documented
  bounded-side classes)
- SortMergeJoin count (each costs a sort; fine, but worth eyeballing)
- Exchange count (shuffle count)
- parquet scans + whether any PushedFilters line is non-empty
- spark_fn wall time (py4j plan-construction overhead, driver-side)

Writes one JSON line per query to stdout; antipattern summary to stderr.
Plan-only: builds DataFrames and explains them (a few queries run bounded
eager driver prep — that is their documented contract).

Usage: python tools/plan_audit.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]

    from etl_earthquake_gcp_spark import plans
    from etl_earthquake_gcp_spark.session import get_spark

    spark = get_spark(app_name="plan_audit")
    names = args or list(plans.QUERIES)
    flagged: dict[str, list[str]] = {}
    for name in names:
        q = plans.QUERIES[name]
        t0 = time.perf_counter()
        try:
            df = q.spark_fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": name, "error": str(e)[:200]}), flush=True)
            continue
        build_s = round(time.perf_counter() - t0, 3)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        rec = {
            "name": name,
            "build_s": build_s,
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "smj": plan.count("SortMergeJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "py_eval": plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython"),
            "py_map": plan.count("MapInPandas") + plan.count("MapInArrow"),
            "scans": plan.count("Scan parquet"),
            "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
            # single-partition windows: a windowspecdefinition with no
            # partition keys opens directly with the ordering spec — the
            # whole input collapses onto one task (r17: the previous
            # pattern was dead code — it matched a literal
            # "windowspecdefinition()" that never occurs, and ran the
            # second regex against "" instead of plan)
            "window1p": len(
                re.findall(
                    r"windowspecdefinition\((?:[^(),]+ (?:ASC|DESC))", plan
                )
            ),
        }
        print(json.dumps(rec), flush=True)
        flags = []
        if rec["py_eval"]:
            flags.append(f"py_eval={rec['py_eval']}")
        if rec["cartesian"]:
            flags.append("cartesian")
        if rec["build_s"] > 1.0:
            flags.append(f"build_s={rec['build_s']}")
        if flags:
            flagged[name] = flags
    print(f"FLAGGED: {json.dumps(flagged, indent=1)}", file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
