"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = every registry query flagged ``bench=True`` (join-heavy,
window-heavy, agg-heavy, and the similarity/text scale paths). Each query is
fully materialized by hashing EVERY output column into one aggregated value
(``sum(xxhash64(struct(*)))``): a bare ``count()`` would let Catalyst prune
the final projections, under-measuring expression-heavy queries, while the
hash forces each projected expression to actually evaluate JVM-side with no
collect/serialization cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_earthquake_gcp_spark import plans  # noqa: E402
from etl_earthquake_gcp_spark.session import get_spark  # noqa: E402


def materialize(df: DataFrame) -> None:
    """Force full execution of every operator AND projection in the plan.

    bit_xor (not sum): xxhash64 values span the full 64-bit range, so an
    ANSI-mode long sum overflows; xor is overflow-free and still consumes
    every hashed row.
    """
    df.select(F.xxhash64(F.struct(*df.columns)).alias("h")).agg(
        F.expr("bit_xor(h)")
    ).collect()


# Never-touched control queries with their round-3 recorded times
# (BENCH_r03.json): the box has noisy co-tenants (documented 1.2-4x
# round-to-round swings on identical plans), so each run publishes
# box_factor = mean(control_now / control_baseline) and a normalized
# total (value / box_factor).
#
# LOADED-BOX READ PROTOCOL (r15 verdict #3, standing rule): normalization
# by box_factor is approximate when contention is extreme — BENCH_r15 was
# recorded at box_factor 5.614 and its normalized value disagreed with
# clean-read values by ~25%. Whenever a recorded read has box_factor > 2,
# the round's SCALING.md notes must add extra reads until >=3 land with
# box_factor <= 2 and publish the MEDIAN OF CLEAN READS (both raw and
# normalized) beside the driver number; cross-round comparisons prefer
# the clean-read median. The JSON carries `loaded_box` = true on such
# reads so a single loaded number is never mistaken for steady state.
#
# Round 3 is the baseline because it is the
# FIRST round measured under the current harness (xxhash64-struct
# materialize, best-of-3, spark_fn inside the timed region — r1/r2 used
# count() materialization, which Catalyst could prune); using r1 times
# would conflate the harness delta with box noise. Cross-round
# comparisons should read value_normalized; the controls' code and
# plans must stay frozen. (One audited exception: the round-7 broadcast
# audit removed flagship's F.broadcast(customer) HINT — the planner's
# size statistics re-derive the identical BroadcastHashJoin at every
# bench SF, verified plan-for-plan at sf0.1 before and after, so the
# control's executed plan and timing series are unchanged.)
_CONTROLS_BASELINE = {
    "flagship_events_by_region": 0.780,
    "join_broadcast_hint": 0.299,
    "latest_event_dedup": 0.281,
    "pricing_summary": 0.279,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    bench_queries = {n: q for n, q in plans.QUERIES.items() if q.bench}

    timings: dict[str, float] = {}
    for name, q in sorted(bench_queries.items()):
        # best-of-3: repeats amortize JVM/JIT warmup and co-tenant CPU
        # noise (this box sees 3-8x swings; a 2-sample best still caught a
        # 20x outlier). Caches an operator persists internally are released
        # between runs so no query's timing (or memory) leaks into the next
        # and re-persist warnings can't pile up.
        # spark_fn runs INSIDE the timed region (r3 harness change): plan
        # construction is milliseconds, but queries with eager driver-side
        # prep (cosine_topk_pandas's query-vector collect, pagerank's
        # count()) must pay for it in their own number.
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            materialize(df)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    ratios = [
        timings[name] / base
        for name, base in _CONTROLS_BASELINE.items()
        if name in timings
    ]
    box_factor = round(sum(ratios) / len(ratios), 3) if ratios else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "harness": "r5: spark_fn inside timed region; box_factor = "
                "mean(control/r3-baseline) over 4 frozen controls "
                "(r3 = first round under the current harness), "
                "value_normalized = value/box_factor",
                "queries": timings,
                "box_factor": box_factor,
                # loaded-box protocol (see _CONTROLS_BASELINE comment):
                # true => this read needs clean-read corroboration in
                # SCALING.md before cross-round comparison
                "loaded_box": bool(box_factor and box_factor > 2),
                "value_normalized": (
                    round(total / box_factor, 3) if box_factor else None
                ),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
