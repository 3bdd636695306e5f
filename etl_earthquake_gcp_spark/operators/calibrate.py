"""Cross-source score calibration (round-8 surface; library-first so the
plan shapes are tested before registration).

Quantile normalization: heterogeneous sources score their documents on
incompatible scales (a web crawl's length distribution is nothing like
curated reference text), so a single global quality threshold keeps the
wrong mix. The classic fix maps every document's *within-source* midrank
quantile onto the *global* score distribution — after which one
threshold means the same thing everywhere.

Everything here is integer-exact: ranks are integers, the target global
rank is an integer ceiling division, and the calibrated value is an
order STATISTIC (a selection, never an interpolation) — the repo's
preferred parity class, bit-identical across engines by construction.

Scale shape: the naive formulation is a corpus-wide ``row_number()``
over an empty window partition — a single-task sort that dies at scale.
Instead, ranks come from a score HISTOGRAM: per-group distinct-score
counts (a groupBy, map-side combinable), an exclusive cumsum over the
histogram rows (a window over |distinct scores| rows, not |docs|), and
a tie-break window partitioned by (group, score) whose partitions are
only the tied runs. Value-at-rank selection is a broadcast range join
against the same histogram. The grouped histogram is computed ONCE and
persisted (the dedup.py multi-consumer pattern); group sizes, the
global total, and the global histogram are all |histogram|-row
re-aggregations of it, so the corpus is scanned exactly twice per
query (histogram build + the rank join), never once per statistic.
(BIGINT rank products stay exact below ~2^62; a corpus beyond ~10^9
rows per source should widen the quantile numerator to DECIMAL(38,0) —
noted rather than paid here.)

Boundedness contract: every broadcast here is of the HISTOGRAM, so the
scale story holds only while |distinct scores| stays broadcast-sized.
That is automatic for integer-valued scores (lengths, counts — bounded
by the value range, not the corpus) and for quantized doubles; callers
with raw continuous scores must quantize first (house style: one
F.round to 6dp), or the histogram degenerates toward corpus
cardinality and the broadcast becomes the jaccard-sizes anti-pattern
the r6 verdict flagged.

No reference counterpart (the reference's ETL ends at a star schema);
this extends the tier-4 LLM-pipeline surface like operators/mixing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cumulate(counts: DataFrame, score_col: str, *group_cols: str) -> DataFrame:
    """Attach the EXCLUSIVE running count (``cum_prev`` = rows scoring
    strictly lower in the group) to a (group, score, cnt) frame. The
    window runs over histogram rows only."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return counts.withColumn(
        "cum_prev",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long"),
    )


def score_histogram(df: DataFrame, score_col: str, *group_cols: str) -> DataFrame:
    """Distinct-score counts with the exclusive running count —
    |group × distinct score| rows, tiny relative to the corpus."""
    return _cumulate(
        df.groupBy(*group_cols, score_col).agg(
            F.count("*").cast("long").alias("cnt")
        ),
        score_col,
        *group_cols,
    )


def exact_group_ranks(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str,
    hist: DataFrame | None = None,
) -> DataFrame:
    """Exact 1-based rank of every row within its group under
    ``(score, id)`` ordering, without a group-wide sort: histogram
    ``cum_prev`` (rows scoring strictly lower) + a row_number over the
    tied run only. Adds ``rnk`` and the group size ``n_grp`` (derived
    from the histogram — no extra corpus scan). Pass a precomputed
    (ideally persisted) ``score_histogram(df, score_col, group_col)``
    to share it across consumers."""
    if hist is None:
        hist = score_histogram(df, score_col, group_col)
    sizes = hist.groupBy(group_col).agg(
        F.sum("cnt").cast("long").alias("n_grp")
    )
    tie_w = Window.partitionBy(group_col, score_col).orderBy(id_col)
    return (
        df.join(F.broadcast(hist), [group_col, score_col])
        .join(F.broadcast(sizes), [group_col])
        .withColumn(
            "rnk",
            (F.col("cum_prev") + F.row_number().over(tie_w)).cast("long"),
        )
        .drop("cnt", "cum_prev")
    )


def value_at_rank_from_hist(
    targets: DataFrame, hist: DataFrame, score_col: str, rank_col: str, out_col: str
) -> DataFrame:
    """Select the order statistic at each target's integer rank from a
    (score, cnt, cum_prev) histogram: the unique score whose interval
    ``(cum_prev, cum_prev + cnt]`` contains the rank — identical to
    "sort all rows by (score, id) and take position r", because ties
    collapse to one value. A broadcast range join; the corpus never
    sorts."""
    h = hist.select(
        F.col(score_col).alias(out_col), "cnt", "cum_prev"
    )
    r = F.col(rank_col)
    return targets.join(
        F.broadcast(h),
        (h["cum_prev"] < r) & (r <= h["cum_prev"] + h["cnt"]),
    ).drop("cnt", "cum_prev")


def value_at_global_rank(
    targets: DataFrame, df: DataFrame, score_col: str, rank_col: str, out_col: str
) -> DataFrame:
    """:func:`value_at_rank_from_hist` over a histogram built from
    ``df`` — the convenience form when nothing else needs the
    histogram."""
    return value_at_rank_from_hist(
        targets, score_histogram(df, score_col), score_col, rank_col, out_col
    )


def quantile_normalize(
    df: DataFrame, score_col: str, group_col: str, id_col: str
) -> DataFrame:
    """Map each row's within-group midrank quantile q = (2·rnk−1)/(2·n)
    onto the global score distribution: target global rank =
    ceil(q·N) as the pure integer ``(num + den − 1) div den``, then an
    order-statistic selection. Output adds ``rnk``, ``n_grp``, ``q6``
    (the quantile, an integer half-away 1e-6-unit display — with
    n_grp = 2^6·5^b (320, 1600, …) EVERY odd midrank numerator lands
    on an exact 6dp half boundary, so one structured group size would
    mass-split the float round paths across the engines; the r14
    registry audit), and ``calib_score``. One grouped histogram,
    persisted, feeds ranks, sizes, the global total AND the global
    histogram."""
    # PERSIST: |group x distinct score| histogram rows (bounded by the
    # quantized-score contract above), read by four consumers within
    # this one query; lifetime = session LRU (the returned frame is
    # lazy, so an eager unpersist would drop the cache before use)
    hist = score_histogram(df, score_col, group_col).persist()
    ranked = exact_group_ranks(df, score_col, group_col, id_col, hist=hist)
    total = hist.agg(F.sum("cnt").cast("long").alias("n_total"))
    ghist = _cumulate(
        hist.groupBy(score_col).agg(
            F.sum("cnt").cast("long").alias("cnt")
        ),
        score_col,
    )
    qnum = 2 * F.col("rnk") - 1
    den = 2 * F.col("n_grp")
    with_target = (
        # CROSSJOIN: 1-row global-count frame onto the ranked walk
        ranked.crossJoin(F.broadcast(total))
        # integer ceil division — `div` keeps the arithmetic in BIGINT
        # (a float divide would go lossy past 2^53)
        .withColumn(
            "tr",
            F.expr(
                "(n_total * (2*rnk - 1) + 2*n_grp - 1) div (2*n_grp)"
            ).cast("long"),
        )
        # integer half-away 1e-6 units, never a float round (see doc):
        # round_half_up((2r-1)/(2n) * 1e6) = ((2r-1)*1e6 + n) div (2n)
        .withColumn(
            "q6",
            F.expr("((2*rnk - 1) * 1000000 + n_grp) div (2*n_grp)")
            / F.lit(1_000_000.0),
        )
    )
    return value_at_rank_from_hist(
        with_target, ghist, score_col, "tr", "calib_score"
    ).drop("tr", "n_total")


def group_lower_median(
    df: DataFrame, score_col: str, group_col: str, out_col: str
) -> DataFrame:
    """Per-group LOWER median — the value at rank ``(n+1) div 2`` —
    as a pure selection via the same histogram range join (value
    selection is tie-independent, so no id ordering is even needed;
    group sizes are derived from the histogram, so the corpus is
    scanned once). Lower-median semantics sidestep the even-count
    interpolation whose last-ulp form differs across engines. Returns
    one (group, value) row per group."""
    # PERSIST: histogram rows (see quantile_normalize note); feeds the
    # group-size targets AND the selection join; session-LRU lifetime
    hist = score_histogram(df, score_col, group_col).persist()
    targets = (
        hist.groupBy(group_col)
        .agg(F.sum("cnt").cast("long").alias("_n"))
        .withColumn("_r", F.expr("(_n + 1) div 2").cast("long"))
    )
    h = hist.select(
        F.col(group_col).alias("_g"),
        F.col(score_col).alias(out_col),
        "cnt",
        "cum_prev",
    )
    r = F.col("_r")
    return (
        targets.join(
            F.broadcast(h),
            (targets[group_col] == h["_g"])
            & (h["cum_prev"] < r)
            & (r <= h["cum_prev"] + h["cnt"]),
        )
        .select(group_col, out_col)
    )


def desc_rank_boundaries(
    df: DataFrame,
    value_col: str,
    targets: DataFrame,
    cut_col: str,
    out_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Boundary-value selection under DESCENDING order, without ever
    sorting ``df`` in one task: for each target row (a unique ``_tag``
    column + ``cut_col`` = C, 1-based over df rows ordered by
    ``value_col`` DESC), return the unique boundary value v with

        cnt_above(v) < C <= cnt_above(v) + cnt(v)

    — i.e. "sort desc and take position C" collapsed onto values —
    plus ``n_above`` (rows strictly greater than v) and ``cnt_at``
    (rows equal to v). Those three numbers are all a top-C SUM or a
    rank-to-quantile assignment needs (ties share one value, so no
    per-row order inside the tied run is ever required).

    Shape: one distributed groupBy to the value histogram, a coarse
    range-bucket rollup of the histogram (integer bucket width
    floor(range/n_buckets)+1 >= ceil(range/n_buckets), so at most
    n_buckets buckets; exact while the value SPAN max-min stays below
    2^63 — true for every house quantization (cents, 1e-6/1e-9 units,
    epoch millis), but full-range 64-bit hash keys would overflow the
    span subtraction: rescale such keys first), an ordered cumsum over
    <= n_buckets rows, then
    per-target refinement over ONLY the boundary bucket's slice of the
    histogram (expected |distinct|/n_buckets rows per target). The two
    broadcasts are the <= n_buckets bucket rollup and the |targets|
    frame — both bounded independently of data scale, so the hints are
    sound under the round-7 broadcast rule. Corpus-sized single-task
    sorts never appear; at extreme value skew (one bucket holding most
    DISTINCT values) raise ``n_buckets`` or recurse — noted, not paid
    here.

    ``value_col`` must be integral (quantize doubles first — house
    style: carry cents/1e-6 units as BIGINT); ``targets`` must carry a
    unique ``_tag`` key; 1 <= C <= |df| for every target.
    """
    vals = df.select(F.col(value_col).cast("long").alias("_v"))
    # PERSIST: |distinct value| histogram rows, read by three consumers
    # (the bounds agg, the bucket rollup, the boundary refinement);
    # session-LRU lifetime (lazy return)
    hist = (
        vals.groupBy("_v")
        .agg(F.count("*").cast("long").alias("_cnt"))
        .persist()
    )
    bounds = hist.agg(
        F.min("_v").alias("_lo"),
        # integer bucket width: ceil(range / n_buckets), >= 1
        F.expr(
            f"(max(_v) - min(_v) + {n_buckets}) div {n_buckets}"
        ).alias("_w"),
    )
    # CROSSJOIN: 1-row (lo, width) bounds frame onto the value histogram
    hb = hist.crossJoin(F.broadcast(bounds)).select(
        "_v",
        "_cnt",
        F.expr("(_v - _lo) div _w").cast("long").alias("_b"),
    )
    w_desc = (
        Window.orderBy(F.col("_b").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # <= n_buckets rows: the only empty-partitionBy window in the plan
    bagg = (
        hb.groupBy("_b")
        .agg(F.sum("_cnt").cast("long").alias("_bcnt"))
        .withColumn(
            "_babove",
            F.coalesce(F.sum("_bcnt").over(w_desc), F.lit(0)).cast("long"),
        )
    )
    cut = F.col(cut_col)
    with_bucket = targets.join(
        F.broadcast(bagg),
        (F.col("_babove") < cut) & (cut <= F.col("_babove") + F.col("_bcnt")),
    ).drop("_bcnt")
    # refinement: histogram rows of the boundary bucket only, cumsum
    # desc inside the (target, bucket) slice
    cand = hb.join(F.broadcast(with_bucket), "_b")
    w_val = (
        Window.partitionBy("_tag")
        .orderBy(F.col("_v").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    refined = cand.withColumn(
        "_vabove",
        (
            F.col("_babove")
            + F.coalesce(F.sum("_cnt").over(w_val), F.lit(0))
        ).cast("long"),
    )
    return (
        refined.filter(
            (F.col("_vabove") < cut)
            & (cut <= F.col("_vabove") + F.col("_cnt"))
        )
        .withColumnRenamed("_v", out_col)
        .withColumnRenamed("_vabove", "n_above")
        .withColumnRenamed("_cnt", "cnt_at")
        .drop("_b", "_babove")
    )
