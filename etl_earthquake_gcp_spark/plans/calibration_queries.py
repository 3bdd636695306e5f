"""Round-8 registrations: cross-source score calibration surfaces.

The two banked library surfaces from operators/calibrate.py, promoted to
the driver registry per the SURVEY.md round-8 registration plan. Each
Spark/oracle pair was proven in tests/test_round8_previews.py across
rounds 6-7 (including the perturbed-testdata rehearsals) before
registration — this move is mechanical.

No reference counterpart (the reference's ETL ends at a star schema,
CarlosDiazData/etl-earthquake-gcp scripts/* stop at BI queries); these
extend the tier-4 LLM-pipeline surface: quantile normalization is the
cross-source quality-threshold calibration step of a corpus-curation
run, and the robust location/scale read is its outlier gate.

Both queries are the repo's flagship ORDER-STATISTIC parity class: all
ranks are integers, every calibrated value is a SELECTION (never an
interpolation), and the one float each emits is a single int/int ratio
rounded once — bit-identical across engines by construction. The scale
story is the point: the oracle uses the naive corpus-wide row_number
formulation, the Spark plan provably computes the SAME integers from a
distinct-score histogram (cumsum over histogram rows + tie windows over
tied runs only + broadcast range-join selection) and never sorts the
corpus in one task. tests/test_bank_plans.py pins both plan shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import calibrate
from ..sources.tables import load_table
from .registry import register


@register(
    "quantile_normalize_scores",
    oracle="""
        WITH scored AS (
            SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score
            FROM documents
        ), tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_total FROM scored
        ), ranked AS (
            SELECT doc_id, source, score,
                   CAST(row_number() OVER (PARTITION BY source
                       ORDER BY score, doc_id) AS BIGINT) AS src_rank,
                   CAST(count(*) OVER (PARTITION BY source) AS BIGINT)
                       AS n_src
            FROM scored
        ), g AS (
            SELECT score AS calib_score,
                   CAST(row_number() OVER (ORDER BY score, doc_id)
                        AS BIGINT) AS gr
            FROM scored
        ), t AS (
            SELECT r.doc_id, r.source, r.score, r.src_rank, r.n_src,
                   ((SELECT n_total FROM tot) * (2 * r.src_rank - 1)
                    + 2 * r.n_src - 1) // (2 * r.n_src) AS tr,
                   -- integer half-away 1e-6 units (r14 audit): with
                   -- n_src = 2^6*5^b every odd midrank numerator sits
                   -- on an exact 6dp half boundary
                   (((2 * r.src_rank - 1) * 1000000 + r.n_src)
                    // (2 * r.n_src)) / 1000000.0 AS q6
            FROM ranked r
        )
        SELECT t.doc_id, t.source, t.score, t.src_rank, t.n_src, t.q6,
               CAST(g.calib_score AS BIGINT) AS calib_score
        FROM t JOIN g ON g.gr = t.tr
    """,
    doc="cross-source quality-score calibration: each doc's within-source "
    "midrank quantile q = (2r-1)/(2n) mapped onto the GLOBAL score "
    "distribution by exact order-statistic selection at rank ceil(q*N) "
    "(operators/calibrate.py::quantile_normalize). Ranks come from a "
    "distinct-score histogram cumsum (windows over histogram rows, not "
    "docs) plus tie windows partitioned by (source, score) over tied "
    "runs only; the selection is a broadcast range join against the "
    "global histogram — the corpus is NEVER sorted in one task, unlike "
    "the naive global row_number the oracle uses (provably the same "
    "integers, which is exactly what the driver hash certifies). The "
    "grouped histogram is built once and persisted; sizes, the global "
    "total and the global histogram are |histogram|-row re-aggregations "
    "of it. ALL integer — q6 is an integer half-away 1e-6-unit display "
    "(r14 audit: a group size of 2^6*5^b = 320, 1600, ... puts every "
    "odd midrank numerator on an exact 6dp half boundary, where the "
    "engines' float round paths split at ~50% rates — one structured "
    "group size away from a mass failure under the old float round).",
)
def quantile_normalize_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("score")
    )
    out = calibrate.quantile_normalize(docs, "score", "source", "doc_id")
    return out.select(
        "doc_id",
        "source",
        "score",
        F.col("rnk").alias("src_rank"),
        F.col("n_grp").alias("n_src"),
        "q6",
        F.col("calib_score").cast("long").alias("calib_score"),
    )


@register(
    "robust_scale_mad",
    oracle="""
        WITH scored AS (
            SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x
            FROM documents
        ), med AS (
            SELECT source, x AS med
            FROM (
                SELECT source, x,
                       row_number() OVER (PARTITION BY source
                           ORDER BY x, doc_id) AS rn,
                       count(*) OVER (PARTITION BY source) AS n
                FROM scored
            )
            WHERE rn = (n + 1) // 2
        ), dev AS (
            SELECT s.doc_id, s.source, s.x, m.med, abs(s.x - m.med) AS d
            FROM scored s JOIN med m USING (source)
        ), mad AS (
            SELECT source, d AS mad
            FROM (
                SELECT source, d,
                       row_number() OVER (PARTITION BY source
                           ORDER BY d, doc_id) AS rn,
                       count(*) OVER (PARTITION BY source) AS n
                FROM dev
            )
            WHERE rn = (n + 1) // 2
        )
        SELECT dev.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(dev.med) AS BIGINT) AS med,
               CAST(min(mad.mad) AS BIGINT) AS mad,
               CAST(sum(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM dev JOIN mad USING (source)
        GROUP BY dev.source
    """,
    doc="per-source robust location/scale: LOWER median (value at rank "
    "(n+1) div 2) and lower median absolute deviation, both pure rank "
    "SELECTIONS via the histogram range join "
    "(operators/calibrate.py::group_lower_median — no corpus sort, no "
    "interpolation; lower-median semantics sidestep the even-count "
    "interpolation whose last-ulp form differs across engines), plus "
    "the 3-MAD outlier count as an integer compare |x - med| > 3*mad. "
    "Zero floats anywhere, so parity is structural. mad = 0 (more than "
    "half the group tied) degrades gracefully: every x != med counts "
    "as an outlier. The per-source medians and MADs are dimension-sized "
    "frames — their broadcasts are bounded by |sources|, not the "
    "corpus.",
)
def robust_scale_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("x")
    )
    med = calibrate.group_lower_median(docs, "x", "source", "med")
    dev = docs.join(F.broadcast(med), ["source"]).withColumn(
        "d", F.abs(F.col("x") - F.col("med"))
    )
    mad = calibrate.group_lower_median(dev, "d", "source", "mad")
    return (
        dev.join(F.broadcast(mad), ["source"])
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("med").cast("long").alias("med"),
            F.min("mad").cast("long").alias("mad"),
            F.sum(F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
    )
