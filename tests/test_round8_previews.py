"""Round-8 query previews: full Spark-vs-DuckDB parity pairs for the
banked calibration surface (operators/calibrate.py) and the BPE
fertility evaluation built on operators/bpe.py, verified NOW so a later
registration is a mechanical @register move.

Same contract as tests/test_round7_previews.py: each test runs the
planned queries() callable against the planned oracle_sql() string with
the driver-sim comparator, so the pair is already proven when promoted.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.operators import bpe, calibrate
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR, assert_frames_match
from .test_round7_previews import bpe_merge_ctes


# -- quantile_normalize_scores -----------------------------------------------
#
# Cross-source quality calibration: every document's within-source
# midrank quantile mapped onto the GLOBAL score distribution by exact
# order-statistic selection. The Spark plan never sorts the corpus in
# one task (histogram-cumsum ranks + a broadcast range join); the
# oracle uses the naive row_number formulation — the two are provably
# the same integer result, which is exactly what the parity test pins.

QUANTILE_NORMALIZE_ORACLE = """
    WITH scored AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score
        FROM documents
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total FROM scored
    ), ranked AS (
        SELECT doc_id, source, score,
               CAST(row_number() OVER (PARTITION BY source
                   ORDER BY score, doc_id) AS BIGINT) AS src_rank,
               CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
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
               round((2 * r.src_rank - 1) * 1.0 / (2 * r.n_src), 6) AS q6
        FROM ranked r
    )
    SELECT t.doc_id, t.source, t.score, t.src_rank, t.n_src, t.q6,
           CAST(g.calib_score AS BIGINT) AS calib_score
    FROM t JOIN g ON g.gr = t.tr
"""


def quantile_normalize_scores(spark, sf_dir):
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


def test_quantile_normalize_oracle_parity(spark, oracle):
    spdf = quantile_normalize_scores(spark, SF_DIR).toPandas()
    opdf = oracle.execute(QUANTILE_NORMALIZE_ORACLE).df()
    assert_frames_match(spdf, opdf, "quantile_normalize_scores")
    n_docs = oracle.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(spdf) == n_docs  # selection always lands: one row per doc


def test_quantile_normalize_invariants(spark):
    pdf = quantile_normalize_scores(spark, SF_DIR).toPandas()
    assert ((pdf["q6"] > 0) & (pdf["q6"] < 1)).all()
    # within a source, calibration is monotone in the raw score
    for _, grp in pdf.groupby("source"):
        g = grp.sort_values(["score", "doc_id"])
        assert g["calib_score"].is_monotonic_increasing
    # the calibrated values are actual corpus scores (a selection,
    # never an interpolation)
    assert set(pdf["calib_score"]) <= set(pdf["score"])


# -- bpe_fertility_stats -----------------------------------------------------
#
# Tokenizer evaluation: induce the k-merge BPE table (the banked
# round-7 loop), apply it to the corpus, and report per-source token
# totals, exact vocabulary sizes, and the compression ratio — the
# "fertility" read a tokenizer change is judged by before a production
# re-tokenization. One int/int ratio rounded once (the measured-safe
# class); everything else is exact integers.

_FERT_K = 3


def bpe_fertility_oracle(k: int) -> str:
    ctes, _ = bpe_merge_ctes(k)
    ctes.append(f"""
    enc AS (
        SELECT c.doc_id, d.source, c.text
        FROM c{k} c JOIN documents d USING (doc_id)
    )""")
    ctes.append("""
    base AS (SELECT doc_id, source, text FROM documents)""")
    ctes.append("""
    bt AS (
        SELECT source, CAST(count(*) AS BIGINT) AS tok_before,
               CAST(count(DISTINCT tok) AS BIGINT) AS vocab_before
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM base)
        GROUP BY source
    )""")
    ctes.append("""
    att AS (
        SELECT source, CAST(count(*) AS BIGINT) AS tok_after,
               CAST(count(DISTINCT tok) AS BIGINT) AS vocab_after
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM enc)
        GROUP BY source
    )""")
    ctes.append("""
    nd AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM base GROUP BY source
    )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
    SELECT nd.source, n_docs, tok_before, vocab_before,
           tok_after, vocab_after,
           round(tok_after * 1.0 / tok_before, 6) AS compression6
    FROM nd
    JOIN bt USING (source)
    JOIN att USING (source)
    """
    )


def bpe_fertility_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    merges = bpe.merge_induction(
        docs.select("doc_id", "text"), n_merges=_FERT_K
    )
    enc = docs
    for m in merges:
        enc = bpe.apply_merge(enc, m["tok_a"], m["tok_b"])

    def stats(df, suffix):
        tok = df.select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        )
        return tok.groupBy("source").agg(
            F.count("*").cast("long").alias(f"tok_{suffix}"),
            F.countDistinct("tok").cast("long").alias(f"vocab_{suffix}"),
        )

    nd = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    return (
        nd.join(stats(docs, "before"), "source")
        .join(stats(enc, "after"), "source")
        .withColumn(
            "compression6",
            F.round(F.col("tok_after") * 1.0 / F.col("tok_before"), 6),
        )
        .select(
            "source",
            "n_docs",
            "tok_before",
            "vocab_before",
            "tok_after",
            "vocab_after",
            "compression6",
        )
    )


def test_bpe_fertility_oracle_parity(spark, oracle):
    spdf = bpe_fertility_stats(spark, SF_DIR).toPandas()
    opdf = oracle.execute(bpe_fertility_oracle(_FERT_K)).df()
    assert_frames_match(spdf, opdf, "bpe_fertility_stats")
    # every merge only ever shrinks the token stream
    assert (spdf["tok_after"] <= spdf["tok_before"]).all()
    assert (spdf["compression6"] <= 1.0).all()
