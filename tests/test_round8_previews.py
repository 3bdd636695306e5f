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

from etl_earthquake_gcp_spark.operators import (
    bpe,
    calibrate,
    mixing,
    sampling,
)
from etl_earthquake_gcp_spark.functions.scalar import (
    CHECKSUM_MOD,
    checksum_modsum,
)
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR, assert_frames_match
from etl_earthquake_gcp_spark.plans.curation_queries import bpe_merge_ctes

# the portable integer id-hash, built from the ONE source of truth in
# operators/sampling.py (same convention as the minhash oracles) — the
# reduced-multiplier form stays ANSI-safe for arbitrary ids, and the
# pmod keeps the residue non-negative for negative ids (r5 ADVICE)
_KEY_SQL = (
    f"((((doc_id % {sampling.HASH_P}) + {sampling.HASH_P})"
    f" % {sampling.HASH_P} * {sampling.HASH_A_RED})"
    f" % {sampling.HASH_P})"
)


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
    # induction tolerates (and preserves) the extra source column, and
    # returns the encoded corpus directly — no re-application pass
    _, enc = bpe.induce_and_encode(docs, n_merges=_FERT_K)

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


# -- top_p_token_budget ------------------------------------------------------
#
# Per-source top-p truncation by cumulative weight: keep each source's
# heaviest documents until ceil(p * total_chars) is covered (the row
# crossing the boundary included). Pure integer arithmetic end to end;
# the kept SET is certified by a modular portable-hash key sum
# (exact decimal accumulation reduced mod 2^61-1: a raw BIGINT sum
# overflows once a source keeps ~2^31 docs, and a bit_xor fold is
# multiplicity-blind; the modular sum is neither).

_TOPP_NUM, _TOPP_DEN = 1, 2  # keep the heaviest half of each source's chars

TOP_P_ORACLE = f"""
    WITH scored AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w FROM documents
    ), cum AS (
        SELECT doc_id, source, w,
               CAST(coalesce(sum(w) OVER (PARTITION BY source
                   ORDER BY w DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS cum_prev,
               CAST(sum(w) OVER (PARTITION BY source) AS BIGINT) AS grp_total
        FROM scored
    ), kept AS (
        SELECT *,
               (grp_total * {_TOPP_NUM} + {_TOPP_DEN} - 1)
                   // {_TOPP_DEN} AS budget
        FROM cum
        WHERE cum_prev < (grp_total * {_TOPP_NUM} + {_TOPP_DEN} - 1)
                             // {_TOPP_DEN}
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(w) AS BIGINT) AS chars_kept,
           CAST(max(grp_total) AS BIGINT) AS total_chars,
           CAST(max(budget) AS BIGINT) AS budget,
           CAST(sum({_KEY_SQL}) % {CHECKSUM_MOD} AS BIGINT)
               AS kept_key_sum
    FROM kept GROUP BY source
"""


def top_p_token_budget(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("w")
    )
    kept = mixing.token_budget_truncate(
        docs, "w", "source", "doc_id", _TOPP_NUM, _TOPP_DEN
    )
    return kept.groupBy("source").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum("w").cast("long").alias("chars_kept"),
        F.max("grp_total").cast("long").alias("total_chars"),
        F.max("budget").cast("long").alias("budget"),
        checksum_modsum(F.expr(_KEY_SQL)).alias("kept_key_sum"),
    )


def test_top_p_token_budget_oracle_parity(spark, oracle):
    spdf = top_p_token_budget(spark, SF_DIR).toPandas()
    opdf = oracle.execute(TOP_P_ORACLE).df()
    assert_frames_match(spdf, opdf, "top_p_token_budget")
    # the kept prefix always covers the budget, never the whole source
    assert (spdf["chars_kept"] >= spdf["budget"]).all()
    assert (spdf["chars_kept"] <= spdf["total_chars"]).all()


# -- weighted_sample_docs ----------------------------------------------------
#
# Efraimidis-Spirakis weighted sampling without replacement, made fully
# deterministic by the portable two-round hash — both engines select
# the exact same 100 documents (see operators/sampling.py for the
# ln-ulp absorption argument).

_WS_N = 100

WEIGHTED_SAMPLE_ORACLE = f"""
    WITH h AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
               {_KEY_SQL} AS h1
        FROM documents WHERE n_chars > 0
    ), k AS (
        SELECT doc_id, source, w,
               CAST(floor({float(sampling.KEY_UNIT)}
                   * ln((((h1 * {sampling.HASH_B_RED}
                           + {sampling.HASH_C}) % {sampling.HASH_P}) + 1)
                        / {float(sampling.HASH_P + 1)})
                   / w) AS BIGINT) AS key_n
        FROM h
    )
    SELECT doc_id, source, w, key_n
    FROM k
    ORDER BY key_n DESC, doc_id
    LIMIT {_WS_N}
"""


def weighted_sample_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("w")
    )
    keyed = sampling.es_sample_keys(docs, "w", "doc_id")
    return sampling.top_weighted(keyed, _WS_N, "doc_id").select(
        "doc_id", "source", "w", "key_n"
    )


def test_weighted_sample_oracle_parity(spark, oracle):
    spdf = weighted_sample_docs(spark, SF_DIR).toPandas()
    opdf = oracle.execute(WEIGHTED_SAMPLE_ORACLE).df()
    assert_frames_match(spdf, opdf, "weighted_sample_docs")
    assert len(spdf) == _WS_N
    assert (spdf["key_n"] < 0).all()  # u < 1 by construction


def test_portable_uniform_negative_ids_and_range(spark):
    """r5 ADVICE regressions: a negative id must still hash into (0, 1]
    (the pre-fix truncated % gave u <= 0 and NULLed the ln-key), and the
    multiply-add second round must populate keys for every row."""
    df = spark.createDataFrame(
        [(-5, 10), (-1, 10), (0, 10), (7, 10), (2**40, 10)],
        "doc_id long, w long",
    )
    keyed = sampling.es_sample_keys(df, "w", "doc_id").toPandas()
    assert len(keyed) == 5
    assert keyed["key_n"].notna().all()
    assert (keyed["key_n"] < 0).all()  # ln(u) < 0 for u < 1


def test_weighted_sample_biases_toward_heavy_docs(spark):
    """The point of weighting: the sampled mean weight exceeds the
    corpus mean (verified to hold under this deterministic hash at
    sf0.001 and sf0.01)."""
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select(F.col("n_chars").cast("long").alias("w"))
        .toPandas()
    )
    samp = weighted_sample_docs(spark, SF_DIR).toPandas()
    assert samp["w"].mean() > docs["w"].mean()


# -- robust_scale_mad --------------------------------------------------------
#
# Per-source robust location/scale (lower median + lower-median absolute
# deviation) and the outlier count at 3 MADs. Medians are rank
# SELECTIONS (row_number == (n+1) div 2), never interpolations, and the
# 3-MAD test is the integer compare |x - med| > 3*mad — zero floats in
# the whole query, so parity is structural. mad = 0 (more than half the
# group tied) degrades gracefully: every x != med counts as an outlier.

ROBUST_MAD_ORACLE = """
    WITH scored AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x FROM documents
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
"""


def robust_scale_mad(spark, sf_dir):
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
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


def test_robust_scale_mad_oracle_parity(spark, oracle):
    spdf = robust_scale_mad(spark, SF_DIR).toPandas()
    opdf = oracle.execute(ROBUST_MAD_ORACLE).df()
    assert_frames_match(spdf, opdf, "robust_scale_mad")
    assert (spdf["mad"] >= 0).all()
    # a median is a corpus value, so at most half the group sits
    # strictly below it
    assert (spdf["n_outliers"] < spdf["n_docs"]).all()


# -- epoch_shuffle_ranges ----------------------------------------------------
#
# The full-order sibling of the registered epoch_shuffle_order (r6
# VERDICT next-step #6): the head-100 query certifies the order's head;
# this certifies the WHOLE training order via monotone key-range
# buckets — per-bucket count/min/max/modular-key-sum + cumulative
# start position, with disjointness proven in-row against the
# closed-form bucket bounds. No global sort, no corpus-sized collect;
# checksums are exact decimal sums reduced mod 2^61-1 (BIGINT on the
# wire, overflow-free at any corpus size, multiplicity-sensitive where
# a bit_xor fold would cancel duplicate keys).

_ESR_EPOCH = 3
_ESR_B = 64

EPOCH_RANGES_ORACLE = f"""
    WITH keyed AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                        || ':{_ESR_EPOCH}'), 1, 8))
                    AS BIGINT) AS shuffle_key
        FROM documents
    ), b AS (
        SELECT (shuffle_key * {_ESR_B}) // 4294967296 AS bucket_id,
               doc_id, shuffle_key
        FROM keyed
    ), agg AS (
        SELECT bucket_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(shuffle_key) AS BIGINT) AS min_key,
               CAST(max(shuffle_key) AS BIGINT) AS max_key,
               CAST(sum(shuffle_key) % {CHECKSUM_MOD} AS BIGINT) AS key_sum,
               CAST(sum(doc_id) % {CHECKSUM_MOD} AS BIGINT) AS id_sum
        FROM b GROUP BY 1
    )
    SELECT bucket_id, n_docs, min_key, max_key, key_sum, id_sum,
           CAST(coalesce(sum(n_docs) OVER (
               ORDER BY bucket_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS cum_start,
           min_key >= (bucket_id * 4294967296 + {_ESR_B} - 1) // {_ESR_B}
           AND max_key <=
               ((bucket_id + 1) * 4294967296 + {_ESR_B} - 1) // {_ESR_B} - 1
               AS in_bounds
    FROM agg
"""


def epoch_shuffle_ranges(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return mixing.epoch_order_ranges(
        docs, epoch=_ESR_EPOCH, n_buckets=_ESR_B
    )


def test_epoch_shuffle_ranges_oracle_parity(spark, oracle):
    spdf = epoch_shuffle_ranges(spark, SF_DIR).toPandas()
    opdf = oracle.execute(EPOCH_RANGES_ORACLE).df()
    assert_frames_match(spdf, opdf, "epoch_shuffle_ranges")
    # the certificate's own invariants: every bucket's keys inside its
    # closed-form bounds (disjointness + order), positions partition the
    # corpus exactly
    assert bool(spdf["in_bounds"].all())
    spdf = spdf.sort_values("bucket_id", ignore_index=True)
    assert (
        spdf["cum_start"] == spdf["n_docs"].cumsum() - spdf["n_docs"]
    ).all()


def test_epoch_ranges_agree_with_full_epoch_order(spark):
    """Cross-check against the registered epoch_order sibling: bucketed
    cum_start positions must equal the global-sort row_number positions
    of each bucket's first element (proving the certificate describes
    the same total order epoch_order materializes)."""
    import pandas as pd

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    full = (
        mixing.epoch_order(docs, epoch=_ESR_EPOCH)
        .toPandas()
        .sort_values(["shuffle_key", "doc_id"], ignore_index=True)
    )
    full["pos"] = range(len(full))
    full["bucket_id"] = (full["shuffle_key"] * _ESR_B) // (2**32)
    first_pos = full.groupby("bucket_id")["pos"].min()
    ranges = (
        epoch_shuffle_ranges(spark, SF_DIR)
        .toPandas()
        .set_index("bucket_id")
    )
    pd.testing.assert_series_equal(
        ranges["cum_start"].sort_index(),
        first_pos.sort_index().astype("int64"),
        check_names=False,
    )
