"""Round-9 query previews: full Spark-vs-DuckDB parity pairs for the
deterministic-split surface (operators/splits.py) and two corpus-audit
surfaces (source-overlap MinHash, Zipf slope fit), verified NOW so a
later registration is a mechanical @register move.

Same contract as tests/test_round7_previews.py: each test runs the
planned queries() callable against the planned oracle_sql() string with
the driver-sim comparator, so the pair is already proven when promoted.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.operators import dedup, sampling, splits
from etl_earthquake_gcp_spark.functions.scalar import (
    CHECKSUM_MOD,
    checksum_modsum,
)
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR, assert_frames_match
from .test_round8_previews import _KEY_SQL

_P = 2147483647  # Mersenne 2^31-1, the shared (a*x+b) mod p modulus
assert _P == sampling.HASH_P  # the minhash modulus IS the house modulus


# -- exact_stratified_split --------------------------------------------------
#
# Deterministic train/val/test assignment, exactly proportioned per
# source via the grouped Hamilton apportionment, ordered inside each
# stratum by the portable md5 shuffle key. The whole assignment is
# replayed by the oracle; per-split membership is certified by a
# portable-hash key sum.

_SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]

STRATIFIED_SPLIT_ORACLE = f"""
    WITH sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY source
    ), w AS (
        SELECT source, n, s.split, s.weight, s.ord
        FROM sizes, (VALUES ('train', 0.8, 0), ('val', 0.1, 1),
                            ('test', 0.1, 2)) s(split, weight, ord)
    ), q1 AS (
        SELECT source, split, ord, n,
               CAST(round(weight * 1000000, 0) AS BIGINT) AS w_u,
               sum(CAST(round(weight * 1000000, 0) AS BIGINT))
                   OVER (PARTITION BY source) AS t
        FROM w
    ), q2 AS (
        SELECT source, split, ord, n,
               (w_u * n) // t AS floor_quota,
               (w_u * n) % t AS rem
        FROM q1
    ), q3 AS (
        SELECT *,
               row_number() OVER (PARTITION BY source
                   ORDER BY rem DESC, split) AS rr,
               n - sum(floor_quota) OVER (PARTITION BY source) AS shortfall
        FROM q2
    ), quota AS (
        SELECT source, split, ord,
               CAST(floor_quota
                    + CASE WHEN rr <= shortfall THEN 1 ELSE 0 END
                    AS BIGINT) AS quota
        FROM q3
    ), bounds AS (
        SELECT source, split,
               sum(quota) OVER (PARTITION BY source ORDER BY ord
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - quota AS lo,
               sum(quota) OVER (PARTITION BY source ORDER BY ord
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
        FROM quota
    ), ranked AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY
                   CAST(('0x' || substr(md5(doc_id || ':split'), 1, 8))
                        AS BIGINT), doc_id) AS rn
        FROM documents
    )
    SELECT r.source, b.split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum({_KEY_SQL}) % {CHECKSUM_MOD} AS BIGINT)
               AS key_sum
    FROM ranked r
    JOIN bounds b ON r.source = b.source AND b.lo < r.rn AND r.rn <= b.hi
    GROUP BY 1, 2
"""


def exact_stratified_split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    assigned = splits.stratified_split_assign(
        docs, "source", "doc_id", _SPLITS
    )
    return assigned.groupBy("source", "split").agg(
        F.count("*").cast("long").alias("n_docs"),
        checksum_modsum(F.expr(_KEY_SQL)).alias("key_sum"),
    )


def test_stratified_split_oracle_parity(spark, oracle):
    spdf = exact_stratified_split(spark, SF_DIR).toPandas()
    opdf = oracle.execute(STRATIFIED_SPLIT_ORACLE).df()
    assert_frames_match(spdf, opdf, "exact_stratified_split")


def test_stratified_split_exact_proportions(spark):
    pdf = exact_stratified_split(spark, SF_DIR).toPandas()
    pv = pdf.pivot_table(
        index="source", columns="split", values="n_docs", fill_value=0
    )
    n = pv.sum(axis=1)
    # Hamilton exactness: quotas sum to the stratum size and each split
    # is within one row of its exact share
    for name, w in _SPLITS:
        assert (abs(pv[name] - w * n) < 1).all()


# -- source_overlap_minhash --------------------------------------------------
#
# Corpus-overlap audit: per-source MinHash signatures (the repo's
# (a*x+b) mod p family over dictionary token-ids) compared pairwise,
# WITH the exact token-set Jaccard beside the estimate — the mergeable
# sketch and its ground truth in one hash-checked result.

_OVL_H = 16
_OVL_SEED = 42


def source_overlap_oracle() -> str:
    coeffs = dedup.minhash_coeffs(_OVL_H, _OVL_SEED)
    hash_exprs = ",\n               ".join(
        f"min((tid * {a} + {b}) % {_P}) AS h{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    match_sum = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END"
        for i in range(_OVL_H)
    )
    return f"""
    WITH tok AS (
        SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), vocab AS (
        SELECT token, CAST(row_number() OVER (ORDER BY token) - 1
                           AS BIGINT) AS tid
        FROM (SELECT DISTINCT token FROM tok)
    ), tids AS (
        SELECT source, tid FROM tok JOIN vocab USING (token)
    ), sig AS (
        SELECT source,
               {hash_exprs}
        FROM tids GROUP BY source
    ), sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY source
    ), inter AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(count(*) AS BIGINT) AS n_inter
        FROM tok a JOIN tok b
          ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2
    ), pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST({match_sum} AS BIGINT) AS n_match
        FROM sig a JOIN sig b ON a.source < b.source
    )
    SELECT p.src_a, p.src_b, p.n_match,
           round(p.n_match * 1.0 / {_OVL_H}, 6) AS est6,
           CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
           CAST(sa.n + sb.n - coalesce(i.n_inter, 0) AS BIGINT) AS n_union,
           round(coalesce(i.n_inter, 0) * 1.0
                 / (sa.n + sb.n - coalesce(i.n_inter, 0)), 6) AS true6
    FROM pairs p
    LEFT JOIN inter i ON p.src_a = i.src_a AND p.src_b = i.src_b
    JOIN sizes sa ON p.src_a = sa.source
    JOIN sizes sb ON p.src_b = sb.source
    """


def source_overlap_minhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    # the explode+distinct tokenize feeds five consumers with differing
    # projections (vocab, tids, sizes, both inter sides) — persist it
    # once, the dedup.py multi-consumer pattern
    tok = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        )
        .distinct()
        .persist()
    )
    vocab = dedup.token_dictionary(tok)
    tids = tok.join(F.broadcast(vocab), "token").select("source", "tid")
    coeffs = dedup.minhash_coeffs(_OVL_H, _OVL_SEED)
    mins = [
        F.min((F.col("tid") * F.lit(a) + F.lit(b)) % F.lit(_P)).alias(
            f"h{i}"
        )
        for i, (a, b) in enumerate(coeffs)
    ]
    sig = tids.groupBy("source").agg(*mins)
    a, b = sig.alias("a"), sig.alias("b")
    match = sum(
        F.when(F.col(f"a.h{i}") == F.col(f"b.h{i}"), 1).otherwise(0)
        for i in range(_OVL_H)
    )
    pairs = (
        a.join(F.broadcast(b), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            match.cast("long").alias("n_match"),
        )
    )
    sizes = tok.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    x, y = tok.alias("x"), tok.alias("y")
    inter = (
        x.join(
            y,
            (F.col("x.token") == F.col("y.token"))
            & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("src_a"),
            F.col("y.source").alias("src_b"),
        )
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sa = sizes.select(
        F.col("source").alias("src_a"), F.col("n").alias("na")
    )
    sb = sizes.select(
        F.col("source").alias("src_b"), F.col("n").alias("nb")
    )
    n_inter = F.coalesce(F.col("n_inter"), F.lit(0)).cast("long")
    return (
        pairs.join(F.broadcast(inter), ["src_a", "src_b"], "left")
        .join(F.broadcast(sa), ["src_a"])
        .join(F.broadcast(sb), ["src_b"])
        .select(
            "src_a",
            "src_b",
            "n_match",
            F.round(F.col("n_match") * 1.0 / _OVL_H, 6).alias("est6"),
            n_inter.alias("n_inter"),
            (F.col("na") + F.col("nb") - n_inter).alias("n_union"),
            F.round(
                n_inter * 1.0 / (F.col("na") + F.col("nb") - n_inter), 6
            ).alias("true6"),
        )
    )


def test_source_overlap_oracle_parity(spark, oracle):
    spdf = source_overlap_minhash(spark, SF_DIR).toPandas()
    opdf = oracle.execute(source_overlap_oracle()).df()
    assert_frames_match(spdf, opdf, "source_overlap_minhash")
    n_src = spdf[["src_a", "src_b"]].stack().nunique()
    assert len(spdf) == n_src * (n_src - 1) // 2  # every pair present


# -- zipf_slope_fit ----------------------------------------------------------
#
# Vocabulary power-law audit: per-source OLS fit of ln(freq) on
# ln(rank) over the top-R token ranks. Both logs are quantized ONCE to
# integer 1e-3 units (exact-integer ln inputs — the DSIR absorption
# class); every OLS sum is an exact integer; the slope is a single
# int/int rational rounded once. Healthy natural-language text sits
# near slope -1.

_ZIPF_R = 100

# Shared with the round-11 datacard (parity fixes must land ONCE):
# the rank -> integer-log-unit -> OLS-sums SQL chain over a
# freq(source, tok, cnt) CTE, ending in zs; and the slope expression
# with the +0.0 fold (slope is negative-capable, and Spark F.round
# gives +0.0 where DuckDB gives -0.0 on tiny negative rationals).

FREQ_SQL = """freq AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY 1, 2
    )"""


def zipf_sql_stages(top_r: int) -> str:
    return f"""zr AS (
        SELECT source, cnt,
               row_number() OVER (PARTITION BY source
                   ORDER BY cnt DESC, tok) AS r
        FROM freq
        QUALIFY r <= {top_r}
    ), zu AS (
        SELECT source,
               CAST(round(ln(r) * 1000, 0) AS BIGINT) AS x_u,
               CAST(round(ln(cnt) * 1000, 0) AS BIGINT) AS y_u
        FROM zr
    ), zs AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_ranks,
               CAST(sum(x_u) AS BIGINT) AS sx,
               CAST(sum(y_u) AS BIGINT) AS sy,
               CAST(sum(x_u * y_u) AS BIGINT) AS sxy,
               CAST(sum(x_u * x_u) AS BIGINT) AS sxx
        FROM zu GROUP BY source
    )"""


ZIPF_SLOPE_SQL = (
    "round((n_ranks * sxy - sx * sy) * 1.0"
    " / (n_ranks * sxx - sx * sx), 6) + 0.0"
)

ZIPF_ORACLE = f"""
    WITH {FREQ_SQL},
    {zipf_sql_stages(_ZIPF_R)}
    SELECT source, n_ranks, sx, sy, sxy, sxx,
           {ZIPF_SLOPE_SQL} AS slope6
    FROM zs
    WHERE n_ranks > 1
"""


def token_freq(docs):
    """(source, tok, cnt) token-frequency frame — the shared substrate
    of the Zipf fit, lexical diversity, and the round-11 datacard."""
    return (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def zipf_sums(freq, top_r):
    """Per-source integer OLS sums over the top-R log-log rank points."""
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), "tok")
    zu = (
        freq.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= top_r)
        .select(
            "source",
            F.round(F.log(F.col("r")) * 1000, 0).cast("long").alias("x_u"),
            F.round(F.log(F.col("cnt")) * 1000, 0)
            .cast("long")
            .alias("y_u"),
        )
    )
    return zu.groupBy("source").agg(
        F.count("*").cast("long").alias("n_ranks"),
        F.sum("x_u").cast("long").alias("sx"),
        F.sum("y_u").cast("long").alias("sy"),
        F.sum(F.col("x_u") * F.col("y_u")).cast("long").alias("sxy"),
        F.sum(F.col("x_u") * F.col("x_u")).cast("long").alias("sxx"),
    )


def zipf_slope6_col():
    num = F.col("n_ranks") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_ranks") * F.col("sxx") - F.col("sx") * F.col("sx")
    return F.round(num * 1.0 / den, 6) + F.lit(0.0)


def zipf_slope_fit(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    s = zipf_sums(token_freq(docs), _ZIPF_R)
    return s.filter(F.col("n_ranks") > 1).select(
        "source",
        "n_ranks",
        "sx",
        "sy",
        "sxy",
        "sxx",
        zipf_slope6_col().alias("slope6"),
    )


def test_zipf_slope_oracle_parity(spark, oracle):
    spdf = zipf_slope_fit(spark, SF_DIR).toPandas()
    opdf = oracle.execute(ZIPF_ORACLE).df()
    assert_frames_match(spdf, opdf, "zipf_slope_fit")
    # token frequencies never GROW with rank (exactly 0 only for a
    # degenerate source whose top-R counts are all equal)
    assert (spdf["slope6"] <= 0).all()


# -- doc_novelty_ngram -------------------------------------------------------
#
# Cross-document boilerplate/overlap audit: the share of each doc's
# DISTINCT 5-grams that also occur in at least one other document (the
# within-doc sibling is the registered dup_ngram_ratio). Integer counts
# + one int/int ratio rounded once.

_NOV_N = 5

# Shared with the round-11 datacard: the distinct-gram + doc-frequency
# stages, carrying BOTH doc_id and source (doc -> source is functional,
# so the per-doc semantics are unchanged and the per-source consumer
# needs no second tokenize).

GRAM_SQL_STAGES = f"""t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id, source,
               array_to_string(toks[i:i + {_NOV_N} - 1], ' ') AS gram
        FROM t, LATERAL (SELECT unnest(generate_series(1,
                 len(toks) - {_NOV_N} + 1)) AS i) s
        WHERE len(toks) >= {_NOV_N}
    ), reach AS (
        SELECT gram, CAST(count(*) AS BIGINT) AS n_docs_with
        FROM grams GROUP BY gram
    )"""

NOVELTY_ORACLE = f"""
    WITH {GRAM_SQL_STAGES}
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN r.n_docs_with > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shared,
           round(sum(CASE WHEN r.n_docs_with > 1 THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS shared6
    FROM grams g JOIN reach r USING (gram)
    GROUP BY g.doc_id
"""


def gram_frame(docs):
    """Persisted distinct (doc_id, source, gram) 5-gram frame —
    tokenizes ONCE into a toks column (the split() stays out of the
    transform lambda, where Catalyst cannot share it)."""
    return (
        docs.select("doc_id", "source", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= _NOV_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_NOV_N} + 1),"
                    f" i -> array_join(slice(toks, i, {_NOV_N}), ' '))"
                )
            ).alias("gram"),
        )
        .distinct()
        .persist()  # feeds the doc-frequency agg AND the join back
    )


def reach_frame(grams):
    # gram_frame is already distinct on (doc_id, source, gram) and
    # doc -> source is functional, so rows are unique per (doc_id,
    # gram) — count directly, no second distinct shuffle
    return grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("n_docs_with")
    )


def doc_novelty_ngram(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    grams = gram_frame(docs)
    shared = F.sum(
        F.when(F.col("n_docs_with") > 1, 1).otherwise(0)
    ).cast("long")
    return (
        grams.join(reach_frame(grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            shared.alias("n_shared"),
            F.round(shared * 1.0 / F.count("*"), 6).alias("shared6"),
        )
    )


def test_doc_novelty_oracle_parity(spark, oracle):
    spdf = doc_novelty_ngram(spark, SF_DIR).toPandas()
    opdf = oracle.execute(NOVELTY_ORACLE).df()
    assert_frames_match(spdf, opdf, "doc_novelty_ngram")
    assert (spdf["n_shared"] <= spdf["n_grams"]).all()
    assert ((spdf["shared6"] >= 0) & (spdf["shared6"] <= 1)).all()


# -- lexical_diversity_stats -------------------------------------------------
#
# Per-source corpus-health metrics from one token-frequency table:
# type-token ratio and hapax share — the quick reads that flag
# template-generated or truncated shards before training. All integers
# + two independent single-ratio rounds.

LEXDIV_ORACLE = """
    WITH freq AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
           round(count(*) * 1.0 / sum(cnt), 6) AS ttr6,
           round(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS hapax6
    FROM freq GROUP BY source
"""


def lexical_diversity_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    freq = token_freq(docs)
    hapax = F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).cast("long")
    return freq.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        hapax.alias("n_hapax"),
        F.round(F.count("*") * 1.0 / F.sum("cnt"), 6).alias("ttr6"),
        F.round(hapax * 1.0 / F.count("*"), 6).alias("hapax6"),
    )


def test_lexical_diversity_oracle_parity(spark, oracle):
    spdf = lexical_diversity_stats(spark, SF_DIR).toPandas()
    opdf = oracle.execute(LEXDIV_ORACLE).df()
    assert_frames_match(spdf, opdf, "lexical_diversity_stats")
    assert (spdf["n_hapax"] <= spdf["n_types"]).all()
    assert (spdf["n_types"] <= spdf["n_tokens"]).all()
