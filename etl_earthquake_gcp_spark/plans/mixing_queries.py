"""Round-6 + round-8 registrations: data-mixing, sampling and
quantization surfaces.

The banked library surfaces from operators/mixing.py,
operators/sampling.py and operators/quantize.py, promoted to the driver
registry per the SURVEY.md registration plan (rounds 6 and 8). Each
Spark/oracle pair was proven in tests/test_round6_previews.py /
tests/test_round8_previews.py at least one round before registration
(including the perturbed-testdata rehearsals) — each move is mechanical.

No reference counterpart (the reference's ETL ends at a star schema,
CarlosDiazData/etl-earthquake-gcp scripts/* stop at BI queries); these
extend the tier-4 LLM-pipeline surface: temperature mixing is the
multilingual-pretraining sampling pattern, the epoch shuffle (head and
full-order-certificate forms) is the deterministic training-order
primitive, int8 quantization is the embedding-store compression step of
a retrieval index, top-p truncation is the per-source char-budget
curation cut, and Efraimidis-Spirakis is the weighted
sample-without-replacement every mixture ablation draws.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import CHECKSUM_MOD, checksum_modsum
from ..operators import mixing, quantize, sampling, splits
from ..sources.tables import load_table
from .registry import register

MIX_ALPHA = 0.3
SHUFFLE_EPOCH = 3
SHUFFLE_HEAD = 100

# round-8 surfaces (constants shared with tests/test_round8_previews.py)
TOPP_NUM, TOPP_DEN = 1, 2  # keep the heaviest half of each source's chars
WS_N = 100  # weighted-sample size
ESR_EPOCH = 3  # full-order certificate: epoch + bucket fan-out
ESR_B = 64

# the portable integer id-hash, built from the ONE source of truth in
# operators/sampling.py (same convention as the minhash oracles) — the
# reduced-multiplier form stays ANSI-safe for arbitrary ids, and the
# pmod keeps the residue non-negative for negative ids (r5 ADVICE)
_KEY_SQL = (
    f"((((doc_id % {sampling.HASH_P}) + {sampling.HASH_P})"
    f" % {sampling.HASH_P} * {sampling.HASH_A_RED})"
    f" % {sampling.HASH_P})"
)


@register(
    "temperature_mix_weights",
    oracle=f"""
        WITH counts AS (
            SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY 1
        ), powed AS (
            SELECT source, n_tokens,
                   pow(n_tokens, {MIX_ALPHA}) AS p
            FROM counts WHERE n_tokens > 0
        )
        SELECT source, n_tokens,
               round(n_tokens * 1.0 / sum(n_tokens) OVER (), 6) AS raw_share,
               round(p / sum(p) OVER (), 6) AS weight,
               round((p / sum(p) OVER ())
                     / (n_tokens * 1.0 / sum(n_tokens) OVER ()), 4)
                   AS oversample
        FROM powed
    """,
    doc="temperature sampling weights (mC4/XLM-R mixing pattern) at "
    "alpha=0.3 over per-source token counts: one corpus scan to the "
    "count table, then a |sources|-row window stage "
    "(operators/mixing.py::temperature_weights). The facts are never "
    "rescanned — at 100 TB the mixing math runs on a dimension-sized "
    "frame.",
)
def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    )
    w = mixing.temperature_weights(
        counts, key_col="source", count_col="n_tokens", alpha=MIX_ALPHA
    )
    return w.select(
        "source",
        "n_tokens",
        F.round("raw_share", 6).alias("raw_share"),
        F.round("weight", 6).alias("weight"),
        F.round("oversample", 4).alias("oversample"),
    )


@register(
    "epoch_shuffle_order",
    oracle=f"""
        SELECT doc_id, shuffle_key, CAST(rn AS BIGINT) AS rn
        FROM (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                             || ':{SHUFFLE_EPOCH}'), 1, 8))
                        AS BIGINT) AS shuffle_key,
                   row_number() OVER (
                       ORDER BY
                           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                     || ':{SHUFFLE_EPOCH}'),
                                                1, 8)) AS BIGINT),
                           doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= {SHUFFLE_HEAD}
    """,
    doc="deterministic per-epoch training order: map-side "
    "portable_hash8(doc_id:epoch) key, no RNG state "
    "(operators/mixing.py::epoch_order). The head-100 selection is "
    "TakeOrderedAndProject (per-partition top-k, one k-sized merge) — "
    "the row_number that replays the exact order for the oracle runs "
    "AFTER the limit, over the 100-row head, never a single-partition "
    "window over the corpus.",
)
def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    head = (
        mixing.epoch_order(docs, epoch=SHUFFLE_EPOCH)
        .orderBy("shuffle_key", "doc_id")
        .limit(SHUFFLE_HEAD)
    )
    w = Window.orderBy("shuffle_key", "doc_id")
    return head.select(
        "doc_id",
        "shuffle_key",
        F.row_number().over(w).cast("long").alias("rn"),
    )


@register(
    "embedding_int8_quantize",
    oracle="""
        WITH exploded AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ), scales AS (
            SELECT vec_id,
                   CASE WHEN max(abs(x)) > 0 THEN max(abs(x)) / 127.0 END
                       AS sc
            FROM exploded GROUP BY 1
        ), codes AS (
            SELECT e.vec_id,
                   CASE WHEN s.sc IS NULL THEN 0
                        ELSE CAST(sign(e.x) * floor(abs(e.x) / s.sc + 0.5)
                                  AS INT) END AS q,
                   CASE WHEN s.sc IS NULL THEN 0.0
                        ELSE abs(e.x - CAST(sign(e.x)
                                 * floor(abs(e.x) / s.sc + 0.5) AS INT)
                                 * s.sc)
                   END AS err
            FROM exploded e JOIN scales s USING (vec_id)
        )
        SELECT c.vec_id,
               round(coalesce(s.sc, 0.0), 6) AS scale,
               CAST(max(abs(c.q)) AS BIGINT) AS max_code,
               CAST(sum(CASE WHEN c.q = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero,
               max(c.err) <= coalesce(s.sc, 0.0) / 2 + 1e-12 AS err_bounded
        FROM codes c JOIN scales s USING (vec_id)
        GROUP BY c.vec_id, s.sc
    """,
    doc="symmetric per-vector int8 quantization of the embedding store "
    "(operators/quantize.py): max-abs/127 scale, round-half-away codes, "
    "dequantize + reconstruction-error audit (err <= scale/2 certified "
    "in-row). Pure Catalyst array expressions — one scan, no shuffle, "
    "no Python; 4x store compression at 100 TB.",
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    scale = quantize.int8_scale(F.col("vec"))
    q = emb.select(
        "vec_id",
        "vec",
        scale.alias("sc"),
        quantize.quantize_int8(F.col("vec"), scale).alias("codes"),
    )
    q = q.withColumn("deq", quantize.dequantize(F.col("codes"), F.col("sc")))
    return q.select(
        "vec_id",
        F.round(F.coalesce("sc", F.lit(0.0)), 6).alias("scale"),
        F.aggregate(
            "codes", F.lit(0), lambda acc, c: F.greatest(acc, F.abs(c))
        )
        .cast("long")
        .alias("max_code"),
        F.aggregate(
            "codes",
            F.lit(0),
            lambda acc, c: acc + F.when(c == 0, 1).otherwise(0),
        )
        .cast("long")
        .alias("n_zero"),
        (
            quantize.reconstruction_error(F.col("vec"), F.col("deq"))
            <= F.coalesce("sc", F.lit(0.0)) / 2 + F.lit(1e-12)
        ).alias("err_bounded"),
    )


@register(
    "top_p_token_budget",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w
            FROM documents
        ), cum AS (
            SELECT doc_id, source, w,
                   CAST(coalesce(sum(w) OVER (PARTITION BY source
                       ORDER BY w DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cum_prev,
                   CAST(sum(w) OVER (PARTITION BY source) AS BIGINT)
                       AS grp_total
            FROM scored
        ), kept AS (
            SELECT *,
                   (grp_total * {TOPP_NUM} + {TOPP_DEN} - 1)
                       // {TOPP_DEN} AS budget
            FROM cum
            WHERE cum_prev < (grp_total * {TOPP_NUM} + {TOPP_DEN} - 1)
                                 // {TOPP_DEN}
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(w) AS BIGINT) AS chars_kept,
               CAST(max(grp_total) AS BIGINT) AS total_chars,
               CAST(max(budget) AS BIGINT) AS budget,
               CAST(sum({_KEY_SQL}) % {CHECKSUM_MOD} AS BIGINT)
                   AS kept_key_sum
        FROM kept GROUP BY source
    """,
    doc="per-source top-p curation by cumulative char weight: keep each "
    "source's heaviest documents until ceil(p*total_chars) is covered, "
    "boundary row included "
    "(operators/mixing.py::token_budget_truncate). Pure integer "
    "arithmetic end to end; the kept SET is certified by a modular "
    "portable-hash key sum (exact decimal accumulation reduced mod "
    "2^61-1 — a raw BIGINT sum overflows once a source keeps ~2^31 "
    "docs, and a bit_xor fold is multiplicity-blind; the modular sum "
    "is neither). One corpus scan, per-source windows, no join at all "
    "(plan-pinned in tests/test_bank_plans.py) — at 100 TB the cut is "
    "a partition-local running sum after one shuffle on source.",
)
def top_p_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("w")
    )
    kept = mixing.token_budget_truncate(
        docs, "w", "source", "doc_id", TOPP_NUM, TOPP_DEN
    )
    return kept.groupBy("source").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum("w").cast("long").alias("chars_kept"),
        F.max("grp_total").cast("long").alias("total_chars"),
        F.max("budget").cast("long").alias("budget"),
        checksum_modsum(F.expr(_KEY_SQL)).alias("kept_key_sum"),
    )


@register(
    "weighted_sample_docs",
    oracle=f"""
        WITH h AS (
            SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
                   {_KEY_SQL} AS h1
            FROM documents WHERE n_chars > 0
        ), k AS (
            SELECT doc_id, source, w,
                   CAST(floor({float(sampling.KEY_UNIT)}
                       * ln((((h1 * {sampling.HASH_B_RED}
                               + {sampling.HASH_C}) % {sampling.HASH_P})
                             + 1)
                            / {float(sampling.HASH_P + 1)})
                       / w) AS BIGINT) AS key_n
            FROM h
        )
        SELECT doc_id, source, w, key_n
        FROM k
        ORDER BY key_n DESC, doc_id
        LIMIT {WS_N}
    """,
    doc="Efraimidis-Spirakis weighted sampling without replacement "
    "(operators/sampling.py): key = ln(u)/w with u from the portable "
    "two-round multiplicative hash, so both engines select the exact "
    "same documents — no RNG state, re-runnable on any cluster. The "
    "one libm ln is floored ONCE into 1e-9-unit BIGINT keys (the DSIR "
    "ulp-absorption class); selection is TakeOrderedAndProject "
    "(per-partition top-k + one k-sized merge, plan-pinned in "
    "tests/test_bank_plans.py) — never a global sort. Sampling bias "
    "toward heavy docs is pinned by test.",
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("w")
    )
    keyed = sampling.es_sample_keys(docs, "w", "doc_id")
    return sampling.top_weighted(keyed, WS_N, "doc_id").select(
        "doc_id", "source", "w", "key_n"
    )


@register(
    "epoch_shuffle_ranges",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                            || ':{ESR_EPOCH}'), 1, 8))
                        AS BIGINT) AS shuffle_key
            FROM documents
        ), b AS (
            SELECT (shuffle_key * {ESR_B}) // 4294967296 AS bucket_id,
                   doc_id, shuffle_key
            FROM keyed
        ), agg AS (
            SELECT bucket_id,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(min(shuffle_key) AS BIGINT) AS min_key,
                   CAST(max(shuffle_key) AS BIGINT) AS max_key,
                   CAST(sum(shuffle_key) % {CHECKSUM_MOD} AS BIGINT)
                       AS key_sum,
                   CAST(sum(doc_id) % {CHECKSUM_MOD} AS BIGINT) AS id_sum
            FROM b GROUP BY 1
        )
        SELECT bucket_id, n_docs, min_key, max_key, key_sum, id_sum,
               CAST(coalesce(sum(n_docs) OVER (
                   ORDER BY bucket_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_start,
               min_key >= (bucket_id * 4294967296 + {ESR_B} - 1)
                   // {ESR_B}
               AND max_key <=
                   ((bucket_id + 1) * 4294967296 + {ESR_B} - 1)
                       // {ESR_B} - 1
                   AS in_bounds
        FROM agg
    """,
    doc="the full-order sibling of epoch_shuffle_order: certifies the "
    "ENTIRE deterministic training order via monotone key-range "
    "buckets ((key*B) div 2^32) — per-bucket count/min/max, modular "
    "key/id checksums (exact decimal sums reduced mod 2^61-1: "
    "overflow-free at any corpus size AND multiplicity-sensitive "
    "where a bit_xor fold would cancel duplicate keys) and the "
    "cumulative start position, with disjointness certified IN-ROW "
    "against the closed-form bucket bounds "
    "(operators/mixing.py::epoch_order_ranges). No global sort, no "
    "range exchange (plan-pinned in tests/test_bank_plans.py), no "
    "corpus-sized collect: the bucket window runs over B=64 rows. "
    "Cross-checked against epoch_shuffle_order's materialized "
    "positions by test.",
)
def epoch_shuffle_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return mixing.epoch_order_ranges(docs, epoch=ESR_EPOCH, n_buckets=ESR_B)


# -- round-9 registration ----------------------------------------------------

SPLIT_SPEC = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
_SPLIT_VALUES = ", ".join(
    f"('{name}', {w}, {i})" for i, (name, w) in enumerate(SPLIT_SPEC)
)


@register(
    "exact_stratified_split",
    oracle=f"""
        WITH sizes AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY source
        ), w AS (
            SELECT source, n, s.split, s.weight, s.ord
            FROM sizes, (VALUES {_SPLIT_VALUES}) s(split, weight, ord)
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
                   n - sum(floor_quota) OVER (PARTITION BY source)
                       AS shortfall
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
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS hi
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
               CAST(sum({{key_sql}}) % {{checksum_mod}} AS BIGINT)
                   AS key_sum
        FROM ranked r
        JOIN bounds b ON r.source = b.source AND b.lo < r.rn AND r.rn <= b.hi
        GROUP BY 1, 2
    """.format(key_sql="___KEY_SQL___", checksum_mod=CHECKSUM_MOD)
    .replace("___KEY_SQL___", _KEY_SQL),
    doc="deterministic train/val/test assignment, exactly proportioned "
    "per source via the grouped Hamilton apportionment "
    "(operators/splits.py::stratified_split_assign), ordered inside "
    "each stratum by the portable md5 shuffle key. The oracle replays "
    "the ENTIRE assignment (quota + boundary + rank chain); per-split "
    "membership is certified by the portable-hash key sum reduced mod "
    "2^61-1 (multiplicity-sensitive, overflow-free). Scale: one "
    "per-stratum window over the doc frame (the same shape as the "
    "registered epoch_shuffle_order) plus a source-count broadcast — "
    "no global sort, no collect. Reference has no counterpart "
    "(CarlosDiazData/etl-earthquake-gcp stops at BI); this is the "
    "train-split primitive of a curation pipeline.",
)
def exact_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    assigned = splits.stratified_split_assign(
        docs, "source", "doc_id", SPLIT_SPEC
    )
    return assigned.groupBy("source", "split").agg(
        F.count("*").cast("long").alias("n_docs"),
        checksum_modsum(F.expr(_KEY_SQL)).alias("key_sum"),
    )
