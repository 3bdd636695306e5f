"""Text / LLM-data-pipeline queries over the ``documents`` table.

SURVEY.md §7 tier 4(b): dedup (exact + n-gram Jaccard near-dup), text stats,
token counting, language scoring, fingerprinting — each with a DuckDB oracle.
The MinHash-LSH / SimHash scale paths live in ``operators/dedup.py`` (their
band-hash functions aren't bit-identical across engines, so they get rows-only
driver checks via ml/streaming-style registration where applicable).

Tokenization convention (both engines): split on single space — the synthetic
corpus is single-space-delimited lowercase words (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import portable_hash8, quantized_half_away
from ..operators.dedup import (
    jaccard_pairs_bitmask,
    minhash_quality_oracle_sql,
    tokenize_distinct,
    minhash_band_pairs_grouped,
    minhash_band_pairs_open,
    minhash_oracle_sql,
    minhash_pairs_cte,
    minhash_shingle_oracle_sql,
    shingle_distinct,
    simhash_near_pairs,
    simhash_oracle_sql,
    token_dictionary,
)
from ..operators.sketch import countmin_estimates, countmin_grid, countmin_oracle_sql
from ..sources.tables import load_table
from .registry import QUERIES, register

# --------------------------------------------------------------------------
# P1-P3 analog — explode tokens + array access (b2s.py:46-73 capability class)
# --------------------------------------------------------------------------


@register(
    "explode_token_counts",
    oracle="""
        SELECT t.token, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        GROUP BY t.token
    """,
    doc="explode over a split array + group-count (P1 generator class, "
    "b2s.py:46). Corpus-wide token frequencies.",
)
def explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@register(
    "bpe_token_counts",
    oracle="""
        SELECT t.piece, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(regexp_extract_all(text, '[a-z]{1,4}')) AS piece
              FROM documents) t
        GROUP BY t.piece
    """,
    doc="BPE-ish subword token counting: greedy fixed-width pieces via "
    "regexp_extract_all (both engines use greedy leftmost matching, so "
    "piece boundaries are identical). The whitespace-tokenizer twin is "
    "explode_token_counts; a real BPE swaps the regex for a merges-table "
    "broadcast join over these pieces.",
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.explode(F.regexp_extract_all("text", F.lit("[a-z]{1,4}"), 0)).alias(
                "piece"
            )
        )
        .groupBy("piece")
        .agg(F.count("*").alias("n"))
    )


@register(
    "countmin_token_freq",
    oracle=countmin_oracle_sql(),
    doc="count-min sketch (operators/sketch.py): 4×64 seeded counter grid "
    "built in one grid-sized shuffle, min-over-rows estimates vs exact "
    "counts (est_n >= true_n always; equality when no bucket collision). "
    "Portable arithmetic hashes make even the sketch internals "
    "oracle-checkable bit-for-bit.",
)
def countmin_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    vocab = token_dictionary(tok)
    occurrences = tok.join(F.broadcast(vocab), "token").select("tid")
    grid = countmin_grid(occurrences)
    est = countmin_estimates(grid, vocab)
    exact = tok.groupBy("token").agg(F.count("*").alias("true_n"))
    return est.join(exact, "token").select("token", "true_n", "est_n")


@register(
    "array_access_first_last",
    oracle="""
        SELECT doc_id,
               string_split(text, ' ')[1] AS first_token,
               string_split(text, ' ')[-1] AS last_token,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    """,
    doc="array element access by index (P3, b2s.py:71-73 coordinates[i]) "
    "+ array length.",
)
def array_access_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        toks.getItem(0).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# Exact dedup — hash-groupBy (tier-4 'exact' dedup)
# --------------------------------------------------------------------------


@register(
    "exact_dedup_docs",
    oracle="""
        SELECT sha256(text) AS text_hash,
               CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM documents
        GROUP BY sha256(text)
    """,
    doc="exact dedup via content-hash groupBy keeping min doc_id (tier-4 "
    "exact dedup; scales as a single partial-agg shuffle on the 32-byte "
    "hash, never on the full text).",
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.sha2("text", 256).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


# --------------------------------------------------------------------------
# Text quality stats — length / token / punctuation / stopword ratios
# --------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "in")
_DECON_N = 5  # n-gram width for decontamination overlap (corpus docs are short)


@register(
    "text_quality_stats",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, source, text,
                   string_split(text, ' ') AS toks
            FROM documents
        )
        SELECT doc_id, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
               round(length(text) * 1.0 / len(toks), 2) AS avg_token_len,
               CAST(len(list_filter(toks,
                   x -> x IN {_STOPWORDS!r})) AS BIGINT) AS n_stopwords,
               round(len(list_filter(toks, x -> x IN {_STOPWORDS!r})) * 1.0
                     / len(toks), 4) AS stopword_ratio
        FROM t
    """,
    doc="per-document quality stats: char/token/unique-token counts, avg "
    "token length, stopword ratio (tier-4 quality scoring). All built-in "
    "higher-order array fns — no Python in the hot path.",
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        F.round(F.length("text") * F.lit(1.0) / F.size(toks), 2).alias("avg_token_len"),
        n_stop.cast("long").alias("n_stopwords"),
        F.round(n_stop * F.lit(1.0) / F.size(toks), 4).alias("stopword_ratio"),
    )


_CURATION_KEEP_SQL = f"""
            NOT (len(string_split(text, ' ')) < 20)
            AND NOT (length(text) * 1.0
                     / len(string_split(text, ' ')) > 9.0)
            AND NOT (len(list_filter(string_split(text, ' '),
                         x -> x IN {_STOPWORDS!r})) * 1.0
                     / len(string_split(text, ' ')) < 0.02)
"""

_CURATION_GRAMS_SQL = """
            unnest(list_distinct(list_transform(
                generate_series(1, greatest(len(string_split(text, ' '))
                                            - {w}, 1)),
                i -> array_to_string(
                    list_slice(string_split(text, ' '), i, i + {w}), ' ')
            ))) AS gram
"""


@register(
    "corpus_curation_pipeline",
    oracle=f"""
        WITH RECURSIVE kept AS (
            SELECT doc_id, source, text, n_chars FROM documents
            WHERE {_CURATION_KEEP_SQL}
        ), {minhash_pairs_cte(n_hashes=16, n_bands=4, threshold=0.8,
                              seed=42, source="kept")}
        , dedup_edges AS (
            SELECT doc_a AS a, doc_b AS b FROM mh_pairs
            UNION ALL
            SELECT doc_b, doc_a FROM mh_pairs
        ), reach(id, r) AS (
            SELECT doc_id, doc_id FROM kept
            UNION
            SELECT e.b, reach.r FROM reach JOIN dedup_edges e ON e.a = reach.id
        ), components AS (
            SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
        ), ranked AS (
            SELECT k.doc_id, k.source, k.text,
                   row_number() OVER (PARTITION BY c.component
                                      ORDER BY k.n_chars DESC, k.doc_id) AS rn
            FROM components c JOIN kept k USING (doc_id)
        ), canon AS (
            SELECT doc_id, source, text FROM ranked WHERE rn = 1
        ), bgrams AS (
            SELECT DISTINCT {_CURATION_GRAMS_SQL.format(w=_DECON_N - 1)}
            FROM documents WHERE doc_id % 50 = 0
        ), cgrams AS (
            SELECT doc_id, {_CURATION_GRAMS_SQL.format(w=_DECON_N - 1)}
            FROM canon WHERE doc_id % 50 <> 0
        ), contaminated AS (
            SELECT DISTINCT doc_id FROM cgrams JOIN bgrams USING (gram)
        ), clean AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS n_tok
            FROM canon
            WHERE doc_id % 50 <> 0
              AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        )
        SELECT r.source, r.n_raw,
               coalesce(k.n_kept, 0) AS n_kept,
               coalesce(cn.n_canonical, 0) AS n_canonical,
               coalesce(cl.n_clean, 0) AS n_clean,
               coalesce(cl.clean_tokens, 0) AS clean_tokens
        FROM (SELECT source, CAST(count(*) AS BIGINT) AS n_raw
              FROM documents GROUP BY 1) r
        LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_kept
                   FROM kept GROUP BY 1) k USING (source)
        LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_canonical
                   FROM canon GROUP BY 1) cn USING (source)
        LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_clean,
                          CAST(sum(n_tok) AS BIGINT) AS clean_tokens
                   FROM clean GROUP BY 1) cl USING (source)
    """,
    doc="the END-TO-END curation pipeline as ONE lazy plan — the stages "
    "every training-data run chains, composed from this repo's proven "
    "pieces: C4/Gopher-style quality KEEP filter -> banded-MinHash "
    "near-dup components over the kept subset (signature dictionary "
    "built on exactly that subset) -> longest-doc canonical selection "
    "per cluster -> n-gram decontamination of the canonical set against "
    "the held-out benchmark -> per-source funnel counts + surviving "
    "token budget. The oracle replays the whole chain (keep ladder, "
    "mh_pairs CTE over the filtered CTE, recursive reachability, "
    "canonical window, gram semi-join) bit-for-bit. Scale shape: every "
    "stage is the certified operator's plan — scan-shaped filter, "
    "band-key shuffles, component iterations on the pair graph, "
    "broadcast benchmark grams; nothing quadratic, nothing collected.",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_band_pairs
    from ..operators.graph import connected_components

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    keep = (
        ~(F.size(toks) < 20)
        & ~(F.length("text") * F.lit(1.0) / F.size(toks) > 9.0)
        & ~(n_stop * F.lit(1.0) / F.size(toks) < 0.02)
    )
    # PERSIST: quality-kept corpus, read by the near-dup components
    # join AND the canonical rewrite; session-LRU lifetime
    kept = d.filter(keep).persist()

    pairs = minhash_band_pairs(kept, n_hashes=16, n_bands=4, threshold=0.8, seed=42)
    comp = connected_components(
        vertices=kept.select(F.col("doc_id").alias("id")),
        edges=pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ),
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), "doc_id")
    canon = (
        comp.join(kept, comp.id == kept.doc_id)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "text")
        # PERSIST: canonical survivors, read by the per-source census
        # AND the output assembly; session-LRU lifetime
        .persist()
    )

    gen = (
        f"array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - {_DECON_N - 1}, 1)),"
        f" i -> array_join(slice(split(text, ' '), i, {_DECON_N}), ' ')))"
    )
    bench = (
        d.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(F.expr(gen)).alias("gram"))
        .distinct()
    )
    cgrams = (
        canon.filter(F.col("doc_id") % 50 != 0)
        .select("doc_id", F.explode(F.expr(gen)).alias("gram"))
    )
    contaminated = (
        cgrams.join(F.broadcast(bench), "gram").select("doc_id").distinct()
    )
    clean = (
        canon.filter(F.col("doc_id") % 50 != 0)
        .join(contaminated, "doc_id", "left_anti")
        .select("source", F.size(F.split("text", " ")).alias("n_tok"))
    )

    s_raw = d.groupBy("source").agg(F.count("*").alias("n_raw"))
    s_kept = kept.groupBy("source").agg(F.count("*").alias("n_kept"))
    s_canon = canon.groupBy("source").agg(F.count("*").alias("n_canonical"))
    s_clean = clean.groupBy("source").agg(
        F.count("*").alias("n_clean"), F.sum("n_tok").alias("clean_tokens")
    )
    return (
        s_raw.join(F.broadcast(s_kept), "source", "left")
        .join(F.broadcast(s_canon), "source", "left")
        .join(F.broadcast(s_clean), "source", "left")
        .select(
            "source",
            "n_raw",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("n_canonical", F.lit(0)).alias("n_canonical"),
            F.coalesce("n_clean", F.lit(0)).alias("n_clean"),
            F.coalesce("clean_tokens", F.lit(0)).alias("clean_tokens"),
        )
    )


@register(
    "char_entropy_scores",
    oracle="""
        WITH ch AS (
            SELECT doc_id, unnest(string_split(text, '')) AS ch
            FROM documents
        ), c AS (
            SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt
            FROM ch GROUP BY 1, 2
        ), e AS (
            SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total_chars,
                   sum(cnt * log2(cnt)) AS clog
            FROM c GROUP BY 1
        )
        SELECT doc_id, total_chars,
               round(log2(total_chars) - clog / total_chars, 4)
                   AS char_entropy
        FROM e
    """,
    doc="character-level Shannon entropy per document — the gibberish / "
    "mojibake / base64-blob detector every training-data quality stack "
    "runs (natural text sits ~4-4.5 bits/char; encoded blobs near 6, "
    "repeated-char spam near 0). Computed from integer char counts via "
    "H = log2(n) - (sum c*log2 c)/n, so both engines feed libm the same "
    "integers and only the final rounded double is compared. Two "
    "scan-shaped aggs: (doc, char) cells then per-doc fold — shuffle "
    "volume is distinct cells, bounded by 64 x docs for any byte "
    "alphabet.",
)
def char_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")  # Spark split('') emits a trailing ""
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("cnt"))
    e = counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("total_chars"),
        F.sum(F.col("cnt") * F.log2("cnt")).alias("clog"),
    )
    return e.select(
        "doc_id",
        "total_chars",
        F.round(
            F.log2("total_chars") - F.col("clog") / F.col("total_chars"), 4
        ).alias("char_entropy"),
    )


# --------------------------------------------------------------------------
# Language scoring — deterministic n-gram/stopword heuristic (tier-4 lang-ID)
# --------------------------------------------------------------------------

_EN_MARKERS = ("the", "a", "value", "row", "table")


@register(
    "lang_score",
    oracle=f"""
        WITH t AS (SELECT doc_id, lang,
                          string_split(text, ' ') AS toks FROM documents)
        SELECT doc_id, lang,
               round(len(list_filter(toks, x -> x IN {_EN_MARKERS!r})) * 1.0
                     / len(toks), 4) AS en_score,
               len(list_filter(toks, x -> x IN {_EN_MARKERS!r})) * 1.0
                   / len(toks) >= 0.10 AS looks_en
        FROM t
    """,
    doc="language-ID heuristic: marker-token ratio + threshold flag (tier-4 "
    "lang-ID; deterministic, oracle-checked formula).",
)
def lang_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    markers = F.array(*[F.lit(s) for s in _EN_MARKERS])
    score = F.size(F.filter(toks, lambda x: F.array_contains(markers, x))) * F.lit(
        1.0
    ) / F.size(toks)
    return d.select(
        "doc_id",
        "lang",
        F.round(score, 4).alias("en_score"),
        (score >= 0.10).alias("looks_en"),
    )


# --------------------------------------------------------------------------
# N-gram Jaccard near-dup — pairwise via token inverted index (tier-4)
# --------------------------------------------------------------------------


@register(
    "jaccard_near_dup_pairs",
    oracle="""
        WITH tok AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), sizes AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY doc_id
        ), common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT c.doc_a, c.doc_b,
               round(c.n_common * 1.0 / (sa.n + sb.n - c.n_common), 4) AS jaccard
        FROM common c
        JOIN sizes sa ON c.doc_a = sa.doc_id
        JOIN sizes sb ON c.doc_b = sb.doc_id
        WHERE c.n_common * 1.0 / (sa.n + sb.n - c.n_common) >= 0.8
    """,
    doc="exact token-set Jaccard near-dup pairs ≥0.8 (tier-4). Implemented "
    "via bitmask dictionary encoding (operators/dedup.py "
    "jaccard_pairs_bitmask): the 31-token vocabulary fits a BIGINT, so "
    "pairwise work runs over ~4k distinct masks instead of an "
    "inverted-index join over 5k docs (250s → ~2s at sf0.1). Oracle states "
    "the naive set-count formula — outputs are bit-identical.",
    bench=True,
)
def jaccard_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return jaccard_pairs_bitmask(d, threshold=0.8)


@register(
    "ppjoin_prefix_pairs",
    # the oracle is the NAIVE all-pairs ground truth (same SQL as
    # jaccard_near_dup_pairs): prefix filtering is lossless, so the
    # pruned plan must reproduce it bit-for-bit — the strongest possible
    # check for a candidate-pruning strategy.
    oracle="""
        WITH tok AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), sizes AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY doc_id
        ), common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT c.doc_a, c.doc_b,
               round(c.n_common * 1.0 / (sa.n + sb.n - c.n_common), 4) AS jaccard
        FROM common c
        JOIN sizes sa ON c.doc_a = sa.doc_id
        JOIN sizes sb ON c.doc_b = sb.doc_id
        WHERE c.n_common * 1.0 / (sa.n + sb.n - c.n_common) >= 0.8
    """,
    doc="PPJoin-style prefix-filtered EXACT similarity join (>= 0.8 "
    "Jaccard): tokens ranked by global rarity; each doc probes only its "
    "p = |x| - ceil(0.8|x|) + 1 rarest tokens, and any true pair "
    "provably shares a prefix token — a LOSSLESS candidate filter, "
    "unlike MinHash banding's probabilistic recall. The third exact-"
    "sim-join strategy beside all-pairs bitmask and banded MinHash "
    "(operators/dedup.py ppjoin_pairs); oracle = the naive all-pairs "
    "SQL, so the pruned plan is held to the exact ground truth.",
)
def ppjoin_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import ppjoin_pairs

    d = load_table(spark, sf_dir, "documents")
    return ppjoin_pairs(d, threshold_num=4, threshold_den=5)


from .oracle_shared import _pairs_cte  # noqa: E402


@register(
    "near_dup_components",
    oracle=f"""
        WITH RECURSIVE {_pairs_cte()}
        SELECT doc_id, component FROM components
    """,
    doc="dedup resolution (iterative algorithm class): connected components "
    "over the ≥0.8 Jaccard pair graph via min-label propagation "
    "(operators/graph.py) — pairs become GROUPS, each labeled by its "
    "minimum doc_id. Two shuffles per round, lineage truncated by "
    "localCheckpoint, converges in diameter rounds. Oracle = recursive "
    "reachability CTE: even the iterative loop meets the differential bar.",
)
def near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs_bitmask(d, threshold=0.8)
    return connected_components(
        vertices=d.select(F.col("doc_id").alias("id")),
        edges=pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
    ).select(F.col("id").alias("doc_id"), "component")


@register(
    "clean_corpus_by_source",
    oracle=f"""
        WITH RECURSIVE {_pairs_cte("lang = 'en' AND n_chars >= 100")}
        SELECT c.source,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(count(*) FILTER (WHERE k.component = k.doc_id) AS BIGINT)
                   AS n_survivors
        FROM components k JOIN cand c USING (doc_id)
        GROUP BY c.source
    """,
    doc="capstone training-data pipeline: language filter (lang='en') + "
    "quality floor (n_chars>=100) + transitive near-dup resolution, "
    "keeping one representative per duplicate cluster — per-source "
    "candidate and survivor counts. Composes filter → bitmask Jaccard → "
    "iterative components in one lazy plan chain.",
)
def clean_corpus_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    d = load_table(spark, sf_dir, "documents")
    cand = d.filter((F.col("lang") == "en") & (F.col("n_chars") >= 100))
    pairs = jaccard_pairs_bitmask(cand, threshold=0.8)
    comp = connected_components(
        vertices=cand.select(F.col("doc_id").alias("id")),
        edges=pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
    )
    return (
        comp.join(cand, comp.id == cand.doc_id)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_candidates"),
            F.count_if(F.col("component") == F.col("doc_id")).alias("n_survivors"),
        )
    )


# --------------------------------------------------------------------------
# Document fingerprinting — rolling/content hash (tier-4 fingerprinting)
# --------------------------------------------------------------------------


@register(
    "minhash_lsh_near_dup",
    oracle=minhash_oracle_sql(n_hashes=16, n_bands=4, threshold=0.8, seed=42),
    doc="MinHash + banded LSH near-dup (tier-4 scale path): 16 arithmetic "
    "(a·x+b) mod 2^31-1 hashes over dictionary token-ids, 4 bands → bucket "
    "join → exact-Jaccard verify ≥0.8. Hashes are engine-portable BIGINT "
    "arithmetic, so even this approximate path is fully oracle-checked "
    "(minhash_oracle_sql builds the identical DuckDB pipeline). Runs the "
    "r2 fused doc-space path (minhash_band_pairs: ONE groupBy computes "
    "signature + verify bitmask, xxhash64 band keys) — measured ~2x "
    "faster than the r1 grouped mask-space rewrite, which stays "
    "registered as minhash_grouped_mask_near_dup.",
    bench=True,
)
def minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_band_pairs

    d = load_table(spark, sf_dir, "documents")
    return minhash_band_pairs(d, n_hashes=16, n_bands=4, threshold=0.8, seed=42)


@register(
    "incremental_dedup_probe",
    oracle=f"""
        WITH {minhash_pairs_cte(n_hashes=16, n_bands=4, threshold=0.8,
                                seed=42)}
        SELECT CASE WHEN doc_a % 5 = 0 THEN doc_a ELSE doc_b END AS new_doc,
               CASE WHEN doc_a % 5 = 0 THEN doc_b ELSE doc_a END AS dup_of,
               jaccard
        FROM mh_pairs
        WHERE (doc_a % 5 = 0) <> (doc_b % 5 = 0)
    """,
    doc="incremental dedup — the daily-ingest shape at 100 TB: the 20% "
    "'new batch' (doc_id % 5 = 0) probes the 80% 'existing corpus' via "
    "the banded MinHash index instead of re-running the symmetric "
    "all-corpus pass. Asymmetric band join (batch x corpus, sides "
    "disjoint), broadcast-bitmask exact verify; candidate volume is "
    "|batch| x collision rate, independent of corpus-internal pair "
    "counts. In production the corpus side is a persisted band-key-"
    "bucketed table, making the probe exchange-free on the corpus side. "
    "Oracle: the proven mh_pairs CTE restricted to cross-set pairs and "
    "oriented new_doc -> dup_of (operators/dedup.py: "
    "minhash_incremental_pairs).",
)
def incremental_dedup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_incremental_pairs

    d = load_table(spark, sf_dir, "documents")
    return minhash_incremental_pairs(
        d,
        is_new=F.col("doc_id") % 5 == 0,
        n_hashes=16,
        n_bands=4,
        threshold=0.8,
        seed=42,
    )


@register(
    "minhash_grouped_mask_near_dup",
    # identical semantics to minhash_lsh_near_dup → same oracle
    oracle=minhash_oracle_sql(n_hashes=16, n_bands=4, threshold=0.8, seed=42),
    doc="the grouped MASK-SPACE MinHash-LSH rewrite (operators/dedup.py "
    "minhash_band_pairs_grouped): banding and candidate dedup run over "
    "distinct token-set masks (signatures derived from mask BITS), doc "
    "pairs recovered by broadcast expansion. Wins when texts repeat "
    "token sets heavily; on this corpus the fused doc-space path "
    "(minhash_lsh_near_dup) is ~2x faster. Same oracle as that path — "
    "the differential pair certifies both rewrites against one DuckDB "
    "pipeline.",
)
def minhash_grouped_mask_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_band_pairs_grouped(
        d, n_hashes=16, n_bands=4, threshold=0.8, seed=42
    )


@register(
    "minhash_open_vocab_near_dup",
    # same semantics again → same oracle (triple differential)
    oracle=minhash_oracle_sql(n_hashes=16, n_bands=4, threshold=0.8, seed=42),
    doc="the fully OPEN-vocabulary word path: distributed dense-rank "
    "dictionary (token_dictionary_distributed — range partition + "
    "per-partition offsets, NO single-partition sort; ids bit-identical "
    "to the global-sort dictionary), AQE-decided encode join, fused "
    "signature+posting-array groupBy, array_intersect verify "
    "(minhash_band_pairs_open). Every stage is shuffle-parallel even "
    "when the vocabulary itself is corpus-scale — the construction that "
    "replaces the broadcast-dictionary assumption at 100 TB.",
)
def minhash_open_vocab_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_band_pairs_open, tokenize_distinct

    d = load_table(spark, sf_dir, "documents")
    return minhash_band_pairs_open(
        tok=tokenize_distinct(d), n_hashes=16, n_bands=4, threshold=0.8, seed=42
    )


@register(
    "minhash_shingle_near_dup",
    oracle=minhash_shingle_oracle_sql(
        k=4, n_hashes=16, n_bands=4, threshold=0.8, seed=42
    ),
    doc="MinHash-LSH over character 4-gram SHINGLES — the open-vocabulary "
    "variant (operators/dedup.py minhash_band_pairs_open): dictionary-"
    "FREE base-256 shingle ids (shingle_tids: the 4 bytes ARE the id — "
    "injective, zero collisions, no corpus-wide dictionary, no shingle "
    "strings materialized) → seeded arithmetic minhash → 4-band bucket "
    "join → exact-Jaccard verify via per-pair array_intersect (no "
    "≤64-token bitmask shortcut — the honest 100 TB generic path; every "
    "stage shuffles on band keys or doc ids). Shingling handles corpora "
    "where word boundaries lie (code, CJK, OCR). Fully oracle-checked "
    "like the word-token path.",
    bench=True,
)
def minhash_shingle_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingle_tids

    d = load_table(spark, sf_dir, "documents")
    return minhash_band_pairs_open(
        tids=shingle_tids(d, k=4), n_hashes=16, n_bands=4, threshold=0.8, seed=42
    )


@register(
    "simhash_near_pairs",
    oracle=simhash_oracle_sql(max_hamming=8, seed=42),
    doc="SimHash-64 near-pair search (tier-4): deterministic arithmetic "
    "bit-mix per token, ±1 vote per bit position, sign → fingerprint; "
    "16-bit-quarter blocking + exact hamming verify ≤8. The whole blocked "
    "pipeline — dictionary, 64-bit fingerprint incl. the sign bit, quarter "
    "keys, hamming — is replayed bit-exactly by the DuckDB oracle "
    "(simhash_oracle_sql); determinism + hamming≈jaccard correlation also "
    "asserted in tests.",
)
def simhash_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(d, max_hamming=8, seed=42)


@register(
    "tf_idf_scores",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), tf AS (
            SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
            FROM tok GROUP BY 1, 2
        ), dfreq AS (
            SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM tok GROUP BY 1
        ), n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
               round(tf.tf * ln(n.n_docs * 1.0 / dfreq.df), 4) AS tf_idf
        FROM tf JOIN dfreq USING (token) CROSS JOIN n
    """,
    doc="TF-IDF term weighting (tier-4 text analysis): per-(doc, token) "
    "term frequency × ln(N/df). One explode + two partial-agg shuffles; "
    "the corpus count is a 1-row broadcast; the document-frequency join "
    "is an UNHINTED token equi-join — the vocabulary grows with the "
    "corpus (Heaps' law: ~1e9 unique tokens at web scale), so a forced "
    "broadcast would OOM the driver; AQE broadcasts df when it is "
    "actually small and shuffles both token-keyed sides when it is not.",
)
def tf_idf_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = (
        tok.distinct().groupBy("token").agg(F.count("*").alias("df"))
    )
    n_docs = d.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(dfreq, "token")
        # CROSSJOIN: 1-row corpus doc-count frame
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") * F.lit(1.0) / F.col("df")), 4
            ).alias("tf_idf"),
        )
    )


@register(
    "fuzzy_pairs_levenshtein",
    oracle="""
        WITH b AS (
            SELECT doc_id, source, substring(text, 1, 20) AS prefix
            FROM documents
        )
        SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
               CAST(levenshtein(a.prefix, b2.prefix) AS BIGINT) AS edit_dist
        FROM b a
        JOIN b b2 ON a.source = b2.source AND a.doc_id < b2.doc_id
        WHERE levenshtein(a.prefix, b2.prefix) <= 8
    """,
    doc="fuzzy (edit-distance) pair detection with blocking: candidate "
    "pairs share a source block — the classic entity-resolution blocking "
    "pattern that keeps the quadratic comparison inside small groups — "
    "then Levenshtein over a 20-char prefix ≤8 verifies. Both engines "
    "implement identical unit-cost edit distance, so the approximate-"
    "matching path is fully oracle-checked. At 100 TB the block key is "
    "the shuffle key; skewed blocks would get salting + a cheaper "
    "length-difference prefilter.",
)
def fuzzy_pairs_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    b = d.select(
        "doc_id",
        "source",
        F.substring("text", 1, 20).alias("prefix"),
    )
    a, b2 = b.alias("a"), b.alias("b2")
    dist = F.levenshtein(F.col("a.prefix"), F.col("b2.prefix"))
    return (
        a.join(
            b2,
            (F.col("a.source") == F.col("b2.source"))
            & (F.col("a.doc_id") < F.col("b2.doc_id")),
        )
        .filter(dist <= 8)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b2.doc_id").alias("doc_b"),
            dist.cast("long").alias("edit_dist"),
        )
    )


@register(
    "token_pmi",
    oracle="""
        WITH tok AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), n AS (
            SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tok
        ), dfreq AS (
            SELECT token, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY 1
        ), tok_f AS (
            SELECT t.* FROM tok t
            WHERE EXISTS (SELECT 1 FROM dfreq d
                          WHERE d.token = t.token AND d.df >= 2)
        ), co AS (
            SELECT a.token AS tok_a, b.token AS tok_b,
                   CAST(count(*) AS BIGINT) AS n_co
            FROM tok_f a JOIN tok_f b
              ON a.doc_id = b.doc_id AND a.token < b.token
            GROUP BY 1, 2
        )
        SELECT co.tok_a, co.tok_b, co.n_co,
               round(ln(co.n_co * 1.0 * n.n_docs / (da.df * 1.0 * db.df)), 4)
                   + 0.0 AS pmi
        FROM co
        CROSS JOIN n
        JOIN dfreq da ON co.tok_a = da.token
        JOIN dfreq db ON co.tok_b = db.token
    """,
    doc="token co-occurrence PMI (pointwise mutual information) — the "
    "word-association statistic under embedding/collocation pipelines: "
    "document-level co-occurrence counts vs marginal document "
    "frequencies. The co-occurrence self-join runs on doc_id (each doc "
    "contributes its token-pair cross product map-side). Hapax tokens "
    "(df < 2) are pruned BEFORE the quadratic self-join via an inner "
    "join with the df>=2 vocabulary slice: a df=1 token cannot co-occur "
    "in two documents, so its pairs are pure fan-out cost — on "
    "long-tailed corpora (most of a 100 TB crawl's vocabulary is hapax) "
    "this bounds the per-doc pair cross product to the recurring "
    "vocabulary. That join also ATTACHES each cell's marginal df, so "
    "the pair aggregation projects df_a/df_b as constants (min over a "
    "token-constant column) instead of re-joining two vocabulary-sized "
    "marginal tables; the corpus doc-count comes from the raw documents "
    "scan (every non-NULL text tokenizes to >=1 cell). Marginals stay "
    "corpus-wide, so surviving pairs' PMI values are unchanged.",
    bench=True,
)
def token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # r17 restructure (replacing the r16 persist, which regressed the
    # driver bench 28%): cut the tokenize-subtree CONSUMER count instead
    # of caching it. Three moves, all value-preserving:
    #   1. n_docs comes from the raw documents scan, not the cell table:
    #      split() of any non-NULL text yields >= 1 element (split("") is
    #      [""]), and both engines drop NULL-text rows at unnest/explode,
    #      so count_distinct(doc_id) over tok == count_distinct(doc_id)
    #      over documents WHERE text IS NOT NULL — no tokenize needed.
    #   2. the hapax semi-join is an inner join against the df>=2 slice of
    #      dfreq (token is its groupBy key, hence unique: inner == semi),
    #      which lets each surviving cell CARRY its marginal df ...
    #   3. ... so the two vocabulary-sized marginal joins (da/db) fold
    #      into the pair aggregation as min(df) — df is constant per
    #      token, min() is just the projection of that constant.
    # Tokenize subtree evaluations drop 4 -> 2 (dfreq build + join probe;
    # the self-join's second side reuses the first's exchange) and two
    # whole shuffle joins disappear, with no persist anywhere.
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    n = d.filter(F.col("text").isNotNull()).agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    # unhinted: the recurring vocabulary grows with the corpus — AQE
    # broadcasts it when small, shuffles both token-keyed sides when not
    recurring = (
        tok.groupBy("token")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 2)
    )
    tok_f = tok.join(recurring, "token")
    a, b = tok_f.alias("a"), tok_f.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.token") < F.col("b.token")),
        )
        .groupBy(
            F.col("a.token").alias("tok_a"), F.col("b.token").alias("tok_b")
        )
        .agg(
            F.count("*").alias("n_co"),
            F.min("a.df").alias("df_a"),
            F.min("b.df").alias("df_b"),
        )
    )
    return (
        # CROSSJOIN: 1-row corpus-total frame
        co.crossJoin(F.broadcast(n))
        .select(
            "tok_a",
            "tok_b",
            "n_co",
            # + 0.0 normalizes IEEE -0.0 (engines disagree on round's sign
            # preservation for tiny negatives)
            (
                F.round(
                    F.log(
                        F.col("n_co")
                        * F.lit(1.0)
                        * F.col("n_docs")
                        / (F.col("df_a") * F.lit(1.0) * F.col("df_b"))
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )


@register(
    "doc_fingerprints",
    oracle="""
        SELECT doc_id,
               sha256(text) AS content_sha,
               md5(text) AS content_md5,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
    """,
    doc="content fingerprints: sha256 + md5 (tier-4 fingerprinting; both "
    "engines emit identical lowercase hex).",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2("text", 256).alias("content_sha"),
        F.md5("text").alias("content_md5"),
        F.length("text").cast("long").alias("n_chars"),
    )


@register(
    "scrub_mask_tokens",
    oracle="""
        SELECT doc_id,
               substr(regexp_replace(text, '\\bthe\\b', '<MASK>', 'g'), 1, 60)
                   AS masked_prefix,
               CAST((length(regexp_replace(text, '\\bthe\\b', '<MASK>', 'g'))
                     - length(text)) // 3 AS BIGINT) AS n_masked
        FROM documents
    """,
    doc="regex scrubbing — the masking/cleaning write-side of a text "
    "pipeline (PII-redaction shape): word-boundary regexp_replace of a "
    "target token with a mask, plus an exact occurrence count recovered "
    "from the length delta (mask is 3 chars longer than the target, so "
    "delta/3 is integer-exact — no second regex pass). DuckDB needs the "
    "explicit 'g' flag to match Spark's replace-all semantics; both "
    "regex engines agree on \\b word boundaries.",
)
def scrub_mask_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    masked = F.regexp_replace("text", r"\bthe\b", "<MASK>")
    return d.select(
        "doc_id",
        F.substring(masked, 1, 60).alias("masked_prefix"),
        ((F.length(masked) - F.length("text")) / 3)
        .cast("long")
        .alias("n_masked"),
    )


@register(
    "jaccard_bigram_pairs",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), big AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                          i -> toks[i] || '_' || toks[i+1])) AS token
            FROM t
        ), sizes AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM big GROUP BY 1
        ), common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM big a JOIN big b ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT c.doc_a, c.doc_b,
               round(c.n_common * 1.0 / (sa.n + sb.n - c.n_common), 4) AS jaccard
        FROM common c
        JOIN sizes sa ON c.doc_a = sa.doc_id
        JOIN sizes sb ON c.doc_b = sb.doc_id
        WHERE c.n_common * 1.0 / (sa.n + sb.n - c.n_common) >= 0.8
    """,
    doc="word-BIGRAM Jaccard near-dup pairs ≥0.8 — the n-gram (n=2) "
    "variant the unigram-set jaccard_near_dup_pairs can't see: bigrams "
    "encode local word ORDER, so shuffled-token docs stop matching. "
    "Rewrites each doc to its bigram vocabulary and reuses the generic "
    "inverted-index operator (the 31-word vocabulary squares to ~1000 "
    "bigrams — far past the 64-bit mask shortcut, and posting lists are "
    "sparser, so the inverted join stays cheap).",
)
def jaccard_bigram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import jaccard_pairs_inverted

    d = load_table(spark, sf_dir, "documents")
    bigrams = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 1),"
        " i -> concat(element_at(split(text, ' '), i), '_',"
        "             element_at(split(text, ' '), i + 1)))"
    )
    rewritten = d.select(
        "doc_id",
        F.array_join(
            F.when(F.size(F.split("text", " ")) >= 2, bigrams).otherwise(
                F.expr("array()").cast("array<string>")
            ),
            " ",
        ).alias("text"),
    ).filter(F.length("text") > 0)
    return jaccard_pairs_inverted(rewritten, threshold=0.8)


@register(
    "containment_subset_pairs",
    oracle="""
        WITH tok AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), sizes AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY doc_id
        ), common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT c.doc_a, c.doc_b,
               round(c.n_common * 1.0 / least(sa.n, sb.n), 4) AS containment
        FROM common c
        JOIN sizes sa ON c.doc_a = sa.doc_id
        JOIN sizes sb ON c.doc_b = sb.doc_id
        WHERE c.n_common * 1.0 / least(sa.n, sb.n) >= 1.0
    """,
    doc="token-set containment pairs (|A∩B|/min(|A|,|B|) = 1.0): the "
    "asymmetric-overlap dedup measure that catches SUBSET duplicates "
    "Jaccard misses — a short doc fully contained in a longer one scores "
    "1.0 here but low Jaccard. The dataset-decontamination primitive "
    "(operators/dedup.py containment_pairs_bitmask: distinct-mask "
    "popcount plan, same as the Jaccard bitmask path).",
)
def containment_subset_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_pairs_bitmask

    d = load_table(spark, sf_dir, "documents")
    return containment_pairs_bitmask(d, threshold=1.0)


_PACK_BUDGET = 256  # tokens per packed training sequence (multi-bin even at sf0.01)


@register(
    "pack_sequences_by_budget",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ), c AS (
            SELECT doc_id, source, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS cum
            FROM t
        )
        SELECT source,
               -- // : DuckDB floor division (CAST(x/y AS BIGINT) ROUNDS)
               CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        FROM c
        GROUP BY 1, 2
    """,
    doc=f"sequence packing for training shards (tier-4 prep): greedy "
    f"sequential packing of documents into ~{_PACK_BUDGET}-token bins per "
    "source — running token count over a deterministic (source, doc_id) "
    "order, bin id = prior-cumsum div budget. One window pass over one "
    "source-partitioned exchange + a partial agg; at 100 TB each source "
    "shard packs independently (the window key IS the shard key), so "
    "packing parallelizes across shards with no global coordination.",
)
def pack_sequences_by_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tokens = F.size(F.split("text", " ")).cast("long")
    c = d.select(
        "doc_id", "source", n_tokens.alias("n_tokens")
    ).withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.groupBy(
            "source",
            F.floor((F.col("cum") - F.col("n_tokens")) / _PACK_BUDGET)
            .cast("long")
            .alias("bin"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
    )


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), grams AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(t) - {_DECON_N - 1}, 1)),
                       i -> array_to_string(list_slice(t, i, i + {_DECON_N - 1}), ' ')
                   ))) AS gram
            FROM toks
        ), bench AS (
            SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0
        ), hits AS (
            SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_overlapping
            FROM grams g JOIN bench USING (gram)
            WHERE g.doc_id % 50 <> 0
            GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               coalesce(h.n_overlapping, 0) AS n_overlapping,
               coalesce(h.n_overlapping, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 50 <> 0
    """,
    doc=f"benchmark decontamination via {_DECON_N}-gram overlap (the GPT-3 "
    "method's shape): the held-out set's distinct n-grams (every 50th doc "
    "as a stand-in benchmark) are semi-joined against the training "
    "corpus's n-grams; any shared gram marks the doc contaminated. "
    "Sliding n-grams are pure array expressions (sequence → slice → "
    "join); the benchmark gram set is dimension-sized, so at 100 TB it "
    "broadcasts (or Bloom-prefilters, see bloom_prefilter_semi_join) and "
    "the corpus side stays scan-shaped — one explode + one partial-agg "
    "per doc, no corpus-wide shuffle on raw text.",
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    gen = (
        f"array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - {_DECON_N - 1}, 1)),"
        f" i -> array_join(slice(split(text, ' '), i, {_DECON_N}), ' ')))"
    )
    grams = d.select("doc_id", F.explode(F.expr(gen)).alias("gram"))
    bench = (
        grams.filter(F.col("doc_id") % 50 == 0).select("gram").distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlapping"))
    )
    return (
        d.filter(F.col("doc_id") % 50 != 0)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlapping", F.lit(0)).alias("n_overlapping"),
            (F.coalesce("n_overlapping", F.lit(0)) > 0).alias("contaminated"),
        )
    )


@register(
    "quality_filter_verdicts",
    oracle=f"""
        WITH t AS (
            SELECT source, text, string_split(text, ' ') AS toks,
                   len(list_filter(string_split(text, ' '),
                       x -> x IN {_STOPWORDS!r})) AS n_stop
            FROM documents
        ), v AS (
            SELECT source,
                   CASE WHEN len(toks) < 20 THEN 'too_short'
                        WHEN length(text) * 1.0 / len(toks) > 9.0
                             THEN 'tokens_too_long'
                        WHEN n_stop * 1.0 / len(toks) < 0.02 THEN 'low_stopword'
                        ELSE 'keep' END AS verdict
            FROM t
        )
        SELECT source, verdict, CAST(count(*) AS BIGINT) AS n_docs
        FROM v GROUP BY 1, 2
    """,
    doc="the quality-filter decision stage: rule ladder (length, average "
    "token length, stopword ratio — C4/Gopher-style heuristics) to a "
    "keep/drop verdict with a reason, aggregated per source. Single scan "
    "+ one group-cell-sized shuffle; rules are pure Catalyst CASE "
    "expressions, so at 100 TB this is scan-bound and the verdict "
    "distribution doubles as the filter's monitoring dashboard.",
)
def quality_filter_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    verdict = (
        F.when(F.size(toks) < 20, F.lit("too_short"))
        .when(F.length("text") * F.lit(1.0) / F.size(toks) > 9.0, F.lit("tokens_too_long"))
        .when(n_stop * F.lit(1.0) / F.size(toks) < 0.02, F.lit("low_stopword"))
        .otherwise(F.lit("keep"))
    )
    return (
        d.select("source", verdict.alias("verdict"))
        .groupBy("source", "verdict")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "unigram_logprob_scores",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), freq AS (
            SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1
        ), total AS (
            SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok
        )
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               round(sum(ln(f.n * 1.0 / total.n_total)) / count(*), 4)
                   + 0.0 AS avg_logprob
        FROM tok t
        JOIN freq f USING (token)
        CROSS JOIN total
        GROUP BY t.doc_id
    """,
    doc="unigram language-model scoring — the perplexity-proxy quality "
    "filter (KenLM-style pipelines score against a reference LM; the "
    "self-corpus unigram model is the dependency-free analog): per-doc "
    "mean log p(token) under corpus frequencies. The frequency table is "
    "vocabulary-sized — which GROWS with the corpus, so its join onto "
    "the token stream is unhinted (AQE broadcasts when small, shuffles "
    "on the token key when not); the corpus total is one scalar. At "
    "100 TB the scoring pass is one token-keyed shuffle at worst. Low avg_logprob = "
    "rare-token-heavy docs (OCR noise, boilerplate IDs) → drop "
    "candidates.",
)
def unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").alias("n"))
    total = tok.agg(F.count("*").alias("n_total"))
    return (
        tok.join(freq, "token")
        # CROSSJOIN: 1-row corpus token-total frame
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.round(
                    F.sum(F.log(F.col("n") * F.lit(1.0) / F.col("n_total")))
                    / F.count("*"),
                    4,
                )
                + F.lit(0.0)
            ).alias("avg_logprob"),
        )
    )


_MIX_TARGET_SHARE = 0.05  # uniform target: every source at 5% (20 sources)


@register(
    "source_mixing_weights",
    oracle=f"""
        WITH per AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY 1
        ), total AS (
            SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM per
        )
        SELECT source, n_docs, n_tokens,
               round(n_tokens * 1.0 / total.t, 6) AS actual_share,
               round({_MIX_TARGET_SHARE} / (n_tokens * 1.0 / total.t), 4)
                   AS sample_weight
        FROM per CROSS JOIN total
    """,
    doc="domain-mixing weights: per-source token shares vs a target mix, "
    "emitting the resampling weight (target/actual) each source needs — "
    "the mixture-rebalancing step before training-shard construction. "
    "One group-cell aggregate + a scalar broadcast; weights feed "
    "sampleBy/deterministic_hash_sample as per-stratum rates.",
)
def source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").cast("long").alias("t"))
    share = F.col("n_tokens") * F.lit(1.0) / F.col("t")
    # CROSSJOIN: 1-row corpus token-total frame
    return per.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("actual_share"),
        F.round(F.lit(_MIX_TARGET_SHARE) / share, 4).alias("sample_weight"),
    )


_SELECT_BUDGET = 1000  # tokens kept per source (quality-ranked)


@register(
    "select_top_quality_within_budget",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                       * 1.0 / len(string_split(text, ' ')) AS quality
            FROM documents
        ), ranked AS (
            SELECT doc_id, source, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY source
                       ORDER BY quality DESC, doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS cum
            FROM t
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_selected,
               CAST(sum(n_tokens) AS BIGINT) AS tokens_selected
        FROM ranked
        WHERE cum - n_tokens < {_SELECT_BUDGET}
        GROUP BY 1
    """,
    doc=f"token-budget data selection: per source, take documents in "
    "quality order (distinct-token ratio as the score) until "
    f"~{_SELECT_BUDGET} tokens are kept — the data-selection step that "
    "turns scores into a bounded training mix. One source-partitioned "
    "window pass (shard-parallel like pack_sequences_by_budget, no "
    "global sort), greedy boundary rule: a doc is kept iff selection "
    "starts under budget.",
)
def select_top_quality_within_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    quality = (
        F.size(F.array_distinct(toks)) * F.lit(1.0) / F.size(toks)
    )
    t = d.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        quality.alias("quality"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = t.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        ranked.filter(F.col("cum") - F.col("n_tokens") < _SELECT_BUDGET)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_selected"),
            F.sum("n_tokens").cast("long").alias("tokens_selected"),
        )
    )


@register(
    "dedup_keep_canonical",
    oracle=f"""
        WITH RECURSIVE {minhash_pairs_cte(n_hashes=16, n_bands=4,
                                          threshold=0.8, seed=42)}
        , dedup_edges AS (
            SELECT doc_a AS a, doc_b AS b FROM mh_pairs
            UNION ALL
            SELECT doc_b, doc_a FROM mh_pairs
        ), reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.b, reach.r FROM reach JOIN dedup_edges e ON e.a = reach.id
        ), components AS (
            SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component
            FROM reach GROUP BY id
        ), joined AS (
            SELECT k.component, c.doc_id, c.n_chars,
                   row_number() OVER (PARTITION BY k.component
                                      ORDER BY c.n_chars DESC, c.doc_id)
                       AS rn,
                   count(*) OVER (PARTITION BY k.component) AS cluster_size,
                   sum(c.n_chars) OVER (PARTITION BY k.component)
                       AS cluster_chars
            FROM components k JOIN documents c USING (doc_id)
        )
        SELECT component, doc_id AS canonical_doc_id,
               CAST(cluster_size AS BIGINT) AS cluster_size,
               CAST(cluster_chars AS BIGINT) AS cluster_chars
        FROM joined WHERE rn = 1
    """,
    doc="dedup RESOLUTION output (the step after near_dup_components): "
    "one canonical survivor per duplicate cluster — the longest document "
    "(ties to smallest doc_id) — plus cluster size/chars, i.e. exactly "
    "what a training-data pipeline keeps and what it can attribute to "
    "the drop. The cluster graph is the BANDED MinHash candidate graph "
    "(16 hashes × 4 bands, exact-Jaccard verify ≥0.8 on collided pairs "
    "only — the sub-quadratic production substrate, r3 verdict #5), not "
    "exact all-pairs; the oracle replays banding + verify + recursive "
    "reachability + the canonical window bit-for-bit. Composes banded "
    "MinHash -> iterative components -> window argmax in one lazy plan.",
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_band_pairs
    from ..operators.graph import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_band_pairs(d, n_hashes=16, n_bands=4, threshold=0.8, seed=42)
    comp = connected_components(
        vertices=d.select(F.col("doc_id").alias("id")),
        edges=pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
    )
    joined = comp.join(d, comp.id == d.doc_id).select(
        "component", "doc_id", "n_chars"
    )
    wp = Window.partitionBy("component")
    rn = F.row_number().over(
        wp.orderBy(F.col("n_chars").desc(), "doc_id")
    )
    return (
        joined.withColumn("rn", rn)
        .withColumn("cluster_size", F.count("*").over(wp).cast("long"))
        .withColumn("cluster_chars", F.sum("n_chars").over(wp).cast("long"))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("canonical_doc_id"),
            "cluster_size",
            "cluster_chars",
        )
    )


@register(
    "top_bigram_share",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), grams AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i + 1])) AS bigram
            FROM t WHERE len(toks) >= 2
        ), counts AS (
            SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS n
            FROM grams GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS n_bigrams,
               CAST(max(n) AS BIGINT) AS top_bigram_n,
               round(max(n) * 1.0 / sum(n), 4) AS top_share
        FROM counts GROUP BY doc_id
    """,
    doc="per-document repetition signal: share of the most frequent "
    "bigram among all bigram occurrences (the Gopher-class "
    "'top n-gram fraction' quality rule — boilerplate and template spam "
    "score high). Adjacent-token bigrams via 1-indexed element_at over a "
    "sequence, two partial aggregates; shard-parallel per doc, no "
    "cross-doc state.",
)
def top_bigram_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams = (
        d.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> concat(element_at(toks, i), ' ',"
                    " element_at(toks, i + 1)))"
                )
            ).alias("bigram"),
        )
    )
    counts = grams.groupBy("doc_id", "bigram").agg(F.count("*").alias("n"))
    return counts.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.max("n").cast("long").alias("top_bigram_n"),
        F.round(F.max("n") * F.lit(1.0) / F.sum("n"), 4).alias("top_share"),
    )


@register(
    "dup_ngram_ratio",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), grams AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(toks) - 7),
                       i -> list_aggregate(toks[i:i+7], 'string_agg', ' ')))
                       AS gram
            FROM t WHERE len(toks) >= 8
        ), counts AS (
            SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS n
            FROM grams GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS n_windows,
               CAST(sum(n) - count(*) AS BIGINT) AS n_dup_windows,
               round((sum(n) - count(*)) * 1.0 / sum(n), 4) AS dup_ratio
        FROM counts GROUP BY doc_id
    """,
    doc="per-document duplicate-8-gram ratio: fraction of 8-token sliding "
    "windows that repeat an earlier window of the same doc (the "
    "'duplicate n-gram fraction' repetition rule from large-corpus "
    "quality filtering). Sliding windows as 1-indexed slices; repeated "
    "windows = occurrences minus distinct. Per-doc aggregates only — "
    "scan-shaped at any corpus size.",
)
def dup_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams = (
        d.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 7),"
                    " i -> array_join(slice(toks, i, 8), ' '))"
                )
            ).alias("gram"),
        )
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("n"))
    return counts.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_windows"),
        (F.sum("n") - F.count("*")).cast("long").alias("n_dup_windows"),
        F.round(
            (F.sum("n") - F.count("*")) * F.lit(1.0) / F.sum("n"), 4
        ).alias("dup_ratio"),
    )


@register(
    "cross_source_exact_dups",
    oracle="""
        SELECT sha256(text) AS content_sha,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(doc_id) AS BIGINT) AS first_doc_id
        FROM documents
        GROUP BY 1
        HAVING count(DISTINCT source) > 1
    """,
    doc="cross-source exact contamination: content hashes appearing in "
    "MORE THAN ONE source — the leakage signal between corpus shards "
    "(e.g. a benchmark document syndicated into a crawl). groupBy on the "
    "32-byte sha means the shuffle never carries text; count(distinct "
    "source) is a per-group set aggregate.",
)
def cross_source_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.sha2("text", 256).alias("content_sha"))
        .agg(
            F.count_distinct("source").cast("long").alias("n_sources"),
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_sources") > 1)
    )


_BM25_QUERY = ("spark", "join", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "bm25_scores",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), dl AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1
        ), stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   round(avg(dl), 6) AS avgdl
            FROM dl
        ), tf AS (
            SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
            FROM tok WHERE token IN {_BM25_QUERY!r}
            GROUP BY 1, 2
        ), df AS (
            SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        )
        SELECT t.doc_id,
               round(sum(
                   ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
                   * (t.tf * ({_BM25_K1} + 1.0))
                   / (t.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                      + {_BM25_B} * d.dl / s.avgdl))
               ), 4) + 0.0 AS bm25
        FROM tf t
        JOIN df f USING (token)
        JOIN dl d USING (doc_id)
        CROSS JOIN stats s
        GROUP BY t.doc_id
    """,
    doc=f"BM25 relevance scoring for the fixed query {_BM25_QUERY} — the "
    "lexical-retrieval primitive under corpus search/dedup triage. "
    "Per-doc term frequencies for the query terms only (the IN filter "
    "prunes the posting explosion before the shuffle), document lengths, "
    "corpus stats (2 scalars, broadcast), Robertson idf. avgdl is "
    "rounded on both engines before use so the score arithmetic sees "
    "bit-identical inputs. Everything shuffles on (doc, term) cells — "
    "scan-shaped at corpus scale.",
)
def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.round(F.avg("dl"), 6).alias("avgdl")
    )
    tf = (
        tok.filter(F.col("token").isin(*_BM25_QUERY))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * (F.col("tf") * (_BM25_K1 + 1.0)) / denom
    return (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        # CROSSJOIN: 1-row corpus-stats aggregate
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg((F.round(F.sum(term_score), 4) + F.lit(0.0)).alias("bm25"))
    )


_LM_ALPHA = 0.5


@register(
    "bigram_lm_loglik",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), grams AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> struct_pack(w1 := toks[i], w2 := toks[i + 1])))
                       AS g
            FROM t WHERE len(toks) >= 2
        ), big AS (
            SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM grams
        ), c2 AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY 1, 2
        ), c1 AS (
            SELECT w1, CAST(sum(c) AS BIGINT) AS c FROM c2 GROUP BY 1
        ), vocab AS (
            SELECT CAST(count(DISTINCT token) AS BIGINT) AS v
            FROM (SELECT unnest(string_split(text, ' ')) AS token
                  FROM documents)
        )
        -- per-bigram logprob quantized ONCE to integer 1e-6 units; the
        -- per-doc sum is then EXACT integer addition (combine-order-free)
        -- and the 3dp display is integer half-away — a float sum of 6dp
        -- terms re-rounded at 3dp flips on ...500 boundaries across
        -- engines (r5 hardening, same class as the daily-series queries)
        SELECT b.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               sign(sum(CAST(round(ln((c2.c + {_LM_ALPHA})
                                      / (c1.c + {_LM_ALPHA} * vocab.v))
                                   * 1000000, 0) AS BIGINT)))
                   * ((abs(sum(CAST(round(ln((c2.c + {_LM_ALPHA})
                                            / (c1.c + {_LM_ALPHA} * vocab.v))
                                         * 1000000, 0) AS BIGINT))) + 500)
                      // 1000) / 1000.0 + 0.0 AS loglik
        FROM big b
        JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
        JOIN c1 ON b.w1 = c1.w1
        CROSS JOIN vocab
        GROUP BY b.doc_id
    """,
    doc="per-document log-likelihood under an add-alpha-smoothed corpus "
    "bigram LM — the perplexity-class quality filter (low likelihood = "
    "unnatural token sequences) one tier up from unigram_logprob_scores. "
    "Bigram/unigram count tables shuffle on token keys; each per-bigram "
    "logprob is quantized ONCE to integer 1e-6 units on BOTH engines "
    "(libm ln can differ in the last ulp; quantizing first keeps it "
    "deterministic), the per-doc sum is exact integer addition, and the "
    "3dp display is integer half-away (r5 hardening).",
)
def bigram_lm_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    big = (
        d.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(element_at(toks, i) AS w1,"
                    " element_at(toks, i + 1) AS w2))"
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = d.select(
        F.explode(F.split("text", " ")).alias("token")
    ).agg(F.count_distinct("token").alias("v"))
    # integer 1e-6-unit logprob terms: exact order-free sum, integer
    # half-away 3dp display (see oracle comment)
    logp_u = F.round(
        F.log(
            (F.col("c2") + F.lit(_LM_ALPHA))
            / (F.col("c1") + F.lit(_LM_ALPHA) * F.col("v"))
        )
        * 1_000_000,
        0,
    ).cast("long")
    return (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        # CROSSJOIN: 1-row vocabulary-count aggregate
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(logp_u).alias("s_u"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            quantized_half_away("s_u", unit=1000, out_scale=1_000.0).alias(
                "loglik"
            ),
        )
    )


@register(
    "boilerplate_ngrams",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), grams AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(toks) - 7),
                       i -> list_aggregate(toks[i:i+7], 'string_agg', ' ')))
                       AS gram
            FROM t WHERE len(toks) >= 8
        )
        SELECT gram,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM grams
        GROUP BY gram
        HAVING count(*) >= 3
    """,
    doc="cross-document boilerplate detection: 8-token windows appearing "
    "in >= 3 DISTINCT documents — headers, templates, licence blocks "
    "(threshold lowered from 5 in round 6: the regenerated corpus peaks "
    "at 3-4 docs per shared 8-gram, so >= 5 returned a vacuous empty "
    "result; >= 3 is non-trivial at every scale and perturbation); "
    "the n-gram-level contamination/boilerplate sweep (the bounded "
    "cousin of suffix-array substring dedup). Distinct (gram, doc) "
    "before the count so within-doc repetition can't inflate reach; "
    "shuffle keys are the gram strings (at 100 TB: xxhash64 the gram to "
    "a BIGINT key and keep strings out of the exchange — exactly the "
    "shingle_tids trade).",
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams = (
        d.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 7),"
                    " i -> array_join(slice(toks, i, 8), ' '))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 3)
    )


@register(
    "minhash_candidate_quality",
    oracle=minhash_quality_oracle_sql(
        n_hashes=16, n_bands=4, threshold=0.8, seed=42
    ),
    doc="in-engine audit of the MinHash-LSH candidate stage: one row of "
    "(n_true_pairs, n_candidates, n_hits, precision, recall) where truth "
    "is exact token-set Jaccard >= 0.8 over ALL pairs (bitmask path) and "
    "candidates are the banding collisions before the verify filter. "
    "This measures the 16x4 banding S-curve empirically — the number a "
    "100 TB dedup run reports to justify its parameters — and the oracle "
    "replays the identical dictionary/hash/banding in SQL, so even the "
    "quality METRIC is differentially checked.",
)
def minhash_candidate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # candidates with their exact jaccard: threshold 0 keeps every
    # banding collision through the verify join
    cand = minhash_band_pairs_open(
        tok=tokenize_distinct(d), n_hashes=16, n_bands=4, threshold=0.0, seed=42
    )
    truth = jaccard_pairs_bitmask(d, threshold=0.8)
    nc = cand.agg(
        F.count("*").alias("n_candidates"),
        F.count_if(F.col("jaccard") >= 0.8).alias("n_hits"),
    )
    nt = truth.agg(F.count("*").alias("n_true_pairs"))
    # CROSSJOIN: two 1-row aggregates (truth vs candidates)
    return nt.crossJoin(nc).select(
        "n_true_pairs",
        "n_candidates",
        "n_hits",
        # integer half-away 1e-4 units (r14 audit): pair counts are
        # bounded small integers that reach the 2^5*5^b half-boundary
        # grid (160, 800, ...) under perturbation
        (
            F.expr("(2 * n_hits * 10000 + n_candidates)"
                   " div (2 * n_candidates)")
            / F.lit(10_000.0)
        ).alias("precision"),
        (
            F.expr("(2 * n_hits * 10000 + n_true_pairs)"
                   " div (2 * n_true_pairs)")
            / F.lit(10_000.0)
        ).alias("recall"),
    )


@register(
    "source_kl_divergence",
    oracle="""
        WITH tok AS (
            SELECT source, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), sc AS (
            SELECT source, token, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY 1, 2
        ), st AS (
            SELECT source, CAST(sum(c) AS BIGINT) AS n FROM sc GROUP BY 1
        ), cc AS (
            SELECT token, CAST(sum(c) AS BIGINT) AS c FROM sc GROUP BY 1
        ), ct AS (
            SELECT CAST(sum(c) AS BIGINT) AS n FROM cc
        ), terms AS (
            -- term quantized ONCE to integer 1e-8 units; the per-source
            -- sum is exact integer addition and the 4dp display is
            -- integer half-away (a float sum of 8dp terms re-rounded at
            -- 4dp flips on ...50000 boundaries across engines — r5
            -- hardening, same class as bigram_lm_loglik)
            SELECT sc.source,
                   CAST(round((round(sc.c * 1.0 / st.n, 10))
                              * ln(round(sc.c * 1.0 / st.n, 10)
                                   / round(cc.c * 1.0 / ct.n, 10))
                              * 100000000, 0) AS BIGINT) AS term_u
            FROM sc
            JOIN st USING (source)
            JOIN cc USING (token)
            CROSS JOIN ct
        )
        SELECT source,
               sign(sum(term_u)) * ((abs(sum(term_u)) + 5000) // 10000)
                   / 10000.0 + 0.0 AS kl_vs_corpus
        FROM terms GROUP BY source
    """,
    doc="per-source KL divergence of the token distribution vs the whole "
    "corpus — the domain-shift diagnostic behind source-mixing decisions "
    "(a source with high KL is lexically unlike the blend; pairs with "
    "source_mixing_weights). Every source token exists in the corpus by "
    "construction, so KL is finite with no smoothing. Probabilities are "
    "rounded to 10 places and each p*ln(p/q) term quantized ONCE to "
    "integer 1e-8 units (libm ln last-ulp portability); the per-source "
    "sum is exact integer addition and the 4dp display integer "
    "half-away (r5 hardening). Count tables shuffle on token keys; the "
    "vocabulary-sized corpus marginal join is left to AQE (broadcast "
    "when small).",
)
def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("token"))
    sc = tok.groupBy("source", "token").agg(F.count("*").alias("c"))
    st = sc.groupBy("source").agg(F.sum("c").alias("n"))
    cc = sc.groupBy("token").agg(F.sum("c").alias("cc"))
    ct = cc.agg(F.sum("cc").alias("nc"))
    p_s = F.round(F.col("c") * F.lit(1.0) / F.col("n"), 10)
    p_c = F.round(F.col("cc") * F.lit(1.0) / F.col("nc"), 10)
    # integer 1e-8-unit terms: exact order-free sum + integer half-away
    # 4dp display (see oracle comment)
    term_u = F.round(p_s * F.log(p_s / p_c) * 100_000_000, 0).cast("long")
    return (
        sc.join(F.broadcast(st), "source")
        # cc is vocabulary-sized: AQE broadcasts it when small, shuffle-joins
        # when the vocabulary itself is corpus-scale — no forced hint
        .join(cc, "token")
        # CROSSJOIN: 1-row corpus-total frame
        .crossJoin(F.broadcast(ct))
        .select("source", term_u.alias("term_u"))
        .groupBy("source")
        .agg(F.sum("term_u").alias("s_u"))
        .select(
            "source",
            quantized_half_away(
                "s_u", unit=10_000, out_scale=10_000.0
            ).alias("kl_vs_corpus"),
        )
    )


# --------------------------------------------------------------------------
# Context-window chunking + the genuine Python UDTF surface (round 4)
# --------------------------------------------------------------------------

_CHUNK_TOKENS = 16  # tokens per chunk for the splitter pair
_CTX_WINDOW = 128  # tokens per packed context window

_DOC_CHUNKS_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), idx AS (
        SELECT doc_id, toks,
               unnest(generate_series(
                   0, CAST(ceil(len(toks) / {_CHUNK_TOKENS}.0) AS BIGINT) - 1))
                   AS chunk_idx
        FROM t
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(least({_CHUNK_TOKENS},
                      len(toks) - chunk_idx * {_CHUNK_TOKENS}) AS BIGINT)
               AS n_tokens,
           array_to_string(
               toks[chunk_idx * {_CHUNK_TOKENS} + 1
                    : chunk_idx * {_CHUNK_TOKENS} + {_CHUNK_TOKENS}],
               ' ') AS chunk
    FROM idx
"""


@register(
    "doc_chunks_udtf",
    oracle=_DOC_CHUNKS_ORACLE,
    doc=f"a GENUINE Python UDTF (pyspark.sql.functions.udtf, the Spark 4 "
    "user-defined TABLE function API — §2.10 surface beyond the "
    "mapInPandas generator idiom): splits each document into "
    f"{_CHUNK_TOKENS}-token chunks, invoked through SQL as a LATERAL "
    "table function so each text row fans out to N chunk rows. "
    "Registered per-session; Arrow-optimized transfer. The Python path "
    "is the POINT here (API coverage), and the identically-semantic "
    "pure-Catalyst twin (doc_chunks_catalyst) shares this oracle — the "
    "differential pair certifies both, and the Catalyst twin is the one "
    "you run at 100 TB.",
)
def doc_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx bigint, n_tokens bigint, chunk string")
    class ChunkSplitter:
        def eval(self, text: str):  # noqa: ANN001 - UDTF contract
            toks = text.split(" ")
            for i in range(0, len(toks), _CHUNK_TOKENS):
                part = toks[i : i + _CHUNK_TOKENS]
                yield i // _CHUNK_TOKENS, len(part), " ".join(part)

    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    spark.udtf.register("chunk_splitter", ChunkSplitter)
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk
        FROM documents d, LATERAL chunk_splitter(d.text) c
        """
    )


@register(
    "doc_chunks_catalyst",
    oracle=_DOC_CHUNKS_ORACLE,  # same semantics → same oracle (differential)
    doc="the pure-Catalyst twin of doc_chunks_udtf: posexplode over "
    "sequence() + slice() — whole-stage-codegen'd, no Python worker, the "
    "production form of the chunk fan-out. Shares the UDTF's oracle so "
    "the two paths are certified against each other AND against DuckDB.",
)
def doc_chunks_catalyst(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(_CHUNK_TOKENS)).cast("int")
    t = d.select("doc_id", toks.alias("toks"), n_chunks.alias("nc"))
    idx = t.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_idx"),
    )
    part = F.slice(
        F.col("toks"),
        F.col("chunk_idx") * _CHUNK_TOKENS + 1,
        _CHUNK_TOKENS,
    )
    return idx.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(part).cast("long").alias("n_tokens"),
        F.array_join(part, " ").alias("chunk"),
    )


@register(
    "chunk_fixed_context",
    oracle=f"""
        WITH t AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ), o AS (
            SELECT source, doc_id, n_tokens,
                   CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS start_offset
            FROM t
        )
        SELECT source, doc_id, n_tokens, start_offset,
               start_offset // {_CTX_WINDOW} AS first_window,
               (start_offset + n_tokens - 1) // {_CTX_WINDOW} AS last_window,
               (start_offset + n_tokens - 1) // {_CTX_WINDOW}
                   - start_offset // {_CTX_WINDOW} + 1 AS n_windows_spanned
        FROM o
    """,
    doc=f"concat-and-chunk shard prep (the GPT-style pretraining layout, "
    "complementing pack_sequences_by_budget's first-fit packing): every "
    "source's documents are concatenated in doc_id order and cut into "
    f"fixed {_CTX_WINDOW}-token context windows that CROSS document "
    "boundaries; each doc row reports its token span's start offset and "
    "the window ids it lands in. One window pass partitioned by the "
    "shard key (source) — the running-offset exchange is the only "
    "shuffle, shard-parallel at any scale. Pure integer math on both "
    "engines.",
)
def chunk_fixed_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = t.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    first = F.floor(F.col("start_offset") / _CTX_WINDOW)
    last = F.floor(
        (F.col("start_offset") + F.col("n_tokens") - 1) / _CTX_WINDOW
    )
    return o.select(
        "source",
        "doc_id",
        "n_tokens",
        "start_offset",
        first.alias("first_window"),
        last.alias("last_window"),
        (last - first + 1).alias("n_windows_spanned"),
    )


# --------------------------------------------------------------------------
# cross-document duplicated-span REMOVAL (the rewrite stage CCNet/Lee et al.
# run after detection; boilerplate_ngrams only *detects*)
# --------------------------------------------------------------------------

_SEG_W = 3  # non-overlapping 3-token segments (corpus vocab is tiny, so
# short spans genuinely recur across documents; real corpora use lines)
_SEG_REACH = 3  # a segment present in >= 3 DISTINCT docs is boilerplate


@register(
    "segment_dedup_rewrite",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), segs AS (
            SELECT doc_id, s.s AS seg_idx,
                   array_to_string(t[(s.s * {_SEG_W} + 1):(s.s * {_SEG_W} + {_SEG_W})], ' ') AS seg
            FROM toks,
                 LATERAL (
                    SELECT unnest(range(0,
                        CAST(ceil(len(t) / {_SEG_W}.0) AS INT))) AS s
                 ) s
        ), reach AS (
            SELECT seg, count(DISTINCT doc_id) AS reach FROM segs GROUP BY seg
        ), j AS (
            SELECT sg.doc_id, sg.seg_idx, sg.seg, r.reach
            FROM segs sg JOIN reach r USING (seg)
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_segs,
               CAST(count(*) FILTER (reach >= {_SEG_REACH}) AS BIGINT)
                   AS n_dropped,
               md5(coalesce(array_to_string(
                   list(seg ORDER BY seg_idx)
                       FILTER (reach < {_SEG_REACH}),
                   ' '), '')) AS rewrite_md5,
               CAST(length(coalesce(array_to_string(
                   list(seg ORDER BY seg_idx)
                       FILTER (reach < {_SEG_REACH}),
                   ' '), '')) AS BIGINT) AS new_len
        FROM j
        GROUP BY doc_id
    """,
    doc="duplicated-span REMOVAL with corpus rewrite (the action stage of "
    "CCNet line-dedup / Lee et al. 2022 substring dedup; boilerplate_ngrams "
    f"is the detection-only cousin): documents split into non-overlapping "
    f"{_SEG_W}-token segments; any segment appearing in >= {_SEG_REACH} "
    "DISTINCT documents is boilerplate and is cut; each document is "
    "reassembled from its surviving segments in original order (md5 of the "
    "rewritten text certifies byte-exact reassembly against the oracle). "
    "Scale shape: segment strings are the only shuffle key (at 100 TB, "
    "xxhash64 them to BIGINTs first — same plan), reach is one "
    "count-distinct agg, reassembly is one groupBy(doc_id) with an ordered "
    "collect_list — everything linear in corpus size, no pairwise stage "
    "anywhere. This is THE production-shaped rewrite: dedup families here "
    "emit pair/cluster REPORTS; this emits the cleaned corpus itself.",
    bench=True,
)
def segment_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_segs = F.ceil(F.size(toks) / F.lit(float(_SEG_W))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda s: F.array_join(F.slice(toks, s * _SEG_W + 1, _SEG_W), " "),
    )
    seg_rows = docs.select(
        "doc_id", F.posexplode(segs).alias("seg_idx", "seg")
    )
    # r17: the r16 explicit repartition(N, "seg") here is REVERTED. It was
    # added to stop AQE's byte-based coalesce from serializing the seg
    # window, but the driver bench regressed 22% (r14 0.905 s -> r16
    # 1.363 s; this round's clean-window read showed 3.3 s) — at sf0.1 the
    # full-width N-task exchange costs far more than the coalesced window
    # stage, and at 100 TB the seg exchange carries real bytes so AQE
    # never coalesces it to 1 in the first place (its advisory size is the
    # scale-adaptive knob, guide §2.2). Partitioning stays AQE-derived.
    # reach as a window over seg (docs-per-seg is small) rather than a
    # groupBy+self-join: the tokenize/slice subtree is evaluated ONCE and
    # the plan is exactly two exchanges (seg, then doc_id)
    joined = seg_rows.withColumn(
        "reach",
        F.size(F.collect_set("doc_id").over(Window.partitionBy("seg"))),
    )
    kept_struct = F.when(
        F.col("reach") < _SEG_REACH, F.struct("seg_idx", "seg")
    )  # no otherwise(): collect_list drops the NULLs for boilerplate segs
    rebuilt = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(kept_struct)), lambda x: x["seg"]
        ),
        " ",
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_segs"),
        F.sum((F.col("reach") >= _SEG_REACH).cast("long")).alias("n_dropped"),
        F.md5(rebuilt).alias("rewrite_md5"),
        F.length(rebuilt).cast("long").alias("new_len"),
    )


# --------------------------------------------------------------------------
# end-to-end RAG indexing pipeline (chunk -> feature-hash -> bucket -> stats)
# --------------------------------------------------------------------------

_RAG_DIMS = 16  # feature-hashing output dims (Weinberger et al. 2009)
_RAG_SIGN_BITS = 4  # first 4 dims' signs -> 16 index buckets
_RAG_TOP = 2  # postings sample per bucket


@register(
    "rag_index_pipeline",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), idx AS (
            SELECT doc_id, toks,
                   unnest(generate_series(
                       0, CAST(ceil(len(toks) / {_CHUNK_TOKENS}.0)
                               AS BIGINT) - 1)) AS chunk_idx
            FROM t
        ), chunk_tok AS (
            SELECT doc_id, chunk_idx,
                   unnest(toks[chunk_idx * {_CHUNK_TOKENS} + 1
                               : chunk_idx * {_CHUNK_TOKENS}
                                 + {_CHUNK_TOKENS}]) AS token
            FROM idx
        ), hashed AS (
            SELECT doc_id, chunk_idx,
                   CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h
            FROM chunk_tok
        ), cells AS (
            SELECT doc_id, chunk_idx, h % {_RAG_DIMS} AS dim,
                   sum(CASE WHEN (h // {_RAG_DIMS}) % 2 = 0
                            THEN 1 ELSE -1 END) AS val
            FROM hashed GROUP BY 1, 2, 3
        ), per_chunk AS (
            SELECT doc_id, chunk_idx,
                   sum(val * val) AS e,
                   {" + ".join(
                       f"(CASE WHEN coalesce(sum(CASE WHEN dim = {j} "
                       f"THEN val END), 0) >= 0 THEN {1 << j} ELSE 0 END)"
                       for j in range(_RAG_SIGN_BITS)
                   )} AS bucket
            FROM cells GROUP BY 1, 2
        ), stats AS (
            SELECT bucket,
                   CAST(count(*) AS BIGINT) AS n_chunks,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(sum(e) AS BIGINT) AS total_energy
            FROM per_chunk GROUP BY bucket
        ), top AS (
            SELECT bucket, doc_id, chunk_idx, e,
                   row_number() OVER (
                       PARTITION BY bucket
                       ORDER BY e DESC, doc_id, chunk_idx
                   ) AS rank
            FROM per_chunk
        )
        SELECT CAST(s.bucket AS BIGINT) AS bucket,
               CAST(t2.rank AS BIGINT) AS rank,
               s.n_chunks, s.n_docs, s.total_energy,
               t2.doc_id, CAST(t2.chunk_idx AS BIGINT) AS chunk_idx,
               round(sqrt(CAST(t2.e AS DOUBLE)), 4) AS chunk_norm
        FROM stats s
        JOIN top t2 ON t2.bucket = s.bucket AND t2.rank <= {_RAG_TOP}
    """,
    doc="end-to-end RAG INDEXING pipeline as one lazy plan (the retrieval "
    "twin of corpus_curation_pipeline's cleaning chain): documents -> "
    f"{_CHUNK_TOKENS}-token chunks (doc_chunks_catalyst logic) -> "
    f"{_RAG_DIMS}-dim FEATURE-HASHED chunk vectors (the hashing trick, "
    "Weinberger et al. 2009: dim = md5(token) mod d, sign from the next "
    "hash bit — the embedding stand-in every dependency-free indexer "
    "ships) -> sign-bucket partitioning of the index "
    f"(first {_RAG_SIGN_BITS} dims -> {1 << _RAG_SIGN_BITS} buckets, "
    "SemDeDup-style) -> per-bucket index stats + a postings head. Every "
    "stage is integer-exact (vector cells are signed token counts, "
    "energies are integer sums) so the full chain replays bit-for-bit in "
    "SQL — no float drift anywhere until the final display norm. Scale "
    "shape: explode -> one (chunk, dim) partial agg -> one chunk agg -> "
    "one bucket agg; shuffle keys shrink at every stage, no pairwise "
    "joins, and the bucket id is exactly the partition key a sharded "
    "vector index would write by.",
)
def rag_index_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    nc = F.ceil(F.size(toks) / F.lit(float(_CHUNK_TOKENS))).cast("int")
    chunks = d.select(
        "doc_id", toks.alias("toks"), F.explode(F.sequence(F.lit(0), nc - 1)).alias("chunk_idx")
    ).select(
        "doc_id",
        "chunk_idx",
        F.explode(
            F.slice(
                F.col("toks"),
                F.col("chunk_idx") * _CHUNK_TOKENS + 1,
                _CHUNK_TOKENS,
            )
        ).alias("token"),
    )
    h = portable_hash8(F.col("token"))
    cells = (
        chunks.select(
            "doc_id",
            "chunk_idx",
            (h % _RAG_DIMS).alias("dim"),
            F.when((h / _RAG_DIMS).cast("long") % 2 == 0, 1)
            .otherwise(-1)
            .alias("sign"),
        )
        .groupBy("doc_id", "chunk_idx", "dim")
        .agg(F.sum("sign").alias("val"))
    )
    bucket = None
    for j in range(_RAG_SIGN_BITS):
        f_j = F.coalesce(
            F.sum(F.when(F.col("dim") == j, F.col("val"))), F.lit(0)
        )
        bit = F.when(f_j >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    per_chunk = cells.groupBy("doc_id", "chunk_idx").agg(
        F.sum(F.col("val") * F.col("val")).alias("e"),
        bucket.alias("bucket"),
    )
    stats = per_chunk.groupBy("bucket").agg(
        F.count("*").alias("n_chunks"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum("e").cast("long").alias("total_energy"),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.col("e").desc(), "doc_id", "chunk_idx"
    )
    top = per_chunk.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= _RAG_TOP
    )
    return top.join(stats, "bucket").select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("rank").cast("long").alias("rank"),
        "n_chunks",
        "n_docs",
        "total_energy",
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.round(F.sqrt(F.col("e").cast("double")), 4).alias("chunk_norm"),
    )


_SKIP_WINDOW = 2  # context radius (word2vec-style +/-2 skip-grams)


@register(
    "skipgram_pairs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), pos AS (
            SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks))) AS i
            FROM t
        ), pairs AS (
            SELECT toks[i] AS center, toks[j] AS context
            FROM pos, LATERAL (
                SELECT unnest(generate_series(
                    greatest(1, i - {_SKIP_WINDOW}),
                    least(len(toks), i + {_SKIP_WINDOW}))) AS j
            ) off
            WHERE j <> i
        )
        SELECT center, context, CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs
        GROUP BY center, context
        HAVING count(*) >= 5
    """,
    doc="skip-gram (center, context) pair counts with a +/-"
    f"{_SKIP_WINDOW} window — the word2vec/GloVe training-pair generator "
    "(the positional cousin of token_pmi's doc-level co-occurrence): "
    "every token emits its <= 2w neighbors via an index-window explode, "
    "aggregated to pair counts with a min-support floor. Pure Catalyst "
    "array expressions; at 100 TB the only shuffle carries (center, "
    "context) keys whose cardinality is bounded by vocab² — the "
    "co-occurrence matrix every embedding trainer streams from. The "
    "explode is positional (sequence over indices), so boundary windows "
    "clip exactly like the oracle's greatest/least bounds.",
)
def skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pos = d.select(
        toks.alias("toks"),
        F.posexplode(toks).alias("i0", "center"),
    )
    # context via slice around i (0-based i0; slice is 1-based)
    lo = F.greatest(F.lit(1), F.col("i0") + 1 - _SKIP_WINDOW)
    hi = F.least(F.size("toks"), F.col("i0") + 1 + _SKIP_WINDOW)
    ctx = F.filter(
        F.transform(
            F.sequence(lo, hi), lambda j: F.struct(
                j.alias("j"), F.element_at(F.col("toks"), j).alias("tok")
            )
        ),
        lambda s: s["j"] != F.col("i0") + 1,
    )
    pairs = pos.select(
        "center", F.explode(ctx).alias("c")
    ).select("center", F.col("c.tok").alias("context"))
    return (
        pairs.groupBy("center", "context")
        .agg(F.count("*").alias("n_pairs"))
        .filter(F.col("n_pairs") >= 5)
    )


# --------------------------------------------------------------------------
# PassJoin: LOSSLESS edit-distance similarity join via pigeonhole segments
# --------------------------------------------------------------------------

_PASS_TAU = 2  # edit-distance threshold
_PASS_LEN = 20  # fixed prefix length compared
# tau+1 = 3 segments (1-based start, length): any string within tau edits
# must contain one segment EXACTLY, shifted by at most tau
_PASS_SEGS = ((1, 1, 7), (2, 8, 7), (3, 15, 6))


def _passjoin_probe_starts(start: int, length: int) -> list[int]:
    lo = max(1, start - _PASS_TAU)
    hi = min(_PASS_LEN - length + 1, start + _PASS_TAU)
    return list(range(lo, hi + 1))


@register(
    "passjoin_edit_pairs",
    # oracle = the NAIVE all-pairs join: the segment-filtered plan must
    # reproduce the ground truth bit-for-bit, certifying losslessness
    oracle=f"""
        WITH b AS (
            SELECT doc_id, substring(text, 1, {_PASS_LEN}) AS p
            FROM documents
        )
        SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
               CAST(levenshtein(a.p, c.p) AS BIGINT) AS edit_dist
        FROM b a
        JOIN b c ON a.doc_id < c.doc_id
        WHERE levenshtein(a.p, c.p) <= {_PASS_TAU}
    """,
    doc="PassJoin (Li et al. 2011): LOSSLESS edit-distance similarity "
    f"join at tau={_PASS_TAU} via pigeonhole segmentation — each "
    f"{_PASS_LEN}-char key splits into tau+1 segments; any pair within "
    "tau edits must share one segment EXACTLY at a start shifted by at "
    "most tau, so the equi-join on (segment_idx, substring) is a "
    "complete candidate filter and the verify step reproduces the NAIVE "
    "all-pairs oracle bit-for-bit. Completes the exact-sim-join trio: "
    "all-pairs bitmask (certified baseline), PPJoin prefix filter "
    "(token overlap), PassJoin segments (edit distance). Scale shape: "
    f"{sum(len(_passjoin_probe_starts(s, n)) for _, s, n in _PASS_SEGS)} "
    "probe keys + 3 index keys per row, shuffled on short substring "
    "keys — candidate volume tracks true near-pairs, never n²/2; the "
    "quadratic stage is gone exactly like the MinHash/PPJoin paths.",
)
def passjoin_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, _PASS_LEN).alias("p")
    )
    seg_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.substring("p", start, length).alias("seg"),
            )
            for i, start, length in _PASS_SEGS
        ]
    )
    index = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("p").alias("pa"),
        F.explode(seg_arr).alias("s"),
    ).select("id_a", "pa", F.col("s.i").alias("i"), F.col("s.seg").alias("seg"))
    probe_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.substring("p", st, length).alias("seg"),
            )
            for i, start, length in _PASS_SEGS
            for st in _passjoin_probe_starts(start, length)
        ]
    )
    probe = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("p").alias("pb"),
        F.explode(probe_arr).alias("s"),
    ).select("id_b", "pb", F.col("s.i").alias("i"), F.col("s.seg").alias("seg"))
    cand = (
        index.join(probe, ["i", "seg"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("pa"))
            .otherwise(F.col("pb"))
            .alias("sa"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("pb"))
            .otherwise(F.col("pa"))
            .alias("sb"),
        )
        .distinct()
    )
    return cand.filter(
        F.levenshtein("sa", "sb") <= _PASS_TAU
    ).select(
        "doc_a",
        "doc_b",
        F.levenshtein("sa", "sb").cast("long").alias("edit_dist"),
    )


# --------------------------------------------------------------------------
# round-10 bank: exact duplicated-span finder (maximal islands)
# --------------------------------------------------------------------------

_SPAN_K = 5

_SPAN_ISLANDS_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), g AS (
        SELECT doc_id, s.i AS pos,
               array_to_string(toks[s.i:s.i + {_SPAN_K} - 1], ' ') AS gram
        FROM t, LATERAL (SELECT unnest(generate_series(1,
                 len(toks) - {_SPAN_K} + 1)) AS i) s
        WHERE len(toks) >= {_SPAN_K}
    ), reach AS (
        SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM g GROUP BY gram
    ), shared AS (
        SELECT g.doc_id, g.pos
        FROM g JOIN reach USING (gram)
        WHERE reach.n_docs >= 2
    ), isl AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id
                   ORDER BY pos) AS grp
        FROM shared
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS start_pos,
           CAST(max(pos) + {_SPAN_K} - 1 AS BIGINT) AS end_pos,
           CAST(max(pos) - min(pos) + {_SPAN_K} AS BIGINT) AS span_tokens
    FROM isl GROUP BY doc_id, grp
"""


@register(
    "shared_span_islands",
    oracle=_SPAN_ISLANDS_ORACLE,
    doc="exact cross-document duplicated spans (the Lee-et-al "
    "substring-dedup find stage on maximal islands): every position "
    f"whose {_SPAN_K}-gram occurs in >= 2 DISTINCT documents, merged "
    "into maximal runs with the gap-and-island trick (pos - row_number "
    "is constant within a consecutive run - pure integer arithmetic, so "
    "the oracle replays every span bit-for-bit). The maximal-span "
    "companion to segment_dedup_rewrite's fixed segments: a shared run "
    f"of w tokens is recovered as ONE span of w + {_SPAN_K} - 1 "
    "positions, not ceil(w/seg) fragments. Scale shape: one tokenize "
    "pass feeding a gram-keyed doc-frequency groupBy and an equi-join "
    "back (two shuffles on gram), then a per-doc island window - no "
    "all-pairs stage anywhere, and the window partitions by doc_id so "
    "no single-task global sort.",
)
def shared_span_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # PERSIST: the position-gram frame (one row per token position -
    # corpus-token-sized, the same bound as the certified inverted-index
    # family), read by BOTH the doc-frequency groupBy and the join-back
    # below; caching trades one tokenize/explode pass for the cache,
    # session-LRU lifetime
    grams = (
        d.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= _SPAN_K)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_SPAN_K} + 1),"
                    f" i -> array_join(slice(toks, i, {_SPAN_K}), ' '))"
                )
            ).alias("idx", "gram"),
        )
        .select("doc_id", (F.col("idx") + 1).alias("pos"), "gram")
        .persist()
    )
    reach = grams.groupBy("gram").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs")
    )
    shared = (
        grams.join(reach, "gram")
        .filter(F.col("n_docs") >= 2)
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = shared.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return isl.groupBy("doc_id", "grp").agg(
        F.min("pos").cast("long").alias("start_pos"),
        (F.max("pos") + _SPAN_K - 1).cast("long").alias("end_pos"),
        (F.max("pos") - F.min("pos") + _SPAN_K)
        .cast("long")
        .alias("span_tokens"),
    ).drop("grp")


_EVAL_DECON_N = 8  # gram width of the exact-overlap decontamination protocol
_EVAL_DECON_MOD = 7  # deterministic doc_id % _EVAL_DECON_MOD == 0 eval shard


@register(
    "ngram_decontaminate",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(toks[i:i + {_EVAL_DECON_N} - 1], ' ') AS gram
        FROM t, LATERAL (SELECT unnest(generate_series(1,
                 len(toks) - {_EVAL_DECON_N} + 1)) AS i) s
        WHERE len(toks) >= {_EVAL_DECON_N}
    ), eval_grams AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id % {_EVAL_DECON_MOD} = 0
    ), corpus AS (
        SELECT doc_id, gram FROM grams WHERE doc_id % {_EVAL_DECON_MOD} != 0
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           round(sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS hit_share
    FROM corpus c LEFT JOIN eval_grams e USING (gram)
    GROUP BY c.doc_id
    HAVING sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) > 0
    """,
    doc=f"exact {_EVAL_DECON_N}-gram-overlap eval-set decontamination — the "
    "n-gram sibling of the registered decontaminate_by_embedding, "
    "completing the GPT-3/Llama eval-contamination protocol pair "
    "(find stage: a corpus doc is contaminated iff any of its DISTINCT "
    f"{_EVAL_DECON_N}-grams appears in any eval doc). The held-out eval "
    f"shard is the deterministic doc_id % {_EVAL_DECON_MOD} == 0 slice — a "
    "TEST-HARNESS choice (the synthetic corpus repeats template "
    "sentences, so overlap exists and the driver row is non-vacuous); "
    "production eval sets are fixed benchmark suites — dimension-sized "
    "regardless of corpus scale — which is the contract the broadcast "
    "semi-join plan encodes (plan-pinned eval-side-broadcast in "
    "tests/test_bank_plans.py). Candidate volume is linear in corpus "
    "grams, never quadratic. Output per contaminated doc: gram count, "
    "hit count, hit share (exact integers + one single-ratio round). "
    "Cites decontaminate_ngram_overlap (this module) for the "
    "cross-SOURCE overlap variant; this one is eval-shard-directional.",
)
def ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # PERSIST: distinct (doc_id, gram) frame — linear in corpus token
    # mass; read by BOTH the eval-shard distinct and the corpus side of
    # the contamination join; session-LRU lifetime
    grams = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= _EVAL_DECON_N)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_EVAL_DECON_N} + 1),"
                    f" i -> array_join(slice(toks, i, {_EVAL_DECON_N}), ' '))"
                )
            ).alias("gram"),
        )
        .distinct()
        .persist()
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % _EVAL_DECON_MOD == 0)
        .select("gram")
        .distinct()
    )
    corpus = grams.filter(F.col("doc_id") % _EVAL_DECON_MOD != 0)
    # eval side broadcast by CONTRACT: production eval suites are fixed
    # benchmark sets, dimension-sized regardless of corpus scale (see
    # doc above) — the corpus side streams past it scan-shaped
    hits = corpus.join(
        F.broadcast(eval_grams.withColumn("_hit", F.lit(1))),
        "gram",
        "left",
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hit"),
            F.round(
                F.sum(F.coalesce("_hit", F.lit(0))) * 1.0 / F.count("*"), 6
            ).alias("hit_share"),
        )
        .filter(F.col("n_hit") > 0)
    )


# --------------------------------------------------------------------------
# Round-15 registrations (promoted from tests/test_round15_previews.py —
# parity pairs proven in round 6 and rehearsed on three perturbed variants
# + the 120/120 multi-seed stress end-of-r14; this move is mechanical per
# the SURVEY r15 bullet)
# --------------------------------------------------------------------------

_TRIPF_PATTERN = "merge join"
_TRIPF_TRIGRAMS = sorted(
    {_TRIPF_PATTERN[i : i + 3] for i in range(len(_TRIPF_PATTERN) - 2)}
)
_TRIPF_TRI_SQL = "[" + ", ".join(f"'{t}'" for t in _TRIPF_TRIGRAMS) + "]"


@register(
    "trigram_like_prefilter",
    oracle=f"""
    WITH postings AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, len(text) - 2),
                   i -> substr(text, CAST(i AS INTEGER), 3))) AS tri
        FROM documents WHERE len(text) >= 3
    ), cand AS (
        SELECT doc_id FROM postings
        WHERE tri IN (SELECT unnest({_TRIPF_TRI_SQL}))
        GROUP BY doc_id
        HAVING count(*) = {len(_TRIPF_TRIGRAMS)}
    ), truth AS (
        SELECT doc_id FROM documents
        WHERE contains(text, '{_TRIPF_PATTERN}')
    )
    SELECT CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
           (SELECT count(*) FROM truth t
            WHERE t.doc_id NOT IN (SELECT doc_id FROM cand)) = 0
               AS lossless_ok,
           ((2 * (SELECT count(*) FROM truth) * 1000000
             + (SELECT count(*) FROM cand))
            // (2 * (SELECT count(*) FROM cand)))
               / 1000000.0 AS precision6
    """,
    doc="index-accelerated LIKE, audited LOSSLESS: candidates for "
    f"LIKE '%{_TRIPF_PATTERN}%' are the docs containing ALL "
    f"{len(_TRIPF_TRIGRAMS)} character trigrams of the pattern (a "
    "postings-intersection count — the pg_trgm strategy), truth is the "
    "direct substring scan. A doc containing the substring necessarily "
    "contains every one of its trigrams, so candidates ⊇ truth ALWAYS "
    "— the PPJoin/PassJoin lossless-prefilter contract applied to the "
    "LIKE path; the summary row certifies the containment and the "
    "prefilter precision. precision6 is integer half-away 1e-6 units "
    "on both engines (the r14 boundary-hazard criterion applied "
    "pre-registration: n_candidates is a small-but-corpus-scaling "
    "count that reaches the 2^a*5^b >= 128 grid at material rates "
    "under regeneration — the basket_pair_rules lesson; never a float "
    "round). Scale: the postings build is the one-time linear index "
    "(distinct (doc, trigram) groupBy); the per-query work is "
    "|pattern trigrams| posting lookups + one count-threshold groupBy; "
    "the truth scan exists only for the audit (at 100 TB the index "
    "REPLACES the scan — that is its point). Reference has no "
    "counterpart (its ETL has no text search; "
    "scripts/process_silver_to_gold.py).",
)
def trigram_like_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    postings = (
        docs.filter(F.length("text") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text) - 2),"
                    " i -> substring(text, i, 3))"
                )
            ).alias("tri"),
        )
        .distinct()
    )
    cand = (
        postings.filter(F.col("tri").isin(_TRIPF_TRIGRAMS))
        .groupBy("doc_id")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") == len(_TRIPF_TRIGRAMS))
        .select("doc_id")
        # PERSIST: candidate doc-id set — <= |matching docs| single-key
        # rows — read TWICE: the candidate count and the containment
        # anti-join; session-LRU lifetime
        .persist()
    )
    truth = (
        docs.filter(F.instr(F.col("text"), _TRIPF_PATTERN) > 0)
        .select("doc_id")
        # PERSIST: truth doc-id set — <= |matching docs| single-key
        # rows — read TWICE: the truth count and the containment
        # anti-join; session-LRU lifetime
        .persist()
    )
    n_cand = cand.agg(F.count("*").cast("long").alias("n_candidates"))
    n_true = truth.agg(F.count("*").cast("long").alias("n_true"))
    missed = truth.join(cand, "doc_id", "left_anti").agg(
        F.count("*").alias("n_missed")
    )
    return (
        # CROSSJOIN: two 1-row summary combines (counts + the missed
        # audit) — bounded
        n_cand.crossJoin(n_true)
        .crossJoin(missed)
        .select(
            "n_candidates",
            "n_true",
            (F.col("n_missed") == 0).alias("lossless_ok"),
            # integer half-away 1e-6-unit ratio (see the boundary-
            # hazard note in the doc): never a float round. Guarded at
            # n_candidates = 0 (r15 ADVICE): DuckDB's x // 0 is NULL
            # while Spark-4 ANSI div throws DIVIDE_BY_ZERO — the when()
            # emits the oracle's existing NULL instead of an engine-
            # asymmetric crash on a degenerate regenerated corpus;
            # identical output wherever the query previously succeeded
            F.when(
                F.col("n_candidates") > 0,
                F.expr(
                    "(2 * n_true * 1000000 + n_candidates)"
                    " div (2 * n_candidates)"
                )
                / F.lit(1_000_000.0),
            ).alias("precision6"),
        )
    )


# the registered canonical-resolution oracle, wrapped verbatim below so
# the banded component semantics exist exactly ONCE and a future fix to
# the resolution query propagates
_KEEP_CANONICAL_ORACLE = QUERIES["dedup_keep_canonical"].oracle


@register(
    "dedup_cluster_size_histogram",
    oracle=f"""
        SELECT cluster_size AS size, CAST(count(*) AS BIGINT) AS n_clusters
        FROM ({_KEEP_CANONICAL_ORACLE})
        GROUP BY 1
    """,
    doc="the dedup run's standard report: the size distribution of the "
    "near-duplicate clusters — how many singletons, how many small "
    "clusters, how big the worst nest is. COMPOSED on the registered "
    "dedup_keep_canonical query (Spark side calls it; oracle wraps its "
    "registered SQL as a subquery), so the report describes exactly "
    "the clusters the dedup run RESOLVES and the banded component "
    "semantics exist exactly once — a future resolution fix propagates "
    "here. Substrate: the BANDED MinHash candidate graph (16 hashes x "
    "4 bands, exact-Jaccard verify >= 0.8 on collided pairs only — the "
    "sub-quadratic production substrate), NOT exact all-pairs: the "
    "preview composed on near_dup_components, whose exact bitmask pair "
    "scan read 3.1x on the at-registration best-of-5 decade probes "
    "(>= 2x trigger, both axes, same-process controls) — the r14 "
    "verdict's banded-iteration rework applied at registration; "
    "dedup_keep_canonical's banded substrate reads ~1.9x (SCALING.md "
    "decade table). Pure integer counts — no ratio display (the r14 "
    "boundary-hazard audit passes vacuously). Scale: one groupBy over "
    "the |components|-row resolution frame — the banding pass is "
    "linear, candidates are bucket-bounded, and the iteration runs on "
    "the sparse verified pair graph (operators/graph.py min-label "
    "propagation, localCheckpoint-truncated lineage). Reference has no "
    "counterpart (its ETL has no dedup; "
    "scripts/process_bronze_to_silver.py).",
)
def dedup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    canon = dedup_keep_canonical(spark, sf_dir)
    return canon.groupBy(F.col("cluster_size").alias("size")).agg(
        F.count("*").cast("long").alias("n_clusters")
    )
