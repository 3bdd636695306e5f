"""BPE-style merge induction over a tokenized corpus (round-7 surface;
library-first so the plan shapes are tested before registration).

The tokenizer-training inner loop (Sennrich et al. BPE; same shape as
word2phrase phrase induction, applied here at word level): repeatedly
(1) count adjacent token pairs across the corpus, (2) pick the most
frequent pair, (3) rewrite every leftmost non-overlapping occurrence
into a single merged token, and repeat on the rewritten corpus. Each
iteration is one distributed scan + one pair-count groupBy + a map-side
string rewrite — the same per-pass cost profile as a production BPE
trainer, with only a 1-row driver collect per iteration (the argmax
pair; contract-bounded like the repo's other scalar collects).

Engine-portable by construction: pair counts are INTEGERS (argmax ties
break on count DESC, a ASC, b ASC — no float anywhere), and the rewrite
is plain non-overlapping left-to-right ``replace`` in both engines via
the doubled-space trick: double every separator, pad, replace
`` a  b `` with `` a_b ``, collapse. Doubling makes consecutive matches
share no characters, so one linear replace implements exactly the
greedy leftmost BPE merge ("a a a" → "a_a a"), identically in Spark and
ANSI SQL.

No reference counterpart (the reference's ETL ends at a star schema);
this extends the tier-4 LLM-pipeline surface like operators/mixing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import checksum_modsum, portable_hash8

# Merged tokens are joined with '_', so INPUT corpus tokens must not
# contain it (else "a_b" from a merge conflates with a literal "a_b"
# token in pair_counts and corrupts the audit). validate_corpus guards
# this; induce_and_encode calls it once on the input (merges themselves
# introduce '_', which is fine — the guard runs before iteration 1).
MERGE_JOINER = "_"


def validate_corpus(corpus: DataFrame, text_col: str = "text") -> None:
    """Raise if any input text would break the merge machinery: a
    literal ``MERGE_JOINER`` in a token conflates distinct pairs after
    the first merge; leading/trailing/double spaces break the
    doubled-space rewrite's token-boundary invariant; non-space
    whitespace (tab/newline/NBSP) or an empty string would be treated
    as part of a single token rather than a separator (r6 ADVICE: the
    guard certifies SINGLE-SPACE separation, so these must fail too);
    and a NULL text would silently vanish from pair counts and the
    corpus checksum (``rlike(NULL)`` is NULL, so NULLs need their own
    predicate).

    Honest cost: the happy path is one full scan of ``text_col``
    (``take(1)`` on a filter that matches nothing visits every
    partition) — induction becomes O(k+1) corpus scans instead of
    O(k). Callers re-running induction over a corpus already certified
    once can pass ``validate=False`` to :func:`induce_and_encode`."""
    bad = corpus.filter(
        F.col(text_col).isNull()
        # [^\S ] = any whitespace other than the plain space separator;
        # (?U) makes Java's \s Unicode-aware so NBSP etc. count too
        | F.col(text_col).rlike(f"(?U){MERGE_JOINER}|^ | $|  |[^\\S ]|^$")
        # COLLECT: take(1) — at most one row crosses to the driver; the
        # guard scan itself is the documented O(corpus) validation cost
    ).take(1)
    if bad:
        example = bad[0][text_col]
        example = "NULL" if example is None else repr(example[:80])
        raise ValueError(
            f"BPE corpus precondition violated: {text_col!r} is NULL, "
            f"empty, contains {MERGE_JOINER!r}, irregular spacing, or "
            f"non-space whitespace (example: {example}); tokens must be "
            f"single-space separated, non-NULL, and free of the merge "
            f"joiner"
        )


def pair_counts(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent-pair frequencies over single-space-tokenized ``text_col``.

    Positions are enumerated JVM-side (``transform`` over a
    ``sequence``), then exploded and counted — one shuffle keyed on the
    pair, map-side partial aggregation for free. Overlapping
    occurrences each count once (standard BPE counting)."""
    toks = F.split(F.col(text_col), " ")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("a"),
            F.element_at(toks, i + 2).alias("b"),
        ),
    )
    return (
        corpus.filter(F.size(toks) > 1)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def apply_merge(
    corpus: DataFrame, a: str, b: str, text_col: str = "text"
) -> DataFrame:
    """Rewrite every leftmost non-overlapping adjacent ``a b`` into the
    merged token ``a_b`` (map-side, no shuffle).

    Doubled-space construction: ``" t1  t2  t3 "`` gives every token
    private spaces on both sides, so replacing ``" a  b "`` with
    ``" a_b "`` preserves the invariant and consecutive matches never
    share characters — plain ``replace`` = greedy leftmost merge."""
    doubled = F.concat(
        F.lit(" "),
        F.replace(F.col(text_col), F.lit(" "), F.lit("  ")),
        F.lit(" "),
    )
    merged = F.replace(
        doubled, F.lit(f" {a}  {b} "), F.lit(f" {a}{MERGE_JOINER}{b} ")
    )
    canonical = F.trim(F.replace(merged, F.lit("  "), F.lit(" ")))
    return corpus.withColumn(text_col, canonical)


def induce_and_encode(
    corpus: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint: bool = True,
    validate: bool = True,
) -> tuple[list[dict], DataFrame]:
    """Run ``n_merges`` BPE iterations; return one audit dict per
    iteration — the merged pair, its pre-merge count, and an
    order-insensitive integer checksum of the ENTIRE rewritten corpus
    (``checksum_modsum`` of ``portable_hash8(text)``: exact decimal
    accumulation reduced mod 2^61-1 — a raw BIGINT sum overflows past
    ~2^31 docs and a bit_xor fold is multiplicity-blind, so a bug that
    rewrites both copies of a duplicated text identically wrong would
    cancel out of an XOR; the modular sum catches it at any corpus
    size), certifying every intermediate corpus state, not just the
    merge table — plus the final encoded
    corpus (so downstream evaluation never re-applies the merge chain).

    The per-iteration driver collect is exactly one (a, b, cnt) row;
    the corpus itself never leaves the cluster.

    Precondition (validated up front by :func:`validate_corpus` unless
    ``validate=False`` — one extra corpus scan): input texts are
    non-NULL, single-space separated, and do not contain
    ``MERGE_JOINER`` ('_') — a literal '_' token would silently
    conflate with merge-produced tokens in ``pair_counts``.

    ``checkpoint`` truncates the rewrite lineage with a per-iteration
    ``localCheckpoint()`` (the repo's BFS lesson): without it the lazy
    chain re-executes for each iteration's two actions — O(k²) scans
    total (measured decade ratio 4.1 at k=3, SCALING.md round-5); with
    it each iteration materializes the corpus once and every scan reads
    the checkpointed state — O(k) scans."""
    if validate:
        validate_corpus(corpus, text_col)
    out: list[dict] = []
    cur = corpus
    for it in range(1, n_merges + 1):
        if checkpoint:
            cur = cur.localCheckpoint()
        # COLLECT: the 1-row argmax — the loop's only driver hop
        best = (
            pair_counts(cur, text_col)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["cnt"]
        cur = apply_merge(cur, a, b, text_col)
        # COLLECT: a 1-row global aggregate (the corpus checksum)
        checksum = (
            cur.select(portable_hash8(F.col(text_col)).alias("_h"))
            .agg(checksum_modsum(F.col("_h")).alias("s"))
            .collect()[0]["s"]
        )
        out.append(
            {
                "iter": it,
                "tok_a": a,
                "tok_b": b,
                "pair_count": cnt,
                "corpus_key_sum": checksum,
            }
        )
    return out, cur


def merge_induction(
    corpus: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint: bool = True,
    validate: bool = True,
) -> list[dict]:
    """The audit table alone — see :func:`induce_and_encode`."""
    return induce_and_encode(
        corpus, n_merges, text_col, checkpoint, validate
    )[0]
