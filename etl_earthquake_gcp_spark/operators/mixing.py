"""Data-mixing operators for training-corpus assembly (round-6 surface;
library-first so the plan shapes are tested before registration).

Two pieces every large-scale pretraining pipeline needs once the corpus
is curated:

- **Temperature sampling weights** (the multilingual/mC4/XLM-R pattern):
  source s with token count c_s is sampled with probability
  w_s = c_s^alpha / sum_t c_t^alpha. alpha=1 reproduces natural
  proportions, alpha=0 is uniform, the usual 0.2-0.7 band up-weights
  small sources without letting them dominate. At 100 TB this is a
  |sources|-row computation over an already-aggregated count table —
  the facts are never rescanned.

- **Deterministic per-epoch shuffle keys**: training wants a different
  global order every epoch, but reproducible and cluster-scale. Sorting
  by ``portable_hash8(doc_id || ':' || epoch)`` gives both: the key is
  computed map-side (no RNG state, no driver round-trip), a global sort
  on it is one range-partition exchange, and DuckDB replays the exact
  order for oracle checks. Different epochs decorrelate because the
  epoch is folded into the hashed string.

No reference counterpart (the reference's ETL ends at a star schema);
this extends the tier-4 LLM-pipeline surface like operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import checksum_modsum, portable_hash8


def temperature_weights(
    counts: DataFrame,
    key_col: str = "source",
    count_col: str = "n_tokens",
    alpha: float = 0.3,
) -> DataFrame:
    """Per-source sampling weights at temperature ``alpha``.

    Input: one row per source with a positive ``count_col``. Output adds
    ``raw_share`` (natural proportion), ``weight`` (temperature-scaled
    sampling probability) and ``oversample`` (weight / raw_share — how
    many epochs of source s one pass of the mixture consumes).

    Both normalizing sums are window aggregates over the |sources|-row
    frame, so the whole operator is one tiny post-aggregation stage.
    Rows with non-positive counts are excluded on BOTH the share and the
    normalizer (symmetric guard — an oracle must filter identically).
    """
    pos = counts.filter(F.col(count_col) > 0)
    powed = pos.withColumn("_pow", F.pow(F.col(count_col), F.lit(alpha)))
    tot = F.sum(count_col).over(_all_rows())
    tot_pow = F.sum("_pow").over(_all_rows())
    return (
        powed.select(
            key_col,
            F.col(count_col).cast("long").alias(count_col),
            (F.col(count_col) / tot).alias("raw_share"),
            (F.col("_pow") / tot_pow).alias("weight"),
        )
        .withColumn("oversample", F.col("weight") / F.col("raw_share"))
    )


def _all_rows():
    from pyspark.sql import Window

    return Window.partitionBy()


def budget_allocation(
    weights: DataFrame,
    budget: int,
    key_col: str = "source",
    weight_col: str = "weight",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer budget
    across sources by sampling weight — the actionable end of
    temperature mixing: "take exactly N documents/tokens, split per the
    mixture".

    Exactness contract: the float weight is quantized ONCE to integer
    1e-6 units (w_u) and then RE-NORMALIZED over the integer total
    T = sum(w_u) — floor quota = w_u*B // T, remainder = (w_u*B) mod T,
    shortfall = B - sum(floor quotas) ∈ [0, |sources|) topped up by the
    largest remainders. Every step after the single quantization is
    integer arithmetic, so an ANSI-SQL oracle replays the apportionment
    bit-for-bit, and quotas sum to EXACTLY ``budget`` regardless of
    whether the float weights sum to precisely 1 (quantizing 1/3 three
    times gives T = 999999, which naive //1e6 under-allocates by one).
    |sources|-row computation; one window pass. Delegates to
    :func:`grouped_budget_allocation` (the constant-partition special
    case) so the parity-critical integer logic exists exactly once.
    """
    staged = weights.withColumn("_part", F.lit(0)).withColumn(
        "_budget", F.lit(int(budget))
    )
    return grouped_budget_allocation(
        staged, "_part", "_budget", key_col, weight_col
    ).select(key_col, weight_col, "quota")


def epoch_shuffle_key(doc_id: Column, epoch: int) -> Column:
    """Deterministic, engine-portable per-epoch global shuffle key.

    ``portable_hash8(doc_id || ':' || epoch)`` — folding the epoch into
    the hashed string makes each epoch's order effectively independent,
    while everything stays reproducible and map-side (no rand(), no
    seed broadcast). Sort by (key, doc_id) for a total order robust to
    the ~2^-32 chance of an 8-hex-digit collision.
    """
    return portable_hash8(
        F.concat(doc_id.cast("string"), F.lit(f":{epoch}"))
    )


def epoch_order(
    docs: DataFrame, epoch: int, id_col: str = "doc_id"
) -> DataFrame:
    """Training-order view of ``docs`` for one epoch: a global sort on the
    deterministic shuffle key. At scale this is exactly one range
    exchange (Spark samples key boundaries) + local sorts — the same
    cost as any ORDER BY, with no RNG state to coordinate."""
    return docs.withColumn(
        "shuffle_key", epoch_shuffle_key(F.col(id_col), epoch)
    ).orderBy("shuffle_key", id_col)


def epoch_order_ranges(
    docs: DataFrame,
    epoch: int,
    n_buckets: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Whole-order certificate for one epoch's shuffle — the full-corpus
    sibling of :func:`epoch_order`'s head-N (r6 VERDICT next-step #6,
    the same trick ``zorder_layout_stats`` uses for layout).

    ``bucket_id = (shuffle_key * n_buckets) div 2^32`` is a MONOTONE
    integer map of the shuffle key (keys are uniform in [0, 2^32) from
    ``portable_hash8``), so bucket key-ranges are disjoint and ordered
    by construction — certified in-row by ``in_bounds`` against the
    closed-form bucket bounds. Per-bucket count / min / max / key-sum /
    id-sum plus the cumulative start position then certify the ENTIRE
    training order: every doc's global position is ``cum_start(bucket)
    + its (shuffle_key, id) rank within the bucket``, and within-bucket
    order is independently replayable per bucket. Cost: one scan + one
    |buckets|-row aggregate + a |buckets|-row window — no global sort,
    no corpus-sized collect, scale-free in the corpus size.

    The membership checksums are MODULAR sums (scalar.checksum_modsum:
    exact DECIMAL(38,0)/HUGEINT accumulation reduced mod 2^61-1,
    emitted as BIGINT): a raw BIGINT sum overflows around 2^31
    docs/bucket, while a bit_xor fold is multiplicity-blind (hash
    collisions and even-count duplicates cancel — at corpus scale
    32-bit shuffle keys WILL collide by the birthday bound). The
    modular sum is multiplicity-sensitive, order-insensitive, exact to
    ~1e19 rows/bucket even for full-range ids, and both engines apply
    the same sign-of-dividend remainder — so for non-negative inputs
    (hash keys, the usual id contract) the checksum lies in [0, M),
    and if ids can be negative it lies in (-M, M), identically on both
    sides (parity holds either way; only assume non-negativity of the
    emitted value when the inputs are non-negative). The
    only other products are the bucket-bound constants (≤ 2^38) and
    ``cum_start`` (bounded by the corpus row count), so the
    certificate is all-integer and bit-identical across engines at any
    scale.
    """
    lo = f"(bucket_id * 4294967296 + {n_buckets} - 1) DIV {n_buckets}"
    hi = f"((bucket_id + 1) * 4294967296 + {n_buckets} - 1) DIV {n_buckets} - 1"
    agg = (
        docs.select(
            F.col(id_col),
            epoch_shuffle_key(F.col(id_col), epoch).alias("shuffle_key"),
        )
        .withColumn(
            "bucket_id",
            F.expr(f"CAST((shuffle_key * {n_buckets}) DIV 4294967296 AS BIGINT)"),
        )
        .groupBy("bucket_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("shuffle_key").alias("min_key"),
            F.max("shuffle_key").alias("max_key"),
            checksum_modsum(F.col("shuffle_key")).alias("key_sum"),
            checksum_modsum(F.col(id_col)).alias("id_sum"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("bucket_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return agg.select(
        "bucket_id",
        "n_docs",
        "min_key",
        "max_key",
        "key_sum",
        "id_sum",
        F.coalesce(F.sum("n_docs").over(w), F.lit(0))
        .cast("long")
        .alias("cum_start"),
        F.expr(f"min_key >= {lo} AND max_key <= {hi}").alias("in_bounds"),
    )


def token_budget_truncate(
    df: DataFrame,
    weight_col: str,
    group_col: str,
    id_col: str,
    p_num: int,
    p_den: int,
) -> DataFrame:
    """Per-group top-p truncation by cumulative weight: order each
    group's rows by (weight DESC, id), set the group budget to
    ``ceil(p * total_weight)`` (pure integer ceiling division), and
    keep every row that STARTS below the budget — so the row crossing
    the boundary is included and the kept set always covers at least
    the requested share. The "keep the heaviest docs until the token
    budget is met" curation primitive, all integer arithmetic.

    Adds ``cum_prev`` (exclusive running weight), ``grp_total`` and
    ``budget``; returns only the kept rows. Both the running and the
    total sum come from windows over the SAME group partitioning — one
    exchange, one corpus scan, no totals join. (Per-group sort skew is
    the honest cost: the output is a prefix of each group's weight
    ordering, which no histogram trick can avoid materializing.)

    The weight column must already be integer-typed: a silent
    ``cast("long")`` here would truncate fractional weights toward zero
    while a SQL oracle's CAST rounds — a cross-engine parity trap."""
    from pyspark.sql import Window

    wtype = dict(df.dtypes)[weight_col]
    if wtype not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"token_budget_truncate needs an integer weight column; "
            f"{weight_col} is {wtype} — quantize it explicitly first"
        )
    w_run = (
        Window.partitionBy(group_col)
        .orderBy(F.desc(weight_col), id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(group_col)
    return (
        df.withColumn(
            "cum_prev",
            F.coalesce(F.sum(weight_col).over(w_run), F.lit(0)).cast(
                "long"
            ),
        )
        .withColumn(
            "grp_total", F.sum(weight_col).over(w_all).cast("long")
        )
        .withColumn(
            "budget",
            F.expr(
                f"(grp_total * {int(p_num)} + {int(p_den)} - 1)"
                f" div {int(p_den)}"
            ).cast("long"),
        )
        .filter(F.col("cum_prev") < F.col("budget"))
    )


def grouped_budget_allocation(
    weights: DataFrame,
    part_col: str,
    budget_col: str,
    key_col: str,
    weight_col: str,
) -> DataFrame:
    """Hamilton apportionment of an integer PER-GROUP budget across
    each group's keys by float weight — :func:`budget_allocation`
    generalized to partitioned windows (every window runs over
    |keys| rows per group; the global form is the constant-partition
    special case and delegates here so the bit-parity-critical
    quantize/renormalize/tie logic exists exactly once). Returns
    (part, key, weight, quota) with sum(quota) == budget in every
    part.

    Weights must be NON-NEGATIVE and NON-NULL (w_u <= t, which the
    overflow proof below relies on) — enforced with a map-side
    raise_error, so a negative OR NULL weight fails the job loudly
    instead of silently producing negative quotas that no longer sum to
    the budget (negative) or a NULL quota silently excluded from the
    apportionment (NULL). Degenerate
    groups where every weight quantizes to 0 (all < 5e-7, so t = 0)
    fall back DETERMINISTICALLY to uniform apportionment (w_u = 1,
    t = |keys|) — the sum(quota) == budget contract holds instead of
    silently yielding NULL quotas from an integer division by zero.

    Overflow contract: the floor quota div(w_u*b, t) is computed via
    the exact split b = q*t + r as w_u*q + div(w_u*r, t) (and the
    remainder as (w_u*r) mod t — identical since w_u*q*t ≡ 0 mod t).
    Both products stay inside BIGINT for ANY budget up to 2^63-1:
    w_u*q <= t*(b div t) <= b because w_u <= t, and w_u*r < t^2,
    safe while t < 3.03e9 — i.e. group weights summing to ~3000 with
    1e-6 quantization; normalized weights give t ≈ 1e6. (The naive
    w_u*b product overflows past b ≈ 9.2e12 — a plausible token
    budget at 100 TB scale.)"""
    from pyspark.sql import Window

    # NULL must fail as loudly as negative: NULL < 0 is NULL, so a plain
    # `< 0` guard would let a NULL weight slip into the otherwise-branch
    # as a NULL quota silently excluded from apportionment (r6 ADVICE)
    w_u0 = F.when(
        F.col(weight_col).isNull() | (F.col(weight_col) < 0),
        F.raise_error(
            F.format_string(
                "grouped_budget_allocation: negative or NULL weight %s"
                " for key %s",
                F.coalesce(F.col(weight_col).cast("string"), F.lit("NULL")),
                F.col(key_col).cast("string"),
            )
        ),
    ).otherwise(F.round(F.col(weight_col) * 1_000_000, 0).cast("long"))
    part_w = Window.partitionBy(part_col)
    staged = (
        weights.select(
            part_col,
            key_col,
            F.col(weight_col),
            F.col(budget_col).cast("long").alias("_b"),
            w_u0.alias("w_u0"),
        )
        .withColumn("_t0", F.sum("w_u0").over(part_w))
        .withColumn(
            "w_u",
            F.when(F.col("_t0") == 0, F.lit(1)).otherwise(F.col("w_u0")),
        )
        .withColumn(
            "t",
            F.when(F.col("_t0") == 0, F.count("*").over(part_w))
            .otherwise(F.col("_t0"))
            .cast("long"),
        )
    )
    base = staged.select(
        part_col,
        key_col,
        weight_col,
        "_b",
        (
            F.col("w_u") * F.expr("_b div t")
            + F.expr("(w_u * (_b % t)) div t")
        ).alias("floor_quota"),
        ((F.col("w_u") * (F.col("_b") % F.col("t"))) % F.col("t")).alias(
            "rem"
        ),
    )
    rr_w = Window.partitionBy(part_col).orderBy(F.desc("rem"), key_col)
    return (
        base.withColumn("rr", F.row_number().over(rr_w))
        .withColumn(
            "shortfall", F.col("_b") - F.sum("floor_quota").over(part_w)
        )
        .select(
            part_col,
            key_col,
            weight_col,
            (
                F.col("floor_quota")
                + F.when(F.col("rr") <= F.col("shortfall"), 1).otherwise(0)
            )
            .cast("long")
            .alias("quota"),
        )
    )
