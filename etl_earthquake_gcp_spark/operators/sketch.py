"""Count-min sketch as pure DataFrame aggregation.

Frequency estimation in fixed memory: a depth×width counter grid where each
of ``depth`` seeded hash rows increments one of ``width`` buckets per
occurrence; an item's estimate is the MIN of its counters (over-count only —
collisions inflate, never deflate, so est ≥ true always).

Why it matters at 100 TB: the grid size is constant (depth·width counters)
regardless of key cardinality, and it builds as ONE partial-aggregated
shuffle of (row, bucket) cells — heavy-hitter screening over a vocabulary
that would blow an exact groupBy out of memory. Same capability family as
``approx_count_distinct`` (A10) / ``approx_percentile``, but implemented
here from scratch to show sketches need no engine support.

Hashes are the same engine-portable (a·x+b) mod p family as
operators/dedup.py (p = 2^31-1, products < 2^62: exact BIGINT math in both
Spark's ANSI mode and DuckDB), so the WHOLE sketch — grid and estimates —
is oracle-checkable bit-for-bit, unlike typical sketch implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _MERSENNE_P, minhash_coeffs

CM_DEPTH = 4
CM_WIDTH = 64
CM_SEED = 7


def _bucket(col: F.Column, a: int, b: int, width: int) -> F.Column:
    return ((col * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE_P)) % F.lit(width)


def countmin_grid(
    tids: DataFrame,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    seed: int = CM_SEED,
) -> DataFrame:
    """(row j, bucket, n) counter grid from a (tid) occurrence stream.

    One Expand (×depth) + one partial-aggregated shuffle of ≤ depth·width
    groups — the map side pre-collapses to grid cells, so shuffle volume is
    the GRID size, not the data size.
    """
    coeffs = minhash_coeffs(depth, seed)
    cells = tids.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("j"),
                        _bucket(F.col("tid"), a, b, width).alias("bucket"),
                    )
                    for j, (a, b) in enumerate(coeffs)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy("cell.j", "cell.bucket").agg(F.count("*").alias("n"))


def countmin_estimates(
    grid: DataFrame,
    probes: DataFrame,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    seed: int = CM_SEED,
) -> DataFrame:
    """min-over-rows estimate for each probe (token, tid).

    The grid is KB-scale → broadcast; probing is a map-side join + min agg.
    """
    coeffs = minhash_coeffs(depth, seed)
    probe_cells = probes.select(
        "token",
        "tid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("j"),
                        _bucket(F.col("tid"), a, b, width).alias("bucket"),
                    )
                    for j, (a, b) in enumerate(coeffs)
                ]
            )
        ).alias("cell"),
    ).select("token", "tid", "cell.j", "cell.bucket")
    return (
        probe_cells.join(F.broadcast(grid), ["j", "bucket"])
        .groupBy("token")
        .agg(F.min("n").alias("est_n"))
    )


BLOOM_BITS = 512  # 8 long words
BLOOM_HASHES = 3
BLOOM_SEED = 11

# single-bit masks as literals (a column-indexed shiftleft isn't exposed in
# the Python API; element_at over this table is equivalent). Bit 63 is the
# sign bit → its mask is the negative two's-complement value.
_BIT_MASKS = [1 << i for i in range(63)] + [-(2**63)]


def _mask_for(bit: F.Column) -> F.Column:
    return F.element_at(
        F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS]), bit + 1
    )


def bloom_build(keys: DataFrame, key_col: str) -> list[int]:
    """Build a Bloom filter over a key column as ONE bit_or aggregate.

    Bit positions come from the same portable (a·x+b) mod p hash family as
    the count-min grid; bits pack into BLOOM_BITS/64 BIGINT words via a
    (word, mask) explode + bit_or — constant-size state like any sketch.
    The finished filter is BLOOM_BITS/8 bytes, collected to the driver to be
    re-broadcast as plan literals (the broadcast-variable pattern; the
    collect is KB-scale by construction, not data-scale).
    """
    coeffs = minhash_coeffs(BLOOM_HASHES, BLOOM_SEED)
    pos = [
        ((F.col(key_col) * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE_P))
        % F.lit(BLOOM_BITS)
        for a, b in coeffs
    ]
    cells = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (p / 64).cast("int").alias("word"),
                        _mask_for((p % 64).cast("int")).alias("mask"),
                    )
                    for p in pos
                ]
            )
        ).alias("c")
    )
    # COLLECT: bounded by contract — one row per 64-bit word, i.e.
    # exactly BLOOM_BITS/64 rows regardless of input cardinality
    got = {
        r.word: r.bits
        for r in cells.groupBy("c.word")
        .agg(F.bit_or("c.mask").alias("bits"))
        .collect()
    }
    return [got.get(w, 0) for w in range(BLOOM_BITS // 64)]


def bloom_might_contain(words: list[int], key: F.Column) -> F.Column:
    """Plan-literal membership test: true if ALL hash bits are set.

    No false negatives (every inserted key's bits are set); false positives
    are whatever downstream exact logic tolerates — as a join prefilter they
    are removed by the join itself, so the rewrite is semantically free.
    """
    coeffs = minhash_coeffs(BLOOM_HASHES, BLOOM_SEED)
    word_arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = None
    for a, b in coeffs:
        p = ((key * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE_P)) % F.lit(BLOOM_BITS)
        word = F.element_at(word_arr, (p / 64).cast("int") + 1)
        term = word.bitwiseAND(_mask_for((p % 64).cast("int"))) != 0
        cond = term if cond is None else cond & term
    return cond


def countmin_oracle_sql(
    depth: int = CM_DEPTH, width: int = CM_WIDTH, seed: int = CM_SEED
) -> str:
    """DuckDB twin: identical dictionary, hashes, grid, and min-estimates,
    joined with exact counts (est_n >= true_n by construction)."""
    coeffs = minhash_coeffs(depth, seed)
    hash_rows = "\n            UNION ALL ".join(
        f"SELECT tid, {j} AS j, ((tid * {a} + {b}) % {_MERSENNE_P}) % {width} AS bucket FROM occurrences"
        for j, (a, b) in enumerate(coeffs)
    )
    probe_rows = "\n            UNION ALL ".join(
        f"SELECT token, tid, {j} AS j, ((tid * {a} + {b}) % {_MERSENNE_P}) % {width} AS bucket FROM vocab"
        for j, (a, b) in enumerate(coeffs)
    )
    return f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ), vocab AS (
            SELECT token,
                   CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS tid
            FROM (SELECT DISTINCT token FROM tok)
        ), occurrences AS (
            SELECT v.tid FROM tok t JOIN vocab v USING (token)
        ), cells AS (
            {hash_rows}
        ), grid AS (
            SELECT j, bucket, CAST(count(*) AS BIGINT) AS n
            FROM cells GROUP BY j, bucket
        ), probe_cells AS (
            {probe_rows}
        ), est AS (
            SELECT p.token, min(g.n) AS est_n
            FROM probe_cells p JOIN grid g USING (j, bucket)
            GROUP BY p.token
        ), exact AS (
            SELECT token, CAST(count(*) AS BIGINT) AS true_n
            FROM tok GROUP BY token
        )
        SELECT e.token, x.true_n, e.est_n
        FROM est e JOIN exact x USING (token)
    """


# --------------------------------------------------------------------------
# HyperLogLog — bit-exact portable distinct-count sketch
# --------------------------------------------------------------------------

HLL_M = 64  # registers (2^6); standard error 1.04/sqrt(64) ≈ 13%
HLL_SEED = 11
# alpha_m = 0.7213 / (1 + 1.079/m), embedded as one Python double literal
# so both engines multiply by the identical constant
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_HLL_MAX_RHO = 26  # hash div m < 2^25 → at most 25 trailing zeros


def _rho_case_sql(w: str) -> str:
    """rho(w) = 1-indexed position of the least-significant set bit of
    ``w``, as a CASE ladder over (w & -w) — pure integer comparisons, so
    the rank function is identical on any engine (no log2/bin() float or
    string-format portability risk). w = 0 (hash div m exhausted) caps at
    the register width.
    """
    whens = "\n            ".join(
        f"WHEN ({w}) & (-({w})) = {1 << (j - 1)} THEN {j}"
        for j in range(1, _HLL_MAX_RHO)
    )
    return f"CASE WHEN ({w}) = 0 THEN {_HLL_MAX_RHO}\n            {whens} ELSE {_HLL_MAX_RHO} END"


def hll_raw_est_col(s_col: F.Column, v_col: F.Column) -> F.Column:
    """The RAW (unrounded) HLL estimate from a register aggregate
    (harmonic sum ``s``, empty-register count ``v``), including the
    small-range linear-counting correction — ONE copy of the estimator
    shape shared by every Spark-side consumer (display variants round
    or quantize this column once)."""
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / s_col
    return F.when(
        (raw <= 2.5 * HLL_M) & (v_col > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_col),
    ).otherwise(raw)


def hll_raw_est_sql(s: str = "s", v: str = "v") -> str:
    """The identical estimator as an ANSI-SQL CASE fragment — the one
    copy every oracle interpolates (callers wrap it in their own
    round/quantize)."""
    return f"""CASE
            WHEN {HLL_ALPHA * HLL_M * HLL_M!r} / {s} <= {2.5 * HLL_M}
                 AND {v} > 0
            THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / {v})
            ELSE {HLL_ALPHA * HLL_M * HLL_M!r} / {s} END"""


def hll_registers(keys: DataFrame, key_col: str) -> DataFrame:
    """(bucket, m_j) register table: max rank per bucket over seeded-hashed
    keys. ONE partial-aggregated shuffle of at most HLL_M cells — constant
    state regardless of key cardinality, the whole point of the sketch.

    Hash = one linear round then a SQUARING round mod p: the linear map
    alone leaves sequential keys' trailing-zero structure intact
    (arithmetic progressions → skewed rank statistics, ~50% estimate
    error measured); squaring is nonlinear bit mixing that stays exact
    BIGINT (h < 2^31 → h² < 2^62, ANSI-safe)."""
    a, b = minhash_coeffs(1, HLL_SEED)[0]
    h1 = f"(({key_col} * {a} + {b}) % {_MERSENNE_P})"
    h = f"(({h1} * {h1}) % {_MERSENNE_P})"
    w = f"({h} div {HLL_M})"
    return (
        keys.select(
            F.expr(f"{h} % {HLL_M}").alias("bucket"),
            F.expr(_rho_case_sql(w)).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row (est_distinct) from the register table.

    The harmonic sum adds exact powers of two (2^-m_j, m_j ≤ 26 → all
    exactly representable, total magnitude span < 53 bits), so it is
    EXACT and order-independent — the reason this float pipeline is still
    bit-identical across engines. Small-range correction (E ≤ 2.5m with
    empty registers → linear counting m·ln(m/V)) applies deterministically.
    """
    spark = registers.sparkSession
    allb = spark.range(HLL_M).select(F.col("id").alias("bucket"))
    full = allb.join(registers, "bucket", "left").select(
        F.coalesce("m_j", F.lit(0)).alias("m_j")
    )
    agg = full.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("s"),
        F.count_if(F.col("m_j") == 0).alias("v"),
    )
    est = hll_raw_est_col(F.col("s"), F.col("v"))
    return agg.select(F.round(est, 4).alias("est_distinct"))


def hll_oracle_sql(table: str, key_col: str) -> str:
    """DuckDB SQL computing the identical HLL estimate — same hash, rank
    ladder, register fold, harmonic sum, and corrections."""
    a, b = minhash_coeffs(1, HLL_SEED)[0]
    h1 = f"(({key_col} * {a} + {b}) % {_MERSENNE_P})"
    h = f"(({h1} * {h1}) % {_MERSENNE_P})"
    rho = _rho_case_sql(f"({h} // {HLL_M})")
    return f"""
        WITH regs AS (
            SELECT ({h} % {HLL_M}) AS bucket,
                   max({rho}) AS m_j
            FROM {table} GROUP BY 1
        ), filled AS (
            SELECT coalesce(r.m_j, 0) AS m_j
            FROM range({HLL_M}) t(bucket)
            LEFT JOIN regs r ON r.bucket = t.bucket
        ), agg AS (
            SELECT sum(pow(2.0, -m_j)) AS s,
                   count(*) FILTER (WHERE m_j = 0) AS v
            FROM filled
        )
        SELECT round({hll_raw_est_sql()}, 4) AS est_distinct
        FROM agg
    """


def hll_registers_by(keys: DataFrame, key_col: str, group_col: str) -> DataFrame:
    """Per-group HLL register tables: (group, bucket, m_j).

    Same hash/rank pipeline as :func:`hll_registers`, keyed by an extra
    group column — state is HLL_M cells PER GROUP, still constant in key
    cardinality. The registers are MERGEABLE: max over groups per bucket
    equals the registers of the union of the groups' key sets, which is
    the whole reason sketches beat exact distinct at scale (rollups
    re-aggregate sketch cells, never rescan data)."""
    a, b = minhash_coeffs(1, HLL_SEED)[0]
    h1 = f"(({key_col} * {a} + {b}) % {_MERSENNE_P})"
    h = f"(({h1} * {h1}) % {_MERSENNE_P})"
    w = f"({h} div {HLL_M})"
    return (
        keys.select(
            F.col(group_col).alias("grp"),
            F.expr(f"{h} % {HLL_M}").alias("bucket"),
            F.expr(_rho_case_sql(w)).alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_filled_registers_by(registers: DataFrame) -> DataFrame:
    """(grp, bucket, m_j) with every one of the HLL_M cells materialized
    (absent → 0): the shared grid-fill stage of the grouped estimator
    and of any register-level consumer (pairwise max-merge, rollup,
    intersection). Constant |groups| × HLL_M rows, SF-free."""
    spark = registers.sparkSession
    allb = spark.range(HLL_M).select(F.col("id").alias("bucket"))
    groups = registers.select("grp").distinct()
    # CROSSJOIN: fixed HLL_M-row bucket grid (constant)
    grid = groups.crossJoin(F.broadcast(allb))
    return grid.join(registers, ["grp", "bucket"], "left").select(
        "grp", "bucket", F.coalesce("m_j", F.lit(0)).alias("m_j")
    )


def hll_sv_agg(filled: DataFrame, *keys: str) -> DataFrame:
    """(*keys, s, v) harmonic-sum estimator state over filled register
    cells — s adds exact powers of two (order-independent, the
    cross-engine bit-parity argument in :func:`hll_estimate`), v counts
    empty registers (the linear-counting input)."""
    return filled.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("s"),
        F.count_if(F.col("m_j") == 0).alias("v"),
    )


def hll_estimate_by(registers: DataFrame) -> DataFrame:
    """(grp, est_distinct) from per-group register tables — the grouped
    twin of :func:`hll_estimate`, same exact-arithmetic harmonic sum and
    small-range correction per group."""
    agg = hll_sv_agg(hll_filled_registers_by(registers), "grp")
    est = hll_raw_est_col(F.col("s"), F.col("v"))
    return agg.select("grp", F.round(est, 4).alias("est_distinct"))


def hll_filled_sql_stages(table: str, key_col: str, group_col: str) -> str:
    """regs/groups/grid/filled CTE chain (DuckDB) producing the filled
    per-group register cells (grp, bucket, m_j) — the oracle twin of
    :func:`hll_filled_registers_by`, shared by the rollup and
    intersection oracles so the grid-fill convention has ONE source of
    truth on each engine side."""
    a, b = minhash_coeffs(1, HLL_SEED)[0]
    h1 = f"(({key_col} * {a} + {b}) % {_MERSENNE_P})"
    h = f"(({h1} * {h1}) % {_MERSENNE_P})"
    rho = _rho_case_sql(f"({h} // {HLL_M})")
    return f"""regs AS (
            SELECT {group_col} AS grp, ({h} % {HLL_M}) AS bucket,
                   max({rho}) AS m_j
            FROM {table} GROUP BY 1, 2
        ), groups AS (
            SELECT DISTINCT grp FROM regs
        ), grid AS (
            SELECT g.grp, t.bucket FROM groups g CROSS JOIN range({HLL_M}) t(bucket)
        ), filled AS (
            SELECT grid.grp, grid.bucket, coalesce(r.m_j, 0) AS m_j
            FROM grid LEFT JOIN regs r USING (grp, bucket)
        )"""


def hll_rollup_oracle_sql(table: str, key_col: str, group_col: str) -> str:
    """DuckDB SQL for the grouped + merged HLL rollup — identical hash,
    registers, per-group estimates, register-max merge, and corrections."""
    est_case = f"""round({hll_raw_est_sql()}, 4)"""
    return f"""
        WITH {hll_filled_sql_stages(table, key_col, group_col)}, agg AS (
            SELECT grp, sum(pow(2.0, -m_j)) AS s,
                   count(*) FILTER (WHERE m_j = 0) AS v
            FROM filled GROUP BY 1
        ), est AS (
            SELECT grp, {est_case} AS est_distinct FROM agg
        ), mregs AS (
            SELECT bucket, max(m_j) AS m_j FROM regs GROUP BY 1
        ), mfilled AS (
            SELECT coalesce(r.m_j, 0) AS m_j
            FROM range({HLL_M}) t(bucket) LEFT JOIN mregs r USING (bucket)
        ), magg AS (
            SELECT sum(pow(2.0, -m_j)) AS s,
                   count(*) FILTER (WHERE m_j = 0) AS v
            FROM mfilled
        ), mest AS (
            SELECT 'ALL' AS grp, TRUE AS is_total, {est_case} AS est_distinct
            FROM magg
        ), exact AS (
            SELECT {group_col} AS grp, FALSE AS is_total,
                   CAST(count(DISTINCT {key_col}) AS BIGINT) AS true_distinct
            FROM {table} GROUP BY 1
            UNION ALL
            SELECT 'ALL', TRUE, CAST(count(DISTINCT {key_col}) AS BIGINT)
            FROM {table}
        )
        SELECT u.grp, u.is_total, u.est_distinct, exact.true_distinct
        FROM (SELECT grp, FALSE AS is_total, est_distinct FROM est
              UNION ALL SELECT * FROM mest) u
        JOIN exact USING (grp, is_total)
    """


def hll_sliding_oracle_sql(
    table: str, key_col: str, ts_col: str, window_days: int
) -> str:
    """DuckDB SQL for the sliding-window register merge: per-day register
    tables max-merged over a trailing date range, estimated per day, with
    the exact windowed distinct beside it — identical hash/rank/merge/
    correction arithmetic to the Spark plan."""
    a, b = minhash_coeffs(1, HLL_SEED)[0]
    h1 = f"(({key_col} * {a} + {b}) % {_MERSENNE_P})"
    h = f"(({h1} * {h1}) % {_MERSENNE_P})"
    rho = _rho_case_sql(f"({h} // {HLL_M})")
    w = window_days - 1
    return f"""
        WITH day_regs AS (
            SELECT CAST({ts_col} AS DATE) AS d, ({h} % {HLL_M}) AS bucket,
                   max({rho}) AS m_j
            FROM {table} GROUP BY 1, 2
        ), days AS (
            SELECT DISTINCT CAST({ts_col} AS DATE) AS d FROM {table}
        ), grid AS (
            SELECT days.d, t.bucket
            FROM days CROSS JOIN range({HLL_M}) t(bucket)
        ), filled AS (
            SELECT g.d, g.bucket, coalesce(r.m_j, 0) AS m_j
            FROM grid g LEFT JOIN day_regs r
              ON r.d = g.d AND r.bucket = g.bucket
        ), merged AS (
            SELECT d, bucket,
                   max(m_j) OVER (
                       PARTITION BY bucket ORDER BY d
                       RANGE BETWEEN INTERVAL {w} DAY PRECEDING
                             AND CURRENT ROW
                   ) AS mm
            FROM filled
        ), agg AS (
            SELECT d, sum(pow(2.0, -mm)) AS s,
                   count(*) FILTER (WHERE mm = 0) AS v
            FROM merged GROUP BY d
        ), est AS (
            SELECT d, round({hll_raw_est_sql()}, 4)
                AS est_distinct
            FROM agg
        ), exact AS (
            SELECT days.d,
                   CAST(count(DISTINCT e.{key_col}) AS BIGINT)
                       AS exact_distinct
            FROM days JOIN {table} e
              ON CAST(e.{ts_col} AS DATE) BETWEEN
                 days.d - INTERVAL {w} DAY AND days.d
            GROUP BY days.d
        )
        SELECT CAST(est.d AS TIMESTAMP) AS day, est.est_distinct,
               exact.exact_distinct
        FROM est JOIN exact ON est.d = exact.d
    """
