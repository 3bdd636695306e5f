"""ML pipeline queries — SURVEY.md §2 tier 3 (train_tsunami_model.py parity).

The reference trains VectorAssembler → StandardScaler → RandomForest on
earthquake features to predict ``tsunami_warning`` (train_tsunami_model.py:
74-77), balancing classes by downsampling the majority (O3/O4, :59-66),
80/20 split seed 42 (O5, :80), and emits a predictions table (:107-113).

Re-targeted at the driver testdata: label = high-value event
(``value > 50``) on the ``events`` table; same pipeline shape, same seeds.
Non-SQL-expressible → rows-only driver checks (SURVEY §5.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import portable_hash8, quantized_half_away
from ..ml.classifier import predictions_table, train_classifier
from ..sources.tables import load_table
from .registry import register


def _labeled_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature/label frame mirroring train_tsunami_model.py:48-70."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        (F.col("value") > 50).alias("high_value"),  # ≈ tsunami_warning
        F.col("value").alias("f_value"),
        F.hour("ts").cast("double").alias("f_hour"),
        F.dayofweek("ts").cast("double").alias("f_dow"),
        F.get_json_object("props", "$.k").cast("double").alias("f_k"),
        (F.col("user_id") % 100).cast("double").alias("f_user_mod"),
    ).na.drop()


@register(
    "ml_predictions",
    oracle=None,  # model output — rows-only driver check (SURVEY §5.1)
    doc="MLlib pipeline parity (train_tsunami_model.py): balance by "
    "downsample (seed 42) → VectorAssembler → StandardScaler → RandomForest "
    "→ predictions table (event_id, actual, predicted, probability).",
)
def ml_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    labeled = _labeled_events(spark, sf_dir)
    model, test = train_classifier(labeled, label_col="high_value")
    return predictions_table(model, test, id_col="event_id", label_col="high_value")


@register(
    "ml_class_balance",
    oracle="""
        SELECT value > 50 AS high_value, CAST(count(*) AS BIGINT) AS n
        FROM events
        WHERE value IS NOT NULL AND props IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1
    """,
    doc="class-balance census feeding the downsample ratio "
    "(train_tsunami_model.py:59-63) — the SQL-expressible half of the ML "
    "job, oracle-checked.",
)
def ml_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(
            F.col("value").isNotNull()
            & F.col("props").isNotNull()
            & F.col("ts").isNotNull()
        )
        .groupBy((F.col("value") > 50).alias("high_value"))
        .agg(F.count("*").alias("n"))
    )


# Knuth multiplicative hash split (same portable-arithmetic pattern as
# deterministic_hash_sample): both engines can compute membership exactly,
# unlike randomSplit whose row assignment depends on partition layout.
_SPLIT_A = 2654435761
_SPLIT_P = 2147483647


@register(
    "ml_accuracy_audit",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS n_test, TRUE AS acc_ok
        FROM events
        WHERE value IS NOT NULL AND ts IS NOT NULL
          AND event_id IS NOT NULL AND user_id IS NOT NULL
          AND TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)
              IS NOT NULL
          AND (event_id * {_SPLIT_A}) % {_SPLIT_P} % 5 = 0
    """,
    doc="oracle-checkable audit of the MLlib classifier (the "
    "ann_recall_audit pattern applied to ML): a DETERMINISTIC arithmetic-"
    "hash 20% holdout (portable to SQL, unlike randomSplit whose row "
    "assignment depends on partition layout) is scored by the trained "
    "RandomForest; emits the exact holdout size plus acc_ok asserting "
    "accuracy >= 0.8 (the label is a threshold of a feature, so a "
    "functioning pipeline scores ~1.0 and a broken one ~0.5). The oracle "
    "recomputes n_test row-for-row and expects TRUE — the hard-signal "
    "companion to ml_predictions' rows-only check.",
)
def ml_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    labeled = _labeled_events(spark, sf_dir)
    is_test = ((F.col("event_id") * _SPLIT_A) % _SPLIT_P) % 5 == 0
    train = labeled.filter(~is_test)
    test = labeled.filter(is_test)
    model, _ = train_classifier(train, label_col="high_value")
    pred = predictions_table(
        model, test, id_col="event_id", label_col="high_value"
    )
    return pred.agg(
        F.count("*").alias("n_test"),
        (
            F.avg((F.col("predicted") == F.col("actual")).cast("double"))
            >= 0.8
        ).alias("acc_ok"),
    )


_FP_MIN_SUPPORT = 0.02


@register(
    "fpgrowth_brand_itemsets",
    oracle=f"""
        WITH b AS (
            SELECT DISTINCT l_orderkey, p_brand
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ), nb AS (
            SELECT count(DISTINCT l_orderkey) AS n FROM b
        ), singles AS (
            SELECT p_brand AS itemset, CAST(count(*) AS BIGINT) AS freq
            FROM b GROUP BY 1
        ), pairs AS (
            SELECT a.p_brand || '+' || c.p_brand AS itemset,
                   CAST(count(*) AS BIGINT) AS freq
            FROM b a JOIN b c
              ON a.l_orderkey = c.l_orderkey AND a.p_brand < c.p_brand
            GROUP BY 1
        )
        SELECT itemset, freq
        FROM (SELECT * FROM singles UNION ALL SELECT * FROM pairs)
        CROSS JOIN nb
        WHERE freq >= {_FP_MIN_SUPPORT} * n
    """,
    doc=f"frequent-itemset mining with MLlib FP-Growth (minSupport="
    f"{_FP_MIN_SUPPORT}) over per-order brand baskets — market-basket "
    "analysis, a NEW MLlib surface beyond the classifier/KMeans. "
    "FP-Growth is exact (not sampled), so itemsets of size <= 2 are "
    "verifiable against plain SQL counts — the rare case of an MLlib "
    "algorithm holding a full DuckDB oracle. Itemsets emitted as "
    "sort-joined strings (never array columns — comparator contract); "
    "the same >= minSupport * n double comparison on both engines.",
)
def fpgrowth_brand_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.fpm import FPGrowth

    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    baskets = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("items"))
    )
    model = FPGrowth(
        itemsCol="items", minSupport=_FP_MIN_SUPPORT, minConfidence=0.1
    ).fit(baskets)
    return (
        model.freqItemsets.filter(F.size("items") <= 2)
        .select(
            F.concat_ws("+", F.array_sort("items")).alias("itemset"),
            F.col("freq").cast("long").alias("freq"),
        )
    )


# --------------------------------------------------------------------------
# group-aware deterministic train/val/test split
# --------------------------------------------------------------------------

_SPLIT_VAL_PCT = 20  # hash buckets 0-19 -> val
_SPLIT_TEST_PCT = 20  # hash buckets 20-39 -> test


@register(
    "group_shuffle_split",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, n_chars, source,
                   CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT)
                       % 100 AS bucket
            FROM documents
        ), tagged AS (
            SELECT *,
                   CASE WHEN bucket < {_SPLIT_VAL_PCT} THEN 'val'
                        WHEN bucket < {_SPLIT_VAL_PCT + _SPLIT_TEST_PCT}
                            THEN 'test'
                        ELSE 'train' END AS split
            FROM keyed
        )
        SELECT split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_groups,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               round(avg(n_chars), 2) AS avg_chars
        FROM tagged GROUP BY split
    """,
    doc="GroupShuffleSplit (scikit-learn semantics, distributed): every doc "
    "of a source lands in exactly ONE of train/val/test — the split that "
    "prevents within-group leakage between train and eval (the standard "
    "requirement for web-crawl corpora where near-dups cluster by site). "
    "Assignment = first 8 hex digits of md5(source) mod 100: deterministic, "
    "engine-portable (no rand()), stable under corpus growth — adding docs "
    "never moves an existing group across splits. Scale shape: one scan, "
    "a map-side hash per row, one small agg; the split column would "
    "normally feed partitionBy() at write time — no shuffle at all before "
    "the final 3-row summary.",
)
def group_shuffle_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = portable_hash8(F.col("source")) % 100
    split = (
        F.when(bucket < _SPLIT_VAL_PCT, "val")
        .when(bucket < _SPLIT_VAL_PCT + _SPLIT_TEST_PCT, "test")
        .otherwise("train")
    )
    return (
        docs.select("doc_id", "n_chars", "source", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("source").alias("n_groups"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


@register(
    "ml_lag_features",
    oracle="""
        WITH daily AS (
            -- v_u: the daily mean in EXACT integer 1e-6 units. Rounding a
            -- raw float once is ulp-safe, but RE-rounding the already-6dp
            -- v at 4dp is not: a v ending in ...x50 sits exactly on the
            -- 4dp half boundary, where Spark rounds the shortest decimal
            -- repr (-> up) and DuckDB the binary value just below
            -- (-> down). All 6dp->4dp steps below are therefore integer
            -- arithmetic: half-away = (|v_u| + 50) // 100 with the sign
            -- reapplied — bit-exact in both engines, and identical to the
            -- old round(v, 4) everywhere off the boundary.
            SELECT user_id, CAST(ts AS DATE) AS d,
                   CAST(round(avg(value) * 1000000, 0) AS BIGINT) AS v_u,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), feat AS (
            SELECT user_id, d, v_u, n,
                   row_number() OVER w AS rn,
                   lag(v_u, 1) OVER w AS lag1_u,
                   lag(v_u, 7) OVER w AS lag7_u,
                   sum(v_u) OVER (
                       w ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
                   ) AS trail7_sum_u,
                   max(v_u) OVER (
                       w ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
                   ) AS trail7_max_u
            FROM daily
            WINDOW w AS (PARTITION BY user_id ORDER BY d)
        )
        -- trail7_mean from the EXACT integer frame sum (frame is always
        -- 7 rows under rn > 7): value*1e4 = sum_u/700, displayed
        -- half-away as (2|s|+700)//1400 — an avg of quantized values can
        -- itself land exactly on the 4dp boundary when 7 | sum_u
        SELECT user_id, CAST(d AS TIMESTAMP) AS day,
               sign(v_u) * ((abs(v_u) + 50) // 100) / 10000.0 AS target,
               sign(lag1_u) * ((abs(lag1_u) + 50) // 100) / 10000.0 AS lag1,
               sign(lag7_u) * ((abs(lag7_u) + 50) // 100) / 10000.0 AS lag7,
               sign(trail7_sum_u) * ((2 * abs(trail7_sum_u) + 700) // 1400)
                   / 10000.0 + 0.0 AS trail7_mean,
               sign(trail7_max_u) * ((abs(trail7_max_u) + 50) // 100)
                   / 10000.0 AS trail7_max,
               n AS n_events
        FROM feat
        WHERE rn > 7
    """,
    doc="feature-store lag features for forecasting models: per (user, "
    "day) target plus lag-1, lag-7, and LEAKAGE-SAFE 7-day trailing "
    "mean/max (frame ends at 1 PRECEDING — the current day never leaks "
    "into its own features; rows without a full history are dropped, "
    "the standard training-matrix hygiene). Facts reduce to the daily "
    "grid first; all windows share one user_id exchange. The daily mean "
    "travels as an exact integer 1e-6-unit BIGINT and every 4dp display "
    "is integer half-away arithmetic (the 6dp->4dp double re-round is "
    "engine-divergent on ...x50 boundaries — r5 hardening).",
)
def ml_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # daily mean carried as EXACT integer 1e-6 units (v_u BIGINT): the
    # 6dp->4dp display step is integer half-away arithmetic on both
    # engines — re-rounding an already-6dp double at 4dp hits the exact
    # half boundary whenever v ends in ...x50, where Spark (shortest
    # decimal repr) rounds up and DuckDB (binary value) rounds down.
    # Found by the r5 value-permutation rehearsal; off the boundary the
    # outputs are identical to the old round(v, 4).
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.round(F.avg("value") * 1_000_000, 0).cast("long").alias("v_u"),
        F.count("*").alias("n"),
    )

    def disp4(col: str):  # 1e-6 units -> half-away 4dp double, exactly
        return quantized_half_away(col, unit=100, out_scale=10_000.0)

    w = Window.partitionBy("user_id").orderBy("d")
    w_trail = w.rowsBetween(-7, -1)
    feat = daily.select(
        "user_id",
        "d",
        "v_u",
        "n",
        F.row_number().over(w).alias("rn"),
        F.lag("v_u", 1).over(w).alias("lag1_u"),
        F.lag("v_u", 7).over(w).alias("lag7_u"),
        # exact integer frame sum — an avg of quantized values can land
        # exactly on the 4dp boundary when 7 | sum_u (2 such rows in the
        # current testdata), so the mean display is the rational
        # half-away sum_u/700, never a float re-round
        F.sum("v_u").over(w_trail).alias("trail7_sum_u"),
        F.max("v_u").over(w_trail).alias("trail7_max_u"),
    )
    return feat.filter(F.col("rn") > 7).select(
        "user_id",
        F.col("d").cast("timestamp").alias("day"),
        disp4("v_u").alias("target"),
        disp4("lag1_u").alias("lag1"),
        disp4("lag7_u").alias("lag7"),
        (
            F.signum("trail7_sum_u")
            * F.expr("div(2 * abs(trail7_sum_u) + 700, 1400)")
            / F.lit(10_000.0)
            + F.lit(0.0)
        ).alias("trail7_mean"),
        disp4("trail7_max_u").alias("trail7_max"),
        F.col("n").alias("n_events"),
    )


@register(
    "roc_auc_exact",
    oracle="""
    WITH lab AS (
        SELECT value AS v,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
        WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    ), h AS (
        SELECT v, CAST(sum(y) AS BIGINT) AS np,
               CAST(count(*) - sum(y) AS BIGINT) AS nn
        FROM lab GROUP BY v
    ), w AS (
        SELECT v, np, nn,
               CAST(coalesce(sum(nn) OVER (
                   ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS nn_below
        FROM h
    )
    SELECT CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(nn) AS BIGINT) AS n_neg,
           CAST(2 * sum(np * nn_below) + sum(np * nn) AS BIGINT) AS u2,
           round((2 * sum(np * nn_below) + sum(np * nn)) * 1.0
                 / (2 * sum(np) * sum(nn)), 6) AS auc
    FROM w
    HAVING sum(np) > 0 AND sum(nn) > 0
    """,
    doc="exact Mann-Whitney ROC AUC of `value` as a purchase-vs-click "
    "ranking score — the hash-green exact sibling of the MLlib "
    "BinaryClassificationEvaluator's binned curve AUC (which is "
    "approximate by construction, numBins). Ranking raw doubles is a "
    "pure order statistic (permutation-invariant, no rounding hazard); "
    "U is computed over the distinct-VALUE histogram with integer "
    "tied-rank arithmetic — we carry 2U so ties stay integer, and the "
    "single display round is the accepted one-ratio double class. "
    "Overflow: 2U < 2*n_pos*n_neg, inside BIGINT while n_pos*n_neg "
    "< 4.6e18 (~2e9 events per class — beyond the driver scales). "
    "Scale: the facts reduce to the value histogram in one groupBy; "
    "the unpartitioned running-sum window then runs on that histogram, "
    "not the facts (plan-pinned in tests/test_bank_plans.py). For a "
    "CONTINUOUS score at 100 TB the histogram itself grows ~ |facts|, "
    "so the certified scale path is fixed-width score binning before "
    "the groupBy (the MLlib evaluator's own numBins strategy — AUC is "
    "then exact on the binned scores); the registered form is the "
    "exact-on-raw-scores baseline. A degenerate input with an empty "
    "purchase or click class is excluded symmetrically on both engines "
    "(HAVING / filter n_pos > 0 AND n_neg > 0, the den>0 house style) "
    "rather than emitting an engine-dependent NULL/NaN ratio row "
    "(r12 ADVICE). Reference has no counterpart.",
)
def roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    lab = e.filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    ).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    h = lab.groupBy("v").agg(
        F.sum("y").cast("long").alias("np"),
        (F.count("*") - F.sum("y")).cast("long").alias("nn"),
    )
    w_below = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w = h.withColumn(
        "nn_below",
        F.coalesce(F.sum("nn").over(w_below), F.lit(0)).cast("long"),
    )
    return w.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        (2 * F.sum(F.col("np") * F.col("nn_below"))
         + F.sum(F.col("np") * F.col("nn"))).cast("long").alias("u2"),
        F.round(
            (2 * F.sum(F.col("np") * F.col("nn_below"))
             + F.sum(F.col("np") * F.col("nn")))
            * 1.0
            / (2 * F.sum("np") * F.sum("nn")),
            6,
        ).alias("auc"),
    ).filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))


_KFOLD_K = 5  # folds in the deterministic CV split


@register(
    "kfold_assign_audit",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cv'),
                                    1, 8)) AS BIGINT) % {_KFOLD_K} AS fold
        FROM documents
    ), cells AS (
        SELECT fold, source, CAST(count(*) AS BIGINT) AS n_docs
        FROM assigned GROUP BY 1, 2
    ), totals AS (
        SELECT fold, CAST(sum(n_docs) AS BIGINT) AS fold_total
        FROM cells GROUP BY 1
    ), corpus AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS n_all FROM cells
    )
    SELECT c.fold, c.source, c.n_docs, t.fold_total,
           round(t.fold_total * 1.0 / x.n_all, 6) AS fold_share
    FROM cells c JOIN totals t USING (fold) CROSS JOIN corpus x
    """,
    doc=f"deterministic {_KFOLD_K}-fold cross-validation assignment "
    "audit: fold = portable md5-hash8(doc_id:cv) % k — no RNG state, "
    "any engine replays every row's fold (the group_shuffle_split / "
    "epoch_shuffle_ranges hash-split family). Emits the per-(fold, "
    "source) cell counts plus each fold's total and corpus share: the "
    "balance check a CV split needs before training. Scale: one "
    "map-side fold-key projection + one groupBy reduce the facts to "
    "the k x |sources| cell frame; totals and the 1-row corpus count "
    "run on that frame. The single display ratio divides two exact "
    "BIGINTs. Reference splits 80/20 via randomSplit "
    "(train_tsunami_model.py:80) — this is the deterministic, "
    "resumable version of that protocol generalized to k folds.",
)
def kfold_assign_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "source",
        (
            portable_hash8(
                F.concat(F.col("doc_id").cast("string"), F.lit(":cv"))
            )
            % _KFOLD_K
        ).alias("fold"),
    )
    # PERSIST: k x |sources| cell frame (SF-free once every cell is
    # hit) — read by the fold totals, the corpus total, and the final
    # join; session-LRU lifetime
    cells = assigned.groupBy("fold", "source").agg(
        F.count("*").cast("long").alias("n_docs")
    ).persist()
    totals = cells.groupBy("fold").agg(
        F.sum("n_docs").cast("long").alias("fold_total")
    )
    corpus = cells.agg(F.sum("n_docs").cast("long").alias("n_all"))
    # broadcast sides: the |folds|-row totals dim and the 1-row corpus
    # total — both bounded independently of data scale
    return (
        cells.join(F.broadcast(totals), "fold")
        # CROSSJOIN: 1-row corpus-total frame fans out onto the
        # k x |sources| cell dim
        .crossJoin(F.broadcast(corpus))
        .select(
            "fold",
            "source",
            "n_docs",
            "fold_total",
            F.round(F.col("fold_total") * 1.0 / F.col("n_all"), 6).alias(
                "fold_share"
            ),
        )
    )


# --------------------------------------------------------------------------
# Round-14 registration: exact market-basket pair mining (promoted from
# tests/test_round14_previews.py — the oracle-paired exact sibling of
# this module's FPGrowth association query)
# --------------------------------------------------------------------------

_BASKET_TOP = 50
_BASKET_MINSUP = 2


@register(
    "basket_pair_rules",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), part_n AS (
        SELECT p, CAST(count(*) AS BIGINT) AS n_p
        FROM items GROUP BY 1
    ), frequent AS (
        SELECT i.o, i.p FROM items i
        JOIN part_n pn ON pn.p = i.p
        WHERE pn.n_p >= {_BASKET_MINSUP}
    ), n_orders AS (
        SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM items
    ), pairs AS (
        SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS supp
        FROM frequent a JOIN frequent b
          ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2
    )
    SELECT p.p1, p.p2, p.supp, na.n_p AS n_p1, nb.n_p AS n_p2,
           ((2 * p.supp * 1000000 + na.n_p) // (2 * na.n_p))
               / 1000000.0 AS conf1,
           ((2 * p.supp * o.n * 1000000 + na.n_p * nb.n_p)
               // (2 * na.n_p * nb.n_p)) / 1000000.0 AS lift6
    FROM pairs p
    JOIN part_n na ON na.p = p.p1
    JOIN part_n nb ON nb.p = p.p2
    CROSS JOIN n_orders o
    ORDER BY p.supp DESC, p.p1, p.p2
    LIMIT {_BASKET_TOP}
    """,
    doc="market-basket pair mining over lineitem — the exact, "
    f"oracle-paired sibling of the FPGrowth query above: distinct "
    f"(order, part) baskets, the a-priori frequent-item PREFILTER "
    f"(parts in >= {_BASKET_MINSUP} orders — an infrequent item can "
    "never form a frequent pair, so the quadratic pair stage only "
    "sees filtered baskets), within-order part pairs, "
    f"support/confidence/lift, deterministic top-{_BASKET_TOP} by "
    "(support DESC, p1, p2). conf1/lift6 are integer half-away "
    "1e-6-unit quantities on both engines, never float rounds: part "
    "marginals are SF-INVARIANT small integers (measured max ~50 at "
    "every testdata decade — parts and lineitems both scale with SF), "
    "so while conf1's denominator n_p1 < 128 can never form a 6dp "
    "half boundary, lift6's PRODUCT denominator n_p1*n_p2 <= ~3600 "
    "reaches the 2^7*5^b grid (128 = 4*32, 640 = 16*40, ...) at "
    "material rates — the r14 boundary-hazard class (see "
    "interarrival_cv); integer division closes it for both ratios. "
    "Overflow: 2*supp*n_orders*1e6 < 2^63 holds to n_orders ~ 7.6e10 "
    "(supp bounded by the ~60 marginal cap); beyond, widen the lift "
    "numerator to DECIMAL(38,0)/HUGEINT (the EMD pattern). Scale: the "
    "per-order pair explode is bounded by basket size squared — the "
    "honest market-basket cost — and everything else is one groupBy "
    "each; the part-marginal joins stay UNHINTED per the r7 broadcast "
    "audit rule (part counts scale with SF — stats/AQE pick broadcast "
    "at small SF and shuffle at scale), only the 1-row order census "
    "is pinned. TakeOrderedAndProject handles the top-k. Reference "
    "has no counterpart.",
)
def basket_pair_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        # PERSIST: distinct (order, part) basket frame — <= |lineitem|
        # rows at 16 B each (two BIGINTs; a fraction of the fact
        # bytes) — read FOUR times: the part marginals, the order
        # census, and both pair-join sides; session-LRU lifetime
        .persist()
    )
    part_n = items.groupBy("p").agg(
        F.count("*").cast("long").alias("n_p")
    )
    # part marginals scale with SF: NO broadcast hint anywhere on
    # part_n (r7 audit rule) — stats/AQE choose the strategy per scale
    frequent = items.join(
        part_n.filter(F.col("n_p") >= _BASKET_MINSUP), "p"
    ).select("o", "p")
    n_orders = items.select("o").distinct().agg(
        F.count("*").cast("long").alias("n")
    )
    a = frequent.select("o", F.col("p").alias("p1"))
    b = frequent.select("o", F.col("p").alias("p2"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("long").alias("supp"))
    )
    na = part_n.select(F.col("p").alias("p1"), F.col("n_p").alias("n_p1"))
    nb = part_n.select(F.col("p").alias("p2"), F.col("n_p").alias("n_p2"))
    return (
        pairs.join(na, "p1")
        .join(nb, "p2")
        # CROSSJOIN: 1-row order census onto the pair frame — bounded
        .crossJoin(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "supp",
            "n_p1",
            "n_p2",
            # integer half-away 1e-6-unit ratios (see the
            # boundary-hazard note in the doc): never a float round
            (
                F.expr("(2 * supp * 1000000 + n_p1) div (2 * n_p1)")
                / F.lit(1_000_000.0)
            ).alias("conf1"),
            (
                F.expr(
                    "(2 * supp * n * 1000000 + n_p1 * n_p2)"
                    " div (2 * n_p1 * n_p2)"
                )
                / F.lit(1_000_000.0)
            ).alias("lift6"),
        )
        .orderBy(F.desc("supp"), "p1", "p2")
        .limit(_BASKET_TOP)
    )
