"""Round-12 registrations (promoted from the round-12 preview bank):
the exact Mann-Whitney ROC AUC now lives in plans/ml_queries.py, the
Gini length-concentration and chi-squared token-source association in
plans/curation_queries.py, the 8-gram eval-set decontamination in
plans/text_queries.py, and the daily-count autocorrelation in
plans/analytics_queries.py as registered driver pairs. These tests
exercise the REGISTERED pair (the exact objects the driver sees) plus
the domain asserts, the pure-Python replays, and the constructed
known-value cases the generic oracle-parity sweep does not check.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.plans import QUERIES
from etl_earthquake_gcp_spark.plans.curation_queries import _CHI2_TOP
from etl_earthquake_gcp_spark.plans.text_queries import (
    _EVAL_DECON_MOD as _DECON_MOD,
    _EVAL_DECON_N as _DECON_N,
)
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR
from .conftest import run_registered_pair as _run_pair

# registered query callables (also imported by tests/test_bank_plans.py)
roc_auc_exact = QUERIES["roc_auc_exact"].spark_fn
gini_concentration = QUERIES["gini_concentration"].spark_fn
ngram_decontaminate = QUERIES["ngram_decontaminate"].spark_fn
acf_daily_counts = QUERIES["acf_daily_counts"].spark_fn
chi2_token_source = QUERIES["chi2_token_source"].spark_fn

# -- roc_auc_exact -----------------------------------------------------------


def test_roc_auc_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "roc_auc_exact")
    assert len(spdf) == 1
    assert 0.0 <= spdf["auc"].iloc[0] <= 1.0


def test_roc_auc_matches_pairwise_definition(spark):
    """AUC == P(score_pos > score_neg) + 0.5*P(tie), brute-forced over
    all pos x neg pairs on the small frame — pins the histogram-window
    formulation to the textbook definition."""
    import itertools

    e = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("event_type", "value")
        .toPandas()
    )
    pos = e[e["event_type"] == "purchase"]["value"].tolist()
    neg = e[e["event_type"] == "click"]["value"].tolist()
    if len(pos) * len(neg) > 2_000_000:
        import pytest

        pytest.skip("pairwise brute force is for the sf0.001 frame only")
    wins = ties = 0
    for p, n in itertools.product(pos, neg):
        if p > n:
            wins += 1
        elif p == n:
            ties += 1
    expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
    got = roc_auc_exact(spark, SF_DIR).toPandas()["auc"].iloc[0]
    assert abs(got - expect) < 1e-6


# -- gini_concentration ------------------------------------------------------


def test_gini_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "gini_concentration")
    assert len(spdf) > 0
    # Gini of a finite sample lies in [0, 1)
    assert ((spdf["gini"] >= 0) & (spdf["gini"] < 1)).all()


def test_gini_known_values(spark):
    """Uniform lengths -> 0; one doc owns everything -> (n-1)/n."""
    df = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 100), (3, "u", 100), (4, "u", 100),
         (5, "k", 0), (6, "k", 0), (7, "k", 0), (8, "k", 1000)],
        "doc_id long, source string, n_chars long",
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = df.select(
        "source", F.col("n_chars").alias("x"),
        F.row_number().over(w).alias("rk"),
    )
    s = r.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("tot"),
        F.sum(F.col("rk") * F.col("x")).cast("long").alias("ls"),
    ).collect()
    got = {
        row["source"]: (2 * row["ls"] - (row["n"] + 1) * row["tot"])
        / (row["n"] * row["tot"])
        for row in s
    }
    assert got["u"] == 0.0
    assert abs(got["k"] - 3 / 4) < 1e-12


# -- ngram_decontaminate -----------------------------------------------------


def test_ngram_decontaminate_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "ngram_decontaminate")
    # the synthetic corpus repeats template sentences across docs, so
    # some contamination must be found (and shares are valid ratios)
    assert len(spdf) > 0
    assert ((spdf["hit_share"] > 0) & (spdf["hit_share"] <= 1)).all()
    assert (spdf["doc_id"] % _DECON_MOD != 0).all()


def test_ngram_decontaminate_matches_python_replay(spark):
    """Full-result replay in pure Python: distinct n-gram sets per doc,
    the doc_id-mod eval shard, hit counting against the eval union, one
    display round — independent of the Spark broadcast join and the
    oracle CTEs."""
    from decimal import ROUND_HALF_UP, Decimal

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    )
    gram_sets = {}
    for r in docs:
        toks = r.text.split(" ")
        if len(toks) < _DECON_N:
            continue
        gram_sets[r.doc_id] = {
            " ".join(toks[i : i + _DECON_N])
            for i in range(len(toks) - _DECON_N + 1)
        }
    eval_union = set()
    for did, gs in gram_sets.items():
        if did % _DECON_MOD == 0:
            eval_union |= gs
    expected = {}
    for did, gs in gram_sets.items():
        if did % _DECON_MOD == 0:
            continue
        n_hit = sum(1 for g in gs if g in eval_union)
        if n_hit > 0:
            share = float(
                Decimal(repr(n_hit * 1.0 / len(gs))).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP
                )
            )
            expected[did] = (len(gs), n_hit, share)
    spdf = ngram_decontaminate(spark, SF_DIR).toPandas()
    got = {
        int(r.doc_id): (int(r.n_grams), int(r.n_hit), r.hit_share)
        for r in spdf.itertuples()
    }
    assert got == expected


# -- acf_daily_counts --------------------------------------------------------


def test_acf_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "acf_daily_counts")
    assert len(spdf) == 3
    assert ((spdf["acf"] >= -1.000001) & (spdf["acf"] <= 1.000001)).all()


def test_acf_matches_python_replay(spark):
    """Full-result replay in pure Python: the daily Counter, the exact
    integer scaled residuals n*c - S, date-keyed lag pairs, and the one
    display round — independent of both the Spark lag join and the
    oracle CTEs."""
    import datetime as dt
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    days = [
        r.d
        for r in load_table(spark, SF_DIR, "events")
        .select(F.col("ts").cast("date").alias("d"))
        .collect()
    ]
    daily = Counter(days)
    n, s = len(daily), sum(daily.values())
    res = {d: n * c - s for d, c in daily.items()}
    den = sum(v * v for v in res.values())
    expected = {}
    for lag in (1, 2, 3):
        pairs = [
            (v, res[d + dt.timedelta(days=lag)])
            for d, v in res.items()
            if d + dt.timedelta(days=lag) in res
        ]
        num = sum(x * y for x, y in pairs)
        if den > 0:
            acf = (
                float(
                    Decimal(repr(num * 1.0 / den)).quantize(
                        Decimal("0.000001"), ROUND_HALF_UP
                    )
                )
                + 0.0
            )
            expected[lag] = (num, den, len(pairs), acf)
    spdf = acf_daily_counts(spark, SF_DIR).toPandas()
    got = {
        int(r.lag): (int(r.num), int(r.den), int(r.n_pairs), r.acf)
        for r in spdf.itertuples()
    }
    assert got == expected


# -- chi2_token_source -------------------------------------------------------


def test_chi2_oracle_parity(spark, oracle):
    spdf = _run_pair(spark, oracle, "chi2_token_source")
    assert len(spdf) == _CHI2_TOP
    assert (spdf["chi2_units"] >= 0).all()


def test_chi2_constructed_uniform_vs_concentrated(spark, tmp_path):
    """Pins the statistic on a constructed corpus: a token spread across
    two equal sources exactly in proportion (O*N == R*C in every cell)
    must score chi2 = 0, and a token fully concentrated in one source
    must score its closed-form value (here exactly 20.0: each of the
    two cells contributes d^2/(N*R*C) = 2000^2/(200*20*100) = 10)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fillers_u = " ".join(f"fu{i}" for i in range(90))
    fillers_k = " ".join(f"fk{i}" for i in range(70))
    text_u = " ".join(["even"] * 10) + " " + fillers_u  # 100 tokens
    text_k = (
        " ".join(["even"] * 10) + " " + " ".join(["conc"] * 20)
        + " " + fillers_k
    )  # 100 tokens
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([text_u, text_k]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["u-src", "k-src"]),
            "n_chars": pa.array(
                [len(text_u), len(text_k)], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    pdf = chi2_token_source(spark, str(tmp_path)).toPandas()
    by_tok = pdf.set_index("token")
    assert by_tok.loc["even", "chi2_units"] == 0
    assert abs(by_tok.loc["conc", "chi2"] - 20.0) < 1e-6
    assert by_tok.loc["conc", "dof"] == 1  # two sources
