"""Unit tests for the model-evaluation operators on handcrafted inputs
with known closed-form answers; sf-scale hash parity is covered by the
DuckDB oracles in catalog_eval."""

from __future__ import annotations

from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.operators.evaluation import (
    auc_by_group,
    calibration_bins,
    correlation_pairs,
    ols_fit,
)


def test_auc_perfect_and_reversed_and_ties(spark):
    rows = (
        # group 'p': perfect separation -> AUC 1
        [("p", 10, 1), ("p", 9, 1), ("p", 1, 0), ("p", 2, 0)]
        # group 'r': perfectly reversed -> AUC 0
        + [("r", 1, 1), ("r", 10, 0)]
        # group 't': all scores tie -> AUC 1/2
        + [("t", 5, 1), ("t", 5, 0), ("t", 5, 1), ("t", 5, 0)]
        # group 'n': no negatives -> NULL
        + [("n", 3, 1), ("n", 4, 1)]
    )
    df = spark.createDataFrame(rows, "g string, s long, y long")
    got = {r.g: r for r in auc_by_group(df, "g", "s", "y").collect()}
    assert got["p"].auc_ppm == 1_000_000
    assert got["r"].auc_ppm == 0
    assert got["t"].auc_ppm == 500_000
    assert got["n"].auc_ppm is None and got["n"].n_neg == 0


def test_auc_mixed_matches_pair_enumeration(spark):
    # scores: pos {3, 5}, neg {3, 4} -> pairs: (3,3) tie=.5, (3,4) 0,
    # (5,3) 1, (5,4) 1 -> AUC = 2.5/4 = 0.625
    rows = [("g", 3, 1), ("g", 5, 1), ("g", 3, 0), ("g", 4, 0)]
    df = spark.createDataFrame(rows, "g string, s long, y long")
    [r] = auc_by_group(df, "g", "s", "y").collect()
    assert r.auc_ppm == 625_000


def test_calibration_bins_exact_rates(spark):
    # bin 0 = [0, 100000): scores 0 and 99999, one pos of two -> rate 500000
    # top bin via clamp: score exactly 1e6 lands in bin 9, pos -> 1e6
    rows = [(0, 1), (99_999, 0), (1_000_000, 1)]
    df = spark.createDataFrame(rows, "score long, y long")
    got = {r.bin: r for r in calibration_bins(df, "score", "y", 10).collect()}
    assert got[0].n == 2 and got[0].pos_rate_ppm == 500_000
    assert got[0].avg_score_ppm == 49_999
    assert got[0].gap_ppm == 450_001
    assert got[9].n == 1 and got[9].pos_rate_ppm == 1_000_000


def test_correlation_exact_and_degenerate(spark):
    # y = 2x -> corr exactly 1.0; z constant -> NULL (not NaN)
    rows = [(1, 2, 7), (2, 4, 7), (3, 6, 7), (4, 8, 7)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = {(r.feat_x, r.feat_y): r for r in correlation_pairs(df, ["x", "y", "z"]).collect()}
    # sqrt(va)*sqrt(vb) carries one rounding step, so corr is 1.0 only
    # to within an ulp — the oracle matches because BOTH engines round
    # the same IEEE way, not because the value is exactly 1.
    assert abs(got[("x", "y")].corr - 1.0) < 1e-12
    assert got[("x", "z")].corr is None
    assert got[("y", "z")].corr is None
    assert all(r.n == 4 for r in got.values())


def test_ols_fit_recovers_exact_line(spark):
    # y = 3x + 1 exactly -> slope 3.0, intercept 1.0; constant-x group NULL
    rows = [("a", 1, 4), ("a", 2, 7), ("a", 3, 10), ("b", 5, 9), ("b", 5, 11)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in ols_fit(df, "g", "x", "y").collect()}
    assert got["a"].slope == 3.0 and got["a"].intercept == 1.0
    assert got["b"].slope is None and got["b"].intercept is None


def test_auc_plan_aggregates_before_window(spark):
    # The window input must be the per-distinct-score aggregate, not raw
    # rows: assert the plan has a partial aggregate below the Window.
    df = spark.createDataFrame(
        [("g", i % 7, i % 2) for i in range(100)], "g string, s long, y long"
    )
    plan = auc_by_group(df, "g", "s", "y")._jdf.queryExecution().executedPlan().toString()
    # plans print top-down: an aggregate BELOW the window appears after it
    assert plan.rindex("HashAggregate") > plan.index("Window")
