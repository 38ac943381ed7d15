"""Pinned unit tests for the seventh r10 batch (x101–x102):
calibration/lift table and threshold-free classifier metrics. Oracle
twins swept by test_oracle_parity.py; these pin the math against
brute-force pair counting and hand loops."""

from __future__ import annotations

import math
import random

import pytest


# ---------------------------------------------------------------------------
# calibration_table
# ---------------------------------------------------------------------------

def test_calibration_hand_math(spark):
    from ai_etl_framework_spark.operators.evaluation import calibration_table

    rows = (
        # bin 0 ([0, 0.5)): scores 0.1/0.2, labels 0, 1 → rate 0.5
        [(0.1, 0), (0.2, 1)]
        # bin 1 ([0.5, 1]): scores 0.8, 0.9, 1.0 → rate 1/3; 1.0 joins top bin
        + [(0.8, 0), (0.9, 0), (1.0, 1)]
        + [(None, 1), (0.5, None)]
    )
    df = spark.createDataFrame(rows, "s double, y int")
    got = {r["bin"]: r for r in calibration_table(df, "s", "y", n_bins=2).collect()}
    assert set(got) == {0, 1}
    base = 2 / 5
    b0 = got[0]
    assert b0["n"] == 2 and b0["actual_rate"] == 0.5
    assert b0["lo"] == 0.0 and b0["hi"] == 0.5
    assert b0["avg_score"] == pytest.approx(0.15)
    assert b0["lift"] == pytest.approx(round(0.5 / base, 6))
    assert b0["abs_gap"] == pytest.approx(round(abs(0.15 - 0.5), 6))
    b1 = got[1]
    assert b1["n"] == 3 and b1["actual_rate"] == pytest.approx(round(1 / 3, 6))


def test_calibration_clamps_and_guards(spark):
    from ai_etl_framework_spark.operators.evaluation import calibration_table

    df = spark.createDataFrame([(-0.3, 0), (1.7, 1)], "s double, y int")
    got = {r["bin"]: r for r in calibration_table(df, "s", "y", n_bins=4).collect()}
    assert set(got) == {0, 3}  # clamped to the edge bins
    assert got[0]["avg_score"] == 0.0 and got[3]["avg_score"] == 1.0

    bad = spark.createDataFrame([(0.5, 2)], "s double, y int")
    with pytest.raises(ValueError, match="binary"):
        calibration_table(bad, "s", "y")
    with pytest.raises(ValueError, match="n_bins"):
        calibration_table(df, "s", "y", n_bins=1)


# ---------------------------------------------------------------------------
# classifier_metrics
# ---------------------------------------------------------------------------

def _brute(scores, labels, eps=1e-15):
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    auc = wins / (len(pos) * len(neg))
    n = len(scores)
    brier = sum((s - y) ** 2 for s, y in zip(scores, labels)) / n
    ll = -sum(
        y * math.log(min(max(s, eps), 1 - eps))
        + (1 - y) * math.log(1 - min(max(s, eps), 1 - eps))
        for s, y in zip(scores, labels)
    ) / n
    return auc, brier, ll


def test_classifier_metrics_vs_brute_force(spark):
    from ai_etl_framework_spark.operators.evaluation import classifier_metrics

    rng = random.Random(102)
    scores, labels = [], []
    for _ in range(300):
        y = rng.random() < 0.3
        # ties on purpose: 2dp grid; informative score
        s = round(min(max(rng.gauss(0.6 if y else 0.4, 0.2), 0.0), 1.0), 2)
        scores.append(s)
        labels.append(int(y))
    df = spark.createDataFrame(
        list(zip(scores, labels)) + [(None, 1), (0.5, None)],
        "s double, y int",
    )
    got = classifier_metrics(df, "s", "y").collect()[0]
    auc, brier, ll = _brute(scores, labels)
    assert got["n_pos"] == sum(labels)
    assert got["n_neg"] == len(labels) - sum(labels)
    assert got["auc"] == pytest.approx(round(auc, 6), abs=1e-6)
    assert got["brier"] == pytest.approx(round(brier, 6), abs=1e-6)
    assert got["log_loss"] == pytest.approx(round(ll, 6), abs=1e-6)


def test_classifier_metrics_perfect_and_degenerate(spark):
    from ai_etl_framework_spark.operators.evaluation import classifier_metrics

    perfect = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "s double, y int"
    )
    r = classifier_metrics(perfect, "s", "y").collect()[0]
    assert r["auc"] == 1.0

    one_class = spark.createDataFrame(
        [(0.9, 1), (0.1, 1)], "s double, y int"
    )
    r = classifier_metrics(one_class, "s", "y").collect()[0]
    assert r["auc"] is None and r["n_neg"] == 0
    # log loss still defined (all-positive): -mean(log s)
    want = -(math.log(0.9) + math.log(0.1)) / 2
    assert r["log_loss"] == pytest.approx(round(want, 6), abs=1e-6)


def test_classifier_metrics_guards(spark):
    from ai_etl_framework_spark.operators.evaluation import classifier_metrics

    bad = spark.createDataFrame([(0.5, 3)], "s double, y int")
    with pytest.raises(ValueError, match="binary"):
        classifier_metrics(bad, "s", "y")
    many = spark.createDataFrame(
        [(i / 100.0, i % 2) for i in range(100)], "s double, y int"
    )
    with pytest.raises(ValueError, match="max_distinct"):
        classifier_metrics(many, "s", "y", max_distinct=10)
