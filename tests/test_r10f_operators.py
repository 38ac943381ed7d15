"""Pinned unit tests for the sixth r10 batch (x96–x98): CUSUM
changepoint screen (the cum − running-min identity vs the literal
Page recursion), HHI concentration, blocking quality report."""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest


# ---------------------------------------------------------------------------
# cusum_screen
# ---------------------------------------------------------------------------

def _cusum_reference(xs, slack):
    """Literal Page (1954) recursion over standardized values."""
    import statistics

    mu = statistics.mean(xs)
    sd = statistics.stdev(xs)
    sp = sm = 0.0
    out = []
    for x in xs:
        z = (x - mu) / sd
        sp = max(0.0, sp + z - slack)
        sm = max(0.0, sm - z - slack)
        out.append((z, sp, sm))
    return out


def test_cusum_identity_equals_recursion(spark):
    """The window rewrite S⁺ = cum − min-prefix must equal the literal
    recursion on a randomized series — the whole point of the op."""
    from ai_etl_framework_spark.operators.timeseries import cusum_screen

    rng = random.Random(96)
    xs = [rng.gauss(0, 1) for _ in range(40)] + [
        rng.gauss(1.2, 1) for _ in range(40)
    ]
    rows = [
        ("k", dt.datetime(2024, 1, 1) + dt.timedelta(days=i), x)
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    got = sorted(
        cusum_screen(df, "v", "t", key_col="k", slack=0.5).collect(),
        key=lambda r: r["bucket"],
    )
    ref = _cusum_reference(xs, 0.5)
    for r, (z, sp, sm) in zip(got, ref):
        assert r["z"] == pytest.approx(round(z, 6), abs=2e-6)
        assert r["s_plus"] == pytest.approx(round(sp, 6), abs=2e-6)
        assert r["s_minus"] == pytest.approx(round(sm, 6), abs=2e-6)
    # the injected +1.2σ shift must eventually trip the upward alarm
    assert any(r["alarm_up"] for r in got[40:])
    assert not any(r["alarm_up"] for r in got[:20])


def test_cusum_constant_series_emits_nothing(spark):
    from ai_etl_framework_spark.operators.timeseries import cusum_screen

    rows = [
        ("k", dt.datetime(2024, 1, 1) + dt.timedelta(days=i), 5.0)
        for i in range(10)
    ] + [("one", dt.datetime(2024, 1, 1), 1.0)]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    # zero variance and single-bucket keys both drop (z undefined)
    assert cusum_screen(df, "v", "t", key_col="k").count() == 0


# ---------------------------------------------------------------------------
# hhi
# ---------------------------------------------------------------------------

def test_hhi_closed_form(spark):
    from ai_etl_framework_spark.operators.stats import hhi

    rows = (
        # g1: shares 0.5, 0.3, 0.2 → HHI = 0.25+0.09+0.04 = 0.38
        [("g1", "a", 50.0), ("g1", "b", 30.0), ("g1", "c", 20.0)]
        # g2: monopoly → HHI 1, norm NULL (n=1)
        + [("g2", "a", 7.0)]
        # g3: two equal → HHI 0.5, norm 0
        + [("g3", "a", 5.0), ("g3", "b", 5.0)]
    )
    df = spark.createDataFrame(rows, "g string, m string, v double")
    got = {r["g"]: r for r in hhi(df, "g", "m", "v").collect()}
    assert got["g1"]["hhi"] == pytest.approx(0.38)
    assert got["g1"]["effective_n"] == pytest.approx(round(1 / 0.38, 6))
    assert got["g1"]["norm_hhi"] == pytest.approx(
        round((0.38 - 1 / 3) / (1 - 1 / 3), 6)
    )
    assert got["g2"]["hhi"] == 1.0 and got["g2"]["norm_hhi"] is None
    assert got["g3"]["hhi"] == 0.5 and got["g3"]["norm_hhi"] == 0.0
    assert got["g3"]["effective_n"] == 2.0


def test_hhi_member_multiplicity_and_zero_total(spark):
    from ai_etl_framework_spark.operators.stats import hhi

    rows = [
        ("g", "a", 30.0),
        ("g", "a", 20.0),  # same member: totals sum first (50 vs 50)
        ("g", "b", 50.0),
        ("z", "a", 5.0),
        ("z", "b", -5.0),  # sign-cancelling total → NULLs
    ]
    df = spark.createDataFrame(rows, "g string, m string, v double")
    got = {r["g"]: r for r in hhi(df, "g", "m", "v").collect()}
    assert got["g"]["hhi"] == 0.5
    assert got["z"]["hhi"] is None and got["z"]["effective_n"] is None


# ---------------------------------------------------------------------------
# blocking_stats
# ---------------------------------------------------------------------------

def test_blocking_stats_hand_math(spark):
    from ai_etl_framework_spark.operators.audit import blocking_stats

    # blocks: A×4, B×2, C×1 (+1 NULL-key row dropped)
    rows = [("A",)] * 4 + [("B",)] * 2 + [("C",)] + [(None,)]
    df = spark.createDataFrame(rows, "k string")
    r = blocking_stats(df, "k").collect()[0]
    assert r["n_records"] == 7 and r["n_blocks"] == 3
    assert r["candidate_pairs"] == 6 + 1  # C(4,2) + C(2,2)
    assert r["max_block"] == 4
    assert r["p50_block"] == 2.0
    full = 7 * 6 / 2
    assert r["reduction_ratio"] == pytest.approx(round(1 - 7 / full, 6))
    assert r["pairs_per_record"] == pytest.approx(1.0)


def test_blocking_stats_truth_check_vs_real_pairs(spark):
    """candidate_pairs equals the ACTUAL within-block self-join pair
    count (a < b) on a randomized frame."""
    from pyspark.sql import functions as F

    from ai_etl_framework_spark.operators.audit import blocking_stats

    rng = random.Random(98)
    rows = [(i, "b" + str(rng.randint(0, 9))) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k string")
    r = blocking_stats(df, "k").collect()[0]
    a = df.select("k", F.col("id").alias("ia"))
    b = df.select("k", F.col("id").alias("ib"))
    real = a.join(b, "k").where(F.col("ia") < F.col("ib")).count()
    assert r["candidate_pairs"] == real


def test_blocking_stats_guards(spark):
    from ai_etl_framework_spark.operators.audit import blocking_stats

    df = spark.createDataFrame([(1, "a")], "id long, k string")
    with pytest.raises(ValueError, match="at least one"):
        blocking_stats(df, [])
    # single record: reduction_ratio NULL (no pair universe)
    r = blocking_stats(df, "k").collect()[0]
    assert r["reduction_ratio"] is None
