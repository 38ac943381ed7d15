"""Pinned unit tests for the third r10 batch (x84–x86): two-sample
KS drift, autocorrelation function, rolling active users. The oracle
twins are swept by test_oracle_parity.py; these pin the semantics
against hand math / numpy / a brute-force model."""

from __future__ import annotations

import datetime as dt

import pytest


def day(n):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=n)


# ---------------------------------------------------------------------------
# KS drift
# ---------------------------------------------------------------------------

def test_ks_identical_distributions_zero(spark):
    from ai_etl_framework_spark.operators.drift import ks_drift

    a = spark.createDataFrame([(float(i % 10),) for i in range(100)], "v double")
    out = ks_drift(a, a, "v").collect()[0]
    assert out["ks_d"] == 0.0
    assert out["p_approx"] == 1.0
    assert out["n_base"] == out["n_cur"] == 100


def test_ks_matches_brute_force(spark):
    """Randomized differential vs the direct sup over all evaluation
    points, including the tie-block evaluation convention."""
    import random

    rng = random.Random(84)
    xs = [round(rng.gauss(0, 1), 1) for _ in range(400)]
    ys = [round(rng.gauss(0.5, 1.3), 1) for _ in range(300)]

    from ai_etl_framework_spark.operators.drift import ks_drift

    a = spark.createDataFrame([(x,) for x in xs], "v double")
    b = spark.createDataFrame([(y,) for y in ys], "v double")
    out = ks_drift(a, b, "v").collect()[0]

    pts = sorted(set(xs) | set(ys))
    d = max(
        abs(
            sum(1 for x in xs if x <= p) / len(xs)
            - sum(1 for y in ys if y <= p) / len(ys)
        )
        for p in pts
    )
    assert out["ks_d"] == pytest.approx(d, abs=1e-6)
    import math

    m = len(xs) * len(ys) / (len(xs) + len(ys))
    assert out["p_approx"] == pytest.approx(
        min(1.0, 2 * math.exp(-2 * m * d * d)), abs=1e-6
    )


def test_ks_disjoint_supports_is_one(spark):
    from ai_etl_framework_spark.operators.drift import ks_drift

    a = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    b = spark.createDataFrame([(float(i + 100),) for i in range(10)], "v double")
    out = ks_drift(a, b, "v").collect()[0]
    assert out["ks_d"] == 1.0


def test_ks_max_distinct_cap(spark):
    from ai_etl_framework_spark.operators.drift import ks_drift

    a = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    with pytest.raises(ValueError, match="max_distinct"):
        ks_drift(a, a, "v", max_distinct=10)


# ---------------------------------------------------------------------------
# ACF
# ---------------------------------------------------------------------------

def test_acf_matches_numpy_corr(spark):
    np = pytest.importorskip("numpy")

    import random

    rng = random.Random(85)
    xs = [rng.gauss(0, 1) for _ in range(40)]
    # AR(1)-ish so lag-1 corr is visible
    for i in range(1, len(xs)):
        xs[i] += 0.8 * xs[i - 1]
    rows = [("k", day(i), x) for i, x in enumerate(xs)]

    from ai_etl_framework_spark.operators.timeseries import acf

    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    got = {
        r["lag"]: r
        for r in acf(df, "value", "ts", key_col="key", max_lag=3).collect()
    }
    for l in (1, 2, 3):
        a = np.array(xs[l:])
        b = np.array(xs[:-l])
        expect = float(np.corrcoef(a, b)[0, 1])
        assert got[l]["acf"] == pytest.approx(expect, abs=1e-6), l
        assert got[l]["n_pairs"] == len(xs) - l
    assert got[1]["acf"] > 0.5  # the AR structure is actually visible


def test_acf_short_series_null(spark):
    from ai_etl_framework_spark.operators.timeseries import acf

    rows = [("k", day(0), 1.0), ("k", day(1), 2.0)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    got = {r["lag"]: r for r in acf(df, "value", "ts", key_col="key", max_lag=3).collect()}
    # lag 1 has exactly 1 pair -> corr NULL (needs 2); lags 2,3 no pairs
    assert got[1]["n_pairs"] == 1 and got[1]["acf"] is None
    assert got[2]["n_pairs"] == 0 and got[2]["acf"] is None
    assert got[3]["n_pairs"] == 0


# ---------------------------------------------------------------------------
# rolling active users
# ---------------------------------------------------------------------------

def _naive_rolling(active_days, w):
    """Brute-force model: active_days = set of (user, day_index)."""
    days = sorted({d for _, d in active_days})
    lo, hi = days[0], days[-1]
    out = {}
    for d in range(lo, hi + 1):
        out[d] = len(
            {u for (u, ad) in active_days if d - w + 1 <= ad <= d}
        )
    return out


def test_rolling_active_matches_naive_model(spark):
    import random

    rng = random.Random(86)
    pairs = set()
    for u in range(20):
        for _ in range(rng.randint(1, 8)):
            pairs.add((u, rng.randint(0, 25)))
    rows = [
        (u, day(d) + dt.timedelta(minutes=(u * 7 + d) % 1440))
        for (u, d) in pairs
    ]
    from ai_etl_framework_spark.operators.activity import (
        rolling_active_users,
    )

    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["day"]: r["active_users"]
        for r in rolling_active_users(df, window_days=7).collect()
    }
    model = _naive_rolling(pairs, 7)
    assert {(day(d).date()): v for d, v in model.items()} == got


def test_rolling_active_islands_and_gaps(spark):
    """One user active on days 0 and 10 with window 3: coverage
    [0,2] and [10,12], clamped to the observed span [0,10]; the gap
    days count 0."""
    from ai_etl_framework_spark.operators.activity import (
        rolling_active_users,
    )

    rows = [(1, day(0)), (1, day(10))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["day"]: r["active_users"]
        for r in rolling_active_users(df, window_days=3).collect()
    }
    assert len(got) == 11  # spine = observed span only
    expect = {0: 1, 1: 1, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 0, 10: 1}
    assert got == {day(d).date(): v for d, v in expect.items()}


def test_rolling_active_window_one_is_dau(spark, sf_dir):
    """window=1 must equal plain per-day distinct users."""
    from pyspark.sql import functions as F

    from ai_etl_framework_spark.operators.activity import (
        rolling_active_users,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["day"]: r["active_users"]
        for r in rolling_active_users(ev, window_days=1).collect()
    }
    dau = {
        r["day"]: r["n"]
        for r in ev.where(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        )
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for d, v in got.items():
        assert v == dau.get(d, 0), d
