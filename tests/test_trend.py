"""group_trend (operators/trend.py): pinned OLS vs numpy.polyfit,
degenerate groups (singleton, zero x-variance), NULL skipping, origin
shift-invariance of slope. 3-SF oracle parity is x39."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from ai_etl_framework_spark.operators.trend import group_trend

SCHEMA = "user_id long, ts timestamp, value double"
T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def test_matches_numpy(spark):
    xs = [0, 60, 120, 180, 240]
    ys = [1.0, 3.1, 4.9, 7.2, 8.8]
    rows = [(1, _ts(x), y) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, SCHEMA)
    r = group_trend(df, origin="2024-01-01").collect()[0]
    slope, intercept = np.polyfit(xs, ys, 1)
    assert r["n"] == 5
    assert r["slope"] == pytest.approx(slope, rel=1e-6)
    assert r["intercept"] == pytest.approx(intercept, rel=1e-6)
    corr = np.corrcoef(xs, ys)[0, 1]
    assert r["r2"] == pytest.approx(corr**2, abs=1e-6)


def test_degenerate_groups_and_nulls(spark):
    rows = [
        (1, _ts(0), 5.0),                      # singleton
        (2, _ts(0), 1.0), (2, _ts(0), 9.0),    # zero x-variance
        (3, _ts(0), 1.0), (3, _ts(60), None),  # NULL y skipped -> n=1
        (None, _ts(0), 1.0),                   # NULL key dropped
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["user_id"]: r for r in group_trend(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n"] == 1 and got[1]["slope"] is None
    assert got[2]["n"] == 2 and got[2]["slope"] is None  # var(x)=0
    assert got[3]["n"] == 1 and got[3]["slope"] is None


def test_origin_shift_invariance(spark):
    rows = [(1, _ts(i * 60), float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = group_trend(df).collect()[0]
    b = group_trend(df, origin="2024-01-01").collect()[0]
    assert a["slope"] == pytest.approx(b["slope"], rel=1e-4)
    assert a["r2"] == pytest.approx(b["r2"], abs=1e-6)
    # anchored intercept = value at the origin instant
    assert b["intercept"] == pytest.approx(0.0, abs=1e-6)
