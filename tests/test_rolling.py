"""rolling_features (operators/rolling.py): pinned frame semantics vs
a pandas model, NULL-in-frame handling, and the single-Exchange plan
pin (all window functions fuse into one partitioning). 3-SF oracle
parity is x35."""

from __future__ import annotations

import datetime as dt
import re

import pytest

from ai_etl_framework_spark.operators.rolling import rolling_features

SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


def test_rolling_matches_pandas(spark):
    import pandas as pd

    rows = [
        (i, _ts(i % 24), i % 3, float((i * 7) % 13) if i % 5 else None)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["event_id"]: (
            r["value_roll_avg"], r["value_roll_min"],
            r["value_roll_max"], r["n_in_window"],
        )
        for r in rolling_features(df, "value", k=4).collect()
    }
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    for _, g in pdf.groupby("user_id"):
        roll = g["value"].rolling(4, min_periods=1)
        for eid, avg, mn, mx, cnt in zip(
            g["event_id"], roll.mean(), roll.min(), roll.max(), roll.count()
        ):
            ga, gm, gx, gc = got[eid]
            assert gc == int(cnt)
            if cnt == 0:  # all-NULL frame
                assert ga is None and gm is None and gx is None
            else:
                assert ga == pytest.approx(round(avg, 6), abs=1e-9)
                assert gm == mn and gx == mx


def test_single_exchange_plan(spark):
    """All four window functions must fuse into ONE Window node over
    one Exchange — a per-feature shuffle would dominate at scale."""
    rows = [(i, _ts(i % 10), i % 2, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = rolling_features(df, "value", k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bWindow\b", plan)) == 1, plan
    assert plan.count("Exchange") == 1, plan


def test_validation(spark):
    df = spark.createDataFrame([(1, _ts(0), 1, 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="k must"):
        rolling_features(df, "value", k=0)
    with pytest.raises(ValueError, match="unknown aggs"):
        rolling_features(df, "value", aggs=("median",))
