"""As-of join unit semantics (q34 provides the DuckDB-native ASOF
oracle; here: tie handling, no-match NULLs, collision guard)."""

from __future__ import annotations

import datetime as dt

import pytest

from ai_etl_framework_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_semantics(spark):
    rates = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),
            (1, _ts("2024-01-01T12:00:00"), 200.0),
            (2, _ts("2024-01-01T11:00:00"), 999.0),
        ],
        "user_id long, ts timestamp, rate double",
    )
    events = spark.createDataFrame(
        [
            (10, 1, _ts("2024-01-01T09:00:00")),   # before any rate → NULL
            (11, 1, _ts("2024-01-01T10:00:00")),   # tie → sees the 10:00 rate
            (12, 1, _ts("2024-01-01T11:30:00")),   # between → 100
            (13, 1, _ts("2024-01-01T13:00:00")),   # after both → 200
            (14, 2, _ts("2024-01-01T12:00:00")),   # other key → 999
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r.event_id: r.rate
        for r in asof_join(events, rates, on="ts", by=["user_id"], right_cols=["rate"]).collect()
    }
    assert out == {10: None, 11: 100.0, 12: 100.0, 13: 200.0, 14: 999.0}


def test_asof_collision_guard(spark):
    rates = spark.createDataFrame([(1, _ts("2024-01-01T10:00:00"), 1.0)],
                                  "user_id long, ts timestamp, value double")
    events = spark.createDataFrame([(1, 1, _ts("2024-01-01T11:00:00"), 5.0)],
                                   "event_id long, user_id long, ts timestamp, value double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(events, rates, on="ts", by=["user_id"], right_cols=["value"])
