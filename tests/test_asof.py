"""As-of join unit semantics (q34 provides the DuckDB-native ASOF
oracle; here: tie handling, no-match NULLs, collision guard)."""

from __future__ import annotations

import datetime as dt

import pytest

from ai_etl_framework_spark.operators.asof import asof_join, range_join_points


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


def test_range_join_points(spark):
    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T12:00:00")),
            (2, _ts("2024-01-01T11:30:00"), _ts("2024-01-01T11:45:00")),
        ],
        "interval_id long, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:59:59")),  # just before interval 1
            (11, _ts("2024-01-01T10:00:00")),  # inclusive start
            (12, _ts("2024-01-01T11:40:00")),  # inside both
            (13, _ts("2024-01-01T12:00:00")),  # inclusive end of 1
            (14, _ts("2024-01-01T13:00:00")),  # after both
        ],
        "point_id long, ts timestamp",
    )
    got = {
        (r.point_id, r.interval_id)
        for r in range_join_points(points, intervals, "ts", "start_ts", "end_ts").collect()
    }
    assert got == {(11, 1), (12, 1), (12, 2), (13, 1)}


def test_range_join_points_keyed_and_bins(spark):
    # interval spanning many bins with a small bin width still matches,
    # and the `by` key isolates groups.
    intervals = spark.createDataFrame(
        [("a", 0.0, 500.0), ("b", 0.0, 500.0)],
        "grp string, lo double, hi double",
    )
    points = spark.createDataFrame(
        [("a", 250.0), ("b", 600.0)], "grp string, x double"
    )
    got = {
        (r.grp, r.x)
        for r in range_join_points(
            points, intervals, "x", "lo", "hi", by=["grp"], bin_seconds=60
        ).collect()
    }
    assert got == {("a", 250.0)}


def test_asof_carries_whole_row_not_mixed_columns(spark):
    """r4 review: per-column last(ignorenulls) filled each payload
    column from a DIFFERENT right row when the most recent row had
    NULLs — the match must be the single most recent right ROW with
    its interior NULLs intact."""
    from datetime import datetime

    from ai_etl_framework_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 0, 0, 1), 10.0, 20.0),
         ("k", datetime(2024, 1, 1, 0, 0, 2), 30.0, None)],
        "key string, ts timestamp, a double, b double",
    )
    left = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 0, 0, 3))], "key string, ts timestamp"
    )
    row = asof_join(left, right, on="ts", by=["key"]).collect()[0]
    assert row["a"] == 30.0
    assert row["b"] is None, "b must come from the ts=2 row, not leak from ts=1"
