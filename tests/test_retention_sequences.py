"""cohort_retention (operators/retention.py), frequent_event_sequences
(operators/sequences.py): pinned semantics on hand-built event logs,
tie-break determinism, month arithmetic, short-tail exclusion. 3-SF
oracle parity is x33 / x34."""

from __future__ import annotations

import datetime as dt

import pytest

from ai_etl_framework_spark.operators.retention import cohort_retention
from ai_etl_framework_spark.operators.sequences import (
    frequent_event_sequences,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ts(d, h=0):
    return dt.datetime(2024, 1, d, h)


def test_retention_pinned_weeks(spark):
    # week of Jan 1 2024 (Mon) and week of Jan 8
    rows = [
        # user 1: active w0 and w1 -> retained
        (1, _ts(2), 1, "view"), (2, _ts(3), 1, "view"), (3, _ts(9), 1, "view"),
        # user 2: w0 only
        (4, _ts(4), 2, "view"),
        # user 3: first activity w1, returns w2
        (5, _ts(10), 3, "view"), (6, _ts(16), 3, "view"),
        # dropped rows
        (7, None, 1, "view"), (8, _ts(5), None, "view"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (str(r["cohort"]), r["offset"]): (r["n_users"], r["retention"])
        for r in cohort_retention(df, period="week").collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 1.0),
        ("2024-01-01", 1): (1, 0.5),
        ("2024-01-08", 0): (1, 1.0),
        ("2024-01-08", 1): (1, 1.0),
    }


def test_retention_month_offsets(spark):
    rows = [
        (1, dt.datetime(2024, 1, 15), 1, "v"),
        (2, dt.datetime(2024, 3, 2), 1, "v"),   # +2 months
        (3, dt.datetime(2024, 12, 20), 2, "v"),
        (4, dt.datetime(2025, 1, 5), 2, "v"),   # year boundary: +1
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (str(r["cohort"]), r["offset"]): r["n_users"]
        for r in cohort_retention(df, period="month").collect()
    }
    assert got == {
        ("2024-01-01", 0): 1, ("2024-01-01", 2): 1,
        ("2024-12-01", 0): 1, ("2024-12-01", 1): 1,
    }
    with pytest.raises(ValueError, match="period"):
        cohort_retention(df, period="quarter")


def test_sequences_pinned(spark):
    rows = [
        # user 1: a b c d -> "a>b>c", "b>c>d"
        (1, _ts(1, 1), 1, "a"), (2, _ts(1, 2), 1, "b"),
        (3, _ts(1, 3), 1, "c"), (4, _ts(1, 4), 1, "d"),
        # user 2: a b c -> "a>b>c" (count 2)
        (5, _ts(2, 1), 2, "a"), (6, _ts(2, 2), 2, "b"), (7, _ts(2, 3), 2, "c"),
        # user 3: only 2 events -> contributes nothing
        (8, _ts(3, 1), 3, "a"), (9, _ts(3, 2), 3, "b"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = [
        (r["sequence"], r["n_occurrences"])
        for r in frequent_event_sequences(df, n=3, k=10).collect()
    ]
    assert got == [("a > b > c", 2), ("b > c > d", 1)]
    with pytest.raises(ValueError, match="n must"):
        frequent_event_sequences(df, n=1)


def test_sequences_tiebreak_determinism(spark):
    """Simultaneous events order by the integer tie-break, not by
    arrival: both runs must yield the same path."""
    t = _ts(1)
    rows = [(3, t, 1, "c"), (1, t, 1, "a"), (2, t, 1, "b")]
    df = spark.createDataFrame(rows, SCHEMA)
    for _ in range(2):
        got = frequent_event_sequences(df.repartition(4), n=3, k=5).collect()
        assert [(r["sequence"], r["n_occurrences"]) for r in got] == [
            ("a > b > c", 1)
        ]
