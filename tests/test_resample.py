"""resample_ffill (operators/resample.py): pinned grid/fill semantics
on a hand-built series, NULL key/ts handling, agg validation, and the
no-leading-synthetic invariant. 3-SF oracle parity is x24; NULL-laden
events run through the events-edge oracle row."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.operators.resample import resample_ffill

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(hours, minutes=0):
    return T0 + dt.timedelta(hours=hours, minutes=minutes)


def test_resample_pinned(spark):
    rows = [
        # user 1: buckets 0 and 3 observed -> 1, 2 forward-filled
        (1, _ts(0, 10), 5.0),
        (1, _ts(0, 50), 7.0),
        (1, _ts(3, 5), 1.0),
        # user 2: single bucket, no gaps
        (2, _ts(1, 0), 4.0),
        # dropped: NULL key, NULL ts
        (None, _ts(0, 0), 9.0),
        (3, None, 9.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sorted(
        (r["user_id"], r["bucket_start"], r["value"], r["filled"])
        for r in resample_ffill(df, step="1 hour", agg="sum").collect()
    )
    assert out == [
        (1, _ts(0), 12.0, False),
        (1, _ts(1), 12.0, True),
        (1, _ts(2), 12.0, True),
        (1, _ts(3), 1.0, False),
        (2, _ts(1), 4.0, False),
    ]
    # no synthetic leading bucket → value never NULL
    assert all(v is not None for _, _, v, _ in out)


def test_resample_aggs_and_validation(spark):
    df = spark.createDataFrame(
        [(1, _ts(0, 1), 3.0), (1, _ts(0, 2), 5.0)],
        "user_id long, ts timestamp, value double",
    )
    got = {
        a: resample_ffill(df, step="1 hour", agg=a).collect()[0]["value"]
        for a in ("sum", "count", "min", "max", "avg")
    }
    assert got == {"sum": 8.0, "count": 2, "min": 3.0, "max": 5.0, "avg": 4.0}
    with pytest.raises(ValueError, match="agg"):
        resample_ffill(df, agg="median")


def test_resample_observed_all_null_bucket(spark):
    """r8 advice: an OBSERVED bucket whose value inputs are all NULL
    must keep filled=False (it is not synthetic), get forward-filled
    like pandas ffill, and stay NULL when it is the key's leading
    bucket with nothing before it."""
    rows = [
        # user 1: leading bucket observed but all-NULL -> value NULL,
        # filled=False; next bucket observed non-NULL
        (1, _ts(0, 10), None),
        (1, _ts(1, 10), 6.0),
        # user 2: non-NULL lead, then observed all-NULL bucket that
        # ffills from the lead, then a synthetic gap bucket
        (2, _ts(0, 0), 3.0),
        (2, _ts(1, 0), None),
        (2, _ts(3, 0), 9.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sorted(
        (r["user_id"], r["bucket_start"], r["value"], r["filled"])
        for r in resample_ffill(df, step="1 hour", agg="sum").collect()
    )
    assert out == [
        (1, _ts(0), None, False),   # observed, nothing to fill from
        (1, _ts(1), 6.0, False),
        (2, _ts(0), 3.0, False),
        (2, _ts(1), 3.0, False),    # observed all-NULL: ffilled, NOT "filled"
        (2, _ts(2), 3.0, True),     # synthetic gap bucket
        (2, _ts(3), 9.0, False),
    ]


def test_resample_empty_and_single(spark):
    empty = spark.createDataFrame([], "user_id long, ts timestamp, value double")
    assert resample_ffill(empty).count() == 0
    one = spark.createDataFrame(
        [(9, _ts(5), 2.5)], "user_id long, ts timestamp, value double"
    )
    rows = resample_ffill(one).collect()
    assert len(rows) == 1 and rows[0]["filled"] is False
