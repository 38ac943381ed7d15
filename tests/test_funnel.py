"""funnel_stages (operators/funnel.py): pinned first-touch ordered
semantics (stage order enforced, window anchored at stage 1,
pre-stage-1 events ignored), NULL handling, validation, and the
reused-partitioning claim. 3-SF oracle parity is x25."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.operators.funnel import funnel_stages

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(h):
    return T0 + dt.timedelta(hours=h)


def _run(spark, rows, within="1 day"):
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    return {
        r["user_id"]: (r["t1"], r["t2"], r["t3"], r["furthest"])
        for r in funnel_stages(
            df, ["view", "click", "purchase"], within=within
        ).collect()
    }


def test_funnel_pinned_semantics(spark):
    rows = [
        # u1 full conversion, in order
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "purchase"),
        # u2: click BEFORE the first view -> doesn't count; later click does
        (2, _ts(0), "click"), (2, _ts(1), "view"), (2, _ts(3), "click"),
        # u3: purchase before click -> stage 3 not reached
        (3, _ts(0), "view"), (3, _ts(1), "purchase"), (3, _ts(2), "click"),
        # u4: click outside the 1-day window
        (4, _ts(0), "view"), (4, _ts(30), "click"),
        # u5: never viewed -> not in the funnel at all
        (5, _ts(0), "click"), (5, _ts(1), "purchase"),
        # NULLs ignored
        (None, _ts(0), "view"), (6, None, "view"),
    ]
    got = _run(spark, rows)
    assert got == {
        1: (_ts(0), _ts(1), _ts(2), 3),
        2: (_ts(1), _ts(3), None, 2),
        3: (_ts(0), _ts(2), None, 2),
        4: (_ts(0), None, None, 1),
    }


def test_funnel_first_touch_and_boundary(spark):
    rows = [
        # two views: the EARLIER anchors the window; click at exactly
        # +24h of the first view is inside (inclusive bound)
        (7, _ts(0), "view"), (7, _ts(5), "view"), (7, _ts(24), "click"),
        # same-timestamp stage events count (>= is inclusive)
        (8, _ts(0), "view"), (8, _ts(0), "click"), (8, _ts(0), "purchase"),
    ]
    got = _run(spark, rows)
    assert got[7] == (_ts(0), _ts(24), None, 2)
    assert got[8] == (_ts(0), _ts(0), _ts(0), 3)


def test_funnel_validation(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), "view")], "user_id long, ts timestamp, event_type string"
    )
    with pytest.raises(ValueError, match="at least 2"):
        funnel_stages(df, ["view"])


def test_funnel_single_partitioning(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), "view"), (1, _ts(1), "click")],
        "user_id long, ts timestamp, event_type string",
    )
    plan = (
        funnel_stages(df, ["view", "click"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # every exchange hashes on the funnel key — no other shuffle keys
    import re

    for m in re.findall(r"hashpartitioning\((\w+)#", plan):
        assert m in ("key", "user_id"), plan[:500]


def test_funnel_timings_pinned(spark):
    """Transition timings vs hand math: deltas from first-touch
    stages, exact percentiles, reached/converted counts."""
    import datetime as dt

    from ai_etl_framework_spark.operators.funnel import funnel_timings

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # u1 full funnel: a@0, b@10, c@40  (a->b 600s, b->c 1800s)
        (1, ts(0), "a"), (1, ts(10), "b"), (1, ts(40), "c"),
        # u2 reaches b only: a@0, b@30            (a->b 1800s)
        (2, ts(0), "a"), (2, ts(30), "b"),
        # u3 stage 1 only
        (3, ts(5), "a"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["transition"]: r
        for r in funnel_timings(df, ["a", "b", "c"], within="1 day").collect()
    }
    ab = got["a -> b"]
    assert (ab["n_reached"], ab["n_converted"]) == (3, 2)
    assert ab["conv_rate"] == pytest.approx(2 / 3, abs=1e-6)
    assert ab["p50_seconds"] == pytest.approx(1200.0)  # median of 600, 1800
    assert ab["mean_seconds"] == pytest.approx(1200.0)
    bc = got["b -> c"]
    assert (bc["n_reached"], bc["n_converted"]) == (2, 1)
    assert bc["p50_seconds"] == pytest.approx(1800.0)
    # approx dual agrees on this tiny frame
    appr = {
        r["transition"]: r["p50_seconds"]
        for r in funnel_timings(
            df, ["a", "b", "c"], within="1 day", approx=True
        ).collect()
    }
    assert abs(appr["a -> b"] - 1200.0) <= 600.0
