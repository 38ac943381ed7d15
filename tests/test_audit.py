"""join_audit / detect_gaps / pareto_share (operators/audit.py):
pinned counts on hand-built relationships, NULL-key conventions, gap
boundaries, cumulative-share math. 3-SF oracle parity is x45-x47."""

from __future__ import annotations

import datetime as dt

import pytest

from ai_etl_framework_spark.operators.audit import (
    detect_gaps,
    join_audit,
    pareto_share,
)


def test_join_audit_pinned(spark):
    fact = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,)], "k long"
    )
    dim = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b2"), (5, "c")], "k long, payload string"
    )
    r = join_audit(fact, dim, "k", "k").collect()[0]
    assert r["n_fact"] == 5 and r["n_dim"] == 4
    assert r["orphan_fact_rows"] == 2      # key 9 + NULL key
    assert r["unmatched_dim_rows"] == 1    # key 5 never referenced
    assert r["dup_dim_keys"] == 1 and r["max_fanout"] == 2


def test_join_audit_clean_relationship(spark):
    fact = spark.createDataFrame([(1,), (2,)], "k long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    r = join_audit(fact, dim, "k", "k").collect()[0]
    assert (r["orphan_fact_rows"], r["dup_dim_keys"], r["max_fanout"]) == (0, 0, 1)
    assert r["unmatched_dim_rows"] == 1


def test_detect_gaps_pinned(spark):
    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        (1, ts(0), 1), (1, ts(5), 2), (1, ts(65), 3),   # 60-min gap
        (2, ts(0), 4), (2, ts(30), 5),                  # no gap > 30 min
        (None, ts(0), 6), (3, None, 7),                 # dropped
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    gaps = detect_gaps(df, threshold_seconds=1800, key_col="user_id").collect()
    assert len(gaps) == 1
    g = gaps[0]
    assert g["user_id"] == 1 and g["gap_seconds"] == 3600.0
    assert g["gap_start"] == ts(5) and g["gap_end"] == ts(65)
    with pytest.raises(ValueError, match="threshold"):
        detect_gaps(df, threshold_seconds=0)


def test_pareto_share_pinned(spark):
    rows = [("a", 50.0), ("b", 30.0), ("c", 15.0), ("d", 5.0), ("a", 0.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: (r["total"], r["share"], r["cum_share"], r["is_top"])
        for r in pareto_share(df, "g", "v", top_frac=0.8).collect()
    }
    assert got["a"] == (50.0, 0.5, 0.5, True)
    assert got["b"] == (30.0, 0.3, 0.8, True)
    # c starts AT 0.8 cumulative -> not needed to reach 80%
    assert got["c"] == (15.0, 0.15, 0.95, False)
    assert got["d"][3] is False
    with pytest.raises(ValueError, match="top_frac"):
        pareto_share(df, "g", "v", top_frac=0.0)


def test_pareto_share_max_groups_guard(spark):
    """The window path fails loud past max_groups (r9 verdict item 3),
    naming the distributed alternative; max_groups=None skips."""
    rows = [(f"g{i}", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    with pytest.raises(ValueError, match="distributed"):
        pareto_share(df, "g", "v", max_groups=5)
    assert pareto_share(df, "g", "v", max_groups=None).count() == 10
    with pytest.raises(ValueError, match="method"):
        pareto_share(df, "g", "v", method="magic")


def test_pareto_share_distributed_matches_window(spark):
    """The range-partitioned two-pass prefix sum produces the window
    path's exact output (many groups spread over several ranges, ties
    on total included so the (total DESC, group ASC) ordering crosses
    partition boundaries deterministically)."""
    import random

    rng = random.Random(7)
    rows = [(f"g{i:04d}", float(rng.randint(0, 50))) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v double")
    win = {
        r["g"]: (r["total"], r["share"], r["cum_share"], r["is_top"])
        for r in pareto_share(df, "g", "v", max_groups=None).collect()
    }
    dist = {
        r["g"]: (r["total"], r["share"], r["cum_share"], r["is_top"])
        for r in pareto_share(
            df, "g", "v", method="distributed", num_partitions=8
        ).collect()
    }
    assert set(win) == set(dist)
    for g in win:
        wt, ws, wc, wf = win[g]
        dt, ds, dc, df_ = dist[g]
        assert dt == wt
        assert ds == pytest.approx(ws, abs=2e-6)
        assert dc == pytest.approx(wc, abs=2e-6)
        assert df_ == wf
    # empty frame: schema preserved, zero rows
    empty = spark.createDataFrame([], "g string, v double")
    assert pareto_share(empty, "g", "v", method="distributed").count() == 0
