"""run_checks (operators/expectations.py) and psi_drift
(operators/drift.py): pinned constraint semantics, one-pass plan,
PSI vs a numpy model, shifted-vs-identical distributions. 3-SF
oracle parity is x36 / x37."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ai_etl_framework_spark.operators.drift import psi_drift
from ai_etl_framework_spark.operators.expectations import run_checks


def test_checks_pinned(spark):
    rows = [
        (1, "a@x.com", 5.0), (2, "b@y.org", 7.5), (3, None, 100.0),
        (4, "not-an-email", -2.0), (4, "d@z.net", 3.0),  # dup id
    ]
    df = spark.createDataFrame(rows, "id long, email string, v double")
    rows_out = run_checks(
        df,
        [
            {"check": "not_null", "column": "email"},
            {"check": "not_null", "column": "email", "threshold": 0.7},
            {"check": "unique", "column": "id"},
            {"check": "min", "column": "v", "value": 0.0},
            {"check": "max", "column": "v", "value": 50.0},
            {"check": "in_set", "column": "id", "values": [1, 2, 3, 4]},
            {"check": "matches", "column": "email",
             "pattern": r"^[^@]+@[^@]+\.[a-z]+$", "threshold": 0.7},
        ],
    ).collect()
    got = [(r["metric"], r["threshold"], r["passed"]) for r in rows_out]
    assert got[0] == (0.8, 1.0, False)   # default exact threshold fails
    assert got[1] == (0.8, 0.7, True)    # same metric, looser threshold
    assert got[2] == (0.8, 1.0, False)   # dup id 4 breaks uniqueness
    assert got[3] == (-2.0, 0.0, False)  # observed min below bound
    assert got[4] == (100.0, 50.0, False)
    assert got[5] == (1.0, 1.0, True)
    assert got[6] == (0.75, 0.7, True)


def test_checks_empty_frame_and_validation(spark):
    df = spark.createDataFrame([], "id long, v double")
    rows = run_checks(
        df,
        [
            {"check": "not_null", "column": "v"},
            {"check": "min", "column": "v", "value": 0.0},
        ],
    ).collect()
    assert all(r["passed"] is None and r["metric"] is None for r in rows)
    with pytest.raises(ValueError, match="at least one"):
        run_checks(df, [])
    with pytest.raises(ValueError, match="unknown check"):
        run_checks(df, [{"check": "positive", "column": "v"}]).collect()


def test_checks_empty_under_ansi(spark):
    """Zero denominators yield metric NULL / passed NULL under ANSI
    sessions too (ADVICE r9: plain division raises DIVIDE_BY_ZERO when
    spark.sql.ansi.enabled=true — the driver's plain-session default)."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        empty = spark.createDataFrame([], "id long, v double, s string")
        all_null = spark.createDataFrame(
            [(1, None), (2, None)], "id long, s string"
        )
        rows = run_checks(
            empty,
            [
                {"check": "not_null", "column": "v"},
                {"check": "unique", "column": "id"},
                {"check": "in_set", "column": "s", "values": ["a"]},
                {"check": "matches", "column": "s", "pattern": "^a"},
            ],
        ).collect()
        assert all(r["metric"] is None and r["passed"] is None for r in rows)
        rows = run_checks(
            all_null,
            [
                {"check": "in_set", "column": "s", "values": ["a"]},
                {"check": "matches", "column": "s", "pattern": "^a"},
            ],
        ).collect()
        assert all(r["metric"] is None and r["passed"] is None for r in rows)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_checks_single_pass(spark):
    """Non-distinct constraints compile into ONE aggregate over one
    scan (plan-asserted) — 30 checks on 100 TB cost one pass."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, v double"
    )
    from ai_etl_framework_spark.operators.expectations import _metric_expr

    agg = df.agg(
        _metric_expr({"check": "not_null", "column": "v"}).alias("a"),
        _metric_expr({"check": "min", "column": "v"}).alias("b"),
        _metric_expr({"check": "max", "column": "v"}).alias("c"),
        _metric_expr(
            {"check": "matches", "column": "id", "pattern": r"^\d+$"}
        ).alias("d"),
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1
    assert "Expand" not in plan  # only `unique` checks pay the Expand


def _psi_model(base, cur, buckets):
    edges = np.percentile(base, [100 * i / buckets for i in range(1, buckets)])
    def h(xs):
        b = np.sum(xs[:, None] > edges[None, :], axis=1)
        return np.bincount(b, minlength=buckets) / len(xs)
    p, q = h(np.asarray(base)), h(np.asarray(cur))
    p, q = np.maximum(p, 1e-6), np.maximum(q, 1e-6)
    return float(np.sum((q - p) * np.log(q / p)))


def test_psi_matches_numpy(spark):
    rng = np.random.RandomState(7)
    base = rng.normal(0, 1, 2000).tolist()
    cur = rng.normal(0.5, 1.3, 1500).tolist()  # shifted + widened
    bdf = spark.createDataFrame([(float(v),) for v in base], "v double")
    cdf = spark.createDataFrame([(float(v),) for v in cur], "v double")
    rows = psi_drift(bdf, cdf, "v", buckets=10).collect()
    assert len(rows) == 10
    total = rows[0]["psi_total"]
    assert all(r["psi_total"] == total for r in rows)
    exp = _psi_model(base, cur, 10)
    # per-bucket terms round to 6dp before summing — allow that slack
    assert total == pytest.approx(exp, abs=1e-4)
    assert total > 0.25  # a real shift reads as "investigate"
    # identical distributions: PSI ~ 0
    same = psi_drift(bdf, bdf, "v", buckets=10).collect()
    assert same[0]["psi_total"] == pytest.approx(0.0, abs=1e-9)
    # proportions sum to 1 on both sides
    assert sum(r["p_base"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["p_cur"] for r in rows) == pytest.approx(1.0, abs=1e-4)


def test_psi_edges_and_validation(spark):
    bdf = spark.createDataFrame([(1.0,), (1.0,), (1.0,), (None,)], "v double")
    cdf = spark.createDataFrame([(9.0,), (None,)], "v double")
    # heavy ties -> duplicate edges -> everything lands in buckets 0/N
    rows = psi_drift(bdf, cdf, "v", buckets=4).collect()
    got = {r["bucket"]: (r["p_base"], r["p_cur"]) for r in rows}
    assert got[0][0] == 1.0          # all baseline mass in bucket 0
    assert got[3][1] == 1.0          # all current mass above every edge
    with pytest.raises(ValueError, match="buckets"):
        psi_drift(bdf, cdf, "v", buckets=1)
    empty = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError, match="no non-NULL"):
        psi_drift(empty, cdf, "v")
    # approx dual stays close
    r_e = psi_drift(bdf, cdf, "v", buckets=4).collect()[0]["psi_total"]
    r_a = psi_drift(bdf, cdf, "v", buckets=4, approx=True).collect()[0]["psi_total"]
    assert r_a == pytest.approx(r_e, abs=1e-6)
