"""Pinned unit tests for the second r10 operator batch (x77–x83):
Kaplan–Meier survival, Markov transitions, χ² independence, Benford
audit, truncated EWMA, linear gap interpolation, level-shift screen.
Each family also has a DuckDB oracle twin swept by
test_oracle_parity.py; these tests pin the SEMANTICS against hand
math / pandas / numpy models on frames small enough to verify by
eye."""

from __future__ import annotations

import datetime as dt
import math

import pytest


def ts(minutes, seconds=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(
        minutes=minutes, seconds=seconds
    )


def day(n):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=n)


# ---------------------------------------------------------------------------
# Kaplan–Meier
# ---------------------------------------------------------------------------

def test_kaplan_meier_textbook(spark):
    """The classic small example: subjects with durations
    1(e) 2(c) 3(e) 3(e) 4(c) 5(e). Hand math:
      t=1: n=6 d=1 -> S = 5/6
      t=3: n=4 d=2 -> S = 5/6 * 2/4 = 5/12
      t=5: n=1 d=1 -> S = 0 (d == n_risk -> zero flag)
    Censor-only time t=2 emits no row but holds risk until then."""
    from ai_etl_framework_spark.operators.survival import kaplan_meier

    rows = [(1.0, 1), (2.0, 0), (3.0, 1), (3.0, 1), (4.0, 0), (5.0, 1)]
    df = spark.createDataFrame(rows, "duration double, observed int")
    got = {r["t"]: r for r in kaplan_meier(df).collect()}
    assert set(got) == {1.0, 3.0, 5.0}
    assert got[1.0]["n_risk"] == 6 and got[1.0]["n_events"] == 1
    assert got[1.0]["survival"] == pytest.approx(5 / 6, abs=1e-6)
    assert got[3.0]["n_risk"] == 4 and got[3.0]["n_events"] == 2
    assert got[3.0]["survival"] == pytest.approx(5 / 12, abs=1e-6)
    assert got[5.0]["n_risk"] == 1
    assert got[5.0]["survival"] == 0.0


def test_kaplan_meier_matches_python_model(spark):
    """Randomized differential vs a sequential pure-Python KM."""
    import random

    rng = random.Random(77)
    subjects = [
        (float(rng.randint(0, 20)), rng.randint(0, 1)) for _ in range(300)
    ]
    from ai_etl_framework_spark.operators.survival import kaplan_meier

    df = spark.createDataFrame(subjects, "duration double, observed int")
    got = {r["t"]: r for r in kaplan_meier(df).collect()}

    # sequential model
    from collections import Counter

    d = Counter()
    c = Counter()
    for dur, obs in subjects:
        (d if obs else c)[dur] += 1
    times = sorted(set(d) | set(c))
    at_risk = len(subjects)
    s = 1.0
    for t in times:
        if d[t] > 0:
            srow = got[t]
            assert srow["n_risk"] == at_risk
            assert srow["n_events"] == d[t]
            assert srow["n_censored"] == c[t]
            s *= 1.0 - d[t] / at_risk
            assert srow["survival"] == pytest.approx(s, abs=2e-6)
        else:
            assert t not in got
        at_risk -= d[t] + c[t]


def test_kaplan_meier_groups_and_null_drop(spark):
    from ai_etl_framework_spark.operators.survival import kaplan_meier

    rows = [
        ("a", 1.0, 1), ("a", 2.0, 1), ("b", 1.0, 0), ("b", 3.0, 1),
        ("a", None, 1), ("a", 4.0, None), ("a", -1.0, 1),
    ]
    df = spark.createDataFrame(
        rows, "g string, duration double, observed int"
    )
    out = kaplan_meier(df, group_cols=["g"]).collect()
    by = {(r["g"], r["t"]): r for r in out}
    # NULL duration / NULL observed / negative duration dropped
    assert set(by) == {("a", 1.0), ("a", 2.0), ("b", 3.0)}
    assert by[("a", 1.0)]["survival"] == pytest.approx(0.5, abs=1e-6)
    assert by[("a", 2.0)]["survival"] == 0.0
    # b: censored at 1 leaves n_risk 1 at t=3
    assert by[("b", 3.0)]["n_risk"] == 1


# ---------------------------------------------------------------------------
# transition matrix
# ---------------------------------------------------------------------------

def test_transition_matrix_pinned(spark):
    from ai_etl_framework_spark.operators.sequences import transition_matrix

    rows = [
        # u1: a -> b -> a   u2: a -> b (never crosses into u1)
        (1, ts(0), "a", 10), (1, ts(1), "b", 11), (1, ts(2), "a", 12),
        (2, ts(0), "a", 20), (2, ts(5), "b", 21),
        # same-ts tie broken by event_id: c(30) then d(31)
        (3, ts(0), "c", 30), (3, ts(0), "d", 31),
        (None, ts(1), "z", 40), (4, None, "z", 41), (4, ts(1), None, 42),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = {(r["src"], r["dst"]): r for r in transition_matrix(df).collect()}
    assert set(got) == {("a", "b"), ("b", "a"), ("c", "d")}
    assert got[("a", "b")]["n"] == 2
    assert got[("a", "b")]["prob"] == pytest.approx(1.0)
    assert got[("b", "a")]["n"] == 1
    # b has 2 outgoing? no: u1 b->a, u2 b is last event (no successor)
    assert got[("b", "a")]["prob"] == pytest.approx(1.0)
    assert got[("c", "d")]["prob"] == pytest.approx(1.0)


def test_transition_matrix_probs_sum_to_one(spark, sf_dir):
    from ai_etl_framework_spark.operators.sequences import transition_matrix

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = transition_matrix(ev).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], 0.0)
        by_src[r["src"]] += r["prob"]
    for src, total in by_src.items():
        assert total == pytest.approx(1.0, abs=1e-4), src


# ---------------------------------------------------------------------------
# chi-square
# ---------------------------------------------------------------------------

def test_chi_square_matches_manual(spark):
    """2x2 table vs the direct (o-e)^2/e sum including zero cells."""
    from ai_etl_framework_spark.operators.stats import chi_square

    rows = (
        [("x", "p")] * 20 + [("x", "q")] * 10
        + [("y", "p")] * 5 + [("y", "q")] * 25
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi_square(df, "a", "b").collect()[0]
    n = 60
    obs = {("x", "p"): 20, ("x", "q"): 10, ("y", "p"): 5, ("y", "q"): 25}
    row_t = {"x": 30, "y": 30}
    col_t = {"p": 25, "q": 35}
    chi2 = sum(
        (o - row_t[a] * col_t[b] / n) ** 2 / (row_t[a] * col_t[b] / n)
        for (a, b), o in obs.items()
    )
    assert out["n"] == n
    assert out["dof"] == 1
    assert out["chi2"] == pytest.approx(chi2, abs=1e-5)
    assert out["cramers_v"] == pytest.approx(math.sqrt(chi2 / n), abs=1e-5)


def test_chi_square_zero_cells_and_single_level(spark):
    from ai_etl_framework_spark.operators.stats import chi_square

    # ("x","q") never observed -> its expected count still enters chi2
    rows = [("x", "p")] * 4 + [("y", "p")] * 2 + [("y", "q")] * 2
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi_square(df, "a", "b").collect()[0]
    n, obs = 8, {("x", "p"): 4, ("y", "p"): 2, ("y", "q"): 2}
    row_t, col_t = {"x": 4, "y": 4}, {"p": 6, "q": 2}
    chi2 = sum(
        (obs.get((a, b), 0) - row_t[a] * col_t[b] / n) ** 2
        / (row_t[a] * col_t[b] / n)
        for a in row_t for b in col_t
    )
    assert out["chi2"] == pytest.approx(chi2, abs=1e-5)

    single = spark.createDataFrame(
        [("x", "p"), ("x", "q")], "a string, b string"
    )
    s = chi_square(single, "a", "b").collect()[0]
    assert s["dof"] == 0 and s["chi2"] == 0.0
    assert s["cramers_v"] is None


# ---------------------------------------------------------------------------
# Benford
# ---------------------------------------------------------------------------

def test_benford_pinned(spark):
    from ai_etl_framework_spark.operators.audit import benford_audit

    vals = [1.5, 19.0, 0.02, 900.0, -35.0, 0.0, None, 123.4, 2.7]
    # digits: 1, 1, 2, 9, 3, (drop), (drop), 1, 2
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert sorted(out) == list(range(1, 10))
    assert out[1]["n"] == 3 and out[2]["n"] == 2
    assert out[3]["n"] == 1 and out[9]["n"] == 1
    assert out[4]["n"] == 0 and out[4]["observed_p"] == 0.0
    total = 7
    exp = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    assert out[1]["observed_p"] == pytest.approx(3 / total, abs=1e-6)
    assert out[1]["expected_p"] == pytest.approx(exp[1], abs=1e-6)
    chi2 = total * sum(
        (out[d]["n"] / total - exp[d]) ** 2 / exp[d] for d in range(1, 10)
    )
    mad = sum(abs(out[d]["n"] / total - exp[d]) for d in range(1, 10)) / 9
    assert out[5]["chi2"] == pytest.approx(chi2, abs=1e-4)
    assert out[5]["mad"] == pytest.approx(mad, abs=1e-6)


def test_benford_conformant_sample(spark):
    """A geometric sequence is Benford-distributed: MAD should be
    small; a constant-leading-digit column should be flagged huge."""
    from pyspark.sql import functions as F

    from ai_etl_framework_spark.operators.audit import benford_audit

    n = 3000
    df = spark.range(n).select(
        F.pow(F.lit(1.01), F.col("id").cast("double")).alias("v")
    )
    out = benford_audit(df, "v").collect()
    assert out[0]["mad"] < 0.01
    flat = spark.range(n).select(
        (F.col("id").cast("double") / 10000 + F.lit(1.0)).alias("v")
    )
    bad = benford_audit(flat, "v").collect()
    assert bad[0]["mad"] > 0.05


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------

def test_ewma_matches_pandas(spark):
    """Series shorter than n_terms == exact pandas ewm(adjust=True)."""
    pd = pytest.importorskip("pandas")

    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    rows = [("k", day(i), x) for i, x in enumerate(xs)]
    from ai_etl_framework_spark.operators.timeseries import ewma

    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    got = sorted(
        ewma(df, "value", "ts", key_col="key", alpha=0.3, n_terms=20)
        .collect(),
        key=lambda r: r["bucket"],
    )
    expect = pd.Series(xs).ewm(alpha=0.3, adjust=True).mean()
    for i, r in enumerate(got):
        assert r["ewma"] == pytest.approx(expect.iloc[i], abs=1e-6), i


def test_ewma_truncation_and_buckets(spark):
    """n_terms=2 keeps only (x_t + 0.7*x_{t-1})/1.7; same-day rows
    collapse to the bucket mean first."""
    from ai_etl_framework_spark.operators.timeseries import ewma

    rows = [
        ("k", day(0), 2.0), ("k", day(0), 4.0),  # bucket mean 3.0
        ("k", day(1), 10.0),
        ("k", day(2), 0.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    got = {
        r["bucket"]: r["ewma"]
        for r in ewma(
            df, "value", "ts", key_col="key", alpha=0.3, n_terms=2
        ).collect()
    }
    assert got[day(0)] == pytest.approx(3.0, abs=1e-6)
    assert got[day(1)] == pytest.approx((10 + 0.7 * 3) / 1.7, abs=1e-6)
    assert got[day(2)] == pytest.approx((0 + 0.7 * 10) / 1.7, abs=1e-6)


# ---------------------------------------------------------------------------
# interpolation
# ---------------------------------------------------------------------------

def test_resample_interpolate_pinned(spark):
    """Gap of two hours between 1.0@h0 and 4.0@h3 interpolates to
    2.0, 3.0; trailing gap holds; filled flags track bucket
    presence."""
    from ai_etl_framework_spark.operators.resample import (
        resample_interpolate,
    )

    rows = [
        (1, ts(0), 1.0),
        (1, ts(180), 4.0),
        (1, ts(300), None),  # observed bucket, NULL value
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sorted(
        resample_interpolate(df, step="1 hour").collect(),
        key=lambda r: r["bucket_start"],
    )
    values = [r["value"] for r in out]
    filled = [r["filled"] for r in out]
    assert values == pytest.approx([1.0, 2.0, 3.0, 4.0, 4.0, 4.0])
    # h1/h2/h4 densified; h0/h3/h5 observed (h5 observed but NULL agg)
    assert filled == [False, True, True, False, True, False]


def test_resample_interpolate_leading_null_and_uneven(spark):
    from ai_etl_framework_spark.operators.resample import (
        resample_interpolate,
    )

    rows = [
        (1, ts(0), None),    # leading observed-but-NULL bucket
        (1, ts(60), 10.0),
        (1, ts(240), 1.0),   # 3h later: interp 7.0, 4.0
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sorted(
        resample_interpolate(df, step="1 hour").collect(),
        key=lambda r: r["bucket_start"],
    )
    values = [r["value"] for r in out]
    assert values[0] is None  # nothing before to anchor
    assert values[1:] == pytest.approx([10.0, 7.0, 4.0, 1.0])


# ---------------------------------------------------------------------------
# level shifts
# ---------------------------------------------------------------------------

def test_level_shifts_detects_step(spark):
    """Flat 0s then flat 10s: the boundary bucket scores the full
    jump; full-window trimming drops the first/last k-edge rows."""
    from ai_etl_framework_spark.operators.timeseries import level_shifts

    xs = [0.0] * 10 + [10.0] * 10
    rows = [("k", day(i), x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = sorted(
        level_shifts(
            df, "value", "ts", key_col="k" if False else "key",
            bucket_unit="day", k=3, threshold=1.0,
        ).collect(),
        key=lambda r: r["bucket"],
    )
    # buckets 0..2 lack 3 preceding; 18,19 lack 3 following (k=3:
    # after-window needs current+2) -> rows for day 3..17
    assert out[0]["bucket"] == day(3) and out[-1]["bucket"] == day(17)
    by = {r["bucket"]: r for r in out}
    jump = by[day(10)]
    assert jump["before_mean"] == 0.0 and jump["after_mean"] == 10.0
    assert jump["shift"] == 10.0
    assert jump["is_shift"] is True
    flat = by[day(5)]
    assert flat["shift"] == 0.0 and flat["is_shift"] is False


def test_level_shifts_constant_series_null_score(spark):
    from ai_etl_framework_spark.operators.timeseries import level_shifts

    rows = [("k", day(i), 5.0) for i in range(12)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = level_shifts(df, "value", "ts", key_col="key", k=3).collect()
    assert out, "full windows exist"
    for r in out:
        assert r["score"] is None and r["is_shift"] is None
