"""Pinned unit tests for the fifth r10 batch (x90–x94): RFM
segmentation, weighted percentiles, period-over-period growth,
cohort LTV, inter-arrival stats. Oracle twins are swept by
test_oracle_parity.py; these pin semantics against hand math and the
window≡distributed equality."""

from __future__ import annotations

import datetime as dt

import pytest


def ts(d, h=0):
    return dt.datetime(2024, 1, d, h)


# ---------------------------------------------------------------------------
# rfm_segments
# ---------------------------------------------------------------------------

def _orders(spark, n_cust=97, per_cust=3):
    import random

    rng = random.Random(90)
    rows = []
    for c in range(1, n_cust + 1):
        for k in range(rng.randint(1, per_cust)):
            rows.append(
                (c, ts(rng.randint(1, 28)), round(rng.uniform(10, 500), 2))
            )
    return spark.createDataFrame(rows, "c long, t timestamp, a double")


def test_rfm_window_equals_distributed(spark):
    from ai_etl_framework_spark.operators.rfm import rfm_segments

    df = _orders(spark)
    w = sorted(map(tuple, rfm_segments(df, "c", "t", "a").collect()))
    d = sorted(
        map(
            tuple,
            rfm_segments(df, "c", "t", "a", method="distributed").collect(),
        )
    )
    assert w == d and len(w) > 5


def test_rfm_scores_and_labels(spark):
    """4 customers, 2 tiles: hand-checkable quartering + exhaustive
    label coverage on a 5-tile frame."""
    from ai_etl_framework_spark.operators.rfm import rfm_segments

    rows = [
        # cust 1: 1 old cheap order      → r=1, f=1, m=1
        (1, ts(1), 10.0),
        # cust 2: 2 recent big orders    → r=2, f=2, m=2
        (2, ts(20), 500.0),
        (2, ts(21), 500.0),
    ]
    df = spark.createDataFrame(rows, "c long, t timestamp, a double")
    got = {
        (r["r_score"], r["f_score"], r["m_score"]): r
        for r in rfm_segments(df, "c", "t", "a", n_tiles=2).collect()
    }
    assert set(got) == {(1, 1, 1), (2, 2, 2)}
    # anchor = max ts = cust2's last order: recency 20 days vs 0
    assert got[(1, 1, 1)]["avg_recency_days"] == 20.0
    assert got[(2, 2, 2)]["avg_recency_days"] == 0.0
    assert got[(2, 2, 2)]["avg_monetary"] == 1000.0
    # n_tiles=2 → labels resolve through the ≤-branches
    assert got[(1, 1, 1)]["segment"] == "hibernating"
    assert got[(2, 2, 2)]["segment"] == "hibernating"


def test_rfm_label_table_exhaustive():
    """Every (r, f) pair in 1..5² maps to exactly one label — the
    pinned decision table has no holes."""
    def label(r, f):
        if r >= 4 and f >= 4:
            return "champion"
        if r == 3 and f >= 4:
            return "loyal"
        if r >= 4 and f <= 3:
            return "promising"
        if r == 3 and f <= 3:
            return "needs_attention"
        if r <= 2 and f >= 3:
            return "at_risk"
        return "hibernating"

    seen = {label(r, f) for r in range(1, 6) for f in range(1, 6)}
    assert seen == {
        "champion",
        "loyal",
        "promising",
        "needs_attention",
        "at_risk",
        "hibernating",
    }


def test_rfm_guards(spark):
    from ai_etl_framework_spark.operators.rfm import rfm_segments

    df = _orders(spark, n_cust=5)
    with pytest.raises(ValueError, match="n_tiles"):
        rfm_segments(df, "c", "t", "a", n_tiles=1)
    with pytest.raises(ValueError, match="method"):
        rfm_segments(df, "c", "t", "a", method="nope")


def test_ntile_formula_matches_sql_ntile(spark):
    """The distributed path's positional formula reproduces SQL NTILE
    for every (n, k) in a grid — including the remainder rule."""
    from pyspark.sql import Window, functions as F

    from ai_etl_framework_spark.operators.rfm import _ntile_from_rn

    for n in (1, 4, 5, 7, 23):
        for k in (2, 3, 5, 8):
            df = spark.range(1, n + 1).select(
                F.col("id").alias("rn"),
                F.ntile(k).over(Window.orderBy("id")).alias("want"),
            )
            got = df.select(
                "want",
                _ntile_from_rn(F.col("rn"), F.lit(n), k).alias("got"),
            ).collect()
            assert all(r["want"] == r["got"] for r in got), (n, k)


# ---------------------------------------------------------------------------
# weighted_percentiles
# ---------------------------------------------------------------------------

def test_weighted_percentiles_hand_math(spark):
    from ai_etl_framework_spark.operators.scaling import weighted_percentiles

    # values 1..4 with weights 1,1,6,2 (W=10): cum 1,2,8,10
    rows = [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 6.0), ("g", 4.0, 2.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = weighted_percentiles(df, "g", "v", "w").collect()[0]
    assert out["p25"] == 3.0  # cum 8 ≥ 2.5 first at v=3
    assert out["p50"] == 3.0
    assert out["p75"] == 3.0  # 0.75·10 = 7.5 ≤ 8
    assert out["total_weight"] == 10.0 and out["n"] == 4


def test_weighted_percentiles_unit_weights_type1(spark):
    """All weights 1 ⇒ the classic type-1 quantile (index ⌈qn⌉)."""
    from ai_etl_framework_spark.operators.scaling import weighted_percentiles

    vals = [float(v) for v in range(1, 11)]
    df = spark.createDataFrame(
        [("g", v, 1.0) for v in vals], "g string, v double, w double"
    )
    out = weighted_percentiles(df, "g", "v", "w", qs=(0.1, 0.25, 0.5, 1.0)).collect()[0]
    assert out["p10"] == 1.0
    assert out["p25"] == 3.0
    assert out["p50"] == 5.0
    assert out["p100"] == 10.0


def test_weighted_percentiles_guards(spark):
    from ai_etl_framework_spark.operators.scaling import weighted_percentiles

    rows = [("g", 1.0, -1.0), ("g", 2.0, 0.0), ("g", 3.0, 5.0), ("g", None, 1.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = weighted_percentiles(df, "g", "v", "w").collect()[0]
    assert out["n"] == 1 and out["p50"] == 3.0  # w ≤ 0 and NULLs dropped

    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        weighted_percentiles(df, "g", "v", "w", qs=(0.0,))
    big = spark.createDataFrame(
        [("g", float(i), 1.0) for i in range(50)], "g string, v double, w double"
    )
    with pytest.raises(ValueError, match="max_distinct"):
        weighted_percentiles(big, "g", "v", "w", max_distinct=10)


# ---------------------------------------------------------------------------
# period_growth
# ---------------------------------------------------------------------------

def test_period_growth_observed_prev_and_zero(spark):
    from ai_etl_framework_spark.operators.timeseries import period_growth

    rows = [
        ("k", dt.datetime(2024, 1, 5), 100.0),
        ("k", dt.datetime(2024, 2, 5), 150.0),
        # March absent — April's prev is FEBRUARY (previous observed)
        ("k", dt.datetime(2024, 4, 5), 75.0),
        ("z", dt.datetime(2024, 1, 5), 0.0),
        ("z", dt.datetime(2024, 2, 5), 10.0),  # prev = 0 → growth NULL
    ]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    got = {
        (r["k"], r["bucket"].month): r
        for r in period_growth(df, "t", "v", key_col="k").collect()
    }
    assert got[("k", 1)]["growth_pct"] is None
    assert got[("k", 2)]["growth_pct"] == 50.0
    assert got[("k", 4)]["prev_total"] == 150.0
    assert got[("k", 4)]["growth_pct"] == -50.0
    assert got[("z", 2)]["growth_pct"] is None


def test_period_growth_ungrouped(spark):
    from ai_etl_framework_spark.operators.timeseries import period_growth

    rows = [(dt.datetime(2024, 1, 1), 10.0), (dt.datetime(2024, 2, 1), 30.0)]
    df = spark.createDataFrame(rows, "t timestamp, v double")
    got = sorted(
        period_growth(df, "t", "v").collect(), key=lambda r: r["bucket"]
    )
    assert got[1]["growth_pct"] == 200.0
    assert got[0]["prev_total"] is None


# ---------------------------------------------------------------------------
# cohort_ltv
# ---------------------------------------------------------------------------

def test_cohort_ltv_hand_math(spark):
    from ai_etl_framework_spark.operators.retention import cohort_ltv

    rows = [
        # cohort Jan: u1 spends 100 in Jan, 50 in Mar; u2 spends 200 in Jan
        (1, dt.datetime(2024, 1, 10), 100.0),
        (1, dt.datetime(2024, 3, 10), 50.0),
        (2, dt.datetime(2024, 1, 20), 200.0),
        # cohort Feb: u3
        (3, dt.datetime(2024, 2, 1), 40.0),
    ]
    df = spark.createDataFrame(rows, "u long, t timestamp, a double")
    got = {
        (r["cohort"].month, r["offset"]): r
        for r in cohort_ltv(df, "u", "t", "a").collect()
    }
    jan0 = got[(1, 0)]
    assert jan0["cohort_size"] == 2 and jan0["revenue"] == 300.0
    jan2 = got[(1, 2)]  # March = offset 2; offset 1 has NO row (observed only)
    assert (1, 1) not in got
    assert jan2["n_active"] == 1
    assert jan2["cum_revenue"] == 350.0
    assert jan2["ltv_per_user"] == 175.0
    assert got[(2, 0)]["cohort_size"] == 1


def test_cohort_ltv_guards(spark):
    from ai_etl_framework_spark.operators.retention import cohort_ltv

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)], "u long, t timestamp, a double"
    )
    with pytest.raises(ValueError, match="period"):
        cohort_ltv(df, "u", "t", "a", period="year")


# ---------------------------------------------------------------------------
# interarrival_stats
# ---------------------------------------------------------------------------

def test_interarrival_hand_math(spark):
    import statistics

    from ai_etl_framework_spark.operators.timeseries import interarrival_stats

    # gaps: 60, 60, 180 seconds
    rows = [
        ("k", ts(1, 0)),
        ("k", dt.datetime(2024, 1, 1, 0, 1)),
        ("k", dt.datetime(2024, 1, 1, 0, 2)),
        ("k", dt.datetime(2024, 1, 1, 0, 5)),
        ("solo", ts(1)),  # <2 events → no row
    ]
    df = spark.createDataFrame(rows, "k string, t timestamp")
    got = {r["k"]: r for r in interarrival_stats(df, "k", "t").collect()}
    assert set(got) == {"k"}
    r = got["k"]
    gaps = [60.0, 60.0, 180.0]
    m = statistics.mean(gaps)
    s = statistics.stdev(gaps)
    assert r["n_gaps"] == 3
    assert r["mean_gap_s"] == pytest.approx(round(m, 6))
    assert r["sd_gap_s"] == pytest.approx(round(s, 6), abs=1e-6)
    assert r["cv"] == pytest.approx(round(s / m, 6), abs=1e-6)
    assert r["burstiness"] == pytest.approx(round((s - m) / (s + m), 6), abs=1e-6)
    assert r["min_gap_s"] == 60.0 and r["max_gap_s"] == 180.0


def test_interarrival_all_tied_ts(spark):
    from ai_etl_framework_spark.operators.timeseries import interarrival_stats

    df = spark.createDataFrame(
        [("k", ts(1)), ("k", ts(1)), ("k", ts(1))], "k string, t timestamp"
    )
    r = interarrival_stats(df, "k", "t").collect()[0]
    # all gaps 0: mean 0, sd 0 → cv and burstiness both NULL (0 denom)
    assert r["mean_gap_s"] == 0.0 and r["sd_gap_s"] == 0.0
    assert r["cv"] is None and r["burstiness"] is None


# ---------------------------------------------------------------------------
# group_ranks tiebreak extension
# ---------------------------------------------------------------------------

def test_group_ranks_tiebreak_deterministic(spark):
    """With a unique tiebreak, the distributed ROW_NUMBER equals the
    single-window ROW_NUMBER over the same composite order."""
    import random

    from pyspark.sql import Window, functions as F

    from ai_etl_framework_spark.operators.ranks import group_ranks

    rng = random.Random(94)
    rows = [
        ("g" + str(i % 3), float(rng.randint(0, 5)), i) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    got = group_ranks(df, "g", "v", num_partitions=7, tiebreak_cols=("id",))
    w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
    check = got.withColumn("want", F.row_number().over(w)).where(
        F.col("want") != F.col("__rn")
    )
    assert check.count() == 0
