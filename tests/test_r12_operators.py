"""r12 operator batch: multi-touch linear attribution, straight-line
monthly revenue recognition, per-state dwell time — hand-math pins +
the conservation invariants each model is defined by."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from ai_etl_framework_spark.operators.attribution import linear_attribution
from ai_etl_framework_spark.operators.calendar import recognize_monthly
from ai_etl_framework_spark.operators.sequences import state_dwell

T0 = datetime(2024, 1, 10, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


# -- linear_attribution -------------------------------------------------


def test_linear_attribution_hand_math(spark):
    df = _ev(spark, [
        # user 1: click + view inside the window, purchase of 10 -> 5 each
        (1, T0 - timedelta(hours=2), 1, "click", None),
        (2, T0 - timedelta(hours=1), 1, "view", None),
        (3, T0, 1, "purchase", 10.0),
        # user 2: no touches -> (none) gets the full 7
        (4, T0, 2, "purchase", 7.0),
        # user 3: two clicks -> 4 each; the touch AT the conversion
        # instant is NOT credited (half-open upper bound)
        (5, T0 - timedelta(days=1), 3, "click", None),
        (6, T0 - timedelta(hours=3), 3, "click", None),
        (7, T0, 3, "view", None),
        (8, T0, 3, "purchase", 8.0),
    ])
    out = {r["channel"]: r for r in linear_attribution(
        df, ["purchase"], ["click", "view"]).collect()}
    assert out["click"]["attributed_value"] == pytest.approx(5.0 + 8.0)
    assert out["click"]["n_credits"] == 3
    assert out["view"]["attributed_value"] == pytest.approx(5.0)
    assert out["view"]["n_credits"] == 1
    assert out["(none)"]["attributed_value"] == pytest.approx(7.0)
    assert out["(none)"]["n_credits"] == 1


def test_linear_attribution_window_bounds(spark):
    # lower bound is INCLUSIVE (exactly lookback before), upper EXCLUSIVE
    df = _ev(spark, [
        (1, T0 - timedelta(days=3), 1, "click", None),   # exactly -3d: in
        (2, T0 - timedelta(days=3, seconds=1), 1, "view", None),  # out
        (3, T0, 1, "view", None),                        # at conv ts: out
        (4, T0, 1, "purchase", 6.0),
    ])
    out = {r["channel"]: r for r in linear_attribution(
        df, ["purchase"], ["click", "view"], lookback="3 days").collect()}
    assert set(out) == {"click"}
    assert out["click"]["attributed_value"] == pytest.approx(6.0)


def test_linear_attribution_value_conservation(spark):
    # the linear-model invariant: total attributed == total conversion
    # value, whatever the touch layout
    rows, eid = [], 0
    for u in range(20):
        for k in range(u % 4):
            eid += 1
            rows.append((eid, T0 - timedelta(hours=k + 1), u, "click", None))
        eid += 1
        rows.append((eid, T0, u, "purchase", float(u + 1)))
    df = _ev(spark, rows)
    out = linear_attribution(df, ["purchase"], ["click", "view"]).collect()
    total = sum(r["attributed_value"] for r in out)
    assert total == pytest.approx(sum(range(1, 21)), abs=0.05)
    with pytest.raises(ValueError, match="at least one"):
        linear_attribution(df, [], ["click"])


# -- recognize_monthly ---------------------------------------------------


def test_recognize_monthly_hand_math(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-15", 300.0, 3),   # Jan/Feb/Mar: 100 each
            ("2024-02-01", 50.0, 1),    # Feb: 50
            ("2024-01-31", None, 2),    # NULL amount drops
            (None, 10.0, 2),            # NULL date drops
            ("2024-03-01", 10.0, 0),    # non-positive term drops
        ],
        "d string, amt double, term int",
    )
    df = df.selectExpr("CAST(d AS DATE) AS d", "amt", "term")
    out = {str(r["month"]): r for r in recognize_monthly(df, "d", "amt", "term").collect()}
    assert out["2024-01-01"]["recognized"] == pytest.approx(100.0)
    assert out["2024-02-01"]["recognized"] == pytest.approx(150.0)
    assert out["2024-02-01"]["n_contracts"] == 2
    assert out["2024-03-01"]["recognized"] == pytest.approx(100.0)
    assert len(out) == 3


def test_recognize_monthly_conservation(spark):
    # sum of the schedule equals the summed bookings (term > 0 rows)
    rows = [(f"2024-{(i % 12) + 1:02d}-07", float(100 * (i + 1)), (i % 5) + 1)
            for i in range(40)]
    df = spark.createDataFrame(rows, "d string, amt double, term int").selectExpr(
        "CAST(d AS DATE) AS d", "amt", "term")
    out = recognize_monthly(df, "d", "amt", "term").collect()
    assert sum(r["recognized"] for r in out) == pytest.approx(
        sum(a for _, a, _ in rows), abs=0.05)


# -- state_dwell ---------------------------------------------------------


def test_state_dwell_hand_math(spark):
    df = _ev(spark, [
        (1, T0, 1, "click", None),
        (2, T0 + timedelta(seconds=10), 1, "view", None),
        (3, T0 + timedelta(seconds=30), 1, "purchase", None),
        # user 2: tie on ts -> 0-second dwell for the first by event_id
        (4, T0, 2, "click", None),
        (5, T0, 2, "view", None),
        # NULL type drops entirely (neither source nor successor)
        (6, T0 + timedelta(seconds=5), 2, None, None),
    ])
    out = {r["event_type"]: r for r in state_dwell(df).collect()}
    assert out["click"]["n_intervals"] == 2
    assert out["click"]["total_dwell_s"] == pytest.approx(10.0)  # 10 + 0
    assert out["click"]["avg_dwell_s"] == pytest.approx(5.0)
    assert out["view"]["n_intervals"] == 1
    assert out["view"]["total_dwell_s"] == pytest.approx(20.0)
    # each user's LAST event has no successor
    assert "purchase" not in out


def test_state_dwell_never_crosses_users(spark):
    df = _ev(spark, [
        (1, T0, 1, "click", None),
        (2, T0 + timedelta(days=9), 2, "view", None),
    ])
    assert state_dwell(df).collect() == []


# -- interval_coverage ----------------------------------------------------


def test_interval_coverage_hand_math(spark):
    from ai_etl_framework_spark.operators.intervals import interval_coverage

    rows = [
        # key a: [0,10] [5,20] overlap -> island [0,20]; [20,25] touches
        # (start == running max end) -> SAME island [0,25]; [100,110]
        # is a second island
        ("a", T0, T0 + timedelta(seconds=10)),
        ("a", T0 + timedelta(seconds=5), T0 + timedelta(seconds=20)),
        ("a", T0 + timedelta(seconds=20), T0 + timedelta(seconds=25)),
        ("a", T0 + timedelta(seconds=100), T0 + timedelta(seconds=110)),
        # key b: nested interval never extends the island
        ("b", T0, T0 + timedelta(seconds=60)),
        ("b", T0 + timedelta(seconds=10), T0 + timedelta(seconds=20)),
        # NULL key drops
        (None, T0, T0 + timedelta(seconds=1)),
    ]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    out = {r["k"]: r for r in interval_coverage(df, "k", "s", "e").collect()}
    assert out["a"]["n_intervals"] == 4
    assert out["a"]["n_islands"] == 2
    assert out["a"]["covered_s"] == pytest.approx(25.0 + 10.0)
    assert out["a"]["max_island_s"] == pytest.approx(25.0)
    assert out["b"]["n_islands"] == 1
    assert out["b"]["covered_s"] == pytest.approx(60.0)
    assert set(out) == {"a", "b"}


def test_interval_coverage_reversed_fails_loud(spark):
    from ai_etl_framework_spark.operators.intervals import interval_coverage

    df = spark.createDataFrame(
        [("a", T0, T0 - timedelta(seconds=1))], "k string, s timestamp, e timestamp"
    )
    with pytest.raises(ValueError, match="end < start"):
        interval_coverage(df, "k", "s", "e")


# -- grouped_auc ----------------------------------------------------------


def test_grouped_auc_hand_math(spark):
    from ai_etl_framework_spark.operators.evaluation import grouped_auc

    rows = [
        # segment g1: perfect ranking -> auc 1.0
        ("g1", 0.9, 1), ("g1", 0.8, 1), ("g1", 0.2, 0), ("g1", 0.1, 0),
        # segment g2: anti-ranking -> auc 0.0
        ("g2", 0.9, 0), ("g2", 0.1, 1),
        # segment g3: all scores tied -> auc 0.5 (ties counted half)
        ("g3", 0.5, 1), ("g3", 0.5, 0),
        # segment g4: single class -> auc NULL
        ("g4", 0.7, 1), ("g4", 0.3, 1),
    ]
    df = spark.createDataFrame(rows, "g string, s double, y int")
    out = {r["g"]: r for r in grouped_auc(df, "g", "s", "y").collect()}
    assert out["g1"]["auc"] == pytest.approx(1.0)
    assert out["g2"]["auc"] == pytest.approx(0.0)
    assert out["g3"]["auc"] == pytest.approx(0.5)
    assert out["g4"]["auc"] is None
    assert out["g4"]["n_pos"] == 2 and out["g4"]["n_neg"] == 0


def test_grouped_auc_matches_global_and_sklearn_formula(spark):
    """Each segment's AUC equals the brute-force pair probability
    P(score_pos > score_neg) + 0.5 P(tie), per segment."""
    import itertools
    import random

    from ai_etl_framework_spark.operators.evaluation import grouped_auc

    rng = random.Random(7)
    rows = [
        (f"g{i % 3}", round(rng.random(), 2), rng.randint(0, 1))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "g string, s double, y int")
    out = {r["g"]: r["auc"] for r in grouped_auc(df, "g", "s", "y").collect()}
    for g in ("g0", "g1", "g2"):
        pos = [s for gg, s, y in rows if gg == g and y == 1]
        neg = [s for gg, s, y in rows if gg == g and y == 0]
        wins = sum(
            1.0 if p > n else (0.5 if p == n else 0.0)
            for p, n in itertools.product(pos, neg)
        )
        assert out[g] == pytest.approx(round(wins / (len(pos) * len(neg)), 6))


def test_grouped_auc_domain_checks(spark):
    from ai_etl_framework_spark.operators.evaluation import grouped_auc

    df = spark.createDataFrame([("g", 0.5, 2)], "g string, s double, y int")
    with pytest.raises(ValueError, match="binary"):
        grouped_auc(df, "g", "s", "y")
    df2 = spark.createDataFrame(
        [("g", float(i) / 10, i % 2) for i in range(10)], "g string, s double, y int"
    )
    with pytest.raises(ValueError, match="max_distinct"):
        grouped_auc(df2, "g", "s", "y", max_distinct=3)


# -- cluster_canonical -----------------------------------------------------


def test_cluster_canonical_hand_math(spark):
    from ai_etl_framework_spark.operators.dedup import cluster_canonical

    docs = spark.createDataFrame(
        [
            (1, 10.0), (2, 30.0), (3, 30.0),   # cluster {1,2,3}: best q=30
            (4, None), (5, None),              # cluster {4,5}: all-NULL q
            (6, 5.0),                          # singleton: no pairs, no row
        ],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    out = {r["cluster"]: r for r in cluster_canonical(
        docs, "doc_id", pairs, "quality").collect()}
    # best quality wins; tie (2 vs 3 both 30.0) -> min id
    assert out[1]["canonical"] == 2
    assert out[1]["n_members"] == 3 and out[1]["n_dropped"] == 2
    assert out[1]["best_quality"] == 30.0
    # all-NULL cluster falls back to min id
    assert out[4]["canonical"] == 4
    assert out[4]["best_quality"] is None
    # NULL quality never beats a measured one
    docs2 = spark.createDataFrame(
        [(1, None), (2, 1.0)], "doc_id long, quality double"
    )
    pairs2 = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out2 = cluster_canonical(docs2, "doc_id", pairs2, "quality").collect()
    assert out2[0]["canonical"] == 2
    # singletons never appear
    assert set(out) == {1, 4}
