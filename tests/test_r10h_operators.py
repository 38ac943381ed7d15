"""Pinned unit tests for the eighth r10 batch (x103–x104): revenue
bridge (the Δ-revenue invariant is the headline check) and DAU/WAU
stickiness (verified against a brute-force daily model)."""

from __future__ import annotations

import datetime as dt
import random

import pytest


# ---------------------------------------------------------------------------
# revenue_bridge
# ---------------------------------------------------------------------------

def _month(y, m, d=5):
    return dt.datetime(y, m, d)


def test_bridge_hand_math(spark):
    from ai_etl_framework_spark.operators.retention import revenue_bridge

    rows = [
        # u1: 100 (Jan) → 150 (Feb, +50 expansion) → gone (churn Mar)
        (1, _month(2024, 1), 100.0),
        (1, _month(2024, 2), 150.0),
        # u2: joins Feb at 80, contracts to 60 in Mar
        (2, _month(2024, 2), 80.0),
        (2, _month(2024, 3), 60.0),
        # u3: Jan only, resurrects in Mar (gap ⇒ churn Feb + new Mar)
        (3, _month(2024, 1), 40.0),
        (3, _month(2024, 3), 30.0),
    ]
    df = spark.createDataFrame(rows, "u long, t timestamp, a double")
    got = {
        r["month"].month: r
        for r in revenue_bridge(df, "u", "t", "a").collect()
    }
    jan = got[1]
    assert jan["new_rev"] == 140.0  # u1 100 + u3 40
    assert jan["expansion_rev"] == 0.0 and jan["churn_rev"] == 0.0
    feb = got[2]
    assert feb["new_rev"] == 80.0          # u2
    assert feb["expansion_rev"] == 50.0    # u1 100→150
    assert feb["churn_rev"] == -40.0       # u3's Jan revenue churns
    assert feb["net_change"] == 90.0       # 230 − 140
    mar = got[3]
    assert mar["new_rev"] == 30.0          # u3 resurrected
    assert mar["contraction_rev"] == -20.0  # u2 80→60
    assert mar["churn_rev"] == -150.0      # u1's Feb revenue
    assert mar["net_change"] == -140.0  # Σrev: Feb 230 → Mar 90
    # no April row: churn past the last observed month is not emitted
    assert set(got) == {1, 2, 3}


def test_bridge_delta_invariant_randomized(spark):
    """new + expansion + contraction + churn at m == Σrev(m) − Σrev(m−1)
    for every month after the first — the bridge's defining identity,
    on a randomized activity pattern with gaps."""
    from pyspark.sql import functions as F

    from ai_etl_framework_spark.operators.retention import revenue_bridge

    rng = random.Random(103)
    rows = []
    for u in range(40):
        for m in range(1, 7):
            if rng.random() < 0.6:
                rows.append((u, _month(2024, m), round(rng.uniform(10, 200), 2)))
    df = spark.createDataFrame(rows, "u long, t timestamp, a double")
    bridge = {
        r["month"]: r for r in revenue_bridge(df, "u", "t", "a").collect()
    }
    totals = {
        r["m"]: r["t"]
        for r in df.groupBy(
            F.date_trunc("month", "t").cast("date").alias("m")
        )
        .agg(F.sum("a").alias("t"))
        .collect()
    }
    months = sorted(totals)
    for prev, cur in zip(months, months[1:]):
        want = totals[cur] - totals[prev]
        r = bridge[cur]
        got = (
            r["new_rev"] + r["expansion_rev"] + r["contraction_rev"]
            + r["churn_rev"]
        )
        assert got == pytest.approx(want, abs=0.05), cur
        assert r["net_change"] == pytest.approx(want, abs=0.05)
    # first month: everything is new
    f = bridge[months[0]]
    assert f["new_rev"] == pytest.approx(totals[months[0]], abs=0.05)


# ---------------------------------------------------------------------------
# stickiness
# ---------------------------------------------------------------------------

def test_stickiness_vs_brute_force(spark):
    from ai_etl_framework_spark.operators.activity import stickiness

    rng = random.Random(104)
    rows = []
    active = {}
    for u in range(25):
        for d in range(1, 25):
            if rng.random() < 0.3:
                rows.append((u, dt.datetime(2024, 1, d, rng.randint(0, 23))))
                active.setdefault(d, set()).add(u)
    df = spark.createDataFrame(rows, "u long, t timestamp")
    got = {
        r["day"].day: r for r in stickiness(df, "u", "t", 1, 7).collect()
    }
    lo, hi = min(active), max(active)
    assert set(got) == set(range(lo, hi + 1))
    for d in range(lo, hi + 1):
        short = len(active.get(d, set()))
        long_ = len(set().union(*(active.get(x, set()) for x in range(d - 6, d + 1))))
        r = got[d]
        assert r["active_short"] == short, d
        assert r["active_long"] == long_, d
        if long_:
            assert r["stickiness"] == pytest.approx(round(short / long_, 6))


def test_stickiness_guard(spark):
    from ai_etl_framework_spark.operators.activity import stickiness

    df = spark.createDataFrame([(1, _month(2024, 1))], "u long, t timestamp")
    with pytest.raises(ValueError, match="short_days"):
        stickiness(df, "u", "t", 7, 7)


# ---------------------------------------------------------------------------
# containment (x105)
# ---------------------------------------------------------------------------

def test_containment_hand_math(spark):
    from ai_etl_framework_spark.operators.audit import containment

    a = spark.createDataFrame(
        [(1,), (2,), (3,), (3,), (None,)], "v long"
    )
    b = spark.createDataFrame([(2,), (3,), (4,), (5,)], "v long")
    r = containment(a, "v", b, "v").collect()[0]
    assert r["n_a"] == 3 and r["n_b"] == 4 and r["n_common"] == 2
    assert r["containment_a_in_b"] == pytest.approx(round(2 / 3, 6))
    assert r["containment_b_in_a"] == 0.5
    assert r["jaccard"] == pytest.approx(0.4)  # 2 / (3+4−2)


def test_containment_perfect_fk(spark):
    from ai_etl_framework_spark.operators.audit import containment

    child = spark.createDataFrame([(1,), (1,), (2,)], "v long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "v long")
    r = containment(child, "v", parent, "v").collect()[0]
    assert r["containment_a_in_b"] == 1.0  # the FK signal
    assert r["containment_b_in_a"] == pytest.approx(round(2 / 3, 6))


# ---------------------------------------------------------------------------
# mix_shift (x106)
# ---------------------------------------------------------------------------

def test_mix_shift_identity_randomized(spark):
    """Σ over segments of (rate + mix + interaction) == Δ overall mean
    — the Oaxaca identity, including an appearing segment."""
    from ai_etl_framework_spark.operators.drift import mix_shift

    rng = random.Random(106)
    base_rows = [
        ("s" + str(rng.randint(0, 3)), rng.uniform(0, 10)) for _ in range(300)
    ]
    cur_rows = [
        ("s" + str(rng.randint(0, 4)), rng.uniform(2, 12)) for _ in range(250)
    ]  # s4 appears only in current
    b = spark.createDataFrame(base_rows, "seg string, v double")
    c = spark.createDataFrame(cur_rows, "seg string, v double")
    out = mix_shift(b, c, "seg", "v").collect()
    total = sum(
        r["rate_effect"] + r["mix_effect"] + r["interaction"] for r in out
    )
    overall_b = sum(v for _, v in base_rows) / len(base_rows)
    overall_c = sum(v for _, v in cur_rows) / len(cur_rows)
    assert total == pytest.approx(overall_c - overall_b, abs=1e-4)
    # per-row: three terms sum to total_effect
    for r in out:
        assert (
            r["rate_effect"] + r["mix_effect"] + r["interaction"]
        ) == pytest.approx(r["total_effect"], abs=5e-6)
    # the appearing segment's contribution is pure interaction
    s4 = next(r for r in out if r["seg" "ment"] == "s4")
    assert s4["rate_effect"] == 0.0 and s4["mix_effect"] == 0.0
    assert s4["interaction"] == s4["total_effect"]


def test_mix_shift_pure_rate_and_pure_mix(spark):
    from ai_etl_framework_spark.operators.drift import mix_shift

    # same mix, rates move → all rate effect
    b = spark.createDataFrame(
        [("a", 1.0)] * 2 + [("b", 2.0)] * 2, "seg string, v double"
    )
    c = spark.createDataFrame(
        [("a", 2.0)] * 2 + [("b", 4.0)] * 2, "seg string, v double"
    )
    out = {r["segment"]: r for r in mix_shift(b, c, "seg", "v").collect()}
    assert all(r["mix_effect"] == 0.0 for r in out.values())
    assert out["a"]["rate_effect"] == 0.5  # 0.5 share · Δ1.0

    # same rates, mix moves → all mix effect
    c2 = spark.createDataFrame(
        [("a", 1.0)] * 3 + [("b", 2.0)] * 1, "seg string, v double"
    )
    out2 = {r["segment"]: r for r in mix_shift(b, c2, "seg", "v").collect()}
    assert all(r["rate_effect"] == 0.0 for r in out2.values())
    assert out2["a"]["mix_effect"] == 0.25  # share 0.5→0.75 · rate 1


# ---------------------------------------------------------------------------
# log_odds_terms (x107)
# ---------------------------------------------------------------------------

def test_log_odds_vs_hand_model(spark):
    """Differential vs a Counter-based reference of the Monroe et al.
    formula on a tiny corpus where group A over-uses 'apple'."""
    import math
    from collections import Counter

    from ai_etl_framework_spark.operators.collocations import log_odds_terms

    docs = [
        ("A", "apple apple apple banana fruit"),
        ("A", "apple pie apple sauce fruit"),
        ("B", "banana bread banana split fruit"),
        ("B", "grape soda banana fruit pie"),
    ]
    df = spark.createDataFrame(docs, "g string, text string")
    got = {
        (r["g"], r["term"]): r
        for r in log_odds_terms(
            df, "g", "text", min_count=2, top_k=3, prior_strength=5.0
        ).collect()
    }

    # reference
    cells = Counter()
    for g, t in docs:
        for w in t.split():
            cells[(g, w)] += 1
    cw = Counter()
    for (g, w), y in cells.items():
        cw[w] += y
    vocab = {w for w, c in cw.items() if c >= 2}
    n = sum(cw[w] for w in vocab)
    # group totals over the PRUNED vocabulary (consistent with n —
    # the Monroe et al. convention; see operators/collocations.py)
    ng = Counter()
    for (g, w), y in cells.items():
        if w in vocab:
            ng[g] += y
    a0 = 5.0

    def z_of(g, w):
        y = cells[(g, w)]
        aw = cw[w] * (a0 / n)
        yr = cw[w] - y
        nr = n - ng[g]
        delta = math.log((y + aw) / (ng[g] + a0 - y - aw)) - math.log(
            (yr + aw) / (nr + a0 - yr - aw)
        )
        return delta / math.sqrt(1 / (y + aw) + 1 / (yr + aw))

    for (g, w), r in got.items():
        assert w in vocab
        assert r["z"] == pytest.approx(round(z_of(g, w), 6), abs=2e-6)
    # 'apple' is A's most distinctive term; 'banana' is B's
    top_a = max((r for (g, _), r in got.items() if g == "A"), key=lambda r: r["z"])
    top_b = max((r for (g, _), r in got.items() if g == "B"), key=lambda r: r["z"])
    assert top_a["term"] == "apple" and top_b["term"] == "banana"
    assert top_a["n_group"] == 5 and top_a["n_rest"] == 0


def test_log_odds_guards(spark):
    from ai_etl_framework_spark.operators.collocations import log_odds_terms

    df = spark.createDataFrame([("A", "x")], "g string, text string")
    with pytest.raises(ValueError, match="min_count"):
        log_odds_terms(df, "g", min_count=0)
    with pytest.raises(ValueError, match="prior_strength"):
        log_odds_terms(df, "g", prior_strength=0.0)


def test_log_odds_rare_term_group_not_dropped(spark):
    """A group dominated by below-min_count terms must still score its
    pruned-vocab terms. Under the pre-r11 mixed-total convention its
    rest-total nr = n − ng went NEGATIVE (ng counted pruned tokens, n
    didn't) and the positivity guard silently dropped every row; with
    consistent pruned totals nr ≥ 0 always and the rows survive."""
    from ai_etl_framework_spark.operators.collocations import log_odds_terms

    docs = [
        # group R: 3 pruned-vocab tokens + 5 unique rare tokens; its
        # UNPRUNED total (8) equals the pruned corpus total (8), so
        # the old mixed-total nr = 8 − 8 = 0 and den_r went negative
        ("R", "shared shared common u1 u2 u3 u4 u5"),
        ("S", "shared shared shared common common"),
    ]
    df = spark.createDataFrame(docs, "g string, text string")
    out = log_odds_terms(
        df, "g", "text", min_count=2, top_k=5, prior_strength=1.0
    ).collect()
    by_group = {r["g"] for r in out}
    assert "R" in by_group, "rare-term-heavy group was dropped"
    for r in out:
        # n_rest = pruned-vocab corpus total minus the group's own
        # count — non-negative by construction under consistent totals
        assert r["n_rest"] >= 0


# ---------------------------------------------------------------------------
# association_matrix (x108)
# ---------------------------------------------------------------------------

def test_association_matrix_hand_math(spark):
    """Perfectly dependent pair → V = 1 and MI = entropy; independent
    pair → χ² ≈ 0, MI ≈ 0."""
    import math

    from ai_etl_framework_spark.operators.stats import association_matrix

    rows = []
    for i in range(120):
        a = "x" if i % 2 == 0 else "y"
        dep = a.upper()          # fully determined by a
        ind = "p" if i % 4 < 2 else "q"  # independent of a (period 4 vs 2)
        rows.append((a, dep, ind))
    df = spark.createDataFrame(rows, "a string, dep string, ind string")
    got = {
        (r["col_a"], r["col_b"]): r
        for r in association_matrix(df, ["a", "dep", "ind"]).collect()
    }
    full = got[("a", "dep")]
    assert full["cramers_v"] == 1.0
    assert full["mutual_info"] == pytest.approx(round(math.log(2), 6))
    indep = got[("a", "ind")]
    assert indep["chi2"] == pytest.approx(0.0, abs=1e-6)
    assert indep["mutual_info"] == pytest.approx(0.0, abs=1e-6)
    assert full["n"] == 120 and full["dof"] == 1


def test_association_matrix_guards_and_single_level(spark):
    from ai_etl_framework_spark.operators.stats import association_matrix

    df = spark.createDataFrame(
        [("x", "only"), ("y", "only")], "a string, b string"
    )
    r = association_matrix(df, ["a", "b"]).collect()[0]
    assert r["cramers_v"] is None and r["dof"] == 0  # single-level side

    with pytest.raises(ValueError, match="max_columns"):
        association_matrix(df, [f"c{i}" for i in range(13)])
    with pytest.raises(ValueError, match="at least two"):
        association_matrix(df, ["a"])


# ---------------------------------------------------------------------------
# group_sample (x109) / dimensional_rollup (x110)
# ---------------------------------------------------------------------------

def test_group_sample_exact_quota_and_determinism(spark):
    from ai_etl_framework_spark.operators.sampling import group_sample

    rows = [(i, "g" + str(i % 3)) for i in range(60)] + [(99, None)]
    df = spark.createDataFrame(rows, "id long, g string")
    a = sorted(map(tuple, group_sample(df, "g", "id", k=5).collect()))
    b = sorted(
        map(tuple, group_sample(df.repartition(13), "g", "id", k=5).collect())
    )
    assert a == b and len(a) == 15  # exact quota, repartition-stable
    # small group returns all rows
    tiny = spark.createDataFrame([(1, "g"), (2, "g")], "id long, g string")
    assert group_sample(tiny, "g", "id", k=5).count() == 2
    # different salt → (almost surely) different set
    c = sorted(map(tuple, group_sample(df, "g", "id", k=5, salt="z").collect()))
    assert c != a
    with pytest.raises(ValueError, match="k must"):
        group_sample(df, "g", "id", k=0)


def test_dimensional_rollup_ledger(spark):
    from ai_etl_framework_spark.operators.rollups import dimensional_rollup

    rows = [
        ("a", "x", 10.0), ("a", "x", 20.0), ("a", "y", 5.0),
        ("b", "x", 1.0), ("b", None, 99.0), (None, "x", 7.0),
    ]
    df = spark.createDataFrame(rows, "p string, s string, v double")
    got = {
        (r["p"], r["s"]): r
        for r in dimensional_rollup(df, ["p", "s"], "v").collect()
    }
    # NULL-dim rows dropped: only 4 valid rows participate
    grand = got[("(all)", "(all)")]
    assert grand["level"] == 3 and grand["n_rows"] == 4
    assert grand["total"] == 36.0
    assert got[("a", "(all)")]["total"] == 35.0
    assert got[("a", "(all)")]["level"] == 1
    assert got[("a", "x")]["total"] == 30.0 and got[("a", "x")]["level"] == 0
    # subtotal ledger: levels sum to the grand total
    assert sum(
        r["total"] for r in got.values() if r["level"] == 0
    ) == pytest.approx(grand["total"])
    assert sum(
        r["total"] for r in got.values() if r["level"] == 1
    ) == pytest.approx(grand["total"])
    with pytest.raises(ValueError, match="at least one"):
        dimensional_rollup(df, [], "v")


# ---------------------------------------------------------------------------
# theil_sen_trend (x111)
# ---------------------------------------------------------------------------

def test_theil_sen_vs_numpy_model(spark):
    """Differential vs the direct pairwise-median on a noisy line
    with ONE wild outlier — the OLS slope bends, Theil–Sen holds."""
    import statistics

    from ai_etl_framework_spark.operators.trend import theil_sen_trend

    rng = random.Random(111)
    pts = []
    for d in range(25):
        y = 2.0 + 0.5 * d + rng.gauss(0, 0.1)
        pts.append((d, y))
    pts[12] = (12, 500.0)  # the wild day
    rows = [
        ("k", dt.datetime(2024, 1, 1 + d, h), y + rng.gauss(0, 0.01))
        for d, y in pts
        for h in (9, 15)
    ]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    got = theil_sen_trend(df, "k", "t", "v", bucket_unit="day").collect()[0]

    # reference: daily means then exact pairwise-slope median
    daily = {}
    for kk, t, v in rows:
        daily.setdefault(t.day, []).append(v)
    series = sorted((d - 1, statistics.mean(vs)) for d, vs in daily.items())
    slopes = [
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(series)
        for (x2, y2) in series[i + 1:]
    ]
    want = statistics.median(slopes)
    assert got["n_points"] == 25
    assert got["n_pairs"] == 25 * 24 // 2
    assert got["slope"] == pytest.approx(round(want, 6), abs=2e-6)
    # robust: the outlier day cannot bend the slope off ~0.5
    assert 0.4 < got["slope"] < 0.6
    icepts = [y - want * x for x, y in series]
    assert got["intercept"] == pytest.approx(
        round(statistics.median(icepts), 6), abs=2e-6
    )


def test_theil_sen_guards(spark):
    from ai_etl_framework_spark.operators.trend import theil_sen_trend

    rows = [("k", dt.datetime(2024, 1, 1 + d), float(d)) for d in range(10)]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    with pytest.raises(ValueError, match="max_points"):
        theil_sen_trend(df, "k", "t", "v", max_points=5)
    with pytest.raises(ValueError, match="bucket_unit"):
        theil_sen_trend(df, "k", "t", "v", bucket_unit="year")
    # <2 buckets → no row
    one = spark.createDataFrame(rows[:1], "k string, t timestamp, v double")
    assert theil_sen_trend(one, "k", "t", "v").count() == 0


# ---------------------------------------------------------------------------
# vocab_novelty (x112)
# ---------------------------------------------------------------------------

def test_vocab_novelty_hand_math(spark):
    from ai_etl_framework_spark.operators.novelty import vocab_novelty

    rows = [
        (dt.datetime(2024, 1, 1), "apple banana apple"),
        (dt.datetime(2024, 1, 1), "banana cherry"),
        (dt.datetime(2024, 1, 2), "apple durian"),
        (dt.datetime(2024, 1, 4), "durian elder fig"),
        (None, "ghost words"),
    ]
    df = spark.createDataFrame(rows, "t timestamp, text string")
    got = {r["period"].day: r for r in vocab_novelty(df, "t", "text").collect()}
    d1 = got[1]  # apple banana cherry — all new
    assert d1["n_terms"] == 3 and d1["n_new"] == 3 and d1["new_ratio"] == 1.0
    assert d1["vocab_cum"] == 3
    d2 = got[2]  # apple (old) + durian (new)
    assert d2["n_terms"] == 2 and d2["n_new"] == 1 and d2["new_ratio"] == 0.5
    assert d2["vocab_cum"] == 4
    d4 = got[4]  # durian old; elder fig new
    assert d4["n_new"] == 2 and d4["vocab_cum"] == 6
    assert 3 not in got  # empty day emits nothing
    # NULL-ts row contributed nothing
    assert sum(r["n_new"] for r in got.values()) == 6


def test_vocab_novelty_within_period_multiplicity(spark):
    """A term repeated 100× in one period still counts once."""
    from ai_etl_framework_spark.operators.novelty import vocab_novelty

    rows = [(dt.datetime(2024, 1, 1), "same " * 100)] * 3
    df = spark.createDataFrame(rows, "t timestamp, text string")
    r = vocab_novelty(df, "t", "text").collect()[0]
    assert r["n_terms"] == 1 and r["n_new"] == 1 and r["vocab_cum"] == 1
