"""r11 batch-1 operator families: k-anonymity audit, price indexes,
activity streaks, Zipf fit, centroid silhouette, Poisson-bootstrap
CI, diff-in-differences — hand-math and differential evidence beside
the oracle-parity rows."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# k_anonymity (x113)
# ---------------------------------------------------------------------------

def _kanon_df(spark):
    rows = [
        # class (a, 1): 3 rows  -> violates k=5
        ("a", 1, 10.0), ("a", 1, 11.0), ("a", 1, 10.0),
        # class (a, 2): 6 rows  -> safe
        *[("a", 2, float(i)) for i in range(6)],
        # class (b, 1): 1 row   -> violates
        ("b", 1, 99.0),
        # class (NULL, 1): 2 rows -> NULLs group together, violates
        (None, 1, 5.0), (None, 1, None),
    ]
    return spark.createDataFrame(rows, "q1 string, q2 int, s double")


def test_k_anonymity_summary_hand_math(spark):
    from ai_etl_framework_spark.operators.privacy import k_anonymity_audit

    r = k_anonymity_audit(
        _kanon_df(spark), ["q1", "q2"], k=5, sensitive_col="s"
    ).first()
    assert r["n_rows"] == 12 and r["n_classes"] == 4
    assert r["min_class_size"] == 1
    assert r["n_classes_lt_k"] == 3
    assert r["n_rows_at_risk"] == 6
    assert r["risk_pct"] == pytest.approx(0.5)
    # class (a,1) has sensitive {10, 11} -> l=2; (b,1) l=1; (NULL,1)
    # has one non-NULL sensitive -> l=1; (a,2) l=6 -> min over >0 is 1
    assert r["min_l_diversity"] == 1
    assert r["n_classes_all_null_sensitive"] == 0


def test_k_anonymity_violations_and_guards(spark):
    from ai_etl_framework_spark.operators.privacy import (
        k_anonymity_audit,
        k_anonymity_violations,
    )

    v = k_anonymity_violations(_kanon_df(spark), ["q1", "q2"], k=5).collect()
    assert [(r["q1"], r["q2"], r["class_size"]) for r in v] == [
        ("b", 1, 1), (None, 1, 2), ("a", 1, 3)
    ]
    with pytest.raises(ValueError, match="quasi_cols"):
        k_anonymity_audit(_kanon_df(spark), [], k=5)
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_audit(_kanon_df(spark), ["q1"], k=1)
    with pytest.raises(ValueError, match="max_violations"):
        k_anonymity_violations(
            _kanon_df(spark), ["q1", "q2"], k=5, max_violations=2
        )


# ---------------------------------------------------------------------------
# price_index (x114)
# ---------------------------------------------------------------------------

def test_price_index_hand_math(spark):
    from ai_etl_framework_spark.operators.econ import price_index

    # two periods, two matched items + one item only in period 2
    # (excluded by the matched-sample rule)
    rows = [
        # item, period, revenue, qty  (unit price = rev/qty)
        ("A", "2024-01-01", 10.0, 10.0),   # p0=1, q0=10
        ("B", "2024-01-01", 40.0, 20.0),   # p0=2, q0=20
        ("A", "2024-02-01", 24.0, 12.0),   # p=2, q=12
        ("B", "2024-02-01", 30.0, 10.0),   # p=3, q=10
        ("C", "2024-02-01", 99.0, 1.0),    # no base cell -> dropped
    ]
    df = spark.createDataFrame(
        rows, "item string, d string, rev double, qty double"
    )
    out = {
        r["period"].isoformat(): r
        for r in price_index(
            df, "item", F.to_date("d"), "rev", "qty"
        ).collect()
    }
    base = out["2024-01-01"]
    assert base["n_matched_items"] == 2
    assert base["laspeyres"] == 1.0 and base["paasche"] == 1.0
    assert base["fisher"] == 1.0
    t = out["2024-02-01"]
    assert t["n_matched_items"] == 2
    # L = (2*10 + 3*20)/(1*10 + 2*20) = 80/50 = 1.6
    assert t["laspeyres"] == pytest.approx(1.6)
    # P = (2*12 + 3*10)/(1*12 + 2*10) = 54/32 = 1.6875
    assert t["paasche"] == pytest.approx(1.6875)
    assert t["fisher"] == pytest.approx(round(math.sqrt(1.6 * 1.6875), 6))


def test_price_index_drops_degenerate_qty(spark):
    from ai_etl_framework_spark.operators.econ import price_index

    rows = [
        ("A", "2024-01-01", 10.0, 10.0),
        ("A", "2024-02-01", 5.0, 0.0),     # qty 0 -> dropped
        ("A", "2024-02-01", None, 4.0),    # NULL rev -> dropped
    ]
    df = spark.createDataFrame(
        rows, "item string, d string, rev double, qty double"
    )
    out = price_index(df, "item", F.to_date("d"), "rev", "qty").collect()
    # period 2 has no surviving cells -> only the base row remains
    assert len(out) == 1 and out[0]["laspeyres"] == 1.0


# ---------------------------------------------------------------------------
# activity_streaks (x115)
# ---------------------------------------------------------------------------

def test_activity_streaks_hand_math(spark):
    from ai_etl_framework_spark.operators.activity import activity_streaks

    rows = [
        # user 1: days 1,2,3 then 5,6 -> streaks 3 and 2
        (1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-03"),
        (1, "2024-01-05"), (1, "2024-01-06"),
        (1, "2024-01-02"),              # duplicate day -> no effect
        # user 2: two LEN-2 streaks -> tie resolves to the LATEST end
        (2, "2024-01-01"), (2, "2024-01-02"),
        (2, "2024-01-08"), (2, "2024-01-09"),
        # NULL rows drop
        (None, "2024-01-01"), (3, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, d string").select(
        "user_id", F.to_timestamp("d").alias("ts")
    )
    out = {r["user"]: r for r in activity_streaks(df).collect()}
    assert set(out) == {1, 2}
    u1 = out[1]
    assert u1["n_active_days"] == 5 and u1["n_streaks"] == 2
    assert u1["longest_streak"] == 3
    assert u1["longest_streak_end"].isoformat() == "2024-01-03"
    assert u1["current_streak_end"].isoformat() == "2024-01-06"
    u2 = out[2]
    assert u2["longest_streak"] == 2
    assert u2["longest_streak_end"].isoformat() == "2024-01-09"


# ---------------------------------------------------------------------------
# zipf_fit (x116)
# ---------------------------------------------------------------------------

def test_zipf_fit_vs_numpy(spark):
    from ai_etl_framework_spark.operators.collocations import zipf_fit

    # construct a corpus with known counts: term t_i appears 2^(10-i)
    # times -> exact rank order, slope from numpy polyfit
    words = []
    counts = {}
    for i in range(8):
        c = 2 ** (10 - i)
        counts[f"t{i}"] = c
        words.extend([f"t{i}"] * c)
    df = spark.createDataFrame([("g", " ".join(words))], "src string, text string")
    r = zipf_fit(df, "src", "text", min_count=1, top_n=100).first()
    assert r["n_terms"] == 8
    ranks = np.arange(1, 9)
    freqs = np.array([counts[f"t{i}"] for i in range(8)], dtype=float)
    slope, intercept = np.polyfit(np.log(ranks), np.log(freqs), 1)
    assert r["slope"] == pytest.approx(round(slope, 6), abs=2e-6)
    assert r["intercept"] == pytest.approx(round(intercept, 6), abs=2e-6)
    assert r["r2"] is not None and 0.9 < r["r2"] <= 1.0


def test_zipf_fit_degenerate_and_guards(spark):
    from ai_etl_framework_spark.operators.collocations import zipf_fit

    # 2 usable terms -> regr runs but r2 of a 2-point fit is 1;
    # 1 term -> zero x-variance -> NULL slope
    df = spark.createDataFrame(
        [("g", "a a a a a b b b b b"), ("h", "c c c c c")],
        "src string, text string",
    )
    out = {r["src"]: r for r in zipf_fit(df, "src", min_count=5).collect()}
    assert out["h"]["slope"] is None
    with pytest.raises(ValueError, match="top_n"):
        zipf_fit(df, "src", top_n=2)


# ---------------------------------------------------------------------------
# silhouette_centroid (x117)
# ---------------------------------------------------------------------------

def test_silhouette_vs_numpy(spark):
    from ai_etl_framework_spark.operators.evaluation import (
        silhouette_centroid,
    )

    rng = np.random.RandomState(7)
    pts, labels = [], []
    for lab, center in [(0, (0.0, 0.0)), (1, (5.0, 5.0)), (2, (0.0, 8.0))]:
        for _ in range(20):
            pts.append(rng.normal(center, 0.5, 2))
            labels.append(lab)
    X = np.array(pts)
    y = np.array(labels)
    df = spark.createDataFrame(
        [(i, [float(a) for a in X[i]], int(y[i])) for i in range(len(y))],
        "id long, v array<double>, lab int",
    )
    got = {r["lab"]: r for r in silhouette_centroid(df, "v", "lab").collect()}
    cents = {lab: X[y == lab].mean(axis=0) for lab in (0, 1, 2)}
    for lab in (0, 1, 2):
        own = np.linalg.norm(X[y == lab] - cents[lab], axis=1)
        other = np.min(
            [
                np.linalg.norm(X[y == lab] - cents[o], axis=1)
                for o in (0, 1, 2) if o != lab
            ],
            axis=0,
        )
        s = (other - own) / np.maximum(own, other)
        assert got[lab]["n_points"] == 20
        assert got[lab]["avg_a"] == pytest.approx(round(own.mean(), 6), abs=2e-6)
        assert got[lab]["avg_b"] == pytest.approx(round(other.mean(), 6), abs=2e-6)
        assert got[lab]["avg_silhouette"] == pytest.approx(
            round(s.mean(), 6), abs=2e-6
        )
        # well-separated gaussians -> strongly positive silhouette
        assert got[lab]["avg_silhouette"] > 0.5


def test_silhouette_single_label_null_b(spark):
    from ai_etl_framework_spark.operators.evaluation import (
        silhouette_centroid,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0], 0), (2, [1.0, 0.0], 0)],
        "id long, v array<double>, lab int",
    )
    r = silhouette_centroid(df, "v", "lab").first()
    assert r["avg_b"] is None and r["avg_silhouette"] is None
    assert r["n_points"] == 2 and r["avg_a"] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# bootstrap_mean_ci (x118)
# ---------------------------------------------------------------------------

def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from ai_etl_framework_spark.operators.stats import bootstrap_mean_ci

    rng = np.random.RandomState(3)
    vals = rng.normal(50.0, 10.0, 400)
    df = spark.createDataFrame(
        [("g", int(i), float(v)) for i, v in enumerate(vals)],
        "grp string, id long, x double",
    )
    r1 = bootstrap_mean_ci(df, "grp", "x", "id", n_replicates=100).first()
    assert r1["n_rows"] == 400
    assert r1["n_replicates_used"] == 100
    # CI brackets the sample mean and has sane width (se ≈ 0.5)
    assert r1["ci_lo"] < r1["mean"] < r1["ci_hi"]
    width = r1["ci_hi"] - r1["ci_lo"]
    assert 1.0 < width < 4.0, f"CI width {width} implausible for se~0.5"
    # deterministic: identical on re-run
    r2 = bootstrap_mean_ci(df, "grp", "x", "id", n_replicates=100).first()
    assert (r1["ci_lo"], r1["ci_hi"]) == (r2["ci_lo"], r2["ci_hi"])
    # different salt -> different resampling (almost surely)
    r3 = bootstrap_mean_ci(
        df, "grp", "x", "id", n_replicates=100, salt="other"
    ).first()
    assert (r1["ci_lo"], r1["ci_hi"]) != (r3["ci_lo"], r3["ci_hi"])


def test_bootstrap_poisson_weights_mean_one(spark):
    """The md5-derived Poisson(1) weights must average ≈ 1 (the
    resampling is unbiased) — checked through the public surface: a
    single replicate's weighted mean over constant values is exactly
    the value, and over many replicates the CI collapses onto it."""
    from ai_etl_framework_spark.operators.stats import bootstrap_mean_ci

    df = spark.createDataFrame(
        [("g", i, 7.0) for i in range(200)], "grp string, id long, x double"
    )
    r = bootstrap_mean_ci(df, "grp", "x", "id", n_replicates=50).first()
    assert r["mean"] == 7.0
    assert r["ci_lo"] == 7.0 and r["ci_hi"] == 7.0


def test_bootstrap_guards(spark):
    from ai_etl_framework_spark.operators.stats import bootstrap_mean_ci

    df = spark.createDataFrame([("g", 1, 1.0)], "grp string, id long, x double")
    with pytest.raises(ValueError, match="n_replicates"):
        bootstrap_mean_ci(df, "grp", "x", "id", n_replicates=5)
    with pytest.raises(ValueError, match="alpha"):
        bootstrap_mean_ci(df, "grp", "x", "id", alpha=1.5)


# ---------------------------------------------------------------------------
# diff_in_diff (x119)
# ---------------------------------------------------------------------------

def test_did_hand_math(spark):
    from ai_etl_framework_spark.operators.abtest import diff_in_diff

    rows = []
    # control: pre mean 10, post mean 12 (trend +2)
    rows += [(False, False, v) for v in (9.0, 10.0, 11.0)]
    rows += [(False, True, v) for v in (11.0, 12.0, 13.0)]
    # treated: pre mean 20, post mean 25 (trend +5 -> DiD = 3)
    rows += [(True, False, v) for v in (19.0, 20.0, 21.0)]
    rows += [(True, True, v) for v in (24.0, 25.0, 26.0)]
    df = spark.createDataFrame(rows, "t boolean, post boolean, x double")
    r = diff_in_diff(df, "t", "post", "x").first()
    assert r["n_total"] == 12
    assert r["diff_control"] == pytest.approx(2.0)
    assert r["diff_treated"] == pytest.approx(5.0)
    assert r["did"] == pytest.approx(3.0)
    # each cell: var_samp = 1, n = 3 -> se = sqrt(4/3)
    assert r["se"] == pytest.approx(round(math.sqrt(4.0 / 3.0), 6))
    assert r["t_stat"] == pytest.approx(round(3.0 / math.sqrt(4.0 / 3.0), 6))


def test_did_missing_cell_and_tiny_cell(spark):
    from ai_etl_framework_spark.operators.abtest import diff_in_diff

    # no treated-post cell -> did NULL, never an error
    rows = [(False, False, 1.0), (False, True, 2.0), (True, False, 3.0)]
    df = spark.createDataFrame(rows, "t boolean, post boolean, x double")
    r = diff_in_diff(df, "t", "post", "x").first()
    assert r["did"] is None and r["n_total"] == 3
    # n=1 cells -> var_samp NULL -> se/t NULL, did still reported
    rows2 = [(False, False, 1.0), (False, True, 2.0),
             (True, False, 3.0), (True, True, 7.0)]
    df2 = spark.createDataFrame(rows2, "t boolean, post boolean, x double")
    r2 = diff_in_diff(df2, "t", "post", "x").first()
    assert r2["did"] == pytest.approx(3.0)
    assert r2["se"] is None and r2["t_stat"] is None


# ---------------------------------------------------------------------------
# fd_audit (x120)
# ---------------------------------------------------------------------------

def test_fd_audit_hand_math(spark):
    from ai_etl_framework_spark.operators.audit import fd_audit

    rows = [
        # k=1 -> {a};      k=2 -> {a, b} (violates);  k=3 -> all-NULL dep
        (1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, None),
        (None, "z"),   # NULL determinant drops
    ]
    df = spark.createDataFrame(rows, "k int, v string")
    r = {(x["determinant"], x["dependent"]): x
         for x in fd_audit(df, [("k", "v")]).collect()}[("k", "v")]
    assert r["n_keys"] == 3
    assert r["n_violating_keys"] == 1
    assert r["violation_rate"] == pytest.approx(round(1 / 3, 6))
    assert r["max_distinct_dependents"] == 2
    with pytest.raises(ValueError, match="pairs"):
        fd_audit(df, [])


def test_fd_audit_clean_fd(spark):
    from ai_etl_framework_spark.operators.audit import fd_audit

    df = spark.createDataFrame(
        [(1, "x", 9), (1, "x", 8), (2, "y", 7)], "k int, v string, w int"
    )
    out = {(r["determinant"], r["dependent"]): r
           for r in fd_audit(df, [("k", "v"), ("v", "w")]).collect()}
    assert out[("k", "v")]["n_violating_keys"] == 0
    assert out[("k", "v")]["violation_rate"] == 0.0
    assert out[("v", "w")]["n_violating_keys"] == 1  # x -> {9, 8}


# ---------------------------------------------------------------------------
# jsd_drift (x121)
# ---------------------------------------------------------------------------

def test_jsd_drift_hand_math(spark):
    from ai_etl_framework_spark.operators.drift import jsd_drift

    # period A: 3 a, 1 b; period B: 1 a, 3 b  -> baseline: 4 a, 4 b
    rows = [("A", "a")] * 3 + [("A", "b")] + [("B", "a")] + [("B", "b")] * 3
    df = spark.createDataFrame(rows, "per string, cat string")
    out = {r["per"]: r for r in jsd_drift(df, "cat", "per").collect()}

    def jsd(p, q):
        s = 0.0
        for pi, qi in zip(p, q):
            m = (pi + qi) / 2
            if pi > 0:
                s += 0.5 * pi * math.log2(pi / m)
            s += 0.5 * qi * math.log2(qi / m)
        return s

    expect = jsd([0.75, 0.25], [0.5, 0.5])
    assert out["A"]["jsd"] == pytest.approx(round(expect, 6), abs=2e-6)
    assert out["B"]["jsd"] == pytest.approx(round(expect, 6), abs=2e-6)
    assert out["A"]["n"] == 4 and out["A"]["n_categories"] == 2


def test_jsd_drift_identical_and_missing_category(spark):
    from ai_etl_framework_spark.operators.drift import jsd_drift

    # identical mix in both periods -> jsd 0 for both
    rows = [("A", "a"), ("A", "b"), ("B", "a"), ("B", "b")]
    df = spark.createDataFrame(rows, "per string, cat string")
    for r in jsd_drift(df, "cat", "per").collect():
        assert r["jsd"] == 0.0
    # a category absent from one period: p=0 term contributes only
    # the q side -> finite, 0 < jsd <= 1 (PSI would need an epsilon)
    rows2 = [("A", "a"), ("A", "a"), ("B", "b"), ("B", "b")]
    df2 = spark.createDataFrame(rows2, "per string, cat string")
    out = {r["per"]: r for r in jsd_drift(df2, "cat", "per").collect()}
    assert 0 < out["A"]["jsd"] <= 1.0
    assert out["A"]["n_categories"] == 1  # observed in the period


# ---------------------------------------------------------------------------
# trending_terms (x122)
# ---------------------------------------------------------------------------

def test_trending_terms_hand_case(spark):
    from ai_etl_framework_spark.operators.novelty import trending_terms

    # period 1: alpha(3) beta(2) gamma(1)
    # period 2: gamma(4) alpha(2) beta(1) -> gamma climbs 3->1 (+2),
    #           alpha 1->2 (-1), beta 2->3 (-1); delta(new) appears
    docs = [
        (1, "alpha alpha alpha beta beta gamma"),
        (2, "gamma gamma gamma gamma alpha alpha beta delta"),
    ]
    df = spark.createDataFrame(docs, "p int, text string")
    out = trending_terms(
        df, F.col("p"), "text", top_rank=10, top_k=10
    ).collect()
    assert all(r["p" if "p" in r.asDict() else "period"] == 2 for r in out)
    by_term = {r["term"]: r for r in out}
    assert by_term["gamma"]["rank_delta"] == 2
    assert by_term["gamma"]["prev_rank"] == 3 and by_term["gamma"]["rank"] == 1
    assert by_term["alpha"]["rank_delta"] == -1
    assert by_term["delta"]["is_new"] and by_term["delta"]["rank_delta"] is None
    # risers first, new entries after (NULLS LAST), term tiebreak
    assert [r["term"] for r in out][0] == "gamma"
    assert [r["term"] for r in out][-1] == "delta"


def test_trending_terms_leaderboard_cut(spark):
    from ai_etl_framework_spark.operators.novelty import trending_terms

    # term outside period-1's top_rank reappearing in period 2 counts
    # as NEW (prev leaderboard didn't hold it)
    docs = [
        (1, "a a a b b c"),      # top_rank=2 keeps a, b only
        (2, "c c c a a b"),
    ]
    df = spark.createDataFrame(docs, "p int, text string")
    out = {r["term"]: r for r in trending_terms(
        df, F.col("p"), "text", top_rank=2, top_k=10
    ).collect()}
    assert set(out) == {"a", "c"}      # period-2 leaderboard = c, a
    assert out["c"]["is_new"] is True  # c was rank 3 -> off-board
    assert out["a"]["rank_delta"] == -1


# ---------------------------------------------------------------------------
# fs_match_patterns (x123)
# ---------------------------------------------------------------------------

def test_fs_patterns_hand_math(spark):
    from ai_etl_framework_spark.operators.linkage import fs_match_patterns

    rows = [
        # block 1: ids 1,2,3 -> pairs (1,2) (1,3) (2,3)
        (1, "b1", "red", 10),
        (2, "b1", "red", 10),   # (1,2): agree, agree  -> '11'
        (3, "b1", "blue", None),  # (1,3)/(2,3): disagree, missing -> '0?'
        # block 2: single row -> no pairs
        (4, "b2", "red", 10),
    ]
    df = spark.createDataFrame(rows, "id long, blk string, color string, sz int")
    out = {r["pattern"]: r for r in fs_match_patterns(
        df, "id", ["blk"], {"color": (0.9, 0.1), "sz": (0.8, 0.2)}
    ).collect()}
    w_color_a, w_color_d = math.log2(0.9 / 0.1), math.log2(0.1 / 0.9)
    w_sz_a = math.log2(0.8 / 0.2)
    assert out["11"]["n_pairs"] == 1
    assert out["11"]["score"] == pytest.approx(
        round(w_color_a + w_sz_a, 6), abs=2e-6
    )
    assert out["0?"]["n_pairs"] == 2
    assert out["0?"]["score"] == pytest.approx(round(w_color_d, 6), abs=2e-6)
    assert set(out) == {"11", "0?"}


def test_fs_patterns_guards(spark):
    from ai_etl_framework_spark.operators.linkage import fs_match_patterns

    df = spark.createDataFrame(
        [(i, "b", "x") for i in range(10)], "id long, blk string, f string"
    )
    with pytest.raises(ValueError, match="largest block"):
        fs_match_patterns(
            df, "id", ["blk"], {"f": (0.9, 0.1)}, max_block_size=5
        )
    with pytest.raises(ValueError, match="0 < u < m < 1"):
        fs_match_patterns(df, "id", ["blk"], {"f": (0.1, 0.9)})
    with pytest.raises(ValueError, match="block_cols"):
        fs_match_patterns(df, "id", [], {"f": (0.9, 0.1)})
    # NULL block values drop: only the non-NULL-block rows pair
    df2 = spark.createDataFrame(
        [(1, None, "x"), (2, None, "x"), (3, "b", "x"), (4, "b", "x")],
        "id long, blk string, f string",
    )
    out = fs_match_patterns(df2, "id", ["blk"], {"f": (0.9, 0.1)}).collect()
    assert len(out) == 1 and out[0]["n_pairs"] == 1


# ---------------------------------------------------------------------------
# binned_mi (x124)
# ---------------------------------------------------------------------------

def test_binned_mi_vs_numpy(spark):
    from ai_etl_framework_spark.operators.stats import binned_mi

    rng = np.random.RandomState(11)
    xa = rng.uniform(0, 10, 500)
    xb = 2 * xa + rng.normal(0, 1, 500)      # strong dependence
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xa, xb)], "a double, b double"
    )
    r = binned_mi(df, "a", "b", bins=8).first()
    # numpy reference with the same equal-width binning
    ba = np.minimum(
        np.floor((xa - xa.min()) * 8 / (xa.max() - xa.min())), 7
    ).astype(int)
    bb = np.minimum(
        np.floor((xb - xb.min()) * 8 / (xb.max() - xb.min())), 7
    ).astype(int)
    joint = np.zeros((8, 8))
    for i, j in zip(ba, bb):
        joint[i, j] += 1
    p = joint / joint.sum()
    pa, pb = p.sum(1), p.sum(0)
    mask = p > 0
    mi = (p[mask] * np.log(p[mask] / np.outer(pa, pb)[mask])).sum()
    ha = -(pa[pa > 0] * np.log(pa[pa > 0])).sum()
    hb = -(pb[pb > 0] * np.log(pb[pb > 0])).sum()
    assert r["n"] == 500 and r["bins"] == 8
    assert r["mi"] == pytest.approx(round(mi, 6), abs=2e-6)
    assert r["h_a"] == pytest.approx(round(ha, 6), abs=2e-6)
    assert r["nmi"] == pytest.approx(round(mi / math.sqrt(ha * hb), 6), abs=2e-6)
    # dependence detected
    assert r["mi"] > 0.5


def test_binned_mi_independent_and_constant(spark):
    from ai_etl_framework_spark.operators.stats import binned_mi

    rng = np.random.RandomState(4)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in
         zip(rng.uniform(0, 1, 2000), rng.uniform(0, 1, 2000))],
        "a double, b double",
    )
    r = binned_mi(df, "a", "b", bins=5).first()
    assert 0 <= r["mi"] < 0.03, "independent uniforms should have ~0 MI"
    # constant column -> h = 0 -> nmi NULL, mi 0
    df2 = spark.createDataFrame(
        [(1.0, float(i)) for i in range(50)], "a double, b double"
    )
    r2 = binned_mi(df2, "a", "b").first()
    assert r2["mi"] == 0.0 and r2["h_a"] == 0.0 and r2["nmi"] is None
    with pytest.raises(ValueError, match="bins"):
        binned_mi(df2, "a", "b", bins=1)


# ---------------------------------------------------------------------------
# seasonal_strength (x125)
# ---------------------------------------------------------------------------

def test_seasonal_strength_pure_and_none(spark):
    from ai_etl_framework_spark.operators.timeseries import seasonal_strength
    from datetime import datetime, timedelta

    t0 = datetime(2024, 3, 1)
    rows = []
    # key 'pure': value is a pure function of hour -> strength 1
    for d in range(3):
        for h in range(6):
            rows.append(("pure", t0 + timedelta(days=d, hours=h), float(h * 10)))
    # key 'flat': constant -> SS_total 0 -> NULL
    for d in range(3):
        for h in range(6):
            rows.append(("flat", t0 + timedelta(days=d, hours=h), 5.0))
    # key 'noise': value varies within each hour identically -> the
    # hour explains nothing (same per-hour distribution by day)
    for d in range(3):
        for h in range(6):
            rows.append(("noise", t0 + timedelta(days=d, hours=h), float(d)))
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double")
    out = {r["k"]: r for r in seasonal_strength(df, "k", "ts", "x").collect()}
    assert out["pure"]["strength"] == 1.0
    assert out["flat"]["strength"] is None
    assert out["noise"]["strength"] == pytest.approx(0.0, abs=1e-9)
    assert out["pure"]["n"] == 18 and out["pure"]["n_seasons"] == 6


def test_seasonal_strength_hand_math(spark):
    from ai_etl_framework_spark.operators.timeseries import seasonal_strength
    from datetime import datetime

    # hour 0: [0, 2] (mean 1), hour 1: [10, 14] (mean 12)
    rows = [
        ("k", datetime(2024, 1, 1, 0), 0.0),
        ("k", datetime(2024, 1, 2, 0), 2.0),
        ("k", datetime(2024, 1, 1, 1), 10.0),
        ("k", datetime(2024, 1, 2, 1), 14.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double")
    r = seasonal_strength(df, "k", "ts", "x").first()
    vals = np.array([0.0, 2.0, 10.0, 14.0])
    ss_tot = ((vals - vals.mean()) ** 2).sum()
    ss_within = 2.0 + 8.0          # (0-1)²+(2-1)² + (10-12)²+(14-12)²
    assert r["strength"] == pytest.approx(
        round(1 - ss_within / ss_tot, 6), abs=2e-6
    )


# ---------------------------------------------------------------------------
# vocab_overlap (x126)
# ---------------------------------------------------------------------------

def test_vocab_overlap_hand_math(spark):
    from ai_etl_framework_spark.operators.novelty import vocab_overlap

    docs = [
        ("s1", "alpha beta gamma"),
        ("s1", "alpha delta"),           # s1 vocab {alpha beta gamma delta}
        ("s2", "alpha beta zeta"),       # s2 vocab {alpha beta zeta}
        ("s3", "omega psi"),             # s3 vocab disjoint from s2
    ]
    df = spark.createDataFrame(docs, "src string, text string")
    out = {(r["group_a"], r["group_b"]): r
           for r in vocab_overlap(df, "src", "text").collect()}
    r12 = out[("s1", "s2")]
    assert (r12["n_a"], r12["n_b"], r12["n_both"]) == (4, 3, 2)
    assert r12["jaccard"] == pytest.approx(round(2 / 5, 6))
    assert r12["overlap"] == pytest.approx(round(2 / 3, 6))
    # disjoint pair still emits a zero row
    r23 = out[("s2", "s3")]
    assert r23["n_both"] == 0 and r23["jaccard"] == 0.0
    assert len(out) == 3  # all C(3,2) pairs present


# ---------------------------------------------------------------------------
# new_returning_users (x127)
# ---------------------------------------------------------------------------

def test_new_returning_hand_math(spark):
    from ai_etl_framework_spark.operators.activity import new_returning_users

    rows = [
        (1, "2024-01-01"), (2, "2024-01-01"),
        (1, "2024-01-02"), (3, "2024-01-02"),
        (1, "2024-01-04"), (2, "2024-01-04"), (3, "2024-01-04"),
        (None, "2024-01-01"), (9, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, d string").select(
        "user_id", F.to_timestamp("d").alias("ts")
    )
    out = {r["day"].isoformat(): r for r in new_returning_users(df).collect()}
    d1, d2, d4 = out["2024-01-01"], out["2024-01-02"], out["2024-01-04"]
    assert (d1["n_active"], d1["n_new"], d1["n_returning"]) == (2, 2, 0)
    assert (d2["n_active"], d2["n_new"], d2["n_returning"]) == (2, 1, 1)
    assert (d4["n_active"], d4["n_new"], d4["n_returning"]) == (3, 0, 3)
    assert d4["cum_users"] == 3 and d4["pct_new"] == 0.0
    assert "2024-01-03" not in out  # silent days emit nothing


# ---------------------------------------------------------------------------
# moments_by_group (x128)
# ---------------------------------------------------------------------------

def test_moments_vs_numpy(spark):
    from ai_etl_framework_spark.operators.stats import moments_by_group

    rng = np.random.RandomState(2)
    gauss = rng.normal(10, 2, 800)
    expo = rng.exponential(3.0, 800)       # skewed, heavy-tailed
    rows = [("gauss", float(v)) for v in gauss] + [
        ("expo", float(v)) for v in expo
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    out = {r["g"]: r for r in moments_by_group(df, "g", "x").collect()}

    def ref(v):
        m = v.mean()
        m2 = ((v - m) ** 2).mean()
        m3 = ((v - m) ** 3).mean()
        m4 = ((v - m) ** 4).mean()
        return m, math.sqrt(m2), m3 / m2 ** 1.5, m4 / m2 ** 2 - 3

    for g, v in (("gauss", gauss), ("expo", expo)):
        m, s, sk, ku = ref(v)
        r = out[g]
        assert r["mean"] == pytest.approx(round(m, 6), abs=2e-6)
        assert r["std"] == pytest.approx(round(s, 6), abs=2e-6)
        assert r["skewness"] == pytest.approx(round(sk, 6), abs=1e-4)
        assert r["kurtosis"] == pytest.approx(round(ku, 6), abs=1e-4)
    # shape sanity: exponential strongly right-skewed, gauss ~0
    assert out["expo"]["skewness"] > 1.5
    assert abs(out["gauss"]["skewness"]) < 0.3


def test_moments_constant_group_null_shape(spark):
    from ai_etl_framework_spark.operators.stats import moments_by_group

    df = spark.createDataFrame(
        [("c", 7.0)] * 5, "g string, x double"
    )
    r = moments_by_group(df, "g", "x").first()
    assert r["std"] == 0.0
    assert r["skewness"] is None and r["kurtosis"] is None


# ---------------------------------------------------------------------------
# rrf_fuse (x129)
# ---------------------------------------------------------------------------

def test_rrf_hand_math(spark):
    from ai_etl_framework_spark.operators.evaluation import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0), (4, None)], "id long, sa double"
    )
    b = spark.createDataFrame(
        [(2, 100.0), (5, 90.0), (1, 80.0)], "id long, sb double"
    )
    out = {r["id"]: r for r in rrf_fuse(a, b, "id", "sa", "sb", k=10).collect()}
    # list A ranks: 1->1, 2->2, 3->3 (4 dropped: NULL score)
    # list B ranks: 2->1, 5->2, 1->3
    assert out[1]["rank_a"] == 1 and out[1]["rank_b"] == 3
    assert out[2]["rank_a"] == 2 and out[2]["rank_b"] == 1
    assert out[2]["rrf_score"] == pytest.approx(
        round(1 / 12 + 1 / 11, 6), abs=2e-6
    )
    assert out[1]["rrf_score"] == pytest.approx(
        round(1 / 11 + 1 / 13, 6), abs=2e-6
    )
    # id in one list only: other rank NULL, contributes 0
    assert out[5]["rank_a"] is None
    assert out[5]["rrf_score"] == pytest.approx(round(1 / 12, 6), abs=2e-6)
    assert 4 not in out
    # appearing in both lists beats either single list here
    assert out[2]["rrf_score"] > out[5]["rrf_score"]
    with pytest.raises(ValueError, match="k must"):
        rrf_fuse(a, b, "id", "sa", "sb", k=0)


# ---------------------------------------------------------------------------
# vocab_richness (x130)
# ---------------------------------------------------------------------------

def test_vocab_richness_hand_math(spark):
    from ai_etl_framework_spark.operators.novelty import vocab_richness

    # counts: a×3, b×2, c×1, d×1  -> N=7 V=4 n1=2 n2=1
    docs = [("s", "a a a b b c d")]
    df = spark.createDataFrame(docs, "src string, text string")
    r = vocab_richness(df, "src", "text").first()
    assert (r["n_tokens"], r["vocab"]) == (7, 4)
    assert (r["n_singletons"], r["n_doubletons"]) == (2, 1)
    assert r["unseen_mass"] == pytest.approx(round(2 / 7, 6))
    # chao1 = 4 + 2*1/(2*(1+1)) = 4.5
    assert r["chao1"] == pytest.approx(4.5)
    # n2 = 0 stays defined (bias-corrected form)
    df2 = spark.createDataFrame([("s", "x y z")], "src string, text string")
    r2 = vocab_richness(df2, "src").first()
    assert r2["chao1"] == pytest.approx(3 + 3 * 2 / 2)


# ---------------------------------------------------------------------------
# skew_report (x131)
# ---------------------------------------------------------------------------

def test_skew_report_hand_math(spark):
    from ai_etl_framework_spark.operators.audit import skew_report

    rows = [("hot",)] * 6 + [("warm",)] * 3 + [(None,)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, ["k"], top_k=2).collect()
    assert [(r["rank"], r["k"], r["n"]) for r in out] == [
        (1, "hot", 6), (2, "warm", 3)
    ]
    r = out[0]
    assert r["n_rows"] == 10 and r["n_keys"] == 3
    assert r["share"] == pytest.approx(0.6)
    assert r["max_share"] == pytest.approx(0.6)
    assert r["hhi"] == pytest.approx(round((36 + 9 + 1) / 100, 6))
    # NULL keys are reported, not dropped
    out3 = skew_report(df, ["k"], top_k=3).collect()
    assert out3[-1]["k"] is None and out3[-1]["n"] == 1
    with pytest.raises(ValueError, match="key_cols"):
        skew_report(df, [], top_k=2)


# ---------------------------------------------------------------------------
# target_encode (x132)
# ---------------------------------------------------------------------------

def test_target_encode_hand_math(spark):
    from ai_etl_framework_spark.operators.scaling import target_encode

    rows = [("a", 10.0), ("a", 20.0), ("b", 100.0), ("b", None), (None, 5.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = {r["c"]: r for r in target_encode(df, "c", "y", m=2.0).collect()}
    # population: a:{10,20}, b:{100} -> global mean 130/3
    gm = 130.0 / 3.0
    assert set(out) == {"a", "b"}
    assert out["a"]["n"] == 2 and out["a"]["cat_mean"] == 15.0
    assert out["a"]["encoded"] == pytest.approx(
        round((2 * 15.0 + 2 * gm) / 4.0, 6), abs=2e-6
    )
    # rare category shrinks harder toward the prior
    assert out["b"]["encoded"] == pytest.approx(
        round((1 * 100.0 + 2 * gm) / 3.0, 6), abs=2e-6
    )
    assert abs(out["b"]["encoded"] - gm) < abs(100.0 - gm)
    with pytest.raises(ValueError, match="m must"):
        target_encode(df, "c", "y", m=0.0)


# ---------------------------------------------------------------------------
# grouped_ols2 (x133)
# ---------------------------------------------------------------------------

def test_grouped_ols2_vs_numpy(spark):
    from ai_etl_framework_spark.operators.trend import grouped_ols2

    rng = np.random.RandomState(8)
    x1 = rng.uniform(0, 10, 300)
    x2 = rng.uniform(-5, 5, 300)
    y = 3.0 + 2.0 * x1 - 1.5 * x2 + rng.normal(0, 0.5, 300)
    df = spark.createDataFrame(
        [("g", float(a), float(b), float(c)) for a, b, c in zip(y, x1, x2)],
        "g string, y double, x1 double, x2 double",
    )
    r = grouped_ols2(df, "g", "y", "x1", "x2").first()
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, res, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert r["b0"] == pytest.approx(round(beta[0], 6), abs=1e-4)
    assert r["b1"] == pytest.approx(round(beta[1], 6), abs=1e-4)
    assert r["b2"] == pytest.approx(round(beta[2], 6), abs=1e-4)
    pred = X @ beta
    ss_res = ((y - pred) ** 2).sum()
    ss_tot = ((y - y.mean()) ** 2).sum()
    assert r["r2"] == pytest.approx(round(1 - ss_res / ss_tot, 6), abs=1e-5)
    assert r["r2"] > 0.98


def test_grouped_ols2_degenerate(spark):
    from ai_etl_framework_spark.operators.trend import grouped_ols2

    # collinear regressors (x2 = 2*x1) -> det 0 -> NULL coefficients
    rows = [("g", float(i), float(i), float(2 * i)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, y double, x1 double, x2 double")
    r = grouped_ols2(df, "g", "y", "x1", "x2").first()
    assert r["b1"] is None and r["b2"] is None and r["r2"] is None
    # < 3 rows -> NULL
    df2 = spark.createDataFrame(
        [("h", 1.0, 1.0, 0.0), ("h", 2.0, 2.0, 1.0)],
        "g string, y double, x1 double, x2 double",
    )
    assert grouped_ols2(df2, "g", "y", "x1", "x2").first()["b1"] is None


# ---------------------------------------------------------------------------
# seasonal_envelope (x134)
# ---------------------------------------------------------------------------

def test_seasonal_envelope_hand_math(spark):
    from ai_etl_framework_spark.operators.timeseries import seasonal_envelope
    from datetime import datetime, timedelta

    t0 = datetime(2024, 6, 1, 5)
    # hour 5 of key 'k': values 0..24 over 25 days -> exact deciles
    rows = [
        ("k", t0 + timedelta(days=d), float(d)) for d in range(25)
    ]
    # hour 6: only 3 rows -> excluded by min_rows=20
    rows += [("k", t0 + timedelta(days=d, hours=1), 1.0) for d in range(3)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double")
    out = seasonal_envelope(df, "k", "ts", "x").collect()
    assert len(out) == 1 and out[0]["hour"] == 5
    r = out[0]
    v = np.arange(25.0)
    assert r["p_lo"] == pytest.approx(round(np.quantile(v, 0.1), 6))
    assert r["p_med"] == pytest.approx(round(np.quantile(v, 0.5), 6))
    assert r["p_hi"] == pytest.approx(round(np.quantile(v, 0.9), 6))
    assert r["n"] == 25
    with pytest.raises(ValueError, match="strictly increasing"):
        seasonal_envelope(df, "k", "ts", "x", quantiles=(0.5, 0.5, 0.9))
    with pytest.raises(ValueError, match="min_rows"):
        seasonal_envelope(df, "k", "ts", "x", min_rows=0)
