"""Pinned unit tests for the fourth r10 batch (x87–x89): Spearman
rank-correlation matrix, Mann–Whitney U rank-sum test, categorical
distribution entropy. Oracle twins are swept by
test_oracle_parity.py; these pin semantics against pandas /
hand-rolled rank math / closed-form entropy."""

from __future__ import annotations

import math
import random

import pytest


# ---------------------------------------------------------------------------
# spearman_matrix
# ---------------------------------------------------------------------------

def test_spearman_matches_pandas(spark):
    """Randomized differential: ties included (values rounded to one
    digit so tie blocks are common)."""
    import pandas as pd

    from ai_etl_framework_spark.operators.stats import spearman_matrix

    rng = random.Random(87)
    rows = [
        (round(rng.gauss(0, 1), 1), round(rng.gauss(0, 2), 1), float(rng.randint(0, 5)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {
        (r["col_a"], r["col_b"]): r["spearman"]
        for r in spearman_matrix(df, ["a", "b", "c"]).collect()
    }
    ref = pd.DataFrame(rows, columns=["a", "b", "c"]).corr(method="spearman")
    for (x, y), v in got.items():
        assert v == pytest.approx(round(ref.loc[x, y], 6), abs=2e-6)


def test_spearman_perfect_monotone_and_constant(spark):
    from ai_etl_framework_spark.operators.stats import spearman_matrix

    rows = [(float(i), float(i * i), 7.0) for i in range(1, 50)]
    df = spark.createDataFrame(rows, "x double, y double, k double")
    got = {
        (r["col_a"], r["col_b"]): r
        for r in spearman_matrix(df, ["x", "y", "k"]).collect()
    }
    # y = x² is a monotone transform: Spearman exactly 1
    assert got[("x", "y")]["spearman"] == 1.0
    # constant column: zero rank variance → NULL (ANSI corr semantics)
    assert got[("k", "x")]["spearman"] is None
    assert got[("x", "y")]["n"] == 49


def test_spearman_complete_case_and_cap(spark):
    from ai_etl_framework_spark.operators.stats import spearman_matrix

    rows = [(1.0, 1.0), (2.0, None), (None, 3.0), (4.0, 4.0), (5.0, 2.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    out = spearman_matrix(df, ["a", "b"]).collect()[0]
    assert out["n"] == 3  # listwise: only fully-observed rows rank

    from pyspark.sql import functions as F

    big = spark.range(200).select(
        F.col("id").cast("double").alias("a"),
        F.col("id").cast("double").alias("b"),
    )
    with pytest.raises(ValueError, match="max_distinct"):
        spearman_matrix(big, ["a", "b"], max_distinct=10)


# ---------------------------------------------------------------------------
# mann_whitney
# ---------------------------------------------------------------------------

def _mw_reference(va, vb):
    """Hand-rolled tie-corrected asymptotic Mann–Whitney (average
    ranks, no continuity correction), exact normal CDF."""
    from statistics import NormalDist

    pooled = sorted(va + vb)
    # average rank per value
    ranks = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        ranks[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    n1, n2 = len(va), len(vb)
    n = n1 + n2
    r1 = sum(ranks[v] for v in va)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    ties = 0
    for v in set(pooled):
        t = pooled.count(v)
        ties += t**3 - t
    s2 = n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(s2)
    p = 2 * (1 - NormalDist().cdf(abs(z)))
    return u1, z, min(1.0, p), 1 - 2 * u1 / (n1 * n2)


def test_mann_whitney_matches_reference(spark):
    from ai_etl_framework_spark.operators.abtest import mann_whitney

    rng = random.Random(88)
    va = [round(rng.gauss(0, 1), 1) for _ in range(180)]
    vb = [round(rng.gauss(0.4, 1.2), 1) for _ in range(140)]
    rows = [("a", v) for v in va] + [("b", v) for v in vb] + [("c", 99.0), ("a", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = mann_whitney(df, "g", "v", "a", "b").collect()[0]
    u1, z, p, rb = _mw_reference(va, vb)
    assert out["n_a"] == 180 and out["n_b"] == 140
    assert out["u_a"] == pytest.approx(u1)
    assert out["z"] == pytest.approx(round(z, 6), abs=1e-6)
    # Zelen–Severo polynomial is accurate to ~7.5e-8 vs the true CDF
    assert out["p_approx"] == pytest.approx(p, abs=1e-6)
    assert out["rank_biserial"] == pytest.approx(round(rb, 6), abs=1e-6)


def test_mann_whitney_all_tied_is_null(spark):
    from ai_etl_framework_spark.operators.abtest import mann_whitney

    rows = [("a", 5.0)] * 10 + [("b", 5.0)] * 8
    df = spark.createDataFrame(rows, "g string, v double")
    out = mann_whitney(df, "g", "v", "a", "b").collect()[0]
    assert out["z"] is None and out["p_approx"] is None
    assert out["u_a"] == pytest.approx(10 * 8 / 2.0)  # pure-tie midpoint


def test_mann_whitney_guards(spark):
    from ai_etl_framework_spark.operators.abtest import mann_whitney

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(50)] + [("b", float(i) + 0.5) for i in range(50)],
        "g string, v double",
    )
    with pytest.raises(ValueError, match="max_distinct"):
        mann_whitney(df, "g", "v", "a", "b", max_distinct=10)
    with pytest.raises(ValueError, match="must differ"):
        mann_whitney(df, "g", "v", "a", "a")


# ---------------------------------------------------------------------------
# categorical_entropy
# ---------------------------------------------------------------------------

def test_categorical_entropy_closed_form(spark):
    from ai_etl_framework_spark.operators.stats import categorical_entropy

    rows = (
        [("g1", "x")] * 4
        + [("g1", "y")] * 4
        + [("g2", "x")] * 3
        + [("g2", "y")] * 1
        + [("g3", "only")] * 5
        + [("g4", None), (None, "x")]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r["g"]: r for r in categorical_entropy(df, "g", "v").collect()}
    # g1: uniform over 2 → exactly 1 bit, norm 1
    assert got["g1"]["entropy_bits"] == 1.0
    assert got["g1"]["norm_entropy"] == 1.0
    assert got["g1"]["top_share"] == 0.5
    assert got["g1"]["top_value"] == "x"  # tie → min string
    # g2: H(0.75, 0.25)
    h = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert got["g2"]["entropy_bits"] == pytest.approx(round(h, 6), abs=1e-6)
    assert got["g2"]["top_value"] == "x"
    # g3: single level → H = 0, norm NULL
    assert got["g3"]["entropy_bits"] == 0.0
    assert got["g3"]["norm_entropy"] is None
    assert got["g3"]["levels"] == 1
    # NULL group / NULL category rows dropped entirely
    assert "g4" not in got and None not in got
