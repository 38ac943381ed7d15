"""winsorize (operators/winsorize.py): pinned clipping vs numpy
percentiles, NULL pass-through, suffix mode, approx dual, and
validation. 3-SF oracle parity is x26 (+ the events-edge NULL row)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.operators.winsorize import winsorize


def test_winsorize_matches_numpy(spark):
    vals = [float(v) for v in range(1, 101)] + [1000.0, -500.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    out = {r["id"]: r["v"] for r in winsorize(df, ["v"], 0.05, 0.95).collect()}
    lo, hi = np.percentile(vals, 5), np.percentile(vals, 95)
    for i, v in enumerate(vals):
        assert out[i] == pytest.approx(min(hi, max(lo, v)), rel=1e-12)


def test_winsorize_nulls_suffix_and_all_null(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 100.0), (4, -100.0)], "id long, v double"
    )
    out = winsorize(df, ["v"], 0.25, 0.75, suffix="_w")
    rows = {r["id"]: (r["v"], r["v_w"]) for r in out.collect()}
    assert rows[2] == (None, None)  # NULL passes through
    assert rows[1][0] == 5.0  # original column untouched in suffix mode
    assert rows[3][1] < 100.0 and rows[4][1] > -100.0  # both tails clip
    # all-NULL column: left unchanged, no crash
    dn = spark.createDataFrame([(1, None), (2, None)], "id long, v double")
    assert [r["v"] for r in winsorize(dn, ["v"]).collect()] == [None, None]


def test_winsorize_replace_mode_preserves_schema(spark):
    """r8 advice: replace mode (suffix="") must not silently coerce
    integer/decimal columns to double — the clipped value casts back
    to the column's original type; suffix mode stays double."""
    df = spark.createDataFrame(
        [(1, 10, None), (2, 500, 5), (3, -500, 7)],
        "id long, v int, w int",
    )
    out = winsorize(df, ["v"], 0.25, 0.75)
    assert dict(out.dtypes)["v"] == "int"
    vals = {r["id"]: r["v"] for r in out.collect()}
    assert vals[2] < 500 and vals[3] > -500  # still clips
    # NULL pass-through survives the cast-back, and suffix mode is
    # unchanged (double derived column)
    out2 = winsorize(df, ["w"], 0.25, 0.75, suffix="_w")
    assert dict(out2.dtypes)["w_w"] == "double"
    assert dict(out2.dtypes)["w"] == "int"
    assert {r["id"]: r["w_w"] for r in out2.collect()}[1] is None


def test_winsorize_by_group(spark):
    """Per-group clipping: each group's bounds come from ITS values;
    NULL group is its own group; all-NULL group passes through;
    replace mode keeps the int type."""
    from ai_etl_framework_spark.operators.winsorize import winsorize_by_group

    rows = (
        [(i, "a", float(i)) for i in range(1, 11)]        # a: 1..10
        + [(100 + i, "b", float(i * 100)) for i in range(1, 11)]  # b: 100..1000
        + [(200, None, 5.0), (201, None, 500.0)]          # NULL group
        + [(300, "c", None), (301, "c", None)]            # all-NULL group
    )
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {
        r["id"]: r["v_w"]
        for r in winsorize_by_group(
            df, "v", ["g"], 0.25, 0.75, suffix="_w"
        ).collect()
    }
    assert out[1] > 1.0 and out[10] < 10.0          # a clipped by a's bounds
    assert out[101] > 100.0 and out[110] < 1000.0   # b by b's (100x larger)
    assert out[110] > 10.0                          # not leaked from a
    assert out[200] is not None and out[201] is not None  # NULL group works
    assert out[300] is None and out[301] is None    # all-NULL passes through
    # replace mode keeps schema type
    di = spark.createDataFrame([(1, "a", 10), (2, "a", 500)], "id long, g string, v int")
    rep = winsorize_by_group(di, "v", ["g"], 0.25, 0.75)
    assert dict(rep.dtypes)["v"] == "int"
    with pytest.raises(ValueError, match="group columns"):
        winsorize_by_group(df, "v", [])


def test_winsorize_approx_and_validation(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(200)], "id long, v double"
    )
    exact = winsorize(df, ["v"], 0.1, 0.9)
    appr = winsorize(df, ["v"], 0.1, 0.9, approx=True)
    # approx (KLL, high accuracy) stays within one value of exact here
    e = {r["id"]: r["v"] for r in exact.collect()}
    a = {r["id"]: r["v"] for r in appr.collect()}
    assert all(abs(e[i] - a[i]) <= 1.0 for i in e)
    with pytest.raises(ValueError, match="lower"):
        winsorize(df, ["v"], 0.9, 0.1)
    with pytest.raises(ValueError, match="at least one"):
        winsorize(df, [])
