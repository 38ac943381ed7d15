"""melt (operators/reshape.py): row-count invariant, NULLs kept,
type pinning, validation; plus robust_zscore (operators/anomaly.py)
differential vs numpy. 3-SF oracle parity is x32 / x31."""

from __future__ import annotations

import numpy as np
import pytest

from ai_etl_framework_spark.operators.anomaly import robust_zscore
from ai_etl_framework_spark.operators.reshape import melt


def test_melt_pinned(spark):
    df = spark.createDataFrame(
        [(1, 10, 1.5, None), (2, 20, None, 4.25)],
        "id long, a int, b double, c double",
    )
    out = melt(df, ["id"], ["a", "b", "c"], "m", "val")
    assert out.columns == ["id", "m", "val"]
    assert dict(out.dtypes)["val"] == "double"
    rows = {(r["id"], r["m"]): r["val"] for r in out.collect()}
    # NULL cells KEPT: n_rows x n_value_cols invariant
    assert len(rows) == 6
    assert rows[(1, "a")] == 10.0 and rows[(1, "c")] is None
    assert rows[(2, "b")] is None and rows[(2, "c")] == 4.25


def test_melt_validation(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    with pytest.raises(ValueError, match="at least one"):
        melt(df, ["id"], [])
    with pytest.raises(ValueError, match="both id and value"):
        melt(df, ["id", "v"], ["v"])


def test_robust_zscore_matches_numpy(spark):
    vals = [float(v) for v in range(1, 50)] + [500.0, -400.0, None]
    rows = [(i, "g", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = {
        r["id"]: (r["rz"], r["is_outlier"])
        for r in robust_zscore(df, "v", ["g"]).collect()
    }
    arr = np.array([v for v in vals if v is not None])
    med = np.median(arr)
    mad = np.median(np.abs(arr - med))
    for i, v in enumerate(vals):
        if v is None:
            assert got[i] == (None, None)
        else:
            rz = round(0.6745 * (v - med) / mad, 6)
            assert got[i][0] == pytest.approx(rz, abs=1e-9)
            assert got[i][1] == (abs(rz) > 3.5)
    # the two extremes flag, the bulk does not
    assert got[49][1] and got[50][1]
    assert not got[10][1]


def test_robust_zscore_mad_zero_and_groups(spark):
    rows = [
        # group a: >half identical -> MAD 0 -> rz NULL
        (1, "a", 5.0), (2, "a", 5.0), (3, "a", 5.0), (4, "a", 99.0),
        # group b: normal spread
        (5, "b", 1.0), (6, "b", 2.0), (7, "b", 3.0),
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = {r["id"]: r["rz"] for r in robust_zscore(df, "v", ["g"]).collect()}
    assert got[1] is None and got[4] is None  # MAD==0 group
    assert got[6] == pytest.approx(0.0)
    assert got[7] == pytest.approx(0.6745, abs=1e-6)
    # global (no groups) runs too
    assert robust_zscore(df, "v").count() == 7
    # approx dual stays close on a bigger series
    big = spark.createDataFrame(
        [(i, float(i % 97)) for i in range(2000)], "id long, v double"
    )
    e = {r["id"]: r["rz"] for r in robust_zscore(big, "v").collect()}
    a = {r["id"]: r["rz"] for r in robust_zscore(big, "v", approx=True).collect()}
    diffs = [abs(e[i] - a[i]) for i in e if e[i] is not None and a[i] is not None]
    assert max(diffs) < 0.1
