"""scale_columns / quantile_bucketize (operators/scaling.py): pinned
math vs numpy/sklearn conventions, constant/NULL columns, bucket
assignment edges, approx dual, -0.0 normalization. 3-SF oracle parity
is x40 / x41."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ai_etl_framework_spark.operators.scaling import (
    quantile_bucketize,
    scale_columns,
)


def test_minmax_and_zscore(spark):
    vals = [2.0, 4.0, 6.0, 10.0, None]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    mm = {r["id"]: r["v_s"] for r in scale_columns(df, ["v"], "minmax", "_s").collect()}
    assert mm[0] == 0.0 and mm[3] == 1.0 and mm[4] is None
    assert mm[1] == pytest.approx(0.25)
    z = {r["id"]: r["v_s"] for r in scale_columns(df, ["v"], "zscore", "_s").collect()}
    arr = np.array([v for v in vals if v is not None])
    mu, sd = round(arr.mean(), 6), round(arr.std(), 6)  # ddof=0, pinned 6dp
    for i, v in enumerate(vals):
        if v is None:
            assert z[i] is None
        else:
            assert z[i] == pytest.approx(round((v - mu) / sd, 6), abs=1e-9)
    # no -0.0 leaks through (the canonicalization killer)
    assert all(not (x == 0 and math.copysign(1, x) < 0)
               for x in z.values() if x is not None)


def test_constant_and_all_null(spark):
    df = spark.createDataFrame(
        [(1, 5.0, None), (2, 5.0, None)], "id long, c double, n double"
    )
    for m in ("minmax", "zscore"):
        out = scale_columns(df, ["c", "n"], m, "_s")
        rows = out.collect()
        assert all(r["c_s"] is None and r["n_s"] is None for r in rows), m
    with pytest.raises(ValueError, match="at least one"):
        scale_columns(df, [], "minmax")
    with pytest.raises(ValueError, match="method"):
        scale_columns(df, ["c"], "robust")


def test_bucketize_pinned(spark):
    # 8 values -> quartiles at 2.5/4.5/6.5 (exact interpolation)
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 9)] + [(99, None)],
        "id long, v double",
    )
    out = {r["id"]: r["v_bucket"] for r in quantile_bucketize(df, "v", 4).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 3, 8: 3, 99: None}
    # equi-depth: each bucket holds 1/4 of the mass
    counts = {}
    for i, b in out.items():
        if b is not None:
            counts[b] = counts.get(b, 0) + 1
    assert counts == {0: 2, 1: 2, 2: 2, 3: 2}


def test_bucketize_ties_and_approx(spark):
    # heavy ties: >75% identical values collapse the low edges
    rows = [(i, 1.0) for i in range(30)] + [(100 + i, float(i + 10)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = {r["id"]: r["v_bucket"] for r in quantile_bucketize(df, "v", 4).collect()}
    assert all(out[i] == 0 for i in range(30))       # ties pin to bucket 0
    assert out[109] == 3                             # top value in last bucket
    exact = quantile_bucketize(df, "v", 4).collect()
    appr = quantile_bucketize(df, "v", 4, approx=True).collect()
    e = {r["id"]: r["v_bucket"] for r in exact}
    a = {r["id"]: r["v_bucket"] for r in appr}
    assert sum(e[i] != a[i] for i in e) <= 2  # KLL jitter at edges only
    with pytest.raises(ValueError, match="buckets"):
        quantile_bucketize(df, "v", 1)
    nulls = spark.createDataFrame([(1, None)], "id long, v double")
    with pytest.raises(ValueError, match="no non-NULL"):
        quantile_bucketize(nulls, "v")
