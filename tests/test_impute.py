"""impute_by_group (operators/impute.py): all three strategies pinned
on hand-built groups, global fallback, NULL group key, mode ties,
all-NULL column, suffix vs replace. 3-SF oracle parity is x29."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.operators.impute import impute_by_group

ROWS = [
    # group a: values 1, 3, NULL -> mean 2, median 2
    (1, "a", 1.0), (2, "a", 3.0), (3, "a", None),
    # group b: all NULL -> global fallback
    (4, "b", None), (5, "b", None),
    # NULL group: its own group, values 10, NULL
    (6, None, 10.0), (7, None, None),
]
SCHEMA = "id long, g string, v double"


def _vals(df):
    return {r["id"]: r["v_f"] for r in df.collect()}


def test_mean_and_median(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _vals(impute_by_group(df, "v", ["g"], "mean", suffix="_f"))
    # global mean = (1+3+10)/3
    gm = 14.0 / 3
    assert got[3] == pytest.approx(2.0)
    assert got[4] == pytest.approx(gm) and got[5] == pytest.approx(gm)
    assert got[7] == pytest.approx(10.0)  # NULL group is a real group
    assert got[1] == 1.0 and got[6] == 10.0  # observed pass through
    med = _vals(impute_by_group(df, "v", ["g"], "median", suffix="_f"))
    assert med[3] == pytest.approx(2.0)
    assert med[4] == pytest.approx(3.0)  # global median of {1,3,10}


def test_mode_ties_and_type(spark):
    rows = [
        (1, "a", 2), (2, "a", 2), (3, "a", 7), (4, "a", 7),  # tie -> 2
        (5, "a", None),
        (6, "b", None),  # all-NULL group -> global mode (2)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v int")
    out = impute_by_group(df, "v", ["g"], "mode", suffix="_f")
    assert dict(out.dtypes)["v_f"] == "int"  # mode keeps the input type
    got = _vals(out)
    assert got[5] == 2 and got[6] == 2


def test_global_no_groups_and_replace(spark):
    df = spark.createDataFrame(
        [(1, 4.0), (2, None), (3, 8.0)], "id long, v double"
    )
    out = impute_by_group(df, "v", strategy="mean")  # replace mode
    assert {r["id"]: r["v"] for r in out.collect()}[2] == pytest.approx(6.0)


def test_all_null_column_stays_null(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", None)], SCHEMA
    )
    for s in ("mean", "median", "mode"):
        got = _vals(impute_by_group(df, "v", ["g"], s, suffix="_f"))
        assert got == {1: None, 2: None}, s
        # and the no-groups global path
        got2 = {
            r["id"]: r["v_f"]
            for r in impute_by_group(df, "v", None, s, suffix="_f").collect()
        }
        assert got2 == {1: None, 2: None}, s


def test_approx_median_close(spark):
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(1000)] + [(9999, "g", None)],
        SCHEMA,
    )
    exact = _vals(impute_by_group(df, "v", ["g"], "median", suffix="_f"))
    appr = _vals(
        impute_by_group(df, "v", ["g"], "median", approx=True, suffix="_f")
    )
    assert abs(exact[9999] - appr[9999]) <= 1.0


def test_validation(spark):
    df = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="strategy"):
        impute_by_group(df, "v", ["g"], "max")
