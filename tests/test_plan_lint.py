"""Plan lint (plans/lint.py): the detector itself, then the
repo-wide sweep — EVERY oracle-backed registry entry must compile
free of per-row Python UDFs and cartesian products. A new operator
that slips either anti-pattern into its plan fails HERE, not on the
cluster."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from ai_etl_framework_spark.plans.lint import assert_scalable, lint_plan

# rows-only entries excluded from the sweep: they RUN work at plan-
# construction time (streaming queries, model fits) rather than
# returning a lazy frame — their scale evidence is their own suites.
SWEEP = sorted(set(entrymod.oracle_sql()))


def test_detects_row_udf(spark):
    from pyspark.sql.functions import udf

    bad = udf(lambda x: x + 1, "long")
    df = spark.range(10).select(bad(F.col("id")).alias("y"))
    with pytest.raises(AssertionError, match="BatchEvalPython"):
        assert_scalable(df)
    assert lint_plan(df)["python_row_udfs"] >= 1


def test_detects_cartesian(spark):
    a, b = spark.range(5), spark.range(5)
    df = a.crossJoin(b).where(
        # non-equi condition so AQE can't turn it into anything better
        a["id"] + b["id"] > F.lit(3)
    ).hint("shuffle_replicate_nl")
    if lint_plan(df)["cartesian"] == 0:
        pytest.skip("planner chose BNLJ on this version")
    with pytest.raises(AssertionError, match="CartesianProduct"):
        assert_scalable(df)


def test_arrow_nodes_are_sanctioned(spark):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _plus(s):
        return s + 1

    _plus.__annotations__ = {"s": pd.Series, "return": pd.Series}
    good = pandas_udf(_plus, "long")
    df = spark.range(10).select(good(F.col("id")).alias("y"))
    findings = assert_scalable(df)  # must NOT raise
    assert findings["arrow_python_nodes"] >= 1
    assert findings["python_row_udfs"] == 0


def test_bnlj_gate(spark):
    one = spark.createDataFrame([(1.0,)], "mu double")
    df = spark.range(10).crossJoin(F.broadcast(one))
    assert_scalable(df)  # allowed by default
    if lint_plan(df)["broadcast_nested_loop"]:
        with pytest.raises(AssertionError, match="BroadcastNestedLoopJoin"):
            assert_scalable(df, allow_bnlj=False)


def test_pushdown_reported(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderkey") == 7
    )
    assert lint_plan(df)["pushed_filters"] is True


@pytest.mark.parametrize("name", SWEEP)
def test_registry_entry_is_scalable(name, spark, sf_dir):
    """The repo-wide invariant: no oracle-backed entry compiles to a
    per-row Python UDF or a cartesian product. (Arrow-batched seams —
    iforest, knn matmul, BPE encode — are sanctioned and show up in
    arrow_python_nodes instead.)"""
    df = entrymod.queries()[name](spark, sf_dir)
    assert_scalable(df)
