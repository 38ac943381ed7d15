"""Skew utilities: salted join / salted distinct / two-phase agg must
be row-identical to their plain formulations."""

from __future__ import annotations

import os

import pytest

# r14 driver-tier split (VERDICT r13 item 1): this suite is
# hypothesis/differential/e2e-heavy and runs in the SLOW tier
# (`pytest -m slow`); the driver's default `pytest tests/` keeps
# the contract/pin/parity suites inside its verify window.
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from ai_etl_framework_spark.operators.skew import (

    salted_count_distinct,
    salted_join,
    two_phase_agg,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one key — the classic hot-key shape."""
    base = spark.range(0, 10_000)
    return base.select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 100).cast("string"))
        ).alias("k"),
        (F.col("id") % 997).alias("v"),
    )


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "hot-dim"), ("k10", "cold-dim")], "k string, label string"
    )
    plain = skewed.join(dim, ["k"]).groupBy("k", "label").count()
    salted = salted_join(skewed, dim, ["k"], salt=8).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(spark, skewed):
    dim = spark.createDataFrame([("HOT", 1)], "k string, d int")
    plain = skewed.join(dim, ["k"], "left")
    salted = salted_join(skewed, dim, ["k"], salt=4, how="left")
    assert salted.count() == plain.count()
    assert salted.filter(F.col("d").isNull()).count() == plain.filter(F.col("d").isNull()).count()


def test_salted_count_distinct(skewed):
    plain = skewed.groupBy("k").agg(F.countDistinct("v").alias("n_distinct"))
    salted = salted_count_distinct(skewed, ["k"], "v")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_collect_list(skewed):
    plain = skewed.groupBy("k").agg(F.sort_array(F.collect_list("v")).alias("vs"))
    salted = two_phase_agg(
        skewed,
        ["k"],
        {"vs": F.collect_list("v")},
        {"vs": F.sort_array(F.flatten(F.collect_list("vs")))},
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_outer_shapes(spark):
    """r4 review: right/full outer would emit `salt` duplicates of
    every unmatched replicated small-side row."""
    import pytest

    from ai_etl_framework_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "x")], "k int, v string")
    small = spark.createDataFrame([(1, "d")], "k int, d string")
    for bad in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, on=["k"], how=bad)
    assert salted_join(big, small, on=["k"], how="left").count() == 1


def test_salted_count_distinct_ignores_nulls_like_sql(spark):
    """r5 review: COUNT(DISTINCT x) never counts NULL as a value, and
    a key whose values are ALL NULL still appears with count 0."""
    from ai_etl_framework_spark.operators.skew import salted_count_distinct

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", None), ("a", "y"),
         ("b", None), ("b", None)],
        "k string, v string",
    )
    out = {r["k"]: r["n_distinct"] for r in salted_count_distinct(df, ["k"], "v").collect()}
    assert out == {"a": 2, "b": 0}
    # differential: matches countDistinct per key
    from pyspark.sql import functions as F

    ref = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()}
    assert out == ref


def test_ordered_group_concat_matches_aggregator(spark):
    """ordered_group_concat (distributed-sort, two-shuffle) must equal
    the Aggregator's single-partition-per-group concat on the same
    data: 2 hot groups x 4000 interleaved rows scattered over 32
    partitions, composite order key with NULL components, NULL values
    dropped, an all-NULL-value group surviving as ''."""
    from pyspark.sql import functions as F

    from ai_etl_framework_spark.operators import Aggregator
    from ai_etl_framework_spark.operators.skew import ordered_group_concat

    n = 4000
    base = spark.range(n).select(
        (F.col("id") % 2).cast("string").alias("g"),
        # descending order key so arrival order never accidentally wins
        (F.lit(n) - F.col("id")).alias("o1"),
        # sprinkle NULL order components and NULL values
        F.when(F.col("id") % 97 == 0, F.lit(None)).otherwise(F.col("id") % 7).alias("o2"),
        F.when(F.col("id") % 13 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("v"), F.col("id").cast("string")))
        .alias("v"),
    )
    allnull = spark.createDataFrame(
        [("z", 1, 1, None), ("z", 2, 2, None)], "g string, o1 long, o2 long, v string"
    )
    df = base.unionByName(allnull).repartition(32, "o2")

    # empty-STRING values must survive assembly even when a slice
    # holds nothing else — '' as a part is content, only NULL parts
    # (slices with no entries) may be dropped (r6 self-review bug:
    # 'a' in slice 1 + '' in slice 2 returned 'a' instead of 'a, ')
    empties = spark.createDataFrame(
        [("e", 1, 1, "a"), ("e", 1000000, 1, "")],
        "g string, o1 long, o2 long, v string",
    )
    df = df.unionByName(empties)

    got = {
        r["g"]: r["v_concat"]
        for r in ordered_group_concat(df, ["g"], ["o1", "o2"], "v").collect()
    }
    agg = Aggregator(
        group_by=["g"],
        aggregations={"v_concat": {"field": "v", "function": "concat"}},
        order_col=["o1", "o2"],
    )
    want = {r["g"]: r["v_concat"] for r in agg(df).collect()}
    assert got == want
    assert got["z"] == ""
    # the sort really is distributed: the plan range-partitions on the
    # ORDER key, never hash-partitions the raw input by the group key
    out = ordered_group_concat(df, ["g"], ["o1", "o2"], "v")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "rangepartitioning" in plan


def test_ordered_group_concat_random_differential(spark):
    """Property check: on random small batches (unique order key — ties
    are documented-arbitrary in BOTH implementations, so equality is
    only promised for total orders) the distributed-sort concat equals
    the Aggregator's concat exactly, including groups whose values are
    partially or fully NULL."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ai_etl_framework_spark.operators import Aggregator
    from ai_etl_framework_spark.operators.skew import ordered_group_concat

    rows_strategy = st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),
            st.one_of(st.none(), st.sampled_from(["x", "y", "", "x, y"])),
        ),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=rows_strategy)
    def run(rows):
        df = spark.createDataFrame(
            [(g, i, v) for i, (g, v) in enumerate(rows)],
            "g string, o long, v string",
        ).repartition(5)
        got = {
            r["g"]: r["v_concat"]
            for r in ordered_group_concat(df, ["g"], ["o"], "v").collect()
        }
        agg = Aggregator(
            group_by=["g"],
            aggregations={"v_concat": {"field": "v", "function": "concat"}},
            order_col=["o"],
        )
        want = {r["g"]: r["v_concat"] for r in agg(df).collect()}
        assert got == want

    run()
