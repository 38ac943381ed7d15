#!/usr/bin/env python
"""A/B: distributed q07 with the range partitioner keyed on the FULL
6-col order key (current) vs the LEADING column only (l_orderkey) —
ties of the leading key all land in one range partition, and the
within-partition sort still uses the full key, so global order is
preserved while the range sampler samples/compares one long instead
of a 6-col tuple. Alternating order, noop sink."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.environ.get("SCALE_SMOKE_DIR", "/tmp/sf1_scale_smoke")

from pyspark.sql import functions as F  # noqa: E402

from ai_etl_framework_spark.session import get_spark, load_table  # noqa: E402

ORDER = ["l_orderkey", "l_linenumber", "l_suppkey", "l_partkey",
         "l_returnflag", "l_linestatus"]


def build(spark, sf_dir, range_cols):
    li = load_table(spark, sf_dir, "lineitem")
    ordering = [F.col(c).asc_nulls_last() for c in ORDER]
    range_ordering = [F.col(c).asc_nulls_last() for c in range_cols]
    df = (
        li.repartitionByRange(*range_ordering)
        .sortWithinPartitions(*ordering)
        .withColumn("__rn", F.monotonically_increasing_id())
        .withColumn("__slice", F.spark_partition_id())
    )
    rn, c = F.col("__rn"), F.col("l_linestatus")
    entry = F.when(c.isNotNull(), F.struct(rn.alias("r"), c.cast("string").alias("v")))
    se = F.array_sort(F.collect_list(entry))
    part = F.when(F.size(se) > 0,
                  F.array_join(F.transform(se, lambda s: s["v"]), ", ")).alias("p")
    lvl1 = df.groupBy("__slice", "l_returnflag").agg(
        part,
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct(rn.alias("r"), c.alias("v"))).alias("fst"),
    )
    out = lvl1.groupBy("l_returnflag").agg(
        F.array_join(
            F.filter(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("__slice").alias("p"), F.col("p").alias("v")))),
                    lambda s: s["v"],
                ),
                lambda x: x.isNotNull(),
            ),
            ", ",
        ).alias("concat"),
        F.sum("n").alias("n"),
        F.min("fst")["v"].alias("first_status"),
    )
    return out.select("l_returnflag", F.length("concat"), "n", "first_status")


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="ab_q07_rangekey")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {"full6": ORDER, "lead1": ["l_orderkey"]}
    # sanity: identical results
    a = build(spark, SF1, variants["full6"]).collect()
    b = build(spark, SF1, variants["lead1"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)), (a, b)
    for k in variants:
        force(build(spark, SF1, variants[k]))  # warm
    runs = 7
    series = {k: [] for k in variants}
    for i in range(runs):
        order = list(variants) if i % 2 == 0 else list(reversed(list(variants)))
        for k in order:
            t0 = time.perf_counter()
            force(build(spark, SF1, variants[k]))
            series[k].append(time.perf_counter() - t0)
    for k, xs in series.items():
        print(f"{k}: median {statistics.median(xs):.3f} runs {[round(x,3) for x in xs]}")
    spark.stop()


if __name__ == "__main__":
    main()
