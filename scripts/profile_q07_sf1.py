#!/usr/bin/env python
"""q07 sf1 drift re-profile (VERDICT r9 item 2): the sf1 smoke read
q07's warm ratio at 2.95x (r8) -> 3.39x (r9) for 10x data — the
closest query to the 2x twin line. This script separates plan from
cache-state/noise:

1. builds (or reuses) the sf1 dir via scale_smoke's constructor;
2. reports WHICH aggregator path fires at each SF
   (distribute_sort="auto" -> _should_distribute + the scan estimate
   vs the 64 MiB threshold);
3. deep-warms q07 at BOTH SFs in ALTERNATING order (the r8 lesson:
   sequential A/B reads as "later wins") and prints per-run series +
   medians + the ratio;
4. optionally (--paths) times the stamp path vs the distributed path
   at sf1 explicitly, so the auto crossover choice is evidence, not
   faith.

Usage: python scripts/profile_q07_sf1.py [--paths] [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SCALE_SMOKE_DIR", "/tmp/sf1_scale_smoke")


def main() -> None:
    import __spark_entry__ as entrymod
    from scripts.scale_smoke import build_sf1
    from ai_etl_framework_spark.session import get_spark, load_table

    spark = get_spark(app_name="profile_q07_sf1")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(os.path.join(SF1, "lineitem.parquet")):
        print(f"building sf1 dir at {SF1} ...", file=sys.stderr)
        build_sf1(spark, SF1)

    # which path does "auto" take at each SF?
    from ai_etl_framework_spark.operators import Aggregator

    agg = Aggregator(
        group_by=["l_returnflag"],
        aggregations={"n": {"field": "l_quantity", "function": "count"}},
        order_col=["l_orderkey"],
        distribute_sort="auto",
    )
    for tag, d in (("sf0.1", SF01), ("sf1", SF1)):
        li = load_table(spark, d, "lineitem")
        plan = li._jdf.queryExecution().optimizedPlan()
        size = int(plan.stats().sizeInBytes())
        print(
            f"{tag}: scan estimate {size / (1 << 20):.1f} MiB, "
            f"threshold {agg.distribute_sort_threshold / (1 << 20):.0f} MiB, "
            f"distributed={agg._should_distribute(li)}"
        )

    runs = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 7
    q07 = entrymod.q07_agg_semantics

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # page-cache + JIT warm on both dirs
    for d in (SF01, SF1):
        for _ in range(3):
            force(q07(spark, d))

    series: dict[str, list[float]] = {"sf0.1": [], "sf1": []}
    for i in range(runs):
        for tag, d in (("sf0.1", SF01), ("sf1", SF1)) if i % 2 == 0 else (
            ("sf1", SF1), ("sf0.1", SF01)
        ):
            t0 = time.perf_counter()
            force(q07(spark, d))
            series[tag].append(time.perf_counter() - t0)

    for tag, xs in series.items():
        print(
            f"{tag}: median {statistics.median(xs):.3f}s "
            f"min {min(xs):.3f} runs {[round(x, 3) for x in xs]}"
        )
    m01, m1 = statistics.median(series["sf0.1"]), statistics.median(series["sf1"])
    print(f"sf1/sf0.1 warm ratio (alternating, median): {m1 / m01:.2f}x")

    if "--paths" in sys.argv:
        # explicit path A/B at sf1: stamp (False) vs distributed (True),
        # alternating order
        from pyspark.sql import functions as F

        def q07_forced(dist):
            def run(d):
                li = load_table(spark, d, "lineitem")
                a = Aggregator(
                    group_by=["l_returnflag"],
                    aggregations={
                        "n_rows": {"field": "l_quantity", "function": "count"},
                        "n_status": {"field": "l_linestatus", "function": "count_distinct"},
                        "sum_qty_raw": {"field": "l_quantity", "function": "sum"},
                        "avg_qty_raw": {"field": "l_quantity", "function": "avg"},
                        "min_qty_raw": {"field": "l_quantity", "function": "min"},
                        "max_qty_raw": {"field": "l_quantity", "function": "max"},
                        "first_status": {"field": "l_linestatus", "function": "first"},
                        "last_status": {"field": "l_linestatus", "function": "last"},
                        "status_concat": {"field": "l_linestatus", "function": "concat"},
                    },
                    order_col=[
                        "l_orderkey", "l_linenumber", "l_suppkey",
                        "l_partkey", "l_returnflag", "l_linestatus",
                    ],
                    distribute_sort=dist,
                )
                return a(li).select("l_returnflag", F.length("status_concat"))
            return run

        paths = {"stamp": q07_forced(False), "distributed": q07_forced(True)}
        pseries: dict[str, list[float]] = {k: [] for k in paths}
        for k in paths:
            force(paths[k](SF1))  # warm each
        for i in range(runs):
            order = list(paths) if i % 2 == 0 else list(reversed(list(paths)))
            for k in order:
                t0 = time.perf_counter()
                force(paths[k](SF1))
                pseries[k].append(time.perf_counter() - t0)
        for k, xs in pseries.items():
            print(
                f"sf1 {k}: median {statistics.median(xs):.3f}s "
                f"runs {[round(x, 3) for x in xs]}"
            )

    spark.stop()


if __name__ == "__main__":
    main()
