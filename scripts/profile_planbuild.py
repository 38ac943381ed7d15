#!/usr/bin/env python
"""Decompose each bench row's warm latency into (a) DataFrame
construction (Python Column building + py4j chatter), (b) analysis +
optimization + physical planning (Catalyst, forced via
queryExecution().executedPlan()), and (c) execution + Arrow delivery
(toPandas on the pre-planned frame).

The bench's warm number deliberately includes all three (dashboard
latency). This profile says which slice each row actually spends its
time in, so optimization effort lands on the binding one (guide §1.1
empirical loop).

Usage: python scripts/profile_planbuild.py [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench
    import __spark_entry__ as entrymod
    from ai_etl_framework_spark.session import get_spark, load_table

    only = set(sys.argv[1:])
    reg = entrymod.queries()
    spark = get_spark(app_name="profile_planbuild")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("events", "documents", "embeddings", "customer", "orders",
              "lineitem"):
        load_table(spark, SF_DIR, t).count()

    names = [n for n in bench.BENCH_QUERIES if not only or n in only]
    qs = {n: getattr(entrymod, n, None) or reg[n] for n in names}
    # full warm pass first (codegen/JIT)
    for n in names:
        qs[n](spark, SF_DIR).toPandas()

    print(f"{'query':28s} {'build':>7s} {'plan':>7s} {'exec':>7s} "
          f"{'total':>7s}")
    for n in names:
        builds, plans, execs, totals = [], [], [], []
        for _ in range(5):
            t0 = time.perf_counter()
            df = qs[n](spark, SF_DIR)
            t1 = time.perf_counter()
            # force analysis + optimization + physical planning
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.toPandas()
            t3 = time.perf_counter()
            builds.append(t1 - t0)
            plans.append(t2 - t1)
            execs.append(t3 - t2)
            totals.append(t3 - t0)
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        print(f"{n:28s} {med(builds):7.3f} {med(plans):7.3f} "
              f"{med(execs):7.3f} {med(totals):7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
