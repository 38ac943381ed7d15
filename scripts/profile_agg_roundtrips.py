#!/usr/bin/env python
"""Measure the Aggregator plan-BUILD cost of q07/q27/q32: py4j round
trips (deterministic — counted at py4j's send_command) and wall time,
for the r14 SQL-text path vs the Column-API reference (forced by
monkeypatching _agg_expr_sql to refuse), interleaved in ONE process so
JVM/socket state is shared (the r13 methodology: cross-process
wall-clock drifts with JVM cache churn; the round-trip count is the
throttle-insensitive number).

Usage: python scripts/profile_agg_roundtrips.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entrymod
    from ai_etl_framework_spark.operators import aggregator
    from ai_etl_framework_spark.session import get_spark, load_table

    import py4j.clientserver as cs

    counter = {"n": 0}
    orig = cs.ClientServerConnection.send_command

    def counted(self, *a, **kw):
        counter["n"] += 1
        return orig(self, *a, **kw)

    cs.ClientServerConnection.send_command = counted

    spark = get_spark(app_name="profile_agg_roundtrips")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SF_DIR, "lineitem").count()
    load_table(spark, SF_DIR, "orders").count()

    queries = ["q07_agg_semantics", "q32_agg_list", "q27_agg_custom_udaf"]
    qs = {n: getattr(entrymod, n) for n in queries}

    real_sql = aggregator._agg_expr_sql

    def arm(name, use_sql):
        aggregator._agg_expr_sql = real_sql if use_sql else (
            lambda *a, **kw: None
        )
        try:
            # build only — no execution; one untimed warm build first
            qs[name](spark, SF_DIR)
            trips, secs = [], []
            for _ in range(5):
                n0 = counter["n"]
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR)
                secs.append(time.perf_counter() - t0)
                trips.append(counter["n"] - n0)
            return statistics.median(trips), statistics.median(secs)
        finally:
            aggregator._agg_expr_sql = real_sql

    print(f"{'query':24s} {'arm':10s} {'trips':>7s} {'build_s':>8s}")
    for name in queries:
        # interleave arms: ref, sql, ref, sql — report medians per arm
        for use_sql in (False, True, False, True):
            t, s = arm(name, use_sql)
            print(f"{name:24s} {'sql' if use_sql else 'column':10s} "
                  f"{t:7.0f} {s:8.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
