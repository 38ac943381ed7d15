#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query into
plans/r13/<query>_<tag>.txt (tag = before/after, argv[1]).

Usage: python scripts/capture_plans_r13.py before [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    import bench
    import __spark_entry__ as entrymod
    from ai_etl_framework_spark.session import get_spark

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    os.makedirs(out_dir, exist_ok=True)

    reg = entrymod.queries()
    spark = get_spark(app_name="capture_plans_r13")
    spark.sparkContext.setLogLevel("ERROR")
    for name in bench.BENCH_QUERIES:
        if only and name not in only:
            continue
        fn = getattr(entrymod, name, None) or reg[name]
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        # quick shape summary to stdout
        n_ex = plan.count("Exchange")
        joins = [
            w for w in (
                "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                "BroadcastNestedLoopJoin", "CartesianProduct",
            ) if w in plan
        ]
        py = [w for w in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                          "FlatMapGroupsInPandas") if w in plan]
        print(f"{name}: Exchange x{n_ex}, joins={joins or '-'}, python={py or '-'}")
    spark.stop()


if __name__ == "__main__":
    main()
