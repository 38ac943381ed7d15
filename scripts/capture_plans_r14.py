#!/usr/bin/env python
"""Capture `.explain("formatted")` for every query the r14 plan-build
campaign touched, in BOTH builds:

- `_before`: the Column-API construction (pre-r14 code path, forced by
  monkeypatching `aggregator._agg_expr_sql`/`_order_key_sql` to refuse
  and `aggspec._metric_expr` to the reference build);
- `_after`: the r14 SQL-text construction (the shipping path).

The campaign's claim is that the EXECUTED PLAN IS IDENTICAL — only
driver-side construction cost changes — so the paired captures should
diff empty except for expression IDs. Writes plans/r14/.

Usage: python scripts/capture_plans_r14.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r14")

QUERIES = ["q07_agg_semantics", "q27_agg_custom_udaf", "q32_agg_list",
           "x06_distributed_ordered_agg", "q02_filter_spec"]


def capture(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    import __spark_entry__ as entrymod
    from ai_etl_framework_spark.operators import aggregator
    from ai_etl_framework_spark.plans import aggspec
    from ai_etl_framework_spark.session import get_spark

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="capture_plans_r14")
    spark.sparkContext.setLogLevel("ERROR")

    real_agg_sql = aggregator._agg_expr_sql
    real_key_sql = aggregator._order_key_sql
    real_metric = aggspec._metric_expr

    def force_column_api(on: bool) -> None:
        aggregator._agg_expr_sql = (
            (lambda *a, **kw: None) if on else real_agg_sql
        )
        aggregator._order_key_sql = (
            (lambda *a, **kw: None) if on else real_key_sql
        )
        aggspec._metric_expr = (
            aggspec._metric_expr_column_api if on else real_metric
        )

    for name in QUERIES:
        fn = getattr(entrymod, name, None) or entrymod.queries()[name]
        for tag, col_api in (("before", True), ("after", False)):
            force_column_api(col_api)
            try:
                txt = capture(fn(spark, SF_DIR))
            finally:
                force_column_api(False)
            path = os.path.join(OUT, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(
                    f"-- {name} [{tag} = "
                    f"{'Column-API build' if col_api else 'r14 SQL-text build'}]"
                    f" sf_dir={SF_DIR}\n"
                )
                fh.write(txt)
            print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
