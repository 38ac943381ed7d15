"""Mirror of the reference's examples/aggregation_pipeline.py: the
Aggregator with its exact semantics (count incl. NULLs, string-cast
count_distinct, ", "-joined concat) over the orders test table.

Run: python examples/aggregation_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_etl_framework_spark.operators import Aggregator
from ai_etl_framework_spark.session import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="example-aggregation")
    spark.sparkContext.setLogLevel("ERROR")
    orders = load_table(spark, SF_DIR, "orders")

    agg = Aggregator(
        group_by=["o_orderstatus"],
        aggregations={
            "n_orders": {"field": "o_orderkey", "function": "count"},
            "total_price": {"field": "o_totalprice", "function": "sum"},
            "avg_price": {"field": "o_totalprice", "function": "avg"},
            "n_priorities": {"field": "o_orderpriority", "function": "count_distinct"},
        },
        order_col="o_orderkey",  # input-order column for order-sensitive fns
    )
    agg(orders).orderBy("o_orderstatus").show(truncate=False)


if __name__ == "__main__":
    main()
