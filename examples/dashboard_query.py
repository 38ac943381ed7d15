"""Mirror of the reference's dashboard query lifecycle (Entry-point C):
write a gold-layer parquet through the medallion path generator, then
answer filtered-aggregation / schema / drill-down / distinct-values
requests through DashboardService — the same four endpoints as
POST /api/analytics/dashboard/*.

Run: python examples/dashboard_query.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_etl_framework_spark.plans import DashboardService
from ai_etl_framework_spark.session import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="example-dashboard")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="medallion_")

    # pipeline side: land orders as the gold/bi dataset for org "acme"
    from ai_etl_framework_spark.sources.paths import generate_outputs

    paths = generate_outputs(base, "Acme Corp", "Orders Feed")
    load_table(spark, SF_DIR, "orders").write.parquet(paths["bi_path"])

    # dashboard side: same request shapes as the REST endpoints
    svc = DashboardService(spark, base)
    res = svc.query(
        "Acme Corp",
        "Orders Feed",
        filters=[{"column": "o_orderstatus", "operator": "neq", "value": "P"}],
        spec={
            "group_by": ["o_orderpriority"],
            "metrics": [
                {"column": "o_totalprice", "agg": "sum", "alias": "revenue"},
                {"column": "o_orderkey", "agg": "count", "alias": "orders"},
            ],
            "limit": 10,
        },
    )
    for rec in res["records"]:
        print(rec)
    print(f"({res['row_count']} rows in {res['query_time_ms']} ms)")

    prof = svc.schema("Acme Corp", "Orders Feed")
    print("schema buckets:", {n: c["type"] for n, c in list(prof["columns"].items())[:3]})
    print("priorities:", svc.filter_values("Acme Corp", "Orders Feed", "o_orderpriority")["values"])

    # r12 entry-point-C additions — the same request shapes as
    # POST /api/analytics/generate-insights and
    # POST /api/analytics/visualizations/generate (ref main.py:789,
    # :1238). No LLM client here, so insights returns the prepared
    # context payload with a null summary (the offline path).
    ins = svc.insights("Acme Corp", "Orders Feed", run_type="etl")
    ctx = ins["insights"]["context"]
    print(
        "insights:", ins["status"],
        f"rows={ctx['row_count']}",
        "metrics:", ctx["suggested_metrics"][:2],
    )
    again = svc.insights("Acme Corp", "Orders Feed", run_type="rag")
    print("rerun (ETL precedence):", again["status"], "-", again["reason"])

    viz = svc.visualizations("Acme Corp", "Orders Feed", max_charts=5)
    print(f"visualizations: {viz['count']} charts generated")
    for c in viz["charts"]:
        if "config" in c:
            spec = c["spec"]
            print(
                "  ", spec["type"], "on", spec.get("x"),
                f"({c['rows']} aggregated rows,",
                f"{len(c['config'].get('series', []))} series)",
            )


if __name__ == "__main__":
    main()
