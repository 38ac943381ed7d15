"""The interactive query surface (reference: src/database/duckdb_service.py).

`Filter` + `AggregationSpec` are the engine's logical IR; the
compilers in this package turn them into DataFrame expressions so
Catalyst gets the whole plan (predicate pushdown, column pruning,
partial aggregation) instead of an opaque SQL string.
"""

from ai_etl_framework_spark.plans.filters import Filter, compile_filters
from ai_etl_framework_spark.plans.aggspec import AggregationSpec, Metric, compile_query
from ai_etl_framework_spark.plans.pagination import drill_down, distinct_values
from ai_etl_framework_spark.plans.profile import profile_schema
from ai_etl_framework_spark.plans.service import DashboardService

__all__ = [
    "DashboardService",
    "Filter",
    "compile_filters",
    "AggregationSpec",
    "Metric",
    "compile_query",
    "drill_down",
    "distinct_values",
    "profile_schema",
]
