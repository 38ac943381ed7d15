"""Plan linting — the repo's scale anti-pattern checks as a reusable
API (the same rules tests/test_plan_quality.py asserts ad hoc, and the
first thing to run on a user-written pipeline before pointing it at
100 TB): row-wise Python UDFs, cartesian products, exchange counts,
whole-stage-codegen coverage, parquet pushdown.

``lint_plan(df)`` inspects the EXECUTED plan (post-AQE-prepare) and
returns a dict of findings; ``assert_scalable(df)`` raises on the two
hard anti-patterns. The whole query registry is swept in
tests/test_plan_lint.py — a new operator that slips a per-row UDF or
an accidental cross join into its plan fails CI, not the cluster.

What counts as what:

- ``python_row_udfs`` — BatchEvalPython nodes (per-row pickling, the
  10-100× slow path). Arrow-batched nodes (ArrowEvalPython,
  MapInPandas, FlatMapGroupsInPandas…) are the SANCTIONED Python
  seam and are reported separately, never flagged.
- ``cartesian`` — CartesianProduct nodes. BroadcastNestedLoopJoin is
  reported (it is how Spark executes a broadcast cross join, e.g.
  the deliberate 1-row statistics joins) but only flagged by
  ``assert_scalable`` when ``allow_bnlj=False``.
- ``exchanges`` / ``reused_exchanges`` — shuffle boundary count (the
  number to stare at before a 100× scale-up).
- ``wholestage_ids`` — distinct WholeStageCodegen spans (bigger
  spans = more of the plan fused into generated code).
- ``pushed_filters`` — True when any parquet scan carries a
  PushedFilters entry that is not ``[]``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["lint_plan", "assert_scalable"]

_ARROW_NODES = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "AggregateInPandas",
    "WindowInPandas",
    "MapInArrow",
)


def lint_plan(df: DataFrame) -> dict:
    """Inspect ``df``'s executed plan; returns the findings dict."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "python_row_udfs": plan.count("BatchEvalPython"),
        "arrow_python_nodes": sum(plan.count(n) for n in _ARROW_NODES),
        "cartesian": plan.count("CartesianProduct"),
        "broadcast_nested_loop": plan.count("BroadcastNestedLoopJoin"),
        "exchanges": len(re.findall(r"Exchange (hash|range|Single)", plan)),
        "reused_exchanges": plan.count("ReusedExchange"),
        "wholestage_ids": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "pushed_filters": bool(
            re.search(r"PushedFilters: \[(?!\])", plan)
        ),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
    }


def assert_scalable(df: DataFrame, allow_bnlj: bool = True) -> dict:
    """Raise AssertionError on per-row Python UDFs or cartesian
    products; returns the findings for further checks. BNLJ is
    allowed by default (broadcast 1-row statistics joins are
    legitimate); pass ``allow_bnlj=False`` for plans that must be
    pure equi-join."""
    findings = lint_plan(df)
    problems = []
    if findings["python_row_udfs"]:
        problems.append(
            f"{findings['python_row_udfs']} BatchEvalPython node(s) — "
            "per-row Python UDFs; use pandas_udf/mapInPandas"
        )
    if findings["cartesian"]:
        problems.append(
            f"{findings['cartesian']} CartesianProduct node(s)"
        )
    if not allow_bnlj and findings["broadcast_nested_loop"]:
        problems.append(
            f"{findings['broadcast_nested_loop']} BroadcastNestedLoopJoin "
            "node(s) disallowed by caller"
        )
    if problems:
        raise AssertionError("; ".join(problems))
    return findings
