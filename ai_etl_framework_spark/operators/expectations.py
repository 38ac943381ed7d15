"""Declarative data-quality checks — a deequ/Great-Expectations-style
constraint suite that compiles to ONE aggregation pass (the
completeness/uniqueness/bounds/pattern checks every production table
contract runs before publishing a snapshot). Beyond-reference scope:
the reference validates schema shape only (schema_inferrer.py's nine
regexes, covered by q23); it has no table-level constraint engine.

Constraint types (pinned, oracle-replicated):

- ``not_null``   — fraction of non-NULL values ("" counts as a value);
- ``unique``     — distinct count / row count (NULLs: each NULL is its
  own row but ``countDistinct`` ignores them — pinned: metric =
  (distinct non-NULL + null rows) / rows, so duplicated NULLs fail);
- ``min`` / ``max``   — observed bound vs the constraint value
  (metric = the observed bound; passes when within);
- ``in_set``     — fraction of non-NULL values inside the allowed set;
- ``matches``    — fraction of non-NULL values matching an RE2-safe
  regex (``rlike`` ≡ DuckDB ``regexp_matches``);
- ``threshold``  — every fraction-type check passes when
  ``metric >= threshold`` (default 1.0 — exact); bound checks ignore
  it.

Output: one row per check — (check, column, metric, threshold,
passed) — suitable for writing next to the data as a publish gate.

Scale shape: every constraint lowers to aggregate EXPRESSIONS over
one scan (a single hash-free global aggregation; map-side partials),
EXCEPT ``unique`` which adds Spark's count-distinct expansion —
still one job. No per-constraint passes, no driver loops: checking
30 constraints on a 100 TB table costs one table scan."""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["run_checks"]

_FRACTION_CHECKS = ("not_null", "unique", "in_set", "matches")


def _metric_expr(check: Mapping[str, Any]):
    # try_divide, not `/`: a zero denominator (empty frame; all-NULL
    # column for in_set/matches) must yield the documented metric NULL
    # under ANSI sessions too — plain division raises DIVIDE_BY_ZERO
    # when spark.sql.ansi.enabled=true (the Spark 4 default session).
    kind, col = check["check"], check["column"]
    c = F.col(col)
    n = F.count(F.lit(1))
    if kind == "not_null":
        return F.try_divide(F.count(c), n)
    if kind == "unique":
        nulls = n - F.count(c)
        return F.try_divide(F.countDistinct(c) + nulls, n)
    if kind == "min":
        return F.min(c).cast("double")
    if kind == "max":
        return F.max(c).cast("double")
    if kind == "in_set":
        vals = list(check["values"])
        return F.try_divide(F.count(F.when(c.isin(vals), 1)), F.count(c))
    if kind == "matches":
        return F.try_divide(
            F.count(F.when(c.rlike(check["pattern"]), 1)), F.count(c)
        )
    raise ValueError(f"unknown check type {kind!r}")


def run_checks(
    df: DataFrame, checks: Sequence[Mapping[str, Any]]
) -> DataFrame:
    """Evaluate ``checks`` in one aggregation pass. Each check is a
    dict: ``{"check": <type>, "column": <col>, ...}`` with
    ``threshold`` (fraction checks, default 1.0), ``value`` (min/max
    bound), ``values`` (in_set), ``pattern`` (matches). Returns
    (check, column, metric, threshold, passed) — metric rounded 6dp;
    an empty frame yields metric NULL and passed NULL for fraction
    checks (no evidence), bound checks likewise."""
    if not checks:
        raise ValueError("run_checks needs at least one check")
    aggs = []
    for i, ck in enumerate(checks):
        aggs.append(F.round(_metric_expr(ck), 6).alias(f"__m{i}"))
    row = df.agg(*aggs)
    spark = df.sparkSession
    out_rows = []
    metrics = row.collect()[0]
    for i, ck in enumerate(checks):
        kind = ck["check"]
        m = metrics[f"__m{i}"]
        if kind in _FRACTION_CHECKS:
            thr = float(ck.get("threshold", 1.0))
            passed = None if m is None else bool(m >= thr)
        elif kind == "min":
            thr = float(ck["value"])
            passed = None if m is None else bool(m >= thr)
        else:  # max
            thr = float(ck["value"])
            passed = None if m is None else bool(m <= thr)
        out_rows.append(
            (kind, ck["column"], float(m) if m is not None else None,
             thr, passed)
        )
    return spark.createDataFrame(
        out_rows,
        "check string, column string, metric double, threshold double, "
        "passed boolean",
    )
