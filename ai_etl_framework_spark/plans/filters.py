"""Filter spec → Column predicate compiler.

Reference semantics (src/database/duckdb_service.py:22-27 dataclass,
255-325 WHERE builder), reproduced exactly:

- 13 operators: eq, neq, in, not_in, between, gt, gte, lt, lte,
  contains, not_contains, is_null, is_not_null.
- conditions are ANDed.
- ``contains`` is case-insensitive substring (ILIKE '%v%'),
  duckdb_service.py:314-316.
- ``in`` / ``not_in`` with an empty list are silently skipped
  (no-op), duckdb_service.py:279-291.
- ``between`` applies only when exactly 2 values are given,
  duckdb_service.py:293-296.

Because these compile to native Column expressions, Catalyst pushes
them into the parquet scan (check: PushedFilters in .explain) — at
100 TB the filter runs in the reader, not after it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_OPERATORS = {
    "eq",
    "neq",
    "in",
    "not_in",
    "between",
    "gt",
    "gte",
    "lt",
    "lte",
    "contains",
    "not_contains",
    "is_null",
    "is_not_null",
}


@dataclass
class Filter:
    """One filter condition; mirrors the reference's Filter dataclass."""

    column: str
    operator: str
    value: Any = None

    def __post_init__(self) -> None:
        if self.operator not in VALID_OPERATORS:
            raise ValueError(f"unknown filter operator: {self.operator!r}")


def _escape_like(v: str) -> str:
    return v.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")


def to_predicate(f: Filter) -> Optional[Column]:
    """Compile one Filter to a Column, or None if it is a no-op."""
    c = F.col(f.column)
    op = f.operator
    if op == "eq":
        return c == F.lit(f.value)
    if op == "neq":
        return c != F.lit(f.value)
    if op == "in":
        vals = list(f.value or [])
        return c.isin(vals) if vals else None  # empty IN skipped (ref :281)
    if op == "not_in":
        vals = list(f.value or [])
        return ~c.isin(vals) if vals else None
    if op == "between":
        vals = list(f.value or [])
        if len(vals) != 2:  # only applied with exactly 2 values (ref :293)
            return None
        return c.between(F.lit(vals[0]), F.lit(vals[1]))
    if op == "gt":
        return c > F.lit(f.value)
    if op == "gte":
        return c >= F.lit(f.value)
    if op == "lt":
        return c < F.lit(f.value)
    if op == "lte":
        return c <= F.lit(f.value)
    if op == "contains":
        # ILIKE '%v%' — cast first so numeric columns are searchable
        # the way DuckDB's col::VARCHAR ILIKE does (ref :314-316).
        return c.cast("string").ilike(f"%{_escape_like(str(f.value))}%")
    if op == "not_contains":
        return ~c.cast("string").ilike(f"%{_escape_like(str(f.value))}%")
    if op == "is_null":
        return c.isNull()
    if op == "is_not_null":
        return c.isNotNull()
    raise AssertionError(op)


def compile_filters(filters: Iterable[Filter | dict]) -> Optional[Column]:
    """AND together all non-noop filters; None if nothing applies."""
    pred: Optional[Column] = None
    for f in filters or []:
        if isinstance(f, dict):
            f = Filter(**f)
        p = to_predicate(f)
        if p is None:
            continue
        pred = p if pred is None else (pred & p)
    return pred


def apply_filters(df: DataFrame, filters: Sequence[Filter | dict] | None) -> DataFrame:
    pred = compile_filters(filters or [])
    return df.filter(pred) if pred is not None else df
