"""Drill-down pagination + distinct filter-values.

Reference: src/database/duckdb_service.py:477-505 (drill-down) and
507-562 (filter values).

Divergence, by design (SURVEY §7.4 item 11): the reference paginates
with LIMIT/OFFSET and *no* ORDER BY (file order). Spark has no stable
implicit order, so pagination here always applies a total order: the
caller's ``order_by``, else every projected column as a deterministic
default — pages stay consistent across requests either way.

Scale note: offset+limit on a sorted DataFrame compiles to a global
sort limited to offset+limit rows (TakeOrderedAndProject) — it does
not materialize the full sort. Deep pagination (huge offsets) should
use keyset pagination (WHERE order_col > last_seen) instead; exposed
via ``after``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_etl_framework_spark.plans.filters import Filter, apply_filters


def drill_down(
    df: DataFrame,
    filters: Sequence[Filter | dict] | None = None,
    columns: Optional[Sequence[str]] = None,
    order_by: str | None = None,
    order_desc: bool = False,
    limit: int = 100,
    offset: int = 0,
    after: Any = None,
) -> dict[str, Any]:
    """Filtered raw-row page + total count (ref :482-505)."""
    out = apply_filters(df, filters)
    total = out.count()
    if columns:
        out = out.select(*columns)  # projection (ref :477-480)
    if order_by is not None:
        oc = F.col(order_by)
        if after is not None:
            # keyset pagination: skip the global-sort-with-offset path
            out = out.filter(oc < F.lit(after) if order_desc else oc > F.lit(after))
            offset = 0
        out = out.orderBy(oc.desc() if order_desc else oc.asc())
    else:
        if after is not None:
            raise ValueError("keyset pagination (after=) requires order_by")
        # no order column given: each page request is an independent
        # Spark job whose row order may differ (task scheduling, AQE,
        # shuffle fetch order), so offset pagination without SOME total
        # order can repeat/skip rows across pages. Order by every
        # ORDERABLE projected column — MapType has no ordering and
        # would make the whole request throw AnalysisException —
        # deterministic up to rows that tie on every sortable column,
        # which are interchangeable anyway. Still a bounded
        # TakeOrderedAndProject, not a full sort.
        from pyspark.sql import types as T

        # MapType has no ordering; neither do VARIANT (Spark 4) or
        # calendar intervals — any of them inside orderBy throws
        # DATATYPE_MISMATCH.INVALID_ORDERING_TYPE for the whole request
        unorderable = tuple(
            t for t in (
                getattr(T, "MapType", None),
                getattr(T, "VariantType", None),
                getattr(T, "CalendarIntervalType", None),
            )
            if t is not None
        )

        def _orderable(dt) -> bool:
            if isinstance(dt, unorderable):
                return False
            if isinstance(dt, T.ArrayType):
                return _orderable(dt.elementType)
            if isinstance(dt, T.StructType):
                return all(_orderable(f.dataType) for f in dt.fields)
            return True

        def _sort_expr(f):
            if _orderable(f.dataType):
                return F.col(f.name).asc_nulls_first()
            if isinstance(f.dataType, (T.MapType, T.ArrayType, T.StructType)):
                # a deterministic orderable surrogate — maps etc. still
                # contribute to the total order instead of silently
                # reinstating nondeterministic offset pagination
                return F.to_json(F.col(f.name)).asc_nulls_first()
            return F.col(f.name).cast("string").asc_nulls_first()

        out = out.orderBy(*[_sort_expr(f) for f in out.schema.fields])
    page = out.offset(offset).limit(limit) if offset else out.limit(limit)
    rows = [r.asDict(recursive=True) for r in page.collect()]
    return {
        "records": rows,
        "columns": page.columns,
        "row_count": len(rows),
        "total_count": total,
        "limit": limit,
        "offset": offset,
    }


def distinct_values(
    df: DataFrame,
    column: str,
    search: str | None = None,
    limit: int = 100,
) -> dict[str, Any]:
    """Distinct non-null values of one column, optional case-insensitive
    substring search, sorted asc, limited; plus total distinct count and
    truncation flag (ref duckdb_service.py:507-562)."""
    c = F.col(column)
    base = df.select(c.alias(column)).where(c.isNotNull())
    if search:
        esc = search.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        base = base.where(c.cast("string").ilike(f"%{esc}%"))
    distinct = base.distinct()
    total = distinct.count()
    vals = [r[0] for r in distinct.orderBy(c.asc()).limit(limit).collect()]
    return {
        "values": vals,
        "total_distinct": total,
        "truncated": total > limit,
    }
