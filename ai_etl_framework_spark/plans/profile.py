"""Schema profiling for dashboard filter construction.

Reference: src/database/duckdb_service.py:115-253.

- dtype bucketing into numeric | categorical | datetime | boolean
  (ref :145-233), here from ``df.schema`` instead of DuckDB types.
- per numeric column: MIN / MAX / AVG (double) / COUNT DISTINCT
  (ref :159-171).
- per datetime column: MIN / MAX serialized as strings (ref :181-189).
- per categorical: COUNT DISTINCT; distinct values listed if ≤100,
  else 20 samples + high_cardinality flag (ref :202-227).
- suggested dimensions (categorical, distinct ≤50, non-ID) and
  metrics (numeric, non-ID), top 5 each (ref :238-239); ID heuristic
  ref :242-253.

Scale note: ALL per-column stats are computed in ONE aggregate pass
over the table (a single job, map-side partial aggregation), not one
query per column like the reference. Exact countDistinct per column
is the oracle-parity mode; ``approx=True`` swaps in HLL sketches so
the single pass stays cheap at 100 TB.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ID_NAME_PARTS = ("_id", "id_", "key", "uuid", "guid")
ID_EXACT = {"id", "pk", "index"}


def bucket_dtype(dt: T.DataType) -> str:
    """numeric | categorical | datetime | boolean (ref :145-233)."""
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                       T.FloatType, T.DoubleType, T.DecimalType)):
        return "numeric"
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "datetime"
    return "categorical"


def _is_id_like(name: str, distinct: int, rows: int) -> bool:
    low = name.lower()
    if low in ID_EXACT:
        return True
    if any(p in low for p in ID_NAME_PARTS):
        return True
    return distinct == rows and rows > 100  # ref :242-253


def profile_schema(
    df: DataFrame,
    approx: bool = False,
    max_listed: int = 100,
    sample_values: int = 20,
) -> dict[str, Any]:
    buckets = {f.name: bucket_dtype(f.dataType) for f in df.schema.fields}
    cd = (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.countDistinct(c))

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for name, b in buckets.items():
        c = F.col(name)
        if b == "numeric":
            aggs += [
                F.min(c).alias(f"{name}__min"),
                F.max(c).alias(f"{name}__max"),
                F.avg(c.cast("double")).alias(f"{name}__avg"),
                cd(c).alias(f"{name}__distinct"),
            ]
        elif b == "datetime":
            aggs += [F.min(c).alias(f"{name}__min"), F.max(c).alias(f"{name}__max")]
        elif b == "boolean":
            aggs += [cd(c).alias(f"{name}__distinct")]
        else:  # categorical
            aggs += [cd(c).alias(f"{name}__distinct")]
    # pass 1: scalar aggregates only — every buffer is fixed-size.
    # (A collect_set here would look "capped" because of a later
    # slice, but the slice runs AFTER the aggregation buffered every
    # distinct string of every categorical column — a free-text or
    # URL column OOMs the single final-agg task at scale.)
    stats = df.agg(*aggs).collect()[0].asDict()
    rows = stats["__rows"]

    # pass 2 (bounded): enumerate values only for the columns pass 1
    # PROVED small — collect_set buffers are now ≤ max_listed strings
    # per column, and the scan is pruned to just those columns. For
    # high-cardinality columns take the k lexically-smallest distinct
    # values (identical to the old sort_array(collect_set)[:k] result)
    # via partial-distinct + top-k — never materializing the full set.
    cat_cols = [n for n, b in buckets.items() if b == "categorical"]
    small = [n for n in cat_cols if stats[f"{n}__distinct"] <= max_listed]
    vals_by_col: dict[str, list] = {}
    if small:
        vstats = df.agg(*[
            F.array_sort(F.collect_set(F.col(n).cast("string"))).alias(n)
            for n in small
        ]).collect()[0].asDict()
        vals_by_col.update(vstats)
    for name in cat_cols:
        if name in vals_by_col:
            continue
        vals_by_col[name] = [
            r["v"]
            for r in df.select(F.col(name).cast("string").alias("v"))
            .where(F.col("v").isNotNull())
            .distinct()
            .orderBy("v")
            .limit(sample_values)
            .collect()
        ]

    columns: dict[str, Any] = {}
    for name, b in buckets.items():
        info: dict[str, Any] = {"type": b}
        if b == "numeric":
            info.update(
                min=stats[f"{name}__min"],
                max=stats[f"{name}__max"],
                avg=stats[f"{name}__avg"],
                distinct_count=stats[f"{name}__distinct"],
            )
        elif b == "datetime":
            info.update(
                min=str(stats[f"{name}__min"]) if stats[f"{name}__min"] is not None else None,
                max=str(stats[f"{name}__max"]) if stats[f"{name}__max"] is not None else None,
            )
        elif b == "boolean":
            info.update(distinct_count=stats[f"{name}__distinct"])
        else:
            n = stats[f"{name}__distinct"]
            vals = vals_by_col.get(name) or []
            info["distinct_count"] = n
            if n <= max_listed:
                info["values"] = vals[:max_listed]
            else:  # high-cardinality: sample only (ref :202-227)
                info["sample_values"] = vals[:sample_values]
                info["high_cardinality"] = True
        columns[name] = info

    dims = [
        n
        for n, b in buckets.items()
        if b == "categorical"
        and columns[n]["distinct_count"] <= 50
        and not _is_id_like(n, columns[n]["distinct_count"], rows)
    ][:5]
    mets = [
        n
        for n, b in buckets.items()
        if b == "numeric" and not _is_id_like(n, columns[n]["distinct_count"], rows)
    ][:5]
    return {
        "row_count": rows,
        "columns": columns,
        "suggested_dimensions": dims,
        "suggested_metrics": mets,
    }
