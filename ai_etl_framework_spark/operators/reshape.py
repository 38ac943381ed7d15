"""Wide↔long reshaping — ``melt`` (unpivot), the inverse of the
reference's heatmap pivot (echarts_generator.py builds pivots;
nothing un-pivots). A long frame is what every tidy-data aggregation,
per-metric quality dashboard, and multi-metric anomaly scan wants —
one (id, metric, value) row per measure instead of N parallel
columns.

Thin by design: Spark 4's ``DataFrame.unpivot`` IS the operator
(Expand under the hood — each input row fans out to |value_cols|
output rows in the same task, no shuffle at all); this wrapper only
pins the cross-engine semantics the raw call leaves open:

- every value column is cast to DOUBLE first (unpivot requires one
  common type; the implicit least-common-type rules differ between
  engines, an explicit cast does not);
- NULL values are KEPT (pandas ``melt`` semantics; DuckDB's UNPIVOT
  drops NULL cells by default — the oracle twin re-adds them) so
  ``n_rows × n_value_cols`` is an invariant the caller can count on;
- output column order is (ids…, variable, value); variable values
  are the literal source column names."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["melt"]


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Unpivot ``value_cols`` into (``var_name``, ``value_name``)
    rows keyed by ``id_cols``. Exactly ``len(value_cols)`` output
    rows per input row (NULLs kept)."""
    if not value_cols:
        raise ValueError("melt needs at least one value column")
    overlap = set(id_cols) & set(value_cols)
    if overlap:
        raise ValueError(f"columns cannot be both id and value: {overlap}")
    casted = df.select(
        *[F.col(c) for c in id_cols],
        *[F.col(c).cast("double").alias(c) for c in value_cols],
    )
    return casted.unpivot(
        ids=list(id_cols),
        values=list(value_cols),
        variableColumnName=var_name,
        valueColumnName=value_name,
    )
