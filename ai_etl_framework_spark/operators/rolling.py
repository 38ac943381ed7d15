"""Rolling window features — per-key moving aggregates over the last
``k`` rows (moving average/min/max/sum), the standard time-series
feature-engineering step before anomaly scoring or model input.
Beyond-reference scope (the reference has no window functions at all —
its aggregator is group-level only, data_aggregator.py).

Pinned semantics (oracle-replicated — SQL window frames are identical
across engines):

- frame = ``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW`` per key,
  ordered by (ts, tiebreak) — the explicit integer tie-break makes
  simultaneous events deterministic;
- partial leading windows (fewer than k rows yet) aggregate what
  exists (SQL frame semantics — no NULL padding);
- NULL values inside a frame are skipped by the aggregate, matching
  both engines; ``n_in_window`` counts non-NULL values;
- NULL key/ts rows are dropped (no series to window over).

Scale shape: ONE window partitioning on the key serves every
requested aggregate (Spark fuses same-spec window functions into one
Window physical node — one shuffle, one sort, all features). Rolling
features over a 100 TB event table is exactly the workload where a
per-feature shuffle would dominate; asserting the single-Exchange
plan is tests/test_rolling.py's job."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["rolling_features"]

_AGGS = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}


def rolling_features(
    df: DataFrame,
    value_col: str = "value",
    k: int = 5,
    aggs: Sequence[str] = ("avg", "min", "max"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """Input columns plus ``<value>_roll_<agg>`` per requested agg and
    ``n_in_window`` (non-NULL values in the frame). See module pins."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    bad = [a for a in aggs if a not in _AGGS]
    if bad:
        raise ValueError(f"unknown aggs {bad}; pick from {sorted(_AGGS)}")
    base = df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(-(k - 1), Window.currentRow)
    )
    out = base
    for a in aggs:
        expr = _AGGS[a](F.col(value_col)).over(w)
        if a in ("avg", "sum"):
            expr = F.round(expr, round_to)
        out = out.withColumn(f"{value_col}_roll_{a}", expr)
    return out.withColumn(
        "n_in_window", F.count(F.col(value_col)).over(w).cast("long")
    )
