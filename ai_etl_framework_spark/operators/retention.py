"""Cohort retention analysis — the (cohort period × offset) user-count
matrix behind every product/engagement dashboard (users are cohorted
by their FIRST activity period; each later period counts how many of
them came back). Beyond-reference analytics scope (grep
cohort/retention over /root/reference/src: zero hits); the natural
companion to the funnel operator (funnel.py: one conversion path;
this: longitudinal stickiness).

Pinned semantics (oracle-replicated):

- cohort(user) = ``date_trunc(period, min(ts))`` over the user's
  events — Monday-start weeks / calendar months in BOTH engines;
- activity = DISTINCT (user, period) pairs — multiple events in one
  period count once;
- ``offset`` = whole periods between cohort and activity period
  (days/7 for weeks, month arithmetic for months) — offset 0 is the
  cohort period itself, so ``n_users`` at offset 0 is the cohort
  size by construction;
- ``retention`` = n_users / cohort size, rounded 6dp;
- NULL user or NULL ts rows are dropped (no cohort to belong to).

Scale shape: raw events collapse to DISTINCT (user, period) pairs in
one hash aggregation (map-side partials eat the per-period event
volume), the cohort is a ``min() OVER (PARTITION BY user)`` window on
that already-small frame — no separate first-activity aggregate and
no self-join — and the (cohort, offset) matrix is a dimension-sized
second aggregation; the offset-0 size joins back via AQE broadcast
(the matrix is |cohorts × offsets| rows). Events shuffle once."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["cohort_retention"]

_PERIOD_DAYS = {"week": 7, "day": 1}


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """(cohort, offset, n_users, retention) — see module pins.
    ``period`` ∈ {day, week, month}."""
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day, week or month, got {period!r}")
    base = df.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.date_trunc(period, F.col(ts_col)).cast("date").alias("p"),
    )
    activity = base.distinct()
    joined = activity.withColumn(
        "cohort", F.min("p").over(Window.partitionBy("u"))
    )
    if period == "month":
        offset = (
            (F.year("p") - F.year("cohort")) * 12
            + (F.month("p") - F.month("cohort"))
        ).cast("long")
    else:
        offset = (
            F.datediff(F.col("p"), F.col("cohort"))
            / _PERIOD_DAYS[period]
        ).cast("long")
    cells = (
        joined.select("u", "cohort", offset.alias("offset"))
        .groupBy("cohort", "offset")
        .agg(F.countDistinct("u").cast("long").alias("n_users"))
    )
    sizes = cells.where(F.col("offset") == 0).select(
        F.col("cohort").alias("__c"), F.col("n_users").alias("__size")
    )
    return (
        cells.join(sizes, cells.cohort == F.col("__c"))
        .select(
            "cohort",
            "offset",
            "n_users",
            F.round(F.col("n_users") / F.col("__size"), 6).alias("retention"),
        )
    )
