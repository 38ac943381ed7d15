"""Calendar dimension generation — the date spine every warehouse
joins facts against (gap-free, pre-computed day attributes; the thing
resample/gap analyses assume exists). Generated IN the engine
(sequence + explode — no driver loop, no pandas date_range), so a
century spine is one codegen projection. Beyond-reference scope (the
reference has no dimension generators).

Pinned semantics (oracle-replicated):

- one row per calendar day from ``start`` to ``end`` INCLUSIVE
  (validation: start ≤ end);
- year/quarter/month/day = the engine-shared extracts; week =
  ISO-8601 week number (Spark ``weekofyear`` ≡ DuckDB ``weekofyear``);
  dow = Spark's ``dayofweek`` convention (1=Sunday..7=Saturday;
  DuckDB's 0-based dayofweek maps as +1 — the x52 mapping);
- is_weekend = dow IN (1, 7) (Sunday or Saturday);
- is_month_start / is_month_end by calendar month boundaries
  (last_day comparison).

Scale shape: ``sequence(start, end)`` builds the day array ON THE
EXECUTOR and explode streams it through one whole-stage-codegen
projection — a 100-year spine is 36 525 rows from a 1-row input;
nothing shuffles (the explode is a single-partition generate, which
is the right plan for a dimension this small — repartition after if
a downstream join wants distribution)."""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["date_dim", "recognize_monthly"]


def date_dim(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Calendar dimension from ``start`` to ``end`` (ISO date strings,
    inclusive) — module pins."""
    try:
        s = _dt.date.fromisoformat(start)
        e = _dt.date.fromisoformat(end)
    except ValueError as ex:
        raise ValueError(f"start/end must be ISO dates: {ex}") from None
    if s > e:
        raise ValueError(f"start {start} is after end {end}")
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("date")
    )
    d = F.col("date")
    dow = F.dayofweek(d)
    return days.select(
        d,
        F.year(d).cast("int").alias("year"),
        F.quarter(d).cast("int").alias("quarter"),
        F.month(d).cast("int").alias("month"),
        F.dayofmonth(d).cast("int").alias("day"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        dow.cast("int").alias("dow"),
        dow.isin(1, 7).alias("is_weekend"),
        (F.dayofmonth(d) == 1).alias("is_month_start"),
        (d == F.last_day(d)).alias("is_month_end"),
    )


def recognize_monthly(
    df: DataFrame,
    date_col: str,
    amount_col: str,
    term_col: str,
    id_col: str | None = None,
) -> DataFrame:
    """Straight-line monthly revenue recognition — each row's amount
    spreads EQUALLY over ``term_col`` consecutive calendar months
    starting at ``date_col``'s month: the SaaS/contract rev-rec (ASC
    606 straight-line) and amortization-schedule primitive. The
    calendar complement of the MoM revenue bridge (x103): the bridge
    explains booked revenue movement, this converts bookings INTO the
    recognized monthly schedule. Beyond-reference analytics scope.

    Pinned semantics (oracle-replicated):

    - rows with NULL date, NULL/non-positive term, or NULL amount
      drop (a contract without a start, a length, or a value cannot
      recognize anything — fail-quiet is pinned and documented
      because partial CDC batches routinely carry such rows);
    - recognition months = the ``term`` month STARTS from
      month(date) inclusive: month k gets amount/term for k in
      [0, term) — equal split, no day-of-month proration (pinned:
      the straight-line monthly convention; daily proration is a
      different estimator);
    - output: (month DATE, n_contracts, recognized) — month pinned
      to DATE on both engines (the r11 date_trunc trap),
      n_contracts = contracts recognizing in that month, recognized
      = Σ amount/term rounded 2dp (raw-magnitude sum — 2dp house
      rule).

    Scale shape: months = ``sequence(trunc(date), add_months(...),
    1 month)`` built per row ON the executor, explode streams it
    through codegen (fan-out = term, bounded by the data's max term),
    then ONE month-sized hash aggregation. No window, no join, no
    driver loop; at 100 TB this is scan + explode + map-side partial
    agg."""
    d = F.to_date(F.col(date_col))
    term = F.col(term_col).cast("int")
    amt = F.col(amount_col).cast("double")
    base = df.where(d.isNotNull() & term.isNotNull() & (term > 0) & amt.isNotNull())
    start = F.trunc(d, "MM")
    months = F.sequence(
        start, F.add_months(start, term - 1), F.expr("INTERVAL 1 MONTH")
    )
    per = (amt / term).alias("__credit")
    exploded = base.select(
        F.explode(months).alias("month"),
        per,
    )
    return (
        exploded.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_contracts"),
            F.round(F.sum("__credit"), 2).alias("recognized"),
        )
        .orderBy("month")
    )
