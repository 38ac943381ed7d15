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

__all__ = ["cohort_retention", "cohort_ltv", "revenue_bridge"]

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


def cohort_ltv(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    amount_col: str = "amount",
    period: str = "month",
) -> DataFrame:
    """Cohort lifetime-value curves — cohort_retention's revenue twin:
    users cohort by FIRST activity period, and each (cohort, offset)
    cell carries that period's revenue, the running cumulative
    revenue, and the cumulative LTV per cohort member. The
    "how much is a January customer worth by month 6" table behind
    payback-period review. Beyond-reference analytics scope (same
    grep as cohort_retention: zero hits).

    Pinned semantics (oracle-replicated):
    - cohort/offset conventions are cohort_retention's exactly
      (date_trunc periods, month arithmetic for months);
    - rows with NULL user, ts or amount are dropped;
    - revenue/cum_revenue rounded 2dp (raw-magnitude SUMS — the house
      float rule), ltv_per_user = cum_revenue / cohort_size rounded
      6dp; cohort_size = distinct users at offset 0 (every cohort
      member is active in its cohort period by construction);
    - only OBSERVED (cohort, offset) cells appear (no densified
      zero rows); the cumulative sum over observed offsets still
      includes every preceding cell.

    Scale shape: raw events collapse to per-(user, period) revenue in
    one hash aggregation, cohort = min() window over that frame (the
    cohort_retention shape, no self-join), the (cohort, offset)
    matrix is a dimension-sized second aggregation, and the
    cumulative window + size join run over the MATRIX frame only
    (|cohorts × offsets| rows). Events shuffle once."""
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day, week or month, got {period!r}")
    base = df.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(amount_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.date_trunc(period, F.col(ts_col)).cast("date").alias("p"),
        F.col(amount_col).alias("a"),
    )
    per_up = base.groupBy("u", "p").agg(F.sum("a").alias("rev"))
    joined = per_up.withColumn(
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
        joined.select("u", "cohort", offset.alias("offset"), "rev")
        .groupBy("cohort", "offset")
        .agg(
            F.countDistinct("u").cast("long").alias("n_active"),
            F.sum("rev").alias("__rev"),
        )
    )
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy(F.col("offset").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.withColumn("__cum", F.sum("__rev").over(w_cum))
    sizes = cells.where(F.col("offset") == 0).select(
        F.col("cohort").alias("__c"), F.col("n_active").alias("__size")
    )
    return (
        cum.join(F.broadcast(sizes), cum.cohort == F.col("__c"))
        .select(
            "cohort",
            "offset",
            F.col("__size").alias("cohort_size"),
            "n_active",
            F.round("__rev", 2).alias("revenue"),
            F.round("__cum", 2).alias("cum_revenue"),
            F.round(F.col("__cum") / F.col("__size"), 6).alias(
                "ltv_per_user"
            ),
        )
    )


def revenue_bridge(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    amount_col: str = "amount",
) -> DataFrame:
    """Month-over-month revenue bridge — each month's net revenue
    change decomposed into NEW (first month or resurrected after a
    gap), EXPANSION (consecutive-month growth), CONTRACTION
    (consecutive-month decline) and CHURN (active last month, silent
    this month): the SaaS revenue waterfall. Beyond-reference
    analytics scope (grep 'bridge\\|waterfall\\|churn' over
    /root/reference/src: zero hits).

    Pinned semantics (oracle-replicated):
    - rows with NULL user/ts/amount drop; cells = SUM(amount) per
      (user, calendar month);
    - per user, a month's revenue compares against the IMMEDIATELY
      PRECEDING calendar month only (a gap ⇒ the old revenue churned
      at gap start and the new month counts as new/resurrected —
      the standard bridge convention);
    - churn is attributed to the month AFTER the last active month,
      as a NEGATIVE amount; no churn row is emitted past the corpus'
      last observed month (the future is unknown, not churned);
    - output: one row per month that has any component: (month,
      new_rev, expansion_rev, contraction_rev, churn_rev,
      net_change), all 2dp (raw-magnitude sums); contraction/churn
      are ≤ 0;
    - INVARIANT (pinned in tests): new + expansion + contraction +
      churn at month m equals Σrev(m) − Σrev(m−1) for every interior
      month.

    Scale shape: ONE hash aggregation to the (user, month) frame,
    one per-user lag/lead window over THAT frame, a 2-region union
    (component rows + churn rows, both cell-sized) and a month-level
    aggregation. Events shuffle once on the user key."""
    base = df.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(amount_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.date_trunc("month", F.col(ts_col)).cast("date").alias("m"),
        F.col(amount_col).alias("a"),
    )
    cells = base.groupBy("u", "m").agg(F.sum("a").alias("r"))
    max_month = cells.agg(F.max("m")).collect()[0][0]  # 1-row scalar
    if max_month is None:
        raise ValueError("revenue_bridge: no rows survive the NULL filter")
    wu = Window.partitionBy("u").orderBy(F.col("m").asc())
    prev_m = F.lag("m").over(wu)
    prev_r = F.lag("r").over(wu)
    next_m = F.lead("m").over(wu)
    consec_prev = prev_m.isNotNull() & (
        F.months_between(F.col("m"), prev_m) == 1
    )
    staged = cells.select(
        "u",
        "m",
        "r",
        prev_r.alias("__pr"),
        consec_prev.alias("__cp"),
        next_m.alias("__nm"),
    )
    comp = staged.select(
        F.col("m").alias("month"),
        F.when(~F.col("__cp"), F.col("r")).otherwise(0.0).alias("__new"),
        F.when(
            F.col("__cp") & (F.col("r") > F.col("__pr")),
            F.col("r") - F.col("__pr"),
        )
        .otherwise(0.0)
        .alias("__exp"),
        F.when(
            F.col("__cp") & (F.col("r") < F.col("__pr")),
            F.col("r") - F.col("__pr"),
        )
        .otherwise(0.0)
        .alias("__con"),
        F.lit(0.0).alias("__chn"),
    )
    churn = (
        staged.where(
            (
                F.col("__nm").isNull()
                | (F.months_between(F.col("__nm"), F.col("m")) > 1)
            )
            & (F.add_months(F.col("m"), 1) <= F.lit(max_month))
        )
        .select(
            F.add_months(F.col("m"), 1).alias("month"),
            F.lit(0.0).alias("__new"),
            F.lit(0.0).alias("__exp"),
            F.lit(0.0).alias("__con"),
            (-F.col("r")).alias("__chn"),
        )
    )
    return (
        comp.unionByName(churn)
        .groupBy("month")
        .agg(
            F.round(F.sum("__new"), 2).alias("new_rev"),
            F.round(F.sum("__exp"), 2).alias("expansion_rev"),
            F.round(F.sum("__con"), 2).alias("contraction_rev"),
            F.round(F.sum("__chn"), 2).alias("churn_rev"),
            F.round(
                F.sum(
                    F.col("__new") + F.col("__exp") + F.col("__con")
                    + F.col("__chn")
                ),
                2,
            ).alias("net_change"),
        )
    )
