"""Kaplan–Meier survival estimation — the non-parametric survival
curve every churn / retention / reliability readout publishes: given
one row per subject with a follow-up duration and an observed/censored
flag, estimate S(t) = P(survival past t) with right-censoring handled
correctly (censored subjects count toward the at-risk denominator
until their exit, never as events). Kaplan & Meier 1958; the churn
complement of the cohort-retention matrix (x33). Beyond-reference
scope (grep 'survival\\|kaplan\\|censor' over /root/reference/src:
zero hits).

Pinned semantics (oracle-replicated):

- input: ONE row per subject — ``duration_col`` (numeric time on
  study), ``observed_col`` (1 = event occurred at duration, 0 =
  censored at duration). Rows with NULL duration/observed or
  duration < 0 are dropped (no evidence).
- per distinct duration t (within ``group_cols`` when given):
  d(t) = subjects with an observed event at t, c(t) = censored at t,
  n_risk(t) = subjects with duration >= t (the standard convention:
  subjects censored AT t are still at risk AT t).
- S(t) = Π_{t_i <= t, d(t_i)>0} (1 − d(t_i)/n_risk(t_i)) — censor-only
  times contribute factor 1 and are omitted from the output (the
  curve only steps at event times, the textbook estimator).
- when d(t) = n_risk(t) (everyone remaining dies at t) the factor is
  exactly 0 and S = 0.0 from there on — pinned via an explicit
  cumulative zero flag, NEVER ln(0) (Spark ln(0) is NULL, DuckDB -inf;
  the flag keeps both engines on the same arithmetic).
- output: (group..., t, n_risk, n_events, n_censored, survival) with
  survival rounded 6dp, one row per event time, ordered semantics
  left to the caller.

Scale shape: ONE hash aggregation collapses subjects to the distinct
(group, duration) frame — survival-curve-sized (|groups| × |distinct
durations|), NOT subject-sized — and all windows (suffix-sum at-risk,
prefix-sum log-survival) run over that collapsed frame. The per-group
cumulative windows are single-partition per group over curve-length
rows (hundreds), the same dashboard-frame shape as pareto_share's
documented regime; subject-scale work is exactly one shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["kaplan_meier"]


def kaplan_meier(
    df: DataFrame,
    duration_col: str = "duration",
    observed_col: str = "observed",
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """(group..., t, n_risk, n_events, n_censored, survival) — module
    pins. ``observed_col`` is coerced via ``observed <> 0``."""
    groups = list(group_cols or [])
    dur = F.col(duration_col).cast("double")
    obs = F.when(F.col(observed_col).cast("double") != 0, 1).otherwise(0)

    base = df.where(
        F.col(duration_col).isNotNull()
        & F.col(observed_col).isNotNull()
        & (dur >= 0)
    ).select(*groups, dur.alias("t"), obs.alias("__obs"))

    agg = base.groupBy(*groups, "t").agg(
        F.sum("__obs").cast("long").alias("n_events"),
        (F.count(F.lit(1)) - F.sum("__obs")).cast("long").alias("n_censored"),
    )

    w_order = Window.partitionBy(*groups).orderBy("t")
    w_risk = w_order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    exits = F.col("n_events") + F.col("n_censored")
    risked = agg.withColumn(
        "n_risk", F.sum(exits).over(w_risk).cast("long")
    )

    d = F.col("n_events").cast("double")
    n = F.col("n_risk").cast("double")
    ln_term = F.when(
        (F.col("n_events") > 0) & (d < n), F.log(F.lit(1.0) - d / n)
    ).otherwise(F.lit(0.0))
    zero_here = F.when(
        (F.col("n_events") > 0) & (d >= n), F.lit(1)
    ).otherwise(F.lit(0))

    curved = (
        risked.withColumn("__cum_ln", F.sum(ln_term).over(w_cum))
        .withColumn("__cum_zero", F.max(zero_here).over(w_cum))
        .where(F.col("n_events") > 0)
    )
    survival = F.when(F.col("__cum_zero") == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.col("__cum_ln")), round_to)
    )
    return curved.select(
        *groups,
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        survival.alias("survival"),
    )
