"""Per-group linear trend — OLS slope/intercept/r² of a value over
time for every key in one aggregation pass (the metric-drift /
user-trajectory feature every monitoring and churn pipeline computes;
"is this user's activity trending down" at 100 TB). Beyond-reference
scope (grep regr/slope/trend over /root/reference/src: zero hits).

Pinned semantics (oracle-replicated — both engines ship the ANSI
``regr_*`` aggregate family, so the math is the engines' own):

- x = epoch seconds of ``ts_col`` (µs-preserving DOUBLE), minus the
  epoch of ``origin`` when given — pass an origin near the data's
  start: raw 1.7e9-second epochs put ~10 significant digits into the
  regr product sums and the two engines' summation orders then
  disagree in the rounded low digits, while anchored x (0..span
  seconds) is well-conditioned and slope is shift-invariant anyway
  (intercept becomes "value at origin", a better-pinned quantity
  than "value at 1970"); y = ``value_col``; rows where either is
  NULL are skipped (ANSI regr semantics);
- ``slope`` = regr_slope (Δvalue per second), ``intercept`` =
  regr_intercept, ``r2`` = regr_r2, ``n`` = regr_count;
- groups with < 2 usable points or zero x-variance (all events at
  one instant) yield NULL slope/intercept/r2 (ANSI: var_pop(x)=0 →
  NULL) — never a division error;
- everything rounded to ``round_to`` (slope/intercept 10 dp — per-
  second slopes are tiny; r2 6 dp).

Scale shape: ONE hash aggregation on the group key computes all four
statistics map-side-partially (regr_* lower to sum/count/products);
no window, no join, no second pass. The one non-obvious pin: epoch
conversion must go through a TIMESTAMP cast (not NTZ-direct) so both
engines see identical x values — the shared session.epoch_seconds
contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["group_trend"]


def group_trend(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    origin: str | None = None,
    round_to: int = 10,
) -> DataFrame:
    """(key, n, slope, intercept, r2) per group — see module pins.
    Rows with NULL key are dropped (no group). ``origin``: an ISO
    timestamp string subtracted from x for numerical conditioning."""
    from ai_etl_framework_spark.session import epoch_seconds

    x = epoch_seconds(ts_col)
    if origin is not None:
        x = x - epoch_seconds(F.lit(origin).cast("timestamp"))
    y = F.col(value_col)
    return (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.regr_count(y, x).cast("long").alias("n"),
            F.round(F.regr_slope(y, x), round_to).alias("slope"),
            F.round(F.regr_intercept(y, x), round_to).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
        )
    )
