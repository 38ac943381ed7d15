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

__all__ = ["group_trend", "theil_sen_trend"]


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


def theil_sen_trend(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_unit: str = "day",
    max_points: int = 2000,
) -> DataFrame:
    """Theil–Sen robust trend per group — the median of all pairwise
    slopes over the group's bucket-mean series (Theil 1950 / Sen
    1968): a 29%-breakdown-point slope one wild day cannot bend,
    where group_trend's OLS line chases every outlier. The robust
    second opinion next to x39.

    Pinned semantics (oracle-replicated):
    - series = avg(value) per (key, date_trunc(bucket_unit, ts)) —
      the timeseries spine; NULL key/ts/value rows drop;
    - x = whole buckets since the GROUP's first bucket (exact
      integers — day counts, not epoch floats), so slope units are
      value-per-bucket;
    - slope = the exact INTERPOLATED median (both engines' own
      percentile/quantile_cont) over all C(n,2) pairwise slopes
      (x_j > x_i — buckets are distinct by construction, no zero
      denominators); intercept = median(y − slope·x) (Conover's
      variant); both 6dp;
    - groups with <2 buckets emit nothing; groups with more than
      ``max_points`` buckets fail loud — C(n,2) pairs is the cost,
      name the alternative: coarsen bucket_unit or pre-filter the
      window.

    Scale shape: raw rows collapse to the (key, bucket) frame in ONE
    hash aggregation; the pair self-join is co-partitioned ON THE
    KEY, fanning out C(points,2) per group — bounded by
    ``max_points``² (2000 → ≤2M pairs/group), never corpus size; the
    median is one percentile agg per group over the pair frame."""
    if max_points < 2:
        raise ValueError(f"max_points must be >= 2, got {max_points}")
    if bucket_unit not in ("minute", "hour", "day", "week", "month"):
        raise ValueError(f"unsupported bucket_unit {bucket_unit!r}")
    series = (
        df.where(
            F.col(key_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .groupBy(
            F.col(key_col).alias("k"),
            F.date_trunc(bucket_unit, F.col(ts_col)).alias("b"),
        )
        .agg(F.avg(value_col).alias("y"))
    )
    sized = (
        series.groupBy("k")
        .agg(F.count(F.lit(1)).alias("__np"), F.min("b").alias("__b0"))
        .withColumnRenamed("k", "__ks")
    )
    over = sized.where(F.col("__np") > max_points).limit(1).collect()
    if over:
        raise ValueError(
            f"theil_sen_trend: group {over[0]['__ks']!r} has "
            f"{over[0]['__np']} buckets (> max_points={max_points}); "
            "C(n,2) pairwise slopes is the cost. Coarsen bucket_unit "
            "or pre-filter the time window, or raise max_points "
            "explicitly."
        )
    from ai_etl_framework_spark.session import epoch_seconds

    unit_seconds = {
        "minute": 60.0,
        "hour": 3600.0,
        "day": 86400.0,
        "week": 604800.0,
    }
    if bucket_unit == "month":
        x_expr = F.months_between(F.col("b"), F.col("__b0"))
    elif bucket_unit in unit_seconds:
        x_expr = (
            epoch_seconds(F.col("b")) - epoch_seconds(F.col("__b0"))
        ) / F.lit(unit_seconds[bucket_unit])
    else:
        raise ValueError(f"unsupported bucket_unit {bucket_unit!r}")
    anchored = series.join(
        F.broadcast(sized), F.col("k") == F.col("__ks")
    ).select(
        "k",
        x_expr.cast("double").alias("x"),
        "y",
        "__np",
    )
    a = anchored.select(
        "k", F.col("x").alias("xi"), F.col("y").alias("yi"), "__np"
    )
    # re-alias the join key on the right side: both sides share the
    # `anchored` lineage and Spark flags the bare self-join ambiguous
    bb = anchored.select(
        F.col("k").alias("__k2"),
        F.col("x").alias("xj"),
        F.col("y").alias("yj"),
    )
    pairs = a.join(bb, F.col("k") == F.col("__k2")).where(
        F.col("xj") > F.col("xi")
    )
    slopes = pairs.select(
        "k",
        "__np",
        (
            (F.col("yj") - F.col("yi")) / (F.col("xj") - F.col("xi"))
        ).alias("s"),
    )
    med = slopes.groupBy("k").agg(
        F.max("__np").cast("long").alias("n_points"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("percentile(s, 0.5)").alias("__slope"),
    )
    resid = anchored.join(
        F.broadcast(med.select("k", "__slope")), "k"
    ).groupBy("k").agg(
        F.expr("percentile(y - __slope * x, 0.5)").alias("__icept")
    )
    return (
        med.join(F.broadcast(resid), "k")
        .select(
            F.col("k").alias(key_col),
            "n_points",
            "n_pairs",
            F.round("__slope", 6).alias("slope"),
            F.round("__icept", 6).alias("intercept"),
        )
    )
