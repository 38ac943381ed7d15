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

__all__ = ["group_trend", "theil_sen_trend", "grouped_ols2"]


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


def grouped_ols2(
    df: DataFrame,
    group_col: str,
    y_col: str,
    x1_col: str,
    x2_col: str,
) -> DataFrame:
    """Per-group TWO-feature OLS via sufficient statistics — the
    distributed-ML workhorse pattern: one aggregation computes every
    group's power sums, and the 2×2 normal equations solve in
    closed-form column arithmetic (no iteration, no driver math, no
    UDF). Extends group_trend (ANSI regr_*, one regressor) to the
    smallest genuinely multivariate case the engines' own aggregates
    cannot express. Beyond-reference analytics scope.

    Pinned semantics (oracle-replicated):

    - rows with any NULL among group/y/x1/x2 drop;
    - CENTERED normal equations (better conditioned than raw 3×3
      Cramer): with central moments m11 = Σx1²/n − x̄1² etc.,
      det = m11·m22 − m12²; b1 = (m1y·m22 − m2y·m12)/det,
      b2 = (m2y·m11 − m1y·m12)/det, b0 = ȳ − b1·x̄1 − b2·x̄2 —
      every expression in the same written operation order in both
      engines;
    - groups with < 3 rows or |det| rounded 9dp = 0 (collinear or
      constant regressors) yield NULL coefficients — never a
      division error;
    - r2 = 1 − SS_res/SS_tot with SS_res = SS_tot − b1·n·m1y −
      b2·n·m2y (the normal-equation identity — no second pass),
      NULL when SS_tot rounded 9dp = 0;
    - output per group: (group, n, b0, b1, b2, r2), floats 6dp.

    Scale shape: ONE hash aggregation with 10 power-sum expressions
    (map-side partials collapse the row scale), then closed-form
    per-row arithmetic on the group frame. No window, no join, no
    second scan — the x100-PCA philosophy at OLS size."""
    base = df.where(
        F.col(group_col).isNotNull()
        & F.col(y_col).isNotNull()
        & F.col(x1_col).isNotNull()
        & F.col(x2_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(y_col).cast("double").alias("y"),
        F.col(x1_col).cast("double").alias("x1"),
        F.col(x2_col).cast("double").alias("x2"),
    )
    y, x1, x2 = F.col("y"), F.col("x1"), F.col("x2")
    agg = base.groupBy(F.col("g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("sx1x1"),
        F.sum(x1 * x2).alias("sx1x2"),
        F.sum(x2 * x2).alias("sx2x2"),
        F.sum(x1 * y).alias("sx1y"),
        F.sum(x2 * y).alias("sx2y"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    mx1 = F.col("sx1") / n
    mx2 = F.col("sx2") / n
    my = F.col("sy") / n
    m11 = F.col("sx1x1") / n - mx1 * mx1
    m12 = F.col("sx1x2") / n - mx1 * mx2
    m22 = F.col("sx2x2") / n - mx2 * mx2
    m1y = F.col("sx1y") / n - mx1 * my
    m2y = F.col("sx2y") / n - mx2 * my
    myy = F.col("syy") / n - my * my
    det = m11 * m22 - m12 * m12
    ok = (n >= 3) & (F.round(det, 9) != 0)
    b1 = (m1y * m22 - m2y * m12) / det
    b2 = (m2y * m11 - m1y * m12) / det
    b0 = my - b1 * mx1 - b2 * mx2
    ss_tot = myy
    ss_res = myy - b1 * m1y - b2 * m2y
    r2 = F.when(
        ok & (F.round(ss_tot, 9) > 0), F.lit(1.0) - ss_res / ss_tot
    )
    return agg.select(
        group_col,
        n.cast("long").alias("n"),
        F.round(F.when(ok, b0), 6).alias("b0"),
        F.round(F.when(ok, b1), 6).alias("b1"),
        F.round(F.when(ok, b2), 6).alias("b2"),
        F.round(r2, 6).alias("r2"),
    )
