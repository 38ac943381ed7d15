"""Irregular time-series summarization — OHLC candle bars and
time-weighted averages, the two resampling shapes finance/sensor
pipelines run that plain bucket-avg (operators/resample.py) gets
wrong: a mean over irregular ticks overweights bursts (TWAP weights
by holding time instead), and open/close need positional, not
extremal, semantics. Beyond-reference scope (the reference has no
time-series operators; grep 'ohlc\\|time.weighted' over
/root/reference/src: zero hits).

Pinned semantics (oracle-replicated):

``ohlc_bars`` (one row per (key, bucket) with ≥1 valid tick):
- bucket = ``date_trunc(bucket_unit, ts)``;
- open/close = value at the smallest/largest position key within the
  bucket, encoded as ONE BIGINT
  ``floor(epoch_seconds(ts)) * 10^6 + tiebreak % 10^6`` — WHOLE-second
  resolution deliberately (a double-µs epoch times 10^6 rounds
  differently across engines): same-second ordering falls to the
  tiebreak column, which must be unique modulo 10^6 within any
  same-second burst (event ids are). min_by / arg_min on one long is
  total-ordered, HashAggregate-friendly and engine-identical;
- high/low = max/min value; volume = sum; n = tick count;
- rows with NULL key/ts/value are dropped (a NULL value has no
  price; a NULL ts no bucket) — documented divergence from pandas'
  NaN-skipping resample, which keeps the row for count.

``time_weighted_avg`` (one row per key):
- ticks ordered by (ts, tiebreak); each tick's value holds until the
  NEXT tick: twap = Σ value_i · Δt_i / Σ Δt_i with
  Δt_i = epoch(ts_{i+1}) − epoch(ts_i); the LAST tick has no holding
  interval and contributes no weight (standard left-closed TWAP);
- keys with <2 valid ticks yield NULL twap (no interval evidence);
  simple_avg rides alongside for comparison; both rounded 6dp;
- NULL ts/value rows are dropped before pairing.

``ewma`` (one row per (key?, bucket)):
- series = avg(value) per (key?, date_trunc(bucket_unit, ts)) over
  non-NULL rows (the rolling_corr spine);
- ewma_t = Σ_{j=0..n_terms−1} w_j · x_{t−j} / Σ_present w_j with
  w_j = (1−alpha)^j over the trailing n_terms OBSERVED buckets
  (rows frame, current inclusive) — the TRUNCATED exponential
  moving average: at alpha ≥ 0.3, n_terms = 20 leaves < 0.08% of
  the mass outside the window, and truncation is what makes the
  recursion window-expressible (the exact recursive EWMA is a
  sequential scan no engine parallelizes; the power-ratio rewrite
  overflows r^{−rownum} at series length). Weights are Python
  float literals — bit-identical in both engines; missing
  leading-edge lags (series start) drop out of numerator AND
  denominator (partial-window renormalization, pandas
  ewm(adjust=True) semantics);
- rounded 6dp; bucket-mean riders x_mean for context.

``level_shifts`` (one row per (key?, bucket) with FULL windows both
sides):
- series = avg(value) per (key?, date_trunc(bucket_unit, ts)) over
  non-NULL rows (the shared spine);
- before = mean of the ``k`` buckets strictly preceding, after =
  mean of the current bucket and the ``k−1`` following (ROWS
  frames); rows lacking ``k`` observed buckets on EITHER side emit
  nothing (a shift needs full evidence on both sides);
- scale = per-key SAMPLE stddev of the whole bucket-mean series;
  score = (after − before)/scale, NULL when the series is constant
  (zero variance); ``is_shift`` = |round(score, 6)| > threshold —
  the boundary compares the ROUNDED score (the pareto_share lesson:
  raw float epsilon at the threshold flips flags across engines);
- before/after/shift/score rounded 6dp. This is the two-sided
  sliding-window mean-shift screen (CUSUM's windowed cousin; the
  exact CUSUM recursion IS window-expressible via the
  cum − running-min identity — see :func:`cusum_screen`).

``acf`` (long format, one row per (key?, lag)):
- series = avg(value) per (key?, date_trunc(bucket_unit, ts)) — the
  shared spine; lags are positional over the OBSERVED bucket order
  (missing buckets are skipped, not NULL-padded — densify with
  resample first when calendar-lag semantics matter; pinned);
- acf_l = both engines' own sample Pearson ``corr(x_t, x_{t−l})``
  over pairs where the lag exists (ANSI corr NULL-pair skipping),
  the STATISTICAL autocorrelation estimate (per-lag re-centered),
  not the signal-processing r_l = c_l/c_0 form; n_pairs rides along;
  NULL under 2 pairs or zero variance (ANSI);
- rounded 6dp (a ratio — scale-free error).

Scale shape: ohlc_bars is ONE hash aggregation on (key, bucket) —
min_by/max_by over a plain BIGINT key keep the HashAggregate fast
path (fixed-width buffers, map-side partials; the r8 lesson: struct
keys or var-width picked values fall back to SortAggregate). TWAP is
ONE key-partitioned window (lead) + one hash aggregation on the key —
the detect_gaps/rolling_features shape; no self-join, no collect.
ewma/level_shifts run their windows over the AGGREGATED bucket frame
(key-partitioned when keyed; dimension-sized single task otherwise —
the rolling_corr documented bound).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "ohlc_bars",
    "time_weighted_avg",
    "burst_detection",
    "burst_flags",
    "seasonal_naive_eval",
    "rolling_corr",
    "ewma",
    "level_shifts",
    "acf",
    "period_growth",
    "interarrival_stats",
    "cusum_screen",
    "cusum_from_series",
    "seasonal_strength",
    "seasonal_envelope",
]

_TIEBREAK_MOD = 1_000_000


def _pos_key(ts_col: str, tiebreak_col: str) -> Column:
    """Total-ordered BIGINT position key: epoch seconds scaled, plus a
    bounded tiebreak component (ties on ts resolve by tiebreak %
    10^6 — unique ids below 10^6 per same-second burst, the realistic
    envelope; the encoding is pinned so the DuckDB twin replicates it
    verbatim)."""
    from ai_etl_framework_spark.session import epoch_seconds

    return (
        epoch_seconds(ts_col).cast("long") * _TIEBREAK_MOD
        + F.pmod(F.col(tiebreak_col).cast("long"), F.lit(_TIEBREAK_MOD))
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    bucket_unit: str = "hour",
) -> DataFrame:
    """(key, bucket, open, high, low, close, volume, n) — module pins."""
    if bucket_unit not in ("minute", "hour", "day", "week", "month"):
        raise ValueError(f"unsupported bucket_unit {bucket_unit!r}")
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    )
    k = _pos_key(ts_col, tiebreak_col)
    return (
        base.groupBy(
            F.col(key_col),
            F.date_trunc(bucket_unit, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.round(F.min_by(F.col(value_col), k), 6).alias("open"),
            F.round(F.max(value_col), 6).alias("high"),
            F.round(F.min(value_col), 6).alias("low"),
            F.round(F.max_by(F.col(value_col), k), 6).alias("close"),
            F.round(F.sum(value_col), 6).alias("volume"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(key, twap, simple_avg, n) per key — module pins."""
    from ai_etl_framework_spark.session import epoch_seconds

    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    dt = epoch_seconds(F.lead(ts_col).over(w)) - epoch_seconds(ts_col)
    paired = base.select(
        F.col(key_col),
        F.col(value_col),
        dt.alias("__dt"),
    )
    return paired.groupBy(key_col).agg(
        F.round(
            F.try_divide(
                F.sum(F.col(value_col) * F.col("__dt")), F.sum("__dt")
            ),
            6,
        ).alias("twap"),
        F.round(F.avg(value_col), 6).alias("simple_avg"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def burst_detection(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_unit: str = "hour",
    trailing: int = 24,
    factor: float = 3.0,
    min_baseline_buckets: int = 3,
) -> DataFrame:
    """Volume-burst detection: per (key, bucket) event counts compared
    to the trailing per-key baseline — the rate alert every ingest/ops
    dashboard runs (crawler loops, bot floods, feed replays all show
    up as a bucket count far above the key's recent norm).

    Pinned semantics (oracle-replicated):
    - counts per (key, date_trunc(bucket_unit, ts)); NULL key/ts rows
      dropped;
    - baseline = avg count over the PRECEDING ``trailing`` OBSERVED
      buckets of the same key (ROWS BETWEEN trailing PRECEDING AND 1
      PRECEDING, bucket ascending) — observed, not calendar: silent
      periods produce no buckets and therefore do not dilute the
      baseline (detect_gaps is the silence detector; this is the
      volume one);
    - buckets with fewer than ``min_baseline_buckets`` preceding
      observed buckets yield NULL ratio/is_burst (no baseline
      evidence);
    - ratio = n / baseline rounded 6dp; is_burst = ratio(rounded) ≥
      factor.

    Scale shape: ONE hash aggregation collapses raw rows to the
    (key, bucket) frame, then ONE key-partitioned window over THAT
    dimension-sized frame (≤ spans/bucket_unit rows per key — never
    raw rows). The pareto-style two-stage shape."""
    if bucket_unit not in ("minute", "hour", "day", "week", "month"):
        raise ValueError(f"unsupported bucket_unit {bucket_unit!r}")
    if trailing < 1:
        raise ValueError(f"trailing must be >= 1, got {trailing}")
    counts = (
        df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(
            F.col(key_col),
            F.date_trunc(bucket_unit, F.col(ts_col)).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return burst_flags(
        counts, key_col, trailing=trailing, factor=factor,
        min_baseline_buckets=min_baseline_buckets,
    )


def burst_flags(
    counts: DataFrame,
    key_col: str = "event_type",
    bucket_col: str = "bucket",
    n_col: str = "n",
    trailing: int = 24,
    factor: float = 3.0,
    min_baseline_buckets: int = 3,
) -> DataFrame:
    """The window half of :func:`burst_detection`, over an ALREADY
    AGGREGATED (key, bucket, n) frame — shared with the streaming
    incremental monitor (pipeline/monitor.py), whose persisted
    bucket-count store is exactly such a frame. Semantics identical
    to burst_detection's pins (trailing OBSERVED buckets, NULL below
    ``min_baseline_buckets``, ratio on the rounded value)."""
    if trailing < 1:
        raise ValueError(f"trailing must be >= 1, got {trailing}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(-trailing, -1)
    )
    baseline = F.avg(n_col).over(w)
    n_prev = F.count(n_col).over(w)
    ratio = F.when(
        n_prev >= min_baseline_buckets, F.round(F.col(n_col) / baseline, 6)
    )
    return counts.select(
        key_col,
        bucket_col,
        n_col,
        F.when(n_prev >= min_baseline_buckets, F.round(baseline, 6)).alias(
            "baseline"
        ),
        ratio.alias("ratio"),
        F.when(ratio.isNotNull(), ratio >= factor).alias("is_burst"),
    )


def seasonal_naive_eval(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_unit: str = "hour",
    season: str = "7 days",
) -> DataFrame:
    """Seasonal-naive forecast backtest — predict each bucket's mean
    value with the SAME bucket one season earlier (same hour last
    week) and score the corpus: the baseline every real forecasting
    effort must beat, and the cheapest drift alarm for strongly
    periodic metrics. Output per key: (key, n_buckets, n_scored, mae,
    mape, bias).

    Pinned semantics (oracle-replicated):
    - actuals = avg(value) per (key, date_trunc(bucket_unit, ts)),
      NULL key/ts/value rows dropped;
    - prediction for bucket t = the actual at calendar bucket
      t − season (an equi-join on the shifted bucket — CALENDAR
      alignment: a missing last-week bucket means no prediction, it
      does NOT fall back to the most recent observation);
    - n_scored = buckets with a prediction; mae = mean |err|, bias =
      mean err (err = actual − predicted), mape = mean(|err| /
      |actual|) over scored buckets with actual ≠ 0 — all 6dp; keys
      with zero scored buckets yield NULL mae/mape/bias.

    Scale shape: ONE hash aggregation to the (key, bucket) frame, one
    co-partitioned self-equi-join ON (key, shifted bucket) — both
    sides dimension-sized — and one per-key reduce. No windows over
    raw rows, no calendar spine materialization."""
    if bucket_unit not in ("minute", "hour", "day", "week", "month"):
        raise ValueError(f"unsupported bucket_unit {bucket_unit!r}")
    actuals = (
        df.where(
            F.col(key_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .groupBy(
            F.col(key_col),
            F.date_trunc(bucket_unit, F.col(ts_col)).alias("bucket"),
        )
        .agg(F.avg(value_col).alias("__actual"))
    )
    prev = actuals.select(
        F.col(key_col),
        (F.col("bucket") + F.expr(f"INTERVAL {season}")).alias("bucket"),
        F.col("__actual").alias("__pred"),
    )
    scored = actuals.join(prev, [key_col, "bucket"], "left")
    err = F.col("__actual") - F.col("__pred")
    return scored.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.count("__pred").cast("long").alias("n_scored"),
        F.round(F.avg(F.abs(err)), 6).alias("mae"),
        F.round(
            F.avg(
                F.when(
                    F.col("__actual") != 0,
                    F.abs(err) / F.abs(F.col("__actual")),
                )
            ),
            6,
        ).alias("mape"),
        F.round(F.avg(err), 6).alias("bias"),
    )


def rolling_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ts_col: str = "ts",
    key_col: "str | None" = None,
    bucket_unit: str = "hour",
    window: int = 24,
    min_periods: int = 5,
) -> DataFrame:
    """Rolling correlation between two metrics — is their coupling
    drifting (pairs trading, metric-dependency monitoring, feature
    stability): per bucket, the sample Pearson corr of the two
    bucket-MEAN series over the trailing ``window`` OBSERVED buckets
    (current inclusive).

    Pinned semantics (oracle-replicated):
    - series = avg(x), avg(y) per (key?, date_trunc(bucket_unit, ts))
      over rows where BOTH metrics and the ts are non-NULL (a row
      missing one metric has no pair evidence);
    - corr = both engines' sample Pearson over the ROWS frame
      [window−1 PRECEDING, CURRENT], NULL below ``min_periods``
      observed buckets in the frame or under zero variance (ANSI corr
      semantics), rounded 6dp (a ratio — scale-free error).

    Scale shape: ONE hash aggregation to the bucket frame + ONE
    window over THAT (key-partitioned when ``key_col`` is given;
    global-single-task otherwise — fine for ONE dimension-sized
    series, the pareto-style documented bound)."""
    if bucket_unit not in ("minute", "hour", "day", "week", "month"):
        raise ValueError(f"unsupported bucket_unit {bucket_unit!r}")
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    base = df.where(
        F.col(ts_col).isNotNull()
        & F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
    )
    keys = [key_col] if key_col else []
    if key_col:
        base = base.where(F.col(key_col).isNotNull())
    series = base.groupBy(
        *keys, F.date_trunc(bucket_unit, F.col(ts_col)).alias("bucket")
    ).agg(
        F.avg(x_col).alias("__x"),
        F.avg(y_col).alias("__y"),
    )
    w = (
        (Window.partitionBy(key_col) if key_col else Window.partitionBy())
        .orderBy(F.col("bucket").asc())
        .rowsBetween(-(window - 1), 0)
    )
    n_obs = F.count(F.lit(1)).over(w)
    c = F.when(n_obs >= min_periods, F.round(F.corr("__x", "__y").over(w), 6))
    return series.select(
        *keys,
        "bucket",
        F.round("__x", 6).alias("x_mean"),
        F.round("__y", 6).alias("y_mean"),
        c.alias("rolling_corr"),
    )


def ewma(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    key_col: "str | None" = None,
    bucket_unit: str = "day",
    alpha: float = 0.3,
    n_terms: int = 20,
) -> DataFrame:
    """(key?, bucket, x_mean, ewma) — truncated exponential moving
    average over the trailing ``n_terms`` observed buckets. See
    module pins (adjust=True renormalization, literal weights)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if n_terms < 1:
        raise ValueError(f"n_terms must be >= 1, got {n_terms}")
    base = df.where(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    keys = [key_col] if key_col else []
    if key_col:
        base = base.where(F.col(key_col).isNotNull())
    series = base.groupBy(
        *keys, F.date_trunc(bucket_unit, F.col(ts_col)).alias("bucket")
    ).agg(F.avg(value_col).alias("__x"))
    w = (
        Window.partitionBy(key_col) if key_col else Window.partitionBy()
    ).orderBy(F.col("bucket").asc())
    r = 1.0 - alpha
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(n_terms):
        lx = F.col("__x") if j == 0 else F.lag("__x", j).over(w)
        wj = F.lit(r ** j)
        num = num + F.coalesce(lx * wj, F.lit(0.0))
        den = den + F.when(lx.isNotNull(), wj).otherwise(F.lit(0.0))
    return series.select(
        *keys,
        "bucket",
        F.round("__x", 6).alias("x_mean"),
        F.round(num / den, 6).alias("ewma"),
    )


def level_shifts(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    key_col: "str | None" = None,
    bucket_unit: str = "day",
    k: int = 7,
    threshold: float = 1.0,
) -> DataFrame:
    """(key?, bucket, before_mean, after_mean, shift, score,
    is_shift) — two-sided windowed mean-shift screen over the bucket
    spine. See module pins (full windows only, rounded-score
    boundary)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    base = df.where(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    keys = [key_col] if key_col else []
    if key_col:
        base = base.where(F.col(key_col).isNotNull())
    series = base.groupBy(
        *keys, F.date_trunc(bucket_unit, F.col(ts_col)).alias("bucket")
    ).agg(F.avg(value_col).alias("__x"))
    part = (
        Window.partitionBy(key_col) if key_col else Window.partitionBy()
    )
    ordered = part.orderBy(F.col("bucket").asc())
    w_before = ordered.rowsBetween(-k, -1)
    w_after = ordered.rowsBetween(0, k - 1)
    w_all = ordered.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    before = F.avg("__x").over(w_before)
    after = F.avg("__x").over(w_after)
    n_b = F.count("__x").over(w_before)
    n_a = F.count("__x").over(w_after)
    sd = F.stddev_samp("__x").over(w_all)
    score = F.round(
        F.when(sd > 0, (after - before) / sd), 6
    )
    return (
        series.select(
            *keys,
            "bucket",
            F.round(before, 6).alias("before_mean"),
            F.round(after, 6).alias("after_mean"),
            F.round(after - before, 6).alias("shift"),
            score.alias("score"),
            (F.abs(score) > F.lit(threshold)).alias("is_shift"),
            n_b.alias("__nb"),
            n_a.alias("__na"),
        )
        .where((F.col("__nb") == k) & (F.col("__na") == k))
        .drop("__nb", "__na")
    )


def acf(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    key_col: "str | None" = None,
    bucket_unit: str = "day",
    max_lag: int = 7,
) -> DataFrame:
    """(key?, lag, acf, n_pairs) for lag = 1..max_lag — sample
    autocorrelation of the bucket-mean series. See module pins
    (observed-bucket lags, per-lag corr)."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    base = df.where(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    keys = [key_col] if key_col else []
    if key_col:
        base = base.where(F.col(key_col).isNotNull())
    series = base.groupBy(
        *keys, F.date_trunc(bucket_unit, F.col(ts_col)).alias("bucket")
    ).agg(F.avg(value_col).alias("__x"))
    w = (
        Window.partitionBy(key_col) if key_col else Window.partitionBy()
    ).orderBy(F.col("bucket").asc())
    lagged = series.select(
        *keys,
        "__x",
        *[F.lag("__x", l).over(w).alias(f"__l{l}") for l in range(1, max_lag + 1)],
    )
    aggs = []
    for l in range(1, max_lag + 1):
        aggs.append(F.corr("__x", f"__l{l}").alias(f"__a{l}"))
        aggs.append(F.count(f"__l{l}").cast("long").alias(f"__n{l}"))
    wide = lagged.groupBy(*keys).agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(l).cast("int").alias("lag"),
                F.round(F.col(f"__a{l}"), 6).alias("acf"),
                F.col(f"__n{l}").alias("n_pairs"),
            )
            for l in range(1, max_lag + 1)
        ]
    )
    return wide.select(*keys, F.explode(rows).alias("__r")).select(
        *keys,
        F.col("__r.lag").alias("lag"),
        F.col("__r.acf").alias("acf"),
        F.col("__r.n_pairs").alias("n_pairs"),
    )


def period_growth(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_col: str | None = None,
    bucket_unit: str = "month",
) -> DataFrame:
    """Period-over-period growth — the "+12% MoM" table behind every
    revenue dashboard: totals per calendar bucket (optionally per
    key), each with its previous-bucket total and percent growth.
    Beyond-reference reporting scope (grep 'growth\\|period_over'
    over /root/reference/src: zero hits).

    Pinned semantics (oracle-replicated):
    - bucket = ``date_trunc(bucket_unit, ts)``; NULL ts/value (and
      NULL key when keyed) rows are dropped;
    - total = SUM(value) per (key?, bucket), rounded 2dp (raw-
      magnitude sums — the house float rule); prev_total = the
      PREVIOUS OBSERVED bucket's total (no densified zero buckets —
      a silent month is a gap, not a 0; densify with resample first
      if calendar adjacency matters);
    - growth_pct = 100·(total − prev)/prev rounded 6dp, NULL for the
      first bucket and whenever prev = 0 (sign-free division).

    Scale shape: ONE hash aggregation to the (key, bucket) frame +
    one lag window over THAT frame (the EWMA/level-shift shape —
    dimension-sized, never raw rows). Ungrouped series = one
    dimension-sized window task, documented."""
    base = df.where(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
    keys: list[str] = []
    if key_col is not None:
        base = base.where(F.col(key_col).isNotNull())
        keys = [key_col]
    series = base.groupBy(
        *keys, F.date_trunc(bucket_unit, F.col(ts_col)).alias("bucket")
    ).agg(F.sum(value_col).alias("__t"))
    w = (
        Window.partitionBy(*keys) if keys else Window.partitionBy()
    ).orderBy(F.col("bucket").asc())
    prev = F.lag("__t", 1).over(w)
    return series.select(
        *keys,
        "bucket",
        F.round("__t", 2).alias("total"),
        F.round(prev, 2).alias("prev_total"),
        F.round(
            F.when(
                prev.isNotNull() & (prev != 0),
                F.lit(100.0) * (F.col("__t") - prev) / prev,
            ),
            6,
        ).alias("growth_pct"),
    )


def interarrival_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Per-key inter-arrival-time profile — mean/sd/min/max gap,
    coefficient of variation, and the Goh–Barabási burstiness
    B = (σ − μ)/(σ + μ) (−1 = perfectly periodic, 0 = Poisson,
    →1 = bursty): the "is this feed a heartbeat or a stampede"
    screen that complements gap detection (audit.py finds the
    silences; this characterizes the rhythm). Beyond-reference scope
    (grep 'interarrival\\|burstiness' over /root/reference/src: zero
    hits). Burstiness: Goh & Barabási 2008 (EPL 81, 48002).

    Pinned semantics (oracle-replicated):
    - NULL key/ts rows are dropped; gaps are SECONDS between
      time-consecutive events per key (double);
    - tied timestamps contribute zero-gaps; the gap MULTISET is
      invariant under any tie ordering (consecutive equal values),
      so no tiebreak column is needed for determinism;
    - keys with <2 events emit no row (no gaps to describe);
    - sd is the SAMPLE stddev; cv = sd/mean and burstiness are NULL
      when their denominator is 0 (all gaps zero ⇒ burstiness
      undefined, not −1); mean/sd/cv/burstiness rounded 6dp,
      min/max gaps raw (they are differences, not aggregates);
    - n_gaps = events − 1 per key.

    Scale shape: one lag window per key over raw events (the gap-
    detection shape — each key's order resolves within its own
    partition), then ONE hash aggregation. Few-giant-key feeds hit
    the usual single-task-per-key window bound — pre-bucket by day
    and union, or sample, when one key is the whole corpus."""
    from ai_etl_framework_spark.session import epoch_seconds

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    secs = epoch_seconds(ts_col).cast("double")
    gaps = (
        df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("__gap", secs - F.lag(secs, 1).over(w))
        .where(F.col("__gap").isNotNull())
    )
    agg = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.avg("__gap").alias("__m"),
        F.stddev_samp("__gap").alias("__s"),
        F.min("__gap").alias("min_gap_s"),
        F.max("__gap").alias("max_gap_s"),
    )
    m, s = F.col("__m"), F.col("__s")
    return agg.select(
        key_col,
        "n_gaps",
        F.round(m, 6).alias("mean_gap_s"),
        F.round(s, 6).alias("sd_gap_s"),
        F.round(F.when((m != 0) & s.isNotNull(), s / m), 6).alias("cv"),
        F.round(
            F.when(s.isNotNull() & ((s + m) != 0), (s - m) / (s + m)), 6
        ).alias("burstiness"),
        "min_gap_s",
        "max_gap_s",
    )


def cusum_screen(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    key_col: "str | None" = None,
    bucket_unit: str = "day",
    slack: float = 0.5,
    threshold: float = 4.0,
) -> DataFrame:
    """CUSUM changepoint screen (Page 1954) — the sequential-detection
    classic: standardized bucket means accumulate one-sided drift
    sums S⁺/S⁻ that a persistent small shift pushes over ``threshold``
    long before any single-window test fires. Complements
    level_shifts (abrupt windowed step) with the SLOW-drift detector.
    Beyond-reference scope (grep 'cusum' over /root/reference/src:
    zero hits).

    Spark-first rewrite of the recursion: S⁺_t = max(0, S⁺_{t−1} +
    z_t − slack) is NOT window-expressible as written, but the
    textbook identity S⁺_t = cum_t − min_{0≤j≤t} cum_j (cum = running
    Σ(z − slack), cum₀ = 0; symmetric for S⁻ with max and z + slack)
    turns it into ONE cumulative-sum window + ONE running-extreme
    window over the same ordering — both engines replay it verbatim.

    Pinned semantics (oracle-replicated):
    - series = avg(value) per (key?, date_trunc(bucket_unit, ts));
      NULL key/ts/value rows dropped;
    - z standardizes against the key's WHOLE-series mean and sample
      stddev (a retrospective screen, not an online monitor — the
      online form feeds a reference mean from history);
    - keys with zero/undefined series variance or a single bucket
      emit NO rows (z undefined);
    - s_plus/s_minus/z rounded 6dp; alarm_up = s_plus > threshold and
      alarm_down = s_minus > threshold compare the ROUNDED statistic
      (house rule);
    - slack = the per-step allowance k in σ units (0.5 ≈ tuned for
      1σ shifts); threshold = the decision interval h (4–5 classic).

    Scale shape: ONE hash aggregation to the (key, bucket) frame,
    then three windows over THAT frame sharing one (key × bucket)
    ordering (stats, cumsum, running extremes) — dimension-sized,
    never raw rows. Ungrouped series = one dimension-sized task
    (documented, the level_shifts bound)."""
    base = df.where(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    keys = [key_col] if key_col else []
    if key_col:
        base = base.where(F.col(key_col).isNotNull())
    series = base.groupBy(
        *keys, F.date_trunc(bucket_unit, F.col(ts_col)).alias("bucket")
    ).agg(F.avg(value_col).alias("__x"))
    return cusum_from_series(series, keys, slack=slack, threshold=threshold)


def cusum_from_series(
    series: DataFrame,
    keys,
    slack: float = 0.5,
    threshold: float = 4.0,
) -> DataFrame:
    """CUSUM windows over a prepared (keys…, bucket, __x) series frame
    — the shared core behind :func:`cusum_screen` and the streaming
    ``IncrementalCusumMonitor`` (the quantiles_from_bins seam
    pattern). See cusum_screen's pins."""
    part = Window.partitionBy(*keys) if keys else Window.partitionBy()
    ordered = part.orderBy(F.col("bucket").asc())
    w_all = ordered.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_run = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mu = F.avg("__x").over(w_all)
    sd = F.stddev_samp("__x").over(w_all)
    z = (F.col("__x") - mu) / sd
    staged = series.withColumn("__z", F.when(sd > 0, z)).where(
        F.col("__z").isNotNull()
    )
    cum_up = F.sum(F.col("__z") - F.lit(slack)).over(w_run)
    cum_dn = F.sum(F.col("__z") + F.lit(slack)).over(w_run)
    s_plus = cum_up - F.least(F.lit(0.0), F.min(cum_up).over(w_run))
    s_minus = F.greatest(F.lit(0.0), F.max(cum_dn).over(w_run)) - cum_dn
    out = staged.select(
        *keys,
        "bucket",
        F.round("__z", 6).alias("z"),
        F.round(s_plus, 6).alias("s_plus"),
        F.round(s_minus, 6).alias("s_minus"),
    )
    return out.select(
        *keys,
        "bucket",
        "z",
        "s_plus",
        "s_minus",
        (F.col("s_plus") > threshold).alias("alarm_up"),
        (F.col("s_minus") > threshold).alias("alarm_down"),
    )


def seasonal_strength(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Hour-of-day seasonality strength per key — the variance share
    a seasonal profile explains: strength = 1 − SS_within / SS_total,
    where SS_within sums squared deviations from each (key, hour)
    mean and SS_total from the key's overall mean. 0 = the hour tells
    you nothing, → 1 = the value is a pure function of the hour. The
    one-number "does this metric breathe daily" screen that says
    whether seasonal_zscore (x52) is even worth running; the
    variance-decomposition form of STL's seasonal-strength diagnostic
    (Hyndman & Athanasopoulos, FPP ch. 12). Beyond-reference
    analytics scope (grep 'seasonal strength' over
    /root/reference/src: zero hits).

    Pinned semantics (oracle-replicated):

    - season = hour(ts), 0–23 (hour, not day-of-week: both engines
      agree on hour numbering while their dayofweek bases differ);
      NULL key/ts/value rows drop;
    - SS identities via power sums, evaluated in the same written
      operation order in both engines: per (key, hour) cell —
      n_s, Σx, Σx²; SS_within = Σ_s (Σx²_s − (Σx_s)²/n_s);
      SS_total = Σx² − (Σx)²/n (grand);
    - strength = 1 − SS_within/SS_total, NULL when SS_total rounded
      9dp is 0 (constant key — no variance to decompose); never
      negative (within-cell means minimize SS);
    - output per key: (key, n, n_seasons, strength), strength 6dp.

    Scale shape: ONE (key, hour) hash aggregation (≤ 24 cells per
    key, map-side partials collapse the row scale) then one key-level
    reduce over ≤ 24 rows per key. No window, no join, no second
    scan."""
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("k"),
        F.hour(ts_col).alias("s"),
        F.col(value_col).cast("double").alias("x"),
    )
    cells = base.groupBy("k", "s").agg(
        F.count(F.lit(1)).cast("double").alias("n_s"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    n = F.sum("n_s")
    g1 = F.sum("s1")
    g2 = F.sum("s2")
    ss_within = F.sum(F.col("s2") - (F.col("s1") * F.col("s1")) / F.col("n_s"))
    ss_total = g2 - (g1 * g1) / n
    out = cells.groupBy(F.col("k").alias(key_col)).agg(
        n.cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_seasons"),
        F.round(
            F.when(
                F.round(ss_total, 9) > 0,
                F.lit(1.0) - ss_within / ss_total,
            ),
            6,
        ).alias("strength"),
    )
    return out


def seasonal_envelope(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    quantiles: "tuple[float, float, float]" = (0.1, 0.5, 0.9),
    min_rows: int = 20,
) -> DataFrame:
    """Hour-of-day percentile envelope per key — the quantile band
    (p_lo, p_med, p_hi) each (key, hour) cell's values historically
    occupy: the lookup table a monitoring pipeline joins against live
    traffic to flag "outside the seasonal band" anomalies — the
    quantile-robust sibling of seasonal_zscore (x52; mean/std bends
    under heavy tails, the band does not). seasonal_strength (x125)
    says WHETHER the hour matters; this materializes the band.
    Beyond-reference analytics scope.

    Pinned semantics (oracle-replicated):

    - season = hour(ts) 0–23 (the x125 pin: both engines agree on
      hour numbering, unlike their dayofweek bases); NULL
      key/ts/value rows drop;
    - quantiles = exact linear-interpolation percentiles (both
      engines' type-7 continuous quantile — the x118/q10 precedent),
      strictly increasing in (0, 1), fail-loud otherwise;
    - cells with fewer than ``min_rows`` values are EXCLUDED (a band
      estimated from a handful of points flags everything; the
      default 20 ≈ 2 per decile) — exclusion is the fail-soft: the
      joining monitor treats absent cells as "no band yet";
    - output per surviving (key, hour): (key, hour, n, p_lo, p_med,
      p_hi), floats 6dp.

    Scale shape: ONE (key, hour) hash aggregation computing the three
    percentiles (Spark's percentile with an array argument — one
    buffer per cell, ≤ 24 cells per key) + a row filter. No window,
    no join, no second scan."""
    lo, med, hi = quantiles
    if not (0.0 < lo < med < hi < 1.0):
        raise ValueError(
            f"quantiles must be strictly increasing in (0, 1), got "
            f"{quantiles}"
        )
    if min_rows < 1:
        raise ValueError(f"min_rows must be >= 1, got {min_rows}")
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("k"),
        F.hour(ts_col).alias("hour"),
        F.col(value_col).cast("double").alias("x"),
    )
    q = base.groupBy(F.col("k").alias(key_col), "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.percentile(
            F.col("x"),
            F.array(F.lit(float(lo)), F.lit(float(med)), F.lit(float(hi))),
        ).alias("__q"),
    )
    return q.where(F.col("n") >= min_rows).select(
        key_col,
        "hour",
        "n",
        F.round(F.col("__q")[0], 6).alias("p_lo"),
        F.round(F.col("__q")[1], 6).alias("p_med"),
        F.round(F.col("__q")[2], 6).alias("p_hi"),
    )
