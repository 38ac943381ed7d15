"""Chart-prep aggregates for auto-visualization.

Reference: src/api/visualization_generator.py:361-458 — pandas
transforms that shape query results for each chart type. Re-expressed
as single-pass DataFrame aggregations (the reference buffered the
table in driver memory; these run distributed and return only the
chart-sized result):

- bar:       groupby-sum, sort desc, head(15)      (ref :380-382)
- line:      to_datetime, groupby-sum, sort asc    (ref :386-390)
- pie:       value_counts().head(10)               (ref :393-395)
- histogram: 30 equal-width bins                   (ref :433)
- scatter:   sample(min(1000, n))                  (ref :436)
- box:       quartiles per category                (ref :441)
- heatmap:   pivot_table sum                       (ref :444)
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BAR_TOP_N = 15
PIE_TOP_N = 10
HIST_BINS = 30
SCATTER_MAX = 1000


def bar_prep(df: DataFrame, category: str, value: str, top_n: int = BAR_TOP_N) -> DataFrame:
    return (
        df.groupBy(category)
        .agg(F.sum(value).alias(value))
        .orderBy(F.col(value).desc(), F.col(category).asc())
        .limit(top_n)
    )


def line_prep(df: DataFrame, date_col: str, value: str) -> DataFrame:
    """to_date coerces invalid → NULL (≡ errors='coerce'), dropped."""
    return (
        df.withColumn("__d", F.to_date(F.col(date_col)))
        .na.drop(subset=["__d"])
        .groupBy(F.col("__d").alias(date_col))
        .agg(F.sum(value).alias(value))
        .orderBy(F.col(date_col).asc())
    )


def pie_prep(df: DataFrame, category: str, top_n: int = PIE_TOP_N) -> DataFrame:
    return (
        df.groupBy(category)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col(category).asc())
        .limit(top_n)
    )


def histogram_prep(df: DataFrame, value: str, bins: int = HIST_BINS) -> DataFrame:
    """Equal-width bins over [min, max] — one pass for bounds (tiny),
    one for counts. Bin id is explicit floor arithmetic (not
    width_bucket) so any engine computing the same IEEE expression
    produces identical bins; the max value folds into the last bin
    like numpy.histogram.

    NaN rows are excluded up front: Spark treats NaN as the LARGEST
    double, so one NaN would make ``hi`` NaN, every bin expression
    NaN, and ``least(NaN, bins)`` = bins — silently collapsing the
    whole histogram into the last bar. (numpy.histogram errors on NaN
    input; dropping matches how the reference's pandas value_counts
    path skips them.)"""
    v = F.col(value)
    clean = df.where(v.isNotNull() & ~F.isnan(v.cast("double")))
    lo, hi = clean.agg(F.min(value), F.max(value)).first()
    if lo is None or lo == hi:
        return clean.agg(F.lit(1).alias("bin"), F.count(value).alias("count"))
    lo, hi = float(lo), float(hi)
    b = F.floor((v - F.lit(lo)) / (F.lit(hi) - F.lit(lo)) * bins) + 1
    bin_col = F.least(b, F.lit(bins)).cast("int")
    return (
        clean.groupBy(bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("bin")
    )


def scatter_prep(
    df: DataFrame, x: str, y: str, max_points: int = SCATTER_MAX, seed: int = 42
) -> DataFrame:
    """Bounded sample for plotting (ref sampled min(1000, n))."""
    n = df.count()
    if n <= max_points:
        return df.select(x, y)
    return df.select(x, y).sample(fraction=min(1.0, 1.1 * max_points / n), seed=seed).limit(
        max_points
    )


def box_prep(df: DataFrame, category: str, value: str) -> DataFrame:
    """Five-number summary per category; exact linear-interpolation
    percentiles (≡ pandas/np quantile ≡ DuckDB quantile_cont)."""
    v = F.col(value)
    return df.groupBy(category).agg(
        F.min(v).alias("min"),
        F.percentile(v, 0.25).alias("q1"),
        F.percentile(v, 0.5).alias("median"),
        F.percentile(v, 0.75).alias("q3"),
        F.max(v).alias("max"),
    )


def heatmap_prep(
    df: DataFrame,
    x: str,
    y: str,
    z: str,
    x_values: Optional[Sequence[str]] = None,
) -> DataFrame:
    """pivot_table(values=z, index=y, columns=x, aggfunc=sum). Passing
    ``x_values`` keeps the plan a single aggregation (no distinct-scan
    job to discover pivot columns)."""
    pivoted = df.groupBy(y).pivot(x, list(x_values) if x_values else None)
    return pivoted.sum(z)


def heatmap_bins(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_bins: int = 20,
    y_bins: int = 20,
) -> DataFrame:
    """2-D equal-width density grid — the numeric heatmap behind every
    scatter-at-scale view (a raw scatter of 10⁹ points is unplottable
    AND undeliverable; the grid is x_bins·y_bins rows whatever the
    input size). The 2-D sibling of :func:`histogram_prep`, same
    engine-portability contract: bin ids are explicit floor arithmetic
    on the same IEEE doubles (never width_bucket), the max value folds
    into the last bin, rows where EITHER axis is NULL/NaN are dropped
    up front (one NaN would poison the bounds — see histogram_prep).

    Output: (x_bin, y_bin, count) for non-empty cells, bins 1-based;
    a degenerate axis (min == max) collapses to one bin on that axis.

    Scale shape: one bounds aggregation (4 scalars) + ONE hash
    aggregation on (x_bin, y_bin) — two scans, map-side partials,
    output bounded by the grid."""
    if x_bins < 1 or y_bins < 1:
        raise ValueError(f"bins must be >= 1, got {x_bins}x{y_bins}")
    x, y = F.col(x_col), F.col(y_col)
    clean = df.where(
        x.isNotNull() & ~F.isnan(x.cast("double"))
        & y.isNotNull() & ~F.isnan(y.cast("double"))
    )
    b = clean.agg(
        F.min(x_col).alias("xlo"), F.max(x_col).alias("xhi"),
        F.min(y_col).alias("ylo"), F.max(y_col).alias("yhi"),
    ).first()
    if b["xlo"] is None:
        return clean.groupBy(
            F.lit(1).alias("x_bin"), F.lit(1).alias("y_bin")
        ).agg(F.count(F.lit(1)).alias("count"))

    def bin_expr(col, lo, hi, bins):
        lo, hi = float(lo), float(hi)
        if lo == hi:
            return F.lit(1)
        raw = F.floor((col - F.lit(lo)) / (F.lit(hi) - F.lit(lo)) * bins) + 1
        return F.least(raw, F.lit(bins)).cast("int")

    return (
        clean.groupBy(
            bin_expr(x, b["xlo"], b["xhi"], x_bins).alias("x_bin"),
            bin_expr(y, b["ylo"], b["yhi"], y_bins).alias("y_bin"),
        )
        .agg(F.count(F.lit(1)).alias("count"))
    )
