"""Winsorization — percentile clipping of numeric columns (Dixon &
Tukey 1968; the standard robust-preprocessing step before scaling or
model fitting). No reference-repo counterpart (grep winsor/clip over
/root/reference/src: zero hits) — beyond-reference cleaning scope,
complementing the anomaly detector (which FLAGS outliers; this
bounds their influence while keeping every row).

Scale shape: one scalar aggregation computes every column's two cut
points in a single pass (exact ``percentile`` at test scale,
``percentile_approx`` (KLL) under ``approx=True`` at 100× — the
IQR/x11/x20 dual), then the clip is a pure projection inside
whole-stage codegen. NULLs pass through untouched (nothing to clip);
a column whose cuts are NULL (all-NULL input) is left unchanged."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["winsorize"]


def winsorize(
    df: DataFrame,
    cols: Sequence[str],
    lower: float = 0.01,
    upper: float = 0.99,
    approx: bool = False,
    suffix: str = "",
) -> DataFrame:
    """Clip each of ``cols`` to its [lower, upper] quantiles. With
    ``suffix`` the clipped values land in new columns (``col+suffix``)
    instead of replacing. ``0 <= lower < upper <= 1``.

    Types: suffix mode emits DOUBLE (a derived column; quantile cut
    points are interpolated doubles). Replace mode (``suffix=""``)
    casts the clipped value back to the column's ORIGINAL type so
    winsorize never mutates the frame's schema (r8 advice) — for
    integral columns the fractional cut point truncates toward zero
    on the boundary rows it clips."""
    if not cols:
        raise ValueError("winsorize needs at least one column")
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(
            f"need 0 <= lower < upper <= 1, got ({lower}, {upper})"
        )

    def cut(c: str, q: float, name: str):
        if approx:
            return F.percentile_approx(c, q, 10000).alias(name)
        return F.percentile(c, F.lit(q)).alias(name)

    stats = df.agg(
        *[cut(c, lower, f"__lo_{c}") for c in cols],
        *[cut(c, upper, f"__hi_{c}") for c in cols],
    ).collect()[0]
    out = df
    for c in cols:
        lo, hi = stats[f"__lo_{c}"], stats[f"__hi_{c}"]
        if lo is None or hi is None:  # all-NULL column: nothing to clip
            clipped = F.col(c)
        else:
            clipped = F.least(
                F.lit(hi), F.greatest(F.lit(lo), F.col(c).cast("double"))
            )
            # least/greatest skip NULL operands — restore NULL inputs
            clipped = F.when(F.col(c).isNull(), F.lit(None)).otherwise(clipped)
            if not suffix:  # replace mode must not change the schema
                clipped = clipped.cast(df.schema[c].dataType)
        out = out.withColumn(c + suffix, clipped)
    return out
