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

__all__ = ["winsorize", "winsorize_by_group"]


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


def winsorize_by_group(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str],
    lower: float = 0.01,
    upper: float = 0.99,
    approx: bool = False,
    suffix: str = "",
) -> DataFrame:
    """Per-GROUP percentile clipping — the per-domain/per-source form
    of :func:`winsorize` (one crawler's value distribution must not
    set another's clip bounds; the same motivation as the robust
    z-score's grouping). Semantics per group match the global form:
    NULL passes through, an all-NULL group clips nothing, replace
    mode keeps the column's type; a NULL group key is its own group
    (null-safe join-back, the r9 impute convention).

    Scale shape: ONE hash aggregation computes every group's two cut
    points (exact ``percentile`` / ``percentile_approx`` dual), then
    a NULL-SAFE join back (no mandatory broadcast — group cardinality
    is data-dependent, AQE decides) and a codegen clip projection —
    the impute_by_group shape with two statistics."""
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(
            f"need 0 <= lower < upper <= 1, got ({lower}, {upper})"
        )
    if not group_cols:
        raise ValueError("winsorize_by_group needs group columns; "
                         "use winsorize() for the global form")
    groups = list(group_cols)

    def cut(q: float, name: str):
        if approx:
            return F.percentile_approx(col, q, 10000).alias(name)
        return F.percentile(col, F.lit(q)).alias(name)

    stats = df.groupBy(*groups).agg(cut(lower, "__lo"), cut(upper, "__hi"))
    renamed = stats.select(
        *[F.col(g).alias(f"__g{i}") for i, g in enumerate(groups)],
        "__lo",
        "__hi",
    )
    cond = None
    for i, g in enumerate(groups):
        c = df[g].eqNullSafe(renamed[f"__g{i}"])
        cond = c if cond is None else (cond & c)
    joined = df.join(renamed, cond, "left").drop(
        *[f"__g{i}" for i in range(len(groups))]
    )
    x = F.col(col)
    clipped = F.when(
        x.isNull() | F.col("__lo").isNull() | F.col("__hi").isNull(), x
    ).otherwise(
        F.least(F.col("__hi"), F.greatest(F.col("__lo"), x.cast("double")))
    )
    if not suffix:  # replace mode must not change the schema
        clipped = clipped.cast(df.schema[col].dataType)
    return joined.withColumn(col + suffix, clipped).drop("__lo", "__hi")
