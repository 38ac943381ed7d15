"""Time-series resampling: align events onto a regular time grid per
key, aggregate within each bucket, densify the gaps, and forward-fill
— the pandas ``resample().agg().ffill()`` idiom at corpus scale —
plus the linear-interpolation variant (``resample_interpolate``:
pandas ``interpolate(method="time")``): missing buckets take the
time-proportional value between the nearest observed neighbors,
leading gaps stay NULL (nothing to anchor), trailing gaps hold the
last observation (ffill tail); both neighbor scans are IGNORE NULLS
window edges over the same grid partitioning, engine-identical. No
reference-repo counterpart (grep resample/ffill/gap.?fill over
/root/reference/src: zero hits) — beyond-reference analytics scope,
the batch twin of the streaming windowed aggregation.

Scale shape: bucketing is a pure projection (``F.window`` floor);
aggregation is one hash agg keyed on (key, bucket) with map-side
partials; densification generates each key's missing buckets with
``sequence`` + ``explode`` from the per-key [min, max] — only (key,
2 timestamps) rows feed the generator, so the explode fan-out is
exactly the output grid, never a cross join; the forward-fill is one
window (``last(value, ignorenulls=True)``) over the SAME (key,
bucket) partitioning the aggregation shuffled to, so AQE can reuse
the exchange. Grid cardinality = span/step per key — the caller
controls it with ``step``; a runaway span × tiny step shows up as the
output size itself, not a hidden intermediate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["resample_ffill", "resample_interpolate"]


def resample_ffill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    agg: str = "sum",
) -> DataFrame:
    """(key, bucket_start, value, filled): ``agg`` of ``value_col``
    per ``step``-wide bucket per key, with every key's grid densified
    from its first to its last bucket and NULL values forward-filled
    from the most recent non-NULL bucket. ``filled`` marks DENSIFIED
    (synthetic) buckets — derived from bucket presence in the
    observed aggregation, NOT from value-NULLness (r8 advice): an
    observed bucket whose ``value_col`` inputs are all NULL keeps
    ``filled = false`` even though its value is forward-filled like
    pandas ``ffill`` would, and stays NULL if it is a key's leading
    bucket with nothing before it to fill from. Rows with NULL key or
    NULL timestamp are dropped (they belong to no grid). ``agg`` ∈
    {sum, count, min, max, avg}.
    """
    aggs = {
        "sum": F.sum,
        "count": lambda c: F.count(c).cast("long"),
        "min": F.min,
        "max": F.max,
        "avg": F.avg,
    }
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}, got {agg!r}")
    bucket = F.window(F.col(ts_col), step).start.alias("bucket_start")
    observed = (
        df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(key_col).alias("key"), bucket, F.col(value_col).alias("v"))
        .groupBy("key", "bucket_start")
        .agg(
            aggs[agg](F.col("v")).alias("value"),
            # bucket-presence marker: COUNT(1) is non-NULL for every
            # observed bucket even when the value agg is NULL (all-
            # NULL inputs) — the `filled` flag keys off this, not off
            # value-NULLness
            F.count(F.lit(1)).alias("__n"),
        )
    )
    grid = (
        observed.groupBy("key")
        .agg(
            F.min("bucket_start").alias("lo"),
            F.max("bucket_start").alias("hi"),
        )
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))
            ).alias("bucket_start"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(observed, ["key", "bucket_start"], "left")
        .select(
            F.col("key").alias(key_col),
            "bucket_start",
            F.last("value", ignorenulls=True).over(w).alias("value"),
            F.col("__n").isNull().alias("filled"),
        )
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    agg: str = "avg",
    round_to: int = 6,
) -> DataFrame:
    """(key, bucket_start, value, filled): like :func:`resample_ffill`
    but densified buckets are LINEARLY interpolated between the
    nearest observed non-NULL neighbors, time-proportionally:
    ``prev + (next − prev) · (t − t_prev)/(t_next − t_prev)``.
    Leading buckets with no previous anchor stay NULL; trailing
    buckets with no next anchor hold the previous value. ``filled``
    semantics identical to resample_ffill (bucket presence, not
    value-NULLness). Values rounded ``round_to`` dp (interpolation is
    engine-shared float arithmetic; observed buckets round too so the
    column is one consistent grain, pinned HALF-AWAY-FROM-ZERO on
    the binary double via explicit floor arithmetic — interpolation
    at rational fractions like 1/2 lands on exact decimal-tie doubles
    OFTEN, where Spark's BigDecimal F.round and DuckDB's C-float
    ROUND disagree; |value| must stay under ~9e12 for the scaled
    floor to fit a BIGINT)."""
    aggs = {
        "sum": F.sum,
        "count": lambda c: F.count(c).cast("long"),
        "min": F.min,
        "max": F.max,
        "avg": F.avg,
    }
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}, got {agg!r}")
    from ai_etl_framework_spark.session import epoch_seconds

    bucket = F.window(F.col(ts_col), step).start.alias("bucket_start")
    observed = (
        df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(key_col).alias("key"), bucket, F.col(value_col).alias("v"))
        .groupBy("key", "bucket_start")
        .agg(
            aggs[agg](F.col("v")).alias("__x"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    grid = (
        observed.groupBy("key")
        .agg(
            F.min("bucket_start").alias("lo"),
            F.max("bucket_start").alias("hi"),
        )
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))
            ).alias("bucket_start"),
        )
    )
    w_prev = (
        Window.partitionBy("key")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the NEXT anchor is a running last over the REVERSED ordering —
    # semantically identical to first(ignorenulls) over
    # [currentRow, unboundedFollowing] (buckets are unique per key)
    # but O(n) streaming state instead of Spark's
    # UnboundedFollowingWindowFunctionFrame, which RESCANS to the
    # partition end for every row (O(n² per key) — at the sf1 smoke
    # this was 812 s on the per-user grid; the rewrite is ~20×
    # cheaper). Same partitioning: one exchange, two sorts.
    w_next_rev = (
        Window.partitionBy("key")
        .orderBy(F.col("bucket_start").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(observed, ["key", "bucket_start"], "left")
    anchor_t = F.when(F.col("__x").isNotNull(), F.col("bucket_start"))
    pv = F.last("__x", ignorenulls=True).over(w_prev)
    pt = F.last(anchor_t, ignorenulls=True).over(w_prev)
    nv = F.last("__x", ignorenulls=True).over(w_next_rev)
    nt = F.last(anchor_t, ignorenulls=True).over(w_next_rev)
    t = epoch_seconds(F.col("bucket_start"))
    frac = (t - epoch_seconds(pt)) / (epoch_seconds(nt) - epoch_seconds(pt))
    value = (
        F.when(F.col("__x").isNotNull(), F.col("__x").cast("double"))
        .when(pv.isNull(), F.lit(None).cast("double"))
        .when(nv.isNull(), pv.cast("double"))
        .otherwise(pv.cast("double") + (nv.cast("double") - pv.cast("double")) * frac)
    )
    scale = float(10 ** round_to)
    pinned = (
        F.signum(value)
        * F.floor(F.abs(value) * scale + F.lit(0.5)).cast("double")
        / F.lit(scale)
    )
    return joined.select(
        F.col("key").alias(key_col),
        "bucket_start",
        F.when(value.isNotNull(), pinned).alias("value"),
        F.col("__n").isNull().alias("filled"),
    )
