"""As-of join: match each left row to the most recent right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do — the DuckDB one is
the test oracle). A naive theta-join `l.ts >= r.ts` explodes into a
range join and then needs a per-left-row argmax; the classic scalable
formulation used here is union + last-value carry-forward:

1. tag right rows (carrying their payload) and left rows (payload
   NULL) into ONE frame;
2. sort within each key by (ts, right-before-left on ties) — a single
   shuffle on the key, no range join, no per-row argmax;
3. `last(payload, ignorenulls=True)` over the running window fills
   each left row with the latest right payload at or before it;
4. keep the left rows.

Cost: one shuffle of |L|+|R| rows + one in-partition sort — the same
shape as a sort-merge join, at any scale. Ties (equal ts) resolve to
the right row being visible to the left row, matching DuckDB ASOF
(`ON l.ts >= r.ts`).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bin_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join (`start <= point <= end`) without the
    naive cross-product: both sides are mapped to fixed-width time
    bins — each interval replicates once per bin it covers, each
    point lands in one bin — then an EQUI-join on (keys…, bin)
    followed by the exact containment filter. Catalyst gets a hash
    join on the bin key instead of a nested-loop range join; cost
    scales with interval-length/bin-width, not |P|×|I|.

    Pick ``bin_seconds`` near the median interval length: too small
    replicates intervals, too large packs many points per bin."""
    from ai_etl_framework_spark.session import ensure_timestamp, epoch_seconds

    # NTZ inputs are normalized to TIMESTAMP under a UTC-pinned session
    # (ensure_timestamp) so the epoch-based bin arithmetic is identical
    # on any caller session, DST zones included
    points = ensure_timestamp(points, point_col)
    intervals = ensure_timestamp(intervals, start_col, end_col)
    by = list(by)
    p_bin = F.floor(epoch_seconds(point_col) / bin_seconds)
    i_bins = F.sequence(
        F.floor(epoch_seconds(start_col) / bin_seconds).cast("long"),
        F.floor(epoch_seconds(end_col) / bin_seconds).cast("long"),
    )
    p = points.withColumn("__bin", p_bin.cast("long"))
    i = intervals.withColumn("__bin", F.explode(i_bins))
    joined = p.join(i, by + ["__bin"]).where(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("__bin")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Left as-of join. ``on``: the ordering (timestamp) column present
    in both frames; ``by``: equi-key columns; ``right_cols``: right
    payload columns to carry (default: all non-key, non-ts)."""
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]
    right_cols = list(right_cols)
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")
    # a right row with NULL `on` is unmatchable (DuckDB ASOF's
    # `l.ts >= r.ts` is never true for it) — but in the union+window
    # formulation Spark sorts NULL FIRST, so it would carry its
    # payload forward to every left row with no real predecessor.
    # Drop it. Left rows with NULL `on` need no handling: they also
    # sort first, see no preceding right row, and get NULL payload —
    # exactly the DuckDB result.
    right = right.where(F.col(on).isNotNull())

    # the right payload travels as ONE struct, not per-column: a
    # per-column last(ignorenulls) carry-forward would fill each
    # payload column from a DIFFERENT right row whenever the most
    # recent row has NULLs in some columns — synthesizing a row that
    # never existed. A struct is never NULL for a present right row,
    # so last(struct) atomically picks the most recent right ROW and
    # keeps its interior NULLs intact.
    r_tagged = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__is_left"),
        F.lit(None)
        .cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("__lrow")
            ).schema["__lrow"].dataType
        )
        .alias("__lrow"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__rrow"),
    )
    l_tagged = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(r_tagged.schema["__rrow"].dataType).alias("__rrow"),
    )
    unioned = r_tagged.unionByName(l_tagged)
    # right rows sort BEFORE left rows on ties so an equal-ts right row
    # is visible to the left row (ASOF `>=` semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__is_left",
        "__lrow",
        F.last(F.col("__rrow"), ignorenulls=True).over(w).alias("__rrow"),
    )
    return filled.where(F.col("__is_left") == 1).select(
        "__lrow.*", *[F.col(f"__rrow.{c}").alias(c) for c in right_cols]
    )
