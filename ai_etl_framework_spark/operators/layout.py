"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for scan pruning (Morton 1966; the technique behind Delta Lake's
OPTIMIZE ZORDER BY). No reference-repo counterpart (grep zorder/
morton over /root/reference/src: zero hits) — beyond-reference
lakehouse scope, the companion of the compaction operator.

Why it matters at 100 TB: range-partitioning on ONE column prunes
scans on that column only; a query filtering on a second column reads
everything. Sorting by the interleaved-bit Morton code of k columns
gives every one of them locality — a selective rectangle in (a, b)
space touches a small, contiguous-ish set of files/row-groups, so
min/max statistics prune most of the scan for filters on ANY prefix
or combination of the z-ordered columns.

Implementation is pure integer Catalyst expressions (quantize each
column to ``bits`` levels against its global min/max — two bounded
scalar aggregates — then interleave bits with shift/or terms), so the
z-value is engine-exact and the DuckDB oracle reproduces it
bit-for-bit. NULLs quantize to bucket 0 (they cluster together at the
curve's origin). The layout step is ``repartitionByRange`` on the
z-value + ``sortWithinPartitions`` — the standard distributed sort,
no single-task stage; writers then emit size-capped files whose
min/max column stats carry the pruning.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_value", "zorder_dataframe"]


def zorder_value(
    cols: Sequence[Column],
    mins: Sequence[float],
    maxs: Sequence[float],
    bits: int = 16,
) -> Column:
    """Morton code of ``cols`` as a non-negative BIGINT: each column
    quantized to ``[0, 2^bits)`` against its [min, max] (clamped;
    NULL → 0; a constant column — max == min — quantizes to 0), then
    bit b of column i lands at position ``b·k + i``. ``bits·k`` must
    fit in 63 bits."""
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_value needs at least one column")
    if bits * k > 63:
        raise ValueError(f"bits*k = {bits * k} exceeds a signed BIGINT")
    levels = (1 << bits) - 1
    qs = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = float(hi) - float(lo)
        if span <= 0:
            qs.append(F.lit(0).cast("long"))
            continue
        scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(
            float(levels)
        )
        # coalesce BEFORE the clamp: Spark's least/greatest SKIP NULL
        # operands (least(levels, NULL) = levels), so a NULL input
        # would otherwise quantize to the TOP bucket instead of 0
        q = F.coalesce(F.floor(scaled).cast("long"), F.lit(0))
        qs.append(F.greatest(F.lit(0), F.least(F.lit(levels), q)))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(qs):
            z = z + F.shiftleft(
                F.shiftright(q, b) % 2, b * k + i
            ).cast("long")
    return z


def zorder_dataframe(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: Optional[int] = None,
    z_col: Optional[str] = None,
) -> DataFrame:
    """Cluster ``df`` along the Morton curve of ``cols``: two bounded
    scalar aggregates fetch the global min/max per column, then the
    frame is range-partitioned and partition-sorted by the z-value.
    Write the result with any sink — file/row-group min/max stats on
    the original columns then prune selective scans on any of them.
    ``z_col`` keeps the code as a named column (e.g. to partition or
    bucket by its high bits); default drops it."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
    ).collect()[0]
    mins = [stats[f"__lo_{c}"] for c in cols]
    maxs = [stats[f"__hi_{c}"] for c in cols]
    if any(v is None for v in mins + maxs):  # all-NULL column or empty df
        mins = [0.0 if v is None else v for v in mins]
        maxs = [0.0 if v is None else v for v in maxs]
    z = zorder_value([F.col(c) for c in cols], mins, maxs, bits)
    name = z_col or "__z"
    out = df.withColumn(name, z)
    out = (
        out.repartitionByRange(num_partitions, name)
        if num_partitions
        else out.repartitionByRange(name)
    )
    out = out.sortWithinPartitions(name)
    return out if z_col else out.drop(name)
