"""Distributed per-group ranking — the shared two-pass
range-partitioned rank used by the rank-consuming operators (gini,
quantile_normalize) when groups are FEW and GIANT: a plain
``Window.partitionBy(group)`` puts each group's whole sort in ONE
task (fine for per-user keys, a wall for a 5-value status column over
100 TB). Same machinery family as pareto_share's distributed prefix
sum and the Aggregator's distributed ordered path.

How: range-partition on (group, value) — equal keys land in one
partition, each partition holds a contiguous slice of each group's
value order — then rank LOCALLY per (partition, group) and add the
group's cumulative preceding-slice row counts (a |partitions×groups|
frame, windowed over itself and broadcast back).

Correctness pins:
- ``rank`` = ties share the MINIMUM position (SQL RANK): ties of
  (group, value) are co-located by the range partitioner, so the
  local rank() is already global once offset;
- ``rn`` = ROW_NUMBER: arbitrary within ties (the callers that use it
  — gini's Σ i·x — are tie-invariant by algebra);
- the staged frame is persisted (the offsets job and the result both
  read it; released when the result is garbage-collected);
- NULL groups/values must be filtered by the CALLER (rank of NULL is
  caller policy, not rank machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["group_ranks"]


def group_ranks(
    df: DataFrame,
    group_col: str,
    value_col: str,
    num_partitions: int = 200,
    rank_col: str = "__rank",
    rn_col: str = "__rn",
    n_col: str = "__n",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``df`` + ``rank_col`` (SQL RANK, ties share min), ``rn_col``
    (ROW_NUMBER) and ``n_col`` (group size), each ascending in
    ``value_col`` within ``group_col`` — computed with NO single-task
    window. Optional ``tiebreak_cols`` extend the ordering (ascending)
    after ``value_col``: with a unique tiebreak (an id column) the
    ROW_NUMBER becomes DETERMINISTIC, not merely tie-invariant —
    required by positional consumers (rfm's ntile). The range
    partitioner and the local window share the composite order, so
    co-location still holds. See module docstring."""
    from pyspark import StorageLevel

    order = [F.col(group_col).asc(), F.col(value_col).asc()] + [
        F.col(c).asc() for c in tiebreak_cols
    ]
    staged = (
        df.repartitionByRange(num_partitions, *order)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cnts = staged.groupBy("__pid", group_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(F.col("__pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_n = Window.partitionBy(group_col)
    offs = cnts.select(
        "__pid",
        group_col,
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__c").over(w_n).alias(n_col),
    )
    w_local = Window.partitionBy("__pid", group_col).orderBy(
        F.col(value_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    return (
        staged.join(F.broadcast(offs), ["__pid", group_col])
        .withColumn(rank_col, F.rank().over(w_local) + F.col("__off"))
        .withColumn(rn_col, F.row_number().over(w_local) + F.col("__off"))
        .drop("__pid", "__off")
    )
