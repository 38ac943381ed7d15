"""Skew mitigation utilities for hot keys at scale.

AQE (enabled in session.py) already splits skewed SORT-MERGE join
partitions at runtime; these helpers cover the cases AQE does not:

- ``salted_join``: a hot-key equi-join where the small side fits in
  memory per key but the big side has 10⁸ rows of one key. The big
  side gets a random salt in [0, salt); the small side is replicated
  once per salt value; the join key becomes (key, salt), spreading
  each hot key over ``salt`` reducers. Row-identical to the plain
  join.
- ``salted_count_distinct``: exact COUNT(DISTINCT x) per key without
  funneling each key's values through one reducer — phase 1 dedups on
  (key, x) (shuffle spread over both), phase 2 counts per key. This
  is what countDistinct compiles to internally (Expand), exposed here
  for composition with other skew-safe aggs.
- ``two_phase_agg``: partial aggregation on (key, salt), final on key
  — for aggregates whose buffers grow with group size
  (collect_list/set), where map-side combine alone cannot spread one
  giant group.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt``
    reducers. ``small`` is replicated ``salt`` times — keep it the
    dimension side.

    Only join types where an UNMATCHED small-side row produces no
    output are allowed: under right/full outer, each of the ``salt``
    replicas of an unmatched small row would survive independently,
    emitting ``salt`` duplicates. Flip the sides (or salt the other
    frame) for those shapes."""
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched "
            f"replicated rows; allowed: inner/left/left_semi/left_anti"
        )
    on = list(on)
    big_s = big.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    small_s = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = big_s.join(small_s, on + ["__salt"], how)
    return out.drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    out_name: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count per key, skew-safe: the first shuffle is on
    (keys, col) so a hot key's values spread across reducers.

    NULL handling matches SQL COUNT(DISTINCT x): NULLs are not a
    value (counting F.count(col) over the deduped rows skips the
    at-most-one NULL row per key), while a key whose rows are ALL
    NULL still appears with count 0 — pre-filtering the NULLs away
    would silently drop such keys instead (r5 review)."""
    keys = list(keys)
    return (
        df.select(*keys, col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.col(col)).alias(out_name))
    )


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Generic salted two-phase aggregation.

    ``partial_aggs``: {name: agg over raw rows} computed per
    (keys, salt); ``final_aggs``: {name: agg over the partial columns}
    computed per keys. Example — skew-safe collect_list::

        two_phase_agg(df, ["k"],
            {"vs": F.collect_list("v")},
            {"vs": F.flatten(F.collect_list("vs"))})
    """
    keys = list(keys)
    partial = (
        df.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
        .groupBy(*keys, "__salt")
        .agg(*[e.alias(n) for n, e in partial_aggs.items()])
    )
    return partial.groupBy(*keys).agg(*[e.alias(n) for n, e in final_aggs.items()])


def ordered_group_concat(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    value: str,
    sep: str = ", ",
) -> DataFrame:
    """Exact ordered group-concat whose SORT is distributed — for FEW
    or GIANT groups, where the Aggregator's ordered path (hash-
    partition on the group keys, one Tungsten sort per partition)
    degenerates to one straggler task per hot group.

    Shape:

    1. ``repartitionByRange`` on the ORDER key alone: each partition
       holds one contiguous slice of the global order, across all
       groups, so the sort work spreads over the whole cluster no
       matter how the group keys are distributed.
    2. ``sortWithinPartitions(order)`` + ``monotonically_increasing_id``
       stamps a slice-local order rank.
    3. Level-1 aggregation per (slice-id, keys): the slice's values
       for each group, locally ordered via the rank structs —
       partial aggregation collapses map-side before the exchange.
    4. Level-2 per keys: one small row per (group, slice) assembles in
       slice order — range partitioning guarantees every order key in
       slice p precedes every key in slice p+1 (AQE may merge adjacent
       slices; merged slices stay contiguous and re-sort locally).

    Output: ``keys…, <value>_concat string``. Semantics match
    ``Aggregator``'s ``concat`` (order asc NULLS LAST per component,
    NULL values dropped, ``''`` for all-NULL groups; ties on the full
    order key arbitrary). Cost: the input shuffles twice (range spread
    + level-1 exchange) instead of once — the trade that buys a
    distributed sort. The final row per group still materializes the
    whole output string, which is inherent to concat.
    """
    keys = list(keys)
    ordering = [F.col(c).asc_nulls_last() for c in order_by]
    sliced = (
        df.repartitionByRange(*ordering)
        .sortWithinPartitions(*ordering)
        .withColumn("__rn", F.monotonically_increasing_id())
        .withColumn("__slice", F.spark_partition_id())
    )
    v = F.col(value)
    entry = F.when(
        v.isNotNull(),
        F.struct(F.col("__rn").alias("r"), v.cast("string").alias("v")),
    )
    # a slice with NO entries for a group (its values were all NULL)
    # must yield a NULL part, not '' — '' is a legitimate part (a
    # slice whose only value is the empty string) that has to survive
    # into the assembly, where dropping it would diverge from the
    # Aggregator ('a' vs 'a, ')
    sorted_entries = F.array_sort(F.collect_list(entry))
    lvl1 = sliced.groupBy("__slice", *keys).agg(
        F.when(
            F.size(sorted_entries) > 0,
            F.array_join(F.transform(sorted_entries, lambda s: s["v"]), sep),
        ).alias("__part")
    )
    part_entry = F.struct(F.col("__slice").alias("p"), F.col("__part").alias("v"))
    # NULL parts are dropped at assembly, not before the level-2
    # groupBy — a group must survive with '' even when EVERY slice is
    # empty
    return lvl1.groupBy(*keys).agg(
        F.array_join(
            F.filter(
                F.transform(
                    F.array_sort(F.collect_list(part_entry)), lambda s: s["v"]
                ),
                lambda p: p.isNotNull(),
            ),
            sep,
        ).alias(f"{value}_concat")
    )
