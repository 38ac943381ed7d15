"""Survivorship / golden-record consolidation — collapse each
duplicate cluster to ONE canonical record by per-column rules: the
step AFTER dedup finds clusters (operators/dedup.py builds them; this
merges them). The reference's Deduplicator picks one whole ROW
(keep_first/best_quality, deduplicator.py); real MDM consolidation
picks per COLUMN — newest address, most frequent phone, max
quality — which no whole-row choice can express. Beyond-reference
scope for the per-column rules.

Rules (per output column, oracle-replicated):

- ``latest``  — value at the MAX of ``order_col`` among the cluster's
  rows with BOTH this column and ``order_col`` non-NULL (a NULL order
  gives a row no position — excluded; ties on order_col resolve to
  the larger value under max — total, deterministic);
- ``earliest`` — same with MIN (order ties resolve to the smaller
  value);
- ``mode``    — most frequent non-NULL value; ties → the smallest
  value (the canonical-smallest policy dedup uses);
- ``max`` / ``min`` — extremal non-NULL value;
- a cluster whose values are all NULL for a column yields NULL.

Pinned tie shape: ``latest``/``earliest`` reduce over the pair
(order, value) with min/max struct semantics; ``mode`` ranks
(count DESC, value ASC) per cluster — both engines compute identical
winners because every comparison is on a total order.

Scale shape: ONE hash aggregation per call for the min/max/latest/
earliest rules (min_by/max_by over a struct — SortAggregate with
map-side partials, the q12 exact-dedup shape) plus, ONLY when a mode
rule is present, one (cluster, value) pre-count per mode column and a
per-cluster WindowGroupLimit pick (rank=1 over count-desc) joined
back — dimension-per-cluster-sized frames, never raw-row windows
without partitioning. No collects, no driver loops.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["golden_record"]

_RULES = ("latest", "earliest", "mode", "max", "min")


def golden_record(
    df: DataFrame,
    cluster_col: str,
    rules: Mapping[str, str],
    order_col: str | None = None,
) -> DataFrame:
    """One row per cluster with each column consolidated by its rule —
    module pins. ``rules`` maps column → rule name; ``order_col`` is
    required when any rule is latest/earliest."""
    if not rules:
        raise ValueError("golden_record needs at least one column rule")
    for col, rule in rules.items():
        if rule not in _RULES:
            raise ValueError(
                f"unknown rule {rule!r} for {col!r}; valid: {_RULES}"
            )
    needs_order = [c for c, r in rules.items() if r in ("latest", "earliest")]
    if needs_order and not order_col:
        raise ValueError(
            f"rules latest/earliest on {needs_order} need order_col"
        )
    base = df.where(F.col(cluster_col).isNotNull())

    aggs = []
    for col, rule in rules.items():
        c = F.col(col)
        if rule == "max":
            aggs.append(F.max(c).alias(col))
        elif rule == "min":
            aggs.append(F.min(c).alias(col))
        elif rule in ("latest", "earliest"):
            red = F.max if rule == "latest" else F.min
            # non-NULL values only compete; the struct's trailing value
            # component breaks order ties deterministically (latest
            # prefers the LARGER value on an order tie under max,
            # earliest the smaller under min — pinned, and mirrored in
            # the oracle's row() comparison)
            entry = F.when(
                c.isNotNull() & F.col(order_col).isNotNull(),
                F.struct(F.col(order_col).alias("o"), c.alias("v")),
            )
            aggs.append(red(entry)["v"].alias(col))
    mode_cols = [c for c, r in rules.items() if r == "mode"]

    if aggs:
        out = base.groupBy(F.col(cluster_col)).agg(*aggs)
    else:
        # mode-only specs: every cluster still gets a row (a cluster
        # whose mode column is all-NULL must yield NULL, not vanish)
        out = base.select(cluster_col).distinct()
    for col in mode_cols:
        counts = (
            base.where(F.col(col).isNotNull())
            .groupBy(F.col(cluster_col), F.col(col))
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        w = Window.partitionBy(cluster_col).orderBy(
            F.col("__cnt").desc(), F.col(col).asc()
        )
        picked = (
            counts.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .select(F.col(cluster_col), F.col(col))
        )
        out = out.join(picked, cluster_col, "left")
    # restore the caller's column order
    return out.select(cluster_col, *rules.keys())
