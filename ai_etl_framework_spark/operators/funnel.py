"""Funnel analysis — ordered conversion stages per key within a time
window (the product-analytics staple: view → click → purchase). No
reference-repo counterpart (grep funnel/conversion over
/root/reference/src: zero hits) — beyond-reference analytics scope,
a relational sibling of the sessionization operator.

Semantics (first-touch, strictly ordered, window anchored at stage 1):
stage 1's timestamp is the key's EARLIEST step-1 event; stage k's is
the earliest step-k event at or after stage k−1's timestamp and
within ``within`` of stage 1. A key enters the result iff it reached
stage 1; ``furthest`` counts completed stages.

Scale shape: k conditional MIN aggregations chained by joins, ALL
keyed on the funnel key — one hash partitioning reused across every
agg and join (AQE reuses the exchange), no window over raw events, no
per-key event lists materialized. Each intermediate is one row per
key. This is the k-pass relational form; k is the funnel length
(3–5), not data-sized."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["funnel_stages"]


def funnel_stages(
    df: DataFrame,
    steps: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str = "1 day",
) -> DataFrame:
    """(key, t1..tk, furthest): first-touch funnel timestamps per key.
    NULL key / NULL timestamp rows are ignored. Stage columns are
    named ``t1``..``tk`` in step order; ``furthest`` ∈ [1, k]."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    ev = df.where(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(F.col(key_col).alias("key"), F.col(ts_col).alias("ts"), F.col(type_col).alias("tp"))
    bound = F.expr(f"INTERVAL {within}")
    cur = (
        ev.where(F.col("tp") == steps[0])
        .groupBy("key")
        .agg(F.min("ts").alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = cur.select(
            "key",
            F.col(f"t{i - 1}").alias("__prev"),
            F.col("t1").alias("__anchor"),
        )
        nxt = (
            ev.where(F.col("tp") == step)
            .select("key", F.col("ts").alias("__ts"))
            .join(prev, "key")
            .where(
                (F.col("__ts") >= F.col("__prev"))
                & (F.col("__ts") <= F.col("__anchor") + bound)
            )
            .groupBy("key")
            .agg(F.min("__ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "key", "left")
    stage_cols = [f"t{i}" for i in range(1, len(steps) + 1)]
    furthest = sum(
        (F.col(c).isNotNull().cast("int") for c in stage_cols),
        F.lit(0),
    ).cast("long")
    return cur.select(
        F.col("key").alias(key_col),
        *stage_cols,
        furthest.alias("furthest"),
    )
