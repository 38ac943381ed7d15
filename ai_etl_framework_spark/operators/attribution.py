"""Marketing-style conversion attribution — credit each conversion
event to the user's most recent (last-touch) or first (first-touch)
preceding touch event, then roll credited value up per channel: the
table every growth dashboard opens with. Composes the repo's as-of
join (operators/asof.py — the union+window formulation, one
key-partitioned sort, no range join) rather than reinventing the
temporal join. Beyond-reference scope (no temporal joins in the
reference at all).

Pinned semantics (oracle-replicated):

- conversions = rows whose ``type_col`` is in ``conversion_types``;
  touches = rows in ``touch_types``; both need non-NULL key and ts
  (an unkeyed/untimed event can neither convert nor be credited);
- last-touch: each conversion joins the touch with the LARGEST ts ≤
  its own ts for the same key (ties inside asof_join resolve to the
  later right row exactly as DuckDB ASOF does — pinned there);
  conversions with no preceding touch credit the ``'(none)'``
  channel;
- output per channel: (channel, n_conversions, attributed_value) —
  value summed over credited conversions (NULL conversion values sum
  as ANSI sum; 6dp);
- first-touch: ``mode="first"`` credits the user's EARLIEST touch
  overall that is ≤ the conversion ts — implemented as a per-key min
  aggregation + ordinary join (no as-of needed for a global first).

Scale shape: one as-of join (union + one key-partitioned window — the
asof.py contract) or one per-key min aggregation, then a channel-sized
hash aggregation. Nothing all-pairs, nothing collected."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["attribution"]


def attribution(
    df: DataFrame,
    conversion_types: Sequence[str],
    touch_types: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    mode: str = "last",
) -> DataFrame:
    """(channel, n_conversions, attributed_value) — module pins."""
    if mode not in ("last", "first"):
        raise ValueError(f"mode must be 'last' or 'first', got {mode!r}")
    conversion_types = list(conversion_types)
    touch_types = list(touch_types)
    if not conversion_types or not touch_types:
        raise ValueError("need at least one conversion and one touch type")
    base = df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    conv = base.where(F.col(type_col).isin(conversion_types)).select(
        F.col(key_col), F.col(ts_col), F.col(value_col).alias("__val")
    )
    touch = base.where(F.col(type_col).isin(touch_types)).select(
        F.col(key_col), F.col(ts_col), F.col(type_col).alias("__channel")
    )
    if mode == "last":
        from ai_etl_framework_spark.operators.asof import asof_join

        credited = asof_join(
            conv, touch, on=ts_col, by=[key_col], right_cols=["__channel"]
        )
    else:
        first = touch.groupBy(F.col(key_col)).agg(
            F.min(
                F.struct(F.col(ts_col).alias("t"), F.col("__channel").alias("c"))
            ).alias("__f")
        )
        credited = conv.join(first, key_col, "left").select(
            F.col(key_col),
            F.col(ts_col),
            "__val",
            # the first touch only counts if it precedes the conversion
            F.when(
                F.col("__f")["t"] <= F.col(ts_col), F.col("__f")["c"]
            ).alias("__channel"),
        )
    return (
        credited.select(
            F.coalesce(F.col("__channel"), F.lit("(none)")).alias("channel"),
            "__val",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.round(F.sum("__val"), 6).alias("attributed_value"),
        )
    )
