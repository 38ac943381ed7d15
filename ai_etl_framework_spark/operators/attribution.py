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

__all__ = ["attribution", "linear_attribution"]


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


def linear_attribution(
    df: DataFrame,
    conversion_types: Sequence[str],
    touch_types: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    lookback: str = "3 days",
) -> DataFrame:
    """Multi-touch LINEAR attribution — each conversion's value splits
    EQUALLY across every touch in its lookback window, the standard
    position-agnostic complement of :func:`attribution`'s
    first/last-touch single-credit models (the growth team's "did the
    middle of the funnel matter" table). Beyond-reference analytics
    scope (no temporal joins or attribution in the reference).

    Pinned semantics (oracle-replicated):

    - conversions = rows with ``type_col`` in ``conversion_types``;
      touches = rows in ``touch_types``; both need non-NULL key and
      ts; ``id_col`` identifies each conversion (ties on (key, ts)
      are distinct conversions, each credited independently);
    - credited window per conversion: touch_ts in
      ``[conv_ts - lookback, conv_ts)`` — half-open, a touch exactly
      at the conversion instant is NOT a cause (pinned; the as-of
      model in :func:`attribution` pins the opposite closed bound,
      matching DuckDB ASOF — both documented);
    - each credited touch receives value/k where k = that
      conversion's credited-touch count (value NULL → credit NULL,
      ANSI sum drops it; count still rides);
    - conversions with ZERO window touches credit the ``'(none)'``
      channel in full (so total attributed value = total conversion
      value, the linear-model invariant — test-pinned);
    - output: (channel, n_credits, attributed_value) — n_credits =
      credited (conversion, touch) pairs ('(none)': conversions);
      value rounded 2dp (raw-magnitude sum — the 2dp house rule).

    Scale shape: one equality-key join with a time-range residual —
    Spark co-partitions both sides on ``key_col`` (one shuffle each)
    and applies the range as a join residual, so the fan-out is
    per-user touches x conversions inside the window, never
    all-pairs; then one left-anti join for the '(none)' arm (same
    key partitioning, AQE reuses it) and one channel-sized hash
    aggregation. Nothing collected, nothing cartesian."""
    conversion_types = list(conversion_types)
    touch_types = list(touch_types)
    if not conversion_types or not touch_types:
        raise ValueError("need at least one conversion and one touch type")
    base = df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    conv = base.where(F.col(type_col).isin(conversion_types)).select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__cts"),
        F.col(id_col).alias("__cid"),
        F.col(value_col).alias("__val"),
    )
    touch = base.where(F.col(type_col).isin(touch_types)).select(
        F.col(key_col).alias("__tk"),
        F.col(ts_col).alias("__tts"),
        F.col(type_col).alias("__channel"),
    )
    lb = F.expr(f"INTERVAL {lookback}")
    pairs = conv.join(
        touch,
        (F.col("__k") == F.col("__tk"))
        & (F.col("__tts") >= F.col("__cts") - lb)
        & (F.col("__tts") < F.col("__cts")),
        "inner",
    )
    # k per conversion via one window over the pair frame (partitioned
    # by the conversion id — the pair frame is already keyed by it)
    from pyspark.sql import Window

    k = F.count(F.lit(1)).over(Window.partitionBy("__cid"))
    credited = pairs.select(
        F.col("__channel"),
        (F.col("__val") / k).alias("__credit"),
    )
    none_arm = (
        conv.join(
            pairs.select("__cid").distinct(),
            "__cid",
            "left_anti",
        ).select(
            F.lit("(none)").alias("__channel"),
            F.col("__val").alias("__credit"),
        )
    )
    return (
        credited.unionByName(none_arm)
        .groupBy(F.col("__channel").alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_credits"),
            F.round(F.sum("__credit"), 2).alias("attributed_value"),
        )
    )
