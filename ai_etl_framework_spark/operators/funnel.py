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

__all__ = ["funnel_stages", "funnel_timings"]


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


def funnel_timings(
    df: DataFrame,
    steps: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str = "1 day",
    approx: bool = False,
) -> DataFrame:
    """Stage-transition timing summary — one row per funnel TRANSITION
    (stage i → i+1) with conversion counts and time-to-convert
    percentiles: (transition, n_reached, n_converted, conv_rate,
    p50_seconds, p90_seconds, mean_seconds). The question funnel
    counts can't answer: not just HOW MANY keys convert, but how
    long the drop-off pocket is (a p90 near the ``within`` bound
    means the window is clipping conversions).

    Pinned (oracle-replicated): deltas are epoch-second differences
    of :func:`funnel_stages`' first-touch timestamps (µs-preserving);
    percentiles are exact linear-interpolation ``percentile``
    (``percentile_approx`` under ``approx=True`` — the usual dual);
    n_reached counts keys with stage i, n_converted with stage i+1
    (non-NULL tᵢ₊₁ implies non-NULL tᵢ by construction); rates 6dp,
    seconds 4dp.

    Scale shape: funnel_stages' one reused key partitioning, then one
    |transitions|-row aggregation over the per-key frame (k−1
    percentile/count expression groups in a single pass). The final
    table is funnel-length-sized."""
    stages = funnel_stages(df, steps, key_col, ts_col, type_col, within)
    from ai_etl_framework_spark.session import epoch_seconds

    k = len(steps)
    aggs = []
    for i in range(1, k):
        delta = epoch_seconds(f"t{i + 1}") - epoch_seconds(f"t{i}")
        if approx:
            p50 = F.percentile_approx(delta, 0.5, 10000)
            p90 = F.percentile_approx(delta, 0.9, 10000)
        else:
            p50 = F.percentile(delta, F.lit(0.5))
            p90 = F.percentile(delta, F.lit(0.9))
        aggs += [
            F.count(F.col(f"t{i}")).cast("long").alias(f"__r{i}"),
            F.count(F.col(f"t{i + 1}")).cast("long").alias(f"__c{i}"),
            F.round(p50, 4).alias(f"__p50_{i}"),
            F.round(p90, 4).alias(f"__p90_{i}"),
            F.round(F.avg(delta), 4).alias(f"__mu_{i}"),
        ]
    from ai_etl_framework_spark.operators.scaling import _round6

    row = stages.agg(*aggs).collect()[0]
    out = []
    for i in range(1, k):
        reached, conv = row[f"__r{i}"], row[f"__c{i}"]
        out.append((
            f"{steps[i - 1]} -> {steps[i]}",
            reached,
            conv,
            # half-up 6dp (repo convention, matches F.round / DuckDB
            # ROUND in the x48 oracle) — builtin round() is banker's
            # and flips the 6th digit on exact .5e-7 boundaries
            _round6(conv / reached) if reached else None,
            row[f"__p50_{i}"],
            row[f"__p90_{i}"],
            row[f"__mu_{i}"],
        ))
    return df.sparkSession.createDataFrame(
        out,
        "transition string, n_reached long, n_converted long, "
        "conv_rate double, p50_seconds double, p90_seconds double, "
        "mean_seconds double",
    )
