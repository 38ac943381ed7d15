"""Interval flattening — merge overlapping per-key time intervals
into maximal "islands" and report coverage: the gaps-and-islands
decomposition over ARBITRARY [start, end] timestamp intervals (the
day-granularity cousin lives in operators/activity.py, where interval
ends are monotone by construction; here they are not, so the island
test needs the full running-max form). The primitive behind "how many
distinct outage windows, and how long was the system actually down",
session coverage, SLA overlap math, and double-billing detection.
Beyond-reference analytics scope (grep 'island\\|interval merge' over
/root/reference/src: zero hits).

Pinned semantics (oracle-replicated):

- rows with NULL key/start/end drop; an interval with end < start
  FAILS LOUD (a reversed interval is an upstream bug — silently
  clamping it would hide corrupted data, the same fail-loud stance
  as the malformed-vector rule in ml/pca.py);
- intervals are CLOSED: touching intervals (next start == current
  max end) MERGE into one island — a new island starts only when
  start is STRICTLY past the running max end of every earlier
  interval (ordered by (start, end) within the key; equal rows are
  interchangeable for the running max, so ties need no tiebreak);
- output per key: (key, n_intervals, n_islands, covered_s,
  max_island_s) — covered_s = Σ islands (end − start) in seconds
  (double, ``round_to``dp, 6 default), max_island_s likewise;
- epoch arithmetic is TIMESTAMP_NTZ-safe (session.epoch_seconds).

Scale shape: ONE window partition per key ordered by (start, end) —
the running-max-end and island-id cumsum ride the same partition
sort — then one (key, island)-sized hash aggregation and one
key-sized aggregation. Raw intervals shuffle exactly once on the
key; nothing is collected; the guard aggregation for reversed
intervals is a 1-row limit probe."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["interval_coverage"]


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    round_to: int = 6,
) -> DataFrame:
    """(key, n_intervals, n_islands, covered_s, max_island_s) —
    module pins."""
    from ai_etl_framework_spark.session import epoch_seconds

    k = F.col(key_col)
    s = F.col(start_col)
    e = F.col(end_col)
    base = df.where(k.isNotNull() & s.isNotNull() & e.isNotNull()).select(
        k.alias("__k"), s.alias("__s"), e.alias("__e")
    )
    bad = base.where(F.col("__e") < F.col("__s"))
    if bad.limit(1).count() > 0:
        raise ValueError(
            f"interval_coverage: found end < start ({end_col} < "
            f"{start_col}) — reversed intervals are upstream bugs; "
            "fix or filter them explicitly"
        )
    w = Window.partitionBy("__k").orderBy(
        F.col("__s").asc(), F.col("__e").asc()
    )
    prev_max_end = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_end.isNull() | (F.col("__s") > prev_max_end), 1
    ).otherwise(0)
    flagged = base.select(
        "__k",
        "__s",
        "__e",
        F.sum(new_island)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__island"),
    )
    islands = flagged.groupBy("__k", "__island").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        (
            epoch_seconds(F.max("__e")) - epoch_seconds(F.min("__s"))
        ).alias("__span"),
    )
    return islands.groupBy(F.col("__k").alias(key_col)).agg(
        F.sum("__n").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.round(F.sum("__span"), round_to).alias("covered_s"),
        F.round(F.max("__span"), round_to).alias("max_island_s"),
    )
