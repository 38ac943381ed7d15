"""Frequent event sequences — the top-k most common length-n event
paths across users (the "what do users actually do" mining behind
navigation analysis and funnel DISCOVERY — the funnel operator tests
a known path; this finds the paths worth testing). Beyond-reference
analytics scope (grep sequence/path.?mining over /root/reference/src:
zero hits).

Pinned semantics (oracle-replicated):

- each user's events are ordered by (ts, tiebreak_col) — the explicit
  integer tie-break makes simultaneous events deterministic (the q07
  lesson: timestamp ties are real in event data);
- a length-``n`` sequence is ``n`` CONSECUTIVE events of one user
  (sliding window, overlapping) joined with " > ";
- output = top-``k`` sequences by occurrence count, ties broken
  sequence-ascending; users with fewer than ``n`` events contribute
  nothing;
- NULL user/ts/type rows are dropped.

``transition_matrix`` — the first-order Markov chain over the same
ordered event stream: P(next state | current state) from consecutive
event pairs WITHIN a user (never across users). Output one row per
observed (src, dst) pair: (src, dst, n, prob) with prob =
n / Σ n over src, rounded 6dp; a user's last event has no successor
and contributes no pair. Same NULL-drop and (ts, tiebreak) ordering
pins as the sequence miner.

Scale shape: ONE window over (user) ordering by (ts, tiebreak) —
``lead(type, i)`` chains build the n-gram in the same window pass, so
raw events shuffle exactly once on the user key; the count is a hash
aggregation on the (short-string) sequence with map-side partials
collapsing the popular paths; top-k is TakeOrderedAndProject. No
per-user event-list materialization (collect_list would hold a whale
user's whole history in one aggregation buffer — lead() never does).
transition_matrix's row-probability window runs over the collapsed
(src, dst) frame — |states|² rows, never event-sized."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["frequent_event_sequences", "state_dwell", "transition_matrix"]


def frequent_event_sequences(
    df: DataFrame,
    n: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(sequence, n_occurrences): top-``k`` length-``n`` consecutive
    event-type paths. See module pins."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    base = df.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    parts = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    seq = F.concat_ws(" > ", *parts)
    # lead() past the user's last event is NULL; concat_ws skips NULLs,
    # so a too-short tail would silently emit a SHORTER sequence —
    # require the last lead to be non-NULL instead
    complete = base.select(
        seq.alias("sequence"), parts[-1].isNotNull().alias("__full")
    ).where(F.col("__full"))
    return (
        complete.groupBy("sequence")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("sequence").asc())
        .limit(k)
    )


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """(src, dst, n, prob): first-order Markov transition counts and
    per-source probabilities over consecutive within-user events.
    See module pins."""
    base = df.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    pairs = base.select(
        F.col(type_col).alias("src"),
        F.lead(type_col, 1).over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    counts = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w_src = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w_src), round_to
        ).alias("prob"),
    )


def state_dwell(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """Time-in-state per event type — each inter-event gap is dwell
    time attributed to the EARLIER event's type ("after clicking, how
    long until the user does anything else"): the duration companion
    of transition_matrix (which counts WHERE users go next, this
    measures HOW LONG they sit first) and the complement of
    interarrival_stats (x94 gaps between events of the SAME type;
    dwell is the gap to the NEXT event of ANY type). Beyond-reference
    analytics scope.

    Pinned semantics (oracle-replicated):

    - same ordering/NULL pins as transition_matrix: per-user
      (ts, tiebreak) order, NULL user/ts/type rows drop, a user's
      last event has no successor and contributes no interval;
    - dwell seconds = epoch(next ts) − epoch(ts) as double (ties on
      ts → 0-second dwell, KEPT: simultaneous events are real;
      excluding them would inflate every average);
    - output per state: (event_type, n_intervals, total_dwell_s,
      avg_dwell_s, max_dwell_s) — totals/avgs rounded ``round_to``
      (6dp default; dwell is second-scale, not raw-money-scale);
    - epoch arithmetic is TIMESTAMP_NTZ-safe (the r11 trap:
      ``unix_timestamp`` raises on NTZ; both sides pin
      seconds-since-epoch extraction).

    Scale shape: ONE window over (user) ordered by (ts, tiebreak) —
    lead(ts) rides the same pass transition_matrix uses — then one
    |states|-sized hash aggregation with map-side partials. Raw
    events shuffle exactly once on the user key."""
    from ai_etl_framework_spark.session import epoch_seconds

    base = df.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    nxt = F.lead(ts_col).over(w)
    gaps = base.select(
        F.col(type_col),
        (epoch_seconds(nxt) - epoch_seconds(F.col(ts_col))).alias("__dwell"),
    ).where(F.col("__dwell").isNotNull())
    return (
        gaps.groupBy(type_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.round(F.sum("__dwell"), round_to).alias("total_dwell_s"),
            F.round(F.avg("__dwell"), round_to).alias("avg_dwell_s"),
            F.round(F.max("__dwell"), round_to).alias("max_dwell_s"),
        )
    )
