"""Rolling active users — the DAU/WAU/MAU curve: for every calendar
day, how many distinct users were active in the trailing ``window``
days. The naive form is COUNT(DISTINCT user) OVER a RANGE window —
which no engine executes without either a per-day re-scan or holding
per-window distinct sets; at corpus scale both are walls. This
operator computes the SAME numbers with the classic sweep-line
rewrite, in three dimension-bounded steps. Beyond-reference analytics
scope (grep 'active user\\|dau\\|wau' over /root/reference/src: zero
hits).

Pinned semantics (oracle-replicated — the oracle runs the NAIVE
per-day distinct count, so the rewrite is verified against the
definition, not against itself):

- a user is active on day d if they have ≥1 event with
  ``to_date(ts) = d``; NULL user/ts rows drop;
- active(d) = |{users with an active day in [d − window + 1, d]}|;
- output = (day, active_users) for EVERY day in [min active day,
  max active day] (gaps included, possibly 0).

The rewrite: each active day covers [d, d + window − 1]; per user,
consecutive active days with gaps ≤ window − 1 merge into coverage
ISLANDS (one lag + cumulative-flag window — coverage ends are
monotone in d, so the running-max island test degenerates to a
prev-day compare); each island emits +1 at its start and −1 one day
after its end; active(d) = running sum of deltas over the day spine.

Scale shape: ONE distinct (user, day) aggregation (events shuffle
once on the user key), ONE per-user window (lag + cumsum), one
island aggregation on the same partitioning, then ALL remaining
frames are day-spine-sized (two delta rows per island, one
|days| cumulative window — the pareto regime). No distinct-set
state, no per-day re-scan, no w× row blow-up (the explode emits 2
rows per island, not ``window`` rows per active day)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "rolling_active_users",
    "rolling_active_from_days",
    "stickiness",
    "activity_streaks",
    "new_returning_users",
    "new_returning_from_days",
]


def rolling_active_users(
    df: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(day, active_users) per day of the observed span — trailing
    ``window_days`` distinct-user counts via the sweep-line rewrite.
    See module pins."""
    days = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("u"), F.to_date(ts_col).alias("d")
        )
        .distinct()
    )
    return rolling_active_from_days(days, window_days)


def rolling_active_from_days(
    days: DataFrame,
    window_days: int = 7,
) -> DataFrame:
    """The sweep-line core over an already-distinct (u, d DATE) frame
    — the seam the incremental monitor's persisted activity store
    feeds directly (pipeline/monitor.py IncrementalActiveUsers)."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    w = window_days
    wu = Window.partitionBy("u").orderBy("d")
    prev = F.lag("d").over(wu)
    brk = F.when(
        prev.isNull() | (F.datediff(F.col("d"), prev) > w - 1), 1
    ).otherwise(0)
    islands = (
        days.withColumn("__brk", brk)
        .withColumn(
            "__isl",
            F.sum("__brk").over(
                wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("u", "__isl")
        .agg(
            F.min("d").alias("__start"),
            F.date_add(F.max("d"), w - 1).alias("__end"),
        )
    )
    deltas = islands.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("__start").alias("day"),
                    F.lit(1).alias("delta"),
                ),
                F.struct(
                    F.date_add(F.col("__end"), 1).alias("day"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("__e")
    ).select(
        F.col("__e.day").alias("day"), F.col("__e.delta").alias("delta")
    )
    per_day = deltas.groupBy("day").agg(F.sum("delta").alias("delta"))
    spine = (
        days.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day")
        )
    )
    w_cum = Window.partitionBy().orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(per_day, "day", "left")
        .select(
            "day",
            F.sum(F.coalesce("delta", F.lit(0)))
            .over(w_cum)
            .cast("long")
            .alias("active_users"),
        )
    )


def stickiness(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    short_days: int = 1,
    long_days: int = 7,
) -> DataFrame:
    """Stickiness curve — short-window actives / long-window actives
    per day (classically DAU/MAU; DAU/WAU here by default to fit a
    month of data): the "how much of my audience shows up daily"
    ratio product teams track. Two sweep-line rolling-active passes
    over the SAME distinct (user, day) frame + one day-spine join.

    Pinned semantics (oracle-replicated — both counts verified
    against the naive per-day COUNT DISTINCT definition):
    - active_short(d) / active_long(d) exactly as
      rolling_active_users with window short_days / long_days;
    - one row per day of the observed span: (day, active_short,
      active_long, stickiness) with stickiness = short/long rounded
      6dp, NULL when the long count is 0 (empty span days);
    - short_days must be < long_days (fail loud).

    Scale shape: the distinct (user, day) aggregation runs ONCE
    (persisted across both passes); everything after is day-spine-
    sized (the rolling_active_from_days shape twice + one spine
    join)."""
    if short_days >= long_days:
        raise ValueError(
            f"short_days ({short_days}) must be < long_days ({long_days})"
        )
    days = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("u"), F.to_date(ts_col).alias("d"))
        .distinct()
        .persist()
    )
    try:
        s = rolling_active_from_days(days, short_days).select(
            "day", F.col("active_users").alias("active_short")
        )
        lo = rolling_active_from_days(days, long_days).select(
            "day", F.col("active_users").alias("active_long")
        )
        out = s.join(lo, "day").select(
            "day",
            "active_short",
            "active_long",
            F.round(
                F.when(
                    F.col("active_long") > 0,
                    F.col("active_short")
                    / F.col("active_long").cast("double"),
                ),
                6,
            ).alias("stickiness"),
        )
        # materialize before unpersist so both passes read the cache
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        days.unpersist()


def activity_streaks(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user consecutive-day activity streaks — the classic
    gaps-and-islands decomposition (longest run of adjacent active
    calendar days), the engagement metric every habit/retention
    dashboard reports next to stickiness. Beyond-reference analytics
    scope (grep 'streak\\|consecutive day' over /root/reference/src:
    zero hits).

    Pinned semantics (oracle-replicated):

    - a user is active on day d if they have ≥ 1 event with
      ``to_date(ts) = d``; NULL user/ts rows drop;
    - a STREAK is a maximal run of consecutive active days (gap of
      exactly 1 day extends, anything larger breaks) — the standard
      islands construction: island id = day − row_number() over the
      per-user day order (constant within a run, distinct across
      runs);
    - output per user: n_active_days, n_streaks, longest_streak
      (days), longest_streak_end (the LAST day of the longest
      streak; ties on length → the LATEST such streak — max over the
      (len, end) struct), current_streak_end (the last active day).

    Scale shape: ONE distinct (user, day) aggregation (map-side
    partials collapse repeat events), ONE per-user window
    (row_number over the day order — the same user-key partitioning
    the distinct produced, AQE reuses the exchange), one island
    aggregation, one per-user aggregation. Everything past the first
    agg is active-day-scale, not event-scale; no join, no explode."""
    days = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("user"),
            F.to_date(ts_col).alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("user").orderBy("day")
    islands = days.withColumn(
        "island", F.datediff("day", F.lit("1970-01-01")) - F.row_number().over(w)
    )
    streaks = islands.groupBy("user", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.max("day").alias("end_day"),
    )
    return streaks.groupBy("user").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
        F.max(F.struct("len", "end_day"))["end_day"].alias(
            "longest_streak_end"
        ),
        F.max("end_day").alias("current_streak_end"),
    )


def new_returning_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """New-vs-returning decomposition of daily actives — per day, how
    many active users are appearing for the FIRST time vs coming
    back: the growth-accounting split every DAU chart needs (flat DAU
    can be healthy retention or churn masked by acquisition — this
    tells them apart). The user-level twin of vocab_novelty's
    first-seen decomposition. Beyond-reference analytics scope (grep
    'returning' over /root/reference/src: zero hits).

    Pinned semantics (oracle-replicated):

    - a user is active on day d if they have ≥ 1 event with
      to_date(ts) = d; NULL user/ts rows drop;
    - first_seen(user) = the user's minimum active day; n_new on day
      d counts users with first_seen = d; n_returning = n_active −
      n_new; pct_new = n_new / n_active 6dp;
    - cum_users = running Σ n_new in day order (= the distinct user
      base through that day, by construction);
    - only days with ≥ 1 active user emit rows.

    Scale shape: ONE distinct (user, day) aggregation, one user-sized
    min() aggregation, a user-dimension join, one day-level agg and
    one cumulative window over the DAY frame (calendar-sized) — the
    vocab_novelty shape verbatim, with users for terms."""
    pairs = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("u"), F.to_date(ts_col).alias("day")
        )
        .distinct()
    )
    return new_returning_from_days(pairs)


def new_returning_from_days(pairs: DataFrame) -> DataFrame:
    """The first-seen decomposition core over an already-distinct
    (u, day DATE) frame — the seam the incremental activity store
    feeds directly (pipeline/monitor.py IncrementalActiveUsers
    .new_returning(): ONE persisted store, two readouts — the
    rolling_active_from_days pattern). Same output contract as
    :func:`new_returning_users`."""
    first_seen = pairs.groupBy("u").agg(F.min("day").alias("fs"))
    per_day = (
        pairs.join(first_seen, "u")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum(F.when(F.col("day") == F.col("fs"), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
        )
    )
    w_cum = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        "day",
        "n_active",
        "n_new",
        (F.col("n_active") - F.col("n_new")).cast("long").alias("n_returning"),
        F.round(F.col("n_new") / F.col("n_active").cast("double"), 6).alias(
            "pct_new"
        ),
        F.sum("n_new").over(w_cum).cast("long").alias("cum_users"),
    )
