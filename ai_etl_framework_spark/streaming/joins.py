"""Interval (time-bounded) joins — batch twin + watermarked
stream-stream form. Beyond-reference scope like the rest of the
streaming surface (the reference has no streaming, SURVEY §2.13);
semantics follow Structured Streaming's published stream-stream join
contract (inner/left-outer with event-time range conditions).

The canonical use is event attribution: match each left event (view)
to the right events (clicks) by key within ``[lower, upper]`` of the
left event time. The SAME builder serves batch and streaming — on
streams, pass ``watermark`` so Spark can bound the join state: the
range condition upper-bounds how long a buffered row can still match,
and the watermark bounds input lateness, so state for rows older than
``watermark + upper`` is evicted (StreamingSymmetricHashJoin).

Scale shape: an EQUI-join on the key with the time bounds as a
residual condition — one exchange per side on the key (never a
cartesian or broadcast-nested-loop; plan-pinned), AQE skew handling
applies, and in streaming the state store holds only the
watermark+interval window per key.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str] = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    how: str = "inner",
    watermark: Optional[str] = None,
    prefixes: tuple[str, str] = ("left_", "right_"),
) -> DataFrame:
    """Join rows with equal ``key`` where ``right_ts`` falls inside
    ``[left_ts + lower, left_ts + upper]`` (both bounds inclusive;
    intervals are Spark interval strings, e.g. ``"10 minutes"``).

    Output columns: the key column(s) bare, then every other left
    column under ``prefixes[0]`` and every other right column under
    ``prefixes[1]`` — deterministic and collision-free even for
    self-joins on one schema.

    ``watermark`` (streaming): applied to BOTH sides' event-time
    columns before the join, as Structured Streaming requires for
    state cleanup on inner joins and for correctness on outer joins.
    ``how`` ∈ {inner, left_outer} — the shapes Structured Streaming
    supports with time-range conditions.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    keys = [key] if isinstance(key, str) else list(key)
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)

    lsel = [F.col(c).alias(c if c in keys else f"{prefixes[0]}{c}") for c in left.columns]
    rsel = [
        F.col(c).alias(f"__rk_{c}" if c in keys else f"{prefixes[1]}{c}")
        for c in right.columns
    ]
    l, r = left.select(*lsel), right.select(*rsel)
    lts, rts = F.col(f"{prefixes[0]}{left_ts}"), F.col(f"{prefixes[1]}{right_ts}")
    cond = (
        (rts >= lts + F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    for k in keys:
        cond = (F.col(k) == F.col(f"__rk_{k}")) & cond
    out = l.join(r, cond, how).drop(*[f"__rk_{k}" for k in keys])
    ordered = keys + [c for c in out.columns if c not in keys]
    return out.select(*ordered)
