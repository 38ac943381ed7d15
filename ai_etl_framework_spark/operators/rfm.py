"""RFM customer segmentation — recency / frequency / monetary
quintile scores plus the classic marketing segment labels
(champion, loyal, promising, needs_attention, at_risk, hibernating):
the standard customer-base health table. Beyond-reference analytics
scope (grep 'rfm\\|recency' over /root/reference/src: zero hits).
RFM: Hughes 1994 (Strategic Database Marketing).

Pinned semantics (oracle-replicated):

- rows with NULL customer/timestamp/amount are dropped; the customer
  frame aggregates recency_days = days(anchor − max ts), frequency =
  row count, monetary = SUM(amount); anchor = the corpus max
  timestamp (pinned so the result is a pure function of the data —
  pass ``anchor`` explicitly for a reporting date);
- scores are SQL NTILE(n_tiles) positions over a DETERMINISTIC total
  order (metric, then customer id): r_score orders recency_days
  DESCENDING (tile n = most recent), f_score/m_score order ascending
  (tile n = most frequent / highest spend) — higher always better;
- segment labels, tuned for n_tiles = 5, from (r, f) only — the
  classic table: r≥4∧f≥4 champion, r=3∧f≥4 loyal, r≥4∧f≤3 promising,
  r=3∧f≤3 needs_attention, r≤2∧f≥3 at_risk, r≤2∧f≤2 hibernating
  (exhaustive: every (r, f) maps to exactly one);
- output is the SEGMENT-LEVEL table, one row per observed (r_score,
  f_score, m_score): segment, n_customers, avg recency/frequency/
  monetary rounded 6dp, total_monetary rounded 2dp (raw-magnitude
  sum — house float rule).

Scale shape: ONE hash aggregation to the per-customer frame, then
NTILE. ``method="window"`` (default) runs the three ntiles in one
single-task window over the CUSTOMER frame — right up to ~10⁷
customers. ``method="distributed"`` replaces each ntile with the
shared two-pass range-partitioned row numbers (operators/ranks.py,
customer-id tiebreak → deterministic) and computes the identical
NTILE positions from (row_number, n) with the exact SQL remainder
rule — three customer-frame range shuffles, no single task. The two
methods are equality-pinned in tests. The final segment table is a
dimension-sized aggregation (≤ n_tiles³ rows)."""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["rfm_segments"]


def _ntile_from_rn(rn, n, k: int):
    """Exact SQL NTILE position from a 1-based ROW_NUMBER ``rn`` and
    total count ``n``: the first n % k tiles hold ⌈n/k⌉ rows, the
    rest ⌊n/k⌋ — both engines' documented remainder rule."""
    q = F.floor(n / k)
    r = n % k
    big = r * (q + 1)
    return F.when(
        rn <= big, F.ceil(rn / (q + 1))
    ).otherwise(r + F.ceil((rn - big) / q)).cast("int")


def rfm_segments(
    df: DataFrame,
    customer_col: str,
    ts_col: str,
    amount_col: str,
    n_tiles: int = 5,
    anchor: _dt.datetime | None = None,
    method: str = "window",
) -> DataFrame:
    """Segment-level RFM table — see module pins. ``method`` ∈
    {window, distributed}."""
    if n_tiles < 2:
        raise ValueError(f"n_tiles must be ≥ 2, got {n_tiles}")
    if method not in ("window", "distributed"):
        raise ValueError(f"method must be window or distributed, got {method!r}")
    base = df.where(
        F.col(customer_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(amount_col).isNotNull()
    )
    if anchor is None:
        anchor = base.agg(F.max(ts_col)).collect()[0][0]  # 1-row scalar
        if anchor is None:
            raise ValueError("rfm_segments: no rows survive the NULL filter")
    cust = base.groupBy(F.col(customer_col).alias("c")).agg(
        F.datediff(F.lit(anchor).cast("timestamp"), F.max(ts_col))
        .cast("long")
        .alias("rec"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(amount_col).alias("mon"),
    )
    if method == "window":
        scored = cust.select(
            "rec",
            "freq",
            "mon",
            F.ntile(n_tiles)
            .over(Window.orderBy(F.col("rec").desc(), F.col("c").asc()))
            .alias("r_score"),
            F.ntile(n_tiles)
            .over(Window.orderBy(F.col("freq").asc(), F.col("c").asc()))
            .alias("f_score"),
            F.ntile(n_tiles)
            .over(Window.orderBy(F.col("mon").asc(), F.col("c").asc()))
            .alias("m_score"),
        )
    else:
        from ai_etl_framework_spark.operators.ranks import group_ranks

        scored = cust.withColumn("__g", F.lit(1))
        for metric, col, flip in (
            ("r_score", "rec", True),
            ("f_score", "freq", False),
            ("m_score", "mon", False),
        ):
            frame = scored.withColumn(
                "__v", -F.col(col) if flip else F.col(col)
            )
            ranked = group_ranks(
                frame, "__g", "__v", tiebreak_cols=("c",)
            )
            scored = ranked.withColumn(
                metric, _ntile_from_rn(F.col("__rn"), F.col("__n"), n_tiles)
            ).drop("__v", "__rank", "__rn", "__n")
        scored = scored.drop("__g")
    r, f = F.col("r_score"), F.col("f_score")
    segment = (
        F.when((r >= 4) & (f >= 4), "champion")
        .when((r == 3) & (f >= 4), "loyal")
        .when((r >= 4) & (f <= 3), "promising")
        .when((r == 3) & (f <= 3), "needs_attention")
        .when((r <= 2) & (f >= 3), "at_risk")
        .otherwise("hibernating")
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.avg("rec").alias("__ar"),
            F.avg("freq").alias("__af"),
            F.avg("mon").alias("__am"),
            F.sum("mon").alias("__tm"),
        )
        .select(
            "r_score",
            "f_score",
            "m_score",
            segment.alias("segment"),
            "n_customers",
            F.round("__ar", 6).alias("avg_recency_days"),
            F.round("__af", 6).alias("avg_frequency"),
            F.round("__am", 6).alias("avg_monetary"),
            F.round("__tm", 2).alias("total_monetary"),
        )
    )
