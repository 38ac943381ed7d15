"""Cross-table reconciliation — per-key measure comparison between
two tables that SHOULD agree (pre/post-migration snapshots, source
vs warehouse, stream vs batch backfill): the validation every
platform runs after any move. join_audit (operators/audit.py) checks
KEY health; this checks the VALUES. Beyond-reference scope (no
cross-table checks in the reference).

Pinned semantics (oracle-replicated):

``reconcile`` (detail): both sides aggregate ``sum(value), count(*)``
per key (NULL keys dropped — they cannot be matched; NULL values sum
as ANSI sum does), then FULL OUTER join on the key:
(key, sum_a, n_a, sum_b, n_b, delta, status) with
- delta = round(coalesce(sum_a,0) − coalesce(sum_b,0), 6);
- status = 'a_only' / 'b_only' when the other side has no such key,
  else 'match' when delta = 0 AND n_a = n_b (compared on the ROUNDED
  delta — raw float sums differ in the last ulp), else 'mismatch'.

``reconcile_summary``: one row per status with key counts and total
absolute delta (6dp) — the dashboard header number.

Scale shape: two hash aggregations (each side collapses to |keys|
first — the join moves key-sized frames, never raw rows) + one
co-partitioned full outer join on the key + (summary) one hash
aggregation over the key-sized result. AQE plans the join; no
collects."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["reconcile", "reconcile_summary"]


def _side(df: DataFrame, key_cols: list[str], value_col: str, tag: str):
    cond = F.col(key_cols[0]).isNotNull()
    for k in key_cols[1:]:
        cond = cond & F.col(k).isNotNull()
    return (
        df.where(cond)
        .groupBy(*[F.col(k) for k in key_cols])
        .agg(
            F.sum(value_col).alias(f"sum_{tag}"),
            F.count(F.lit(1)).cast("long").alias(f"n_{tag}"),
        )
    )


def reconcile(
    a: DataFrame,
    b: DataFrame,
    key_cols,
    value_col: str,
) -> DataFrame:
    """Per-key detail comparison — module pins."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    key_cols = list(key_cols)
    if not key_cols:
        raise ValueError("reconcile needs at least one key column")
    sa = _side(a, key_cols, value_col, "a")
    sb = _side(b, key_cols, value_col, "b")
    j = sa.join(sb, key_cols, "full_outer")
    delta = F.round(
        F.coalesce(F.col("sum_a"), F.lit(0.0))
        - F.coalesce(F.col("sum_b"), F.lit(0.0)),
        6,
    )
    status = (
        F.when(F.col("n_a").isNull(), F.lit("b_only"))
        .when(F.col("n_b").isNull(), F.lit("a_only"))
        .when((delta == 0) & (F.col("n_a") == F.col("n_b")), F.lit("match"))
        .otherwise(F.lit("mismatch"))
    )
    return j.select(
        *key_cols,
        F.round("sum_a", 6).alias("sum_a"),
        "n_a",
        F.round("sum_b", 6).alias("sum_b"),
        "n_b",
        delta.alias("delta"),
        status.alias("status"),
    )


def reconcile_summary(
    a: DataFrame,
    b: DataFrame,
    key_cols,
    value_col: str,
) -> DataFrame:
    """(status, n_keys, total_abs_delta) — module pins."""
    detail = reconcile(a, b, key_cols, value_col)
    return detail.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.round(F.sum(F.abs(F.coalesce(F.col("delta"), F.lit(0.0)))), 6)
        .alias("total_abs_delta"),
    )
