"""Matched-sample price indexes — Laspeyres / Paasche / Fisher per
period over an item×period panel of unit prices and quantities: the
"is our catalog getting more expensive, holding the basket fixed"
readout revenue dashboards want next to the raw revenue bridge
(x103). Beyond-reference analytics scope (grep
'laspeyres\\|paasche\\|price index' over /root/reference/src: zero
hits). ILO CPI manual ch. 15 for the index formulas.

Pinned semantics (oracle-replicated):

- cells: one (item, period) row with revenue = SUM(price_col),
  qty = SUM(qty_col), unit price p = revenue / qty; input rows where
  item/period/price/qty is NULL or qty <= 0 are dropped, and cells
  with qty <= 0 are dropped (no division degeneracy);
- base period = MIN(period) over the cell frame (a pure function of
  the data) unless ``base_period`` is given;
- MATCHED sample per period t: only items with a cell in BOTH the
  base period and t contribute (the standard matched-items
  convention — entering/exiting items don't fake price moves);
- laspeyres_t = Σ p_t·q_0 / Σ p_0·q_0 (base-weighted),
  paasche_t = Σ p_t·q_t / Σ p_0·q_t (current-weighted),
  fisher_t = √(laspeyres_t · paasche_t); the base period reports
  exactly 1.0 for all three;
- output per period: (period, n_matched_items, laspeyres, paasche,
  fisher) rounded 6dp (ratios — scale-free, house float rule).

Scale shape: ONE hash aggregation to the item×period cell frame
(map-side partials collapse the row scale), a join of the cell frame
to the base-period slice co-partitioned on item (AQE broadcasts the
base slice when small — one period's items), then ONE period-level
aggregation. No window, nothing row-scale past the first agg."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["price_index"]


def price_index(
    df: DataFrame,
    item_col: str,
    period: Column,
    price_col: str,
    qty_col: str,
    base_period: Optional[Column] = None,
) -> DataFrame:
    """(period, n_matched_items, laspeyres, paasche, fisher) — see
    module pins. ``period`` is any expression (e.g.
    ``F.date_trunc('month', F.col('l_shipdate'))``)."""
    rows = df.select(
        F.col(item_col).alias("item"),
        period.alias("period"),
        F.col(price_col).alias("rev"),
        F.col(qty_col).alias("qty"),
    ).where(
        F.col("item").isNotNull()
        & F.col("period").isNotNull()
        & F.col("rev").isNotNull()
        & F.col("qty").isNotNull()
        & (F.col("qty") > 0)
    )
    cells = (
        rows.groupBy("item", "period")
        .agg(F.sum("rev").alias("rev"), F.sum("qty").alias("q"))
        .where(F.col("q") > 0)
        .select("item", "period", (F.col("rev") / F.col("q")).alias("p"), "q")
    )
    if base_period is None:
        base_period = cells.agg(F.min("period")).first()[0]
        base = cells.where(F.col("period") == F.lit(base_period))
    else:
        base = cells.where(F.col("period") == base_period)
    base = base.select(
        "item", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    matched = cells.join(base, "item")
    return (
        matched.groupBy("period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched_items"),
            F.round(
                F.sum(F.col("p") * F.col("q0"))
                / F.sum(F.col("p0") * F.col("q0")),
                6,
            ).alias("laspeyres"),
            F.round(
                F.sum(F.col("p") * F.col("q"))
                / F.sum(F.col("p0") * F.col("q")),
                6,
            ).alias("paasche"),
            F.round(
                F.sqrt(
                    (
                        F.sum(F.col("p") * F.col("q0"))
                        / F.sum(F.col("p0") * F.col("q0"))
                    )
                    * (
                        F.sum(F.col("p") * F.col("q"))
                        / F.sum(F.col("p0") * F.col("q"))
                    )
                ),
                6,
            ).alias("fisher"),
        )
    )
