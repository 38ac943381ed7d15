"""Group-statistic NULL imputation — fill missing numerics with their
group's mean/median/mode, falling back to the global statistic for
groups with no observed values (the standard feature-engineering step
before model fitting; pandas ``fillna(df.groupby(g)[c].transform(...))``
at corpus scale). Complements the reference's NullRemover ``fill``
(constant fill, transformer.py:200-233) with data-derived fills — a
beyond-reference operator (grep impute/fillna over /root/reference/src:
zero hits).

Pinned semantics (oracle-replicated):

- ``mean``   — AVG of non-NULL group values;
- ``median`` — linear-interpolation percentile 0.5 (≡ DuckDB
  ``quantile_cont``), ``percentile_approx`` under ``approx=True``
  (the winsorize/IQR exact-approx dual);
- ``mode``   — most frequent non-NULL value, ties broken by the
  SMALLEST value (deterministic — SQL ``mode()`` leaves ties
  undefined, so the oracle replays the count-ranking instead);
- a NULL group key is its own group (groupBy keeps it);
- groups with zero observed values fall back to the GLOBAL statistic
  (same strategy); an all-NULL column stays NULL (nothing to derive);
- non-NULL values pass through bit-identical, and the filled column
  keeps the input column's type for mode (the values come from the
  data); mean/median fills emit DOUBLE (derived statistics).

Scale shape: one hash aggregation to a |groups|-sized statistics
frame (mode adds one (group, value) pre-aggregation first — two
shuffles of counts, never raw rows), joined back WITHOUT a mandatory
broadcast hint (group cardinality is data-dependent; AQE broadcasts
from measured size — the tfidf r8 lesson), then a pure-projection
coalesce inside codegen."""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["impute_by_group"]


def impute_by_group(
    df: DataFrame,
    value_col: str,
    group_cols: Optional[Sequence[str]] = None,
    strategy: str = "mean",
    approx: bool = False,
    suffix: str = "",
) -> DataFrame:
    """Fill NULLs in ``value_col`` with the group statistic (global
    statistic when ``group_cols`` is None/empty or the group has no
    observed values). With ``suffix`` the filled values land in a new
    column; otherwise the column is replaced in place."""
    if strategy not in ("mean", "median", "mode"):
        raise ValueError(
            f"strategy must be mean, median or mode, got {strategy!r}"
        )
    groups = list(group_cols or [])
    out_col = value_col + suffix

    def stat_agg(c: str):
        if strategy == "mean":
            return F.avg(c)
        if strategy == "median":
            if approx:
                return F.percentile_approx(c, 0.5, 10000)
            return F.percentile(c, F.lit(0.5))
        raise AssertionError  # mode handled separately

    if strategy == "mode":
        observed = df.where(F.col(value_col).isNotNull())
        counts = observed.groupBy(*groups, value_col).agg(
            F.count(F.lit(1)).alias("__c")
        )
        if groups:
            w = Window.partitionBy(*groups).orderBy(
                F.col("__c").desc(), F.col(value_col).asc()
            )
            stats = (
                counts.withColumn("__rk", F.row_number().over(w))
                .where(F.col("__rk") == 1)
                .select(*groups, F.col(value_col).alias("__fill"))
            )
        else:
            stats = (
                counts.orderBy(F.col("__c").desc(), F.col(value_col).asc())
                .limit(1)
                .select(F.col(value_col).alias("__fill"))
            )
        # global fallback: the corpus-wide mode (one tiny scalar)
        g_row = (
            observed.groupBy(value_col)
            .agg(F.count(F.lit(1)).alias("__c"))
            .orderBy(F.col("__c").desc(), F.col(value_col).asc())
            .limit(1)
            .collect()
        )
        g_fill = g_row[0][0] if g_row else None
    else:
        if groups:
            stats = df.groupBy(*groups).agg(
                stat_agg(value_col).alias("__fill")
            )
        else:
            stats = df.groupBy().agg(stat_agg(value_col).alias("__fill"))
        g_row = df.agg(stat_agg(value_col).alias("g")).collect()
        g_fill = g_row[0]["g"] if g_row else None

    fill_type = (
        df.schema[value_col].dataType.simpleString()
        if strategy == "mode"
        else "double"
    )
    if groups:
        # NULL-SAFE equality on the group keys: a NULL group is its
        # own group (the docstring pin) — a plain equi-join would
        # silently kick NULL-keyed rows to the global fallback
        renamed = stats.select(
            *[F.col(g).alias(f"__g{i}") for i, g in enumerate(groups)],
            "__fill",
        )
        cond = None
        for i, g in enumerate(groups):
            c = df[g].eqNullSafe(renamed[f"__g{i}"])
            cond = c if cond is None else (cond & c)
        joined = df.join(renamed, cond, "left").drop(
            *[f"__g{i}" for i in range(len(groups))]
        )
    elif strategy == "mode" and not stats.take(1):
        # all-NULL column: no mode exists anywhere
        joined = df.withColumn("__fill", F.lit(None).cast(fill_type))
    else:
        # single-row statistics frame: a broadcast here is bounded by
        # construction (groupBy().agg() always emits exactly one row)
        joined = df.crossJoin(F.broadcast(stats.limit(1)))
    filled = F.coalesce(
        F.col(value_col).cast(fill_type),
        F.col("__fill").cast(fill_type),
        F.lit(g_fill).cast(fill_type),
    )
    return joined.withColumn(out_col, filled).drop("__fill")
