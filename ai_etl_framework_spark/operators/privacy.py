"""k-anonymity / l-diversity audit — the privacy risk screen a
training-data pipeline runs before releasing or joining a table:
how many rows sit in quasi-identifier equivalence classes smaller
than k (re-identifiable), and how little diversity the sensitive
column has inside each class (attribute-disclosure risk). Beyond-
reference analytics scope (grep 'anonym\\|k-anon\\|l-div' over
/root/reference/src: zero hits). Sweeney 2002 (k-anonymity);
Machanavajjhala et al. 2007 (l-diversity).

Pinned semantics (oracle-replicated):

- an equivalence class is one distinct tuple of ``quasi_cols``
  values; NULL is a class value like any other (two rows with NULL
  region are in the same class — NULL-safe grouping on both
  engines);
- a class VIOLATES k-anonymity when its row count < k; a row is "at
  risk" when it lives in a violating class;
- l-diversity (only when ``sensitive_col`` is given) counts DISTINCT
  non-NULL sensitive values per class; ``min_l_diversity`` is the
  minimum over classes that have ≥ 1 non-NULL sensitive value —
  classes whose sensitive column is entirely NULL are reported in
  ``n_classes_all_null_sensitive`` instead of polluting the min
  with 0;
- output is ONE summary row: n_rows, n_classes, min_class_size,
  n_classes_lt_k, n_rows_at_risk, risk_pct (6dp, n_rows_at_risk /
  n_rows), and the two l-diversity fields (NULL when no
  sensitive_col);
- ``violations`` returns the per-class detail instead (quasi values,
  class_size, l_diversity), capped fail-loud at ``max_violations``
  rows — at 100 TB the violating-class list itself can be huge, and
  an uncapped detail pull is a driver bomb; raise the cap or
  aggregate (the summary) instead.

Scale shape: ONE hash aggregation on the quasi tuple (map-side
partials collapse repeated tuples), then a 1-row reduce for the
summary — no window, no join, no second scan. count_distinct of the
sensitive column rides the same aggregation (exact, per class —
class-bounded state). The violations detail adds one
WindowGroupLimit-free ORDER BY ... LIMIT, bounded by
``max_violations``."""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["k_anonymity_audit", "k_anonymity_violations"]


def _class_frame(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: Optional[str],
) -> DataFrame:
    if not quasi_cols:
        raise ValueError("k_anonymity: quasi_cols must be non-empty")
    aggs = [F.count(F.lit(1)).cast("long").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col))
            .cast("long")
            .alias("l_diversity")
        )
    return df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: Optional[str] = None,
) -> DataFrame:
    """One summary row — see module pins."""
    if k < 2:
        raise ValueError(f"k_anonymity: k must be >= 2, got {k}")
    cls = _class_frame(df, quasi_cols, sensitive_col)
    n_rows = F.sum("class_size")
    at_risk = F.sum(
        F.when(F.col("class_size") < k, F.col("class_size")).otherwise(
            F.lit(0)
        )
    )
    aggs = [
        n_rows.cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("class_size").cast("long").alias("min_class_size"),
        F.sum(
            F.when(F.col("class_size") < k, 1).otherwise(0)
        ).cast("long").alias("n_classes_lt_k"),
        at_risk.cast("long").alias("n_rows_at_risk"),
        F.round(at_risk / n_rows, 6).alias("risk_pct"),
    ]
    if sensitive_col is not None:
        aggs.append(
            F.min(
                F.when(F.col("l_diversity") > 0, F.col("l_diversity"))
            ).cast("long").alias("min_l_diversity")
        )
        aggs.append(
            F.sum(
                F.when(F.col("l_diversity") == 0, 1).otherwise(0)
            ).cast("long").alias("n_classes_all_null_sensitive")
        )
    else:
        aggs.append(F.lit(None).cast("long").alias("min_l_diversity"))
        aggs.append(
            F.lit(None).cast("long").alias("n_classes_all_null_sensitive")
        )
    return cls.agg(*aggs)


def k_anonymity_violations(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: Optional[str] = None,
    max_violations: int = 10_000,
) -> DataFrame:
    """Per-violating-class detail (quasi values, class_size,
    l_diversity), smallest classes first (class_size asc, then quasi
    values asc for a total order). Fails loud past ``max_violations``
    — see module pins."""
    if k < 2:
        raise ValueError(f"k_anonymity: k must be >= 2, got {k}")
    if max_violations < 1:
        raise ValueError(
            f"k_anonymity: max_violations must be >= 1, got {max_violations}"
        )
    cls = _class_frame(df, quasi_cols, sensitive_col)
    if sensitive_col is None:
        cls = cls.withColumn("l_diversity", F.lit(None).cast("long"))
    bad = cls.where(F.col("class_size") < k)
    n_bad = bad.count()  # 1-row scalar, not a data pull
    if n_bad > max_violations:
        raise ValueError(
            f"k_anonymity_violations: {n_bad} violating classes exceed "
            f"max_violations={max_violations}; raise the cap or use "
            "k_anonymity_audit (the aggregate summary) instead"
        )
    order = [F.col("class_size").asc()] + [
        F.col(c).asc_nulls_last() for c in quasi_cols
    ]
    return bad.orderBy(*order)
