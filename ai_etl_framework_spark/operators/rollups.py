"""Dashboard rollups with column auto-detection by name substring.

Reference: src/transformers/exporters/dashboard_aggregator.py:17-349.

Auto-detection (`_find_column`, ref :64-79) is FIRST-PATTERN,
FIRST-COLUMN wins — outer loop over patterns, inner over columns,
case-insensitive substring — preserved verbatim including the exact
pattern lists (ref :130, :168, :174-175, :229, :278).

The four rollups (all single group-by jobs; the reference buffered
every record in driver memory — here nothing materializes):

- claims_summary      1 row: count, sum/mean/min/max of amount col,
                      mean quality, anomaly count+rate (ref :126-162)
- claims_by_provider  groupby provider: count(claim_col) + amount
                      stats + left-join mean quality, sort
                      total_billed desc (ref :164-223)
- claims_by_diagnosis groupby dx: count + sum/mean, sort count desc
                      (ref :225-272)
- claims_by_date      to_date with coercion (invalid → NULL →
                      dropped), groupby day: count + sum/mean, sort
                      date asc (ref :274-334)

Note: pandas ``count`` counts NON-NULL values of the claim column —
F.count(col), not COUNT(*).

Money sums run over DECIMAL(20,4): a decimal sum is exact and
association-independent, so the result is identical no matter how
partitions are combined — at 100 TB a raw double sum drifts with the
merge tree (and disagrees with any reference engine at rounding
boundaries). The exposed columns stay DOUBLE for API compatibility.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AMOUNT_PATTERNS_SUMMARY = ["billed", "amount", "charged", "cost", "price", "payment"]
AMOUNT_PATTERNS = ["billed", "amount", "charged", "cost", "price"]
PROVIDER_PATTERNS = ["prov", "provider", "doctor", "physician", "practitioner"]
DIAGNOSIS_PATTERNS = ["dx", "diagnosis", "condition", "icd", "disease"]
DATE_PATTERNS = ["service", "date", "admission", "claim", "received"]
CLAIM_PATTERNS = ["claim", "id", "number"]


def find_column(columns: Sequence[str], patterns: Sequence[str]) -> Optional[str]:
    """First-pattern, first-column wins (ref :64-79)."""
    for pattern in patterns:
        for col in columns:
            if pattern.lower() in col.lower():
                return col
    return None


class DashboardAggregator:
    """Compute the 4 rollups; ``write(output_dir)`` persists them as
    snappy parquet like the reference, or use the ``summary()`` /
    ``by_provider()`` / ``by_diagnosis()`` / ``by_date()`` DataFrames
    directly."""

    def __init__(self, df: DataFrame) -> None:
        self.df = df
        self.cols = df.columns

    def summary(self) -> DataFrame:
        amount = find_column(self.cols, AMOUNT_PATTERNS_SUMMARY)
        aggs = [F.count(F.lit(1)).alias("total_claims")]
        if amount:
            c = F.col(amount)
            dec = c.cast("decimal(20,4)")  # exact money sum (see module doc)
            sum_dec = F.sum(dec)
            aggs += [
                sum_dec.cast("double").alias("total_billed"),
                (sum_dec.cast("double") / F.count(dec)).alias("avg_billed"),
                F.min(c).alias("min_billed"),
                F.max(c).alias("max_billed"),
            ]
        if "_meta_quality_score" in self.cols:
            aggs.append(F.avg("_meta_quality_score").alias("avg_quality_score"))
        if "_meta_is_anomaly" in self.cols:
            flag = F.col("_meta_is_anomaly").cast("int")
            aggs += [F.sum(flag).alias("anomaly_count"), F.avg(flag).alias("anomaly_rate")]
        return self.df.agg(*aggs)

    def _grouped(self, group_col: str, amount: Optional[str], full_stats: bool) -> DataFrame:
        claim = find_column(self.cols, CLAIM_PATTERNS) or group_col
        aggs = [F.count(F.col(claim)).alias("total_claims")]  # non-null count (pandas 'count')
        if amount:
            c = F.col(amount)
            dec = c.cast("decimal(20,4)")  # exact money sum (see module doc)
            sum_dec = F.sum(dec)
            aggs += [
                sum_dec.cast("double").alias("total_billed"),
                (sum_dec.cast("double") / F.count(dec)).alias("avg_billed"),
            ]
            if full_stats:
                aggs += [F.min(c).alias("min_billed"), F.max(c).alias("max_billed")]
        return self.df.groupBy(group_col).agg(*aggs)

    def by_provider(self) -> DataFrame:
        provider = find_column(self.cols, PROVIDER_PATTERNS)
        if not provider:
            raise ValueError("no provider column found")
        out = self._grouped(provider, find_column(self.cols, AMOUNT_PATTERNS), full_stats=True)
        if "_meta_quality_score" in self.cols:
            quality = self.df.groupBy(F.col(provider).alias("__qk")).agg(
                F.avg("_meta_quality_score").alias("avg_quality_score")
            )
            # null-safe join key: a NULL provider group must keep its
            # quality average (plain equality never matches NULL, while
            # the oracle computes the average inline in the same GROUP
            # BY). ref pd.merge how='left' :203-210 — pandas merge also
            # matches NaN keys to NaN.
            out = out.join(
                quality, on=F.col(provider).eqNullSafe(F.col("__qk")), how="left"
            ).drop("__qk")
        if "total_billed" in out.columns:
            out = out.orderBy(F.col("total_billed").desc())
        return out

    def by_diagnosis(self) -> DataFrame:
        dx = find_column(self.cols, DIAGNOSIS_PATTERNS)
        if not dx:
            raise ValueError("no diagnosis column found")
        out = self._grouped(dx, find_column(self.cols, AMOUNT_PATTERNS), full_stats=False)
        return out.orderBy(F.col("total_claims").desc())

    def by_date(self) -> DataFrame:
        date_col = find_column(self.cols, DATE_PATTERNS)
        if not date_col:
            raise ValueError("no date column found")
        amount = find_column(self.cols, AMOUNT_PATTERNS)
        claim = find_column(self.cols, CLAIM_PATTERNS) or date_col
        # to_date returns NULL on unparseable input ≡ errors='coerce'
        work = self.df.withColumn("date", F.to_date(F.col(date_col))).na.drop(subset=["date"])
        aggs = [F.count(F.col(claim)).alias("total_claims")]
        if amount:
            c = F.col(amount)
            dec = c.cast("decimal(20,4)")  # exact money sum (see module doc)
            sum_dec = F.sum(dec)
            # same exact-DECIMAL contract as summary()/_grouped(): q13's
            # _money_exprs recovers the integer 1e-4-unit sum from
            # total_billed, which is only association-independent when
            # the sum is decimal, not a reorder-sensitive double SUM
            aggs += [
                sum_dec.cast("double").alias("total_billed"),
                (sum_dec.cast("double") / F.count(dec)).alias("avg_billed"),
            ]
        out = work.groupBy("date").agg(*aggs)
        # Result-sized sort: the by-date rollup has one row per DAY
        # (bounded by the calendar — tens of thousands of rows even at
        # 100 TB of input), so a global orderBy's range-boundary
        # SAMPLING JOB is pure overhead — the fully-reduced result is
        # always single-task-sortable. repartition(1) (not coalesce,
        # which would fuse the FINAL aggregation into one task and
        # break down once partial rows = map-tasks × days) keeps the
        # reduction parallel and moves only #days rows to the sorting
        # task. by_provider/by_diagnosis keep the distributed sort —
        # their group counts scale with the dimension, not the
        # calendar.
        return out.repartition(1).sortWithinPartitions(F.col("date").asc())

    def write(self, output_dir: str) -> None:
        import os

        jobs = {
            "claims_summary": self.summary,
            "claims_by_provider": self.by_provider,
            "claims_by_diagnosis": self.by_diagnosis,
            "claims_by_date": self.by_date,
        }
        self.df.cache()  # 4 rollups over one scan of the cached input
        try:
            for name, fn in jobs.items():
                try:
                    fn().write.mode("overwrite").option("compression", "snappy").parquet(
                        os.path.join(output_dir, name)
                    )
                except ValueError:
                    continue  # missing detection column → skip (ref logs + skips)
        finally:
            self.df.unpersist()


def dimensional_rollup(
    df: DataFrame,
    dims,
    measure_col: str,
) -> DataFrame:
    """Multi-level ROLLUP totals — one pass producing the measure at
    EVERY dimension prefix level (d1×d2 cells, d1 subtotals, the
    grand total): the OLAP subtotal table the reference's fixed
    rollup views (claims_by_*) special-case one level of. Spark plans
    ROLLUP as a single Expand + one hash aggregation — one shuffle
    for all levels, not one query per level.

    Pinned semantics (oracle-replicated):
    - rows with NULL in any dim or the measure are DROPPED first —
      so in the output a rolled-up position is unambiguous and gets
      the label '(all)' (the grouping() disambiguation trick);
    - output: (dims… as strings, level, n_rows, total, avg_value) —
      level = the grouping bit-vector (0 = finest cells, 2^|dims|−1 =
      grand total; computed as Σ grouping(dᵢ)·2^(|dims|−1−i) in BOTH
      engines), total 2dp (raw-magnitude sum), avg 6dp.

    Scale shape: ONE Expand(|dims|+1 replicas) + ONE hash aggregation
    with map-side partials — the planner's native ROLLUP. Output is
    Σ level cardinalities (dimension-bounded)."""
    if isinstance(dims, str):
        dims = [dims]
    if not dims:
        raise ValueError("dimensional_rollup needs at least one dim")
    base = df.where(F.col(measure_col).isNotNull())
    for d in dims:
        base = base.where(F.col(d).isNotNull())
    level = None
    for i, d in enumerate(dims):
        term = F.grouping(d).cast("int") * (2 ** (len(dims) - 1 - i))
        level = term if level is None else level + term
    agg = base.rollup(*dims).agg(
        level.alias("level"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum(measure_col), 2).alias("total"),
        F.round(F.avg(measure_col), 6).alias("avg_value"),
    )
    out_dims = [
        F.when(F.col("level").bitwiseAND(2 ** (len(dims) - 1 - i)) > 0, "(all)")
        .otherwise(F.col(d).cast("string"))
        .alias(d)
        for i, d in enumerate(dims)
    ]
    return agg.select(*out_dims, "level", "n_rows", "total", "avg_value")
