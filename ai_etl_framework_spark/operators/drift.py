"""Distribution-drift measurement — Population Stability Index (PSI)
between a baseline snapshot and a current one (the standard
model-monitoring / corpus-release gate: PSI < 0.1 stable, 0.1–0.25
moderate shift, > 0.25 investigate). Beyond-reference scope (grep
psi/drift over /root/reference/src: zero hits); the numeric companion
to snapshot_diff (which diffs CONTENT; this diffs DISTRIBUTIONS).

Pinned semantics (oracle-replicated):

- bucket edges = the BASELINE's ``buckets − 1`` interior quantiles
  (linear-interpolation ``percentile`` i/buckets, i = 1..buckets−1;
  ``percentile_approx`` under ``approx=True`` — the exact/approx
  dual), so "drift" is measured against where the baseline's mass
  actually sat;
- bucket(x) = number of edges strictly below x (0..buckets−1) —
  duplicate edges (heavy ties) simply leave empty buckets;
- NULL values are excluded on both sides (no position to compare);
- proportions are floored at ``eps`` (1e-6) before the log — the
  standard PSI guard for empty buckets;
- per-bucket term = (p_cur − p_base) · ln(p_cur / p_base), rounded
  6dp; total PSI = their sum (the caller sums, or reads the
  ``psi_total`` column repeated on every row for one-frame
  convenience).

Scale shape: one scalar-quantile aggregation on the baseline (driver
gets buckets−1 doubles), then each side is one projection + one
|buckets|-sized hash count; the bucket join is dimension-sized. Two
table scans total (baseline is scanned twice — once for edges, once
for its histogram; persist the baseline frame if it is expensive)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["psi_drift"]


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    buckets: int = 10,
    approx: bool = False,
    eps: float = 1e-6,
) -> DataFrame:
    """(bucket, p_base, p_cur, psi_term, psi_total) — see module
    pins. One row per bucket 0..buckets−1 (empty buckets included:
    their proportions are 0 → floored at eps)."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    qs = [i / buckets for i in range(1, buckets)]
    if approx:
        edge_agg = F.percentile_approx(value_col, qs, 10000)
    else:
        edge_agg = F.percentile(value_col, F.array(*[F.lit(q) for q in qs]))
    edges = baseline.agg(edge_agg.alias("e")).collect()[0]["e"]
    if edges is None or any(e is None for e in edges):
        raise ValueError("baseline has no non-NULL values to bucket")

    def hist(df: DataFrame, name: str) -> DataFrame:
        x = F.col(value_col)
        bucket = sum(
            (x > F.lit(float(e))).cast("int") for e in edges
        ).cast("long")
        return (
            df.where(x.isNotNull())
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("double").alias(name))
        )

    spark = baseline.sparkSession
    grid = spark.range(buckets).select(F.col("id").alias("bucket"))
    h = (
        grid.join(hist(baseline, "nb"), "bucket", "left")
        .join(hist(current, "nc"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("nb", F.lit(0.0)).alias("nb"),
            F.coalesce("nc", F.lit(0.0)).alias("nc"),
        )
    )
    tb = F.sum("nb").over(_full())
    tc = F.sum("nc").over(_full())
    p = F.greatest(F.col("nb") / tb, F.lit(eps))
    q = F.greatest(F.col("nc") / tc, F.lit(eps))
    term = F.round((q - p) * F.log(q / p), 6)
    out = h.select(
        "bucket",
        F.round(F.col("nb") / tb, 6).alias("p_base"),
        F.round(F.col("nc") / tc, 6).alias("p_cur"),
        term.alias("psi_term"),
    )
    total = F.round(F.sum("psi_term").over(_full()), 6)
    return out.select("*", total.alias("psi_total"))


def _full():
    from pyspark.sql import Window

    return Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
