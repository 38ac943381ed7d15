"""Experiment analysis — per-(experiment, variant) Welch two-sample
comparison against a named control variant: the readout table every
A/B platform computes. Closed-form SQL arithmetic end to end (counts,
means, sample variances, Welch t statistic and Satterthwaite degrees
of freedom), so the whole readout is one aggregation + one broadcast
join — no Python in the loop and a full DuckDB oracle twin.
Beyond-reference scope (grep 'welch\\|ab_test\\|t_test' over
/root/reference/src: zero hits). Standard formulas: Welch (1947);
see also any stats text — t = (m_v − m_c) / sqrt(s_v²/n_v + s_c²/n_c),
df = (s_v²/n_v + s_c²/n_c)² / ((s_v²/n_v)²/(n_v−1) + (s_c²/n_c)²/(n_c−1)).

Pinned semantics (oracle-replicated):

- one output row per (experiment, variant ≠ control) where BOTH arms
  have ≥2 non-NULL observations and positive variance denominator:
  (experiment, variant, n_control, n_variant, mean_control,
  mean_variant, lift, t_stat, dof, significant);
- variances are SAMPLE variances (var_samp ≡ DuckDB var_samp);
- lift = mean_variant − mean_control (absolute, not relative — the
  relative form divides by a mean that can be 0);
- significant = |t| > z_crit (default 1.96 ≈ two-sided 5% on the
  normal approximation; callers needing exact small-sample t
  quantiles feed dof to their stats library — quantile functions are
  deliberately out of scope so the oracle stays closed-form);
- arms with zero pooled standard error (both variances 0) yield NULL
  t_stat/dof and significant NULL (no evidence of noise ⇒ the test
  statistic is undefined, not infinite);
- means/lift/t/dof rounded 6dp; NULL values dropped per arm.

Scale shape: ONE hash aggregation over (experiment, variant) — counts
and moments lower to map-side partials — then a broadcast self-join
of the experiment-count-sized arm table against its control rows.
Nothing row-scale crosses the network after the first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["ab_test"]


def ab_test(
    df: DataFrame,
    experiment_col: str,
    variant_col: str,
    value_col: str,
    control: str,
    z_crit: float = 1.96,
) -> DataFrame:
    """Welch readout per (experiment, variant vs control) — module
    pins."""
    if z_crit <= 0:
        raise ValueError(f"z_crit must be > 0, got {z_crit}")
    base = df.where(
        F.col(experiment_col).isNotNull()
        & F.col(variant_col).isNotNull()
        & F.col(value_col).isNotNull()
    )
    arms = base.groupBy(experiment_col, variant_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(value_col).alias("m"),
        F.var_samp(value_col).alias("s2"),
    )
    ctrl = arms.where(F.col(variant_col) == control).select(
        F.col(experiment_col).alias("__exp"),
        F.col("n").alias("n_control"),
        F.col("m").alias("m_c"),
        F.col("s2").alias("s2_c"),
    )
    var = arms.where(F.col(variant_col) != control)
    j = var.join(
        F.broadcast(ctrl), var[experiment_col] == ctrl["__exp"]
    ).where((F.col("n") >= 2) & (F.col("n_control") >= 2))
    se2 = F.col("s2") / F.col("n") + F.col("s2_c") / F.col("n_control")
    t = (F.col("m") - F.col("m_c")) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (F.col("s2") / F.col("n")) * (F.col("s2") / F.col("n"))
        / (F.col("n") - 1)
        + (F.col("s2_c") / F.col("n_control"))
        * (F.col("s2_c") / F.col("n_control"))
        / (F.col("n_control") - 1)
    )
    zero_se = F.col("s2") + F.col("s2_c") == 0
    t_out = F.when(~zero_se, F.round(t, 6))
    # significance compares the 6dp-ROUNDED statistic (house rule:
    # engine-computed float aggregates differ in the last ulp across
    # engines; a raw-float boundary compare flips one row per ~1e5)
    return j.select(
        F.col(experiment_col).alias("experiment"),
        F.col(variant_col).alias("variant"),
        "n_control",
        F.col("n").alias("n_variant"),
        F.round("m_c", 6).alias("mean_control"),
        F.round("m", 6).alias("mean_variant"),
        F.round(F.col("m") - F.col("m_c"), 6).alias("lift"),
        t_out.alias("t_stat"),
        F.when(~zero_se, F.round(dof, 6)).alias("dof"),
        F.when(~zero_se, F.abs(F.round(t, 6)) > z_crit).alias("significant"),
    )
