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

import math

from pyspark.sql import DataFrame, functions as F

__all__ = ["ab_test", "mann_whitney", "diff_in_diff"]


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


def mann_whitney(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    max_distinct: int = 200_000,
) -> DataFrame:
    """Mann–Whitney U rank-sum test (Wilcoxon two-sample) — the
    distribution-free companion to ``ab_test``'s Welch readout: no
    normality assumption, robust to outliers, the standard screen when
    a metric is heavy-tailed (latency, spend). Beyond-reference scope
    (grep 'mann\\|whitney\\|wilcoxon' over /root/reference/src: zero
    hits). Standard formulas (Mann & Whitney 1947): U₁ = R₁ −
    n₁(n₁+1)/2 with R₁ the sum of arm A's average ranks over the
    pooled sample; normal approximation with the tie-corrected
    variance σ² = (n₁n₂/12)·((n+1) − Σ(t³−t)/(n(n−1))).

    Pinned semantics (oracle-replicated):
    - NULL values dropped; only rows whose group equals ``group_a`` or
      ``group_b`` participate;
    - average ranks via the distinct-value identity (ranks depend only
      on the VALUE): r(v) = (# pooled rows < v) + (ties(v)+1)/2 —
      computed as a cumulative window over the pooled per-value count
      frame, never over the corpus;
    - z has NO continuity correction (pinned; with ties the ±0.5
      correction is not uniformly closer);
    - p_approx = two-sided normal tail via the Zelen–Severo
      (Abramowitz–Stegun 26.2.17) polynomial — BOTH engines evaluate
      the identical closed form, so parity is arithmetic, not library;
    - rank_biserial = 1 − 2U₁/(n₁n₂) (positive ⇒ arm A stochastically
      larger... sign pinned by the formula, not by folklore);
    - one output row: (n_a, n_b, u_a, z, p_approx, rank_biserial),
      u_a exact double, z/p/effect rounded 6dp; z, p and the effect
      are NULL when σ = 0 (every pooled value tied) or either arm is
      empty.

    Scale shape: ONE hash aggregation to the pooled per-value count
    frame (≤ ``max_distinct`` rows, fail-loud — quantize first, like
    ks_drift/spearman), one ordered cumulative window over that
    DISTINCT-VALUE frame, one 1-row reduce. Nothing row-scale moves
    after the first aggregation."""
    from pyspark.sql import Window

    if group_a == group_b:
        raise ValueError("mann_whitney: group_a and group_b must differ")
    g = F.col(group_col)
    base = df.where(
        F.col(value_col).isNotNull() & g.isin([group_a, group_b])
    )
    vc = base.groupBy(F.col(value_col).alias("__v")).agg(
        F.sum(F.when(g == group_a, 1).otherwise(0))
        .cast("double")
        .alias("__ca"),
        F.sum(F.when(g == group_b, 1).otherwise(0))
        .cast("double")
        .alias("__cb"),
    )
    n_distinct = vc.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"mann_whitney: {n_distinct} distinct values (> max_distinct="
            f"{max_distinct}); the pooled value frame must stay "
            "window-sized. Quantize first (e.g. F.round(value, 2)) or "
            "raise max_distinct."
        )
    w = Window.orderBy(F.col("__v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t_all = F.col("__ca") + F.col("__cb")
    ranked = vc.select(
        "__ca",
        "__cb",
        t_all.alias("__t"),
        (
            F.sum(t_all).over(w) - t_all + (t_all + F.lit(1)) / F.lit(2.0)
        ).alias("__r"),
    )
    agg = ranked.agg(
        F.sum("__ca").alias("na"),
        F.sum("__cb").alias("nb"),
        F.sum(F.col("__ca") * F.col("__r")).alias("ra"),
        F.sum(F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t"))
        .alias("ties"),
    )
    na, nb = F.col("na"), F.col("nb")
    n = na + nb
    u_a = F.col("ra") - na * (na + F.lit(1.0)) / F.lit(2.0)
    sigma2 = (
        na * nb / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("ties") / (n * (n - F.lit(1.0))))
    )
    z = (u_a - na * nb / F.lit(2.0)) / F.sqrt(sigma2)
    # Zelen–Severo / A–S 26.2.17 upper-tail Q(x) for x ≥ 0; the oracle
    # evaluates the byte-identical polynomial (both engines: IEEE
    # doubles, same operation order).
    x = F.abs(z)
    tt = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * x)
    poly = tt * (
        F.lit(0.319381530)
        + tt * (
            F.lit(-0.356563782)
            + tt * (
                F.lit(1.781477937)
                + tt * (F.lit(-1.821255978) + tt * F.lit(1.330274429))
            )
        )
    )
    pdf = F.exp(-x * x / F.lit(2.0)) / F.sqrt(F.lit(2.0) * F.lit(math.pi))
    p_two = F.least(F.lit(1.0), F.lit(2.0) * pdf * poly)
    ok = (na > 0) & (nb > 0) & (sigma2 > 0)
    return agg.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.when((na > 0) & (nb > 0), u_a).alias("u_a"),
        F.when(ok, F.round(z, 6)).alias("z"),
        F.when(ok, F.round(p_two, 6)).alias("p_approx"),
        F.when(
            (na > 0) & (nb > 0),
            F.round(F.lit(1.0) - F.lit(2.0) * u_a / (na * nb), 6),
        ).alias("rank_biserial"),
    )


def diff_in_diff(
    df: DataFrame,
    group_col: str,
    post_col: str,
    value_col: str,
) -> DataFrame:
    """Difference-in-differences estimator — the 2×2 natural-
    experiment readout (Card & Krueger 1994 canonical form): how much
    did the treated group's mean move relative to the control group's
    move across the same pre→post boundary. The causal complement to
    ab_test's randomized comparison when assignment wasn't random but
    the timing was. Beyond-reference analytics scope (grep
    'diff.in.diff\\|did' over /root/reference/src: zero hits).

    Pinned semantics (oracle-replicated):

    - ``group_col`` is BOOLEAN treated/control, ``post_col`` BOOLEAN
      post/pre (cast upstream); rows with NULL group/post/value drop;
    - cell stats per (treated, post): n, mean, SAMPLE variance (ANSI
      var_samp — NULL for n = 1 cells);
    - did = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre);
    - se = √(Σ cells var/n) — the unpooled (Welch-style) standard
      error of the 4-mean contrast; t = did/se; both NULL when any
      cell has n < 2 (se undefined) — never an error;
    - output is ONE row: (n_total, mean_c_pre, mean_c_post,
      mean_t_pre, mean_t_post, diff_control, diff_treated, did, se,
      t_stat), floats rounded 6dp. Missing cells (an empty group ×
      period) make the contrast NULL (reported, fail-soft — the
      caller can assert n_total/cell presence).

    Scale shape: ONE hash aggregation to the four (treated, post)
    cells — map-side partials collapse the row scale — then a 1-row
    conditional reshape. No join, no window, no second scan."""
    base = df.where(
        F.col(group_col).isNotNull()
        & F.col(post_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).cast("boolean").alias("t"),
        F.col(post_col).cast("boolean").alias("post"),
        F.col(value_col).cast("double").alias("x"),
    )
    cells = base.groupBy("t", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("x").alias("m"),
        F.var_samp("x").alias("v"),
    )

    def pick(expr, t, post):
        return F.min(
            F.when((F.col("t") == t) & (F.col("post") == post), expr)
        )

    out = cells.agg(
        F.sum("n").cast("long").alias("n_total"),
        pick(F.col("m"), False, False).alias("m_c_pre"),
        pick(F.col("m"), False, True).alias("m_c_post"),
        pick(F.col("m"), True, False).alias("m_t_pre"),
        pick(F.col("m"), True, True).alias("m_t_post"),
        pick(F.col("v") / F.col("n"), False, False).alias("vn_c_pre"),
        pick(F.col("v") / F.col("n"), False, True).alias("vn_c_post"),
        pick(F.col("v") / F.col("n"), True, False).alias("vn_t_pre"),
        pick(F.col("v") / F.col("n"), True, True).alias("vn_t_post"),
    )
    diff_c = F.col("m_c_post") - F.col("m_c_pre")
    diff_t = F.col("m_t_post") - F.col("m_t_pre")
    did = diff_t - diff_c
    se = F.sqrt(
        F.col("vn_c_pre") + F.col("vn_c_post")
        + F.col("vn_t_pre") + F.col("vn_t_post")
    )
    return out.select(
        "n_total",
        F.round("m_c_pre", 6).alias("mean_c_pre"),
        F.round("m_c_post", 6).alias("mean_c_post"),
        F.round("m_t_pre", 6).alias("mean_t_pre"),
        F.round("m_t_post", 6).alias("mean_t_post"),
        F.round(diff_c, 6).alias("diff_control"),
        F.round(diff_t, 6).alias("diff_treated"),
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(F.when(se > 0, did / se), 6).alias("t_stat"),
    )
