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

``ks_drift`` — the two-sample Kolmogorov–Smirnov statistic, PSI's
bucket-free exact companion (PSI quantizes into baseline-quantile
buckets; KS measures the SUP of the ECDF gap at full resolution):
- D = max over distinct values of |F_base(x) − F_cur(x)| with
  right-continuous ECDFs (ties collapse to one evaluation point
  AFTER accumulating the whole tied block — the textbook
  evaluation);
- NULL values excluded both sides; either side empty → NULL ks_d
  (max over an empty frame — no distribution to compare, never a
  division error);
- one row: (n_base, n_cur, ks_d, p_approx) with p_approx =
  min(1, 2·exp(−2·m·D²)), m = n1·n2/(n1+n2) — the one-term Smirnov
  tail approximation (both engines' own exp), both rounded 6dp.

Scale shape (ks_drift): each side collapses to a per-VALUE count
frame (one hash agg each), the union is one more |distinct values|
frame, and the running ECDFs are ONE ordered window over that frame
— |distinct|-sized, single-partition (the pareto regime), guarded by
a fail-loud ``max_distinct`` cap: continuous doubles at corpus scale
should be rounded/quantized first (the cap message says so), which
is exactly what KS-on-floats needs anyway for a stable sup.

Scale shape: one scalar-quantile aggregation on the baseline (driver
gets buckets−1 doubles), then each side is one projection + one
|buckets|-sized hash count; the bucket join is dimension-sized. Two
table scans total (baseline is scanned twice — once for edges, once
for its histogram; persist the baseline frame if it is expensive)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "psi_drift",
    "profile_drift",
    "ks_drift",
    "qq_drift",
    "mix_shift",
    "jsd_drift",
    "jsd_from_cells",
]


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


def profile_drift(
    a,
    b,
    numeric_cols: Sequence[str] = (),
    categorical_cols: Sequence[str] = (),
) -> DataFrame:
    """Column-level profile diff between two snapshots — the schema/
    content drift report a data contract checks BEFORE anything joins
    on the data: per column, how did null rate, cardinality and (for
    numerics) the mean move between snapshot ``a`` (baseline) and
    ``b`` (current)? The structural companion to :func:`psi_drift`
    (which diffs one column's DISTRIBUTION in depth; this sweeps every
    column one level deep). Beyond-reference scope (the reference's
    schema_profiler profiles ONE frame; it never compares two).

    Pinned semantics (oracle-replicated): one row per profiled column,
    long format (column, kind, null_rate_a, null_rate_b, n_distinct_a,
    n_distinct_b, mean_a, mean_b, null_rate_delta, mean_delta):

    - null_rate = NULL count / row count (6dp; NULL on an empty
      side — try_divide, no evidence);
    - n_distinct = exact DISTINCT non-NULL count (both engines'
      count-distinct);
    - mean (numeric columns only, 6dp) — categorical rows carry NULL
      mean/mean_delta;
    - deltas = b − a on the ROUNDED inputs (house float rule), NULL
      when either side is NULL.

    Scale shape: ONE aggregation pass per side (every column's three
    statistics are expressions in the same Aggregate — the run_checks
    single-pass shape; count_distinct over k columns plans one Expand
    of factor k, the standard multi-distinct rewrite) + a 1-row cross
    join. Nothing row-scale moves: each side collapses to one row."""
    numeric_cols = list(numeric_cols)
    categorical_cols = list(categorical_cols)
    cols = numeric_cols + categorical_cols
    if not cols:
        raise ValueError("profile_drift needs at least one column")
    if set(numeric_cols) & set(categorical_cols):
        raise ValueError("a column cannot be both numeric and categorical")

    def side(df, tag):
        n = F.count(F.lit(1))
        aggs = []
        for c in cols:
            aggs.append(
                F.round(
                    F.try_divide(F.count(F.when(F.col(c).isNull(), 1)), n), 6
                ).alias(f"__nr_{tag}_{c}")
            )
            aggs.append(
                F.countDistinct(F.col(c)).cast("long").alias(f"__nd_{tag}_{c}")
            )
        for c in numeric_cols:
            aggs.append(F.round(F.avg(c), 6).alias(f"__mu_{tag}_{c}"))
        return df.agg(*aggs)

    j = side(a, "a").crossJoin(side(b, "b"))
    rows = []
    for c in cols:
        kind = "numeric" if c in numeric_cols else "categorical"
        nra, nrb = F.col(f"__nr_a_{c}"), F.col(f"__nr_b_{c}")
        mu_a = F.col(f"__mu_a_{c}") if kind == "numeric" else F.lit(None).cast("double")
        mu_b = F.col(f"__mu_b_{c}") if kind == "numeric" else F.lit(None).cast("double")
        rows.append(F.struct(
            F.lit(c).alias("column"),
            F.lit(kind).alias("kind"),
            nra.alias("null_rate_a"),
            nrb.alias("null_rate_b"),
            F.col(f"__nd_a_{c}").alias("n_distinct_a"),
            F.col(f"__nd_b_{c}").alias("n_distinct_b"),
            mu_a.alias("mean_a"),
            mu_b.alias("mean_b"),
            F.round(nrb - nra, 6).alias("null_rate_delta"),
            F.round(mu_b - mu_a, 6).alias("mean_delta"),
        ))
    return j.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.*")


def ks_drift(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    max_distinct: "int | None" = 5_000_000,
    round_to: int = 6,
) -> DataFrame:
    """(n_base, n_cur, ks_d, p_approx) — two-sample KS. See module
    pins (right-continuous tie handling, fail-loud distinct cap)."""
    b = baseline.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("__v")
    )
    c = current.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("__v")
    )
    counts = (
        b.groupBy("__v").agg(F.count(F.lit(1)).alias("__c1"))
        .join(
            c.groupBy("__v").agg(F.count(F.lit(1)).alias("__c2")),
            "__v",
            "full_outer",
        )
        .select(
            "__v",
            F.coalesce("__c1", F.lit(0)).alias("__c1"),
            F.coalesce("__c2", F.lit(0)).alias("__c2"),
        )
    )
    if max_distinct is not None:
        n_vals = counts.count()
        if n_vals > max_distinct:
            raise ValueError(
                f"ks_drift: {n_vals} distinct values exceeds "
                f"max_distinct={max_distinct}; the ECDF window would "
                "run one task that size. Quantize the column first "
                "(F.round / quantile_bucketize) — a stable KS on "
                "continuous doubles needs that anyway — or raise the "
                "cap explicitly."
            )
    from pyspark.sql import Window

    w = Window.partitionBy().orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n1 = F.sum("__c1").over(w_all).cast("double")
    n2 = F.sum("__c2").over(w_all).cast("double")
    gap = F.when(
        (n1 > 0) & (n2 > 0),
        F.abs(
            F.sum("__c1").over(w).cast("double") / n1
            - F.sum("__c2").over(w).cast("double") / n2
        ),
    )
    stat = (
        counts.select(
            n1.alias("__n1"), n2.alias("__n2"), gap.alias("__gap")
        )
        .agg(
            F.max("__n1").cast("long").alias("n_base"),
            F.max("__n2").cast("long").alias("n_cur"),
            F.max("__gap").alias("__d"),
        )
    )
    d = F.col("__d")
    m = (
        F.col("n_base").cast("double")
        * F.col("n_cur").cast("double")
        / (F.col("n_base") + F.col("n_cur")).cast("double")
    )
    p = F.when(
        d.isNotNull(),
        F.least(F.lit(1.0), F.lit(2.0) * F.exp(F.lit(-2.0) * m * d * d)),
    )
    return stat.select(
        "n_base",
        "n_cur",
        F.round(d, round_to).alias("ks_d"),
        F.round(p, round_to).alias("p_approx"),
    )


def qq_drift(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    qs: Sequence[float] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    max_distinct: "int | None" = 5_000_000,
) -> DataFrame:
    """Quantile–quantile drift table — the two samples' exact type-1
    quantiles side by side, one row per q: WHERE the distribution
    moved and by how much, where KS gives one distance and PSI one
    score. The operational readout behind a Q–Q plot.
    Beyond-reference scope (same module argument as ks_drift).

    Pinned semantics (oracle-replicated):
    - NULL values dropped per side;
    - quantile(q) = the smallest value whose side's cumulative count
      reaches ⌈q·n⌉-equivalent mass (the exact type-1 / inverse-ECDF
      quantile: min{v : cum(v) ≥ q·n} — weighted_percentiles with
      unit weights, so the value returned is always an OBSERVED
      value, never interpolated);
    - one row per q: (q, n_base, n_cur, base_value, cur_value,
      diff) — diff = cur − base rounded 6dp, values raw (they are
      inputs, not arithmetic); rows with an EMPTY side yield NULL for
      that side's value and NULL diff.

    Scale shape: ONE per-value hash aggregation per side (map-side
    partials eat the corpus), one cumulative window per side over the
    DISTINCT-VALUE frame (capped fail-loud at ``max_distinct`` —
    quantize first, the ks_drift advice), one q-fan-out over that
    frame and a 9-row pivot reduce. Raw rows shuffle once per side."""
    from pyspark.sql import Window

    for q in qs:
        if not 0 < q <= 1:
            raise ValueError(f"quantile q must be in (0, 1], got {q}")
    sides = []
    for name, df in (("base", base), ("cur", current)):
        sides.append(
            df.where(F.col(value_col).isNotNull()).select(
                F.lit(name).alias("__s"), F.col(value_col).alias("__v")
            )
        )
    cells = (
        sides[0].unionByName(sides[1])
        .groupBy("__s", "__v")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    if max_distinct is not None:
        n_distinct = cells.select("__v").distinct().count()
        if n_distinct > max_distinct:
            raise ValueError(
                f"qq_drift: {n_distinct} distinct values (> max_distinct="
                f"{max_distinct}); quantize first (e.g. F.round(value, 2))"
                " or raise max_distinct."
            )
    w_cum = (
        Window.partitionBy("__s")
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("__s")
    cum = cells.select(
        "__s",
        "__v",
        F.sum("__c").over(w_cum).alias("__cw"),
        F.sum("__c").over(w_all).alias("__n"),
    )
    qdf = cum.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    )
    picked = (
        qdf.where(
            F.col("__cw").cast("double")
            >= F.col("q") * F.col("__n").cast("double")
        )
        .groupBy("__s", "q")
        .agg(
            F.max("__n").cast("long").alias("n"),
            F.min("__v").alias("v"),
        )
    )
    is_b = F.col("__s") == "base"
    out = picked.groupBy("q").agg(
        F.max(F.when(is_b, F.col("n"))).alias("n_base"),
        F.max(F.when(~is_b, F.col("n"))).alias("n_cur"),
        F.max(F.when(is_b, F.col("v"))).alias("base_value"),
        F.max(F.when(~is_b, F.col("v"))).alias("cur_value"),
    )
    return out.select(
        "q",
        "n_base",
        "n_cur",
        "base_value",
        "cur_value",
        F.round(F.col("cur_value") - F.col("base_value"), 6).alias("diff"),
    )


def mix_shift(
    base: DataFrame,
    current: DataFrame,
    segment_col: str,
    value_col: str,
) -> DataFrame:
    """Mix-shift decomposition — "the metric moved: did the segments
    get worse, or did the mix shift toward worse segments?": each
    segment's contribution to Δ(overall mean) split into RATE effect
    (share_base · Δrate), MIX effect (Δshare · rate_base) and the
    INTERACTION cross term — the Oaxaca-style three-term exact
    decomposition (Σ of all terms over all segments = overall_cur −
    overall_base, an algebraic identity pinned in tests).
    Beyond-reference scope (grep 'mix.shift\\|oaxaca\\|decompos' over
    /root/reference/src: zero hits).

    Pinned semantics (oracle-replicated):
    - NULL segment/value rows drop per side; share = the segment's
      row share of its side; rate = the segment's mean value;
    - segments absent on a side take share 0 AND rate 0 (pinned:
      the whole contribution of an appearing/disappearing segment
      then lands in the interaction term, and the identity stays
      exact — documented, deliberate);
    - one row per segment in EITHER side: (segment, share_base,
      share_cur, rate_base, rate_cur, rate_effect, mix_effect,
      interaction, total_effect) all 6dp; total_effect = the
      segment's full Δcontribution (= the three terms' sum by
      algebra, computed directly as share_cur·rate_cur −
      share_base·rate_base so rounding can't break the row-level
      identity).

    Scale shape: ONE hash aggregation per side to (segment, n, sum)
    — map-side partials eat the corpus — then a segment-dimension
    full outer join and a codegen projection. Raw rows shuffle once
    per side."""
    def side(df, tag):
        agg = (
            df.where(
                F.col(segment_col).isNotNull()
                & F.col(value_col).isNotNull()
            )
            .groupBy(F.col(segment_col).alias("segment"))
            .agg(
                F.count(F.lit(1)).cast("double").alias(f"__n_{tag}"),
                F.sum(value_col).alias(f"__s_{tag}"),
            )
        )
        total = F.sum(f"__n_{tag}")
        from pyspark.sql import Window

        return agg.withColumn(
            f"__t_{tag}", total.over(Window.partitionBy())
        )

    b = side(base, "b")
    c = side(current, "c")
    j = b.join(c, "segment", "full_outer")
    share_b = F.coalesce(F.col("__n_b") / F.col("__t_b"), F.lit(0.0))
    share_c = F.coalesce(F.col("__n_c") / F.col("__t_c"), F.lit(0.0))
    rate_b = F.coalesce(F.col("__s_b") / F.col("__n_b"), F.lit(0.0))
    rate_c = F.coalesce(F.col("__s_c") / F.col("__n_c"), F.lit(0.0))
    return j.select(
        "segment",
        F.round(share_b, 6).alias("share_base"),
        F.round(share_c, 6).alias("share_cur"),
        F.round(rate_b, 6).alias("rate_base"),
        F.round(rate_c, 6).alias("rate_cur"),
        F.round(share_b * (rate_c - rate_b), 6).alias("rate_effect"),
        F.round((share_c - share_b) * rate_b, 6).alias("mix_effect"),
        F.round(
            (share_c - share_b) * (rate_c - rate_b), 6
        ).alias("interaction"),
        F.round(share_c * rate_c - share_b * rate_b, 6).alias(
            "total_effect"
        ),
    )


def jsd_drift(
    df: DataFrame,
    cat_col: str,
    period_col: str,
) -> DataFrame:
    """Jensen–Shannon divergence of a categorical distribution per
    period against the whole-table baseline — the bounded,
    symmetric drift score ([0, 1] in log base 2; Lin 1991) that PSI
    (x37) lacks: PSI blows up on empty bins, JSD never does, so it is
    the right default for HIGH-churn categorical columns (new
    categories appearing mid-stream). Complements ks_drift (numeric)
    and qq_drift (shape). Beyond-reference analytics scope (grep
    'jensen\\|jsd' over /root/reference/src: zero hits).

    Pinned semantics (oracle-replicated):

    - rows with NULL category or NULL period drop; the BASELINE q is
      the category distribution over ALL periods (so every category
      has q > 0 by construction);
    - per period: p = the period's category distribution; missing
      categories in a period mean p = 0 for that cell — the grid is
      completed (periods × observed categories) so the q-side term
      still contributes (0·log(0/m) ≡ 0, pinned);
    - jsd = 0.5·Σ p·log2(p/m) + 0.5·Σ q·log2(q/m), m = (p+q)/2 —
      log BASE 2, so 0 ≤ jsd ≤ 1;
    - output per period: (period, n, n_categories, jsd) — n = period
      row count, n_categories = categories OBSERVED in the period,
      jsd rounded 6dp.

    Scale shape: ONE (period, category) hash aggregation (map-side
    partials collapse the row scale), two dimension-sized marginal
    aggregations, one periods×categories grid completion (cross join
    of two DIMENSION frames — never row-scale), one period reduce."""
    base = df.where(
        F.col(cat_col).isNotNull() & F.col(period_col).isNotNull()
    ).select(
        F.col(period_col).alias("per"), F.col(cat_col).alias("cat")
    )
    cells = base.groupBy("per", "cat").agg(
        F.count(F.lit(1)).cast("double").alias("n_pc")
    )
    return jsd_from_cells(cells, period_col)


def jsd_from_cells(cells: DataFrame, period_col: str = "period") -> DataFrame:
    """The JSD core over an already-aggregated (per, cat, n_pc) cell
    frame — the seam the incremental category-mix monitor's ADDITIVE
    count store feeds directly (pipeline/monitor.py
    IncrementalCategoryMix; the rolling_active_from_days pattern).
    Same output contract as :func:`jsd_drift`."""
    per_tot = cells.groupBy("per").agg(
        F.sum("n_pc").alias("n_p"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
    )
    cat_tot = cells.groupBy("cat").agg(F.sum("n_pc").alias("n_c"))
    n_all = cells.agg(F.sum("n_pc").alias("n_all"))
    # grid completion: every (period, category) pair, p = 0 when the
    # cell is absent — both dimension-sized frames
    grid = (
        per_tot.select("per", "n_p")
        .crossJoin(cat_tot)
        .crossJoin(F.broadcast(n_all))
        .join(cells, ["per", "cat"], "left")
        .select(
            "per",
            "n_p",
            (F.coalesce("n_pc", F.lit(0.0)) / F.col("n_p")).alias("p"),
            (F.col("n_c") / F.col("n_all")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2.0
    term_p = F.when(F.col("p") > 0, F.col("p") * F.log2(F.col("p") / m)).otherwise(0.0)
    term_q = F.col("q") * F.log2(F.col("q") / m)
    scored = grid.groupBy("per", "n_p").agg(
        F.round(
            0.5 * F.sum(term_p) + 0.5 * F.sum(term_q), 6
        ).alias("jsd")
    )
    return scored.join(per_tot.select("per", "n_categories"), "per").select(
        F.col("per").alias(period_col),
        F.col("n_p").cast("long").alias("n"),
        "n_categories",
        "jsd",
    )
