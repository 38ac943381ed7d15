"""Feature scaling — min-max and z-score column scaling plus
equi-depth quantile bucketizing (the sklearn
MinMaxScaler/StandardScaler/KBinsDiscretizer triple at corpus scale);
the model-input companion to winsorize (bounds influence) and
impute_by_group (fills gaps). Beyond-reference scope (grep
scaler/minmax/standardize over /root/reference/src: zero hits).

Pinned semantics (oracle-replicated):

- ``minmax``: (x − min) / (max − min), NULL when the column is
  constant (no range — same convention as winsorize's all-NULL
  pass-through) or x is NULL;
- ``zscore``: (x − mean) / stddev_pop — POPULATION std, matching the
  anomaly detector's documented np.std ddof=0 contract; NULL when
  std is 0 or x is NULL. The mean and std are themselves rounded
  HALF-UP to 6dp before use — they are engine-computed floating
  aggregates whose parallel summation order differs across engines
  by ~1e-9, and an unpinned stat makes every downstream rounded
  value a potential boundary flip (measured: one flip per ~10⁵ rows
  at 6dp); pinning the two SCALARS makes the whole transform
  bit-reproducible. min/max need no pinning (they are exact data
  values);
- scaled values rounded 6dp; with ``suffix`` the scaled values land
  in new DOUBLE columns, otherwise they replace (and the coercion to
  DOUBLE is the point — scaling IS a re-typing);
- ``quantile_bucketize``: bucket(x) = number of interior quantile
  edges (i/buckets, i=1..buckets−1; exact ``percentile`` /
  ``percentile_approx`` dual, each edge rounded HALF-UP to 6dp —
  same scalar-pinning argument: an interpolated edge differing by
  1 ulp across engines flips the bucket of any value sitting
  exactly on it) strictly below x → 0..buckets−1; heavy ties leave
  empty buckets (the PSI convention); NULL x → NULL bucket.

Scale shape: ONE scalar aggregation computes every requested
column's statistics (or the edge vector) in a single pass; the
transform is a pure projection inside whole-stage codegen — the
same two-job shape as winsorize, for any number of columns."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "scale_columns",
    "quantile_bucketize",
    "quantile_normalize",
    "weighted_percentiles",
    "binned_quantiles",
    "quantiles_from_bins",
    "target_encode",
]


def _round6(v: float) -> float:
    """Half-up 6dp (≡ F.round and DuckDB ROUND — Python's built-in
    round is banker's and would diverge on exact .5e-7 boundaries)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def scale_columns(
    df: DataFrame,
    cols: Sequence[str],
    method: str = "minmax",
    suffix: str = "",
) -> DataFrame:
    """Scale each of ``cols`` by ``method`` ∈ {minmax, zscore}."""
    if not cols:
        raise ValueError("scale_columns needs at least one column")
    if method not in ("minmax", "zscore"):
        raise ValueError(f"method must be minmax or zscore, got {method!r}")
    if method == "minmax":
        aggs = [F.min(c).cast("double").alias(f"__lo_{c}") for c in cols] + [
            F.max(c).cast("double").alias(f"__hi_{c}") for c in cols
        ]
    else:
        aggs = [F.avg(c).alias(f"__mu_{c}") for c in cols] + [
            F.stddev_pop(c).alias(f"__sd_{c}") for c in cols
        ]
    stats = df.agg(*aggs).collect()[0]
    out = df
    for c in cols:
        x = F.col(c).cast("double")
        if method == "minmax":
            lo, hi = stats[f"__lo_{c}"], stats[f"__hi_{c}"]
            if lo is None or hi is None or lo == hi:
                scaled = F.lit(None).cast("double")
            else:
                scaled = F.round((x - lo) / (hi - lo), 6)
        else:
            mu, sd = stats[f"__mu_{c}"], stats[f"__sd_{c}"]
            if mu is None or sd is None or sd == 0:
                scaled = F.lit(None).cast("double")
            else:
                mu, sd = _round6(mu), _round6(sd)
                # + 0.0 folds IEEE -0.0 (a tiny negative rounding to
                # zero) into +0.0 — engines/formatters disagree on the
                # sign of zero, not its value
                scaled = F.round((x - mu) / sd, 6) + F.lit(0.0)
        out = out.withColumn(
            c + suffix, F.when(x.isNotNull(), scaled)
        )
    return out


def quantile_bucketize(
    df: DataFrame,
    col: str,
    buckets: int = 10,
    approx: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` (default ``<col>_bucket``) = equi-depth bucket
    id 0..buckets−1. See module pins."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    qs = [i / buckets for i in range(1, buckets)]
    if approx:
        edge_agg = F.percentile_approx(col, qs, 10000)
    else:
        edge_agg = F.percentile(col, F.array(*[F.lit(q) for q in qs]))
    edges = df.agg(edge_agg.alias("e")).collect()[0]["e"]
    if edges is None or any(e is None for e in edges):
        raise ValueError(f"column {col!r} has no non-NULL values to bucket")
    edges = [_round6(float(e)) for e in edges]
    x = F.col(col)
    bucket = sum((x > F.lit(float(e))).cast("int") for e in edges).cast("long")
    name = out_col or f"{col}_bucket"
    return df.withColumn(name, F.when(x.isNotNull(), bucket))


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: "str | None" = None,
    out_col: str = "qn",
    method: str = "window",
) -> DataFrame:
    """Empirical-quantile normalization: replace each value with its
    percent rank within its group (0 = group minimum, 1 = group
    maximum) — the rank-based feature transform that makes columns
    with arbitrary distributions comparable (and the building block
    of cross-sample quantile normalization). Complements
    scale_columns' parametric min-max/z forms with the
    distribution-free one.

    Pinned semantics (oracle-replicated):
    - percent_rank ≡ (rank − 1)/(n − 1) over ``value_col`` ascending;
      TIES share a rank in both engines, so no tiebreak is needed
      (equal values get equal quantiles — the definition, not an
      accident); single-row groups yield 0.0;
    - rows with NULL value (or NULL group when grouped) are DROPPED —
      a NULL has no rank, and letting it ride would shift every other
      row's quantile by engine-specific NULL placement; rounded 6dp.

    Scale shape: ``method="window"`` (default) is ONE key-partitioned
    window over raw rows — each group sorts in one task; right for
    per-key groups, a wall for FEW giant groups or the UNGROUPED form
    (a global single-task sort). ``method="distributed"`` ranks via
    the shared two-pass range-partitioned machinery
    (operators/ranks.py): equal values co-locate, local RANK + group
    size arrive by broadcast offset, qn = (rank−1)/(n−1) — identical
    output including tie sharing (differential-tested), two extra
    exchanges, fully distributed sort; it also makes the ungrouped
    form scale (a constant group ranges on the value alone)."""
    from pyspark.sql import Window

    if method not in ("window", "distributed"):
        raise ValueError(
            f"method must be 'window' or 'distributed', got {method!r}"
        )
    base = df.where(F.col(value_col).isNotNull())
    if group_col is not None:
        base = base.where(F.col(group_col).isNotNull())
    if method == "distributed":
        from ai_etl_framework_spark.operators.ranks import group_ranks

        g = group_col
        if g is None:
            base = base.withColumn("__qn_g", F.lit(1))
            g = "__qn_g"
        ranked = group_ranks(base, g, value_col, rank_col="__qn_rank")
        qn = F.when(
            F.col("__n") > 1,
            F.round(
                (F.col("__qn_rank") - 1) / (F.col("__n") - 1), 6
            ),
        ).otherwise(F.lit(0.0))
        out = ranked.withColumn(out_col, qn).drop("__qn_rank", "__rn", "__n")
        return out.drop("__qn_g") if group_col is None else out
    if group_col is not None:
        w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    else:
        w = Window.partitionBy().orderBy(F.col(value_col).asc())
    return base.withColumn(out_col, F.round(F.percent_rank().over(w), 6))


def weighted_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75),
    max_distinct: int = 200_000,
) -> DataFrame:
    """Per-group WEIGHTED percentiles — "the median order line by
    QUANTITY, not by line count": each value counts with its weight,
    the percentile is the smallest value whose cumulative weight
    reaches q·total (the weighted lower/type-1 quantile, the inverse
    weighted ECDF). Beyond-reference scope (the reference has plain
    percentiles only). Distinct from quantile_bucketize (unweighted,
    bucket ASSIGNMENT) and quantile_sketch (approximate).

    Pinned semantics (oracle-replicated):
    - rows with NULL group/value/weight or weight ≤ 0 are dropped;
    - percentile(q) = min{ v : Σ_{u ≤ v} w(u) ≥ q·W } — the LOWER
      weighted quantile, no interpolation (interpolated variants
      disagree across libraries; the inverse-ECDF form is exact and
      engine-identical). With all weights 1 this is the classic
      type-1 quantile;
    - one output row per group: (group, n, total_weight, p_<q>...) —
      total_weight rounded 6dp, percentile values raw (they are input
      values, not arithmetic);
    - cumulative weights are compared on EXACT partial sums — with
      integer-valued weights (counts, quantities) the comparison is
      exact in both engines; fractional weights are summed in the
      same value order by both engines (documented, not pinned).

    Scale shape: ONE hash aggregation to (group, value) weight cells
    — bounded by |groups|·|distinct values|, capped fail-loud at
    ``max_distinct`` distinct values (quantize first, the
    ks_drift/spearman convention) — one cumulative window PER GROUP
    over that cell frame, one final per-group reduce with k
    conditional-min expressions. Raw rows shuffle once."""
    from pyspark.sql import Window

    for q in qs:
        if not 0 < q <= 1:
            raise ValueError(f"percentile q must be in (0, 1], got {q}")
    cells = (
        df.where(
            F.col(group_col).isNotNull()
            & F.col(value_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0)
        )
        .groupBy(
            F.col(group_col).alias(group_col),
            F.col(value_col).alias("__v"),
        )
        .agg(
            F.sum(weight_col).cast("double").alias("__w"),
            F.count(F.lit(1)).cast("long").alias("__n"),
        )
    )
    n_distinct = cells.select("__v").distinct().count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"weighted_percentiles: {n_distinct} distinct values (> "
            f"max_distinct={max_distinct}); the cell frame must stay "
            "window-sized. Quantize first (e.g. F.round(value, 2)) or "
            "raise max_distinct."
        )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    cum = cells.select(
        group_col,
        "__v",
        "__n",
        F.sum("__w").over(w_cum).alias("__cw"),
        F.sum("__w").over(w_all).alias("__tw"),
    )
    aggs = [
        F.sum("__n").alias("n"),
        F.round(F.max("__tw"), 6).alias("total_weight"),
    ]
    for q in qs:
        name = f"p{int(round(q * 100)):02d}"
        aggs.append(
            F.min(
                F.when(F.col("__cw") >= F.lit(q) * F.col("__tw"), F.col("__v"))
            ).alias(name)
        )
    return cum.groupBy(group_col).agg(*aggs)


def quantiles_from_bins(
    bins: DataFrame,
    width: float,
    qs: Sequence[float],
    key_col: str | None = None,
) -> DataFrame:
    """Quantile estimates from an ADDITIVE (key?, bin, n) histogram
    frame — the shared core behind :func:`binned_quantiles` and the
    streaming ``IncrementalQuantiles`` store (the
    rolling_active_from_days seam pattern: the stream and the batch
    operator literally run the same code over the same frame shape).

    For each q: the target rank t = q·N falls in the first bin whose
    cumulative count reaches it; the estimate interpolates linearly
    inside that bin — est = bin·width + width·(t − cum_prev)/n_bin
    (the classic histogram-quantile rule, e.g. Prometheus'
    histogram_quantile). q = 1 lands exactly on the chosen bin's
    upper edge by the same formula."""
    from pyspark.sql import Window

    keys = [key_col] if key_col else []
    w_cum = (
        (Window.partitionBy(*keys) if keys else Window.partitionBy())
        .orderBy(F.col("bin").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys) if keys else Window.partitionBy()
    cum = bins.select(
        *keys,
        "bin",
        F.col("n"),
        F.sum("n").over(w_cum).alias("__c"),
        F.sum("n").over(w_all).alias("__nt"),
    )
    qdf = cum.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    )
    picked = (
        qdf.where(
            F.col("__c").cast("double")
            >= F.col("q") * F.col("__nt").cast("double")
        )
        .groupBy(*keys, "q")
        .agg(
            F.max("__nt").cast("long").alias("n_total"),
            F.min("bin").alias("bin"),
        )
    )
    chosen = cum.select(
        *keys,
        F.col("bin"),
        F.col("n").alias("__bn"),
        (F.col("__c") - F.col("n")).alias("__cp"),
    )
    t = F.col("q") * F.col("n_total").cast("double")
    est = (
        F.col("bin").cast("double") * F.lit(width)
        + F.lit(width) * (t - F.col("__cp")) / F.col("__bn")
    )
    return picked.join(chosen, [*keys, "bin"]).select(
        *keys,
        "q",
        "n_total",
        "bin",
        F.round(est, 6).alias("estimate"),
    )


def binned_quantiles(
    df: DataFrame,
    value_col: str,
    width: float,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    key_col: str | None = None,
) -> DataFrame:
    """Fixed-width-histogram quantile estimates — the mergeable,
    streaming-safe quantile: values bin to ``floor(v/width)``, bin
    counts are ADDITIVE (union across batches/partitions/days without
    rank recomputation), and each quantile interpolates inside its
    bin with error bounded by ``width``. The exact/approx duals
    (percentile, percentile_approx/KLL) answer one-shot queries;
    this is the form you PERSIST — an additive store any later query
    (or micro-batch merge) extends for free. Beyond-reference scope.

    Pinned semantics (oracle-replicated):
    - NULL value (and NULL key when keyed) rows are dropped; bin =
      floor(value/width) — exact integer floor in both engines;
    - per (key?, q): t = q·N; the chosen bin is the FIRST whose
      cumulative count ≥ t; estimate = bin·width +
      width·(t − cum_prev)/n_bin, rounded 6dp (histogram_quantile's
      linear-interpolation rule); q ∈ (0, 1], q = 1 → the top bin's
      upper edge;
    - output long format: (key?, q, n_total, bin, estimate).

    Scale shape: ONE hash aggregation to the (key, bin) frame —
    bounded by |keys|·(range/width), never corpus size — then
    windows/joins over THAT frame only. The q fan-out explodes the
    BIN frame, not the corpus."""
    if width <= 0:
        raise ValueError(f"width must be > 0, got {width}")
    for q in qs:
        if not 0 < q <= 1:
            raise ValueError(f"quantile q must be in (0, 1], got {q}")
    base = df.where(F.col(value_col).isNotNull())
    keys = [key_col] if key_col else []
    if key_col:
        base = base.where(F.col(key_col).isNotNull())
    bins = base.groupBy(
        *keys,
        F.floor(F.col(value_col) / F.lit(width)).cast("long").alias("bin"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return quantiles_from_bins(bins, width, qs, key_col=key_col)


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    m: float = 10.0,
) -> DataFrame:
    """Smoothed target (mean) encoding table for a categorical
    feature — the standard high-cardinality categorical → numeric
    transform for tree/linear models (Micci-Barreca 2001): encoded =
    (n·mean_cat + m·global_mean) / (n + m), an empirical-Bayes shrink
    toward the prior so rare categories don't memorize their few
    labels. Produces the ENCODING TABLE (dimension-sized; broadcast-
    join it onto features — the table, not the corpus, is the
    artifact a feature store versions). Beyond-reference analytics
    scope (grep 'target encod' over /root/reference/src: zero hits).

    Pinned semantics (oracle-replicated):

    - rows with NULL category or NULL target drop; one output row per
      remaining category;
    - global_mean = mean over the SAME filtered rows (so the prior
      and the cells see one population);
    - encoded = (n·mean_cat + m·global_mean)/(n + m), m > 0 fail-loud
      (m = 0 is unsmoothed leak-prone encoding — pass a tiny m
      explicitly if that is really wanted ... it is not);
    - output: (category, n, cat_mean, encoded), floats 6dp, plus the
      global_mean rider on every row (the domain_stats convention).

    Scale shape: ONE hash aggregation to the category frame (map-side
    partials) + a 1-row global reduce broadcast back. No window; the
    corpus is scanned once (Catalyst shares the scan across the two
    aggregations' stages at worst twice — both category- and
    1-row-sized outputs)."""
    if m <= 0:
        raise ValueError(f"target_encode: m must be > 0, got {m}")
    base = df.where(
        F.col(cat_col).isNotNull() & F.col(target_col).isNotNull()
    ).select(
        F.col(cat_col).alias("c"),
        F.col(target_col).cast("double").alias("y"),
    )
    cells = base.groupBy(F.col("c").alias(cat_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("y").alias("__mean"),
    )
    glob = base.agg(F.avg("y").alias("__gm"))
    return cells.crossJoin(F.broadcast(glob)).select(
        cat_col,
        "n",
        F.round("__mean", 6).alias("cat_mean"),
        F.round(
            (F.col("n") * F.col("__mean") + F.lit(float(m)) * F.col("__gm"))
            / (F.col("n") + F.lit(float(m))),
            6,
        ).alias("encoded"),
        F.round("__gm", 6).alias("global_mean"),
    )
