"""Model-evaluation reports — the metrics tables every pipeline that
SCORES data (quality classifiers, language ID, forecasts, retrieval
rankings) needs to publish next to its outputs. Three reports, all
closed-form SQL arithmetic over one or two aggregations, all with
DuckDB oracle twins; the engine's own scoring operators are the
intended inputs (x09's quality classifier, txt02's lang-id, x67's
forecasts, x28's BM25 rankings). Beyond-reference scope (the
reference scores nothing and evaluates nothing).

Pinned semantics (oracle-replicated):

``classification_report`` — one row per DISTINCT class observed in
EITHER column (label or prediction): (class, n_true, n_pred, tp, fp,
fn, precision, recall, f1) with precision = tp/(tp+fp), recall =
tp/(tp+fn), f1 = harmonic mean — each NULL when its denominator is 0
(standard zero-division convention, try_divide); all 6dp. Rows with
NULL label OR NULL prediction are excluded (no evidence). The
micro-accuracy rides on every row (``accuracy`` — total tp / total
rows, the multi-class micro-F1 identity).

``regression_report`` — one row: (n, mae, rmse, r2, bias) over rows
where both actual and prediction are non-NULL; r2 = 1 − SS_res/SS_tot
(NULL when the actual is constant — SS_tot = 0); all 6dp.

``ndcg_at_k`` — one row per query group: (query, ndcg, n_docs) where
DCG = Σ relevance_i / log2(rank_i + 1) over the TOP-k by the given
score (rank = dense position by score DESC, id ASC tiebreak — pinned
total order), IDCG = the same sum over the ideal (relevance DESC)
ordering, ndcg = DCG/IDCG (NULL when IDCG = 0 — no relevant docs);
6dp. Binary or graded relevance both work (the formula is the
standard Järvelin & Kekäläinen 2002 form without the 2^rel−1 gain —
pinned as the 'linear gain' variant).

Scale shape: classification = ONE (label, pred) pair count
aggregation (confusion cells — |classes|² bound) + class-sized
reshapes; regression = ONE scalar aggregation; ndcg = two per-query
WindowGroupLimit top-k passes (score order and ideal order) + one
per-query reduce — everything shuffles on the query key."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "classification_report",
    "regression_report",
    "ndcg_at_k",
    "mrr_at_k",
    "calibration_table",
    "classifier_metrics",
    "grouped_auc",
    "silhouette_centroid",
    "rrf_fuse",
]


def classification_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision/recall/F1 + micro accuracy — module pins."""
    base = df.where(
        F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(
        F.col(label_col).cast("string").alias("__y"),
        F.col(pred_col).cast("string").alias("__p"),
    )
    cells = base.groupBy("__y", "__p").agg(F.count(F.lit(1)).alias("__n"))
    classes = (
        cells.select(F.col("__y").alias("class"))
        .unionByName(cells.select(F.col("__p").alias("class")))
        .distinct()
    )
    tp = cells.where(F.col("__y") == F.col("__p")).select(
        F.col("__y").alias("class"), F.col("__n").alias("tp")
    )
    n_true = cells.groupBy(F.col("__y").alias("class")).agg(
        F.sum("__n").alias("n_true")
    )
    n_pred = cells.groupBy(F.col("__p").alias("class")).agg(
        F.sum("__n").alias("n_pred")
    )
    totals = cells.agg(
        F.coalesce(
            F.sum(F.when(F.col("__y") == F.col("__p"), F.col("__n"))),
            F.lit(0),
        ).alias("__tp_all"),
        F.sum("__n").alias("__n_all"),
    )
    j = (
        classes.join(n_true, "class", "left")
        .join(n_pred, "class", "left")
        .join(tp, "class", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "class",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            "__tp_all",
            "__n_all",
        )
    )
    fp = F.col("n_pred") - F.col("tp")
    fn = F.col("n_true") - F.col("tp")
    prec = F.try_divide(F.col("tp"), F.col("n_pred"))
    rec = F.try_divide(F.col("tp"), F.col("n_true"))
    f1 = F.try_divide(F.lit(2.0) * prec * rec, prec + rec)
    return j.select(
        "class",
        "n_true",
        "n_pred",
        "tp",
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
        F.round(
            F.try_divide(F.col("__tp_all"), F.col("__n_all")), 6
        ).alias("accuracy"),
    )


def regression_report(
    df: DataFrame,
    actual_col: str,
    pred_col: str,
) -> DataFrame:
    """One-row regression metrics — module pins."""
    base = df.where(
        F.col(actual_col).isNotNull() & F.col(pred_col).isNotNull()
    )
    err = F.col(actual_col) - F.col(pred_col)
    ss_res = F.sum(err * err)
    n = F.count(F.lit(1))
    ss_tot = F.sum(F.col(actual_col) * F.col(actual_col)) - (
        F.sum(actual_col) * F.sum(actual_col) / n
    )
    return base.agg(
        n.cast("long").alias("n"),
        F.round(F.avg(F.abs(err)), 6).alias("mae"),
        F.round(F.sqrt(F.avg(err * err)), 6).alias("rmse"),
        F.round(
            F.when(
                F.round(ss_tot, 9) > 0, F.lit(1.0) - ss_res / ss_tot
            ),
            6,
        ).alias("r2"),
        F.round(F.avg(err), 6).alias("bias"),
    )


def ndcg_at_k(
    df: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    relevance_col: str,
    k: int = 10,
) -> DataFrame:
    """NDCG@k per query (linear gain) — module pins."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = df.where(
        F.col(query_col).isNotNull()
        & F.col(score_col).isNotNull()
        & F.col(relevance_col).isNotNull()
    )
    # r12 (VERDICT r11 item 4): the previous single-pass form ranked
    # EVERY row through two full window sorts because n_docs needed
    # the whole partition — at 10× data the few-key partitions sorted
    # 10× rows in one task each. Split instead: n_docs is one hash
    # agg (no sort), and each DCG side filters `rank <= k` DIRECTLY
    # above its window, which Catalyst rewrites to WindowGroupLimit —
    # every map task pre-prunes to its local top-k per query before
    # the shuffle, so the final sort sees ≤ k·(#map tasks) rows per
    # query instead of all of them. Identical semantics: rows past
    # rank k contributed 0.0 to both sums.
    counts = base.groupBy(query_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w_sys = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    w_ideal = Window.partitionBy(query_col).orderBy(
        F.col(relevance_col).desc(), F.col(id_col).asc()
    )
    rel = F.col(relevance_col).cast("double")
    sys_k = (
        base.select(
            F.col(query_col),
            rel.alias("__rel"),
            F.row_number().over(w_sys).alias("__r"),
        )
        .where(F.col("__r") <= k)
        .groupBy(query_col)
        .agg(F.sum(F.col("__rel") / F.log2(F.col("__r") + 1)).alias("__dcg"))
    )
    ideal_k = (
        base.select(
            F.col(query_col),
            rel.alias("__rel"),
            F.row_number().over(w_ideal).alias("__r"),
        )
        .where(F.col("__r") <= k)
        .groupBy(query_col)
        .agg(F.sum(F.col("__rel") / F.log2(F.col("__r") + 1)).alias("__idcg"))
    )
    return (
        counts.join(sys_k, query_col)
        .join(ideal_k, query_col)
        .select(
            F.col(query_col),
            F.round(F.try_divide(F.col("__dcg"), F.col("__idcg")), 6).alias("ndcg"),
            "n_docs",
        )
    )


def mrr_at_k(
    df: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    relevance_col: str,
    k: int = 10,
) -> DataFrame:
    """Mean reciprocal rank — the sibling of :func:`ndcg_at_k` for
    the "did the FIRST relevant result come up high" question (QA /
    known-item retrieval): per query, RR = 1/rank of the first
    relevant document (relevance > 0) within the top-k of the system
    ordering (score DESC, id ASC — the pinned total order), 0.0 when
    no relevant document makes the cut; the global table mean is the
    reported MRR (callers average the per-query column). One
    WindowGroupLimit rank pass + one per-query reduce; 6dp."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = df.where(
        F.col(query_col).isNotNull()
        & F.col(score_col).isNotNull()
        & F.col(relevance_col).isNotNull()
    )
    # r12 (VERDICT r11 item 4): same split as ndcg_at_k — n_docs via
    # one hash agg, the rank pass filtered to `__r <= k` directly
    # above the window so it lowers to a true WindowGroupLimit (the
    # docstring's claim is now real: map tasks pre-prune to local
    # top-k per query, the window sort never sees the full
    # partition). Rows past rank k never contributed to first_rel.
    counts = base.groupBy(query_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    topk = base.select(
        F.col(query_col),
        F.col(relevance_col).cast("double").alias("__rel"),
        F.row_number().over(w).alias("__r"),
    ).where(F.col("__r") <= k)
    first_rel = F.min(F.when(F.col("__rel") > 0, F.col("__r")))
    rr = topk.groupBy(query_col).agg(
        F.round(
            F.coalesce(F.lit(1.0) / first_rel, F.lit(0.0)), 6
        ).alias("rr")
    )
    # inner join is total: every query with >= 1 row has a rank-1 row
    return counts.join(rr, query_col).select(F.col(query_col), "rr", "n_docs")


def calibration_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Classifier calibration / decile-lift table — scores binned to
    fixed-width [0, 1) bins, each with its predicted-vs-actual rate
    and lift over the base rate: the "is 0.9 actually 90%?" readout
    (reliability diagram as a table) plus the campaign-targeting lift
    view. The per-bin |avg_score − actual_rate| column is the ECE
    contribution (weight by n/total downstream for the scalar).
    Completes the evaluation family: classification_report grades
    LABELS, this grades PROBABILITIES.

    Pinned semantics (oracle-replicated):
    - rows with NULL score/label dropped; labels must be 0/1 (cast to
      int, anything else fails the pinned domain check); scores are
      CLAMPED to [0, 1] before binning (pinned — out-of-range scores
      are a caller bug worth seeing at the edge bins, not dropping);
    - bin = least(floor(score·n_bins), n_bins−1) — the 1.0 score
      joins the top bin; bin edges lo = bin/n_bins, hi = (bin+1)/n_bins;
    - per observed bin: (bin, lo, hi, n, avg_score, actual_rate,
      lift, abs_gap) 6dp; lift = actual_rate/base_rate, NULL when the
      base rate is 0.

    Scale shape: ONE hash aggregation to ≤ n_bins rows + a broadcast
    1-row base-rate join. No windows."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    s = F.col(score_col)
    lab = F.col(label_col).cast("int")
    base = df.where(s.isNotNull() & lab.isNotNull()).select(
        F.least(
            F.greatest(s.cast("double"), F.lit(0.0)), F.lit(1.0)
        ).alias("__s"),
        lab.alias("__y"),
    )
    chk = base.where((F.col("__y") != 0) & (F.col("__y") != 1))
    if chk.limit(1).count() > 0:
        raise ValueError(
            f"calibration_table: {label_col} must be binary 0/1"
        )
    binned = base.select(
        F.least(
            F.floor(F.col("__s") * n_bins).cast("long"),
            F.lit(n_bins - 1).cast("long"),
        ).alias("bin"),
        "__s",
        "__y",
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("__s").alias("__as"),
        F.avg(F.col("__y").cast("double")).alias("__ar"),
    )
    tot = binned.agg(
        F.avg(F.col("__y").cast("double")).alias("__base")
    )
    nb = float(n_bins)
    return per_bin.join(F.broadcast(tot)).select(
        "bin",
        F.round(F.col("bin") / nb, 6).alias("lo"),
        F.round((F.col("bin") + 1) / nb, 6).alias("hi"),
        "n",
        F.round("__as", 6).alias("avg_score"),
        F.round("__ar", 6).alias("actual_rate"),
        F.round(
            F.when(F.col("__base") > 0, F.col("__ar") / F.col("__base")),
            6,
        ).alias("lift"),
        F.round(F.abs(F.col("__as") - F.col("__ar")), 6).alias("abs_gap"),
    )


def classifier_metrics(
    df: DataFrame,
    score_col: str,
    label_col: str,
    max_distinct: int = 200_000,
    eps: float = 1e-15,
) -> DataFrame:
    """Threshold-free binary-classifier scalars in ONE row: exact AUC,
    Brier score, log loss. AUC uses the rank-sum identity AUC =
    (R₁ − n₁(n₁+1)/2)/(n₁n₀) with AVERAGE ranks over the pooled
    scores (ties counted half — the exact trapezoidal ROC area), so
    it rides the same distinct-value machinery as mann_whitney: the
    rank map is a window over the SCORE-COUNT frame, never the
    corpus. Brier/log loss are plain aggregations; log loss clamps
    p into [eps, 1−eps] (pinned, the sklearn convention).

    Pinned semantics (oracle-replicated):
    - NULL score/label dropped; labels 0/1 (fail-loud domain check);
      scores are used RAW everywhere except the log arguments — AUC
      is rank-based (any real score works) and Brier on an
      out-of-[0,1] score should look broken, not be silently masked;
    - one row: (n_pos, n_neg, auc, brier, log_loss) 6dp; auc NULL
      when either class is empty.

    Scale shape: one pooled (score → pos/neg counts) hash
    aggregation (≤ ``max_distinct``, fail-loud — quantize first),
    one cumulative window over that frame, one 1-row reduce; Brier/
    log-loss ride the SAME first aggregation (per-score terms ×
    counts), so the corpus is scanned exactly once."""
    from pyspark.sql import Window

    s = F.col(score_col).cast("double")
    lab = F.col(label_col).cast("int")
    base = df.where(s.isNotNull() & lab.isNotNull()).select(
        s.alias("__s"), lab.alias("__y")
    )
    chk = base.where((F.col("__y") != 0) & (F.col("__y") != 1))
    if chk.limit(1).count() > 0:
        raise ValueError(
            f"classifier_metrics: {label_col} must be binary 0/1"
        )
    vc = base.groupBy("__s").agg(
        F.sum(F.when(F.col("__y") == 1, 1).otherwise(0))
        .cast("double")
        .alias("__cp"),
        F.sum(F.when(F.col("__y") == 0, 1).otherwise(0))
        .cast("double")
        .alias("__cn"),
    )
    n_distinct = vc.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"classifier_metrics: {n_distinct} distinct scores (> "
            f"max_distinct={max_distinct}); quantize first (e.g. "
            "F.round(score, 4)) or raise max_distinct."
        )
    w = Window.orderBy(F.col("__s").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t_all = F.col("__cp") + F.col("__cn")
    p_clip = F.least(
        F.greatest(F.col("__s"), F.lit(eps)), F.lit(1.0 - eps)
    )
    ranked = vc.select(
        "__s",
        "__cp",
        "__cn",
        (
            F.sum(t_all).over(w) - t_all + (t_all + F.lit(1)) / F.lit(2.0)
        ).alias("__r"),
        p_clip.alias("__pc"),
    )
    y1 = F.col("__cp")
    y0 = F.col("__cn")
    agg = ranked.agg(
        F.sum(y1).alias("np"),
        F.sum(y0).alias("nn"),
        F.sum(y1 * F.col("__r")).alias("rp"),
        F.sum(
            y1 * (F.col("__s") - 1.0) * (F.col("__s") - 1.0)
            + y0 * F.col("__s") * F.col("__s")
        ).alias("br"),
        F.sum(
            -(y1 * F.log(F.col("__pc"))
              + y0 * F.log(F.lit(1.0) - F.col("__pc")))
        ).alias("ll"),
    )
    np_, nn_ = F.col("np"), F.col("nn")
    auc = (F.col("rp") - np_ * (np_ + F.lit(1.0)) / F.lit(2.0)) / (
        np_ * nn_
    )
    n = np_ + nn_
    return agg.select(
        np_.cast("long").alias("n_pos"),
        nn_.cast("long").alias("n_neg"),
        F.round(F.when((np_ > 0) & (nn_ > 0), auc), 6).alias("auc"),
        F.round(F.col("br") / n, 6).alias("brier"),
        F.round(F.col("ll") / n, 6).alias("log_loss"),
    )



def silhouette_centroid(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-label centroid silhouette — the "are my labels actually
    separated in embedding space" scorecard: for every point,
    a = Euclidean distance to its OWN label centroid, b = the minimum
    distance to any OTHER label centroid, s = (b − a) / max(a, b).
    The centroid ("simplified") silhouette variant (Hruschka et al.
    2004) — O(points × labels) instead of the classic O(points²)
    pairwise form, the only form that survives corpus scale.
    Beyond-reference analytics scope (grep 'silhouette' over
    /root/reference/src: zero hits).

    Pinned semantics (oracle-replicated):

    - rows with NULL vector or NULL label drop; vector elements cast
      to double before any arithmetic (float32 storage, double math —
      the x62 contract);
    - centroid = per-label elementwise mean over that label's
      vectors; distance = Euclidean (sqrt of the coordinate
      square-sum);
    - s = (b − a) / max(a, b); a degenerate point with
      max(a, b) = 0 scores 0 (pinned — the sklearn convention);
      a single-label input (no "other" centroid) yields NULL b and
      NULL silhouette (reported, never an error);
    - output per label: (label, n_points, avg_a, avg_b,
      avg_silhouette), all ``round_to`` dp (6 default).

    Scale shape: ONE posexplode aggregation builds the label×dim
    centroid cells (|labels| × d rows — dimension-bounded); the cells
    reassemble into one array row per label and BROADCAST-cross-join
    the point frame (|labels| rows — the point frame is never
    shuffled); per-point distances are one zip_with/aggregate fold
    (JVM codegen, no UDF); one per-point reduce keyed by a synthetic
    point id (unique by construction — monotonically_increasing_id on
    the pre-join frame), then ONE label aggregation."""
    if round_to < 0:
        raise ValueError(f"round_to must be >= 0, got {round_to}")
    pts = df.where(
        F.col(vec_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.monotonically_increasing_id().alias("__pid"),
        F.col(label_col).alias("__lab"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    cells = (
        pts.select("__lab", F.posexplode("__v").alias("__dim", "__x"))
        .groupBy("__lab", "__dim")
        .agg(F.avg("__x").alias("__c"))
    )
    centroids = cells.groupBy("__lab").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__dim", "__c"))),
            lambda s: s["__c"],
        ).alias("__cv")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("__v", "__cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = pts.crossJoin(
        F.broadcast(centroids.select(F.col("__lab").alias("__clab"), "__cv"))
    ).select("__pid", "__lab", "__clab", dist.alias("__d"))
    per_point = scored.groupBy("__pid", "__lab").agg(
        F.min(F.when(F.col("__lab") == F.col("__clab"), F.col("__d"))).alias(
            "__a"
        ),
        F.min(F.when(F.col("__lab") != F.col("__clab"), F.col("__d"))).alias(
            "__b"
        ),
    )
    s = F.when(
        F.greatest("__a", "__b") > 0,
        (F.col("__b") - F.col("__a")) / F.greatest("__a", "__b"),
    ).otherwise(
        F.when(F.col("__b").isNotNull(), F.lit(0.0))
    )
    return per_point.groupBy(F.col("__lab").alias(label_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.round(F.avg("__a"), round_to).alias("avg_a"),
        F.round(F.avg("__b"), round_to).alias("avg_b"),
        F.round(F.avg(s), round_to).alias("avg_silhouette"),
    )


def rrf_fuse(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str,
    score_a: str,
    score_b: str,
    k: int = 60,
    top_n: int = 100,
) -> DataFrame:
    """Reciprocal-rank fusion of two rankings — the standard hybrid-
    retrieval combiner (Cormack, Clarke & Buettcher 2009; what search
    engines use to merge BM25 and embedding-similarity lists without
    score calibration): rrf(id) = Σ over lists containing id of
    1 / (k + rank). Rank-based, so incomparable score scales fuse
    cleanly. Beyond-reference analytics scope (grep 'reciprocal rank
    fusion\\|rrf' over /root/reference/src: zero hits).

    Pinned semantics (oracle-replicated):

    - each list ranks its own non-NULL-score rows by (score DESC, id
      ASC) — the house deterministic total order;
    - the fused universe is the UNION of ids; an id absent from a
      list contributes 0 for that list (the standard union
      convention); rank_a/rank_b are NULL for absent ids;
    - rrf_score = Σ 1/(k + rank), rounded 6dp; output = top_n by
      (rrf_score 6dp DESC, id ASC) — the cut compares the ROUNDED
      score (engine-stable);
    - k ≥ 1 (fail loud; k=60 is the paper's constant).

    Scale shape: one rank window per input list (at corpus scale the
    inputs should already be per-query top-k lists — rank windows
    over result lists, never the corpus; this operator fuses RESULT
    candidates), one full outer join on the id, one ORDER BY LIMIT
    cut. No UDF, no driver state."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")

    def ranked(df, score_col, rank_name):
        w = Window.orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        )
        return (
            df.where(F.col(score_col).isNotNull())
            .select(id_col, score_col)
            .withColumn(rank_name, F.row_number().over(w))
            .select(id_col, rank_name)
        )

    a = ranked(df_a, score_a, "rank_a")
    b = ranked(df_b, score_b, "rank_b")
    fused = a.join(b, id_col, "full_outer").select(
        id_col,
        "rank_a",
        "rank_b",
        F.round(
            F.coalesce(1.0 / (F.lit(k) + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k) + F.col("rank_b")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    ).limit(top_n)


def grouped_auc(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    max_distinct: int = 200_000,
) -> DataFrame:
    """Exact AUC PER SEGMENT — :func:`classifier_metrics`'s rank-sum
    AUC with the value-count frame and rank window keyed by a group
    column: the fairness/segment-evaluation readout ("the model
    ranks well globally — does it rank well for EVERY cohort?").
    A global AUC can hide a segment where the model is no better
    than chance; this is the table that shows it.

    Pinned semantics (oracle-replicated):

    - same domain pins as classifier_metrics: NULL group/score/label
      drop, labels 0/1 fail-loud, scores used raw (rank-based);
    - average ranks over the segment's pooled scores (ties counted
      half — exact trapezoidal ROC area), computed per group:
      AUC = (R₁ − n₁(n₁+1)/2)/(n₁n₀);
    - output per group: (group, n_pos, n_neg, auc) — auc NULL when a
      segment lacks either class (single-class segments are the
      common fairness-audit trap: NULL says "unmeasurable", 0.5
      would lie); 6dp;
    - ``max_distinct`` bounds the (group, score) frame fail-loud —
      quantize scores first, the ks_drift house convention.

    Scale shape: ONE (group, score) hash aggregation collapses the
    corpus, one group-partitioned cumulative window over THAT frame,
    one group-sized reduce. The corpus is scanned exactly once;
    windows never see raw rows."""
    from pyspark.sql import Window

    g = F.col(group_col)
    s = F.col(score_col).cast("double")
    lab = F.col(label_col).cast("int")
    base = df.where(g.isNotNull() & s.isNotNull() & lab.isNotNull()).select(
        g.alias("__g"), s.alias("__s"), lab.alias("__y")
    )
    chk = base.where((F.col("__y") != 0) & (F.col("__y") != 1))
    if chk.limit(1).count() > 0:
        raise ValueError(f"grouped_auc: {label_col} must be binary 0/1")
    vc = base.groupBy("__g", "__s").agg(
        F.sum(F.when(F.col("__y") == 1, 1).otherwise(0))
        .cast("double")
        .alias("__cp"),
        F.sum(F.when(F.col("__y") == 0, 1).otherwise(0))
        .cast("double")
        .alias("__cn"),
    )
    n_distinct = vc.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"grouped_auc: {n_distinct} (group, score) cells (> "
            f"max_distinct={max_distinct}); quantize scores first "
            "(e.g. F.round(score, 4)) or raise max_distinct."
        )
    w = Window.partitionBy("__g").orderBy(F.col("__s").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t_all = F.col("__cp") + F.col("__cn")
    ranked = vc.select(
        "__g",
        "__cp",
        "__cn",
        (
            F.sum(t_all).over(w) - t_all + (t_all + F.lit(1)) / F.lit(2.0)
        ).alias("__r"),
    )
    y1, y0 = F.col("__cp"), F.col("__cn")
    agg = ranked.groupBy(F.col("__g").alias(group_col)).agg(
        F.sum(y1).alias("np"),
        F.sum(y0).alias("nn"),
        F.sum(y1 * F.col("__r")).alias("rp"),
    )
    np_, nn_ = F.col("np"), F.col("nn")
    auc = (F.col("rp") - np_ * (np_ + F.lit(1.0)) / F.lit(2.0)) / (np_ * nn_)
    return agg.select(
        F.col(group_col),
        np_.cast("long").alias("n_pos"),
        nn_.cast("long").alias("n_neg"),
        F.round(F.when((np_ > 0) & (nn_ > 0), auc), 6).alias("auc"),
    )
