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
    w_sys = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    w_ideal = Window.partitionBy(query_col).orderBy(
        F.col(relevance_col).desc(), F.col(id_col).asc()
    )
    ranked = base.select(
        F.col(query_col),
        F.col(relevance_col).cast("double").alias("__rel"),
        F.row_number().over(w_sys).alias("__r_sys"),
        F.row_number().over(w_ideal).alias("__r_ideal"),
    )
    dcg = F.sum(
        F.when(
            F.col("__r_sys") <= k,
            F.col("__rel") / F.log2(F.col("__r_sys") + 1),
        ).otherwise(0.0)
    )
    idcg = F.sum(
        F.when(
            F.col("__r_ideal") <= k,
            F.col("__rel") / F.log2(F.col("__r_ideal") + 1),
        ).otherwise(0.0)
    )
    return ranked.groupBy(query_col).agg(
        F.round(F.try_divide(dcg, idcg), 6).alias("ndcg"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
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
    w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    ranked = base.select(
        F.col(query_col),
        F.col(relevance_col).cast("double").alias("__rel"),
        F.row_number().over(w).alias("__r"),
    )
    first_rel = F.min(
        F.when((F.col("__rel") > 0) & (F.col("__r") <= k), F.col("__r"))
    )
    return ranked.groupBy(query_col).agg(
        F.round(
            F.coalesce(F.lit(1.0) / first_rel, F.lit(0.0)), 6
        ).alias("rr"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
