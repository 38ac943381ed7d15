"""Embedding-table profiling — per-label centroids and norm profiles
in LONG format: the health table for any vector corpus (degenerate
labels show up as near-zero norm spread; drifted encoders as moved
centroids; dead dimensions as all-zero centroid positions). Feeds the
IVF/SemDeDup operators (their cells/blocks are only as good as the
label geometry). Beyond-reference scope (the reference has no vector
surface).

Pinned semantics (oracle-replicated):

``embedding_label_stats`` — one row per (label, dim position):
(label, pos, centroid, n, avg_norm, sd_norm) where
- pos is 1-based (both engines' ordinality convention);
- centroid = mean of component pos over the label's non-NULL vectors
  (6dp);
- n / avg_norm / sd_norm are per-LABEL scalars repeated on each of
  the label's rows (the long-format rider pattern): vector count,
  mean and population-σ of the L2 norms (6dp);
- NULL embeddings are dropped; NULL labels form their own group is
  NOT the case — NULL labels are dropped too (a NULL label has no
  cell);
- ragged inputs: every (label, pos) pair observed anywhere in the
  label's vectors gets a row; the centroid averages over the vectors
  that HAVE that position.

Scale shape: norms are one JVM expression per row (functions/
similarity.norm — whole-stage codegen, no UDF); the per-position
explode shuffles |rows|·dim (label, pos, component) triples into ONE
hash aggregation — the standard dimension-unpivot shape, linear in
data volume, never all-pairs. The norm scalars aggregate separately
(label-sized frame) and broadcast-join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["embedding_label_stats"]


def embedding_label_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(label, pos, centroid, n, avg_norm, sd_norm) — module pins."""
    from ai_etl_framework_spark.functions.similarity import norm

    base = df.where(
        F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
    )
    norms = base.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg(norm(F.col(vec_col))), 6).alias("avg_norm"),
        F.round(F.stddev_pop(norm(F.col(vec_col))), 6).alias("sd_norm"),
    )
    comps = base.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos0", "comp"),
    )
    cent = comps.groupBy(
        "label", (F.col("pos0") + 1).cast("long").alias("pos")
    ).agg(F.round(F.avg(F.col("comp").cast("double")), 6).alias("centroid"))
    return cent.join(F.broadcast(norms), "label").select(
        "label", "pos", "centroid", "n", "avg_norm", "sd_norm"
    )
