"""Document novelty scoring — how much of each document's k-shingle
set appears NOWHERE else in the corpus: the diversity/informativeness
axis of training-data curation (dedup removes copies; novelty RANKS
the survivors — a doc of boilerplate shingles scores ~0, genuinely
new content ~1). The per-document companion of the corpus-level
repeated-span removers (operators/corpus.py) and the DSIR/quality
samplers that consume a per-doc score. Beyond-reference scope.

Pinned semantics (oracle-replicated):

- shingles = the shared DISTINCT k-token shingle contract
  (operators/dedup.shingles — short docs collapse to one whole-doc
  shingle; blank docs have none);
- df(shingle) = number of DOCUMENTS containing it (distinct per doc
  by construction);
- per doc: (id, n_shingles, novelty, mean_log_df) where novelty =
  fraction of the doc's shingles with df == 1 (6dp) and mean_log_df
  = mean ln(df) over its shingles (6dp — 0 for an all-unique doc,
  grows with how boilerplate the doc is);
- docs with NO shingles (NULL/blank text) yield n_shingles = 0 and
  NULL novelty/mean_log_df (no evidence).

Scale shape: one explode → ONE (shingle → df) hash aggregation
(vocabulary-sized, map-side partials) → join back ON THE SHINGLE
(the tfidf unhinted-join contract: AQE decides broadcast vs shuffle)
→ one per-doc aggregation. Shuffles carry shingle hashes and (id,
df) ints — never document text. A LEFT join from the doc id frame
restores zero-shingle docs."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["novelty_scores"]


def novelty_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(id, n_shingles, novelty, mean_log_df) — module pins."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from ai_etl_framework_spark.operators.dedup import shingles

    sh = df.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), k)).alias("__sh"),
    )
    dfreq = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
    per_doc = (
        sh.join(dfreq, "__sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.round(
                F.avg(F.when(F.col("__df") == 1, 1.0).otherwise(0.0)), 6
            ).alias("novelty"),
            F.round(F.avg(F.log(F.col("__df").cast("double"))), 6).alias(
                "mean_log_df"
            ),
        )
    )
    ids = df.select(F.col(id_col)).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
        "novelty",
        "mean_log_df",
    )
