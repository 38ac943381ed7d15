"""TF-IDF term scoring — corpus keyword extraction / topic signatures
(Salton & Buckley 1988; the smoothed-idf variant every IR stack
ships). No reference-repo counterpart (grep tfidf/tf_idf/idf over
/root/reference/src: zero hits) — beyond-reference curation scope:
top terms per document label corpora for mixture balancing and make
dataset cards interpretable.

Definitions (pinned, oracle-replicated):

- ``tf(t, d)``  = occurrences of t in d / total tokens in d
- ``idf(t)``    = ln((N + 1) / (df_t + 1)) + 1  (smoothed; never
  negative, never divides by zero — scikit-learn's convention)
- ``score``     = tf · idf, ties broken term-ascending.

Scale shape: one (term, df) hash aggregation to a vocab-sized frame
(map-side partials collapse the Zipf head), joined back over the
exploded (doc, term, tf) counts with NO mandatory broadcast — AQE
picks broadcast vs sort-merge from the idf frame's measured size,
because a web corpus vocabulary is unbounded — the corpus shuffles
once as int/short-string pairs, never as documents — and per-doc
top-k is a rank-over-window that Spark 4 executes as
WindowGroupLimit: each
partition keeps only k rows per doc BEFORE the shuffle, so the window
never materializes full per-doc term lists."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

from ai_etl_framework_spark.functions.text import tokens as _tokens

__all__ = ["doc_frequencies", "tfidf_topk_terms"]


def doc_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, df) — number of DOCUMENTS containing each term, via the
    per-(doc, term) distinct then one count; vocab-sized output."""
    return (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("__id", "term")
        .agg(F.lit(1))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )


def tfidf_topk_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_small: bool = False,
) -> DataFrame:
    """Top-k terms per document by tf·idf: (id, term, rank, tf_idf).
    Documents with no tokens produce no rows. Deterministic: score
    DESC then term ASC. N is the total document count (one scalar),
    idf smoothed so unseen/ubiquitous terms stay finite.

    The tf⋈idf join carries NO mandatory broadcast hint: the idf frame
    has one row per distinct corpus term, and web-scale text has a
    billions-row vocabulary (typos, URLs, code) — a forced broadcast
    is a driver/executor OOM at 100 TB. AQE broadcasts from MEASURED
    size when the vocab actually fits (same contract as the frequent-
    set join in repeated_span_dedup); pass ``vocab_small=True`` only
    when the caller KNOWS the vocabulary is bounded (e.g. a fixed
    controlled tag set) to pin the hint statically."""
    n_docs = df.count()
    # ONE tokenize/explode pass, persisted: the (doc, term) count
    # frame feeds BOTH tf·idf scoring and the per-term document
    # frequency. Before r13 the idf branch re-exploded (re-tokenized)
    # the whole corpus a second time — at 100 TB that doubles the
    # heaviest map stage; ReuseExchange can't dedupe the branches
    # because column pruning rewrites the idf side's sub-aggregate
    # into a distinct that no longer canonically matches. Persist is
    # the house pattern for dual-consumed frames (lm.py, ranks.py);
    # MEMORY_AND_DISK so wide corpora spill instead of OOM. The frame
    # stays persisted for the caller's action (same contract as
    # train_bigram_lm's returned frames).
    tf = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
        .withColumn("n_doc", F.sum("n").over(Window.partitionBy("__id")))
    )
    # df_t = number of documents containing t ≡ rows per term in the
    # persisted (doc, term) frame — no second corpus scan, no DISTINCT.
    idf = tf.groupBy("term").agg(
        (
            F.log(F.lit(float(n_docs + 1)) / (F.count(F.lit(1)) + 1))
            + 1.0
        ).alias("idf")
    )
    if vocab_small:
        idf = F.broadcast(idf)
    scored = tf.join(idf, "term").select(
        "__id",
        "term",
        ((F.col("n") / F.col("n_doc")) * F.col("idf")).alias("tf_idf"),
    )
    w = Window.partitionBy("__id").orderBy(
        F.col("tf_idf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(F.col("__id").alias(id_col), "term", "rank", "tf_idf")
    )
