"""BM25 document retrieval (Robertson & Sparck Jones; the Okapi/
Lucene ranking function behind every full-text search stack). No
reference-repo counterpart (grep bm25/okapi/retriev over
/root/reference/src: zero hits) — beyond-reference curation scope:
keyword retrieval over a training corpus is how data pipelines pull
topic-targeted subsets (e.g. "find the medical docs") and how RAG
evaluation sets get their positives.

Definitions (pinned, oracle-replicated — the Lucene variant):

- ``idf(t)``   = ln(1 + (N − df_t + 0.5) / (df_t + 0.5)), never
  negative (the +1 inside the log is Lucene's fix for df > N/2)
- ``score``    = Σ_{t ∈ query terms, distinct}
  idf(t) · tf · (k1 + 1) / (tf + k1 · (1 − b + b · dl / avgdl))
  with ``tf`` the raw term count in the doc, ``dl`` the doc's token
  count, ``avgdl`` = total tokens / N over the whole corpus.
- ties broken doc-id ascending; docs sharing no query term score 0
  and are not returned.

Scale shape: the query is tokenized DRIVER-side (it is a literal
string); the corpus explode is filtered to the query's terms BEFORE
the (doc, term) aggregation, so only matching postings shuffle —
web-scale corpora explode to |postings of q|, not |all tokens|. The
(term → df) frame is bounded by the query length (a genuinely
bounded broadcast, unlike tf-idf's corpus vocabulary). Doc lengths
are a pure projection aggregated once for the two scalars (N,
avgdl). Top-k is a global ``orderBy().limit(k)`` —
TakeOrderedAndProject, per-partition heaps, no full sort."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from ai_etl_framework_spark.functions.text import tokens as _tokens

__all__ = ["bm25_topk"]


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25: (id, score, n_terms)
    with ``n_terms`` = how many distinct query terms the doc contains.
    Scores rounded 6dp for cross-engine comparison stability."""
    q_terms = sorted({t for t in re.split(r"\s+", query.lower()) if t})
    if not q_terms:
        raise ValueError("query has no tokens")
    stats = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.size(_tokens(F.col(text_col)))).cast("long").alias("toks"),
    ).collect()[0]
    n_docs, total_tokens = stats["n"], stats["toks"] or 0
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = total_tokens / n_docs
    lens = df.select(
        F.col(id_col).alias("__id"),
        F.size(_tokens(F.col(text_col))).cast("double").alias("dl"),
    )
    tf = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .where(F.col("term").isin(q_terms))
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    # (term, df_t): one row per query term present in the corpus —
    # bounded by the query length, so the broadcast is legitimate
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("dft")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, "__id")
        .select(
            "__id",
            (
                idf
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
                )
            ).alias("__c"),
        )
    )
    return (
        contrib.groupBy("__id")
        .agg(
            F.round(F.sum("__c"), 6).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
        .orderBy(F.col("score").desc(), F.col("__id").asc())
        .limit(k)
        .select(F.col("__id").alias(id_col), "score", "n_terms")
    )
