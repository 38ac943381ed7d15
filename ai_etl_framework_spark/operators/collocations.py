"""Collocation mining — corpus bigram PMI (pointwise mutual
information): the phrase-mining primitive ("new york", "machine
learning") every tokenizer-vocabulary and corpus-analysis pipeline
wants next to raw token counts (txt09). Standard PMI (Church & Hanks
1990): PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ). Beyond-reference scope
(grep pmi/collocation over /root/reference/src: zero hits).

Pinned semantics (oracle-replicated):

- tokens = the shared case-folded whitespace tokenizer
  (functions/text.tokens — one definition, one SQL twin fragment);
- bigrams = adjacent token pairs WITHIN a document (never across
  document boundaries); documents with <2 tokens contribute none;
- p(a,b) = c(a,b) / N_bigrams; p(a) = c(a) / N_tokens, both corpus
  totals — the textbook estimator (unigram and bigram event spaces
  differ by |docs|; that constant offsets ALL scores equally and is
  part of the pinned definition);
- output: (w1, w2, n_pair, pmi) for pairs with c(a,b) ≥ min_count,
  top_k by (pmi 6dp DESC, w1 ASC, w2 ASC) — ordering on the ROUNDED
  score so the cut is engine-stable; pmi rounded 6dp.

Scale shape: one explode → ONE pair hash aggregation (map-side
partials collapse the Zipf head), one token hash aggregation, then
the pair frame joins the unigram-count frame twice ON THE WORD (the
tfidf unhinted-join contract: vocabulary-sized, AQE decides broadcast
vs shuffle) and a 2-scalar cross join. min_count prunes BEFORE the
joins, so only frequent pairs move."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pmi_collocations"]


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """(w1, w2, n_pair, pmi) — module pins."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from ai_etl_framework_spark.functions.text import tokens

    t = tokens(F.col(text_col))
    toks = df.select(t.alias("__t"))
    n = F.size("__t")
    pairs = toks.where(n >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at("__t", i).alias("w1"),
                    F.element_at("__t", i + 1).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    unis = toks.select(F.explode("__t").alias("w"))
    uni_counts = unis.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = unis.agg(F.count(F.lit(1)).alias("n_tok")).crossJoin(
        pairs.agg(F.count(F.lit(1)).alias("n_bi"))
    )
    pair_counts = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
    )
    ca = uni_counts.select(F.col("w").alias("w1"), F.col("c").alias("__ca"))
    cb = uni_counts.select(F.col("w").alias("w2"), F.col("c").alias("__cb"))
    scored = (
        pair_counts.join(ca, "w1")
        .join(cb, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("n_bi"))
                    / (
                        (F.col("__ca") / F.col("n_tok"))
                        * (F.col("__cb") / F.col("n_tok"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(top_k)
