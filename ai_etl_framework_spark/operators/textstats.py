"""Character-distribution statistics — Shannon entropy per document,
the gibberish/encoding-noise signal quality pipelines add on top of
token-level heuristics (Gopher's repetition rules catch REPEATED
garbage; entropy catches uniform garbage — base64 blobs, minified
code, key dumps score ~6 bits/char while natural English sits around
4.0-4.5). Beyond-reference scope (grep entropy over
/root/reference/src: zero hits); complements functions/text.py's
token-level quality_score (txt03).

Pinned semantics (oracle-replicated — DuckDB's ``entropy()`` is the
twin, which is log2-based, so bits):

- characters of the RAW text (no normalization — whitespace and case
  ARE signal here: a doc that is one repeated space has entropy 0);
- ``entropy`` = −Σ (c/n)·log2(c/n) over the per-character counts,
  rounded 6dp; ``n_chars`` = total characters;
- docs with NULL or empty text produce NO row (no distribution to
  measure) — the same join-semantics convention as tf-idf's
  token-less docs.

Scale shape: explode to (doc, char) → ONE (doc, char) hash count
with map-side partials (the alphabet collapses hard: ≤ a few hundred
distinct chars per doc, so partials shrink each task's output to
|doc × alphabet|) → one per-doc aggregation computing n and the
p·log p sum in the same pass. Text leaves the scan as single chars
already paired with the doc id; nothing else shuffles."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["char_entropy", "readability"]


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_chars, entropy): per-document character count and
    Shannon entropy in bits. See module docstring for the pins."""
    chars = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.col(text_col), "")).alias("ch"),
    ).where(F.col("ch") != "")
    counts = chars.groupBy("__id", "ch").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    return (
        counts.groupBy("__id")
        .agg(
            F.sum("c").cast("long").alias("n_chars"),
            # -sum(c*log2(c))/n + log2(n) == -sum((c/n)*log2(c/n)):
            # one pass, no second join against the per-doc total
            F.round(
                F.log2(F.sum("c"))
                - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
                6,
            ).alias("entropy"),
        )
        .select(F.col("__id").alias(id_col), "n_chars", "entropy")
    )


def readability(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading-ease per document with the classic vowel-group
    syllable heuristic — the readability axis of corpus quality
    scoring (very low scores flag legalese/boilerplate; implausibly
    high ones flag token soup). Formula (Flesch 1948):
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).

    Pinned semantics (oracle-replicated):
    - words = the shared case-folded whitespace tokenizer's count;
    - sentences = number of ``[.!?]+`` runs, floored at 1 whenever the
      doc has words (unterminated text is one sentence);
    - syllables = number of ``[aeiouy]+`` vowel groups in the
      lower-cased text — whitespace breaks groups, so the corpus total
      equals the per-word sum without per-word processing (the
      heuristic undercounts hiatus and overcounts silent e; it is THE
      standard cheap estimator and is pinned as such);
    - docs with zero words (NULL/blank text) yield NULL sentences /
      flesch (a readability score of nothing is not a number);
      flesch rounded 4dp, unclamped (the raw formula can leave
      [0, 100] on degenerate text — clamping would hide exactly the
      outliers this exists to flag).

    Scale shape: one projection — two regexp counts + one split per
    row, no shuffle, no UDF; whole-stage codegen end to end."""
    from ai_etl_framework_spark.functions.text import tokens

    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    words = F.size(tokens(F.col(text_col)))
    sents = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1))
    syl = F.regexp_count(t, F.lit(r"[aeiouy]+"))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sents)
        - F.lit(84.6) * (syl / words)
    )
    has_words = words > 0
    return df.select(
        F.col(id_col),
        words.cast("long").alias("words"),
        F.when(has_words, sents).cast("long").alias("sentences"),
        F.when(has_words, syl).cast("long").alias("syllables"),
        F.when(has_words, F.round(flesch, 4)).alias("flesch"),
    )
