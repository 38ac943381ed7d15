"""N-gram language-model perplexity filtering — the CCNet rule
(Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data": score each document with a reference
LM and keep the low-perplexity bucket). CCNet uses a KenLM 5-gram;
that toolchain isn't in this container and a 5-gram table would be
needlessly sparse on the synthetic corpus, so this module implements
the same pipeline stage with an add-k-smoothed BIGRAM model whose
training and scoring are both plain DataFrame aggregations/joins —
fully distributed AND fully oracle-replicable in SQL (no binary model
artifact, no Python in the hot path).

Model (standard add-k / Lidstone smoothing):
    P(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k·V)
- ``c(w1,w2)``: bigram count in the reference corpus;
- ``c(w1)``: count of w1 as a bigram FIRST (so the conditional sums
  to 1 over the vocabulary);
- ``V``: reference vocabulary size (distinct tokens);
- unseen w1 (never a bigram-first in the reference) backs off to the
  uniform 1/V.

Document score: ppl = exp(-mean ln P) over the document's bigrams —
documents with fewer than 2 tokens have no bigrams and score NULL
(callers decide; the filter keeps them by default, matching CCNet's
"no evidence" treatment of near-empty lines).

Scale shape: training is two hash aggregations over exploded bigrams
(map-side partials collapse repeats) plus one scalar (V) on the
driver — bounded like the IVF centroid collect. Scoring explodes the
target corpus's bigrams once and LEFT JOINs the bigram and
first-token tables on their natural keys; both sides hash-partition
on the join key, AQE broadcasts a small reference LM, and a genuinely
huge LM degrades to a co-partitioned shuffle join instead of a
driver/broadcast OOM. One final aggregation re-groups per document.
Tokenization is whitespace splitting (empty dropped) — byte-identical
to :func:`...corpus.repeated_span_dedup`'s contract.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ai_etl_framework_spark.functions.text import ws_tokens as _ws_tokens

__all__ = [
    "BigramLM",
    "fit_bigram_lm",
    "perplexity_score",
    "perplexity_filter",
    "perplexity_buckets",
]


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per consecutive token pair."""
    toks = _ws_tokens(F.col(text_col))
    n = F.size("__ts")
    return (
        df.select(F.col(id_col), toks.alias("__ts"))
        .select(
            id_col,
            F.explode(
                F.when(
                    n >= 2,
                    F.transform(
                        F.sequence(F.lit(0), n - 2),
                        lambda i: F.struct(
                            F.element_at(F.col("__ts"), i + 1).alias("w1"),
                            F.element_at(F.col("__ts"), i + 2).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            ).alias("__bg"),
        )
        .select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    )


@dataclass
class BigramLM:
    """Fitted model: two small DataFrames + the smoothing scalars.

    ``bigrams``: (w1, w2, logp) for every OBSERVED bigram;
    ``firsts``: (w1, logp_unseen) — the smoothed log-prob of an
    UNOBSERVED continuation of an observed first token;
    ``vocab_size`` / ``add_k`` / ``logp_oov``: scalars (logp_oov =
    -ln V, the uniform back-off for an unseen first token).

    Both tables come back PERSISTED (memory-and-disk): without it the
    reference corpus's tokenize/explode/aggregate lineage would
    re-execute on every action over every scored frame — at scale,
    "training" would silently dominate each downstream job. Call
    :meth:`unpersist` when done.
    """

    bigrams: DataFrame
    firsts: DataFrame
    vocab_size: int
    add_k: float
    logp_oov: float

    def unpersist(self) -> None:
        self.bigrams.unpersist()
        self.firsts.unpersist()


def fit_bigram_lm(
    ref: DataFrame, text_col: str = "text", add_k: float = 0.5
) -> BigramLM:
    """Fit the reference LM. Deterministic; the only driver-side value
    is the vocabulary-size scalar."""
    if add_k <= 0:
        raise ValueError("add_k must be > 0 (unsmoothed zeros break log)")
    pairs = _bigram_rows(ref.select(F.lit(1).alias("__id"), text_col), "__id", text_col)
    vocab_size = (
        ref.select(F.explode(_ws_tokens(F.col(text_col))).alias("t"))
        .agg(F.countDistinct("t"))
        .collect()[0][0]
    )
    if not vocab_size:
        raise ValueError("reference corpus has no tokens")
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    denom = F.col("c1") + F.lit(add_k * vocab_size)
    bigrams = (
        c12.join(c1, "w1")
        .select(
            "w1",
            "w2",
            F.log((F.col("c12") + F.lit(add_k)) / denom).alias("logp"),
        )
    )
    firsts = c1.select(
        "w1", F.log(F.lit(add_k) / denom).alias("logp_unseen")
    )
    return BigramLM(
        bigrams=bigrams.persist(),
        firsts=firsts.persist(),
        vocab_size=int(vocab_size),
        add_k=add_k,
        logp_oov=-math.log(vocab_size),
    )


def perplexity_score(
    df: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    ppl_col: str = "ppl",
    n_col: str = "n_bigrams",
    round_to: int = 4,
    hint_broadcast: bool = False,
) -> DataFrame:
    """Append per-document perplexity under ``lm``.

    Output: every input id with ``n_col`` (bigram count, 0 for docs
    under 2 tokens) and ``ppl_col`` (rounded; NULL when ``n_col`` is
    0). Rounding bounds the cross-engine float-association noise of
    the log-prob sum the same way the quality metrics do.

    ``hint_broadcast=True`` pins both LM tables as broadcast builds —
    set it when the reference LM is KNOWN small (the usual CCNet
    shape: a curated reference corpus), guaranteeing the target's
    exploded bigrams never shuffle for the probes. The default leaves
    the choice to AQE's measured sizes, which keeps a genuinely huge
    LM on the safe co-partitioned shuffle-join path (and may leave a
    small LM's bigram probe on it too — AQE only converts stages its
    heuristics can re-plan, so pass the hint when smallness is a
    fact, not a measurement).
    """
    bigrams, firsts = lm.bigrams, lm.firsts
    if hint_broadcast:
        bigrams, firsts = F.broadcast(bigrams), F.broadcast(firsts)
    pairs = _bigram_rows(df, id_col, text_col)
    scored = (
        pairs.join(bigrams, ["w1", "w2"], "left")
        .join(firsts, ["w1"], "left")
        .select(
            id_col,
            F.coalesce(
                F.col("logp"), F.col("logp_unseen"), F.lit(lm.logp_oov)
            ).alias("__lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias(n_col),
        F.round(F.exp(-F.avg("__lp")), round_to).alias(ppl_col),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(n_col), F.lit(0)).cast("long").alias(n_col),
            F.col(ppl_col),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    quantiles: tuple[float, float] = (1 / 3, 2 / 3),
    bucket_col: str = "ppl_bucket",
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4): score
    every document's perplexity under ``lm``, compute the two
    corpus-level perplexity quantile cut points, and label each
    document ``head`` (ppl ≤ q1 cut — the cleanest third), ``middle``,
    or ``tail``. CCNet trains on head+middle and discards or
    down-weights tail; compose with
    :func:`...ml.quality_filter.pareto_resample` for the stochastic
    variant. Documents with no bigrams score NULL and get a NULL
    bucket (the same "no evidence" contract as
    :func:`perplexity_filter`).

    Returns ``(id_col, n_bigrams, ppl, bucket_col)``.

    Cut points are EXACT ``percentile`` by default — the oracle's
    ``quantile_cont`` semantics, linear interpolation, rounded 4dp so
    the bucket comparison is bit-stable across engines. Exact
    percentile buffers the (already per-document-aggregated) ppl
    values per partition; at 100 TB pass ``approx=True`` for the
    KLL-sketch ``percentile_approx`` with bounded memory — the same
    exact/approx dual as the IQR anomaly detector. The cut points are
    two scalars collected on the driver (bounded, like the LM's
    vocabulary size); the bucket label itself is then a pure
    projection, so retries and partition layout cannot flip a
    document's bucket.
    """
    q1, q2 = quantiles
    if not (0.0 < q1 < q2 < 1.0):
        raise ValueError(
            f"quantiles must satisfy 0 < q1 < q2 < 1, got {quantiles!r}"
        )
    scored = perplexity_score(df, lm, id_col, text_col)
    nn = scored.where(F.col("ppl").isNotNull())
    if approx:
        cuts_expr = F.percentile_approx(
            "ppl", [float(q1), float(q2)], approx_accuracy
        )
    else:
        cuts_expr = F.percentile("ppl", [float(q1), float(q2)])
    row = nn.agg(
        F.transform(cuts_expr, lambda c: F.round(c, 4)).alias("cuts")
    ).collect()[0]
    cuts = row["cuts"]
    if cuts is None or cuts[0] is None:  # no scoreable documents at all
        return scored.withColumn(bucket_col, F.lit(None).cast("string"))
    c1, c2 = float(cuts[0]), float(cuts[1])
    bucket = (
        F.when(F.col("ppl").isNull(), F.lit(None).cast("string"))
        .when(F.col("ppl") <= c1, F.lit("head"))
        .when(F.col("ppl") <= c2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.withColumn(bucket_col, bucket)


def perplexity_filter(
    df: DataFrame,
    lm: BigramLM,
    max_ppl: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_scoreless: bool = True,
) -> DataFrame:
    """Keep documents with ``ppl <= max_ppl``. Documents with no
    bigrams have no evidence: kept by default (CCNet treats unscored
    lines as pass-through), droppable via ``keep_scoreless=False``."""
    scored = perplexity_score(df, lm, id_col, text_col)
    cond = F.col("ppl") <= max_ppl
    if keep_scoreless:
        cond = cond | F.col("ppl").isNull()
    keep_ids = scored.where(cond).select(id_col)
    return df.join(keep_ids, id_col, "left_semi")
