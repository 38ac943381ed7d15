"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS). No reference-repo counterpart (grep dsir/importance/resampl
over /root/reference/src: zero hits) — beyond-reference training-data
scope like the corpus suite.

The published pipeline selects raw-corpus documents whose hashed
n-gram distribution looks like a TARGET corpus (e.g. Wikipedia +
books): fit bag-of-hashed-ngrams unigram models p (target) and q
(raw), weight each raw document by ``log w = Σ_g [ln p(b_g) −
ln q(b_g)]`` over its n-gram occurrences, then sample without
replacement with Gumbel top-k: ``keep top-k of (log w + Gumbel
noise)``.

Spark shape — every step stays JVM-side and int-shaped:

- **Featurize**: word unigrams + bigrams hashed to ``buckets`` ids via
  the engine-independent md5-hex idiom (first 8 hex chars → uint32 →
  mod B) shared with the minhash family, so the DuckDB oracle twin is
  bit-identical. Gram STRINGS never leave the projection — what
  shuffles is (doc_id, bucket) int pairs, map-side combined.
- **Fit**: each model is ONE hash aggregation to ≤B rows (B is
  vocab-sized: 10⁴–10⁶ even at 100 TB) + a scalar total. Laplace
  add-1 smoothing over the B-bucket support.
- **Weight**: the ≤B-row model broadcasts; per-doc weight is one more
  hash aggregation of cnt·(lp−lq). The corpus text itself never
  shuffles and never enters Python.
- **Resample**: the Gumbel draw is a pure function of (id, seed)
  (hash-seeded like pareto_resample — retry/layout/re-run agnostic),
  and top-k is a global TakeOrderedAndProject (per-partition top-k,
  k rows to the driver), never a full sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ai_etl_framework_spark.functions.text import tokens as _tokens

__all__ = [
    "hashed_ngram_buckets",
    "ngram_bucket_counts",
    "dsir_weights",
    "gumbel_key_expr",
    "dsir_resample",
    "dsir_select",
    "dsir_select_frac",
]


def _md5_bucket(g: Column, buckets: int) -> Column:
    # first 8 md5 hex chars → uint32 → mod B; identical to DuckDB's
    # ('0x' || substr(md5(g), 1, 8))::BIGINT % B (dd02's hash family)
    return (
        F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        % F.lit(buckets)
    )


def hashed_ngram_buckets(
    text: Column, buckets: int = 1024, ns: Sequence[int] = (1, 2)
) -> Column:
    """``array<long>`` of hashed n-gram bucket ids over the lowercased
    whitespace tokens (the shared `tokens` contract; NULL/blank → []).
    Grams are space-joined token windows; only n ∈ {1, 2} are exposed
    (DSIR's published feature set is unigrams+bigrams)."""
    if not ns or any(n not in (1, 2) for n in ns):
        raise ValueError(f"ns must be a non-empty subset of (1, 2), got {ns!r}")
    toks = _tokens(text)
    parts = []
    if 1 in ns:
        parts.append(toks)
    if 2 in ns:
        parts.append(
            F.when(
                F.size(toks) >= 2,
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
            ).otherwise(F.expr("CAST(array() AS array<string>)"))
        )
    grams = parts[0] if len(parts) == 1 else F.concat(*parts)
    return F.transform(grams, lambda g: _md5_bucket(g, buckets))


def ngram_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    buckets: int = 1024,
    ns: Sequence[int] = (1, 2),
) -> DataFrame:
    """(bucket, cnt) over a corpus — the model-fit aggregation. ≤B
    output rows regardless of corpus size; map-side partials collapse
    the Zipf head before the (int, long) shuffle."""
    return (
        df.select(
            F.explode(hashed_ngram_buckets(F.col(text_col), buckets, ns)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    ns: Sequence[int] = (1, 2),
) -> DataFrame:
    """(id, n_grams, logw) for every raw document.

    ``logw = Σ_occurrences [ln p̂(b) − ln q̂(b)]`` with add-1-smoothed
    bucket models fit on the target (p̂) and raw (q̂) corpora:
    ``p̂(b) = (ct_b + 1) / (total_t + B)``. Buckets a raw doc can hit
    are by construction present in the raw model, and absent target
    buckets take the smoothed floor via the left join's NULL → +0.
    Documents with no grams get logw = 0 (explode_outer keeps them).

    The two totals are bounded scalar collects (1 row each — the same
    residue class as the LM vocabulary size); the ≤B-row delta model
    is marked broadcast so the corpus-side join never shuffles text.
    """
    tc = ngram_bucket_counts(target, text_col, buckets, ns)
    rc = ngram_bucket_counts(raw, text_col, buckets, ns)
    total_t = (tc.agg(F.sum("cnt")).collect()[0][0]) or 0
    total_r = (rc.agg(F.sum("cnt")).collect()[0][0]) or 0
    lp_denom = float(total_t + buckets)
    lq_denom = float(total_r + buckets)
    model = (
        rc.withColumnRenamed("cnt", "cr")
        # both sides are ≤B rows; the hint matters for stats-free
        # inputs (createDataFrame/LogicalRDD), which never auto-broadcast
        .join(F.broadcast(tc.withColumnRenamed("cnt", "ct")), "bucket", "left")
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1) / F.lit(lp_denom))
                - F.log((F.col("cr") + 1) / F.lit(lq_denom))
            ).alias("delta"),
        )
    )
    occ = raw.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(
            hashed_ngram_buckets(F.col(text_col), buckets, ns)
        ).alias("bucket"),
    )
    return (
        occ.join(F.broadcast(model), "bucket", "left")
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.col("bucket")).cast("long").alias("n_grams"),
            F.coalesce(F.sum("delta"), F.lit(0.0)).alias("logw"),
        )
    )


def gumbel_key_expr(id_col: Column, logw: Column, seed: int = 0) -> Column:
    """``logw + Gumbel(0,1)`` with the noise inverse-transform sampled
    from a HASH-SEEDED uniform (md5 of "id:seed" → 52-bit mantissa →
    u ∈ (0,1) strictly; g = −ln(−ln u)) — a pure function of
    (id, seed), so retries, partition layout and re-runs agree, and
    the DuckDB oracle reproduces the draw bit-for-bit."""
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}"))), 1, 13),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    return logw + (-F.log(-F.log(u)))


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    ns: Sequence[int] = (1, 2),
    seed: int = 0,
) -> DataFrame:
    """Gumbel top-k importance resampling: keep the k raw documents
    with the largest ``logw + Gumbel`` key — exactly sampling k
    documents WITHOUT replacement with probability ∝ w (the
    Gumbel-max trick), as published. Deterministic given seed.
    Output: (id, n_grams, logw, key), k rows, key-descending."""
    w = dsir_weights(raw, target, text_col, id_col, buckets, ns)
    return (
        w.withColumn("key", gumbel_key_expr(F.col(id_col), F.col("logw"), seed))
        .orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    ns: Sequence[int] = (1, 2),
    seed: int = 0,
) -> DataFrame:
    """The pipeline-stage form of :func:`dsir_resample`: return the
    selected documents THEMSELVES (all original columns) — a broadcast
    semi-join of the corpus against the k resampled ids, so the corpus
    streams through unshuffled."""
    picked = dsir_resample(
        raw, target, k, text_col, id_col, buckets, ns, seed
    ).select(id_col)
    return raw.join(F.broadcast(picked), id_col, "left_semi")


def dsir_select_frac(
    raw: DataFrame,
    target: DataFrame,
    frac: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    ns: Sequence[int] = (1, 2),
    seed: int = 0,
    approx: bool = False,
) -> DataFrame:
    """The 100 TB form of DSIR selection: when the kept set itself is
    huge (k beyond a driver-friendly top-k), cut on the corpus-level
    QUANTILE of the Gumbel-perturbed key instead — keep the top
    ``frac`` of documents by ``logw + Gumbel``. Same sampling
    semantics in expectation; the cut is one scalar aggregation
    (exact ``percentile`` at test scale, ``percentile_approx`` (KLL)
    under ``approx=True`` at 100× — the IQR/x11 dual), then the
    corpus streams through a single filter. Returns the selected rows
    with their ``dsir_key`` attached. ``frac`` ∈ (0, 1]."""
    if not (0.0 < frac <= 1.0):
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    w = dsir_weights(raw, target, text_col, id_col, buckets, ns)
    keyed = w.select(
        id_col, gumbel_key_expr(F.col(id_col), F.col("logw"), seed).alias("dsir_key")
    )
    # persisted (not unpersisted — LRU-evicted) so the weight lineage
    # computes once for the cut and once more never: the returned
    # filter reads the cached keys (the x10 LM-table pattern)
    keyed = keyed.persist()
    q = 1.0 - frac
    cut_fn = (
        F.percentile_approx("dsir_key", q, 10000)
        if approx
        else F.percentile("dsir_key", F.lit(q))
    )
    cut = keyed.agg(cut_fn.alias("c")).collect()[0]["c"]
    if cut is None:  # empty corpus
        return raw.join(keyed, id_col).where(F.lit(False))
    kept = keyed.where(F.col("dsir_key") >= F.lit(float(cut)))
    return raw.join(kept, id_col)
