"""Probabilistic record linkage scoring — Fellegi–Sunter (JASA 1969)
match weights over blocked candidate pairs: each comparison field
contributes log2(m/u) when it agrees and log2((1−m)/(1−u)) when it
disagrees (m = P(agree | match), u = P(agree | non-match)); the pair
score is the sum, and the score distribution is what a linkage
reviewer thresholds into match / possible / non-match. The scoring
layer that sits ON TOP of this engine's blocking (blocking_stats,
x98), string-similarity (x38 Ed-Join), and survivorship
(golden_record, x55) pieces. Beyond-reference analytics scope (grep
'fellegi\\|record linkage' over /root/reference/src: zero hits).

Pinned semantics (oracle-replicated):

- candidate pairs = same block (equality on every ``block_cols``
  value, NULL-free: rows with any NULL block value drop — they block
  with nothing), id_a < id_b (unordered, no self-pairs);
- per comparison field: AGREE when both values are non-NULL and
  equal; DISAGREE when both non-NULL and unequal; MISSING when
  either is NULL — missing fields contribute weight 0 (the standard
  FS missing-data convention) and pattern char '?';
- field weights from caller-pinned (m, u): agree → log2(m/u),
  disagree → log2((1−m)/(1−u)); 0 < u < m < 1 enforced fail-loud
  (m ≤ u makes agreement evidence AGAINST a match — almost always a
  parameter bug);
- output is the PATTERN table, one row per distinct agreement
  pattern: (pattern, n_pairs, score) — pattern = one char per field
  in argument order ('1' agree / '0' disagree / '?' missing), score
  rounded 6dp, sorted by (score DESC, pattern ASC). Bounded by
  3^|fields| rows, never by pair count;
- ``max_block_size`` fails loud when any block exceeds it (pairs per
  block grow quadratically; the error names the knobs: tighter
  blocks or blocking_stats to inspect the distribution first).

Scale shape: one NULL-free projection, ONE block-size guard
aggregation (1-row max), one self-join CO-PARTITIONED ON THE BLOCK
KEY (fan-out = block_size² bounded by max_block_size), then ONE hash
aggregation to the pattern table. Only (id, block key, comparison
fields) move — never whole rows."""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

__all__ = ["fs_match_patterns"]


def fs_match_patterns(
    df: DataFrame,
    id_col: str,
    block_cols: Sequence[str],
    field_params: Mapping[str, Tuple[float, float]],
    max_block_size: int = 1000,
) -> DataFrame:
    """(pattern, n_pairs, score) per agreement pattern — module pins.

    ``field_params`` maps comparison column → (m, u)."""
    if not block_cols:
        raise ValueError("fs_match_patterns: block_cols must be non-empty")
    if not field_params:
        raise ValueError("fs_match_patterns: field_params must be non-empty")
    if max_block_size < 2:
        raise ValueError(
            f"fs_match_patterns: max_block_size must be >= 2, got "
            f"{max_block_size}"
        )
    import math

    weights = {}
    for fld, (m, u) in field_params.items():
        if not (0.0 < u < m < 1.0):
            raise ValueError(
                f"fs_match_patterns: field {fld!r} needs 0 < u < m < 1, "
                f"got m={m}, u={u}"
            )
        weights[fld] = (math.log2(m / u), math.log2((1 - m) / (1 - u)))

    fields = list(field_params)
    base = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in block_cols],
        *[F.col(f) for f in fields],
    )
    for c in block_cols:
        base = base.where(F.col(c).isNotNull())

    biggest = (
        base.groupBy(*[F.col(c) for c in block_cols])
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.coalesce(F.max("__n"), F.lit(0)))
        .first()[0]
    )
    if biggest > max_block_size:
        raise ValueError(
            f"fs_match_patterns: largest block holds {biggest} rows "
            f"(> max_block_size={max_block_size}) — "
            f"{biggest * (biggest - 1) // 2} pairs from one block. "
            "Tighten block_cols (add a field, bucket a numeric) or run "
            "blocking_stats to inspect the block-size distribution first."
        )

    a = base.select(
        F.col("__id").alias("__ida"),
        *[F.col(c) for c in block_cols],
        *[F.col(f).alias(f"__a_{f}") for f in fields],
    )
    b = base.select(
        F.col("__id").alias("__idb"),
        *[F.col(c) for c in block_cols],
        *[F.col(f).alias(f"__b_{f}") for f in fields],
    )
    pairs = a.join(b, list(block_cols)).where(F.col("__ida") < F.col("__idb"))

    chars = []
    score = F.lit(0.0)
    for f in fields:
        va, vb = F.col(f"__a_{f}"), F.col(f"__b_{f}")
        missing = va.isNull() | vb.isNull()
        agree = va == vb
        chars.append(
            F.when(missing, F.lit("?"))
            .when(agree, F.lit("1"))
            .otherwise(F.lit("0"))
        )
        w_agree, w_disagree = weights[f]
        score = score + F.when(missing, F.lit(0.0)).when(
            agree, F.lit(w_agree)
        ).otherwise(F.lit(w_disagree))

    scored = pairs.select(
        F.concat(*chars).alias("pattern"), F.round(score, 6).alias("score")
    )
    return (
        scored.groupBy("pattern", "score")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .select("pattern", "n_pairs", "score")
        .orderBy(F.col("score").desc(), F.col("pattern").asc())
    )
