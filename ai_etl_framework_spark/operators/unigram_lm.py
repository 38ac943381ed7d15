"""Unigram-LM tokenizer training + encoding (Kudo 2018, "Subword
Regularization: Improving Neural Network Translation Models with
Multiple Subword Candidates" — the SentencePiece unigram algorithm).
No reference-repo counterpart (grep unigram/sentencepiece/viterbi over
/root/reference/src: zero hits) — beyond-reference tokenizer scope,
the companion of operators/bpe.py.

Like BPE, unigram-LM training touches the corpus exactly once: the
word-frequency table (:func:`ai_etl_framework_spark.operators.bpe.
word_counts`, shared contract) is the sufficient statistic. Everything
after — candidate harvesting, EM, pruning — operates on vocab-sized
data, so the honest production shape is: reduce distributedly, train
on the bounded table (driver-side, fail-loud cap exactly like BPE's
``max_vocab_rows``), broadcast the learned piece table back for
encoding.

Algorithm (faithful to the paper, simplifications documented):

1. **Seed vocabulary**: all substrings of corpus words up to
   ``max_piece_len``, weighted by word frequency; keep the
   ``seed_size`` most frequent plus every single character (character
   coverage guarantees any word stays segmentable).
2. **EM** (``em_iters`` per pruning round): E-step computes each
   piece's EXPECTED count over all segmentations of every word via
   the forward-backward lattice (not Viterbi-hard counts); M-step
   re-normalizes to log-probabilities.
3. **Prune** toward ``vocab_size``: drop the lowest-utility pieces
   (utility = expected count × current log-prob contribution — the
   paper's likelihood-loss ranking approximated by expected-count
   mass, a standard simplification), never dropping single
   characters, shrinking by ``prune_keep`` per round.
4. **Encode**: Viterbi best segmentation under the final piece
   log-probs. Unknown characters fall back to a floor log-prob so
   encoding is total.

Scale notes: :func:`unigram_encode` is the zero-shuffle broadcast
shape shared with ``bpe_encode`` — piece table broadcasts, one
Arrow-batched pandas UDF with a per-worker word cache, corpus bytes
never shuffle and never leave their partition.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "train_unigram_lm",
    "unigram_encode",
    "piece_table_df",
    "viterbi_segment",
]

_FLOOR = -1e2  # unknown-char fallback log-prob (well below any piece)


def _collect_words(
    words: DataFrame, word_col: str, count_col: str, max_vocab_rows: int
) -> list[tuple[str, int]]:
    base = words.select(
        F.col(word_col).cast("string").alias("w"),
        F.col(count_col).cast("long").alias("n"),
    ).where(F.col("w").isNotNull() & (F.col("w") != "") & (F.col("n") > 0))
    n_rows = base.count()
    if n_rows > max_vocab_rows:
        raise ValueError(
            f"word table has {n_rows} rows > max_vocab_rows={max_vocab_rows}; "
            "unigram-LM training operates on the word-frequency table "
            "(vocab-sized even at 100 TB). Either pre-sample the word table "
            "before training (operators/sampling.py deterministic_sample — "
            "the standard tokenizer practice; SentencePiece caps its "
            "training corpus the same way) or raise the cap explicitly if "
            "this corpus genuinely has that many distinct words (same "
            "bounded-collect contract as train_bpe_merges, which offers "
            "distributed=True instead — unigram EM has no in-Spark loop)"
        )
    return [(r["w"], r["n"]) for r in base.collect()]


def _seed_pieces(
    wc: list[tuple[str, int]], max_piece_len: int, seed_size: int
) -> dict[str, float]:
    cand: dict[str, int] = defaultdict(int)
    chars: set[str] = set()
    for w, n in wc:
        chars.update(w)
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                cand[w[i:j]] += n
    multi = sorted(
        ((c, v) for c, v in cand.items() if len(c) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, seed_size - len(chars))]
    pieces = {c: float(cand[c]) for c in chars}
    pieces.update({c: float(v) for c, v in multi})
    total = sum(pieces.values())
    return {p: math.log(v / total) for p, v in pieces.items()}


def _forward_backward(
    w: str, lp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """Expected piece counts over ALL segmentations of one word, and
    the word's total log-likelihood (log-sum over segmentations)."""
    L = len(w)
    alpha = [-math.inf] * (L + 1)
    alpha[0] = 0.0
    for j in range(1, L + 1):
        for i in range(max(0, j - max_len), j):
            p = lp.get(w[i:j])
            if p is not None and alpha[i] != -math.inf:
                v = alpha[i] + p
                alpha[j] = v if alpha[j] == -math.inf else _lse(alpha[j], v)
    if alpha[L] == -math.inf:
        return {}, -math.inf
    beta = [-math.inf] * (L + 1)
    beta[L] = 0.0
    for i in range(L - 1, -1, -1):
        for j in range(i + 1, min(i + max_len, L) + 1):
            p = lp.get(w[i:j])
            if p is not None and beta[j] != -math.inf:
                v = p + beta[j]
                beta[i] = v if beta[i] == -math.inf else _lse(beta[i], v)
    z = alpha[L]
    exp: dict[str, float] = defaultdict(float)
    for i in range(L):
        if alpha[i] == -math.inf:
            continue
        for j in range(i + 1, min(i + max_len, L) + 1):
            p = lp.get(w[i:j])
            if p is not None and beta[j] != -math.inf:
                exp[w[i:j]] += math.exp(alpha[i] + p + beta[j] - z)
    return exp, z


def _lse(a: float, b: float) -> float:
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def _em_round(
    wc: list[tuple[str, int]], lp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    exp: dict[str, float] = defaultdict(float)
    ll = 0.0
    for w, n in wc:
        e, z = _forward_backward(w, lp, max_len)
        if z == -math.inf:
            continue
        ll += n * z
        for piece, c in e.items():
            exp[piece] += n * c
    total = sum(exp.values())
    new = {
        p: math.log(c / total) for p, c in exp.items() if c > 0
    }
    # characters must survive even if expectation-starved this round
    for p in lp:
        if len(p) == 1 and p not in new:
            new[p] = _FLOOR
    return new, ll


def train_unigram_lm(
    words: DataFrame,
    vocab_size: int = 400,
    max_piece_len: int = 8,
    word_col: str = "word",
    count_col: str = "n",
    seed_mult: int = 4,
    em_iters: int = 2,
    prune_keep: float = 0.75,
    max_vocab_rows: int = 2_000_000,
) -> dict[str, float]:
    """Learn a unigram-LM piece table {piece: log-prob} from a
    (word, count) frame (the output of ``bpe.word_counts`` — shared
    tokenization contract). Deterministic: ties in seeding and
    pruning break lexicographically. The returned table always
    contains every character seen in training."""
    wc = _collect_words(words, word_col, count_col, max_vocab_rows)
    if not wc:
        return {}
    lp = _seed_pieces(wc, max_piece_len, seed_mult * vocab_size)
    for _ in range(em_iters):
        lp, _ = _em_round(wc, lp, max_piece_len)
    while True:
        n_chars = sum(1 for p in lp if len(p) == 1)
        n_multi = len(lp) - n_chars
        target_multi = max(0, vocab_size - n_chars)
        if n_multi <= target_multi:
            break
        # shrink gradually (prune_keep per round) so EM can re-assign
        # mass between prunes, but never below the target; progress is
        # guaranteed (int floor makes keep < n_multi whenever pruning
        # is needed). Rank multi-char pieces by probability — after EM
        # the prob IS the normalized expected mass, the paper's
        # likelihood-loss ranking in its standard approximation.
        keep = max(target_multi, int(n_multi * prune_keep))
        if keep >= n_multi:
            keep = target_multi
        ranked = sorted(
            ((p, v) for p, v in lp.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        lp = {p: v for p, v in lp.items() if len(p) == 1}
        lp.update(dict(ranked[:keep]))
        for _ in range(em_iters):
            lp, _ = _em_round(wc, lp, max_piece_len)
    lp, _ = _em_round(wc, lp, max_piece_len)  # final re-normalize
    return lp


def viterbi_segment(
    w: str, lp: dict[str, float], max_len: int = 8
) -> list[str]:
    """Best segmentation under the piece log-probs; unknown characters
    fall back to a floor log-prob so the result is always total.
    Score ties break toward the smaller split index (longer final
    piece) — a fixed, platform-independent rule."""
    if not w:
        return []
    L = len(w)
    best = [(-math.inf, -1)] * (L + 1)
    best[0] = (0.0, -1)
    for j in range(1, L + 1):
        cands = []
        for i in range(max(0, j - max_len), j):
            if best[i][0] == -math.inf:
                continue
            p = lp.get(w[i:j])
            if p is None and j - i == 1:
                p = _FLOOR  # unknown single char
            if p is not None:
                cands.append((best[i][0] + p, -i))
        if cands:
            # score ties prefer the smaller split index (longer final
            # piece) — a fixed, platform-independent rule
            score, negi = max(cands)
            best[j] = (score, -negi)
    out: list[str] = []
    j = L
    while j > 0:
        i = best[j][1]
        out.append(w[i:j])
        j = i
    return out[::-1]


def unigram_encode(
    df: DataFrame,
    pieces: dict[str, float],
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    lowercase: bool = True,
    max_piece_len: int = 8,
) -> DataFrame:
    """Viterbi-tokenize the corpus with a learned piece table — the
    same zero-shuffle broadcast shape as ``bpe_encode``: pieces ride a
    broadcast variable, one Arrow-batched pandas UDF with a per-worker
    word cache encodes rows in place (scan → ArrowEvalPython →
    project, no Exchange)."""
    from ai_etl_framework_spark.operators.bpe import _word_expr
    from pyspark.sql.pandas.functions import pandas_udf

    spark = df.sparkSession
    b = spark.sparkContext.broadcast((dict(pieces), max_piece_len))

    @pandas_udf("array<string>")
    def encode(words_s):  # type: ignore[no-untyped-def]
        import pandas as pd

        lp, mlen = b.value
        cache: dict[str, list[str]] = {}

        def enc_doc(ws):
            if ws is None:
                return []
            out: list[str] = []
            for w in ws:
                t = cache.get(w)
                if t is None:
                    t = viterbi_segment(w, lp, mlen)
                    cache[w] = t
                out.extend(t)
            return out

        return pd.Series([enc_doc(ws) for ws in words_s])

    return df.withColumn(out_col, encode(_word_expr(text_col, lowercase)))


def piece_table_df(spark, pieces: dict[str, float]) -> DataFrame:
    """(piece, logp) frame for persisting/serving, logp-desc then
    piece-asc ordered ranks."""
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("piece", StringType(), False),
            StructField("logp", DoubleType(), False),
        ]
    )
    rows = sorted(pieces.items(), key=lambda kv: (-kv[1], kv[0]))
    return spark.createDataFrame(rows, schema)
