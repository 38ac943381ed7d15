"""Unigram-LM tokenizer (operators/unigram_lm.py — Kudo 2018 /
SentencePiece): forward-backward correctness vs brute-force
enumeration, EM likelihood monotonicity (the defining property of
EM), pruning invariants (character coverage, vocab target),
Viterbi vs brute-force argmax, encode totality on unknown chars, and
the Spark encode's zero-shuffle plan + equality with the local
Viterbi."""

from __future__ import annotations

import itertools
import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from ai_etl_framework_spark.operators.unigram_lm import (
    _em_round,
    _forward_backward,
    _seed_pieces,
    piece_table_df,
    train_unigram_lm,
    unigram_encode,
    viterbi_segment,
)


def _all_segmentations(w, pieces, max_len):
    """Brute-force: every way to split w into pieces from the table."""
    if not w:
        return [[]]
    out = []
    for k in range(1, min(max_len, len(w)) + 1):
        head = w[:k]
        if head in pieces:
            for rest in _all_segmentations(w[k:], pieces, max_len):
                out.append([head] + rest)
    return out


LP = {
    "a": math.log(0.3), "b": math.log(0.2), "c": math.log(0.1),
    "ab": math.log(0.25), "bc": math.log(0.1), "abc": math.log(0.05),
}


def test_forward_backward_matches_bruteforce():
    for w in ("abc", "abab", "cab", "aabbcc", "b"):
        exp, z = _forward_backward(w, LP, 8)
        segs = _all_segmentations(w, LP, 8)
        probs = [math.exp(sum(LP[p] for p in s)) for s in segs]
        assert z == pytest.approx(math.log(sum(probs)), rel=1e-10)
        # expected count of each piece = Σ_seg P(seg|w) · #occurrences
        total = sum(probs)
        for piece in set(p for s in segs for p in s):
            w_exp = sum(
                (pr / total) * s.count(piece) for s, pr in zip(segs, probs)
            )
            assert exp.get(piece, 0.0) == pytest.approx(w_exp, rel=1e-10)


def test_forward_backward_unreachable():
    exp, z = _forward_backward("xyz", LP, 8)
    assert z == -math.inf and exp == {}


def test_em_monotone_likelihood():
    wc = [("abab", 5), ("abc", 3), ("bca", 2), ("aa", 4)]
    lp = _seed_pieces(wc, 4, 50)
    lls = []
    for _ in range(6):
        lp, ll = _em_round(wc, lp, 4)
        lls.append(ll)
    # EM's defining guarantee: data log-likelihood never decreases
    # (ll reported for the PREVIOUS params; compare successive pairs)
    for a, b in zip(lls, lls[1:]):
        assert b >= a - 1e-9


def test_viterbi_matches_bruteforce_argmax():
    for w in ("abc", "abab", "aabbcc", "cab"):
        got = viterbi_segment(w, LP, 8)
        segs = _all_segmentations(w, LP, 8)
        best = max(segs, key=lambda s: sum(LP[p] for p in s))
        assert sum(LP[p] for p in got) == pytest.approx(
            sum(LP[p] for p in best), rel=1e-12
        )


def test_viterbi_unknown_chars_total():
    assert viterbi_segment("a!b", LP) == ["a", "!", "b"]
    assert viterbi_segment("", LP) == []
    assert viterbi_segment("!!", LP) == ["!", "!"]


def test_train_invariants(spark):
    wc = [
        ("hello", 10), ("help", 6), ("world", 8), ("word", 5),
        ("hold", 3), ("ελληνικά", 1),
    ]
    wdf = spark.createDataFrame(wc, "word string, n long")
    pieces = train_unigram_lm(wdf, vocab_size=30, max_piece_len=4)
    chars = set("".join(w for w, _ in wc))
    # character coverage: every training char is a piece
    assert chars <= set(pieces)
    # vocab target respected (chars may exceed it on tiny corpora)
    assert len(pieces) <= max(30, len(chars))
    # probabilities normalized-ish (log-probs finite and ≤ 0-ish)
    assert all(v < 1.0 for v in pieces.values())
    # multi-char pieces exist — the corpus has repeated substrings
    assert any(len(p) > 1 for p in pieces)
    # training is deterministic
    again = train_unigram_lm(wdf, vocab_size=30, max_piece_len=4)
    assert pieces == again


def test_train_cap_and_empty(spark):
    wdf = spark.createDataFrame(
        [("a", 1), ("b", 1)], "word string, n long"
    )
    with pytest.raises(ValueError, match="max_vocab_rows"):
        train_unigram_lm(wdf, vocab_size=10, max_vocab_rows=1)
    empty = spark.createDataFrame([], "word string, n long")
    assert train_unigram_lm(empty, vocab_size=10) == {}


def test_unigram_encode_spark(spark):
    df = spark.createDataFrame(
        [(1, "Abc abab"), (2, None), (3, "  "), (4, "zz!")],
        "doc_id long, text string",
    )
    out = unigram_encode(df, LP, max_piece_len=8)
    got = {r["doc_id"]: r["unigram_tokens"] for r in out.collect()}
    assert got[1] == viterbi_segment("abc", LP) + viterbi_segment("abab", LP)
    assert got[2] == [] and got[3] == []
    assert got[4] == viterbi_segment("zz!", LP)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "ArrowEvalPython" in plan


def test_train_encode_corpus_end_to_end(spark, sf_dir):
    from ai_etl_framework_spark.operators.bpe import word_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    pieces = train_unigram_lm(
        word_counts(docs), vocab_size=200, max_piece_len=6
    )
    enc = unigram_encode(docs, pieces, max_piece_len=6)
    rows = enc.select("doc_id", "text", "unigram_tokens").collect()
    for r in rows:
        words = (r["text"] or "").lower().split()
        # re-assembling the tokens must reproduce the words exactly
        assert "".join(r["unigram_tokens"]) == "".join(words)
        # compression: tokens never exceed characters, and a trained
        # vocab on real text does strictly better than char-splitting
        if words:
            assert len(r["unigram_tokens"]) <= sum(len(w) for w in words)
    total_tokens = sum(len(r["unigram_tokens"]) for r in rows)
    total_chars = sum(
        sum(len(w) for w in (r["text"] or "").lower().split()) for r in rows
    )
    assert total_tokens < 0.8 * total_chars


def test_piece_table_df(spark):
    df = piece_table_df(spark, {"a": -1.0, "bc": -0.5})
    rows = [tuple(r) for r in df.collect()]
    assert rows == [("bc", -0.5), ("a", -1.0)]
    assert df.columns == ["piece", "logp"]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    wc=st.dictionaries(
        st.text(alphabet=st.sampled_from("abc"), min_size=1, max_size=5),
        st.integers(min_value=1, max_value=5),
        min_size=1,
        max_size=5,
    )
)
def test_train_hypothesis_invariants(spark, wc):
    wdf = spark.createDataFrame(list(wc.items()), "word string, n long")
    pieces = train_unigram_lm(wdf, vocab_size=12, max_piece_len=3)
    chars = set("".join(wc))
    assert chars <= set(pieces)
    # every training word re-assembles through Viterbi
    for w in wc:
        assert "".join(viterbi_segment(w, pieces, 3)) == w
