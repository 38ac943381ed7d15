"""BPE merge-table training (operators/bpe.py — Sennrich et al.
2016): pinned-rules on the paper's classic vocabulary, local ≡
distributed differential (the two paths must produce byte-identical
merge tables), a hypothesis differential against an independent
pure-Python model, and the edge/guard semantics."""

from __future__ import annotations

import pytest

# r14 driver-tier split (VERDICT r13 item 1): this suite is
# hypothesis/differential/e2e-heavy and runs in the SLOW tier
# (`pytest -m slow`); the driver's default `pytest tests/` keeps
# the contract/pin/parity suites inside its verify window.
pytestmark = pytest.mark.slow
from hypothesis import given, settings, strategies as st

from ai_etl_framework_spark.operators.bpe import (

    END_OF_WORD,
    _encode_word,
    _merge_py,
    _train_local,
    bpe_encode,
    bpe_token_counts,
    encode_words,
    merge_table_df,
    train_bpe_merges,
    word_counts,
)


def _model_bpe(wc: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Independent reference BPE (written from the paper's pseudocode,
    not from the module): dict-of-tuples symbol table, argmax by
    (count DESC, pair ASC), regex-free greedy merge."""
    vocab = {tuple(w) + (END_OF_WORD,): n for w, n in wc.items() if w}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] = (
                    counts.get((sym[i], sym[i + 1]), 0) + n
                )
        if not counts:
            break
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        a, b = best
        new_vocab = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_classic_sennrich_vocabulary():
    """The paper's example: {low:5, lower:2, newest:6, widest:3} —
    the first merges must be (e,s) [9 = 6+3], (es,t) [9],
    (est,</w>) [9], (l,o) [7 = 5+2], (lo,w) [7]."""
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = _train_local(list(wc.items()), 5)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", END_OF_WORD),
        ("l", "o"), ("lo", "w"),
    ]
    assert merges == _model_bpe(wc, 5)


def test_merge_py_overlap_greedy():
    # greedy left-to-right: aaa + (a,a) -> [aa, a], never [a, aa]
    assert _merge_py(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_py(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert _merge_py(["x", "a", "a"], "a", "a") == ["x", "aa"]
    assert _merge_py(["a"], "a", "a") == ["a"]
    assert _merge_py([], "a", "a") == []


def test_local_equals_distributed(spark):
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "a": 1}
    wdf = spark.createDataFrame(list(wc.items()), "word string, n long")
    local = train_bpe_merges(wdf, 12, distributed=False)
    dist = train_bpe_merges(wdf, 12, distributed=True)
    assert local == dist == _model_bpe(wc, 12)


def test_on_corpus_word_counts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wcd = word_counts(docs)
    # independent word counting for the model
    wc = {}
    for r in docs.select("text").collect():
        for t in (r["text"] or "").lower().split():
            wc[t] = wc.get(t, 0) + 1
    auto = train_bpe_merges(wcd, 10)  # auto -> local collect
    assert auto == _model_bpe(wc, 10)
    dist = train_bpe_merges(wcd, 10, distributed=True)
    assert dist == auto


def test_early_stop_and_edges(spark):
    # vocabulary exhausts before n_merges: "ab" -> [a, b, </w>];
    # round 1 ties (a,b)=(b,</w>)=4 -> lexicographic picks (a,b);
    # round 2 merges (ab,</w>); then one symbol remains -> stop at 2
    wdf = spark.createDataFrame([("ab", 4)], "word string, n long")
    merges = train_bpe_merges(wdf, 50)
    assert merges == [("a", "b"), ("ab", END_OF_WORD)]
    assert train_bpe_merges(wdf, 50, distributed=True) == merges
    # NULL / empty / zero-count words are ignored entirely
    dirty = spark.createDataFrame(
        [("ab", 4), (None, 9), ("", 9), ("zz", 0)],
        "word string, n long",
    )
    assert train_bpe_merges(dirty, 50) == merges
    # empty corpus -> empty merge table
    empty = spark.createDataFrame([], "word string, n long")
    assert train_bpe_merges(empty, 5) == []


def test_cap_guard(spark):
    wdf = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "word string, n long"
    )
    with pytest.raises(ValueError, match="max_vocab_rows"):
        train_bpe_merges(wdf, 2, distributed=False, max_vocab_rows=2)
    # auto above the cap silently takes the distributed loop instead
    assert train_bpe_merges(wdf, 2, max_vocab_rows=2) == train_bpe_merges(
        wdf, 2, distributed=True
    )


def test_merge_table_df_schema(spark):
    df = merge_table_df(spark, [("e", "s"), ("es", "t")])
    assert df.columns == ["rank", "left", "right"]
    rows = [tuple(r) for r in df.orderBy("rank").collect()]
    assert rows == [(0, "e", "s"), (1, "es", "t")]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string", "string",
    ]


@settings(max_examples=15, deadline=None)
@given(
    st.dictionaries(
        st.text(
            alphabet=st.sampled_from("abcdef"), min_size=1, max_size=6
        ),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=8),
)
def test_local_matches_model_hypothesis(wc, k):
    assert _train_local(list(wc.items()), k) == _model_bpe(wc, k)


def test_word_counts_case_folds_by_default(spark):
    df = spark.createDataFrame(
        [("The the THE tok",), (None,), ("  ",)], "text string"
    )
    got = {r["word"]: r["n"] for r in word_counts(df).collect()}
    assert got == {"the": 3, "tok": 1}
    raw = {r["word"]: r["n"] for r in word_counts(df, lowercase=False).collect()}
    assert raw == {"The": 1, "the": 1, "THE": 1, "tok": 1}


def _model_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent lowest-rank-first encoder (subword-nmt get_pairs
    loop, written from the paper's reference implementation shape)."""
    if not word:
        return []
    ranks = {p: i for i, p in enumerate(merges)}
    sym = tuple(word) + (END_OF_WORD,)
    while len(sym) > 1:
        pairs = {(sym[i], sym[i + 1]) for i in range(len(sym) - 1)}
        ranked = [p for p in pairs if p in ranks]
        if not ranked:
            break
        a, b = min(ranked, key=lambda p: ranks[p])
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = tuple(out)
    return list(sym)


def test_encode_word_pinned():
    merges = [("e", "s"), ("es", "t"), ("est", END_OF_WORD), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert _encode_word("lowest", ranks) == ["low", "est</w>"]
    assert _encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert _encode_word("low", ranks) == ["low", END_OF_WORD]
    assert _encode_word("zz", ranks) == ["z", "z", END_OF_WORD]
    assert _encode_word("", ranks) == []
    # a merge that creates an EARLIER-rank pair must yield to it:
    # rank0 (ab, c) can only fire after rank1 (a, b) — lowest-rank-
    # first still terminates with the right segmentation
    r2 = {("ab", "c"): 0, ("a", "b"): 1}
    assert _encode_word("abc", r2) == ["abc", END_OF_WORD]


@settings(max_examples=15, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet=st.sampled_from("abcd"), min_size=1, max_size=5),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=10),
)
def test_encode_reproduces_training_segmentation(wc, k):
    """Encoding a training word with the full learned table must
    reproduce its end-of-training segmentation (the defining property
    of BPE apply), and must match the independent model encoder."""
    merges = _train_local(list(wc.items()), k)
    ranks = {p: i for i, p in enumerate(merges)}
    # recompute training-end segmentation with the sequential trainer
    for w in wc:
        sym = list(w) + [END_OF_WORD]
        for a, b in merges:
            sym = _merge_py(sym, a, b)
        assert _encode_word(w, ranks) == sym == _model_encode(w, merges)


def test_bpe_encode_spark(spark):
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    df = spark.createDataFrame(
        [(1, "Lowest test"), (2, None), (3, "   "), (4, "low LOW")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, merges).collect()
    }
    assert out[1] == _model_encode("lowest", merges) + _model_encode("test", merges)
    assert out[2] == [] and out[3] == []
    assert out[4] == _model_encode("low", merges) * 2  # case-folded
    # zero-shuffle pin: scan -> ArrowEvalPython -> project, no Exchange
    plan = bpe_encode(df, merges)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_bpe_token_counts_spark(spark):
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    df = spark.createDataFrame(
        [(1, "lowest test low"), (2, None), (3, "zz")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_token_counts(df, merges).collect()
    }
    exp1 = sum(
        len(_model_encode(w, merges)) for w in ["lowest", "test", "low"]
    )
    assert got == {
        1: (3, exp1),
        2: (0, 0),
        3: (1, len(_model_encode("zz", merges))),
    }


def test_encode_words_spark(spark):
    merges = [("e", "s"), ("es", "t")]
    wdf = spark.createDataFrame([("test",), ("se",)], "word string")
    got = {r["word"]: r["tokens"] for r in encode_words(wdf, merges).collect()}
    assert got == {
        "test": _model_encode("test", merges),
        "se": _model_encode("se", merges),
    }


def test_train_then_encode_corpus(spark, sf_dir):
    """End-to-end tokenizer prep on the documents table: train on the
    corpus word counts, encode the corpus with the learned table, and
    check totals against the model on collected text."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    merges = train_bpe_merges(word_counts(docs), n_merges=25)
    counts = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        words = (r["text"] or "").lower().split()
        exp = sum(len(_model_encode(w, merges)) for w in words)
        assert counts[r["doc_id"]] == exp


def test_distributed_matches_model_random(spark):
    """One seeded random-ish vocabulary through the FULL Spark loop
    (the hypothesis differential covers the local path broadly; the
    Spark loop is exercised on a fixed multi-shape table — repeats,
    shared prefixes/suffixes, unicode)."""
    wc = {
        "banana": 7, "bandana": 3, "ananas": 5, "nan": 2,
        "ába": 4, "áb": 1, "x": 9,
    }
    wdf = spark.createDataFrame(list(wc.items()), "word string, n long")
    assert train_bpe_merges(wdf, 9, distributed=True) == _model_bpe(wc, 9)
