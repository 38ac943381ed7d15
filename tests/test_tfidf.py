"""TF-IDF (operators/tfidf.py): pinned math vs an independent Python
model (smoothed idf, tf normalization, tie-break), edge semantics
(NULL/blank docs, ubiquitous terms), and the scale plan pins
(WindowGroupLimit top-k, NO mandatory broadcast on the vocab-sized
idf join — r8 verdict item 1). 3-SF oracle parity is x21 in
tests/test_oracle_parity.py."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.operators.tfidf import (
    doc_frequencies,
    tfidf_topk_terms,
)

DOCS = {
    1: "apple banana apple cherry",
    2: "banana banana date",
    3: "apple unique",
    4: None,
    5: "   ",
}


def _model_topk(docs, k):
    toks = {i: (t or "").lower().split() for i, t in docs.items()}
    n = len(docs)
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for i, ts in toks.items():
        if not ts:
            continue
        scores = {}
        for t in set(ts):
            tf = ts.count(t) / len(ts)
            idf = math.log((n + 1) / (df[t] + 1)) + 1
            scores[t] = tf * idf
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[i] = [(t, r + 1, s) for r, (t, s) in enumerate(ranked)]
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        list(DOCS.items()), "doc_id long, text string"
    )


def test_doc_frequencies(docs_df):
    got = {r["term"]: r["df"] for r in doc_frequencies(docs_df).collect()}
    assert got == {
        "apple": 2, "banana": 2, "cherry": 1, "date": 1, "unique": 1,
    }


def test_topk_matches_model(docs_df):
    got: dict[int, list] = {}
    for r in tfidf_topk_terms(docs_df, k=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf_idf"])
        )
    exp = _model_topk(DOCS, 2)
    assert set(got) == set(exp)  # token-less docs produce no rows
    for i in exp:
        rows = sorted(got[i])
        assert [(rk, t) for rk, t, _ in rows] == [
            (rk, t) for t, rk, _ in exp[i]
        ]
        for (rk, t, s), (_, _, es) in zip(rows, exp[i]):
            assert s == pytest.approx(es, rel=1e-12)


def test_rare_term_outranks_common(docs_df):
    top = {
        r["doc_id"]: r["term"]
        for r in tfidf_topk_terms(docs_df, k=1).collect()
    }
    # doc 3: "unique" (df=1) must beat "apple" (df=2) at equal tf
    assert top[3] == "unique"


def test_plan_pins(docs_df):
    out = tfidf_topk_terms(docs_df, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # per-partition top-k pre-shuffle


def test_no_mandatory_broadcast_on_idf_join(docs_df):
    """r8 verdict item 1: the idf frame is vocab-sized — unbounded on
    web text — so the tf⋈idf join must compile WITHOUT a mandatory
    broadcast hint (AQE may still choose a broadcast from measured
    size); ``vocab_small=True`` is the caller's explicit opt-in."""
    default_plan = (
        tfidf_topk_terms(docs_df, k=3)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "ResolvedHint" not in default_plan
    pinned_plan = (
        tfidf_topk_terms(docs_df, k=3, vocab_small=True)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "ResolvedHint" in pinned_plan
    # same results either way
    a = sorted(map(tuple, tfidf_topk_terms(docs_df, k=3).collect()))
    b = sorted(map(
        tuple, tfidf_topk_terms(docs_df, k=3, vocab_small=True).collect()
    ))
    assert a == b
