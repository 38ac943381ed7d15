"""bm25_topk (operators/bm25.py): pinned Lucene-variant math vs an
independent Python model, idf monotonicity, edge semantics. 3-SF
oracle parity is x28."""

from __future__ import annotations

import math

import pytest

from ai_etl_framework_spark.operators.bm25 import bm25_topk

DOCS = {
    1: "spark makes big data small again",
    2: "big data big pipelines big shuffles",
    3: "tiny doc",
    4: None,
    5: "data data data data data data data data data data",
}


def _model(docs, query, k, k1=1.2, b=0.75):
    toks = {i: (t or "").lower().split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    q_terms = sorted(set(query.lower().split()))
    df = {
        t: sum(1 for ts in toks.values() if t in ts) for t in q_terms
    }
    scores = {}
    for i, ts in toks.items():
        s, hits = 0.0, 0
        for t in q_terms:
            tf = ts.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if hits:
            scores[i] = (round(s, 6), hits)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    return ranked


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        list(DOCS.items()), "doc_id long, text string"
    )


def test_matches_model(docs_df):
    got = [
        (r["doc_id"], r["score"], r["n_terms"])
        for r in bm25_topk(docs_df, "big data", k=10).collect()
    ]
    exp = _model(DOCS, "big data", 10)
    assert [(i, h) for i, (_, h) in exp] == [(i, h) for i, _, h in got]
    for (eid, (es, _)), (gid, gs, _) in zip(exp, got):
        assert eid == gid and gs == pytest.approx(es, abs=1e-6)


def test_tf_saturation(docs_df):
    """BM25's k1 saturation: doc 5 (10× 'data') must NOT dominate —
    its tf term saturates at (k1+1), while doc 2 matches both query
    terms. Plain tf·idf would rank 5 first."""
    top = bm25_topk(docs_df, "big data", k=1).collect()[0]
    assert top["doc_id"] == 2


def test_no_match_docs_absent(docs_df):
    rows = bm25_topk(docs_df, "shuffles", k=10).collect()
    assert [r["doc_id"] for r in rows] == [2]


def test_validation(docs_df, spark):
    with pytest.raises(ValueError, match="no tokens"):
        bm25_topk(docs_df, "   ")
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_topk(empty, "data")
