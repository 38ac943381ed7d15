"""DSIR importance resampling (operators/dsir.py — Xie et al. 2023):
pinned rules vs an independent pure-Python model (hashlib md5, dict
counts), edge semantics (NULL/blank docs, empty target, unigram-only),
seed determinism, and the 100 TB plan shape (broadcast model joins, no
sort-merge join, no Python, global top-k via TakeOrderedAndProject).
The 3-SF oracle parity row is x18 in tests/test_oracle_parity.py."""

from __future__ import annotations

import hashlib
import math

import pytest

# r14 driver-tier split (VERDICT r13 item 1): this suite is
# hypothesis/differential/e2e-heavy and runs in the SLOW tier
# (`pytest -m slow`); the driver's default `pytest tests/` keeps
# the contract/pin/parity suites inside its verify window.
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from ai_etl_framework_spark.operators.dsir import (

    dsir_resample,
    dsir_select,
    dsir_select_frac,
    dsir_weights,
    hashed_ngram_buckets,
    ngram_bucket_counts,
)

B = 64  # small bucket count so collisions actually occur in tests


def _grams(text, ns=(1, 2)):
    toks = [t for t in (text or "").lower().split() if t]
    out = []
    if 1 in ns:
        out += toks
    if 2 in ns:
        out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return out


def _bucket(g, buckets=B):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets


def _model_weights(raw, tgt, buckets=B, ns=(1, 2)):
    """raw/tgt: dict id -> text. Returns id -> (n_grams, logw)."""
    tc: dict[int, int] = {}
    for t in tgt.values():
        for g in _grams(t, ns):
            b = _bucket(g, buckets)
            tc[b] = tc.get(b, 0) + 1
    rc: dict[int, int] = {}
    for t in raw.values():
        for g in _grams(t, ns):
            b = _bucket(g, buckets)
            rc[b] = rc.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    out = {}
    for i, t in raw.items():
        gs = [_bucket(g, buckets) for g in _grams(t, ns)]
        logw = sum(
            math.log((tc.get(b, 0) + 1) / (tt + buckets))
            - math.log((rc[b] + 1) / (rt + buckets))
            for b in gs
        )
        out[i] = (len(gs), logw)
    return out


def _gumbel_key(i, logw, seed=0):
    v = int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:13], 16)
    u = (v + 0.5) / float(1 << 52)
    return logw + (-math.log(-math.log(u)))


RAW = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "lorem ipsum dolor sit amet",
    3: "the dog and the fox are friends",
    4: None,
    5: "   ",
    6: "singleton",
}
TGT = {
    100: "the fox and the dog",
    101: "quick fox quick dog",
}


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(list(RAW.items()), "doc_id long, text string")
    tgt = spark.createDataFrame(list(TGT.items()), "doc_id long, text string")
    return raw, tgt


def test_hashed_buckets_match_model(spark):
    df = spark.createDataFrame([(t,) for t in RAW.values() if t], "text string")
    got = df.select(
        hashed_ngram_buckets(F.col("text"), B).alias("b"), "text"
    ).collect()
    for r in got:
        assert r["b"] == [_bucket(g) for g in _grams(r["text"])]
    # unigram-only mode
    one = df.select(hashed_ngram_buckets(F.col("text"), B, ns=(1,)).alias("b"), "text")
    for r in one.collect():
        assert r["b"] == [_bucket(g) for g in _grams(r["text"], ns=(1,))]


def test_ns_validation(spark):
    with pytest.raises(ValueError, match="subset"):
        hashed_ngram_buckets(F.lit("x"), B, ns=(1, 3))
    with pytest.raises(ValueError, match="subset"):
        hashed_ngram_buckets(F.lit("x"), B, ns=())


def test_bucket_counts_match_model(frames):
    raw, tgt = frames
    got = {r["bucket"]: r["cnt"] for r in ngram_bucket_counts(tgt, buckets=B).collect()}
    exp: dict[int, int] = {}
    for t in TGT.values():
        for g in _grams(t):
            exp[_bucket(g)] = exp.get(_bucket(g), 0) + 1
    assert got == exp


def test_weights_match_model(frames):
    raw, tgt = frames
    got = {
        r["doc_id"]: (r["n_grams"], r["logw"])
        for r in dsir_weights(raw, tgt, buckets=B).collect()
    }
    exp = _model_weights(RAW, TGT)
    assert set(got) == set(RAW)  # NULL/blank docs present with 0 grams
    for i in RAW:
        assert got[i][0] == exp[i][0]
        assert got[i][1] == pytest.approx(exp[i][1], rel=1e-12, abs=1e-12)
    # target-like docs outweigh off-target docs
    assert got[3][1] > got[2][1]
    assert got[4] == (0, 0.0) and got[5] == (0, 0.0)


def test_empty_target_uniform_model(spark, frames):
    raw, _ = frames
    empty_tgt = spark.createDataFrame([], "doc_id long, text string")
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(raw, empty_tgt, buckets=B).collect()
    }
    exp = _model_weights(RAW, {})
    for i in RAW:
        assert got[i] == pytest.approx(exp[i][1], rel=1e-12, abs=1e-12)


def test_resample_topk_and_determinism(frames):
    raw, tgt = frames
    out = dsir_resample(raw, tgt, k=3, buckets=B).collect()
    assert len(out) == 3
    exp = _model_weights(RAW, TGT)
    keys = sorted(
        ((_gumbel_key(i, lw), i) for i, (_, lw) in exp.items()), reverse=True
    )
    assert [r["doc_id"] for r in out] == [i for _, i in keys[:3]]
    for r in out:
        assert r["key"] == pytest.approx(_gumbel_key(r["doc_id"], exp[r["doc_id"]][1]))
    # same seed reproduces; a different seed may reorder but stays k-sized
    again = dsir_resample(raw, tgt, k=3, buckets=B).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in out]
    other = dsir_resample(raw, tgt, k=3, buckets=B, seed=7).collect()
    assert len(other) == 3
    exp_keys7 = sorted(
        ((_gumbel_key(i, lw, 7), i) for i, (_, lw) in exp.items()), reverse=True
    )
    assert [r["doc_id"] for r in other] == [i for _, i in exp_keys7[:3]]


def test_select_returns_rows_and_frac_matches_topk(frames):
    raw, tgt = frames
    sel = dsir_select(raw, tgt, k=3, buckets=B)
    assert sorted(sel.columns) == sorted(raw.columns)
    exp = _model_weights(RAW, TGT)
    keys = sorted(
        ((_gumbel_key(i, lw), i) for i, (_, lw) in exp.items()), reverse=True
    )
    assert sorted(r["doc_id"] for r in sel.collect()) == sorted(
        i for _, i in keys[:3]
    )
    # frac form: keeping 3/6 = top half must pick the same documents
    self_ = dsir_select_frac(raw, tgt, frac=0.5, buckets=B)
    assert sorted(r["doc_id"] for r in self_.collect()) == sorted(
        i for _, i in keys[:3]
    )
    assert "dsir_key" in self_.columns
    # frac=1.0 keeps everything; bad frac raises
    assert dsir_select_frac(raw, tgt, frac=1.0, buckets=B).count() == len(RAW)
    with pytest.raises(ValueError, match="frac"):
        dsir_select_frac(raw, tgt, frac=0.0)
    # approx dual picks a valid subset of the same size at this scale
    appr = dsir_select_frac(raw, tgt, frac=0.5, buckets=B, approx=True)
    assert appr.count() >= 1


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(alphabet=st.sampled_from("ab c"), max_size=20),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_weights_hypothesis_differential(spark, texts):
    raw = {i: t for i, t in enumerate(texts)}
    tgt = {100: "a b", 101: "c c a"}
    rdf = spark.createDataFrame(list(raw.items()), "doc_id long, text string")
    tdf = spark.createDataFrame(list(tgt.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["logw"])
        for r in dsir_weights(rdf, tdf, buckets=B).collect()
    }
    exp = _model_weights(raw, tgt)
    assert set(got) == set(raw)
    for i in raw:
        assert got[i][0] == exp[i][0]
        assert got[i][1] == pytest.approx(exp[i][1], rel=1e-12, abs=1e-12)


def test_plan_shape(frames):
    raw, tgt = frames
    plan = (
        dsir_resample(raw, tgt, k=3, buckets=B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan  # model joins broadcast
    assert "EvalPython" not in plan  # fully JVM-side
    assert "TakeOrderedAndProject" in plan  # top-k, never a full sort
