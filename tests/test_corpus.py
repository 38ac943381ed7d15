"""Corpus quality (Gopher rules) + decontamination operators.

Semantics tests on constructed rows where each rule's value is known
in closed form, plus executed-plan shape: the quality projection must
not shuffle, and the contamination join must broadcast the benchmark
side (the 100 TB corpus never moves).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.operators import (
    contamination_pairs,
    corpus_quality,
    decontaminate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _metrics(spark, text, **kw):
    df = corpus_quality(_docs(spark, [(0, text)]), "text", **kw)
    return df.collect()[0].asDict()


def test_word_count_and_mean_len(spark):
    m = _metrics(spark, "aa bbb cccc")
    assert m["n_words"] == 3
    assert m["mean_word_len"] == pytest.approx(3.0)  # (2+3+4)/3
    assert m["alpha_word_frac"] == pytest.approx(1.0)


def test_alpha_and_symbol_rules(spark):
    # 4 words, one numeric-only; two '#' and one '...'
    m = _metrics(spark, "ab 12 cd# ef#...")
    assert m["n_words"] == 4
    assert m["alpha_word_frac"] == pytest.approx(0.75)
    assert m["symbol_word_ratio"] == pytest.approx(3 / 4)


def test_top_bigram_frac(spark):
    # "x y" appears twice among 4 bigrams of 5 words -> 2*2/5
    m = _metrics(spark, "x y z x y")
    assert m["top_bigram_frac"] == pytest.approx(0.8)
    # degenerate repetition caps at 1.0
    m = _metrics(spark, "a a a a")
    assert m["top_bigram_frac"] == 1.0


def test_dup_ngram_frac(spark):
    # 6 words -> two 5-grams, identical text gives distinct shingles,
    # so craft a repeat: 'a b c d e a b c d e a b c d e' has 11
    # 5-grams, 5 distinct -> 6/11 duplicated
    m = _metrics(spark, "a b c d e a b c d e a b c d e")
    assert m["dup_ngram_frac"] == pytest.approx(round(1 - 5 / 11, 6))
    # below n: zero
    assert _metrics(spark, "a b c")["dup_ngram_frac"] == 0.0


def test_keep_flag_and_filter(spark):
    good = " ".join(f"w{i}ab" for i in range(60))  # 60 distinct 4-char words
    bad = "spam " * 60  # top-bigram/dup-ngram saturated
    df = corpus_quality(_docs(spark, [(1, good), (2, bad)]), "text")
    kept = {r["doc_id"]: r["keep"] for r in df.collect()}
    assert kept == {1: True, 2: False}
    filtered = corpus_quality(
        _docs(spark, [(1, good), (2, bad)]), "text", filter_to_kept=True
    )
    assert [r["doc_id"] for r in filtered.collect()] == [1]
    assert "keep" not in filtered.columns


def test_unknown_bound_rejected(spark):
    with pytest.raises(ValueError, match="unknown bounds"):
        corpus_quality(_docs(spark, [(0, "a")]), "text", min_wordz=1)


def test_quality_plan_has_no_exchange(spark):
    df = corpus_quality(_docs(spark, [(0, "a b c")]), "text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in plan, plan


def test_contamination_counts(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words live here today friends"),
        ],
    )
    bench = _docs(spark, [(100, "quick brown fox jumps")])
    out = contamination_pairs(corpus, bench, ngram=4).collect()
    assert len(out) == 1
    r = out[0].asDict()
    # doc 1 has 6 distinct 4-gram shingles; exactly 1 matches
    assert r["doc_id"] == 1 and r["n_shingles"] == 6 and r["n_hits"] == 1
    assert r["hit_frac"] == pytest.approx(round(1 / 6, 6))


def test_decontaminate_drops_only_hits(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words live here today friends"),
        ],
    )
    bench = _docs(spark, [(100, "quick brown fox jumps")])
    left = decontaminate(corpus, bench, ngram=4)
    assert [r["doc_id"] for r in left.collect()] == [2]
    # threshold above the overlap keeps everything
    left_all = decontaminate(corpus, bench, ngram=4, max_hit_frac=0.5)
    assert sorted(r["doc_id"] for r in left_all.collect()) == [1, 2]


def test_corpus_quality_runs_on_a_stream(spark, tmp_path):
    """The rule set is a stateless projection, so the exact same
    operator must run inside Structured Streaming (the shape a
    continuously-ingesting corpus pipeline uses) — no code fork
    between batch and stream."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch = _docs(spark, [(1, "aaa bbb ccc " * 20), (2, "x")])
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    scored = corpus_quality(stream, "text")
    q = (
        scored.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r["keep"] for r in spark.read.parquet(out).collect()}
    assert set(got) == {1, 2} and got[2] is False


def test_contamination_broadcasts_benchmark(spark):
    corpus = _docs(spark, [(i, f"w{i} x y z q r") for i in range(20)])
    bench = _docs(spark, [(100, "x y z q")])
    df = contamination_pairs(corpus, bench, ngram=4)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
