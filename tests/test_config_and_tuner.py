"""Config-driven pipeline construction (REST build layer) and the
AutoTuner recommendation math."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.errors import ConfigurationError
from ai_etl_framework_spark.ml import AutoTuner
from ai_etl_framework_spark.pipeline.config import (
    build_pipeline,
    build_transformer,
)


def test_config_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """The reference's unified-pipeline shape: source → transformers →
    dual gold destinations, from one config dict."""
    config = {
        "name": "cfg_pipeline",
        "source": {"type": "parquet", "path": os.path.join(sf_dir, "orders.parquet")},
        "transformers": [
            {"type": "type_converter", "casts": {"o_totalprice": "double"}},
            {"type": "null_remover", "strategy": "drop", "fields": ["o_orderstatus"]},
            {"type": "quality_scorer"},
            {"type": "metadata_to_columns"},
            {"type": "column_remover", "prefix": "_meta_anomaly"},
        ],
        "destinations": [
            {"type": "parquet", "path": str(tmp_path / "bi")},
            {"type": "csv", "path": str(tmp_path / "rag"), "single_file": True},
        ],
    }
    result = build_pipeline(spark, config).run()
    assert result.success, result.errors
    bi = spark.read.parquet(str(tmp_path / "bi"))
    assert bi.count() == result.records_loaded
    assert "_meta_quality_score" in bi.columns
    assert not any(c.startswith("_meta_anomaly") for c in bi.columns)
    rag = spark.read.option("header", True).csv(str(tmp_path / "rag"))
    assert rag.count() == result.records_loaded


def test_custom_transformer_and_unknown_types(spark):
    df = spark.range(3)
    double_it = build_transformer({"type": "custom", "fn": lambda d: d.withColumn("x", F.col("id") * 2)})
    assert double_it(df).agg(F.sum("x")).first()[0] == 6
    with pytest.raises(ConfigurationError):
        build_transformer({"type": "nope"})


def test_autotuner_recommendation():
    """The reference's illustration series (ARCHITECTURE.md:680-684):
    batch 1000 was best — the recommender must pick it."""
    tuner = AutoTuner(knob="batch_size")
    series = {100: 4355, 500: 12132, 1000: 13495, 2500: 12740, 5000: 12557}
    for knob, tp in series.items():
        for _ in range(3):  # repeated runs → confidence
            tuner.record(knob, records=tp, duration_sec=1.0)
    rec = tuner.recommend()
    assert rec is not None
    assert rec.knob_value == 1000
    assert 0.0 < rec.confidence <= 1.0
    assert rec.expected_improvement > 0
    # exploration: first untried ladder value
    assert tuner.suggest_exploration() == 250


def test_autotuner_needs_variety():
    tuner = AutoTuner()
    tuner.record(100, 1000, 1.0)
    assert tuner.recommend() is None  # one knob value → nothing to compare


def test_config_driven_corpus_pipeline(spark, sf_dir, tmp_path):
    """The corpus operator suite is declaratively drivable: a config
    pipeline chains clean_text → repeated_line_dedup →
    dedup_against_history (history via parquet path) → parquet sink,
    and the result matches calling the operators directly."""
    import os

    from pyspark.sql import functions as F

    from ai_etl_framework_spark.pipeline.config import build_pipeline
    from ai_etl_framework_spark.functions.text import clean_text
    from ai_etl_framework_spark.operators.corpus import repeated_line_dedup
    from ai_etl_framework_spark.operators.dedup import dedup_against_history

    src = str(tmp_path / "src")
    hist = str(tmp_path / "hist")
    out = str(tmp_path / "out")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    docs.where(F.col("doc_id") % 3 == 0).write.parquet(hist)
    batch = docs.where(F.col("doc_id") % 3 != 0)
    batch.write.parquet(src)

    cfg = {
        "name": "corpus",
        "source": {"type": "parquet", "path": src},
        "transformers": [
            {"type": "clean_text"},
            {"type": "repeated_line_dedup",
             "config": {"min_count": 5, "out_col": "text",
                        "removed_col": "n_rm"}},
            {"type": "dedup_against_history",
             "config": {"history_path": hist}},
        ],
        "destinations": [{"type": "parquet", "path": out,
                          "mode": "overwrite"}],
    }
    build_pipeline(spark, cfg).run()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())

    cleaned = batch.withColumn("text", clean_text(F.col("text")))
    manual = dedup_against_history(
        repeated_line_dedup(cleaned, min_count=5, out_col="text",
                            removed_col="n_rm"),
        spark.read.parquet(hist),
    )
    want = sorted(r["doc_id"] for r in manual.collect())
    assert got == want and len(got) > 0


def test_config_driven_dsir_and_bpe(spark, sf_dir, tmp_path):
    """dsir_select and bpe_encode are declaratively drivable and match
    calling the operators directly (target/merge tables via parquet
    paths); bpe_encode validates its merges_path/n_merges exclusivity."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from ai_etl_framework_spark.pipeline.config import (
        ConfigurationError,
        build_pipeline,
        build_transformer,
    )
    from ai_etl_framework_spark.operators.bpe import (
        bpe_encode,
        merge_table_df,
        train_bpe_merges,
        word_counts,
    )
    from ai_etl_framework_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    tgt_path = str(tmp_path / "tgt")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    docs.where(F.col("doc_id") % 10 == 0).write.parquet(tgt_path)
    raw = docs.where(F.col("doc_id") % 10 != 0)
    raw.write.parquet(src)

    merges = train_bpe_merges(word_counts(raw), n_merges=12)
    merges_path = str(tmp_path / "merges")
    merge_table_df(spark, merges).write.parquet(merges_path)

    cfg = {
        "name": "select-encode",
        "source": {"type": "parquet", "path": src},
        "transformers": [
            {"type": "dsir_select",
             "config": {"target_path": tgt_path, "k": 40, "buckets": 256}},
            {"type": "bpe_encode", "config": {"merges_path": merges_path}},
        ],
        "destinations": [{"type": "parquet", "path": out,
                          "mode": "overwrite"}],
    }
    build_pipeline(spark, cfg).run()
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in spark.read.parquet(out).collect()
    }
    manual = bpe_encode(
        dsir_select(raw, spark.read.parquet(tgt_path), k=40, buckets=256),
        merges,
    )
    want = {r["doc_id"]: r["bpe_tokens"] for r in manual.collect()}
    assert got == want and len(got) == 40

    with pytest.raises(ConfigurationError, match="exactly one"):
        build_transformer({"type": "bpe_encode", "config": {}})
    with pytest.raises(ConfigurationError, match="exactly one"):
        build_transformer(
            {"type": "bpe_encode",
             "config": {"merges_path": merges_path, "n_merges": 5}}
        )
