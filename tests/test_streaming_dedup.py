"""Streaming exact dedup (dropDuplicatesWithinWatermark) driven
through a checkpointed run with injected duplicate events, and the
end-to-end embedding LSH dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.operators.dedup import embedding_dedup
from ai_etl_framework_spark.session import load_table
from ai_etl_framework_spark.streaming.events import read_stream, streaming_dedup


def test_streaming_dedup_drops_repeats(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    n_unique = events.count()
    bronze = str(tmp_path / "bronze")
    # duplicate ~one third of the events (same event_id, same ts)
    dups = events.filter(F.col("event_id") % 3 == 0)
    events.unionByName(dups).write.mode("overwrite").parquet(bronze)

    stream = read_stream(spark, bronze, fmt="parquet", schema=events.schema)
    deduped = streaming_dedup(stream, ["event_id"], ts_col="ts", watermark="10 minutes")
    out = str(tmp_path / "out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    result = spark.read.parquet(out)
    assert result.count() == n_unique
    assert result.select("event_id").distinct().count() == n_unique


def test_embedding_dedup_end_to_end(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    out = embedding_dedup(emb, "vec_id", "embedding", threshold=0.99, n_planes=4)
    kept = out.count()
    assert 0 < kept <= n
    # deterministic hyperplanes → deterministic result
    assert embedding_dedup(emb, "vec_id", "embedding", threshold=0.99, n_planes=4).count() == kept
    # the global smallest id always survives (CC keeps component minima)
    assert out.agg(F.min("vec_id")).first()[0] == emb.agg(F.min("vec_id")).first()[0]


def test_incremental_dedup_composes_with_stream(spark, tmp_path):
    """The incremental crawl shape end-to-end: a document stream
    probes a STATIC history inside foreachBatch via
    dedup_against_history — each micro-batch drops history hits and
    its own internal dups, appending only genuinely new docs. This is
    the production composition for continuous ingest (the history
    fingerprint store updates between batches, not within one)."""
    import os

    from pyspark.sql import functions as F

    from ai_etl_framework_spark.operators.dedup import dedup_against_history

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    history = spark.createDataFrame(
        [(100, "seen before")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, "Seen  Before"),   # history hit after normalization
            (2, "fresh one"),
            (3, "FRESH one"),      # within-batch dup of 2
            (4, "fresh two"),
        ],
        "doc_id long, text string",
    )
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)

    def sink(bdf, _batch_id):
        dedup_against_history(bdf, history).write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [2, 4]
