"""Stateful streaming sessionization (applyInPandasWithState) driven
end-to-end: file-source stream → per-user session state with
event-time timeout → parquet sink, compared against the batch twin
(which itself is oracle-checked as q28)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.session import load_table
from ai_etl_framework_spark.streaming.events import read_stream
from ai_etl_framework_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_batch_sessionization_shape(events):
    sessions = sessionize_batch(events, gap_minutes=30.0)
    n_events = events.count()
    stats = sessions.agg(
        F.sum("n_events").alias("n"),
        F.count(F.lit(1)).alias("n_sessions"),
        F.min(F.col("session_end") >= F.col("session_start")).alias("ordered"),
    ).first()
    assert stats.n == n_events  # every event in exactly one session
    assert 0 < stats.n_sessions <= n_events
    assert stats.ordered


def test_streaming_sessionization_matches_batch(spark, events, tmp_path):
    bronze = str(tmp_path / "bronze")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    events.write.mode("overwrite").parquet(bronze)

    stream = read_stream(spark, bronze, fmt="parquet", schema=events.schema)
    sessions = sessionize_stream(stream, gap_minutes=30.0, watermark="0 seconds")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive

    emitted = spark.read.parquet(out)
    n_emitted = emitted.count()
    assert n_emitted > 0, "closed sessions must be emitted"

    batch = sessionize_batch(events, gap_minutes=30.0)
    # every emitted session must exist in the batch result with
    # identical aggregates (sessions still open at end-of-stream are
    # legitimately absent from the streaming output)
    joined = emitted.alias("s").join(
        batch.alias("b"),
        (F.col("s.user_id") == F.col("b.user_id"))
        & (F.col("s.session_start") == F.col("b.session_start")),
        "inner",
    )
    assert joined.count() == n_emitted, "streamed session missing from batch"
    mismatch = joined.filter(
        (F.col("s.n_events") != F.col("b.n_events"))
        | (F.col("s.session_end") != F.col("b.session_end"))
        | (F.abs(F.col("s.total_value") - F.col("b.total_value")) > 1e-6)
    )
    assert mismatch.count() == 0

    # coverage: the overwhelming majority of sessions close
    assert n_emitted >= batch.count() * 0.5
