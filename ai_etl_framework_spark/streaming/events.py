"""Structured Streaming ingest + windowed aggregation.

The reference implements NO streaming (README.md:13 "streaming
extensibility" is roadmap; SURVEY §2.13) — its closest feature is the
SHA256 incremental file-state. This module is the Spark-native
answer:

- ``read_stream``: file-source readStream over a bronze directory
  (schema required — streaming sources don't infer), with
  Trigger.AvailableNow the batch-incremental mode that subsumes the
  reference's manifest logic, checkpointed exactly-once.
- ``windowed_counts``: tumbling-window counts with a watermark for
  late data.
- ``windowed_counts_batch``: identical semantics expressed for a
  batch DataFrame (F.window works in both) — this is what the oracle
  verifies; the streaming query shares the expression.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: Optional[list[str]] = None,
    value_col: str = "value",
) -> DataFrame:
    """Streaming tumbling-window counts; watermark bounds state.
    ``value_col`` names the summed metric column (like
    sessionize_batch's value_col) — the events-table default is not a
    schema assumption baked into the agg."""
    from ai_etl_framework_spark.session import ensure_timestamp

    df = ensure_timestamp(df, ts_col)
    gcols = [F.window(F.col(ts_col), window)] + [F.col(c) for c in (group_cols or [])]
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(*gcols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("total_value"))
    )


def windowed_counts_batch(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    group_cols: Optional[list[str]] = None,
    value_col: str = "value",
) -> DataFrame:
    """Batch twin of ``windowed_counts`` with flattened window bounds
    (window_start / window_end) so results are plain columns."""
    gcols = [F.window(F.col(ts_col), window)] + [F.col(c) for c in (group_cols or [])]
    return (
        df.groupBy(*gcols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(group_cols or []),
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop repeats of ``keys`` arriving within
    the watermark horizon. State holds one entry per key seen inside
    the horizon and is purged as the watermark advances — bounded
    state, exactly-once output with checkpointing. (The streaming twin
    of operators.dedup.exact_dedup keep_first.)"""
    from ai_etl_framework_spark.session import ensure_timestamp

    df = ensure_timestamp(df, ts_col)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def start_to_parquet(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """writeStream → parquet with checkpointed exactly-once;
    AvailableNow = process-everything-then-stop (batch-incremental)."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
