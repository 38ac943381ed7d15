"""Streaming CDC apply: upsert each micro-batch into a keyed snapshot.

The reference's incremental load is append-only (file manifests); a
CDC feed (debezium-style key + latest row) needs *upsert* semantics.
Structured Streaming's contract for that is ``foreachBatch`` — each
micro-batch is a plain DataFrame, so the batch ``merge_upsert``
operator applies unchanged and the checkpoint gives exactly-once
batch replay.

Snapshot storage here is plain parquet with an atomic directory swap
(write new snapshot → rename), the format-agnostic equivalent of a
Delta/Iceberg MERGE at the engine level this repo targets.  On a real
lake you'd point ``apply_cdc_stream`` at the table format's own MERGE;
the operator seam (keys, mode, dedup-within-batch) is identical.

Within-batch ordering: a CDC batch may carry several versions of one
key; the latest (by ``seq_col``) wins — resolved with one per-key
``row_number`` before the merge, the same single-shuffle shape as the
merge itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_etl_framework_spark.operators.merge import merge_upsert


def latest_per_key(batch: DataFrame, keys: list[str], seq_col: str) -> DataFrame:
    """Collapse a CDC batch to its latest row per key (max seq_col)."""
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc_batch(
    snapshot: DataFrame,
    batch: DataFrame,
    keys: list[str],
    seq_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Merge one CDC batch into a snapshot DataFrame.

    ``delete_col`` (boolean) marks tombstones: those keys are removed,
    all other rows upsert. Two single-shuffle merges at most; the
    tombstone side is usually tiny → AQE broadcasts its anti-join.
    """
    latest = latest_per_key(batch, keys, seq_col)
    if delete_col is not None and delete_col in latest.columns:
        dels = latest.where(F.col(delete_col))
        ups = latest.where(~F.coalesce(F.col(delete_col), F.lit(False)))
        snapshot = merge_upsert(
            snapshot, dels.select(*keys), keys,
            when_matched="delete", insert_unmatched=False,
        )
    else:
        ups = latest
    return merge_upsert(snapshot, ups.drop(*(
        [delete_col] if delete_col and delete_col in ups.columns else []
    )), keys)


def apply_cdc_stream(
    cdc: DataFrame,
    snapshot_dir: str,
    keys: list[str],
    seq_col: str,
    checkpoint_dir: str,
    delete_col: str | None = None,
    trigger_available_now: bool = True,
):
    """Run a streaming query that folds a CDC stream into a parquet
    snapshot via foreachBatch + merge_upsert.

    Exactly-once: the sink is idempotent per epoch (same batch merged
    twice yields the same snapshot), and the checkpoint replays only
    uncommitted epochs. Returns the StreamingQuery.
    """
    spark = cdc.sparkSession

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        cur_path = os.path.join(snapshot_dir, "current")
        if _exists(spark, cur_path):
            snap = spark.read.parquet(cur_path)
        else:
            snap = batch.limit(0).drop(
                *([delete_col] if delete_col and delete_col in batch.columns else [])
            )
        merged = apply_cdc_batch(snap, batch, keys, seq_col, delete_col=delete_col)
        tmp = os.path.join(snapshot_dir, f"epoch-{epoch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        _swap(spark, tmp, cur_path)

    writer = cdc.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# -- Hadoop FS helpers (work on any supported filesystem, not just local) --

def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _exists(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = _fs(spark, path)
    return fs.exists(hpath)


def _swap(spark: SparkSession, new_path: str, cur_path: str) -> None:
    """Atomically (per-FS rename semantics) replace cur with new."""
    fs, cur, jvm = _fs(spark, cur_path)
    _, new, _ = _fs(spark, new_path)
    old = jvm.org.apache.hadoop.fs.Path(cur_path + ".old")
    if fs.exists(old):
        fs.delete(old, True)
    if fs.exists(cur):
        fs.rename(cur, old)
    fs.rename(new, cur)
    if fs.exists(old):
        fs.delete(old, True)
