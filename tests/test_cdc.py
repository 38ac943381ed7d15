"""Streaming CDC upsert (streaming/cdc.py): batch merge semantics and
the foreachBatch snapshot loop with exactly-once incremental replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.streaming.cdc import (
    apply_cdc_batch,
    apply_cdc_stream,
    latest_per_key,
)

SCHEMA = "k int, v string, seq long, deleted boolean"


@pytest.fixture(scope="module")
def snapshot(spark):
    return spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)], "k int, v string, seq long"
    )


def test_latest_per_key(spark):
    batch = spark.createDataFrame(
        [(1, "old", 1, False), (1, "new", 2, False), (2, "x", 1, False)], SCHEMA
    )
    got = {(r.k, r.v) for r in latest_per_key(batch, ["k"], "seq").collect()}
    assert got == {(1, "new"), (2, "x")}


def test_apply_cdc_batch_upsert_and_tombstone(spark, snapshot):
    batch = spark.createDataFrame(
        [
            (2, "b2", 5, False),   # update
            (3, None, 5, True),    # tombstone
            (4, "d", 5, False),    # insert
            (4, "d-old", 4, False),  # superseded within batch
        ],
        SCHEMA,
    )
    out = apply_cdc_batch(snapshot, batch, ["k"], "seq", delete_col="deleted")
    got = {(r.k, r.v) for r in out.collect()}
    assert got == {(1, "a"), (2, "b2"), (4, "d")}
    assert "deleted" not in out.columns


def test_apply_cdc_batch_without_delete_col(spark, snapshot):
    batch = spark.createDataFrame([(1, "a1", 9)], "k int, v string, seq long")
    out = apply_cdc_batch(snapshot, batch, ["k"], "seq")
    assert {(r.k, r.v) for r in out.collect()} == {(1, "a1"), (2, "b"), (3, "c")}


def test_cdc_stream_incremental_snapshot(spark, tmp_path):
    bronze = str(tmp_path / "cdc")
    snap_dir = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [(1, "a", 1, False), (2, "b", 1, False), (2, "b-old", 0, False)], SCHEMA
    )
    b1.write.mode("append").parquet(bronze)

    stream = spark.readStream.schema(b1.schema).parquet(bronze)
    q = apply_cdc_stream(stream, snap_dir, ["k"], "seq", ckpt, delete_col="deleted")
    q.awaitTermination(120)
    assert not q.isActive

    snap = spark.read.parquet(snap_dir + "/current")
    assert {(r.k, r.v) for r in snap.collect()} == {(1, "a"), (2, "b")}

    # second increment: update k=1, delete k=2, insert k=9; the
    # restarted query must process ONLY the new file (checkpoint)
    b2 = spark.createDataFrame(
        [(1, "a2", 2, False), (2, None, 2, True), (9, "z", 2, False)], SCHEMA
    )
    b2.write.mode("append").parquet(bronze)

    stream2 = spark.readStream.schema(b1.schema).parquet(bronze)
    q2 = apply_cdc_stream(stream2, snap_dir, ["k"], "seq", ckpt, delete_col="deleted")
    q2.awaitTermination(120)

    snap2 = spark.read.parquet(snap_dir + "/current")
    assert {(r.k, r.v) for r in snap2.collect()} == {(1, "a2"), (9, "z")}


def test_cdc_stream_replay_is_idempotent(spark, tmp_path):
    """Re-running with the same checkpoint and no new files must leave
    the snapshot unchanged (no duplicate merge of batch 0)."""
    bronze = str(tmp_path / "cdc")
    snap_dir = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame([(1, "a", 1, False)], SCHEMA).write.mode("append").parquet(bronze)
    for _ in range(2):
        stream = spark.readStream.schema(
            spark.read.parquet(bronze).schema
        ).parquet(bronze)
        q = apply_cdc_stream(stream, snap_dir, ["k"], "seq", ckpt, delete_col="deleted")
        q.awaitTermination(120)

    snap = spark.read.parquet(snap_dir + "/current")
    assert [(r.k, r.v) for r in snap.collect()] == [(1, "a")]
