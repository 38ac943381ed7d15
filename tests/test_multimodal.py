"""Multimodal plumbing: binary columns through Arrow-batched
mapInPandas kernels (decode stubs — real codecs absent here; the
schema/partitioning/batch shapes are what's under test)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.functions.multimodal import (
    attach_media_meta,
    audio_features,
    frame_sample,
    image_features,
    image_resize,
)


@pytest.fixture(scope="module")
def blobs(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(50)
    return docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("blob"))


def test_image_features_shape_and_determinism(blobs):
    out = image_features(blobs, "doc_id", "blob", dim=8)
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r.feat) == 8 for r in rows)
    assert all(-1.0 <= x <= 1.0 for r in rows for x in r.feat)
    again = {r.id: r.sha for r in image_features(blobs, "doc_id", "blob").collect()}
    assert {r.id: r.sha for r in rows} == again  # deterministic


def test_frame_sample_explodes(blobs):
    out = frame_sample(blobs, "doc_id", "blob", every_n=1, max_frames=3)
    per_doc = out.groupBy("id").count().agg(F.min("count"), F.max("count")).first()
    assert per_doc[0] >= 1 and per_doc[1] <= 3
    assert out.count() >= 50  # at least one frame per blob


def test_audio_features_windows(blobs):
    out = audio_features(blobs, "doc_id", "blob", window_bytes=64, max_windows=4)
    rows = out.collect()
    assert len(rows) == 50
    assert all(1 <= r.n_windows <= 4 for r in rows)
    assert all(len(r.energy) == r.n_windows for r in rows)


def test_image_resize_binary_out(blobs):
    out = image_resize(blobs, "doc_id", "blob", width=32, height=32)
    rows = out.collect()
    assert all(isinstance(r.blob, (bytes, bytearray)) for r in rows)
    assert all(len(r.blob) == 32 * 32 // 64 for r in rows)
    assert all(r.width == 32 and r.height == 32 for r in rows)


def test_real_decode_is_marked_unimplemented(blobs):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        image_features(blobs, "doc_id", "blob", fake=False).collect()


def test_media_meta_struct(blobs):
    out = attach_media_meta(blobs, "blob", "image", "png")
    r = out.select("media_meta.*").first()
    assert r.media_type == "image" and r.format == "png"
    assert r.width is None  # sniffing stubbed


def test_x03_media_features_both_tiers(spark, sf_dir):
    """The feature-vector half of x03 (left out of the driver registry
    when x03_media_meta took the gated slot in r4): both tiers still
    run — md5 fake plumbing over text bytes AND the real pure-numpy
    BMP decode over synthesized 4x4 images — deterministically."""
    import __spark_entry__ as entry

    df = entry.x03_media_features(spark, sf_dir)
    rows = df.collect()
    by_mode = {}
    for r in rows:
        by_mode.setdefault(r["mode"], []).append(r)
    assert set(by_mode) == {"fake_plumbing", "real_bmp_decode"}
    assert len(by_mode["fake_plumbing"]) == len(by_mode["real_bmp_decode"]) > 0
    # real tier: 4x4 24-bit BMP = 54 header + 4 rows * 12-byte stride
    assert {r["n_bytes"] for r in by_mode["real_bmp_decode"]} == {102}
    # feat0 = mean R channel of a decoded image — must be a valid [0,1]
    assert all(0.0 <= r["feat0"] <= 1.0 for r in by_mode["real_bmp_decode"])
    # fake tier: md5-derived pseudo-feature in [-1, 1]
    assert all(-1.0 <= r["feat0"] <= 1.0 for r in by_mode["fake_plumbing"])
    # determinism
    again = entry.x03_media_features(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
