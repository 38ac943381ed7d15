"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas iterators (mapInPandas) so each Python worker
touches a whole batch of blobs at once.

Decode status (two tiers, honestly separated):

- ``fake=True`` (default; what the x03 gate query runs) produces
  deterministic md5-derived pseudo-decodes so the Spark-side plumbing
  — schema, partitioning, UDF signature, batch shape — is exercised
  independent of any codec.
- ``fake=False`` REALLY decodes the codec-free container formats via
  ``functions.codecs`` (pure numpy/struct): WAV/PCM audio, BMP and
  PPM images, nearest-neighbor resize with BMP re-encode, and
  header-only metadata sniffing (PNG/JPEG/GIF/WAV dimensions and
  rates without touching compressed payload). Only formats whose
  *payload* requires a codec library (PNG IDAT, JPEG scans, MP3,
  video) raise NotImplementedError pointing at PIL/librosa/ffmpeg.

Scale notes: blobs never pass through the driver; binary columns are
read straight from parquet; per-batch decode keeps Arrow transfers
amortized. For very large blobs, repartition by size-bucket first so
batches stay within worker memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|jpg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = "id long, n_bytes long, sha long, feat array<double>"
FRAME_SAMPLE_SCHEMA = "id long, frame_idx int, frame_sha long"


def _fake_decode(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-feature vector: bytes of
    md5(blob) scaled to [-1, 1]."""
    h = hashlib.md5(blob or b"").digest()
    return [((h[i % 16] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def image_features(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    dim: int = 8,
    fake: bool = True,
) -> DataFrame:
    """blob → feature vector. ``fake=False`` decodes BMP/PPM for real
    (per-channel mean/std + aspect + fill, zero-padded to ``dim``);
    compressed formats raise toward PIL."""

    def run(batches) -> Iterator:
        import pandas as pd

        def real_feat(b: bytes) -> list[float]:
            from ai_etl_framework_spark.functions.codecs import decode_image

            img = decode_image(b or b"").astype("float64") / 255.0
            h, w = img.shape[:2]
            feat = (
                list(img.mean(axis=(0, 1)))           # mean R,G,B
                + list(img.std(axis=(0, 1)))          # std  R,G,B
                + [h / max(w, 1), img.mean()]         # aspect, fill
            )
            return (feat + [0.0] * dim)[:dim]

        for pdf in batches:
            decode = (lambda b: _fake_decode(b, dim)) if fake else real_feat
            out = pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": pdf[blob_col].apply(lambda b: len(b) if b is not None else 0),
                    "sha": pdf[blob_col].apply(
                        lambda b: int.from_bytes(hashlib.md5(b or b"").digest()[:8], "big") >> 1
                    ),
                    "feat": pdf[blob_col].apply(decode),
                }
            )
            yield out

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    every_n: int = 10,
    max_frames: int = 4,
    fake: bool = True,
) -> DataFrame:
    """video blob → sampled frame signatures (1 row per frame).
    The fake decode treats every ``every_n`` KiB of the blob as a
    'frame' so the explode shape (1→N rows) is exercised for real."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError("real video decode needs ffmpeg/pyav")
            rows = []
            for _, r in pdf.iterrows():
                blob = r[blob_col] or b""
                n_frames = min(max_frames, max(1, len(blob) // (every_n * 1024)))
                for i in range(n_frames):
                    chunk = blob[i * every_n * 1024 : (i + 1) * every_n * 1024]
                    rows.append(
                        {
                            "id": r[id_col],
                            "frame_idx": i,
                            "frame_sha": int.from_bytes(
                                hashlib.md5(chunk).digest()[:8], "big"
                            )
                            >> 1,
                        }
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame_sha"])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(run, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = "id long, n_windows int, energy array<double>"
RESIZE_SCHEMA = "id long, blob binary, width int, height int"


def audio_features(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    window_bytes: int = 4096,
    max_windows: int = 16,
    fake: bool = True,
) -> DataFrame:
    """audio blob → per-window energy vector. ``fake=False`` decodes
    PCM WAV for real and emits per-window RMS over samples (window =
    ``window_bytes`` samples there); compressed audio raises toward
    librosa. The fake kernel sums byte values per window — same shape
    either way: one row per blob, one float per window."""

    def run(batches) -> Iterator:
        import numpy as np
        import pandas as pd

        def real_energy(blob: bytes) -> list[float]:
            from ai_etl_framework_spark.functions.codecs import decode_wav

            samples, _ = decode_wav(blob or b"")
            mono = samples.mean(axis=1)
            n = min(max_windows, max(1, len(mono) // window_bytes))
            return [
                float(np.sqrt(np.mean(np.square(mono[i * window_bytes:(i + 1) * window_bytes]))))
                for i in range(n)
            ]

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                blob = r[blob_col] or b""
                if fake:
                    n = min(max_windows, max(1, len(blob) // window_bytes))
                    energy = [
                        sum(blob[i * window_bytes : (i + 1) * window_bytes]) / max(window_bytes, 1)
                        for i in range(n)
                    ]
                else:
                    energy = real_energy(blob)
                rows.append({"id": r[id_col], "n_windows": len(energy), "energy": energy})
            yield pd.DataFrame(rows, columns=["id", "n_windows", "energy"])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def image_resize(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    width: int = 224,
    height: int = 224,
    fake: bool = True,
) -> DataFrame:
    """blob → resized blob (binary in, binary out — the common
    preprocessing shape). ``fake=False`` really decodes BMP/PPM,
    nearest-neighbor resizes, and re-encodes as 24-bit BMP; the fake
    kernel emits a deterministic md5-seeded byte string of
    width*height/64 bytes so downstream operators see realistic
    binary output sizes."""

    def run(batches) -> Iterator:
        import pandas as pd

        def real_resize(b: bytes) -> bytes:
            from ai_etl_framework_spark.functions.codecs import (
                decode_image,
                encode_bmp,
                resize_nearest,
            )

            return encode_bmp(resize_nearest(decode_image(b or b""), width, height))

        for pdf in batches:
            out_len = max(16, width * height // 64)

            def fake_resize(b: bytes) -> bytes:
                seed = hashlib.md5(b or b"").digest()
                reps = out_len // len(seed) + 1
                return (seed * reps)[:out_len]

            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "blob": pdf[blob_col].apply(fake_resize if fake else real_resize),
                    "width": width,
                    "height": height,
                }
            )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(run, RESIZE_SCHEMA)


def attach_media_meta(
    df: DataFrame,
    blob_col: str,
    media_type: str,
    fmt: str,
    sniff: bool = False,
) -> DataFrame:
    """Typed metadata struct next to the blob. With ``sniff=True`` the
    struct is REALLY populated from container headers (pandas_udf over
    functions.codecs.sniff_media_meta — PNG/JPEG/GIF/BMP/PPM
    dimensions, WAV rate/duration) without decoding any compressed
    payload; declared ``fmt`` is overridden by the sniffed one when
    recognized. Default keeps the declared-only struct (no per-blob
    work at plan time)."""
    if not sniff:
        return df.withColumn(
            "media_meta",
            F.struct(
                F.lit(media_type).alias("media_type"),
                F.lit(fmt).alias("format"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
                F.lit(None).cast("int").alias("sample_rate"),
            ),
        )
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(MEDIA_META)
    def sniff_udf(blobs: pd.Series) -> pd.DataFrame:
        from ai_etl_framework_spark.functions.codecs import sniff_media_meta

        rows = []
        for b in blobs:
            meta = sniff_media_meta(bytes(b) if b is not None else b"")
            rows.append(
                {
                    "media_type": media_type,
                    "format": meta["format"] or fmt,
                    "width": meta["width"],
                    "height": meta["height"],
                    "duration_ms": meta["duration_ms"],
                    "sample_rate": meta["sample_rate"],
                }
            )
        return pd.DataFrame(rows)

    return df.withColumn("media_meta", sniff_udf(F.col(blob_col)))
