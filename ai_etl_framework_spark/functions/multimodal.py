"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas iterators (mapInPandas) so each Python worker
touches a whole batch of blobs at once.

The image/audio codec libraries are NOT in this container, so the
decode kernels are STUBBED: ``fake=True`` (default) produces
deterministic md5-derived pseudo-decodes so the Spark-side plumbing —
schema, partitioning, UDF signature, batch shape — is real and
testable; ``fake=False`` raises NotImplementedError where PIL/librosa
would be called.

Scale notes: blobs never pass through the driver; binary columns are
read straight from parquet; per-batch decode keeps Arrow transfers
amortized. For very large blobs, repartition by size-bucket first so
batches stay within worker memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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
    """blob → feature vector. Real implementation would PIL-decode and
    run a vision encoder; stubbed per module doc."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode needs PIL/torchvision (not in this container)"
                )
            out = pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": pdf[blob_col].apply(lambda b: len(b) if b is not None else 0),
                    "sha": pdf[blob_col].apply(
                        lambda b: int.from_bytes(hashlib.md5(b or b"").digest()[:8], "big") >> 1
                    ),
                    "feat": pdf[blob_col].apply(lambda b: _fake_decode(b, dim)),
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
    """audio blob → per-window energy vector. Real implementation
    would librosa-decode and compute RMS/MFCC; the fake kernel sums
    byte values per window (same shape: one row per blob, one float
    per window), so batching and schema are exercised for real."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError("real audio decode needs librosa/soundfile")
            rows = []
            for _, r in pdf.iterrows():
                blob = r[blob_col] or b""
                n = min(max_windows, max(1, len(blob) // window_bytes))
                energy = [
                    sum(blob[i * window_bytes : (i + 1) * window_bytes]) / max(window_bytes, 1)
                    for i in range(n)
                ]
                rows.append({"id": r[id_col], "n_windows": n, "energy": energy})
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
    preprocessing shape). The fake kernel emits a deterministic
    md5-seeded byte string of width*height/64 bytes so downstream
    operators see realistic binary output sizes."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError("real image resize needs PIL")
            out_len = max(16, width * height // 64)

            def resize(b: bytes) -> bytes:
                seed = hashlib.md5(b or b"").digest()
                reps = out_len // len(seed) + 1
                return (seed * reps)[:out_len]

            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "blob": pdf[blob_col].apply(resize),
                    "width": width,
                    "height": height,
                }
            )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(run, RESIZE_SCHEMA)


def attach_media_meta(df: DataFrame, blob_col: str, media_type: str, fmt: str) -> DataFrame:
    """Typed metadata struct next to the blob (sniffing stubbed:
    width/height/duration are NULL until real codecs are wired)."""
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
