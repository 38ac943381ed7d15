"""Real pure-numpy codecs (WAV/BMP/PPM decode, header sniffing) and
the fake=False multimodal kernel paths they unlock."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.functions.codecs import (
    MediaDecodeError,
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_wav,
    resize_nearest,
    sniff_media_meta,
)


def _sine_wav(rate=8000, seconds=0.5, hz=440.0, channels=1) -> bytes:
    t = np.arange(int(rate * seconds)) / rate
    x = 0.5 * np.sin(2 * np.pi * hz * t)
    return encode_wav(np.tile(x[:, None], (1, channels)), rate)


def _gradient_rgb(h=10, w=16) -> np.ndarray:
    img = np.zeros((h, w, 3), dtype="u1")
    img[..., 0] = np.linspace(0, 255, w, dtype="u1")[None, :]
    img[..., 1] = np.linspace(0, 255, h, dtype="u1")[:, None]
    img[..., 2] = 7
    return img


def _ppm_bytes(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + img.tobytes()


def test_wav_roundtrip_and_rms():
    blob = _sine_wav(channels=2)
    samples, rate = decode_wav(blob)
    assert rate == 8000 and samples.shape == (4000, 2)
    # 0.5-amplitude sine → RMS ≈ 0.5/√2 ≈ 0.3536 (16-bit quantization noise)
    rms = float(np.sqrt(np.mean(samples[:, 0] ** 2)))
    assert abs(rms - 0.3536) < 0.01


def test_bmp_roundtrip_exact():
    img = _gradient_rgb()
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_ppm_decode_with_comment():
    img = _gradient_rgb(5, 7)
    assert np.array_equal(decode_ppm(_ppm_bytes(img)), img)


def test_resize_nearest_shapes_and_identity():
    img = _gradient_rgb(10, 16)
    small = resize_nearest(img, 8, 5)
    assert small.shape == (5, 8, 3)
    assert np.array_equal(resize_nearest(img, 16, 10), img)


def test_decode_image_dispatch_and_gates():
    img = _gradient_rgb()
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    assert np.array_equal(decode_image(_ppm_bytes(img)), img)
    png_header = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + struct.pack(">II", 640, 480)
    with pytest.raises(NotImplementedError, match="png"):
        decode_image(png_header)
    with pytest.raises(MediaDecodeError):
        decode_image(b"garbage")


def test_sniff_headers_without_payload_decode():
    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", 640, 480)
    assert sniff_media_meta(png) == {
        "format": "png", "width": 640, "height": 480,
        "duration_ms": None, "sample_rate": None,
    }
    gif = b"GIF89a" + struct.pack("<HH", 320, 200)
    m = sniff_media_meta(gif)
    assert (m["format"], m["width"], m["height"]) == ("gif", 320, 200)
    # minimal JPEG: SOI + SOF0 with dims
    jpeg = b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 9
    m = sniff_media_meta(jpeg)
    assert (m["format"], m["width"], m["height"]) == ("jpeg", 640, 480)
    wav = _sine_wav(rate=16000, seconds=0.25)
    m = sniff_media_meta(wav)
    assert m["format"] == "wav" and m["sample_rate"] == 16000
    assert m["duration_ms"] == 250


def test_real_kernels_through_spark(spark):
    from ai_etl_framework_spark.functions.multimodal import (
        attach_media_meta,
        audio_features,
        image_features,
        image_resize,
    )

    img_blob = encode_bmp(_gradient_rgb())
    wav_blob = _sine_wav()
    media = spark.createDataFrame(
        [(1, bytearray(img_blob), bytearray(wav_blob))], ["id", "img", "wav"]
    )

    feats = image_features(media, "id", "img", dim=8, fake=False).first()
    # mean-B channel is a constant 7/255; aspect = 10/16
    assert feats["feat"][2] == pytest.approx(7 / 255, abs=1e-6)
    assert feats["feat"][6] == pytest.approx(10 / 16)

    energy = audio_features(media, "id", "wav", window_bytes=1000, fake=False).first()
    assert energy["n_windows"] == 4
    assert all(abs(e - 0.3536) < 0.01 for e in energy["energy"])

    resized = image_resize(media, "id", "img", width=8, height=4, fake=False).first()
    out = decode_bmp(bytes(resized["blob"]))
    assert out.shape == (4, 8, 3)

    meta = attach_media_meta(media, "img", "image", "unknown", sniff=True).first()
    assert meta["media_meta"]["format"] == "bmp"
    assert meta["media_meta"]["width"] == 16 and meta["media_meta"]["height"] == 10
    wmeta = attach_media_meta(media, "wav", "audio", "wav", sniff=True).first()
    assert wmeta["media_meta"]["sample_rate"] == 8000
