"""Pure-python/numpy media codecs for the multimodal kernels.

The container has no PIL/librosa/ffmpeg, but uncompressed container
formats need none of them — WAV/PCM, BMP (BI_RGB), and PPM (P6) are
fixed-layout byte structures, and the *headers* of PNG/JPEG/GIF carry
dimensions without touching compressed payload. This module gives the
mapInPandas kernels a real decode path for those formats; compressed
pixel/sample payloads (PNG IDAT, JPEG scans, MP3/AAC frames) remain
import-gated to the real codec libraries.

Everything here operates on ``bytes`` → numpy and is deterministic, so
the Spark kernels stay testable byte-for-byte.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np


class MediaDecodeError(ValueError):
    """Malformed or unsupported-by-pure-python media payload."""


# ---------------------------------------------------------------------------
# WAV (RIFF/PCM)
# ---------------------------------------------------------------------------

def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (samples float32 in [-1, 1] of shape (n, channels),
    sample_rate). Supports 8/16/32-bit integer PCM (format 1) and
    32-bit float PCM (format 3)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise MediaDecodeError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if channels <= 0:
        # a hostile/corrupt fmt chunk must fail as a DECODE error —
        # a raw ZeroDivisionError below would escape sniff_media_meta's
        # catch list and kill the whole Spark task on one bad blob
        raise MediaDecodeError(f"invalid channel count: {channels}")
    if audio_format == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 8:
        x = (np.frombuffer(data, dtype="u1").astype(np.float32) - 128.0) / 128.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise MediaDecodeError(f"unsupported PCM layout: format={audio_format} bits={bits}")
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) float in [-1, 1] → 16-bit PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    channels = samples.shape[1]
    byte_rate = rate * channels * 2
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate, byte_rate, channels * 2, 16)
        + b"data" + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


# ---------------------------------------------------------------------------
# BMP (BI_RGB 24/32-bit) and PPM (P6)
# ---------------------------------------------------------------------------

def decode_bmp(blob: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → RGB uint8 array (h, w, 3)."""
    if len(blob) < 54 or blob[:2] != b"BM":
        raise MediaDecodeError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", blob, 10)
    w, h = struct.unpack_from("<ii", blob, 18)
    (bpp,) = struct.unpack_from("<H", blob, 28)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if compression != 0 or bpp not in (24, 32):
        raise MediaDecodeError(f"unsupported BMP: bpp={bpp} compression={compression}")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    rows = np.frombuffer(
        blob, dtype="u1", count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    rgb = rows[..., 2::-1]  # BGR(A) → RGB
    return (rgb[::-1] if flip else rgb).copy()


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP bytes."""
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype="u1")
    body[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    raw = body.tobytes()
    hdr = (
        b"BM" + struct.pack("<IHHI", 54 + len(raw), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw), 2835, 2835, 0, 0)
    )
    return hdr + raw


def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary netpbm P6 → RGB uint8 array (h, w, 3)."""
    if not blob.startswith(b"P6"):
        raise MediaDecodeError("not a P6 PPM payload")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":  # comment line
            pos = blob.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    w, h, maxval = fields
    if maxval > 255:
        raise MediaDecodeError("16-bit PPM unsupported")
    pos += 1  # single whitespace after maxval
    return np.frombuffer(blob, dtype="u1", count=w * h * 3, offset=pos).reshape(h, w, 3).copy()


def resize_nearest(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize — index arithmetic only."""
    h, w = rgb.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return rgb[yi][:, xi]


def decode_image(blob: bytes, fmt: Optional[str] = None) -> np.ndarray:
    """Dispatch on sniffed container; raises NotImplementedError for
    formats whose PAYLOAD needs a codec library (png/jpeg/gif...)."""
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:2] == b"P6":
        return decode_ppm(blob)
    known = sniff_format(blob) or fmt
    if known in ("png", "jpeg", "gif", "webp"):
        raise NotImplementedError(
            f"{known} payload decode needs PIL/imageio (headers are parsed "
            "without it — see sniff_media_meta)"
        )
    raise MediaDecodeError("unrecognized image container")


# ---------------------------------------------------------------------------
# header sniffing (no payload decode — works for compressed formats too)
# ---------------------------------------------------------------------------

def sniff_format(blob: bytes) -> Optional[str]:
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if blob[:2] == b"\xff\xd8":
        return "jpeg"
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:2] == b"P6":
        return "ppm"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        return "webp"
    return None


def sniff_media_meta(blob: bytes) -> dict:
    """{"format", "width", "height", "duration_ms", "sample_rate"} from
    headers alone (each None when inapplicable/unparseable)."""
    out = {"format": sniff_format(blob), "width": None, "height": None,
           "duration_ms": None, "sample_rate": None}
    try:
        if out["format"] == "png":
            out["width"], out["height"] = struct.unpack_from(">II", blob, 16)
        elif out["format"] == "gif":
            out["width"], out["height"] = struct.unpack_from("<HH", blob, 6)
        elif out["format"] == "bmp":
            w, h = struct.unpack_from("<ii", blob, 18)
            out["width"], out["height"] = w, abs(h)
        elif out["format"] == "ppm":
            img = decode_ppm(blob)
            out["height"], out["width"] = img.shape[:2]
        elif out["format"] == "jpeg":
            out["width"], out["height"] = _jpeg_dims(blob)
        elif out["format"] == "wav":
            samples, rate = decode_wav(blob)
            out["sample_rate"] = rate
            out["duration_ms"] = int(len(samples) * 1000 / rate) if rate else None
    except (MediaDecodeError, struct.error, ValueError):
        pass
    return out


def _jpeg_dims(blob: bytes) -> tuple[Optional[int], Optional[int]]:
    """Walk JPEG markers to the first SOF segment — header-only."""
    pos = 2
    while pos + 9 < len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (size,) = struct.unpack_from(">H", blob, pos + 2)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack_from(">HH", blob, pos + 5)
            return w, h
        pos += 2 + size
    return None, None
