"""Real (dependency-free) binary codecs for the multimodal pipeline (S6).

PIL/ffmpeg are absent from this container, but two real formats decode with
stdlib + numpy alone:

- **BMP** (24-bit uncompressed, the original Windows DIB format): plain
  struct headers + a bottom-up padded pixel array — full encode/decode here,
  byte-exact round-trip (pytest-pinned).
- **WAV** (PCM16): stdlib ``wave`` + numpy frombuffer.

These make the S6 media pipeline a GENUINE decode path, not a stub: the
actor-pool stage parses real image/audio bytes and computes real pixel /
sample statistics.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

_BMP_HEADER = 54  # BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24bpp uncompressed BMP bytes."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    filehdr = struct.pack("<2sIHHI", b"BM", _BMP_HEADER + len(data), 0, 0, _BMP_HEADER)
    infohdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                          2835, 2835, 0, 0)
    return filehdr + infohdr + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24bpp uncompressed BMP bytes -> (h, w, 3) uint8 RGB (top-down)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: {bpp}bpp compression={comp}")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, offset=off,
                         count=stride * h).reshape(h, stride)
    return rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy()


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> PCM16 WAV bytes."""
    assert samples.dtype == np.int16
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM16 WAV bytes -> (sample_rate, int16 mono samples)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("unsupported WAV layout")
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    return rate, np.frombuffer(frames, dtype=np.int16)
