"""Real (dependency-free) binary codecs for the multimodal pipeline (S6).

PIL/ffmpeg are absent from this container, but two real formats decode with
stdlib + numpy alone:

- **BMP** (24-bit uncompressed, the original Windows DIB format): plain
  struct headers + a bottom-up padded pixel array — full encode/decode here,
  byte-exact round-trip (pytest-pinned).
- **WAV** (PCM16): stdlib ``wave`` + numpy frombuffer.
- **PPM (P6) / PGM (P5)** (binary netpbm): ASCII header + raw pixel array —
  the formats ImageMagick/netpbm pipelines interchange.

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


_WS = b" \t\r\n"


def _pnm_header(payload: bytes, magic: bytes, n_fields: int) -> tuple[list[int], int]:
    """Parse a netpbm header (magic + n_fields ints, '#' comments allowed);
    returns (fields, data_offset)."""
    if payload[:2] != magic:
        raise ValueError(f"not a {magic.decode()} payload")
    i, fields = 2, []
    while len(fields) < n_fields:
        while i < len(payload) and payload[i:i + 1] in (b" ", b"\t", b"\r", b"\n"):
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and payload[j:j + 1] not in (b" ", b"\t", b"\r", b"\n"):
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    return fields, i + 1   # single whitespace after maxval


def encode_ppm(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8 RGB."""
    (w, h, maxval), off = _pnm_header(payload, b"P6", 3)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return np.frombuffer(payload, np.uint8, count=h * w * 3, offset=off).reshape(h, w, 3).copy()


def encode_pgm(gray: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale -> binary PGM (P5)."""
    h, w = gray.shape
    assert gray.dtype == np.uint8
    return b"P5\n%d %d\n255\n" % (w, h) + gray.tobytes()


def decode_pgm(payload: bytes) -> np.ndarray:
    """Binary PGM (P5) -> (h, w) uint8 grayscale."""
    (w, h, maxval), off = _pnm_header(payload, b"P5", 3)
    if maxval != 255:
        raise ValueError(f"unsupported PGM maxval {maxval}")
    return np.frombuffer(payload, np.uint8, count=h * w, offset=off).reshape(h, w).copy()


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-sniffed image decode (BMP / PPM / PGM) -> (h, w, 3) uint8 RGB
    (grayscale expands to 3 identical channels) — the dispatch a media
    pipeline's downloader applies per content type."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"P5":
        g = decode_pgm(payload)
        return np.repeat(g[:, :, None], 3, axis=2)
    raise ValueError(f"unknown image magic {payload[:2]!r}")


_RAYV_MAGIC = b"RAYV"


def encode_rayv(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Frame sequence -> RAYV container bytes: an AVI-stand-in for the video
    path (ffmpeg is absent from this container, so the container format is
    ours, but the per-frame codec is the real BMP encoder and the INDEX
    TABLE is the load-bearing part — frame-sampling seeks by index instead
    of decoding the stream).

    Layout: ``RAYV | u32 version | u32 n_frames | u32 fps |
    u32[n_frames] frame byte lengths | concatenated BMP frames``.
    """
    blobs = [encode_bmp(f) for f in frames]
    hdr = _RAYV_MAGIC + struct.pack("<III", 1, len(blobs), fps)
    idx = struct.pack("<%dI" % len(blobs), *[len(b) for b in blobs])
    return hdr + idx + b"".join(blobs)


def rayv_index(payload: bytes) -> tuple[int, np.ndarray, np.ndarray]:
    """RAYV header parse -> (fps, frame_offsets, frame_lengths). O(header),
    no frame decode — the seek table a sampler uses."""
    if payload[:4] != _RAYV_MAGIC:
        raise ValueError("not a RAYV payload")
    version, n, fps = struct.unpack_from("<III", payload, 4)
    if version != 1:
        raise ValueError(f"unsupported RAYV version {version}")
    lengths = np.frombuffer(payload, dtype=np.uint32, offset=16, count=n) \
        .astype(np.int64)
    offsets = 16 + 4 * n + np.concatenate([[0], np.cumsum(lengths[:-1])])
    return fps, offsets, lengths


def decode_rayv_frame(payload: bytes, k: int) -> np.ndarray:
    """Decode ONLY frame k of a RAYV container (index seek + one BMP
    decode) -> (h, w, 3) uint8 RGB."""
    _, offsets, lengths = rayv_index(payload)
    o, ln = int(offsets[k]), int(lengths[k])
    return decode_bmp(payload[o:o + ln])


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
