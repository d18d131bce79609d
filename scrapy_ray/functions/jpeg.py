"""Pure-numpy baseline JPEG codec (ITU-T T.81 baseline sequential DCT,
Huffman entropy coding, JFIF container) — closes the last env-gated media
stub honestly: this container has no PIL/libjpeg/ffmpeg, so both the
encoder and the decoder are implemented from the public spec. Annex K
quantization + Huffman tables; 4:4:4 subsampling on the encode side; the
decoder handles any (h,v) sampling factors (incl. 4:2:0) via per-component
plane decode + nearest-neighbor upsample, and DRI/RSTn restart markers.

Round-trip is LOSSY by design — tests pin bounded reconstruction error
(quantization noise), exact dimensions, and marker-level robustness.
Performance note: entropy coding is bit-serial Python (spec-faithful, fine
for the actor-pool decode stage at test scale); the DCT/quant/color math is
vectorized numpy over whole planes.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 / K.2 base quantization tables (natural order via zigzag below)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8x8 DCT-II matrix: row u, col x
_C = np.zeros((8, 8))
for _u in range(8):
    a = np.sqrt(0.125) if _u == 0 else 0.5
    _C[_u] = a * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16.0)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of an Annex K base table."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def _canonical_codes(bits, values):
    """(length, code) per symbol from a DHT (bits, values) spec."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:               # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)   # pad with 1-bits per spec

    def marker(self, b2: int) -> None:
        """Emit a raw marker (RSTn) — byte-aligned, NOT stuffed."""
        self.align()
        self.buf += bytes([0xFF, b2])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extra-bits value) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255) \
        .astype(np.uint8)


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane (padded to multiples of 8 by edge replication) ->
    (n_by, n_bx, 8, 8) block array."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = plane.shape
    return (plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3),
            )[0]


def _encode_block(bw, zz, prev_dc, dct, act) -> int:
    """Huffman-encode one zigzagged quantized block; returns its DC."""
    diff = int(zz[0]) - prev_dc
    cat, bits = _magnitude(diff)
    ln, code = dct[cat]
    bw.write(code, ln)
    if cat:
        bw.write(bits, cat)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = act[0xF0]      # ZRL
            bw.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        ln, code = act[(run << 4) | cat]
        bw.write(code, ln)
        bw.write(bits, cat)
        run = 0
    if last < 63:
        ln, code = act[0x00]          # EOB
        bw.write(code, ln)
    return int(zz[0])


def _coef_grids(rgb: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front half (baseline AND progressive — both scan
    organizations carry the SAME quantized coefficients): color transform,
    optional chroma subsampling, padded MCU-aligned vectorized DCT + quant.
    Returns (comps, samp, qlum, qchr, h, w, mcux, mcuy); comps[ci] is an
    (nby, nbx, 8, 8) int64 natural-order coefficient grid."""
    assert rgb.ndim == 3 and rgb.shape[2] == 3 and rgb.dtype == np.uint8
    assert subsampling in ("444", "420")
    h, w, _ = rgb.shape
    ycc = _rgb_to_ycbcr(rgb)
    qlum = _scaled_q(_Q_LUM, quality)
    qchr = _scaled_q(_Q_CHR, quality)

    if subsampling == "444":
        samp = [(1, 1), (1, 1), (1, 1)]
        planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
    else:
        samp = [(2, 2), (1, 1), (1, 1)]
        # chroma 2x2 box mean over an even-padded plane
        yp = np.pad(ycc, ((0, -h % 2), (0, -w % 2), (0, 0)), mode="edge")

        def box2(p: np.ndarray) -> np.ndarray:
            return (p[0::2, 0::2] + p[0::2, 1::2]
                    + p[1::2, 0::2] + p[1::2, 1::2]) * 0.25

        planes = [ycc[:, :, 0], box2(yp[:, :, 1]), box2(yp[:, :, 2])]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # pad every plane to its MCU-aligned size, then vectorized DCT + quant
    comps = []
    for ci, ((sh, sv), plane) in enumerate(zip(samp, planes)):
        q = (qlum if ci == 0 else qchr).reshape(8, 8)
        H, W = mcuy * sv * 8, mcux * sh * 8
        p = np.pad(plane, ((0, H - plane.shape[0]), (0, W - plane.shape[1])),
                   mode="edge")
        blocks = _plane_blocks(p - 128.0)
        coef = np.einsum("ux,byxv,wv->byuw", _C, blocks, _C)
        comps.append(np.round(coef / q).astype(np.int64))
    return comps, samp, qlum, qchr, h, w, mcux, mcuy


def encode_jpeg(rgb: np.ndarray, quality: int = 90,
                subsampling: str = "444", restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes.

    ``subsampling``: "444" (every component full-resolution, Y h=v=1) or
    "420" (chroma 2x2 box-averaged, Y h=v=2 — the common web layout).
    ``restart_interval``: emit DRI + RSTn markers every N MCUs (0 = none)
    — exercises the decoder's restart resynchronization path."""
    comps, samp, qlum, qchr, h, w, mcux, mcuy = _coef_grids(
        rgb, quality, subsampling)

    dc_lum = _canonical_codes(*_DC_LUM)
    ac_lum = _canonical_codes(*_AC_LUM)
    dc_chr = _canonical_codes(*_DC_CHR)
    ac_chr = _canonical_codes(*_AC_CHR)

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                bw.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                prev_dc = [0, 0, 0]
            mcu_count += 1
            for ci, (sh, sv) in enumerate(samp):
                dct, act = (dc_lum, ac_lum) if ci == 0 else (dc_chr, ac_chr)
                for byi in range(sv):
                    for bxi in range(sh):
                        zz = comps[ci][my * sv + byi,
                                       mx * sh + bxi].ravel()[ZIGZAG]
                        prev_dc[ci] = _encode_block(bw, zz, prev_dc[ci],
                                                    dct, act)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc: int, th: int, spec) -> bytes:
        bits, values = spec
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)

    out = bytearray()
    out += struct.pack(">H", 0xFFD8)                       # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00" +
               struct.pack(">HH", 1, 1) + b"\x00\x00")     # APP0
    out += seg(0xFFDB, b"\x00" + bytes(qlum[ZIGZAG].tolist()))
    out += seg(0xFFDB, b"\x01" + bytes(qchr[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for (sh, sv), (cid, qt) in zip(samp, ((1, 0), (2, 1), (3, 1))):
        sof += bytes([cid, (sh << 4) | sv, qt])
    out += seg(0xFFC0, sof)                                # SOF0
    out += seg(0xFFC4, dht(0, 0, _DC_LUM))
    out += seg(0xFFC4, dht(1, 0, _AC_LUM))
    out += seg(0xFFC4, dht(0, 1, _DC_CHR))
    out += seg(0xFFC4, dht(1, 1, _AC_CHR))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)                                # SOS
    out += scan
    out += struct.pack(">H", 0xFFD9)                       # EOI
    return bytes(out)


# ------------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing;
    stops (raises StopIteration sentinel via _Marker) at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:   # RSTn handled by caller via sync()
                raise _Restart(nxt)
            else:
                raise _Marker()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker and byte-align."""
        self.acc = 0
        self.n = 0
        self.pos += 2


class _Marker(Exception):
    pass


class _Restart(Exception):
    def __init__(self, b):
        self.b = b


def _decode_tree(bits, values):
    """(length -> {code -> symbol}) decode map."""
    maps: dict[int, dict[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1]:
            m = maps.setdefault(length, {})
            for _ in range(bits[length - 1]):
                m[code] = values[k]
                code += 1
                k += 1
        code <<= 1
    return maps


def _read_symbol(br: _BitReader, maps) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        m = maps.get(length)
        if m is not None and code in m:
            return m[code]
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _parse_dqt(body: bytes, qtabs: dict) -> None:
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0xF
        if pq != 0:
            raise ValueError("16-bit quant tables unsupported")
        q = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8) \
              .astype(np.int64)[UNZIGZAG]
        qtabs[tq] = q.reshape(8, 8)
        i += 65


def _parse_dht(body: bytes, htabs: dict) -> None:
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 0xF
        bits = list(body[i + 1:i + 17])
        nv = sum(bits)
        values = list(body[i + 17:i + 17 + nv])
        htabs[(tc, th)] = _decode_tree(bits, values)
        i += 17 + nv


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF bytes -> (h, w, 3) uint8 RGB. Supports baseline (SOF0/SOF1)
    AND progressive (SOF2, ITU T.81 Annex G: spectral selection +
    successive approximation, DC/AC first + refinement scans, EOB runs)
    with 1 or 3 components, arbitrary (h,v) sampling factors
    (4:4:4 / 4:2:0 / 4:2:2), DRI restart intervals. Arithmetic-coded /
    hierarchical / lossless SOFs raise ValueError."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple, object] = {}
    comps = None   # list of dicts: id, h, v, qt
    h = w = 0
    dri = 0
    progressive = False
    while True:
        if d[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = struct.unpack(">H", d[pos:pos + 2])[0]
        pos += 2
        if marker == 0xFFD9:
            raise ValueError("EOI before SOS")
        ln = struct.unpack(">H", d[pos:pos + 2])[0]
        body = d[pos + 2:pos + ln]
        pos += ln
        if marker == 0xFFDB:
            _parse_dqt(body, qtabs)
        elif marker == 0xFFC4:
            _parse_dht(body, htabs)
        elif marker in (0xFFC0, 0xFFC1, 0xFFC2):
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            progressive = marker == 0xFFC2
            comps = []
            for c in range(nc):
                cid, hv, qt = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "qt": qt})
        elif marker in (0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xFFDD:
            dri = struct.unpack(">H", body[:2])[0]
        elif marker == 0xFFDA:
            if progressive:
                if comps is None:
                    raise ValueError("SOS before SOF2")
                return _decode_progressive(d, pos, body, qtabs, htabs,
                                           comps, h, w, dri)
            ns = body[0]
            sel = {}
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                sel[cid] = (tt >> 4, tt & 0xF)
            break
        # else: APPn / COM — skipped
    if comps is None:
        raise ValueError("missing SOF0")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))

    br = _BitReader(d, pos)
    prev_dc = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                # expect an RSTn: bits until marker raise _Restart
                try:
                    while True:
                        br.bit()
                except _Restart:
                    br.sync_restart()
                    prev_dc = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_maps = htabs[(0, sel[c["id"]][0])]
                ac_maps = htabs[(1, sel[c["id"]][1])]
                q = qtabs[c["qt"]]
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _read_symbol(br, dc_maps)
                        diff = _extend(br.bits(s), s) if s else 0
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, ac_maps)
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:       # EOB
                                break
                            if rs == 0xF0:       # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz            # inverse zigzag
                        coef = blk.reshape(8, 8) * q
                        pix = _C.T @ coef @ _C + 128.0
                        y0 = (my * c["v"] + byi) * 8
                        x0 = (mx * c["h"] + bxi) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix

    # upsample every component to full resolution, crop to (h, w)
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(full[0], full[1], full[2])


# ------------------------------------------- progressive (SOF2, T.81 Annex G)


def _ac_first(br, blk, Ss, Se, Al, eobrun, ac):
    """One block of an AC first scan (Ah=0): run-length + EOB-run decode
    into zigzag positions Ss..Se, values shifted left by Al. Returns the
    remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = _read_symbol(br, ac)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:                  # ZRL: 16 zeros
                k += 16
                continue
            eobrun = (1 << r) - 1        # EOBn: 2^r + extension bits blocks
            if r:
                eobrun += br.bits(r)
            return eobrun
        k += r
        if k > Se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(br.bits(s), s) << Al
        k += 1
    return 0


def _ac_refine(br, blk, Ss, Se, Al, eobrun, ac):
    """One block of an AC refinement scan (Ah=Al+1): G.1.2.3 — correction
    bits for already-nonzero coefficients, newly-significant +-1<<Al
    insertions, EOB runs. Returns the remaining EOB run."""
    p1 = 1 << Al
    m1 = -1 << Al
    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = _read_symbol(br, ac)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:               # EOBn: 2^r (+ext) blocks INCLUDING
                    eobrun = 1 << r      # this one — its remaining corr
                    if r:                # bits ride the EOB branch below
                        eobrun += br.bits(r)
                    break
                val = 0                  # ZRL: 16 zero-history positions
            else:                        # s == 1 always in refinement
                val = p1 if br.bit() else m1
            while k <= Se:
                if blk[k] != 0:          # history: correction bit
                    if br.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if r == 0:
                        if val:
                            blk[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        # EOB span: correction bits for the remaining nonzero history
        while k <= Se:
            if blk[k] != 0:
                if br.bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(d, pos, sos_body, qtabs, htabs, comps, h, w, dri):
    """Multi-scan progressive entropy decode + final dequant/IDCT.

    Coefficients accumulate per component in zigzag order over the padded
    MCU block grid; DC scans walk the interleaved MCU layout (or the
    component's own ceil-grid when single-component), AC scans are always
    single-component over the ceil-grid (T.81 G.1)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        cw = -(-w * c["h"] // hmax)      # component width, T.81 A.1.1 ceil
        ch = -(-h * c["v"] // vmax)      # component height
        c["bw"] = -(-cw // 8)            # non-interleaved block-grid dims
        c["bh"] = -(-ch // 8)
    coefs = [np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
             for c in comps]

    while True:
        # ---- parse this scan's header
        ns = sos_body[0]
        scomps = []
        for i in range(ns):
            cid, tt = sos_body[1 + 2 * i], sos_body[2 + 2 * i]
            ci = next(j for j, c in enumerate(comps) if c["id"] == cid)
            scomps.append((ci, tt >> 4, tt & 0xF))
        Ss, Se = sos_body[1 + 2 * ns], sos_body[2 + 2 * ns]
        a = sos_body[3 + 2 * ns]
        Ah, Al = a >> 4, a & 0xF
        br = _BitReader(d, pos)

        def _expect_restart(br):
            try:
                while True:
                    br.bit()
            except _Restart:
                br.sync_restart()

        if Ss == 0:                      # ---- DC scan
            if Se != 0:
                raise ValueError("DC scan with Se != 0")
            prev_dc = [0] * len(scomps)
            n_units = 0
            if ns == 1:                  # non-interleaved: component grid
                ci, td, _ta = scomps[0]
                c = comps[ci]
                dc_maps = htabs.get((0, td))
                for bi in range(c["bh"] * c["bw"]):
                    if dri and n_units and n_units % dri == 0:
                        _expect_restart(br)
                        prev_dc = [0]
                    n_units += 1
                    blk = coefs[ci][bi // c["bw"], bi % c["bw"]]
                    if Ah == 0:
                        s = _read_symbol(br, dc_maps)
                        diff = _extend(br.bits(s), s) if s else 0
                        prev_dc[0] += diff
                        blk[0] = prev_dc[0] << Al
                    elif br.bit():
                        blk[0] |= 1 << Al
            else:                        # interleaved MCU layout
                for my in range(mcuy):
                    for mx in range(mcux):
                        if dri and n_units and n_units % dri == 0:
                            _expect_restart(br)
                            prev_dc = [0] * len(scomps)
                        n_units += 1
                        for si, (ci, td, _ta) in enumerate(scomps):
                            c = comps[ci]
                            dc_maps = htabs.get((0, td))
                            for byi in range(c["v"]):
                                for bxi in range(c["h"]):
                                    blk = coefs[ci][my * c["v"] + byi,
                                                    mx * c["h"] + bxi]
                                    if Ah == 0:
                                        s = _read_symbol(br, dc_maps)
                                        diff = (_extend(br.bits(s), s)
                                                if s else 0)
                                        prev_dc[si] += diff
                                        blk[0] = prev_dc[si] << Al
                                    elif br.bit():
                                        blk[0] |= 1 << Al
        else:                            # ---- AC scan (single component)
            if ns != 1:
                raise ValueError("interleaved AC scan is illegal (G.1)")
            ci, _td, ta = scomps[0]
            c = comps[ci]
            ac = htabs[(1, ta)]
            eobrun = 0
            for bi in range(c["bh"] * c["bw"]):
                if dri and bi and bi % dri == 0:
                    _expect_restart(br)
                    eobrun = 0
                blk = coefs[ci][bi // c["bw"], bi % c["bw"]]
                if Ah == 0:
                    eobrun = _ac_first(br, blk, Ss, Se, Al, eobrun, ac)
                else:
                    eobrun = _ac_refine(br, blk, Ss, Se, Al, eobrun, ac)

        # ---- resync to the next marker (skip pad bits / stuffing / RSTn)
        p = br.pos
        while True:
            while not (d[p] == 0xFF and d[p + 1] != 0x00):
                p += 1
            if 0xD0 <= d[p + 1] <= 0xD7:
                p += 2
                continue
            break
        pos = p
        # ---- markers until the next SOS / EOI
        sos_body = None
        while True:
            marker = struct.unpack(">H", d[pos:pos + 2])[0]
            pos += 2
            if marker == 0xFFD9:         # EOI: all scans consumed
                break
            ln = struct.unpack(">H", d[pos:pos + 2])[0]
            body = d[pos + 2:pos + ln]
            pos += ln
            if marker == 0xFFC4:
                _parse_dht(body, htabs)
            elif marker == 0xFFDB:
                _parse_dqt(body, qtabs)
            elif marker == 0xFFDD:
                dri = struct.unpack(">H", body[:2])[0]
            elif marker == 0xFFDA:
                sos_body = body
                break
            # else: APPn / COM / DNL — skipped
        if sos_body is None:
            break

    # ---- dequantize + IDCT (vectorized per component), upsample, crop
    full = []
    for c, grid in zip(comps, coefs):
        q = qtabs[c["qt"]].astype(np.float64)
        nby, nbx, _ = grid.shape
        nat = np.zeros((nby, nbx, 64), dtype=np.float64)
        nat[:, :, ZIGZAG] = grid         # inverse zigzag
        pix = np.einsum("ux,byuv,vw->byxw", _C,
                        nat.reshape(nby, nbx, 8, 8) * q, _C) + 128.0
        p = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(full[0], full[1], full[2])


def encode_jpeg_progressive(rgb: np.ndarray, quality: int = 90,
                            subsampling: str = "444") -> bytes:
    """(h, w, 3) uint8 RGB -> PROGRESSIVE JFIF bytes (SOF2, T.81 Annex G).

    Scan script (exercises every progressive decode path): interleaved DC
    first scan at Al=1, one AC first scan per component (band 1-63, Al=1,
    EOB0-only run ends — the Annex K tables carry no EOBn>0 symbols), the
    DC refinement scan (raw bits, no Huffman), then one AC refinement scan
    per component (Al=0, G.1.2.3 newly-significant insertions + positional
    correction bits). The quantized coefficients are IDENTICAL to
    encode_jpeg at the same settings — progressive is a lossless
    reorganization of the scan order — so decode_jpeg of this stream is
    pixel-for-pixel equal to decode_jpeg of the baseline stream (pinned in
    tests/test_multimodal.py)."""
    comps, samp, qlum, qchr, h, w, mcux, mcuy = _coef_grids(
        rgb, quality, subsampling)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    zgrids = []
    for grid in comps:
        nby, nbx = grid.shape[:2]
        zgrids.append(grid.reshape(nby, nbx, 64)[:, :, ZIGZAG])
    dims = []                       # per-comp non-interleaved block grid
    for sh, sv in samp:
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        dims.append((-(-ch // 8), -(-cw // 8)))
    dc_codes = [_canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHR)]
    ac_codes = [_canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHR)]

    def dc_first_scan() -> bytes:   # Ss=Se=0, Ah=0, Al=1
        bw = _BitWriter()
        prev = [0] * len(samp)
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (sh, sv) in enumerate(samp):
                    dct = dc_codes[0 if ci == 0 else 1]
                    for byi in range(sv):
                        for bxi in range(sh):
                            dc = int(zgrids[ci][my * sv + byi,
                                                mx * sh + bxi, 0]) >> 1
                            cat, bits = _magnitude(dc - prev[ci])
                            ln, code = dct[cat]
                            bw.write(code, ln)
                            if cat:
                                bw.write(bits, cat)
                            prev[ci] = dc
        return bw.flush()

    def dc_refine_scan() -> bytes:  # Ss=Se=0, Ah=1, Al=0 — raw LSBs
        bw = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (sh, sv) in enumerate(samp):
                    for byi in range(sv):
                        for bxi in range(sh):
                            bw.write(int(zgrids[ci][my * sv + byi,
                                                    mx * sh + bxi, 0]) & 1, 1)
        return bw.flush()

    def ac_first_scan(ci: int) -> bytes:   # Ss=1, Se=63, Ah=0, Al=1
        act = ac_codes[0 if ci == 0 else 1]
        bw = _BitWriter()
        bh_, bw_ = dims[ci]
        zg = zgrids[ci]
        for bi in range(bh_ * bw_):
            zz = zg[bi // bw_, bi % bw_]
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                v1 = (abs(v) >> 1) if v > 0 else -(abs(v) >> 1)
                if v1 == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = act[0xF0]        # ZRL
                    bw.write(code, ln)
                    run -= 16
                cat, bits = _magnitude(v1)
                ln, code = act[(run << 4) | cat]
                bw.write(code, ln)
                bw.write(bits, cat)
                run = 0
            if run:
                ln, code = act[0x00]            # EOB0
                bw.write(code, ln)
        return bw.flush()

    def ac_refine_scan(ci: int) -> bytes:  # Ss=1, Se=63, Ah=1, Al=0
        act = ac_codes[0 if ci == 0 else 1]
        bw = _BitWriter()
        bh_, bw_ = dims[ci]
        zg = zgrids[ci]
        for bi in range(bh_ * bw_):
            zz = zg[bi // bw_, bi % bw_]
            # pending: (zero-history count before this bit within the
            # current run, correction bit) — a ZRL only flushes the bits
            # whose positions its 16-slot span actually covers, exactly
            # mirroring the decoder's positional walk
            pending: list[tuple[int, int]] = []
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if abs(v) >= 2:                 # nonzero history
                    pending.append((run, abs(v) & 1))
                elif v:                         # newly significant (+-1)
                    while run >= 16:
                        ln, code = act[0xF0]    # ZRL: first 16 zero-history
                        bw.write(code, ln)
                        for t, b in pending:
                            if t < 16:
                                bw.write(b, 1)
                        pending = [(t - 16, b) for t, b in pending
                                   if t >= 16]
                        run -= 16
                    ln, code = act[(run << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if v > 0 else 0, 1)   # sign bit
                    for _t, b in pending:
                        bw.write(b, 1)
                    pending = []
                    run = 0
                else:
                    run += 1
            if run or pending:
                ln, code = act[0x00]            # EOB0 + trailing corrections
                bw.write(code, ln)
                for _t, b in pending:
                    bw.write(b, 1)
        return bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc: int, th: int, spec) -> bytes:
        bits, values = spec
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)

    def sos(comp_specs, Ss, Se, Ah, Al) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([Ss, Se, (Ah << 4) | Al])
        return seg(0xFFDA, body)

    out = bytearray()
    out += struct.pack(">H", 0xFFD8)                       # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00" +
               struct.pack(">HH", 1, 1) + b"\x00\x00")     # APP0
    out += seg(0xFFDB, b"\x00" + bytes(qlum[ZIGZAG].tolist()))
    out += seg(0xFFDB, b"\x01" + bytes(qchr[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for (sh, sv), (cid, qt) in zip(samp, ((1, 0), (2, 1), (3, 1))):
        sof += bytes([cid, (sh << 4) | sv, qt])
    out += seg(0xFFC2, sof)                                # SOF2
    out += seg(0xFFC4, dht(0, 0, _DC_LUM))
    out += seg(0xFFC4, dht(1, 0, _AC_LUM))
    out += seg(0xFFC4, dht(0, 1, _DC_CHR))
    out += seg(0xFFC4, dht(1, 1, _AC_CHR))
    all_specs = [(1, 0, 0), (2, 1, 1), (3, 1, 1)]
    out += sos(all_specs, 0, 0, 0, 1) + dc_first_scan()
    for ci, spec_ in enumerate(all_specs):
        out += sos([spec_], 1, 63, 0, 1) + ac_first_scan(ci)
    out += sos(all_specs, 0, 0, 1, 0) + dc_refine_scan()
    for ci, spec_ in enumerate(all_specs):
        out += sos([spec_], 1, 63, 1, 0) + ac_refine_scan(ci)
    out += struct.pack(">H", 0xFFD9)                       # EOI
    return bytes(out)
