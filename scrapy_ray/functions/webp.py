"""Pure-numpy lossless WebP (VP8L) codec — closes the final media gate the
same way rounds 4-5 closed PNG/JPEG: no libwebp/PIL in this container, so
both sides are implemented from the public spec ("WebP Lossless Bitstream
Specification", RFC 9649 §3 / Google's VP8L spec).

Decoder: full VP8L pixel stream — LSB-first bitstream, simple and
normal (code-length-coded) Huffman codes with the 19-symbol code-length
alphabet and 16/17/18 repeats + the max-symbol short-circuit, optional
color cache, optional meta-Huffman groups, LZ77 backward references with
the 120-entry 2D distance neighborhood, and all four inverse transforms
(predictor modes 0-13, cross-channel color transform, subtract-green,
color-indexing incl. packed sub-8-bit indices).

Encoder (test-vector generator, like jpeg.encode_jpeg_progressive): single
Huffman group, canonical per-channel Huffman codes emitted through the real
code-length machinery, optional subtract-green transform, optional run-
length LZ77 backrefs (dist=1 overlapping copies), no color cache / meta
groups / predictor (documented). Lossless: decode(encode(img)) == img
EXACTLY — pinned in tests/test_multimodal.py.

Performance note: entropy decode is bit-serial Python like the JPEG/PNG
codecs (spec-faithful; the actor-pool decode stage is the consumer at test
scale); transforms and palette mapping are vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# code-length code symbol order (spec §5.2.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_HASH_MULT = 0x1E35A7BD

# 2D distance neighborhood: code i (1-based, <=120) -> (dx, dy) (spec §4.2.2)
_DIST_MAP: list[tuple[int, int]] = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _LsbReader:
    """LSB-first bit reader (VP8L bit order — opposite of JPEG's)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # byte position
        self.bit = 0          # bit position within current byte

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            v |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class _LsbWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


# --------------------------------------------------------------- Huffman


class _Huff:
    """Canonical Huffman decode table from a code-length array; VP8L reads
    codes MSB-first *within the canonical code* while the bitstream is
    LSB-first per bit — i.e. read one bit at a time, append as LSB of the
    running code (spec §5.2.1: prefix codes as in DEFLATE)."""

    __slots__ = ("maps", "single")

    def __init__(self, lengths: list[int]):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            self.single = nz[0][1]   # 0-bit code: always that symbol
            self.maps = None
            return
        self.single = None
        # canonical assignment, shorter codes first, then symbol order
        maps: dict[int, dict[int, int]] = {}
        code = 0
        for length in range(1, 16):
            group = [sym for ln, sym in nz if ln == length]
            if group:
                m = maps.setdefault(length, {})
                for sym in sorted(group):
                    m[code] = sym
                    code += 1
            code <<= 1
        self.maps = maps

    def read(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read(1)
            m = self.maps.get(length)
            if m is not None and code in m:
                return m[code]
        raise ValueError("invalid VP8L Huffman code")


def _canonical_lengths_to_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, canonical code) for the encoder (same assignment
    rule as _Huff). A single-symbol code consumes ZERO bits on the decode
    side (_Huff.single), so it maps to (0, 0) — writing nothing."""
    nz = [s for s, ln in enumerate(lengths) if ln > 0]
    if len(nz) == 1:
        return {nz[0]: (0, 0)}
    out: dict[int, tuple[int, int]] = {}
    code = 0
    for length in range(1, 16):
        group = sorted(sym for sym, ln in enumerate(lengths) if ln == length)
        for sym in group:
            out[sym] = (length, code)
            code += 1
        code <<= 1
    return out


def _read_huffman_code(br: _LsbReader, alphabet_size: int) -> _Huff:
    """One prefix code (spec §5.2.2): simple (1-2 symbols) or normal
    (code-length-coded lengths with 16/17/18 repeats)."""
    if br.read(1):                       # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        lengths = [0] * alphabet_size
        s0 = br.read(8 if first_8bit else 1)
        if num_symbols == 2:
            s1 = br.read(8)
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1               # becomes a 0-bit single code
        return _Huff(lengths)
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl = _Huff(cl_lengths)
    # optional max-symbol short-circuit
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl.read(br)
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if sym < alphabet_size:
                    lengths[sym] = prev
                    sym += 1
        elif s == 17:
            sym += 3 + br.read(3)
        else:                             # 18
            sym += 11 + br.read(7)
    return _Huff(lengths)


def _prefix_decode(code: int, br: _LsbReader) -> int:
    """LZ77 length / distance prefix decoding (spec §4.2.1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value -> (code, extra_bits_value, extra_bits_count) — encoder side
    (inverse of _prefix_decode: code = 2*extra + second-highest-bit + 2)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    bit = (v >> extra) & 1
    offset = (2 + bit) << extra
    return (extra << 1) + bit + 2, value - offset - 1, extra


# ----------------------------------------------------------- image decode


def _decode_pixels(br: _LsbReader, w: int, h: int, is_main: bool):
    """One spatially-coded VP8L image -> (h, w) uint32 ARGB array."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("bad color-cache size")
    cache = np.zeros(1 << cache_bits, dtype=np.uint32) if cache_bits else None

    meta = None
    meta_sb = 0
    n_groups = 1
    if is_main and br.read(1):            # meta-Huffman groups
        meta_sb = br.read(3) + 2
        mw = -(-w // (1 << meta_sb))
        mh = -(-h // (1 << meta_sb))
        meta_img = _decode_pixels(br, mw, mh, False)
        # group index = (red << 8) | green
        meta = (((meta_img >> 16) & 0xFF) << 8) | ((meta_img >> 8) & 0xFF)
        meta = meta.astype(np.int64)
        n_groups = int(meta.max()) + 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_huffman_code(br, green_size),   # green+length+cache
            _read_huffman_code(br, 256),          # red
            _read_huffman_code(br, 256),          # blue
            _read_huffman_code(br, 256),          # alpha
            _read_huffman_code(br, 40),           # distance
        ))

    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[int(meta[y >> meta_sb, (x >> meta_sb)])]
        else:
            g = groups[0]
        sym = g[0].read(br)
        if sym < 256:                     # literal
            green = sym
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (green << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[(px * _HASH_MULT & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif sym < 256 + 24:              # backward reference
            length = _prefix_decode(sym - 256, br)
            dcode = g[4].read(br)
            dist = _prefix_decode(dcode, br)
            if dist <= 120:               # 2D neighborhood
                dx, dy = _DIST_MAP[dist - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist -= 120
            if dist > pos or pos + length > total:
                raise ValueError("VP8L backref out of range")
            for i in range(length):       # may overlap (dist < length)
                px = out[pos - dist]
                out[pos] = px
                if cache is not None:
                    cache[(int(px) * _HASH_MULT & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
                pos += 1
        else:                             # color-cache hit
            if cache is None:
                raise ValueError("cache symbol without color cache")
            px = cache[sym - 256 - 24]
            out[pos] = px
            cache[(int(px) * _HASH_MULT & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
    return out.reshape(h, w)


# ------------------------------------------------------ inverse transforms


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    r = (r + g) & 0xFF
    b = (b + g) & 0xFF
    return (a << 24) | (r << 16) | (g << 8) | b


def _inv_color_transform(argb: np.ndarray, blocks: np.ndarray,
                         sb: int) -> np.ndarray:
    h, w = argb.shape
    ys, xs = np.mgrid[0:h, 0:w]
    blk = blocks[ys >> sb, xs >> sb]
    g2r = ((blk >> 16) & 0xFF).astype(np.int8).astype(np.int64)
    g2b = ((blk >> 8) & 0xFF).astype(np.int8).astype(np.int64)
    r2b = (blk & 0xFF).astype(np.int8).astype(np.int64)
    a = (argb >> 24) & 0xFF
    r = ((argb >> 16) & 0xFF).astype(np.int64)
    g = ((argb >> 8) & 0xFF).astype(np.int64)
    b = (argb & 0xFF).astype(np.int64)
    gs = g.astype(np.int8).astype(np.int64)       # signed transform inputs
    r = (r + ((g2r * gs) >> 5)) & 0xFF
    rs = r.astype(np.uint8).astype(np.int8).astype(np.int64)
    b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    return ((a.astype(np.uint32) << 24) | (r.astype(np.uint32) << 16)
            | (g.astype(np.uint32) << 8) | b.astype(np.uint32))


def _inv_predictor(argb: np.ndarray, blocks: np.ndarray, sb: int) -> np.ndarray:
    """Per-block predictor inverse (modes 0-13, spec §4.4) — scalar walk
    (bit-serial like the entropy stage; test-scale consumer)."""
    h, w = argb.shape
    out = argb.copy()

    def chans(px):
        return np.array([(px >> 24) & 0xFF, (px >> 16) & 0xFF,
                         (px >> 8) & 0xFF, px & 0xFF], dtype=np.int64)

    def pack(c):
        return ((int(c[0]) & 0xFF) << 24) | ((int(c[1]) & 0xFF) << 16) \
            | ((int(c[2]) & 0xFF) << 8) | (int(c[3]) & 0xFF)

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = chans(out[y, x - 1])
            elif x == 0:
                pred = chans(out[y - 1, x])
            else:
                mode = int((blocks[y >> sb, x >> sb] >> 8) & 0xFF)
                L = chans(out[y, x - 1])
                T = chans(out[y - 1, x])
                TL = chans(out[y - 1, x - 1])
                # right edge: linear-memory addressing (pos - width + 1)
                # wraps TR to the CURRENT row's first pixel, which is
                # already reconstructed (libwebp semantics)
                TR = (chans(out[y - 1, x + 1]) if x + 1 < w
                      else chans(out[y, 0]))
                if mode == 0:
                    pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = (((L + TR) >> 1) + T) >> 1
                elif mode == 6:
                    pred = (L + TL) >> 1
                elif mode == 7:
                    pred = (L + T) >> 1
                elif mode == 8:
                    pred = (TL + T) >> 1
                elif mode == 9:
                    pred = (T + TR) >> 1
                elif mode == 10:
                    pred = (((L + TL) >> 1) + ((T + TR) >> 1)) >> 1
                elif mode == 11:          # Select
                    pl = int(np.abs(T - TL).sum())
                    pt = int(np.abs(L - TL).sum())
                    pred = L if pl < pt else T
                elif mode == 12:          # ClampAddSubtractFull
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:          # ClampAddSubtractHalf
                    ave = (L + T) >> 1
                    pred = np.clip(ave + ((ave - TL) >> 1), 0, 255)
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            cur = chans(out[y, x])
            out[y, x] = pack((cur + pred) & 0xFF)
    return out


def _inv_color_indexing(argb: np.ndarray, palette: np.ndarray,
                        orig_w: int) -> np.ndarray:
    h, pw = argb.shape
    n = len(palette)
    if n <= 2:
        bits = 3
    elif n <= 4:
        bits = 2
    elif n <= 16:
        bits = 1
    else:
        bits = 0
    idx = (argb >> 8) & 0xFF              # green channel holds the index
    if bits:
        per = 1 << bits                   # pixels packed per coded pixel
        ibits = 8 >> bits                 # bits per index
        cols = []
        for s in range(per):
            cols.append((idx >> (s * ibits)) & ((1 << ibits) - 1))
        idx = np.stack(cols, axis=2).reshape(h, pw * per)[:, :orig_w]
    idx = np.clip(idx, 0, n - 1)          # out-of-palette = undefined; clamp
    return palette[idx]


# ------------------------------------------------------------------ decode


def decode_webp(payload: bytes) -> np.ndarray:
    """Lossless WebP (RIFF/VP8L) bytes -> (h, w, 3) uint8 RGB (alpha
    dropped after compositing is NOT applied — alpha is decoded and simply
    discarded, like the other codecs' RGB contract). Lossy VP8/extended
    VP8X raise ValueError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP)")
    pos = 12
    vp8l = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"VP8L":
            vp8l = body
            break
        if tag in (b"VP8 ", b"VP8X"):
            raise ValueError("lossy / extended WebP unsupported (VP8L only)")
        pos += 8 + size + (size & 1)
    if vp8l is None:
        raise ValueError("no VP8L chunk")
    if vp8l[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _LsbReader(vp8l[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                            # alpha hint
    if br.read(3) != 0:
        raise ValueError("bad VP8L version")

    # transforms (each at most once), applied inverse in reverse order
    transforms: list[tuple] = []
    cur_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype == 0:                    # predictor
            sb = br.read(3) + 2
            bw = -(-cur_w // (1 << sb))
            bh = -(-h // (1 << sb))
            blocks = _decode_pixels(br, bw, bh, False)
            transforms.append(("pred", blocks, sb))
        elif ttype == 1:                  # color transform
            sb = br.read(3) + 2
            bw = -(-cur_w // (1 << sb))
            bh = -(-h // (1 << sb))
            blocks = _decode_pixels(br, bw, bh, False)
            transforms.append(("color", blocks, sb))
        elif ttype == 2:                  # subtract green
            transforms.append(("subg",))
        else:                             # color indexing
            n = br.read(8) + 1
            pal = _decode_pixels(br, n, 1, False)[0]
            # palette entries are DELTA-coded component-wise
            pal = pal.astype(np.uint32)
            acc = np.zeros(4, dtype=np.int64)
            out_pal = np.zeros(n, dtype=np.uint32)
            for i in range(n):
                px = int(pal[i])
                acc[0] = (acc[0] + ((px >> 24) & 0xFF)) & 0xFF
                acc[1] = (acc[1] + ((px >> 16) & 0xFF)) & 0xFF
                acc[2] = (acc[2] + ((px >> 8) & 0xFF)) & 0xFF
                acc[3] = (acc[3] + (px & 0xFF)) & 0xFF
                out_pal[i] = ((int(acc[0]) << 24) | (int(acc[1]) << 16)
                              | (int(acc[2]) << 8) | int(acc[3]))
            if n <= 2:
                cur_w = -(-cur_w // 8)
            elif n <= 4:
                cur_w = -(-cur_w // 4)
            elif n <= 16:
                cur_w = -(-cur_w // 2)
            transforms.append(("palette", out_pal, w))

    argb = _decode_pixels(br, cur_w, h, True)
    for t in reversed(transforms):
        if t[0] == "palette":
            argb = _inv_color_indexing(argb, t[1], t[2])
        elif t[0] == "subg":
            argb = _inv_subtract_green(argb)
        elif t[0] == "color":
            argb = _inv_color_transform(argb, t[1], t[2])
        else:
            argb = _inv_predictor(argb, t[1], t[2])
    r = ((argb >> 16) & 0xFF).astype(np.uint8)
    g = ((argb >> 8) & 0xFF).astype(np.uint8)
    b = (argb & 0xFF).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


# ------------------------------------------------------------------ encode


def _huff_lengths(freqs: np.ndarray, max_len: int = 15) -> list[int]:
    """Code lengths from symbol frequencies (plain Huffman; the test-image
    alphabets are small enough that depth never exceeds max_len — asserted,
    not length-limited)."""
    import heapq

    syms = np.flatnonzero(freqs)
    if len(syms) == 0:
        return [0] * len(freqs)
    if len(syms) == 1:
        out = [0] * len(freqs)
        out[int(syms[0])] = 1
        return out
    heap = [(int(freqs[s]), int(s), (int(s),)) for s in syms]
    heapq.heapify(heap)
    depth = {int(s): 0 for s in syms}
    while len(heap) > 1:
        f1, t1, m1 = heapq.heappop(heap)
        f2, t2, m2 = heapq.heappop(heap)
        for s in m1 + m2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, min(t1, t2), m1 + m2))
    out = [0] * len(freqs)
    for s, d in depth.items():
        assert d <= max_len, "encoder alphabet too deep (test images only)"
        out[s] = d
    return out


def _write_huffman_code(bw: _LsbWriter, lengths: list[int]) -> None:
    """Emit one prefix code through the REAL code-length machinery (or the
    simple 1-2-symbol form when possible)."""
    nz = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(nz) <= 2 and nz[-1] <= 255:   # simple codes carry 8-bit
        bw.write(1, 1)                    # simple    symbols only
        bw.write(len(nz) - 1, 1)
        bw.write(1, 1)                    # first symbol in 8 bits
        bw.write(nz[0], 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        return
    bw.write(0, 1)                        # normal code
    # code-length code over the lengths themselves (no 16/17/18 repeats on
    # the encode side except trailing zeros via the max-symbol device)
    last = max(nz)
    cl_freq = np.zeros(19, dtype=np.int64)
    for ln in lengths[:last + 1]:
        cl_freq[ln] += 1
    cl_lengths = _huff_lengths(cl_freq, 7)
    order_pos = {s: i for i, s in enumerate(_CL_ORDER)}
    num_cl = max(order_pos[s] + 1 for s in range(19) if cl_lengths[s] > 0)
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    # max-symbol short-circuit so trailing zeros need no symbols
    n_coded = last + 1
    length_nbits = 2
    while (1 << length_nbits) - 1 < n_coded - 2:
        length_nbits += 2
    bw.write(1, 1)
    bw.write((length_nbits - 2) // 2, 3)
    bw.write(n_coded - 2, length_nbits)
    cl_codes = _canonical_lengths_to_codes(cl_lengths)
    for ln in lengths[:last + 1]:
        clen, code = cl_codes[ln]
        bw.write(int(f"{code:0{clen}b}"[::-1], 2), clen)  # MSB-first code


def _write_code(bw: _LsbWriter, codes, sym: int) -> None:
    clen, code = codes[sym]
    # canonical codes are read MSB-first bit by bit; the LSB writer emits
    # bits in stream order, so reverse the code's bits
    rev = int(f"{code:0{clen}b}"[::-1], 2)
    bw.write(rev, clen)


def encode_webp(rgb: np.ndarray, subtract_green: bool = True,
                use_backrefs: bool = True) -> bytes:
    """(h, w, 3) uint8 RGB -> lossless RIFF/VP8L bytes (test-vector
    encoder: single Huffman group, no color cache / meta groups /
    predictor; optional subtract-green transform and dist=1 run
    backreferences). decode_webp(encode_webp(img)) == img exactly."""
    assert rgb.ndim == 3 and rgb.shape[2] == 3 and rgb.dtype == np.uint8
    h, w, _ = rgb.shape
    r = rgb[:, :, 0].astype(np.int64)
    g = rgb[:, :, 1].astype(np.int64)
    b = rgb[:, :, 2].astype(np.int64)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    a = np.full((h, w), 0xFF, dtype=np.int64)

    flat = [c.ravel() for c in (a, r, g, b)]
    n = h * w
    # tokenize: literals + optional dist=1 runs of identical ARGB pixels
    argb = (flat[0] << 24) | (flat[1] << 16) | (flat[2] << 8) | flat[3]
    tokens: list[tuple] = []              # ("lit", i) or ("ref", length)
    i = 0
    while i < n:
        run = 0
        if use_backrefs and i > 0 and argb[i] == argb[i - 1]:
            j = i
            while j < n and argb[j] == argb[i - 1] and j - i < 4096:
                j += 1
            run = j - i
        if run >= 3:                      # worth a (length, dist=1) ref
            tokens.append(("ref", run))
            i += run
        else:
            tokens.append(("lit", i))
            i += 1

    # histograms
    gfreq = np.zeros(256 + 24, dtype=np.int64)
    rfreq = np.zeros(256, dtype=np.int64)
    bfreq = np.zeros(256, dtype=np.int64)
    afreq = np.zeros(256, dtype=np.int64)
    dfreq = np.zeros(40, dtype=np.int64)
    for tok in tokens:
        if tok[0] == "lit":
            i = tok[1]
            gfreq[flat[2][i]] += 1
            rfreq[flat[1][i]] += 1
            bfreq[flat[3][i]] += 1
            afreq[flat[0][i]] += 1
        else:
            lcode, _, _ = _prefix_encode(tok[1])
            gfreq[256 + lcode] += 1
            dcode, _, _ = _prefix_encode(1 + 120)   # plain dist 1
            dfreq[dcode] += 1

    bw = _LsbWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                        # alpha hint
    bw.write(0, 3)                        # version
    if subtract_green:
        bw.write(1, 1)                    # transform present
        bw.write(2, 2)                    # subtract-green
    bw.write(0, 1)                        # no more transforms
    bw.write(0, 1)                        # no color cache
    bw.write(0, 1)                        # no meta-Huffman
    glen = _huff_lengths(gfreq)
    rlen = _huff_lengths(rfreq)
    blen = _huff_lengths(bfreq)
    alen = _huff_lengths(afreq)
    dlen = _huff_lengths(dfreq)
    for lengths in (glen, rlen, blen, alen, dlen):
        if not any(lengths):              # unused alphabet: 1-symbol code
            lengths[0] = 1
        _write_huffman_code(bw, lengths)
    gcodes = _canonical_lengths_to_codes(glen)
    rcodes = _canonical_lengths_to_codes(rlen)
    bcodes = _canonical_lengths_to_codes(blen)
    acodes = _canonical_lengths_to_codes(alen)
    dcodes = _canonical_lengths_to_codes(dlen)
    for tok in tokens:
        if tok[0] == "lit":
            i = tok[1]
            _write_code(bw, gcodes, int(flat[2][i]))
            _write_code(bw, rcodes, int(flat[1][i]))
            _write_code(bw, bcodes, int(flat[3][i]))
            _write_code(bw, acodes, int(flat[0][i]))
        else:
            lcode, lext, lbits = _prefix_encode(tok[1])
            _write_code(bw, gcodes, 256 + lcode)
            if lbits:
                bw.write(lext, lbits)
            dcode, dext, dbits = _prefix_encode(121)   # dist 1 (+120)
            _write_code(bw, dcodes, dcode)
            if dbits:
                bw.write(dext, dbits)
    payload = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"                  # RIFF chunks pad to even size
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
