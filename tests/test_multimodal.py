"""Real multimodal decode (S6, round 2): byte-exact codec round-trips and
actor-pool decode stats vs a numpy reference — no PIL/ffmpeg, pure
stdlib + numpy codecs (functions/codecs.py)."""

from __future__ import annotations

import numpy as np

from scrapy_ray.functions.codecs import decode_bmp, decode_wav, encode_bmp, encode_wav
from scrapy_ray.pipelines.multimodal import synth_audio, synth_image

SF = "/root/testdata/sf0.001"


def test_bmp_roundtrip_exact():
    for doc_id in (0, 7, 123, 4096):
        img = synth_image(doc_id)
        back = decode_bmp(encode_bmp(img))
        assert back.shape == img.shape
        assert np.array_equal(back, img), doc_id
    # non-4-multiple widths exercise row padding
    odd = np.arange(11 * 5 * 3, dtype=np.uint8).reshape(11, 5, 3)
    assert np.array_equal(decode_bmp(encode_bmp(odd)), odd)


def test_wav_roundtrip_exact():
    for doc_id in (0, 3, 999):
        s = synth_audio(doc_id)
        rate, back = decode_wav(encode_wav(s, rate=8000))
        assert rate == 8000
        assert np.array_equal(back, s), doc_id


def test_bmp_rejects_garbage():
    import pytest

    with pytest.raises(ValueError):
        decode_bmp(b"not an image at all")


def test_image_decode_stats_match_reference(ray_session):
    from scrapy_ray.pipelines.multimodal import q_image_decode_stats

    t = q_image_decode_stats(SF)
    assert len(t) > 0
    by_id = {d: (w, h, m) for d, w, h, m in zip(
        t["doc_id"].to_pylist(), t["width"].to_pylist(),
        t["height"].to_pylist(), t["mean_r"].to_pylist())}
    for doc_id in list(by_id)[:25]:
        img = synth_image(doc_id)
        h, w, _ = img.shape
        ref_mean = round(float(img[:, :, 0].astype(np.int64).sum()) / (h * w), 4)
        assert by_id[doc_id] == (w, h, ref_mean), doc_id


def test_audio_decode_stats_match_reference(ray_session):
    from scrapy_ray.pipelines.multimodal import q_audio_decode_stats

    t = q_audio_decode_stats(SF)
    assert len(t) > 0
    by_id = {d: (r, n, x) for d, r, n, x in zip(
        t["doc_id"].to_pylist(), t["sample_rate"].to_pylist(),
        t["n_samples"].to_pylist(), t["rms"].to_pylist())}
    for doc_id in list(by_id)[:25]:
        s = synth_audio(doc_id).astype(np.float64)
        ref = round(float(np.sqrt(np.mean(s * s))), 4)
        assert by_id[doc_id] == (8000, len(s), ref), doc_id


def test_ppm_pgm_roundtrip_and_sniff():
    """Round 3: netpbm codecs + magic-sniffed dispatch (BMP/PPM/PGM)."""
    import numpy as np

    from scrapy_ray.functions.codecs import (decode_image, decode_pgm, decode_ppm,
                                             encode_bmp, encode_pgm, encode_ppm)

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    assert (decode_image(encode_ppm(img)) == img).all()
    assert (decode_image(encode_bmp(img)) == img).all()
    g = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    assert (decode_pgm(encode_pgm(g)) == g).all()
    out = decode_image(encode_pgm(g))
    assert out.shape == (5, 9, 3) and (out[:, :, 1] == g).all()
    # comment-bearing header (netpbm allows them)
    assert (decode_pgm(b"P5\n# c\n9 5\n255\n" + g.tobytes()) == g).all()
    import pytest as _pt
    with _pt.raises(ValueError):
        decode_image(b"GIF89a....")


def test_image_decode_stats_format_invariant(ray_session):
    """The mixed-format query must produce the same stats as an all-BMP
    encode (channel 0 survives every codec identically)."""
    from scrapy_ray.functions.codecs import encode_bmp
    from scrapy_ray.pipelines.multimodal import (ImageDecoder, _payload_ds,
                                                 q_image_decode_stats, synth_image)

    mixed = q_image_decode_stats("/root/testdata/sf0.001").sort_by("doc_id")
    bmp_only = (
        _payload_ds("/root/testdata/sf0.001", synth_image, encode_bmp)
        .map_batches(ImageDecoder, batch_format="pyarrow", batch_size=256,
                     concurrency=2).to_pandas().sort_values("doc_id", ignore_index=True))
    import pyarrow as pa
    assert mixed.equals(pa.Table.from_pandas(bmp_only, preserve_index=False))


def test_media_checksum_dedup(ray_session):
    """S6 checksum dedup: 500 docs share 50 distinct payloads; keep_doc is
    the minimum doc_id of each copy group (doc_id % 50 layout)."""
    from scrapy_ray.pipelines.multimodal import q_media_checksum_dedup

    t = q_media_checksum_dedup("/root/testdata/sf0.001")
    assert len(t) == 50
    assert sum(t["n_copies"].to_pylist()) == 500
    assert sorted(t["keep_doc"].to_pylist()) == list(range(50))


def test_png_roundtrip_exact():
    """PNG codec (stdlib zlib + numpy, written from the spec): byte-exact
    pixel round-trip for RGB, and the decoder handles gray / RGBA inputs
    plus all five scanline filters."""
    import zlib

    from scrapy_ray.functions.codecs import decode_image, decode_png, encode_png

    rng = np.random.default_rng(5)
    for shape in [(1, 1), (7, 13), (32, 24)]:
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        p = encode_png(img)
        assert p[:8] == b"\x89PNG\r\n\x1a\n"
        np.testing.assert_array_equal(decode_png(p), img)
        np.testing.assert_array_equal(decode_image(p), img)  # sniff path
    # filters 1-4: hand-build a PNG whose rows use Sub/Up/Average/Paeth
    import struct

    h, w, nch = 4, 5, 3
    img = rng.integers(0, 256, (h, w, nch), dtype=np.uint8).astype(np.int64)
    rows = []
    prev = np.zeros(w * nch, dtype=np.int64)
    flat = img.reshape(h, w * nch)
    for y, f in enumerate((1, 2, 3, 4)):
        cur = flat[y]
        raw = np.empty(w * nch, dtype=np.int64)
        for x in range(w * nch):
            a = cur[x - nch] if x >= nch else 0
            b = prev[x]
            c = (flat[y - 1][x - nch] if (y and x >= nch) else 0)
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p_ = a + b - c
                pa_, pb, pc_ = abs(p_ - a), abs(p_ - b), abs(p_ - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
            raw[x] = (cur[x] - pred) % 256
        rows.append(bytes([f]) + bytes(raw.astype(np.uint8)))
        prev = cur
    body = b"".join(rows)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(body))
               + chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(payload), img.astype(np.uint8))


def test_jpeg_roundtrip_bounded_error():
    """Baseline JPEG codec (pure numpy, T.81): lossy but bounded — smooth
    images reconstruct within a few gray levels, flat images exactly;
    4:2:0 subsampling and DRI/RSTn restart paths decode identically; the
    magic sniff dispatches; progressive/garbage inputs are rejected."""
    import pytest

    from scrapy_ray.functions.codecs import decode_image
    from scrapy_ray.functions.jpeg import decode_jpeg, encode_jpeg

    grad = np.zeros((37, 29, 3), np.uint8)
    grad[:, :, 0] = np.linspace(0, 255, 29).astype(np.uint8)[None, :]
    grad[:, :, 1] = 128
    grad[:, :, 2] = np.linspace(255, 0, 37).astype(np.uint8)[:, None]
    for sub in ("444", "420"):
        for dri in (0, 2):
            out = decode_jpeg(encode_jpeg(grad, quality=92, subsampling=sub,
                                          restart_interval=dri))
            assert out.shape == grad.shape
            err = np.abs(out.astype(int) - grad.astype(int))
            bound = 4 if sub == "444" else 10   # chroma is subsampled
            assert err.max() <= bound, (sub, dri, err.max())
    flat = np.full((16, 16, 3), 77, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat)), flat)
    # sniff dispatch
    assert decode_image(encode_jpeg(flat)).shape == (16, 16, 3)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01garbage")


def test_jpeg_progressive_equals_baseline():
    """Progressive JPEG (SOF2, T.81 Annex G — round 5): the progressive
    scan script carries the SAME quantized coefficients as baseline, so
    decode(progressive) must equal decode(baseline) PIXEL-FOR-PIXEL at
    every quality/subsampling — this pins the DC first/refine scans, the
    AC first scans (EOB runs, ZRL) and the AC refinement scans
    (newly-significant insertions + positional correction bits) against
    the independently-written encoder."""
    from scrapy_ray.functions.codecs import decode_image
    from scrapy_ray.functions.jpeg import (decode_jpeg, encode_jpeg,
                                           encode_jpeg_progressive)

    rng = np.random.default_rng(11)
    imgs = [
        rng.integers(0, 256, (33, 47, 3), dtype=np.uint8),     # noise
        np.full((16, 16, 3), 77, np.uint8),                    # flat
        np.clip(np.cumsum(rng.standard_normal((65, 81, 3)), axis=0) * 9
                + 120, 0, 255).astype(np.uint8),               # smooth walk
    ]
    stripes = np.zeros((24, 25, 3), np.uint8)
    stripes[::2] = 255                                         # high detail
    imgs.append(stripes)
    for img in imgs:
        for q in (35, 75, 95):
            for sub in ("444", "420"):
                base = decode_jpeg(encode_jpeg(img, q, sub))
                prog = decode_jpeg(encode_jpeg_progressive(img, q, sub))
                assert np.array_equal(base, prog), (img.shape, q, sub)
    # the magic sniff dispatches progressive streams too (same JPEG magic)
    assert decode_image(encode_jpeg_progressive(imgs[1])).shape == (16, 16, 3)


def test_webp_lossless_roundtrip():
    """Lossless WebP (VP8L, RFC 9649 — round 5 closes the last named media
    gate): decode(encode(img)) must be EXACT for every image x transform x
    backref combination — this pins the LSB-first bitstream, simple and
    code-length-coded Huffman codes (incl. the max-symbol device), LZ77
    length/distance prefix coding with overlapping dist=1 copies, and the
    subtract-green inverse transform against the independently written
    encoder. Decoder-only paths (predictor/color transforms, palette,
    color cache, meta groups) are implemented from spec but have no
    encoder here — documented in functions/webp.py."""
    import pytest

    from scrapy_ray.functions.codecs import decode_image
    from scrapy_ray.functions.webp import decode_webp, encode_webp

    rng = np.random.default_rng(3)
    cases = [
        rng.integers(0, 256, (21, 17, 3), dtype=np.uint8),     # noise
        np.full((9, 30, 3), 123, np.uint8),                    # flat
        np.repeat(rng.integers(0, 256, (8, 5, 3), dtype=np.uint8),
                  7, axis=1),                                  # runs
        (rng.integers(0, 4, (19, 23, 3)) * 80).astype(np.uint8),
        rng.integers(0, 256, (1, 1, 3), dtype=np.uint8),       # 1x1
    ]
    for img in cases:
        for sg in (False, True):
            for bref in (False, True):
                out = decode_webp(encode_webp(img, subtract_green=sg,
                                              use_backrefs=bref))
                np.testing.assert_array_equal(out, img)
    # sniff dispatch + rejection of non-VP8L WebP
    assert decode_image(encode_webp(cases[0])).shape == cases[0].shape
    import struct
    lossy = (b"RIFF" + struct.pack("<I", 12) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        decode_webp(lossy)


def test_webp_decode_stats_match_reference(ray_session):
    """webp_decode_stats (bounded-sample VP8L pipeline query): every row's
    dims + exact channel-0 mean must match the synth_image reference —
    lossless, so the stats are identical to what any other codec yields."""
    from scrapy_ray.pipelines.multimodal import (q_webp_decode_stats,
                                                 synth_image)

    t = q_webp_decode_stats(SF)
    assert len(t) > 0
    assert max(t["doc_id"].to_pylist()) < 512     # the scale-safety bound
    by_id = {d: (w, h, m) for d, w, h, m in zip(
        t["doc_id"].to_pylist(), t["width"].to_pylist(),
        t["height"].to_pylist(), t["mean_r"].to_pylist())}
    for doc_id in list(by_id)[:25]:
        img = synth_image(doc_id)
        h, w, _ = img.shape
        ref = round(float(img[:, :, 0].astype(np.int64).sum()) / (h * w), 4)
        assert by_id[doc_id] == (w, h, ref), doc_id


def test_image_phash_dedup_collapses_noisy_copies(ray_session):
    """Perceptual dedup: 500 byte-DISTINCT noisy payloads (md5 would keep
    ~500 groups) collapse to the 50 base patterns — the group assignment
    must factor exactly through doc_id % 50, i.e. dHash is invariant to
    the planted +/-1 pixel noise while md5 is not."""
    import hashlib

    from scrapy_ray.functions.codecs import encode_bmp
    from scrapy_ray.pipelines.multimodal import (q_image_phash_dedup,
                                                 synth_noisy_image)

    t = q_image_phash_dedup("/root/testdata/sf0.001")
    assert sum(t["n_copies"].to_pylist()) == 500
    # perceptual groups = distinct dHashes of the 50 base patterns (some
    # may collide — that is what perceptual hashing does) — never more
    assert len(t) <= 50
    assert len(t) > 40, "dHash degenerated on the permutation patterns"
    # byte-level distinctness: md5 keeps (nearly) every payload apart
    md5s = {hashlib.md5(encode_bmp(synth_noisy_image(i))).hexdigest()
            for i in range(500)}
    assert len(md5s) > 400
    # group assignment factors through doc_id % 50: a group's copy count
    # is a multiple of 10 (500 docs / 50 patterns) and keep_doc < 50
    assert all(n % 10 == 0 for n in t["n_copies"].to_pylist())
    assert all(k < 50 for k in t["keep_doc"].to_pylist())


def test_rayv_roundtrip_and_seek():
    from scrapy_ray.functions.codecs import (decode_rayv_frame, encode_rayv,
                                             rayv_index)

    frames = [synth_image(7 * k + 3) for k in range(6)]
    payload = encode_rayv(frames, fps=12)
    fps, offsets, lengths = rayv_index(payload)
    assert fps == 12 and len(offsets) == 6
    # index seek decodes every frame byte-exactly, in any order
    for k in (5, 0, 3):
        np.testing.assert_array_equal(decode_rayv_frame(payload, k), frames[k])
    # offsets + lengths tile the payload exactly
    assert int(offsets[-1] + lengths[-1]) == len(payload)


def test_rayv_rejects_garbage():
    import pytest

    from scrapy_ray.functions.codecs import rayv_index

    with pytest.raises(ValueError):
        rayv_index(b"AVI\x00" + b"\x00" * 64)


def test_video_frame_sample_matches_reference(ray_session):
    from scrapy_ray.pipelines.multimodal import (q_video_frame_sample,
                                                 synth_video)

    t = q_video_frame_sample(SF)
    assert len(t) > 0
    by_id = {d: (nf, ns, fps, w, h, m) for d, nf, ns, fps, w, h, m in zip(
        t["doc_id"].to_pylist(), t["n_frames"].to_pylist(),
        t["n_sampled"].to_pylist(), t["fps"].to_pylist(),
        t["width"].to_pylist(), t["height"].to_pylist(),
        t["mean_luma"].to_pylist())}
    for doc_id in list(by_id)[:20]:
        frames, fps = synth_video(doc_id)
        picks = list(range(0, len(frames), 3))
        lsum = sum(int((299 * f[:, :, 0] + 587 * f[:, :, 1]
                        + 114 * f[:, :, 2]).sum())
                   for f in (frames[k].astype(np.int64) for k in picks))
        npx = sum(frames[k].shape[0] * frames[k].shape[1] for k in picks)
        h0, w0 = frames[0].shape[:2]
        ref = (len(frames), len(picks), fps, w0, h0,
               round(lsum / (1000 * npx), 4))
        assert by_id[doc_id] == ref, doc_id


def test_resize_nn_exact_and_identity():
    """Nearest-neighbor resize: identity at matching dims; the standard
    floor(i*in/out) index map, checked against an explicit per-pixel loop;
    up- and down-scaling both covered."""
    from scrapy_ray.pipelines.multimodal import resize_nn

    img = synth_image(42)
    assert np.array_equal(resize_nn(img, img.shape[0], img.shape[1]), img)
    for oh, ow in ((32, 32), (7, 13), (100, 3)):
        got = resize_nn(img, oh, ow)
        assert got.shape == (oh, ow, 3)
        h, w = img.shape[:2]
        for i in (0, oh // 2, oh - 1):
            for j in (0, ow // 2, ow - 1):
                assert np.array_equal(got[i, j], img[(i * h) // oh, (j * w) // ow])


def test_image_resize_features_match_reference(ray_session):
    """Actor-pool resize stage vs a from-scratch numpy reference: the
    emitted 32x32 BMP thumbnail decodes byte-exact to the reference resize,
    and means/edge density match to the rounding."""
    from scrapy_ray.pipelines.multimodal import (q_image_resize_features,
                                                 resize_nn, synth_image)

    out = q_image_resize_features(SF).to_pandas().set_index("doc_id")
    assert len(out) == 500
    checked = 0
    for doc_id in (0, 7, 123, 499):
        img = synth_image(doc_id * 17 + 3)
        th = resize_nn(img, 32, 32)
        row = out.loc[doc_id]
        assert (row["src_height"], row["src_width"]) == img.shape[:2]
        assert np.array_equal(decode_bmp(row["thumb"]), th)
        px = th.astype(np.int64)
        for k, c in enumerate("rgb"):
            assert abs(row[f"mean_{c}"]
                       - round(float(px[:, :, k].sum()) / 1024, 4)) < 1e-9
        gray = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
        d = np.abs(np.diff(gray, axis=1)) > 16
        assert abs(row["edge_density"] - round(float(d.sum()) / d.size, 4)) < 1e-9
        checked += 1
    assert checked == 4


def test_audio_spectral_features_match_reference(ray_session):
    """Actor-pool spectral stage vs an independent numpy recomputation:
    centroid/bandwidth/rolloff/zcr match to the rounding; sine-like
    synthetic tones give a finite positive centroid below Nyquist."""
    from scrapy_ray.pipelines.multimodal import q_audio_spectral_features

    out = q_audio_spectral_features(SF).to_pandas().set_index("doc_id")
    assert len(out) == 500
    assert (out["centroid_hz"] > 0).all()
    assert (out["centroid_hz"] <= 4000).all()      # <= Nyquist at 8 kHz

    for doc_id in (0, 7, 123, 499):
        x = synth_audio(doc_id).astype(np.float64)
        mag = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(len(x), d=1.0 / 8000)
        tot = mag.sum()
        c = (freqs * mag).sum() / tot
        v = (((freqs - c) ** 2) * mag).sum() / tot
        e = np.cumsum(mag ** 2)
        r = freqs[np.searchsorted(e, 0.85 * e[-1])]
        z = np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))
        row = out.loc[doc_id]
        assert abs(row["centroid_hz"] - round(float(c), 4)) < 1e-9
        assert abs(row["bandwidth_hz"] - round(float(v) ** 0.5, 4)) < 1e-9
        assert abs(row["rolloff_hz"] - round(float(r), 4)) < 1e-9
        assert abs(row["zcr"] - round(float(z), 6)) < 1e-9


def test_image_min_size_filter(ray_session):
    """IMAGES_MIN_WIDTH/HEIGHT parity: undersized images drop from the
    resize stage's output; the survivors equal the unfiltered run's rows."""
    import pyarrow as pa

    from scrapy_ray.pipelines.multimodal import ImageResizer, synth_image
    from scrapy_ray.functions.codecs import encode_bmp

    # synth_image dims vary by doc_id: build payloads with known sizes
    ids = list(range(24))
    payloads = [encode_bmp(synth_image(i)) for i in ids]
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "payload": pa.array(payloads, type=pa.binary())})
    all_rows = ImageResizer()(t).to_pandas().set_index("doc_id")
    cut_w = int(all_rows["src_width"].median())
    filt = ImageResizer(min_width=cut_w)(t).to_pandas().set_index("doc_id")
    want = all_rows[all_rows["src_width"] >= cut_w]
    assert set(filt.index) == set(want.index)
    assert 0 < len(filt) < len(all_rows)
    for c in ("src_width", "src_height", "mean_r", "edge_density"):
        assert (filt[c] == want[c]).all()
