"""Real PNG/WAV codec coverage (stdlib-only decode inside mapInPandas).

The forward-filter helper here builds PNGs whose scanlines use each of
the five PNG filter types, so the decoder's unfilter logic is verified
against spec-defined transforms, not just against our own encoder."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from polars_genson_spark.operators import multimodal as mm


def _forward_filter(img: np.ndarray, filters: list[int]) -> bytes:
    """Spec-compliant forward filtering (PNG §9) of a gray/RGB image with
    a chosen filter type per row — the inverse of decode_png's unfilter."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    out = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        line = cur.copy()
        for x in range(w * ch):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
            line[x] = (cur[x] - pred) & 0xFF
        out.append(f)
        out.extend(line.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


def _png_from_scanlines(w, h, ctype, scanlines: bytes) -> bytes:
    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(scanlines))
            + chunk(b"IEND", b""))


def test_png_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    assert np.array_equal(mm.decode_png(mm.encode_png(gray)), gray)
    rgb = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_png(mm.encode_png(rgb)), rgb)
    rgba = rng.integers(0, 256, (5, 6, 4), dtype=np.uint8)
    assert np.array_equal(mm.decode_png(mm.encode_png(rgba)), rgba)


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_filter_types(filters):
    rng = np.random.default_rng(sum(filters) + 11)
    img = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    data = _png_from_scanlines(
        12, 10, 2, _forward_filter(img, filters)
    )
    assert np.array_equal(mm.decode_png(data), img)


def test_png_unsupported_variants_raise():
    gray = np.zeros((4, 4), np.uint8)
    # 16-bit depth
    bad = _png_from_scanlines(4, 4, 0, _forward_filter(gray, [0]))
    bad = bytearray(bad)
    # IHDR body starts at offset 8 (sig) + 8 (len+type); bit depth is byte 8
    bad[8 + 8 + 8] = 16
    with pytest.raises(ValueError, match="unsupported PNG"):
        mm.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        mm.decode_png(b"not a png")


def test_wav_roundtrip_and_stereo_downmix():
    sr = 8000
    mono = (np.sin(np.arange(800) / 10) * 20000).astype(np.int16)
    x, got_sr = mm.decode_wav(mm.encode_wav(mono, sr))
    assert got_sr == sr and np.array_equal(x, mono)
    # stereo: interleave L=mono, R=0 → downmix = mono/2 (rounded)
    stereo = np.zeros(mono.size * 2, np.int16)
    stereo[0::2] = mono
    fmt = struct.pack("<HHIIHH", 1, 2, sr, sr * 4, 4, 16)
    pcm = stereo.astype("<i2").tobytes()
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    x2, _ = mm.decode_wav(wav)
    assert np.array_equal(x2, np.round(mono / 2).astype(np.int16))
    with pytest.raises(ValueError, match="unsupported WAV"):
        mm.decode_wav(mm.encode_wav(mono, sr).replace(
            b"fmt " + struct.pack("<I", 16) + struct.pack("<H", 1),
            b"fmt " + struct.pack("<I", 16) + struct.pack("<H", 7), 1))


def test_decode_media_feeds_dsp_operators(spark):
    media = mm.synthesize_codec_media(spark, 12, seed=5)
    raw = mm.decode_media(media)
    rows = {r["media_id"]: r for r in raw.collect()}
    assert len(rows) == 12
    assert {r["meta"]["mime"] for r in rows.values()} == {
        "image/x-raw-gray", "audio/L16"
    }
    # decoded raw rows drive the REAL DSP operators downstream
    feats = mm.pcm_features(raw).collect()
    assert feats and all(r["n_samples"] == 4000 for r in feats)
    resized = mm.resize_raw_gray(raw, 16, 16).collect()
    assert resized and all(len(r["media"]) == 256 for r in resized)


def test_extract_features_real_png_wav(spark):
    media = mm.synthesize_codec_media(spark, 8, seed=9)
    feats = {r["media_id"]: r for r in
             mm.extract_features(media, decoder="real").collect()}
    assert len(feats) == 8
    for r in feats.values():
        assert len(r["features"]) == mm.FEATURE_DIM
        if r["kind"] == "image":
            # histogram sums to ~1
            assert abs(sum(r["features"]) - 1.0) < 1e-3
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in
             mm.extract_features(media, decoder="real").collect()}
    assert all(again[k] == feats[k]["features"] for k in again)


def test_extract_features_real_still_raises_for_codec_formats(spark):
    media = mm.synthesize_media(spark, 3, seed=1)  # opaque octet-stream
    with pytest.raises(Exception, match="PIL/ffmpeg"):
        mm.extract_features(media, decoder="real").collect()
