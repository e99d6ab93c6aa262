"""Unit tests for the pure-Python PNG codec and the real pixel
operators (functions/png.py) plus the WAV parser backing the
multimodal decode stage (ops/multimodal.py M15-M18)."""

import struct
import zlib

import numpy as np
import pytest

from extract_kit_ray.functions.png import (
    PNG_SIGNATURE,
    center_crop,
    contrast_stretch,
    decode_png,
    encode_png,
    resize_nearest,
)
from extract_kit_ray.ops.multimodal import (
    IMG_H,
    IMG_W,
    MediaFeatureExtractor,
    center_crop_plan,
    decode_wav,
    make_media_table,
    make_wav,
    resize_plan,
)


def _rng_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_png_rgb_roundtrip():
    arr = _rng_img(37, 53)
    assert (decode_png(encode_png(arr)) == arr).all()


def test_png_gray_roundtrip():
    g = np.random.default_rng(1).integers(0, 256, (20, 31), dtype=np.uint8)
    out = decode_png(encode_png(g))
    assert out.shape == (20, 31)
    assert (out == g).all()


def _chunk(tag, body):
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def test_png_all_filters_decode():
    """Hand-filtered scanlines (None/Sub/Up/Average/Paeth) reconstruct."""
    h, w, ch = 5, 4, 3
    img = _rng_img(h, w, 2).astype(np.int32)
    lines = []
    prev = np.zeros(w * ch, np.int32)
    for r, f in enumerate([0, 1, 2, 3, 4]):
        cur = img[r].reshape(-1)
        line = np.empty(w * ch, np.int32)
        for i in range(w * ch):
            a = cur[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else (b if pb_ <= pc_ else c)
            line[i] = (cur[i] - pred) & 0xFF
        lines.append(bytes([f]) + bytes(line.astype(np.uint8)))
        prev = cur
    png = (PNG_SIGNATURE
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
           + _chunk(b"IEND", b""))
    assert (decode_png(png) == img.astype(np.uint8)).all()


def test_png_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    arr = _rng_img(8, 8)
    with pytest.raises(ValueError):
        decode_png(encode_png(arr)[:40])


def test_center_crop_pixels():
    arr = _rng_img(200, 300)
    plan = center_crop_plan(300, 200, 80.0)
    assert plan == (30, 20, 240, 160)
    out = center_crop(arr, plan)
    assert out.shape == (160, 240, 3)
    assert (out == arr[20:180, 30:270]).all()


def test_resize_nearest_known_values():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_nearest(arr, 2, 2)
    # nearest indices 0,2 of each axis
    assert out.tolist() == [[0, 2], [8, 10]]
    up = resize_nearest(arr, 8, 8)
    assert up.shape == (8, 8)
    assert up[0, 0] == 0 and up[7, 7] == 15


def test_contrast_stretch_expands_range():
    arr = np.full((50, 50), 100, dtype=np.uint8)
    arr[0:10] = 90
    arr[40:50] = 110
    out = contrast_stretch(arr, 0.02, 0.98)
    assert out.min() == 0 and out.max() == 255


def test_wav_roundtrip_duration_math():
    for i in (0, 3, 11):
        n, rate = 1000 + i * 331, 8000 + (i % 8) * 1000
        d = decode_wav(make_wav(n, rate, seed=i))
        assert d["sample_rate"] == rate and d["channels"] == 1 and d["bits"] == 16
        assert d["duration_ms"] == n * 1000 // rate
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")


def test_image_chain_real_metrics():
    """Full image path over a fixture row: real decoded dims, budget
    resize applied for over-budget images, metrics carry the ACTUAL
    re-encoded byte length."""
    tbl = make_media_table(13)  # media_id 0,3,6,9,12 are images
    ex = MediaFeatureExtractor(model="pixtral")
    out = ex(tbl)
    rows = {int(m): dict(zip(out.column_names, r))
            for m, r in zip(out["media_id"].to_pylist(),
                            zip(*[out[c].to_pylist() for c in out.column_names]))}
    for i in (0, 3, 6, 9, 12):
        r = rows[i]
        assert r["valid"] and r["decoded_width"] == IMG_W(i)
        assert r["decoded_height"] == IMG_H(i)
        tw, th = resize_plan(IMG_W(i), IMG_H(i), "pixtral")
        assert (r["target_width"], r["target_height"]) == (tw, th)
        assert tw * th <= 1024 * 1024
        m = r["metrics"]
        assert m["optimized_size"] > 100  # real re-encoded PNG bytes
        # features are a normalized histogram from real pixels
        assert abs(sum(r["features"]) - 1.0) < 1e-3


def test_image_chain_crop_applied():
    tbl = make_media_table(1)  # one image row
    base = MediaFeatureExtractor(model="pixtral")(tbl)
    cropped = MediaFeatureExtractor(model="pixtral", crop_size=50.0)(tbl)
    # crop halves each dim before the resize plan
    bw = base["target_width"].to_pylist()[0]
    cw = cropped["target_width"].to_pylist()[0]
    assert cw < bw
    assert cropped["decoded_width"].to_pylist()[0] == IMG_W(0)  # pre-crop dims


def test_empty_payload_failure_as_data():
    tbl = make_media_table(14)  # media_id 13 is the planted empty payload
    out = MediaFeatureExtractor()(tbl)
    row = {c: out[c].to_pylist()[13] for c in out.column_names}
    assert row["valid"] is False and row["decoded_width"] == -1
    assert "empty" in row["error"]
