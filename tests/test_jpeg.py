"""JPEG codec tests (functions/jpeg.py): roundtrip fidelity per scan
mode, container dispatch in the multimodal stage, and totality over
malformed bytes.  Mirrors the Sharp JPEG leg of the reference's vision
chain (packages/pdf-processor/src/core/vision/image-optimization.ts)."""

import numpy as np
import pytest

from extract_kit_ray.functions.jpeg import decode_jpeg, encode_jpeg
from extract_kit_ray.ops.multimodal import decode_image, encode_image


def _gradient(h, w, channels=3):
    y, x = np.mgrid[0:h, 0:w]
    if channels == 1:
        return ((x + 2 * y) % 256).astype(np.uint8)
    arr = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        arr[:, :, c] = (x + 2 * y + 40 * c) % 256
    return arr


def _flat(h, w, val=128):
    return np.full((h, w, 3), val, dtype=np.uint8)


def test_roundtrip_gray():
    arr = _gradient(40, 56, channels=1)
    out = decode_jpeg(encode_jpeg(arr, quality=90))
    assert out.shape == (40, 56)
    # smooth gradient at q90: mean error tiny
    assert np.abs(out.astype(int) - arr.astype(int)).mean() < 4.0


def test_roundtrip_rgb_444():
    arr = _gradient(48, 64)
    out = decode_jpeg(encode_jpeg(arr, quality=90))
    assert out.shape == (48, 64, 3)
    assert np.abs(out.astype(int) - arr.astype(int)).mean() < 6.0


def test_roundtrip_flat_exact_dc():
    # a flat image is pure DC: roundtrip should be near-exact
    arr = _flat(24, 24, 77)
    out = decode_jpeg(encode_jpeg(arr, quality=85))
    assert np.abs(out.astype(int) - 77).max() <= 2


def test_roundtrip_420_subsampled():
    arr = _gradient(50, 70)  # non-multiple of 16 exercises padding
    out = decode_jpeg(encode_jpeg(arr, quality=90, subsample=True))
    assert out.shape == (50, 70, 3)
    # chroma is smooth in the fixture, so 4:2:0 loss stays small
    assert np.abs(out.astype(int) - arr.astype(int)).mean() < 8.0


def test_roundtrip_restart_markers():
    arr = _gradient(40, 72)
    data = encode_jpeg(arr, quality=90, restart_interval=3)
    assert b"\xff\xdd" in data  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    out = decode_jpeg(data)
    assert np.abs(out.astype(int) - _gradient(40, 72).astype(int)).mean() < 6.0


def test_restart_plus_subsample():
    arr = _gradient(33, 49)
    out = decode_jpeg(encode_jpeg(arr, quality=85, subsample=True,
                                  restart_interval=2))
    assert out.shape == (33, 49, 3)


def test_quality_monotone_size():
    arr = _gradient(64, 64)
    sizes = [len(encode_jpeg(arr, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_odd_dims_edge_padding():
    # 1-pixel-wide and 1-pixel-tall images survive
    for h, w in [(1, 17), (17, 1), (9, 9), (8, 8)]:
        arr = _gradient(h, w)
        out = decode_jpeg(encode_jpeg(arr, quality=90))
        assert out.shape == (h, w, 3)


@pytest.mark.parametrize("payload", [
    b"",
    b"\xff\xd8",                      # bare SOI
    b"\x89PNG\r\n\x1a\n",             # wrong container
    b"\xff\xd8\xff\xc2" + b"\x00\x10" + b"\x00" * 14,  # progressive SOF2
    b"\xff\xd8\xff\xd9",              # SOI+EOI, no scan
])
def test_malformed_raises_valueerror(payload):
    with pytest.raises(ValueError):
        decode_jpeg(payload)


def test_truncated_stream_total():
    data = encode_jpeg(_gradient(32, 32), quality=80)
    # truncations must either decode (zero-padded tail) or ValueError —
    # never crash with an unexpected exception type
    for cut in (4, 20, 100, len(data) // 2, len(data) - 3):
        try:
            decode_jpeg(data[:cut])
        except ValueError:
            pass


def test_decode_image_dispatch():
    arr = _gradient(20, 30)
    px_j, cont_j = decode_image(encode_jpeg(arr, quality=90))
    assert cont_j == "jpeg" and px_j.shape == (20, 30, 3)
    from extract_kit_ray.functions.png import encode_png
    px_p, cont_p = decode_image(encode_png(arr))
    assert cont_p == "png" and np.array_equal(px_p, arr)
    with pytest.raises(ValueError):
        decode_image(b"GIF89a notsupported")
    re_j = encode_image(px_j, "jpeg")
    assert re_j[:2] == b"\xff\xd8"
    re_p = encode_image(px_p, "png")
    assert re_p[:8] == b"\x89PNG\r\n\x1a\n"


def test_media_table_jpeg_rows_decode():
    from extract_kit_ray.ops.multimodal import (
        _JPEG_FIXTURE_ROWS,
        MediaFeatureExtractor,
        make_media_table,
    )

    need = max(_JPEG_FIXTURE_ROWS) + 1
    tbl = make_media_table(need + 5)
    mimes = tbl.column("mime").to_pylist()
    ids = tbl.column("media_id").to_pylist()
    jpeg_ids = {i for i, m in zip(ids, mimes) if m == "image/jpeg"}
    assert jpeg_ids == set(_JPEG_FIXTURE_ROWS)
    out = MediaFeatureExtractor(model="pixtral")(tbl)
    ok = {mid: v for mid, v in zip(out["media_id"].to_pylist(),
                                   out["valid"].to_pylist())}
    for mid in jpeg_ids:
        assert ok[mid], f"jpeg fixture row {mid} failed to extract"
