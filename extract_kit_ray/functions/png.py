"""Minimal pure-Python PNG codec (zlib + numpy — no image libraries in
this container), backing the REAL pixel operators in ops/multimodal.py
(the reference's Sharp resize/enhance/encode chain,
packages/pdf-processor/src/core/vision/image-optimization.ts:28-175).

Scope (deterministic, documented):
- encode: 8-bit RGB (color type 2) or grayscale (color type 0),
  filter 0 scanlines, one IDAT chunk
- decode: 8-bit color types 0 (gray), 2 (RGB) and 6 (RGBA), no
  interlace; all five scanline filters (None/Sub/Up/Average/Paeth,
  ISO 15948 §9) — our encoder writes filter 0, but real-world writers
  use the others
Raises ValueError on anything else (callers convert to
failure-as-data rows, functions/extract.py contract).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}

# decode cap: beyond any model pixel budget (ops/multimodal.PIXEL_BUDGETS
# tops out at 2048^2); rejects hostile IHDR dims before any allocation
_MAX_PIXELS = 1 << 26  # 67 MP


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 array -> PNG bytes."""
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_png needs uint8, got {arr.dtype}")
    if arr.ndim == 2:
        color_type, channels = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"encode_png needs (H,W) or (H,W,3), got {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8),
         arr.reshape(h, w * channels)], axis=1
    ).tobytes()
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))


def _unfilter(data: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Filtered scanlines -> (H, W, ch) uint8 (ISO 15948 §9 recon)."""
    stride = w * ch
    rows = data.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ftype = int(rows[r, 0])
        line = rows[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        else:
            rec = np.empty(stride, np.int32)
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0          # left
                b = prev[i]                                 # up
                if ftype == 1:  # Sub
                    rec[i] = (line[i] + a) & 0xFF
                elif ftype == 3:  # Average
                    rec[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:  # Paeth
                    c = prev[i - ch] if i >= ch else 0      # up-left
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    if pa_ <= pb_ and pa_ <= pc_:
                        pred = a
                    elif pb_ <= pc_:
                        pred = b
                    else:
                        pred = c
                    rec[i] = (line[i] + pred) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter {ftype}")
        out[r] = rec.astype(np.uint8)
    return out.reshape(h, w, ch)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W) uint8 for grayscale, (H, W, 3) for RGB
    (RGBA's alpha channel is dropped)."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG payload")
    pos = len(PNG_SIGNATURE)
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # incl. CRC
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body))
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    ch = _CHANNELS[color_type]
    if width * height > _MAX_PIXELS:
        raise ValueError(f"PNG too large ({width}x{height} px, cap {_MAX_PIXELS})")
    expected = height * (width * ch + 1)
    try:
        # bound the inflate output to the declared geometry — a
        # decompression bomb can't allocate past the (capped) expected size
        raw = zlib.decompressobj().decompress(bytes(idat), expected)
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    if len(raw) < expected:
        raise ValueError("truncated PNG scanlines")
    arr = _unfilter(np.frombuffer(raw[:expected], dtype=np.uint8),
                    height, width, ch)
    if color_type == 0:
        return arr[:, :, 0]
    if color_type == 6:
        return np.ascontiguousarray(arr[:, :, :3])
    return arr


# ---------------------------------------------------------------------------
# pixel operators over decoded arrays (the Sharp chain, for real)
# ---------------------------------------------------------------------------


def center_crop(arr: np.ndarray, plan: tuple[int, int, int, int]) -> np.ndarray:
    """Apply a (left, top, w, h) crop plan from
    ops/multimodal.center_crop_plan (image-optimization.ts:103-115)."""
    left, top, w, h = plan
    return arr[top : top + h, left : left + w]


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize to (target_h, target_w) — deterministic,
    vectorized fancy-indexing; the budget math lives in
    ops/multimodal.resize_plan (image-optimization.ts:117-147)."""
    h, w = arr.shape[:2]
    if target_h == h and target_w == w:
        return arr
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return arr[ys[:, None], xs[None, :]]


def contrast_stretch(arr: np.ndarray, low_p: float = 0.02,
                     high_p: float = 0.98) -> np.ndarray:
    """Percentile linear contrast stretch onto [0, 255]
    (image-optimization.ts:149-158 normalize role, M17)."""
    flat = arr.reshape(-1).astype(np.float64)
    lo = float(np.quantile(flat, low_p))
    hi = float(np.quantile(flat, high_p))
    if hi <= lo:
        return arr.copy()
    out = (arr.astype(np.float64) - lo) * (255.0 / (hi - lo))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
