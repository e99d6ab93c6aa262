"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Fills the reference's Sharp-based JPEG leg of the vision chain
(packages/pdf-processor/src/core/vision/image-optimization.ts) without
native deps: the container has no PIL/Sharp, so the engine ships its
own codec, same as the PNG one (:mod:`.png`).

Scope (deterministic, documented):

- decode: baseline + extended-sequential Huffman JPEGs (SOF0/SOF1),
  8-bit precision, grayscale or 3-component YCbCr (JFIF), any
  sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...), restart markers,
  multiple DQT/DHT segments.  Progressive (SOF2), arithmetic coding,
  12-bit, and CMYK raise ValueError (failure-as-data upstream).
- encode: baseline 4:4:4 (or grayscale), Annex-K quantization tables
  scaled by ``quality`` (libjpeg's scaling law), Annex-K Huffman
  tables — canonical output any decoder reads.

The MCU loop is Python (fixture images are small); all per-block math
(IDCT/DCT, dequantize, color transform, upsample) is vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 64_000_000  # same guard class as png._MAX_PIXELS

# zigzag scan order: zigzag index -> raster index (T.81 Figure 5)
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# 8x8 DCT-II basis matrix: C[u, x] = a(u) cos((2x+1)u pi / 16)
def _dct_matrix() -> np.ndarray:
    u = np.arange(8)[:, None].astype(np.float64)
    x = np.arange(8)[None, :].astype(np.float64)
    c = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2 / 8)
    c[0, :] = np.sqrt(1 / 8)
    return c

_C = _dct_matrix()

# Annex K.1 luminance / chrominance quantization tables (raster order)
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,  12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,  14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68,109,103, 77,  24, 35, 55, 64, 81,104,113, 92,
    49, 64, 78, 87,103,121,120,101,  72, 92, 95, 98,112,100,103, 99,
], dtype=np.int32)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,  18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,  47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,  99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,  99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_decode_table(bits: list[int], huffval: list[int]) -> np.ndarray:
    """Canonical Huffman -> 65536-entry LUT: for a 16-bit lookahead
    ``p``, ``lut[p] = (symbol << 8) | code_length`` (0 = invalid).
    One array lookup decodes any symbol — no bit-by-bit walk."""
    if len(bits) < 16:
        raise ValueError("truncated DHT bits array")
    lut = np.zeros(1 << 16, dtype=np.uint32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(huffval):
                raise ValueError("truncated DHT huffval array")
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            if hi > (1 << 16):
                raise ValueError("invalid DHT code overflow")
            lut[lo:hi] = (huffval[k] << 8) | length
            code += 1
            k += 1
        code <<= 1
    return lut


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: {symbol: (code, code_length)}."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, handling
    0xFF00 byte stuffing and stopping at real markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.cnt = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.cnt <= 24:
            if self.marker is not None or self.pos >= len(d):
                self.buf = (self.buf << 8) & 0xFFFFFFFF
                self.buf |= 0  # pad with zeros past EOS
                self.cnt += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resets via sync_restart()
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.buf = ((self.buf << 8) | b) & 0xFFFFFFFF
            self.cnt += 8

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.cnt < n:
            self._fill()
        self.cnt -= n
        v = (self.buf >> self.cnt) & ((1 << n) - 1)
        return v

    def decode_huff(self, lut: np.ndarray) -> int:
        """One LUT probe on a 16-bit lookahead (see _build_decode_table)."""
        if self.cnt < 16:
            self._fill()
        peek = (self.buf >> (self.cnt - 16)) & 0xFFFF
        entry = int(lut[peek])
        length = entry & 0xFF
        if length == 0:
            raise ValueError("invalid Huffman code")
        self.cnt -= length
        return entry >> 8

    def sync_restart(self) -> None:
        """Skip pad bytes up to the next RSTn marker, consume it, and
        realign to a byte boundary (the reader may not have run into
        the marker yet when the bit buffer was still full)."""
        self.buf = 0
        self.cnt = 0
        d = self.data
        while self.marker is None and self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                self.marker = d[self.pos + 1]
                break
            self.pos += 1
        if self.marker is None or not 0xD0 <= self.marker <= 0xD7:
            raise ValueError("expected restart marker")
        self.pos += 2  # skip FF Dn
        self.marker = None


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude v to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> (H, W) uint8 grayscale or (H, W, 3) uint8 RGB.

    Total over arbitrary bytes: anything outside the documented scope
    (or simply malformed/truncated) raises ValueError, never crashes."""
    try:
        return _decode_jpeg(data)
    except ValueError:
        raise
    except (IndexError, struct.error, KeyError, OverflowError) as exc:
        raise ValueError(f"malformed JPEG: {exc!r}") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG payload")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    restart_interval = 0
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    vals = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    vals = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                raster = np.empty(64, dtype=np.int32)
                raster[_ZIGZAG] = vals  # stored zigzag -> raster
                qtables[tq] = raster.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                huffval = list(seg[i + 17 : i + 17 + cnt])
                htables[(tc, th)] = _build_decode_table(bits, huffval)
                i += 17 + cnt
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            if h * w > _MAX_PIXELS:
                raise ValueError(f"JPEG too large ({w}x{h})")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type 0x{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 15))
            return _decode_scan(
                data, pos, frame, scan, qtables, htables, restart_interval)
        # APPn/COM/others: skipped
    raise ValueError("no SOS scan found")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    h, w, comps = frame
    if len(scan) != len(comps):
        raise ValueError("scan/frame component mismatch (progressive?)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    planes = []
    meta = []  # (hs, vs, qtab, dctab, actab, plane)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError("scan names unknown component")
        hs, vs, tq = by_id[cs]
        if tq not in qtables or (0, td) not in htables or (1, ta) not in htables:
            raise ValueError("missing quant/Huffman table")
        plane = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        planes.append(plane)
        meta.append((hs, vs, qtables[tq].astype(np.float64),
                     htables[(0, td)], htables[(1, ta)], plane))

    reader = _BitReader(data, pos)
    preds = [0] * len(meta)
    zz_list = _ZIGZAG.tolist()
    C, Ct = _C, _C.T
    # entropy-decode all coefficient blocks first (sequential by nature),
    # then dequantize + IDCT every block in ONE batched einsum per
    # component — the vectorizable 90% of decode cost
    coefs = [np.zeros((mcux * mcuy * m[0] * m[1], 64), dtype=np.float64)
             for m in meta]
    bidx = [0] * len(meta)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                preds = [0] * len(meta)
            mcu_count += 1
            for ci, (hs, vs, _q, dct, act, _plane) in enumerate(meta):
                for _by in range(vs):
                    for _bx in range(hs):
                        row = coefs[ci][bidx[ci]]
                        bidx[ci] += 1
                        t = reader.decode_huff(dct)
                        diff = _extend(reader.read_bits(t), t)
                        preds[ci] += diff
                        row[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    break
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            row[zz_list[k]] = _extend(reader.read_bits(s), s)
                            k += 1
    for ci, (hs, vs, q, _dct, _act, plane) in enumerate(meta):
        blocks = coefs[ci].reshape(-1, 8, 8) * q[None, :, :]
        px = np.einsum("ij,njk,kl->nil", Ct, blocks, C)
        # blocks arrive in MCU order: reshape through the MCU grid
        bh, bw_ = mcuy * vs, mcux * hs
        grid = px.reshape(mcuy, mcux, vs, hs, 8, 8)
        plane[:, :] = (
            grid.transpose(0, 2, 4, 1, 3, 5).reshape(bh * 8, bw_ * 8))
    out_planes = []
    for (hs, vs, *_rest), plane in zip(
        [(m[0], m[1]) for m in meta], planes
    ):
        up = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(up[:h, :w] + 128.0)
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4 or grayscale, Annex-K tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | code
        self.cnt += length
        while self.cnt >= 8:
            self.cnt -= 8
            b = (self.buf >> self.cnt) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.buf &= (1 << self.cnt) - 1  # keep the buffer a small int

    def flush(self) -> None:
        if self.cnt:
            pad = 8 - self.cnt
            self.write((1 << pad) - 1, pad)  # 1-pad to byte


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 -> table as-is, 100 -> all ones."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _emit_row(bw: _BitWriter, zz: list, last: int, pred: int,
              dc_tab, ac_tab) -> int:
    """Huffman-emit one pre-quantized zigzag row (the sequential 10% of
    encode; DCT/quant/zigzag are batched in numpy upstream)."""
    dc = zz[0]
    diff = dc - pred
    t = abs(diff).bit_length()
    code, length = dc_tab[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    k = 1
    while k <= last:
        run = 0
        while zz[k] == 0:
            run += 1
            k += 1
        while run > 15:
            code, length = ac_tab[0xF0]
            bw.write(code, length)
            run -= 16
        v = zz[k]
        s = abs(v).bit_length()
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        k += 1
    if last < 63:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return dc


def _quantized_zigzag(plane: np.ndarray, q: np.ndarray, mcuy: int,
                      mcux: int, vs: int, hs: int) -> tuple[list, np.ndarray]:
    """Padded component plane -> per-block zigzag coefficient rows in
    MCU scan order: one batched einsum DCT + one quantize for ALL
    blocks.  Returns (rows as nested lists, last-nonzero index array)."""
    grid = (
        plane.reshape(mcuy, vs, 8, mcux, hs, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(-1, 8, 8)
    )
    coef = np.einsum("ij,njk,kl->nil", _C, grid - 128.0, _C.T)
    quant = np.round(coef / q[None, :, :]).astype(np.int64).reshape(-1, 64)
    zzq = quant[:, _ZIGZAG]
    has_ac = zzq[:, 1:].any(axis=1)
    lasts = np.where(has_ac, 63 - np.argmax(zzq[:, :0:-1] != 0, axis=1), 0)
    return zzq.tolist(), lasts


def encode_jpeg(arr: np.ndarray, quality: int = 85, *,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """(H, W) or (H, W, 3) uint8 -> baseline JFIF JPEG bytes.

    ``subsample=True`` emits 4:2:0 chroma (2x2 luma sampling, box-filter
    downsampled Cb/Cr); ``restart_interval=R`` emits a DRI segment and
    RSTn markers every R MCUs — both exist mainly so the decoder's
    subsampling/restart paths are exercised by self-made streams."""
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        raise ValueError("encode_jpeg expects (H,W) or (H,W,3) uint8")
    h, w = arr.shape[:2]
    nc = len(planes)
    sub = 2 if (subsample and nc == 3) else 1
    samps = [(sub, sub)] + [(1, 1)] * (nc - 1)  # (hs, vs) per component
    ql = _scale_quant(_QUANT_LUMA, quality).reshape(8, 8)
    qc = _scale_quant(_QUANT_CHROMA, quality).reshape(8, 8)
    qs = [ql] + [qc] * (nc - 1)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01"
            b"\x00\x00\x01\x00\x01\x00\x00")  # APP0
    for tid, q in enumerate([ql] + ([qc] if nc > 1 else [])):
        zzvals = q.reshape(64)[_ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zzvals
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        hs, vs = samps[c]
        out += bytes([c + 1, (hs << 4) | vs, 0 if c == 0 else 1])
    tables = [(_DC_LUMA, 0x00), (_AC_LUMA, 0x10)]
    if nc > 1:
        tables += [(_DC_CHROMA, 0x01), (_AC_CHROMA, 0x11)]
    for (bits, huffval), tcth in tables:
        out += (b"\xff\xc4" + struct.pack(">H", 19 + len(huffval))
                + bytes([tcth]) + bytes(bits) + bytes(huffval))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_l = _build_encode_table(*_DC_LUMA)
    ac_l = _build_encode_table(*_AC_LUMA)
    dc_c = _build_encode_table(*_DC_CHROMA)
    ac_c = _build_encode_table(*_AC_CHROMA)
    mcux = -(-w // (8 * sub))
    mcuy = -(-h // (8 * sub))

    def pad_to(p: np.ndarray, bh: int, bw_: int) -> np.ndarray:
        ph, pw = p.shape
        pp = np.empty((bh, bw_), dtype=np.float64)
        pp[:ph, :pw] = p
        pp[ph:, :pw] = p[ph - 1 : ph, :]  # edge-replicate padding
        pp[:, pw:] = pp[:, pw - 1 : pw]
        return pp

    comp_planes = []
    for ci, p in enumerate(planes):
        hs, vs = samps[ci]
        if (hs, vs) != (sub, sub):  # chroma at 4:2:0: box downsample
            ph = -(-h // 2) * 2
            pw = -(-w // 2) * 2
            q2 = pad_to(p, ph, pw)
            p = (q2[0::2, 0::2] + q2[0::2, 1::2] + q2[1::2, 0::2]
                 + q2[1::2, 1::2]) / 4.0
        comp_planes.append(pad_to(p, mcuy * vs * 8, mcux * hs * 8))

    rows: list[list] = []
    lasts: list[np.ndarray] = []
    for ci in range(nc):
        hs, vs = samps[ci]
        r, l = _quantized_zigzag(
            comp_planes[ci], qs[ci].astype(np.float64), mcuy, mcux, vs, hs)
        rows.append(r)
        lasts.append(l)

    bw = _BitWriter()
    preds = [0] * nc
    bidx = [0] * nc
    mcu_count = 0
    for _myy in range(mcuy):
        for _mxx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)])
                preds = [0] * nc
            mcu_count += 1
            for ci in range(nc):
                hs, vs = samps[ci]
                dtab, atab = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for _b in range(hs * vs):
                    bi = bidx[ci]
                    bidx[ci] += 1
                    preds[ci] = _emit_row(
                        bw, rows[ci][bi], int(lasts[ci][bi]), preds[ci],
                        dtab, atab)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
