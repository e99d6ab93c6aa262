"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode step is STUBBED (no image/audio codec libraries in this
container — driver brief permits a clearly-marked deterministic fake):
``DecodeStub`` derives byte-level pseudo-features (dimensions, a
fixed-length feature vector from hashed byte windows).  The Ray-side
plumbing — schema, small batch sizes for large binaries, actor
signature, output layout — is real and tested; swapping the stub for
PIL/ffmpeg later changes only the ``_decode`` body.

Analogous reference stages: the Sharp image-optimization worker chain
(packages/pdf-processor/src/core/vision/image-optimization.ts:28-175,
vision-optimization-worker.ts:49-194): per-image resize/enhance/encode
with per-model pixel budgets (image-optimization.ts:202-224).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown / not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 32

# per-model pixel budgets, mirroring image-optimization.ts:202-224
PIXEL_BUDGETS = {"pixtral": 1024 * 1024, "mistral": 1540 * 1540, "default": 2048 * 2048}


def _decode(payload: bytes) -> dict:
    """STUB decode — deterministic fake.

    Real implementation would be PIL/ffmpeg; unavailable here. Emits
    stable pseudo-dimensions and a FEATURE_DIM float vector derived from
    blake2b-hashed byte windows, so downstream plumbing (resize budget,
    feature join, ANN) is fully exercisable."""
    if not payload:
        raise ValueError("empty media payload")
    h = hash64(payload)
    width = 256 + (h & 0x3FF)
    height = 256 + ((h >> 10) & 0x3FF)
    n = max(1, len(payload) // FEATURE_DIM)
    feats = np.array(
        [hash64(payload[i * n : (i + 1) * n], seed=i) % 10_000 / 10_000.0
         for i in range(FEATURE_DIM)],
        dtype=np.float32,
    )
    return {"width": int(width), "height": int(height), "features": feats}


def resize_plan(width: int, height: int, model: str = "default") -> tuple[int, int]:
    """Aspect-preserving resize to the model's pixel budget
    (image-optimization.ts:117-147: sqrt-scale both dims, never upscale)."""
    budget = PIXEL_BUDGETS.get(model, PIXEL_BUDGETS["default"])
    pixels = width * height
    if pixels <= budget:
        return width, height
    scale = (budget / pixels) ** 0.5
    return max(1, int(width * scale)), max(1, int(height * scale))


def center_crop_plan(width: int, height: int, crop_size: float) -> tuple[int, int, int, int] | None:
    """Center-crop plan (left, top, w, h) keeping ``crop_size`` percent
    of each dimension (image-optimization.ts:103-115, M15): applies
    only for 0 < crop_size < 100 AND both cropped dims > 100 px
    (reference guard); otherwise returns None (no crop).  Pure
    geometry — the pixel work happens in the (stubbed) codec."""
    if not (crop_size and 0 < crop_size < 100):
        return None
    pct = crop_size / 100.0
    w = int(width * pct)
    h = int(height * pct)
    if w <= 100 or h <= 100:
        return None
    return ((width - w) // 2, (height - h) // 2, w, h)


# deterministic stand-ins for the Sharp enhance/encode constants
# (image-optimization.ts:149-175): contrast stretch bounds + a JPEG
# quality -> bytes-per-pixel estimate used by the stubbed encoder
CONTRAST_LOW_P, CONTRAST_HIGH_P = 0.02, 0.98
JPEG_QUALITY = 80
_JPEG_BPP = {80: 0.25}  # empirical bytes/pixel at quality 80


def contrast_enhance_params(pixel_min: int, pixel_max: int) -> tuple[float, float]:
    """Linear contrast-stretch (gain, bias) mapping the observed pixel
    range onto [0, 255] (image-optimization.ts:149-158 normalize role,
    M17).  With the stub decode the observed range is derived from the
    payload hash; the formula is the real one."""
    lo, hi = float(pixel_min), float(pixel_max)
    if hi <= lo:
        return 1.0, 0.0
    gain = 255.0 / (hi - lo)
    return gain, -lo * gain


def encode_metrics(original_size: int, target_w: int, target_h: int,
                   quality: int = JPEG_QUALITY) -> dict:
    """The reference's optimization metrics struct
    (image-optimization.ts:160-175 -> G1 rollup): originalSize,
    optimizedSize, compressionRatio.  optimizedSize is a deterministic
    size MODEL (pixels x bytes-per-pixel at the quality) because the
    encoder itself is stubbed; swapping in a real codec replaces only
    the estimate with the actual byte length."""
    optimized = max(1, int(target_w * target_h * _JPEG_BPP.get(quality, 0.25)))
    ratio = (original_size / optimized) if optimized else 0.0
    return {
        "original_size": int(original_size),
        "optimized_size": optimized,
        "compression_ratio": float(round(ratio, 6)),
        "quality": int(quality),
    }


class MediaFeatureExtractor:
    """Actor-pool stage: decode(stub) -> features + resize plan.

    Use small ``batch_size`` (<= 16) — binary payloads are large and a
    batch x concurrency must fit worker heaps (ray_guide.md memory
    notes)."""

    def __init__(self, model: str = "default"):
        self.model = model

    _METRICS_TYPE = pa.struct(
        [
            ("original_size", pa.int64()),
            ("optimized_size", pa.int64()),
            ("compression_ratio", pa.float64()),
            ("quality", pa.int32()),
        ]
    )

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats, valids, errors = [], [], [], [], []
        t_w, t_h, metrics = [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                d = _decode(payload or b"")
                widths.append(d["width"])
                heights.append(d["height"])
                feats.append(d["features"].tolist())
                w, h = resize_plan(d["width"], d["height"], self.model)
                t_w.append(w)
                t_h.append(h)
                metrics.append(encode_metrics(len(payload or b""), w, h))
                valids.append(True)
                errors.append("")
            except ValueError as exc:
                widths.append(-1)
                heights.append(-1)
                feats.append([0.0] * FEATURE_DIM)
                t_w.append(-1)
                t_h.append(-1)
                metrics.append(encode_metrics(0, 0, 0))
                valids.append(False)
                errors.append(str(exc))
        return (
            batch.drop_columns(["payload"])  # payload never re-shipped downstream
            .append_column("decoded_width", pa.array(widths, pa.int32()))
            .append_column("decoded_height", pa.array(heights, pa.int32()))
            .append_column("target_width", pa.array(t_w, pa.int32()))
            .append_column("target_height", pa.array(t_h, pa.int32()))
            .append_column("features", pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)))
            .append_column("metrics", pa.array(metrics, self._METRICS_TYPE))
            .append_column("valid", pa.array(valids, pa.bool_()))
            .append_column("error", pa.array(errors, pa.string()))
        )


def frame_sample_plan(duration_ms: int, fps_target: float = 1.0,
                      max_frames: int = 32) -> list[int]:
    """Deterministic frame-sample timestamps (ms) for video payloads."""
    if duration_ms <= 0:
        return []
    step = max(1, int(1000 / fps_target))
    stamps = list(range(0, duration_ms, step))[:max_frames]
    return stamps


def extract_media_features(ds, *, model: str = "default", concurrency=2,
                           batch_size: int = 16):
    """media Dataset -> feature Dataset (actor pool, small batches)."""
    return ds.map_batches(
        MediaFeatureExtractor, fn_constructor_kwargs={"model": model},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
    )


def make_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table for tests (binary payloads are
    seeded pseudo-random bytes — content is opaque by design)."""
    import random

    ids, kinds, payloads, mimes, ws, hs, durs = [], [], [], [], [], [], []
    for i in range(n):
        rng = random.Random(f"{seed}:media:{i}")
        kind = ("image", "audio", "video")[i % 3]
        size = rng.randint(200, 4000)
        ids.append(i)
        kinds.append(kind)
        payloads.append(bytes(rng.getrandbits(8) for _ in range(size)) if i % 17 != 13 else b"")
        mimes.append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        ws.append(-1)
        hs.append(-1)
        durs.append(rng.randint(1000, 60000) if kind == "video" else -1)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
