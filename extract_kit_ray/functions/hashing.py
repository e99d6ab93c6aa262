"""Deterministic, platform-stable hashing primitives.

No mmh3/xxhash in this environment; everything derives from blake2b
(stdlib, stable across platforms and Python versions).  Python's builtin
``hash()`` is salted per process and MUST NOT be used anywhere in the
engine — these helpers are the only hash entry points.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = (1 << 64) - 1


def hash64(data: bytes | str, seed: int = 0) -> int:
    """Stable 64-bit hash of bytes/str."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = hashlib.blake2b(data, digest_size=8, key=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def hash64_signed(data: bytes | str, seed: int = 0) -> int:
    """Stable 64-bit hash folded into int64 range (for Arrow int64 cols)."""
    return hash64(data, seed) - (1 << 63)


def hash128_signed(data: bytes | str, seed: int = 0) -> tuple[int, int]:
    """Stable 128-bit hash as two signed int64s (lo, hi).

    Dedup keys use the full 128 bits: at 10^10 documents a 64-bit key
    expects ~2.7M birthday collisions (n^2/2^65) silently merging
    distinct docs; at 128 bits the expectation is ~1.5e-19 — safe
    without a text-verification pass."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    d = hashlib.blake2b(data, digest_size=16, key=seed.to_bytes(8, "little")).digest()
    return (
        int.from_bytes(d[:8], "little") - (1 << 63),
        int.from_bytes(d[8:], "little") - (1 << 63),
    )


def hash128_batch_signed(items, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Batched :func:`hash128_signed` over a sequence of str/bytes/None:
    returns two int64 numpy arrays (lo, hi), bit-identical to the
    per-row function.

    The blake2b call per item is inherent (it's C and per-item by
    nature), but the per-row ``int.from_bytes`` pair, tuple build and
    list appends aren't: digests land in ONE preallocated buffer, the
    int64 fold is one vectorized xor-view, and the hot loop carries
    only local bindings."""
    n = len(items)
    buf = bytearray(16 * n)
    mv = memoryview(buf)
    blake = hashlib.blake2b
    key = seed.to_bytes(8, "little")
    enc = str.encode
    pos = 0
    for t in items:
        if t is None:
            t = b""
        elif type(t) is str:
            t = enc(t, "utf-8")
        mv[pos:pos + 16] = blake(t, digest_size=16, key=key).digest()
        pos += 16
    arr = np.frombuffer(buf, dtype="<u8").reshape(n, 2)
    # uint64 -> signed(v - 2^63): flip the top bit, reinterpret as int64
    folded = (arr ^ np.uint64(1 << 63)).view(np.int64)
    return np.ascontiguousarray(folded[:, 0]), np.ascontiguousarray(folded[:, 1])


def content_checksum(values: list[bytes | str]) -> int:
    """Order-independent checksum of a set of values (sum of hash64 mod 2^64).

    Used for partition manifests: the checksum of a partition's rows is
    independent of row order within the partition, so resume-and-rewrite
    produces the same manifest."""
    total = 0
    for v in values:
        total = (total + hash64(v)) & _MASK64
    return total


# ---------------------------------------------------------------------------
# vectorized multiply-shift hashing for minhash/simhash (numpy, stable)
# ---------------------------------------------------------------------------

_MULT_A = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio constant (public, splitmix64)
_MULT_B = np.uint64(0xBF58476D1CE4E5B9)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (public-domain constants)."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(30)
        x *= _MULT_A
        x ^= x >> np.uint64(27)
        x *= _MULT_B
        x ^= x >> np.uint64(31)
    return x


def permute64(hashes: np.ndarray, a: np.uint64, b: np.uint64) -> np.ndarray:
    """One universal-hash permutation h' = a*h + b (mod 2^64) + mix."""
    with np.errstate(over="ignore"):
        return mix64(hashes * a + b)


def permutation_params(n_perm: int, seed: int = 1337) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameter vectors for n_perm permutations."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=n_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=n_perm, dtype=np.uint64)
    return a, b


def rolling_fingerprint(text: str, window: int = 64, base: int = 257, mod: int = (1 << 61) - 1) -> int:
    """Deterministic rolling-hash document fingerprint: min of windowed
    polynomial hashes (a Rabin-Karp-style winnowing representative)."""
    data = text.encode("utf-8")
    if not data:
        return 0
    if len(data) <= window:
        return hash64(data)
    power = pow(base, window - 1, mod)
    h = 0
    best = None
    for i, byte in enumerate(data):
        h = (h * base + byte) % mod
        if i >= window:
            h = (h - data[i - window] * power * base) % mod
        if i >= window - 1:
            best = h if best is None else min(best, h)
    return best if best is not None else h
