"""Z-order (Morton) locality keys — interleave the low bits of two
integer dimensions so that rows close in BOTH dimensions land in the
same key range.  The standard trick for laying out multi-dimensional
data (user x time, domain-hash x crawl-day, lat x lon) as
one-dimensional partitioned Parquet: range-partitioning by the Morton
key gives every partition a compact 2-D tile, so a 2-D range scan
touches few partitions instead of all of them (Morton 1966; the same
layout Delta/Iceberg expose as OPTIMIZE ZORDER BY).

Semantics: ``zkey = interleave(x & (2^bits - 1), y & (2^bits - 1))``
— x occupies even bit positions, y odd; inputs are MASKED to their
low ``bits`` bits by design (callers pre-bucket raw domains, e.g.
``ts_us // 3600e6 % 2^bits``), so the op is total and exactly
SQL-replayable.  ``bucket_bits`` optionally emits ``zbucket = zkey >>
(2*bits - bucket_bits)`` — the coarse tile id used as a partition
key.

Pure streaming ``map_batches`` — no shuffle; the bit-spreading is
O(log bits) vectorized numpy mask-shift rounds (classic bit-twiddling
"Part1By1"), not a per-bit Python loop.  The DuckDB oracle is the
per-bit closed form (2*bits terms of ``((x >> i) & 1) << (2i)``) —
slower but transparent, and bit-identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SPREAD_ROUNDS = [  # Part1By1 for up to 32 input bits -> 64-bit output
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread(v: np.ndarray) -> np.ndarray:
    """Insert a zero bit between every bit of v (uint64, <= 32 bits)."""
    v = v.astype(np.uint64)
    for shift, mask in _SPREAD_ROUNDS:
        v = (v | (v << np.uint64(shift))) & np.uint64(mask)
    return v


def morton_key(x: np.ndarray, y: np.ndarray, *, bits: int) -> np.ndarray:
    """(n,) int64 Morton keys from the low ``bits`` bits of x and y."""
    mask = np.uint64((1 << bits) - 1)
    xs = _spread(x.astype(np.int64).view(np.uint64) & mask)
    ys = _spread(y.astype(np.int64).view(np.uint64) & mask)
    return (xs | (ys << np.uint64(1))).astype(np.int64)


def zorder_keys(ds, *, x_col: str, y_col: str, bits: int = 16,
                bucket_bits: int | None = None,
                key_alias: str = "zkey", bucket_alias: str = "zbucket"):
    """Dataset -> same rows plus ``key_alias`` (and ``bucket_alias``
    when ``bucket_bits`` is given).  ``bits`` per dimension, <= 31."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    if bucket_bits is not None and not 1 <= bucket_bits <= 2 * bits:
        raise ValueError(f"bucket_bits must be in [1, {2 * bits}]")

    def add(batch: pa.Table) -> pa.Table:
        z = morton_key(batch[x_col].to_numpy(), batch[y_col].to_numpy(),
                       bits=bits)
        batch = batch.append_column(key_alias, pa.array(z, pa.int64()))
        if bucket_bits is not None:
            batch = batch.append_column(
                bucket_alias,
                pa.array(z >> np.int64(2 * bits - bucket_bits), pa.int64()))
        return batch

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def zorder_key_sql(x_col: str, y_col: str, *, bits: int) -> str:
    """DuckDB expression computing exactly :func:`morton_key` (inputs
    must be non-negative — SQL ``&`` masking matches numpy's two's-
    complement masking only for values >= 0; the callers' pre-bucketed
    domains are)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_col} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_col} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " | ".join(terms) + " AS BIGINT)"
