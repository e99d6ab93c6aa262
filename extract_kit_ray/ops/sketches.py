"""Mergeable sketches for corpus-scale aggregation: HyperLogLog
distinct counting (Flajolet et al., 2007 — public algorithm).

Why a sketch: exact distinct-count of a high-cardinality key (users,
urls, shingles) needs a key-wide shuffle (the two-level groupby in
``q_events_type_rollup``); an HLL register array is a CONSTANT-size
mergeable state, so the shuffle moves one (group, 2^p bytes) row per
group per batch instead of one row per distinct key — the classic
trade at 10^12 keys.

Determinism: key hashing is splitmix64 over int64 keys (numpy,
``functions.hashing.mix64``) — platform-stable, no salted hash() — so
estimates are bit-reproducible across runs and nodes (which is what
lets the driver query assert an error band as a boolean oracle).

Shape in Ray Data: per-batch ``hll_partial_batch`` emits one
register-blob row per group; ``groupby(group).map_groups(hll_merge)``
ORs register maxima and applies the estimator.  Registers are binary
blobs because Arrow joins/groupbys reject list columns as payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import mix64

DEFAULT_P = 12  # 4096 registers, ~1.6% standard error, 4 KB state


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(keys: np.ndarray, p: int = DEFAULT_P) -> np.ndarray:
    """int64 keys -> (2^p,) uint8 register array (max rank per bucket)."""
    m = 1 << p
    h = mix64(keys.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    nbits = 64 - p
    # rank = leading zeros of the (64-p)-bit suffix + 1, capped; exact
    # vectorized lzcnt via 6-pass binary reduction (no float log tricks)
    x = h << np.uint64(p)
    lz = np.zeros(len(h), dtype=np.uint8)
    with np.errstate(over="ignore"):
        for s in (32, 16, 8, 4, 2, 1):
            top_zero = (x >> np.uint64(64 - s)) == 0
            lz[top_zero] += s
            x[top_zero] = x[top_zero] << np.uint64(s)
    rank = (np.minimum(lz, nbits) + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (Flajolet et al. §4)."""
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros))
    return float(est)


def hll_partial_batch(batch: pa.Table, *, group_col: str, key_col: str,
                      p: int = DEFAULT_P) -> pa.Table:
    """One (group, register-blob) partial row per group in the batch."""
    groups = batch[group_col].to_pylist()
    keys = batch[key_col].to_numpy().astype(np.int64)
    out_g, out_b = [], []
    df = pd.DataFrame({"g": groups})
    for g, idx in df.groupby("g", sort=False).indices.items():
        out_g.append(g)
        out_b.append(hll_registers(keys[idx], p).tobytes())
    return pa.table({group_col: pa.array(out_g),
                     "hll": pa.array(out_b, pa.binary())})


def hll_merge_group(group: pd.DataFrame, *, group_col: str) -> pd.DataFrame:
    """Merge partial register blobs (element-wise max) -> estimate."""
    blobs = [np.frombuffer(b, dtype=np.uint8) for b in group["hll"]]
    regs = np.maximum.reduce(blobs)
    return pd.DataFrame({
        group_col: [group[group_col].iloc[0]],
        "distinct_est": [hll_estimate(regs)],
    })


# ---------------------------------------------------------------------------
# Bloom filter: mergeable membership sketch (cross-run incremental dedup)
# ---------------------------------------------------------------------------

BLOOM_BITS_PER_KEY = 16
BLOOM_K = 8


def _bloom_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch-Mitzenmacher double hashing
    (h1 + i*h2 — public technique), splitmix64-derived, deterministic."""
    u = keys.astype(np.uint64)
    h1 = mix64(u)
    h2 = mix64(u ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)
    return pos.astype(np.int64)


def bloom_build(keys: np.ndarray, m_bits: int, k: int = BLOOM_K) -> np.ndarray:
    """int64 keys -> uint8 bitmap of ceil(m_bits/8) bytes."""
    bitmap = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    if len(keys):
        pos = _bloom_positions(keys, m_bits, k).ravel()
        np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bitmap


def bloom_probe(bitmap: np.ndarray, keys: np.ndarray, m_bits: int,
                k: int = BLOOM_K) -> np.ndarray:
    """(n,) bool: True = maybe-member (no false negatives)."""
    if not len(keys):
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(keys, m_bits, k)
    bits = (bitmap[pos >> 3] >> (pos & 7)) & 1
    return bits.all(axis=1)


def bloom_build_ds(ds, *, key_col: str, m_bits: int, k: int = BLOOM_K,
                   fanin: int = 8) -> np.ndarray:
    """Dataset -> merged bitmap: per-batch partial bitmaps OR-reduced in
    a ``fanin``-ary TREE of Ray tasks (mergeable like HLL registers; the
    exchange moves fixed-size bitmaps, never keys).  The driver receives
    exactly ONE bitmap — round-2 ``take_all``'d every partial and OR'd
    serially, which at m_bits ~ 16 x corpus keys ships many multi-GB
    partials through the driver; the tree keeps partials in the object
    store and gives log_fanin depth.  Size m_bits ~ BLOOM_BITS_PER_KEY *
    expected keys and ship the result via ray.put to probe-side actors."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy().astype(np.int64)
        return pa.table({"bitmap": pa.array([bloom_build(keys, m_bits, k).tobytes()],
                                            pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    refs = parts.to_arrow_refs()

    n_bytes = (m_bits + 7) // 8

    @ray.remote
    def or_tables(*tables) -> np.ndarray:
        out = np.zeros(n_bytes, dtype=np.uint8)
        for t in tables:
            if isinstance(t, pa.Table):
                # 0-row upstream blocks pass through map_batches without
                # the UDF running, keeping the INPUT schema — skip them
                if "bitmap" not in t.schema.names:
                    continue
                for blob in t["bitmap"].to_pylist():
                    out |= np.frombuffer(blob, dtype=np.uint8)
            else:  # merged ndarray from a lower tree level
                out |= t
        return out

    if not refs:
        return np.zeros(n_bytes, dtype=np.uint8)
    level = list(refs)
    while len(level) > 1:
        level = [or_tables.remote(*level[i:i + fanin])
                 for i in range(0, len(level), fanin)]
    merged = ray.get(level[0])
    if isinstance(merged, pa.Table):  # single-block input: no task ran
        merged = ray.get(or_tables.remote(merged))
    return merged


def hll_distinct(ds, *, group_col: str, key_col: str, p: int = DEFAULT_P):
    """Dataset -> (group, distinct_est) via mergeable HLL partials."""
    import functools

    partials = ds.map_batches(
        hll_partial_batch,
        fn_kwargs={"group_col": group_col, "key_col": key_col, "p": p},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return partials.groupby(group_col).map_groups(
        functools.partial(hll_merge_group, group_col=group_col),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable summaries)
# ---------------------------------------------------------------------------


def mg_compress(counts: dict, capacity: int) -> dict:
    """Compress an exact counter to a Misra-Gries summary of at most
    ``capacity`` entries (Agarwal et al., "Mergeable Summaries", PODS
    2012): subtract the (capacity+1)-th largest count from every entry
    and keep the positive ones.  Estimates satisfy
    ``true - n/(capacity+1) <= est <= true``."""
    if len(counts) <= capacity:
        return dict(counts)
    vals = sorted(counts.values(), reverse=True)
    cut = vals[capacity]
    return {k: v - cut for k, v in counts.items() if v > cut}


def mg_merge(a: dict, b: dict, capacity: int) -> dict:
    """Merge two MG summaries: pointwise sum, then one compress step —
    the bound-preserving merge of the mergeable-summaries theorem."""
    out = dict(a)
    for k, v in b.items():
        out[k] = out.get(k, 0) + v
    return mg_compress(out, capacity)


def heavy_hitters(ds, *, col_tokens, capacity: int = 64, topk: int = 10):
    """Global heavy-hitter terms via one streaming pass of mergeable
    Misra-Gries partials (AggregateFn: per-block exact counter ->
    compress; tree-merge with the bound-preserving MG merge; finalize
    to the top-k by (count DESC, term ASC)).

    ``col_tokens(batch) -> iterable[str]`` tokenizes a pyarrow batch.

    Determinism: merge ORDER varies across runs, and MG estimates are
    only order-independent while no compression triggers — i.e. when
    ``capacity`` >= the distinct-term count the result is the EXACT
    top-k (the regime the SQL-checked query runs in; documented
    exactness condition).  Under compression the n/(capacity+1) error
    bound still holds for any merge tree (unit-tested)."""
    from collections import Counter

    from ray.data.aggregate import AggregateFn

    def accumulate(acc: dict, blk) -> dict:
        # blocks arrive as Arrow tables (parquet reads) or pandas
        # frames (from_pandas datasets) depending on the source
        tbl = (blk if isinstance(blk, pa.Table)
               else pa.Table.from_pandas(blk, preserve_index=False))
        c: Counter = Counter(col_tokens(tbl))
        return mg_merge(acc, dict(c), capacity)

    agg = AggregateFn(
        init=lambda k: {},
        merge=lambda a, b: mg_merge(a, b, capacity),
        accumulate_block=accumulate,
        name="mg",
    )
    summary = ds.aggregate(agg)["mg"]
    ranked = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    return pd.DataFrame(
        {"term": [t for t, _ in ranked],
         "est_count": pd.array([c for _, c in ranked], dtype="int64"),
         "rank": pd.array(range(1, len(ranked) + 1), dtype="int64")})
