"""Sequence packing — next-fit document packing into fixed token
budgets, the step that turns a filtered corpus into training examples.

LLM pre-training concatenates documents into context-window-sized
examples; deterministic packing (vs. random) keeps the output
resumable and auditable.  The reference has no analog; engine
extension for the training-data role.

Semantics: within each (group, shard) — shard being a bounded slice of
the key space — documents are taken in key order and appended to the
current bin while they fit; a doc that does not fit opens a new bin; a
doc larger than the capacity gets a bin of its own.  Packing is
shard-local BY DESIGN: that is what makes it embarrassingly parallel
at 100 TB (each shard packs independently; no global sequential scan),
and it also bounds the SQL oracle's recursion depth to the shard size.

Scale shape: shuffle on hash buckets of (group, shard) — one
``groupby`` — then ONE vectorized pass per bucket.  The per-shard loop
runs once per BIN (cumsum + searchsorted finds each bin's last doc in
O(log n)), not once per row, so a shard of thousands of small docs
costs tens of iterations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CAPACITY = 256      # tokens per packed example (driver-query default)
SHARD_DOCS = 100    # keys per shard: doc_id // SHARD_DOCS
_N_BUCKETS = 32


def pack_sizes(sizes: np.ndarray, capacity: int) -> np.ndarray:
    """Next-fit bin ids (0-based) for ordered ``sizes``.  One iteration
    per bin: cum[i] <= bin_base + capacity keeps doc i in the bin."""
    n = len(sizes)
    bins = np.empty(n, dtype=np.int64)
    cum = np.cumsum(sizes.astype(np.int64))
    start, b, base = 0, 0, 0
    while start < n:
        nxt = int(np.searchsorted(cum, base + capacity, side="right"))
        if nxt <= start:       # oversize doc: its own bin
            nxt = start + 1
        bins[start:nxt] = b
        b += 1
        base = int(cum[nxt - 1])
        start = nxt
    return bins


def next_fit_pack(ds, *, capacity: int = CAPACITY, size_col: str,
                  key_col: str = "doc_id", group_col: str = "source",
                  shard_docs: int = SHARD_DOCS):
    """Dataset -> (key, group, shard, size, bin_id) with bin ids local
    to (group, shard).  One hash-bucket shuffle + one vectorized pass
    per bucket (no per-shard Python beyond the per-bin loop)."""
    import pyarrow as pa

    def add_bucket(batch: pa.Table) -> pa.Table:
        from zlib import crc32

        keys = batch[key_col].to_numpy()
        shard = keys // shard_docs
        # crc32, NOT hash(): Python string hashing is salted per process,
        # and a (group, shard) split across buckets would pack wrong
        gid = np.array([crc32(g.encode()) for g in batch[group_col].to_pylist()],
                       dtype=np.int64)
        bucket = ((gid ^ shard) % _N_BUCKETS).astype(np.int64)
        return (batch.append_column("shard", pa.array(shard, pa.int64()))
                     .append_column("bucket", pa.array(bucket, pa.int64())))

    def pack_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values([group_col, "shard", key_col], kind="mergesort")
        sizes = g[size_col].to_numpy()
        grp = g[group_col].to_numpy()
        shard = g["shard"].to_numpy()
        new_shard = np.ones(len(g), dtype=bool)
        new_shard[1:] = (grp[1:] != grp[:-1]) | (shard[1:] != shard[:-1])
        starts = np.nonzero(new_shard)[0].tolist() + [len(g)]
        bins = np.empty(len(g), dtype=np.int64)
        for i in range(len(starts) - 1):
            lo, hi = starts[i], starts[i + 1]
            bins[lo:hi] = pack_sizes(sizes[lo:hi], capacity)
        out = g[[key_col, group_col, "shard", size_col]].copy()
        out["bin_id"] = bins
        return out

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)
    return bucketed.groupby("bucket").map_groups(pack_bucket,
                                                 batch_format="pandas")
