"""Deterministic sampling operators for training-data curation:
stratified per-group samples and corpus fractions, reproducible across
runs/nodes and SQL-mirrorable.

Randomness is a fixed Knuth multiplicative hash of the key column —
``h(key) = (key * 2654435761) mod 2^32`` — so the "random" order is (a)
deterministic (resumable pipelines re-select the identical sample), (b)
exactly expressible in DuckDB integer arithmetic (the oracle reproduces
the full selection, not just its size), and (c) injective for keys
below 2^32 (odd multiplier), so no ties beyond the key tiebreaker.

Scale shape (ray_guide.md "Aggregation at scale"): a per-batch partial
top-n keeps at most ``n_per_group`` rows per group per batch, so the
``groupby(group)`` shuffle moves O(n_batches x groups x n) rows — never
the corpus; the final per-group head is exact because the global top-n
is a subset of the union of per-batch top-ns (min-monotone selection).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SAMPLE_HASH_MULT = 2654435761  # Knuth multiplicative hash constant
SAMPLE_HASH_MOD = 1 << 32


def sample_hash(keys: np.ndarray) -> np.ndarray:
    """(n,) uint64 deterministic sample order for int64 keys."""
    with np.errstate(over="ignore"):
        return (keys.astype(np.uint64) * np.uint64(SAMPLE_HASH_MULT)) % np.uint64(SAMPLE_HASH_MOD)


def sample_hash_sql(key_col: str) -> str:
    """The DuckDB expression computing exactly :func:`sample_hash` over
    the FULL int64 key domain.  numpy's path is ``uint64(key) * M mod
    2^32``; since 2^32 divides 2^64, that equals ``((key mod 2^32) * M)
    mod 2^32`` with mathematical (non-negative) mod — so the SQL first
    masks the key to a non-negative sub-2^32 value (double-% because
    DuckDB's % keeps the dividend's sign), then multiplies in HUGEINT
    (the product can reach ~1.8e19, past BIGINT's 2^63-1 — a plain
    BIGINT multiply raised an overflow error for large keys and
    diverged for negative ones, round-3 ADVICE)."""
    masked = (f"((({key_col} % {SAMPLE_HASH_MOD}) + {SAMPLE_HASH_MOD}) "
              f"% {SAMPLE_HASH_MOD})")
    return (f"((CAST({masked} AS HUGEINT) * {SAMPLE_HASH_MULT}) "
            f"% {SAMPLE_HASH_MOD})")


def stratified_sample(ds, *, group_col: str, key_col: str, n_per_group: int):
    """Keep the ``n_per_group`` hash-smallest rows of every group —
    a reproducible stratified sample (e.g. N docs per language for an
    eval set).  Returns a Dataset with the input columns."""
    if n_per_group < 1:
        raise ValueError(f"n_per_group must be >= 1, got {n_per_group}")

    def partial_topn(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["__h"] = sample_hash(df[key_col].to_numpy(np.int64))
        df = df.sort_values(["__h", key_col], kind="mergesort")
        out = df.groupby(group_col, sort=False).head(n_per_group)
        return pa.Table.from_pandas(out, preserve_index=False)

    def final_topn(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["__h", key_col], kind="mergesort").head(n_per_group)
        return g.drop(columns=["__h"])

    partials = ds.map_batches(partial_topn, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.groupby(group_col).map_groups(final_topn,
                                                  batch_format="pandas")


def sample_fraction(ds, *, key_col: str, fraction: float):
    """Keep rows whose sample hash falls under ``fraction`` of the hash
    space — a deterministic Bernoulli-style corpus sample (no shuffle,
    one streaming filter; exact-in-expectation rate, exactly
    reproducible and SQL-mirrorable)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(fraction * SAMPLE_HASH_MOD)

    def keep(batch: pa.Table) -> pa.Table:
        h = sample_hash(batch[key_col].to_numpy())
        return batch.filter(pa.array(h < cut))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
