"""Count-Min sketch — constant-memory approximate per-key frequency
(Cormode & Muthukrishnan 2005), completing the mergeable-sketch family
next to HyperLogLog (distinct counts), Bloom (membership) and
Misra-Gries (heavy hitters, ops/sketches.py): "roughly how many times
did key k occur" over a stream too wide to count exactly, with a
one-sided error (never underestimates) bounded by N/width per row.

Determinism contract (what makes the DuckDB oracle EXACT rather than a
band check): the d hash rows use fixed public 32-bit multiplicative
constants, so the sketch content is a pure function of the multiset of
keys — the oracle replays the same bucket assignment in SQL (HUGEINT
multiply, the ops/sampling.sample_hash_sql technique) and takes the
same min-over-rows, reproducing the ESTIMATE bit-for-bit, collisions
and all.

Scale shape (the map-side-combine idiom, no wide shuffle):

1. one pass of ``map_batches``: each batch bincounts its keys into the
   d*width slot space and emits only its NONZERO slots — at most
   ``min(d * batch_rows, d * width)`` 16-byte rows per batch;
2. ``groupby(slot).sum`` over a key space bounded by d*width (8k rows
   at the defaults) — the only exchange, constant-bounded regardless
   of input size;
3. the driver collects the d x width counter matrix (constant-size by
   construction — the annotated-collect convention) and answers any
   probe set with one vectorized gather + min.

Merging sketches across runs = adding matrices; the slot groupby IS
that merge, so cross-run composition needs no extra machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# public 32-bit hash primes (Knuth multiplicative + xxhash32 primes)
CMS_MULTS = (2654435761, 2246822519, 3266489917, 668265263)
_MOD32 = np.uint64(1 << 32)


def _buckets(keys: np.ndarray, mult: int, width: int) -> np.ndarray:
    """Multiplicative bucket of int64 keys: ``((k mod 2^32) * M mod
    2^32) mod width`` — the uint64 view's low 32 bits equal the
    mathematical mod, matching the SQL mirror for negative keys too."""
    masked = keys.astype(np.uint64) % _MOD32
    return ((masked * np.uint64(mult)) % _MOD32) % np.uint64(width)


def cms_bucket_sql(expr: str, mult: int, width: int) -> str:
    """DuckDB expression replaying :func:`_buckets` exactly over the
    full int64 domain (double-% for sign, HUGEINT for the product —
    see ops/sampling.sample_hash_sql)."""
    m = 1 << 32
    masked = f"((({expr}) % {m}) + {m}) % {m}"
    return (f"CAST(((CAST({masked} AS HUGEINT) * {mult}) % {m}) "
            f"% {width} AS BIGINT)")


def cms_matrix(ds, *, key_col: str, depth: int = 4,
               width: int = 512) -> np.ndarray:
    """Dataset -> the (depth, width) int64 Count-Min counter matrix."""
    from ray.data.aggregate import Sum

    if not 1 <= depth <= len(CMS_MULTS):
        raise ValueError(f"depth must be in [1, {len(CMS_MULTS)}]")
    mults = CMS_MULTS[:depth]

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy()
        slot = np.concatenate([
            (_buckets(k, m, width) + np.uint64(j * width)).astype(np.int64)
            for j, m in enumerate(mults)])
        cnt = np.bincount(slot, minlength=depth * width)
        nz = np.flatnonzero(cnt)
        return pa.table({"slot": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    slots = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("slot").aggregate(Sum("n", alias_name="n")))
    mat = np.zeros(depth * width, dtype=np.int64)
    # constant-bounded collect: at most depth*width rows by construction
    for row in slots.take_all():
        mat[row["slot"]] = row["n"]
    return mat.reshape(depth, width)


def cms_estimate(mat: np.ndarray, probes: np.ndarray) -> np.ndarray:
    """min over the d counter rows at each probe's buckets."""
    depth, width = mat.shape
    est = np.full(len(probes), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(depth):
        b = _buckets(probes, CMS_MULTS[j], width).astype(np.int64)
        est = np.minimum(est, mat[j, b])
    return est


def cms_probe_counts(ds, *, key_col: str, probes: np.ndarray,
                     depth: int = 4, width: int = 512,
                     probe_col: str = "key",
                     est_col: str = "est_n") -> pa.Table:
    """Sketch the dataset once, answer a probe key set: (key, est_n)."""
    mat = cms_matrix(ds, key_col=key_col, depth=depth, width=width)
    return pa.table({probe_col: pa.array(probes, pa.int64()),
                     est_col: pa.array(cms_estimate(mat, probes),
                                       pa.int64())})


def oracle_cms_sql(rows_sql: str, *, key_col: str, probes_sql: str,
                   depth: int = 4, width: int = 512,
                   probe_col: str = "key", est_col: str = "est_n") -> str:
    """DuckDB mirror of :func:`cms_probe_counts`: exact per-key counts
    grouped into the same buckets, LEFT-joined per hash row, min via
    LEAST (COALESCE 0 — an empty bucket is a zero counter)."""
    mults = CMS_MULTS[:depth]
    ctes = [f"keys AS (SELECT {key_col} AS k, CAST(COUNT(*) AS BIGINT) "
            f"AS c FROM ({rows_sql}) GROUP BY 1)"]
    joins, mins = [], []
    for j, m in enumerate(mults):
        ctes.append(
            f"b{j} AS (SELECT {cms_bucket_sql('k', m, width)} AS b, "
            f"CAST(SUM(c) AS BIGINT) AS s FROM keys GROUP BY 1)")
        joins.append(
            f"LEFT JOIN b{j} ON b{j}.b = {cms_bucket_sql('p.k', m, width)}")
        mins.append(f"COALESCE(b{j}.s, 0)")
    least = mins[0] if depth == 1 else f"LEAST({', '.join(mins)})"
    return (f"WITH {', '.join(ctes)} "
            f"SELECT p.k AS {probe_col}, CAST({least} AS BIGINT) AS "
            f"{est_col} FROM ({probes_sql}) p {' '.join(joins)}")
