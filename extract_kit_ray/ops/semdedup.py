"""SemDeDup-style semantic deduplication: k-means-cluster the embedding
space, then remove near-duplicate members WITHIN each cluster (cosine >=
threshold, keep the smallest key per near-dup component) — the
cluster-then-prune recipe of Abbas et al. 2023 (SemDeDup,
arXiv:2303.09540), where clustering bounds the candidate space so the
pairwise check never runs corpus x corpus.

Scale shape (every lesson from the LSH family applied):

* Cluster assignment is a broadcast map (``ops/kmeans``): centroids ship
  once via ``ray.put``; no shuffle.
* The cluster groupby moves ONLY (key:int64, cluster:int64) rows — 16
  bytes/row, embeddings never ride the all-to-all (round-4 verdict #1's
  rule).
* In-cluster pair expansion reuses ``ops/dedup._expand_member_pairs``:
  above the hot-bucket cap a degenerate cluster expands a deterministic
  hash-sampled core + one star edge per extra member instead of n^2,
  with the ``overflow`` audit column.  A mega-cluster of boilerplate
  embeddings stays O(cap^2 + n).
* Candidate pairs are VERIFIED by exact cosine over vectors fetched for
  pair ENDPOINTS only (vectorized ``np.isin`` filter before the
  collect), so driver readout is bounded by candidate volume, never
  corpus size.  Cosine runs on the kmeans-quantized integer vectors, so
  exact duplicate rows score exactly 1.0 (int64 dot products; no float
  summation hazard at the 1.0 boundary).
* The keep-set applies as a broadcast drop-list filter on the streaming
  Dataset — the output is a Dataset, not a driver frame.

What the cluster boundary loses (the SemDeDup trade, documented in the
paper): a near-dup pair split across two clusters is never examined.
Exact copies are immune — identical vectors get identical integer
distances, hence the same argmin cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _collect_agg, _expand_member_pairs
from .kmeans import OFFSET, kmeans_assign, kmeans_fit, quantize_matrix


def semantic_dedup(ds, *, vec_col: str = "embedding",
                   key_col: str = "vec_id", k: int = 8, n_iters: int = 3,
                   threshold: float = 0.99,
                   max_cluster_members: int | None = None,
                   centroids: np.ndarray | None = None):
    """Returns (kept Dataset with one ``key_col`` column, dropped
    pandas frame ``[key_col, kept_as]`` mapping each removed key to its
    component's surviving representative).

    ``centroids`` short-circuits the fit (callers clustering once and
    pruning at several thresholds).  ``max_cluster_members`` defaults to
    the shared LSH hot-bucket cap (``EKRAY_LSH_BUCKET_CAP``; 0
    disables)."""
    import ray

    from ..config import lsh_bucket_cap

    if max_cluster_members is None:
        max_cluster_members = lsh_bucket_cap()
    cap = max_cluster_members if max_cluster_members > 0 else None

    # iterative algorithm: the fit makes n_iters+1 full passes, the
    # assignment and the endpoint-vector fetch two more — materialize
    # the (key, vector) projection ONCE instead of re-reading parquet
    # per pass (callers pass only the needed columns; the object store
    # spills if the vector corpus exceeds memory)
    ds = ds.materialize()

    if centroids is None:
        centroids = kmeans_fit(ds, vec_col=vec_col, key_col=key_col, k=k,
                               n_iters=n_iters)

    # narrow (key, cluster) rows into the groupby — never the vectors
    keyed = kmeans_assign(ds, centroids, vec_col=vec_col, key_col=key_col)
    clusters = keyed.groupby("cluster").aggregate(_collect_agg(key_col))
    pairs = clusters.map_batches(
        _expand_member_pairs,
        fn_kwargs={"max_members": cap, "salt_col": "cluster"},
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()

    drop_map = pd.DataFrame({key_col: pd.Series([], dtype=np.int64),
                             "kept_as": pd.Series([], dtype=np.int64)})
    if len(pairs):
        # endpoint-filtered vector fetch (bounded by candidate volume)
        endpoints = np.unique(np.concatenate(
            [pairs["key_a"].to_numpy(np.int64),
             pairs["key_b"].to_numpy(np.int64)]))
        endpoints_ref = ray.put(endpoints)

        def _fetch(batch: pa.Table) -> pa.Table:
            keys = batch[key_col].to_numpy()
            mask = np.isin(keys, ray.get(endpoints_ref))
            return batch.select([key_col, vec_col]).filter(pa.array(mask))

        vec_rows = ds.map_batches(_fetch, batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas()
        keys = vec_rows[key_col].to_numpy(np.int64)
        Q = quantize_matrix(pa.array(vec_rows[vec_col].tolist(),
                                     type=pa.list_(pa.float32())))
        N = (Q - OFFSET).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        skeys, sN = keys[order], N[order]
        ia = np.searchsorted(skeys, pairs["key_a"].to_numpy(np.int64))
        ib = np.searchsorted(skeys, pairs["key_b"].to_numpy(np.int64))
        # int64 dot products are exact; norms/ratio in float64 — exact
        # copies give dot == |a||b| hence cosine exactly 1.0
        dots = np.einsum("ij,ij->i", sN[ia], sN[ib]).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", sN, sN).astype(np.float64))
        sims = dots / (norms[ia] * norms[ib])
        dup = pairs[sims >= threshold]

        if len(dup):
            # union-find over verified pairs (bounded by duplicate volume)
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                while parent.get(x, x) != x:
                    parent[x] = parent.get(parent[x], parent[x])
                    x = parent[x]
                return x

            for ka, kb in zip(dup["key_a"].to_numpy(np.int64),
                              dup["key_b"].to_numpy(np.int64)):
                ra, rb = find(int(ka)), find(int(kb))
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            members = sorted(parent.keys() | {find(x) for x in parent})
            reps = {m: find(m) for m in members}
            dropped = [(m, r) for m, r in reps.items() if m != r]
            if dropped:
                drop_map = pd.DataFrame(dropped, columns=[key_col, "kept_as"])

    drop_arr = np.sort(drop_map[key_col].to_numpy(np.int64))
    drop_ref = ray.put(drop_arr)

    def _keep(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy()
        mask = ~np.isin(keys, ray.get(drop_ref))
        return batch.select([key_col]).filter(pa.array(mask))

    kept = ds.map_batches(_keep, batch_format="pyarrow", zero_copy_batch=True)
    return kept, drop_map
