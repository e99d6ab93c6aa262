"""Distributed k-means (Lloyd) over an embedding column, integer-exact
so a chained-CTE DuckDB oracle reproduces every iteration bit-for-bit
(the same determinism contract as ops/pagerank — float k-means is
un-oracle-able across engines because centroid sums are order-
sensitive).

Determinism contract
--------------------
* Vectors are quantized once: ``q_d = floor(v_d * 1e6 + 0.5) + 2e6``
  (int64).  The ``+0.5``-then-floor form is round-half-UP in IEEE
  doubles on both sides (numpy and DuckDB), unlike banker's
  ``round``; the ``+2_000_000`` offset keeps every quantity
  NON-NEGATIVE for any ``|v| <= 2`` (unit-norm vectors have ``|v_d| <=
  1``), which matters because DuckDB's ``//`` truncates toward zero
  while Python/numpy floor — on non-negative operands the two agree.
  Offsetting all vectors by a constant leaves
  every pairwise distance unchanged and shifts centroids by exactly
  the same constant (integer mean of shifted values = shifted integer
  mean because the offset times the member count divides exactly).
* Init: the ``k`` quantized vectors with the smallest keys, cluster id
  = rank of the key among them (deterministic, sample-free).
* Assignment: argmin over exact int64 squared L2; ties go to the
  lowest cluster id (numpy argmin's first-minimum rule == the SQL
  ``ORDER BY dist, k LIMIT 1``).
* Update: per-dim ``sum // count`` (truncating == flooring here);
  empty clusters keep their previous centroid.

Integer headroom: unit-norm inputs give ``q <= 3e6``; squared deltas
(offset-invariant) <= 4e12, summed over dim <= 2.6e14 for dim <= 64 —
inside int64.  Per-dim sums reach ``3e6 * n_members`` (int64-safe
below ~3e12 members per cluster); DuckDB promotes SUM(BIGINT) to
HUGEINT and
the engine's partial sums are per-batch then combined in Python ints,
so neither side wraps first.

Scale shape (ray_guide.md "Aggregation at scale"): each Lloyd round is
ONE ``map_batches`` pass with the current centroids broadcast via
``ray.put`` — a batch computes its assignments (k vectorized
``(V-c)^2`` row-sums, k is small) and emits k partial rows (member
count + per-dim int64 sums), so the driver combines ``k x n_blocks``
tiny rows per round and the corpus NEVER shuffles.  ``n_iters`` rounds
cost ``n_iters`` streaming scans of the input — the honest distributed
k-means price (callers may ``materialize()`` a pruned (key, vector)
projection first when the working set fits the object store).

Reference parity: the reference has no clustering operator; this is
part of the LLM-training-data family the brief adds (cluster-based
curation a la SemDeDup, Abbas et al. 2023, arXiv:2303.09540).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MICRO = 1_000_000
OFFSET = 2_000_000


def quantize_matrix(col: "pa.ChunkedArray | pa.Array | list") -> np.ndarray:
    """list<float> column -> (n, dim) non-negative int64 matrix under
    the module's quantization contract.  ``list_flatten`` (not
    ``.values``) so sliced/offset list arrays read the right window."""
    import pyarrow.compute as pc

    if not isinstance(col, (pa.ChunkedArray, pa.Array)):
        col = pa.array(col, type=pa.list_(pa.float32()))
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.int64)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // n
    q = np.floor(flat * MICRO + 0.5).astype(np.int64) + OFFSET
    out = q.reshape(n, dim)
    if out.min() < 0:
        raise ValueError(
            "kmeans quantization contract violated: negative quantized "
            "coordinate (inputs must satisfy |v| <= OFFSET/MICRO - 0.5)")
    return out


def _assign(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n,) argmin cluster ids, exact int64 distances, first-min ties."""
    n = V.shape[0]
    k = C.shape[0]
    d2 = np.empty((n, k), dtype=np.int64)
    for j in range(k):
        delta = V - C[j]
        d2[:, j] = np.einsum("ij,ij->i", delta, delta)
    return np.argmin(d2, axis=1)


def kmeans_fit(ds, *, vec_col: str = "embedding", key_col: str = "vec_id",
               k: int = 8, n_iters: int = 3) -> np.ndarray:
    """Run ``n_iters`` integer-exact Lloyd rounds; returns the (k, dim)
    int64 centroid matrix (micro-units, offset domain).

    Each round: broadcast centroids -> one streaming pass emitting k
    partial (count, per-dim sum) rows per block -> driver combine
    (k x n_blocks bounded rows).  Init is the k smallest-key vectors,
    found with a per-batch partial head (bounded collect)."""
    import ray

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def init_partial(batch: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(batch[key_col])[:k]
        return batch.take(idx).select([key_col, vec_col])

    seed = ds.map_batches(init_partial, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    if not seed:
        raise ValueError("kmeans_fit: empty input dataset")
    seed.sort(key=lambda r: r[key_col])
    seed = seed[:k]
    if len(seed) < k:
        raise ValueError(f"kmeans_fit: k={k} exceeds corpus size {len(seed)}")
    C = quantize_matrix(pa.array([r[vec_col] for r in seed],
                                 type=pa.list_(pa.float32())))
    dim = C.shape[1]

    for _ in range(n_iters):
        ref = ray.put(C)

        def partials(batch: pa.Table, _ref=ref, _k=k, _dim=dim) -> pa.Table:
            import ray as _ray

            Cc = _ray.get(_ref)
            V = quantize_matrix(batch[vec_col])
            if V.shape[0] == 0:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "count": pa.array([], pa.int64()),
                                 "sums": pa.array([], pa.list_(pa.int64()))})
            a = _assign(V, Cc)
            counts = np.bincount(a, minlength=_k).astype(np.int64)
            sums = np.zeros((_k, _dim), dtype=np.int64)
            for j in np.flatnonzero(counts):
                sums[j] = V[a == j].sum(axis=0)
            return pa.table({
                "k": pa.array(np.arange(_k, dtype=np.int64)),
                "count": pa.array(counts),
                "sums": pa.array(list(sums), pa.list_(pa.int64())),
            })

        # bounded collect: k rows per input block, two int64-ish columns
        rows = ds.map_batches(partials, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        for r in rows:
            counts[r["k"]] += r["count"]
            sums[r["k"]] += np.asarray(r["sums"], dtype=np.int64)
        nz = counts > 0
        newC = C.copy()
        newC[nz] = sums[nz] // counts[nz, None]   # non-negative: floor==trunc
        C = newC
    return C


def kmeans_assign(ds, centroids: np.ndarray, *, vec_col: str = "embedding",
                  key_col: str = "vec_id", keep_vec: bool = False):
    """Final assignment pass: Dataset (key_col, cluster[, vec_col]).
    Centroids ship once via ``ray.put`` and every task reads the same
    object-store copy (zero per-batch reshipping)."""
    import ray

    ref = ray.put(np.ascontiguousarray(centroids, dtype=np.int64))

    def assign(batch: pa.Table) -> pa.Table:
        import ray as _ray

        C = _ray.get(ref)
        V = quantize_matrix(batch[vec_col])
        a = (_assign(V, C) if V.shape[0] else
             np.zeros(0, dtype=np.int64)).astype(np.int64)
        cols = {key_col: batch[key_col], "cluster": pa.array(a)}
        if keep_vec:
            cols[vec_col] = batch[vec_col]
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def kmeans_labels(ds, *, vec_col: str = "embedding", key_col: str = "vec_id",
                  k: int = 8, n_iters: int = 3):
    """fit + assign convenience: Dataset (key_col, cluster)."""
    C = kmeans_fit(ds, vec_col=vec_col, key_col=key_col, k=k, n_iters=n_iters)
    return kmeans_assign(ds, C, vec_col=vec_col, key_col=key_col)


def oracle_kmeans_sql(*, table: str = "embeddings", key_col: str = "vec_id",
                      vec_col: str = "embedding", dim: int, k: int = 8,
                      n_iters: int = 3, source_cte: str | None = None) -> str:
    """The chained-CTE DuckDB query reproducing :func:`kmeans_labels`
    bit-for-bit (see module docstring for why the integer contract
    makes this possible).  ``source_cte`` optionally replaces the base
    table with an inline CTE body (``SELECT key, vec ...``) so planted-
    fixture oracles can augment the corpus."""
    src = f"({source_cte})" if source_cte else table
    ctes = [
        # unnest to (vid, d, v) under the exact quantization contract
        f"""vm AS (
  SELECT {key_col} AS vid, CAST(r.d AS INT) AS d,
         CAST(floor(CAST({vec_col}[CAST(r.d AS INT) + 1] AS DOUBLE)
                    * {MICRO} + 0.5) AS BIGINT) + {OFFSET} AS v
  FROM {src}, range({dim}) r(d))""",
        f"""init AS (
  SELECT vid FROM (SELECT DISTINCT vid FROM vm) ORDER BY vid LIMIT {k})""",
        f"""c0 AS (
  SELECT CAST(dense_rank() OVER (ORDER BY vid) - 1 AS BIGINT) AS ck, d, v AS c
  FROM vm WHERE vid IN (SELECT vid FROM init))""",
    ]
    for i in range(1, n_iters + 1):
        prev = f"c{i - 1}"
        ctes.append(f"""a{i} AS (
  SELECT vm.vid, c.ck FROM vm JOIN {prev} c ON vm.d = c.d
  GROUP BY vm.vid, c.ck
  QUALIFY row_number() OVER (PARTITION BY vm.vid
    ORDER BY SUM((vm.v - c.c) * (vm.v - c.c)), c.ck) = 1)""")
        ctes.append(f"""c{i} AS (
  SELECT p.ck, p.d, CAST(COALESCE(s.nc, p.c) AS BIGINT) AS c
  FROM {prev} p LEFT JOIN (
    SELECT a.ck, vm.d, CAST(SUM(vm.v) // COUNT(*) AS BIGINT) AS nc
    FROM a{i} a JOIN vm ON a.vid = vm.vid
    GROUP BY a.ck, vm.d) s ON p.ck = s.ck AND p.d = s.d)""")
    fin = n_iters + 1
    ctes.append(f"""a{fin} AS (
  SELECT vm.vid, c.ck FROM vm JOIN c{n_iters} c ON vm.d = c.d
  GROUP BY vm.vid, c.ck
  QUALIFY row_number() OVER (PARTITION BY vm.vid
    ORDER BY SUM((vm.v - c.c) * (vm.v - c.c)), c.ck) = 1)""")
    return ("WITH " + ",\n".join(ctes) +
            f"\nSELECT vid AS {key_col}, ck AS cluster FROM a{fin}")
