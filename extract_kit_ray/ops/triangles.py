"""Distributed per-node triangle counting over a link graph — the
classic MPC triangle-listing algorithm (Suri & Vassilvitskii, WWW'11:
degree-ordered wedge generation + edge join), in the same
integer-exact Ray Data shape as ops/pagerank.py / ops/hits.py.

Semantics: edges are taken as UNDIRECTED (canonicalized to a<b pairs,
self-loops dropped, duplicates collapsed); the output assigns every
node of at least one triangle its triangle-participation count (each
triangle increments all three corners).  Triangle-free nodes are
absent — callers left-join the key universe for explicit zeros.

Skew story (the reason this isn't a naive 3-way self-join): edges are
oriented from the endpoint of smaller (degree, node) rank to the
larger, so every wedge is generated at its lowest-degree corner and a
node's wedge fan-out is bounded by its ORIENTED out-degree, which is
O(sqrt(m)) for any graph (arboricity bound) — a 10^6-degree hub
generates no wedges at all unless its neighbors are themselves hubs.
The wedge->edge match is ONE hash join on a fused int64 pair key.

Exchanges: canonicalize (1 groupby-distinct) + degrees (1 groupby) +
2 orientation joins + 1 wedge groupby + 1 closing join + 1 count
groupby — all over two-or-three-int64-column rows; payloads never ride
the shuffles.

Integer determinism: counts are exact int64 set cardinalities — no
arithmetic beyond counting — so the DuckDB oracle
(:func:`oracle_triangles_sql`, canonical a<b<c three-way join) matches
hash-exact by construction.

Node ids must be non-negative and < 2^31 so the fused pair key
(a << 31 | b) stays inside int64 — guarded loudly per batch.  -1 is
the rayfix schema-seed sentinel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rayfix import seed_int64 as _seed

_MAX_ID = 1 << 31


def _check_ids(*arrs: np.ndarray) -> None:
    for a in arrs:
        if a.size and (int(a.min()) < 0 or int(a.max()) >= _MAX_ID):
            raise ValueError(
                "triangle_counts: node ids must be in [0, 2^31) for the "
                f"fused pair key (got min {int(a.min())}, max {int(a.max())})")


def _fuse(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int64) << 31) | b.astype(np.int64)


_WEDGE_BUCKETS = 32


def triangle_counts(edges_ds, *, num_partitions: int | None = None,
                    broadcast_max: int | None = None):
    """(src, dst) int64 edge Dataset -> (node, triangles) Dataset:
    per-node triangle participation over the undirected simple graph.

    Two-tier (the ops/hits.py pattern): the degree table is node-sized
    and the closing-edge key set is edge-sized — under
    :func:`config.broadcast_max_rows` both broadcast (degree dict into
    the orientation map, sorted key array into an ``isin`` filter) and
    the pipeline runs with ZERO joins; above it, the orientation
    attaches via two narrow joins and the wedge->edge match is the
    hash join.  Wedge generation is bucketed (u % B) either way, so
    map_groups pays per-BUCKET overhead, not per-apex."""
    from ray.data.aggregate import Count

    from ..config import broadcast_max_rows, resolve_num_partitions

    num_partitions = resolve_num_partitions(num_partitions)
    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy()
        d = batch["dst"].to_numpy()
        _check_ids(s, d)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        return pa.table({"pair": pa.array(np.unique(_fuse(a, b)), pa.int64())})

    # distinct undirected pairs via ONE groupby on the fused key
    und = _seed(
        edges_ds.map_batches(canon, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("pair").aggregate(Count(alias_name="_n"))
        .select_columns(["pair"]),
        pair=-1,
    ).materialize()

    def split(batch: pa.Table) -> pa.Table:
        p = batch["pair"].to_numpy()
        p = p[p >= 0]  # drop the schema-seed sentinel early
        return pa.table({"a": pa.array(p >> 31, pa.int64()),
                         "b": pa.array(p & (_MAX_ID - 1), pa.int64())})

    und_ab = und.map_batches(split, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        return pa.table({"node": pa.array(np.concatenate([a, b]), pa.int64())})

    deg = _seed(
        und_ab.map_batches(endpoints, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("node").aggregate(Count(alias_name="deg")),
        node=-1, deg=0,
    ).materialize()

    n_nodes = deg.count()
    n_edges = und_ab.count()
    bcast = max(n_nodes, n_edges) <= broadcast_max

    # orient each edge from the smaller (deg, node) rank to the larger
    def orient(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        da = batch["deg_a"].to_numpy()
        db = batch["deg_b"].to_numpy()
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        dv = np.where(a_first, db, da)
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "deg_v": pa.array(dv, pa.int64())})

    if bcast:
        # broadcast tier: sorted (node, deg) arrays attach degrees with
        # two searchsorted gathers — no joins
        import ray as _ray

        dd = deg.filter(expr="node >= 0").to_pandas()
        nodes_arr = dd["node"].to_numpy(dtype=np.int64)
        order = np.argsort(nodes_arr)
        deg_ref = _ray.put((nodes_arr[order],
                            dd["deg"].to_numpy(dtype=np.int64)[order]))

        def attach_deg(batch: pa.Table) -> pa.Table:
            import ray as _r

            keys, degs = _r.get(deg_ref)
            a = batch["a"].to_numpy()
            b = batch["b"].to_numpy()
            da = degs[np.searchsorted(keys, a)]
            db = degs[np.searchsorted(keys, b)]
            return orient(pa.table({
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "deg_a": pa.array(da, pa.int64()),
                "deg_b": pa.array(db, pa.int64())}))

        oriented = und_ab.map_batches(attach_deg, batch_format="pyarrow",
                                      zero_copy_batch=True).materialize()
    else:
        def deg_as(na: str, dcol: str):
            def f(batch: pa.Table) -> pa.Table:
                return pa.table({na: batch["node"], dcol: batch["deg"]})
            return f

        deg_a = deg.map_batches(deg_as("na", "deg_a"),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
        deg_b = deg.map_batches(deg_as("nb", "deg_b"),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
        eab = und_ab.join(deg_a, join_type="inner",
                          num_partitions=num_partitions,
                          on=("a",), right_on=("na",)) \
                    .join(deg_b, join_type="inner",
                          num_partitions=num_partitions,
                          on=("b",), right_on=("nb",))
        oriented = _seed(
            eab.map_batches(orient, batch_format="pyarrow",
                            zero_copy_batch=True),
            u=-1, v=-1, deg_v=0,
        ).materialize()

    # wedge generation bucketed on apex % B: map_groups pays per-BUCKET
    # overhead; inside, a per-apex loop of tiny numpy slices
    def add_bucket(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy()
        return batch.append_column(
            "wbucket", pa.array((u % _WEDGE_BUCKETS).astype(np.int32)))

    def bucket_wedges(group: pa.Table) -> pa.Table:
        u = group["u"].to_numpy()
        v = group["v"].to_numpy()
        dv = group["deg_v"].to_numpy()
        keep = u >= 0
        u, v, dv = u[keep], v[keep], dv[keep]
        if not u.size:
            return pa.table({"wpair": pa.array([], pa.int64()),
                             "apex": pa.array([], pa.int64())})
        # neighbors sorted by rank within each apex so the wedge key
        # (lo, hi) matches the closing ORIENTED edge's fused key
        order = np.lexsort((v, dv, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        wp, ap = [], []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            i, j = np.triu_indices(k, k=1)
            wp.append(_fuse(v[s + i], v[s + j]))
            ap.append(np.full(i.size, u[s], dtype=np.int64))
        if not wp:
            return pa.table({"wpair": pa.array([], pa.int64()),
                             "apex": pa.array([], pa.int64())})
        return pa.table({
            "wpair": pa.array(np.concatenate(wp), pa.int64()),
            "apex": pa.array(np.concatenate(ap), pa.int64())})

    wedge_ds = _seed(
        oriented.map_batches(add_bucket, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("wbucket").map_groups(bucket_wedges,
                                       batch_format="pyarrow"),
        wpair=-1, apex=-1,
    )

    def corners(batch: pa.Table) -> pa.Table:
        w = batch["wpair"].to_numpy()
        apex = batch["apex"].to_numpy()
        keep = (w >= 0) & (apex >= 0)
        w, apex = w[keep], apex[keep]
        return pa.table({"node": pa.array(
            np.concatenate([apex, w >> 31, w & (_MAX_ID - 1)]), pa.int64())})

    if bcast:
        # closing-edge membership via a broadcast sorted key array
        import ray as _ray

        ok = oriented.to_pandas()
        okeys = np.sort(_fuse(ok["u"].to_numpy(dtype=np.int64),
                              ok["v"].to_numpy(dtype=np.int64)))
        okeys_ref = _ray.put(okeys[okeys >= 0])

        def close_filter(batch: pa.Table) -> pa.Table:
            import ray as _r

            keys = _r.get(okeys_ref)
            w = batch["wpair"].to_numpy()
            if not len(keys):
                return batch.filter(pa.array(np.zeros(len(w), bool)))
            pos = np.minimum(np.searchsorted(keys, w), len(keys) - 1)
            return batch.filter(pa.array(keys[pos] == w))

        tri = wedge_ds.map_batches(close_filter, batch_format="pyarrow",
                                   zero_copy_batch=True)
    else:
        # closing edges: fused oriented keys (rank order, NOT a<b order)
        def okey(batch: pa.Table) -> pa.Table:
            u = batch["u"].to_numpy()
            v = batch["v"].to_numpy()
            keep = u >= 0
            return pa.table({"wpair": pa.array(_fuse(u[keep], v[keep]),
                                               pa.int64())})

        closing = _seed(
            oriented.map_batches(okey, batch_format="pyarrow",
                                 zero_copy_batch=True),
            wpair=-1,
        )
        tri = wedge_ds.join(closing, join_type="inner",
                            num_partitions=num_partitions, on=("wpair",))

    return (
        tri.map_batches(corners, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node").aggregate(Count(alias_name="triangles"))
        .filter(expr="node >= 0")
    )


def oracle_triangles_sql(edges_sql: str) -> str:
    """DuckDB mirror of :func:`triangle_counts`: canonical a<b<c
    triangle listing over the deduplicated undirected edge set, then
    per-corner participation counts."""
    return (
        f"WITH edges AS ({edges_sql}), "
        "und AS (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM edges WHERE src <> dst), "
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
        "FROM und e1 JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b "
        "JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b), "
        "corners AS (SELECT x AS node FROM tri UNION ALL "
        "SELECT y FROM tri UNION ALL SELECT z FROM tri) "
        "SELECT node, COUNT(*) AS triangles FROM corners GROUP BY node"
    )
