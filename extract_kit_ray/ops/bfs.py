"""Multi-source BFS hop labeling over a link graph — "crawl depth from
the seed list", the frontier-expansion companion to ops/pagerank.py /
ops/hits.py in the iterative-graph family.

Semantics: given directed edges (src, dst) and a seed node set, label
every node reachable within ``max_hops`` steps with its shortest hop
count from ANY seed (multi-source BFS).  Unreached nodes are absent
from the output — the caller left-joins against its key universe if it
wants an explicit "unreached" marker.

Shape per round: ONE inner join (edges x current frontier, int64 keys
only) + ONE groupby-distinct to collapse the new frontier.  Candidate
levels accumulate as narrow (node, hop) rows and a single final
groupby-min resolves the shortest hop, so there is no per-round
anti-join against the visited set.  At small fixed K (crawl-depth
labeling is K<=4 in practice) this trades a bounded amount of frontier
regrowth through cycles for K fewer all-to-all exchanges — Dataset
joins carry per-partition aggregator-actor fixed cost (the
ops/components.py lesson), so fewer exchanges wins.  For large K or
high-cycle graphs, prune each frontier against the accumulated levels
(broadcast under config.broadcast_max_rows, anti-join above) before
the next expansion; the final groupby-min is correct either way.

Integer determinism: hop counts are exact int64 — no floats anywhere —
so the chained-CTE DuckDB oracle (:func:`oracle_bfs_sql`) matches
bit-for-bit by construction.

Scale shape: every exchange moves two-int64-column rows; edge and
frontier tables are hash-partitioned on the join key; the edge table
is materialized once and reused per round.  Non-negative node ids; -1
is the rayfix schema-seed sentinel.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .rayfix import seed_int64 as _seed


def _distinct_nodes(ds, col: str):
    """Project ``col`` -> distinct (node) Dataset, seeded for joins."""
    from ray.data.aggregate import Count

    return _seed(
        ds.map_batches(
            lambda b, c=col: pa.table({"node": pc.cast(b[c], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node").aggregate(Count(alias_name="_n"))
        .select_columns(["node"]),
        node=-1,
    )


def bfs_hops(edges_ds, seeds_ds, *, max_hops: int = 3,
             num_partitions: int | None = None,
             broadcast_max: int | None = None):
    """(src, dst) int64 edge Dataset + (node) seed Dataset ->
    (node, hop) Dataset: shortest hop count (0 for seeds) from any
    seed, for every node reachable within ``max_hops``.

    Two-tier PER ROUND on the current frontier's size (the ops/hits.py
    pattern, decided fresh each hop because frontiers grow): a
    frontier under :func:`config.broadcast_max_rows` fans via a
    ``ray.put`` node-set filter — one vectorized edge map, no join —
    while a larger one uses the hash join; either way the new frontier
    is collapsed by the same distributed groupby-distinct (never a
    driver collect), so a small seed set exploding into a huge
    frontier flips tiers mid-traversal automatically."""
    from ray.data.aggregate import Min

    from ..config import broadcast_max_rows, resolve_num_partitions

    if max_hops < 0:
        raise ValueError("bfs_hops: max_hops must be >= 0")
    num_partitions = resolve_num_partitions(num_partitions)
    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()

    edges_ds = edges_ds.materialize()  # reused every round
    frontier = _distinct_nodes(seeds_ds, "node").materialize()

    def at_hop(h: int):
        def tag(b: pa.Table) -> pa.Table:
            return pa.table({
                "node": pc.cast(b["node"], pa.int64()),
                "hop": pa.array([h] * b.num_rows, pa.int64()),
            })
        return tag

    levels = [frontier.map_batches(at_hop(0), batch_format="pyarrow",
                                   zero_copy_batch=True)]
    for h in range(1, max_hops + 1):
        if frontier.count() <= broadcast_max + 1:  # +1: schema sentinel
            import numpy as _np
            import ray as _ray

            fset = _np.sort(_np.array(
                [r["node"] for r in frontier.take_all()
                 if int(r["node"]) >= 0], dtype=_np.int64))
            ref = _ray.put(fset)

            def fan(b: pa.Table) -> pa.Table:
                import numpy as np
                import ray as _r

                keys = _r.get(ref)
                src = b["src"].to_numpy()
                if not len(keys):
                    keep = np.zeros(len(src), bool)
                else:
                    pos = np.minimum(np.searchsorted(keys, src),
                                     len(keys) - 1)
                    keep = keys[pos] == src
                return pa.table({"dst": pa.array(
                    b["dst"].to_numpy()[keep], pa.int64())})

            fanned = edges_ds.map_batches(fan, batch_format="pyarrow",
                                          zero_copy_batch=True)
        else:
            fanned = edges_ds.join(
                frontier, join_type="inner",
                num_partitions=num_partitions,
                on=("src",), right_on=("node",),
            )
        frontier = _distinct_nodes(fanned, "dst").materialize()
        levels.append(frontier.map_batches(at_hop(h), batch_format="pyarrow",
                                           zero_copy_batch=True))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return (
        out.groupby("node").aggregate(Min("hop", alias_name="hop"))
        .filter(expr="node >= 0")
    )


def oracle_bfs_sql(edges_sql: str, seeds_sql: str, *,
                   max_hops: int = 3) -> str:
    """Chained-CTE DuckDB mirror of :func:`bfs_hops`: one frontier CTE
    per hop (DISTINCT dst of the previous frontier's out-edges), then a
    UNION ALL of tagged levels resolved by MIN(hop) — identical
    set-then-min semantics, so hash-exact."""
    ctes = [
        f"edges AS ({edges_sql})",
        f"f0 AS (SELECT DISTINCT node FROM ({seeds_sql}))",
    ]
    for h in range(1, max_hops + 1):
        ctes.append(
            f"f{h} AS (SELECT DISTINCT e.dst AS node "
            f"FROM edges e JOIN f{h - 1} p ON p.node = e.src)")
    tagged = " UNION ALL ".join(
        f"SELECT node, {h} AS hop FROM f{h}" for h in range(max_hops + 1))
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT node, MIN(hop) AS hop FROM ({tagged}) GROUP BY node"
    )
