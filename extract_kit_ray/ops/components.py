"""Distributed connected components over a candidate-pair Dataset —
the corpus-scale replacement for driver-side union-find in near-dup
clustering (ops/dedup.py documents the swap; this is the swap).

Algorithm: hash-to-min (Rastogi et al., "Finding Connected Components
in Map-Reduce in Logarithmic Rounds", ICDE 2013).  State is an
adjacency relation C(v) stored as (node, member) rows; every round is
ONE groupby(node): compute m = min(C(v)), send m to every member and
every member to m.  Converges in O(log d) rounds (near-dup clusters
are near-cliques from LSH banding, so 2-3 rounds in practice), after
which min(C(v)) is v's component minimum.  No joins — round-2 used
join + groupby-min + sum per iteration, and each Dataset.join carries
multi-second aggregator-actor fixed cost; hash-to-min does the same
work in a single shuffle per round.

Convergence is detected by the sum of per-node min labels: labels are
monotone non-increasing (v is a member of its own group, so it always
re-receives its current min), so an unchanged sum IS the fixpoint — no
driver-side diffing of label tables.

Scale shape: every round shuffles only (node, member) int64 pairs
bounded by O(edge volume) — documents never move.  The iteration
universe is edge-INCIDENT nodes only; untouched keys (no edges -> own
component) are completed at the end, broadcast-side under
config.broadcast_max_rows, else via a left_outer join of the key
universe onto the label table (one narrow corpus-wide exchange — the
output itself).  A 10^12-doc run keeps the result as a Dataset
(:func:`connected_components_ds`) and writes it out; the pandas
wrapper exists for the oracle/test contract.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min, Sum


def _init_adjacency(pairs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(key_a, key_b) pairs -> (node, member) rows: both directions plus
    self-loops, so every incident node is a group owner and re-receives
    its own min each round (the monotonicity the sum-check relies on)."""

    def expand(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch["key_a"], pa.int64())
        b = pc.cast(batch["key_b"], pa.int64())
        node = pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                                 for c in (a, b, a, b)])
        member = pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                                   for c in (b, a, a, b)])
        return pa.table({"node": node, "member": member})

    return pairs_ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def _round(adj: "ray.data.Dataset") -> "ray.data.Dataset":
    """One hash-to-min round: groupby(node) with a list-collect + min
    aggregate -> bucket rows (node, members, label).  Materialized so the
    label sum, the next adjacency, and the final label projection all
    read it without recompute."""
    from .dedup import _collect_agg

    return (
        adj.groupby("node")
        .aggregate(_collect_agg("member"), Min("member", alias_name="label"))
        .materialize()
    )


def _next_adjacency(buckets: "ray.data.Dataset") -> "ray.data.Dataset":
    def emit(batch: pa.Table) -> pa.Table:
        nodes: list[int] = []
        members: list[int] = []
        for node, mems, label in zip(batch["node"].to_pylist(),
                                     batch["members"].to_pylist(),
                                     batch["label"].to_pylist()):
            m = int(label)
            seen = set(mems)
            seen.add(int(node))
            for u in seen:
                nodes.append(int(u))
                members.append(m)   # min to all
                nodes.append(m)
                members.append(int(u))  # all to min
        df = pd.DataFrame({"node": nodes, "member": members}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return buckets.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


def connected_components_ds(
    pairs_ds: "ray.data.Dataset",
    keys_ds: "ray.data.Dataset",
    *,
    key_col: str = "doc_id",
    max_rounds: int = 16,
    num_partitions: int | None = None,
    broadcast_max: int | None = None,
) -> "ray.data.Dataset":
    """(key_a, key_b) pair Dataset + key universe -> Dataset
    (key_col, cluster_rep), fully distributed; consume with
    ``write_parquet`` at corpus scale."""
    from ..config import broadcast_max_rows, resolve_num_partitions

    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    keys_only = keys_ds.map_batches(
        lambda b, c=key_col: pa.table({c: pc.cast(b[c], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return keys_only.map_batches(
            lambda b, c=key_col: b.append_column("cluster_rep", b[c]),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    if n_pairs <= broadcast_max:
        # broadcast tier (the ops/hits.py pattern, same threshold): the
        # pair table is bounded by the broadcast cap, so a driver
        # union-find + one ray.put label map replaces the log-round
        # groupby iteration entirely; labels are min-of-component, the
        # identical contract hash-to-min converges to.  The keys
        # Dataset still only STREAMS through the attach map.
        import ray as _ray

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for r in pairs_ds.take_all():
            a, b = int(r["key_a"]), int(r["key_b"])
            for k in (a, b):
                if k not in parent:
                    parent[k] = k
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min keeps the representative the component
                # minimum without a second pass
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo

        label = {k: find(k) for k in parent}
        ref = _ray.put(label)

        def attach(b: pa.Table, c=key_col) -> pa.Table:
            import ray as _r

            m = _r.get(ref)
            ks = b[c].to_pylist()
            return pa.table({
                c: pa.array(ks, pa.int64()),
                "cluster_rep": pa.array([m.get(k, k) for k in ks],
                                        pa.int64()),
            })

        return keys_only.map_batches(attach, batch_format="pyarrow",
                                     zero_copy_batch=True)

    adj = _init_adjacency(pairs_ds)
    buckets = _round(adj)
    prev_sum = buckets.aggregate(Sum("label", alias_name="s"))["s"]
    converged = False
    for _ in range(max_rounds):
        buckets = _round(_next_adjacency(buckets))
        total = buckets.aggregate(Sum("label", alias_name="s"))["s"]
        if total == prev_sum:
            converged = True
            break  # labels are monotone non-increasing -> fixpoint
        prev_sum = total
    if not converged:
        # returning partial labels would silently split long-chain
        # components into wrong dedup clusters downstream — fail loudly
        # instead (round-3 ADVICE).  Hash-to-min needs O(log diameter)
        # rounds, so tripping this means a pathological graph, not a
        # normal corpus: rerun with a larger max_rounds.
        raise RuntimeError(
            f"connected components did not converge within {max_rounds} "
            f"rounds (label sum still changing: {prev_sum}); "
            "increase max_rounds")

    labels = buckets.map_batches(
        lambda b: pa.table({"node": b["node"], "cluster_rep": b["label"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    n_incident = labels.count()
    if n_incident <= broadcast_max:
        label_map = {int(r["node"]): int(r["cluster_rep"])
                     for r in labels.take_all()}

        def complete(batch: pa.Table, *, c=key_col) -> pa.Table:
            keys = [int(k) for k in batch[c].to_pylist()]
            reps = [label_map.get(k, k) for k in keys]
            return pa.table({c: pa.array(keys, pa.int64()),
                             "cluster_rep": pa.array(reps, pa.int64())})

        return keys_only.map_batches(complete, batch_format="pyarrow",
                                     zero_copy_batch=True)

    # label table too large to broadcast: one narrow left_outer join of
    # the key universe onto it (int64s only — the output exchange).
    # Schema-seed guard (ops/rayfix.py): labels derive from a bucket
    # aggregate; -1 never matches a real non-negative key
    from .rayfix import seed_int64

    joined = keys_only.join(
        seed_int64(labels, node=-1, cluster_rep=-1),
        join_type="left_outer", num_partitions=num_partitions,
        on=(key_col,), right_on=("node",),
    )

    def coalesce(batch: pa.Table, *, c=key_col) -> pa.Table:
        rep = pc.coalesce(batch["cluster_rep"], batch[c])
        return pa.table({c: batch[c], "cluster_rep": pc.cast(rep, pa.int64())})

    return joined.map_batches(coalesce, batch_format="pyarrow",
                              zero_copy_batch=True)


def connected_components(
    pairs_ds: "ray.data.Dataset",
    keys_ds: "ray.data.Dataset",
    *,
    key_col: str = "doc_id",
    max_iters: int = 16,
    num_partitions: int | None = None,
    broadcast_max: int | None = None,
) -> pd.DataFrame:
    """Collecting wrapper over :func:`connected_components_ds`: returns
    the (key, cluster_rep) label table as sorted pandas — one row per
    key, the caller's result contract (oracle/test scale).  A 10^12-doc
    run uses the Dataset variant and writes instead of collecting."""
    out = connected_components_ds(
        pairs_ds, keys_ds, key_col=key_col, max_rounds=max_iters,
        num_partitions=num_partitions, broadcast_max=broadcast_max,
    )
    df = out.to_pandas()
    return df.sort_values(key_col).reset_index(drop=True)
