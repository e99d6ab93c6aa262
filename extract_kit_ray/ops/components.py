"""Distributed connected components over a candidate-pair Dataset —
the corpus-scale replacement for driver-side union-find in near-dup
clustering (ops/dedup.py documents the swap; this is the swap).

Algorithm: iterative min-label propagation.  Labels start as each key's
own id; every iteration each key takes the min label among itself and
its neighbors; monotone convergence in <= component-diameter iterations
(duplicate clusters are near-cliques from LSH banding, so diameter is
tiny).  Each iteration is one hash join (labels onto edge endpoints) and
one groupby-min — both shuffle only (key, label) int64 pairs, never
documents.

Convergence is detected by the sum-of-labels aggregate: labels only ever
decrease, so an unchanged sum IS the fixpoint — no driver-side diffing
of label tables.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min, Sum


def _edges_both_directions(pairs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    def expand(batch: pa.Table) -> pa.Table:
        a = batch["key_a"]
        b = batch["key_b"]
        return pa.table(
            {
                "src": pa.concat_arrays([pa.array(a.to_pylist(), pa.int64()),
                                         pa.array(b.to_pylist(), pa.int64())]),
                "dst": pa.concat_arrays([pa.array(b.to_pylist(), pa.int64()),
                                         pa.array(a.to_pylist(), pa.int64())]),
            }
        )

    return pairs_ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def connected_components(
    pairs_ds: "ray.data.Dataset",
    keys_ds: "ray.data.Dataset",
    *,
    key_col: str = "doc_id",
    max_iters: int = 25,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """(key_a, key_b) pair Dataset + key universe -> (key, cluster_rep).

    ``num_partitions`` sizes the join shuffle; at corpus scale set it to
    O(cluster cores).  Returns pandas because the label table is one row
    per key — the caller decides whether that is small enough to collect
    (minhash_lsh_dedup does; a 10^12-doc run would instead write it out).
    """
    all_keys = (
        keys_ds.map_batches(
            lambda b: pa.table({"key": pa.compute.cast(b[key_col], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .to_pandas()["key"]
    )

    if pairs_ds.count() == 0:
        df = pd.DataFrame({key_col: all_keys, "cluster_rep": all_keys})
        return df.sort_values(key_col).reset_index(drop=True)

    edges = _edges_both_directions(pairs_ds).materialize()

    # Iteration universe: edge-INCIDENT keys only.  A key with no edges
    # can never change label, so iterating over the full corpus label
    # table would do corpus-sized shuffle work per round for nothing —
    # the incident set is bounded by duplicate volume (the same
    # broadcastable-smallness assumption dedup's cluster map makes), so
    # each round's join + groupby-min touches only (dup-volume) rows.
    from ray.data.aggregate import Count

    incident = (
        edges.select_columns(["src"])
        .groupby("src").aggregate(Count(alias_name="n"))
        .to_pandas()["src"].astype("int64")
    )
    inc = pa.array(incident.to_numpy(), pa.int64())
    # arrow blocks, NOT from_pandas: a pandas-block dataset unioned with
    # the arrow-block message dataset breaks the aggregate's sort sampler
    labels = ray.data.from_arrow(
        pa.table({"key": inc, "label": inc})
    ).materialize()

    prev_sum: int | None = None
    for _ in range(max_iters):
        # neighbor messages: label of src delivered to dst
        joined = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("key",),
        )
        messages = joined.map_batches(
            lambda b: pa.table({"key": b["dst"], "label": b["label"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        candidates = messages.union(labels)
        labels = (
            candidates.groupby("key").aggregate(Min("label", alias_name="label"))
        ).materialize()
        total = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if total == prev_sum:
            break  # labels are monotone non-increasing -> fixpoint
        prev_sum = total

    lab_df = labels.to_pandas().rename(columns={"key": key_col, "label": "cluster_rep"})
    touched = set(lab_df[key_col])
    rest = all_keys[~all_keys.isin(touched)]
    df = pd.concat(
        [lab_df, pd.DataFrame({key_col: rest, "cluster_rep": rest})],
        ignore_index=True,
    )
    return df.sort_values(key_col).reset_index(drop=True)
