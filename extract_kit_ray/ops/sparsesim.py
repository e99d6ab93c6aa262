"""Pairwise dot products of sparse count vectors via an item-keyed
join — "how similar are two sources' vocabularies" without ever
materializing a dense matrix.

Input is the sparse representation itself: (key, item, weight) rows.
Every item's posting list expands to its key-pairs locally inside ONE
groupby(item) (the inverted-index join), and pair partials reduce in a
second small groupby.  This is the standard IR trick: only items
shared by two keys contribute, so the shuffle carries
sum_item |postings(item)|^2 pair rows — bounded by capping either the
item universe (the demo caps to the global top-T terms) or the posting
length, both of which the caller controls.

Integer weights -> integer dots -> hash-exact SQL mirror (a self-join
on item).  Dot products, not cosine: the normalization divides two
exact integers into a float, which is the caller's (driver-side,
display-only) business.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sparse_pair_dots(counts_ds, *, key_col: str, item_col: str,
                     weight_col: str, dot_alias: str = "dot",
                     posting_cap: int = 10_000):
    """(key, item, weight) Dataset -> one row per unordered key pair
    with a shared item: (key_a, key_b, dot).  ``posting_cap`` bounds
    the per-item pair expansion loudly (a 10^6-key posting would emit
    5*10^11 pairs — that is a different algorithm's job)."""
    from ray.data.aggregate import Sum

    def expand(df: pd.DataFrame) -> pa.Table:
        ks = df[key_col].to_numpy()
        ws = df[weight_col].to_numpy(np.int64)
        if len(ks) > posting_cap:
            raise ValueError(
                f"sparse_pair_dots: posting list of {len(ks)} keys for "
                f"item {df[item_col].iloc[0]!r} exceeds cap {posting_cap}")
        order = np.argsort(ks, kind="stable")
        ks, ws = ks[order], ws[order]
        i, j = np.triu_indices(len(ks), k=1)
        return pa.table({
            "key_a": pa.array(ks[i]),
            "key_b": pa.array(ks[j]),
            "__p": pa.array(ws[i] * ws[j], pa.int64()),
        })

    pairs = (counts_ds.groupby(item_col)
             .map_groups(expand, batch_format="pandas"))
    return (pairs.groupby(["key_a", "key_b"])
            .aggregate(Sum("__p", alias_name=dot_alias)))


def oracle_sparse_dots_sql(counts_sql: str, *, key_col: str,
                           item_col: str, weight_col: str,
                           dot_alias: str = "dot") -> str:
    """DuckDB self-join mirror of :func:`sparse_pair_dots`."""
    return f"""
WITH c AS ({counts_sql})
SELECT a.{key_col} AS key_a, b.{key_col} AS key_b,
       CAST(SUM(CAST(a.{weight_col} AS BIGINT) * b.{weight_col})
            AS BIGINT) AS {dot_alias}
FROM c a JOIN c b
  ON a.{item_col} = b.{item_col} AND a.{key_col} < b.{key_col}
GROUP BY a.{key_col}, b.{key_col}
"""
