"""Type co-engagement: for every pair of categories, how many users
touched BOTH — the bipartite user x category graph projected onto
categories (market-basket pair counts over a small category universe).

Shape: the category universe is discovered first (tiny distinct
aggregate, |C| categories -> |C| bits) and broadcast in the closure;
then ONE groupby makes (user, category) pairs globally distinct, ONE
groupby folds each user's categories into an int64 BITMASK (Sum over
distinct per-category bits == OR, because distinctness guarantees each
bit contributes once), and the |C|^2/2 pair counts reduce per batch
with vectorized mask tests — the pair expansion never rides a shuffle,
only |C|^2/2 partial-count rows per batch do.

Requires |C| <= 63 (int64 mask) — asserted loudly.  For larger
universes shard the mask; at that point the pair matrix itself is the
scale problem and a different sketch applies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def coengagement_pairs(events_ds, *, user_col: str, cat_col: str,
                       n_alias: str = "n_users"):
    """Dataset -> one row per unordered category pair (cat_a < cat_b):
    the number of distinct users seen with both."""
    from ray.data.aggregate import Count, Sum

    cats_tbl = (events_ds.groupby(cat_col)
                .aggregate(Count(alias_name="__c"))
                .take_all())
    cats = sorted(r[cat_col] for r in cats_tbl)
    if len(cats) > 63:
        raise ValueError(
            f"coengagement_pairs: {len(cats)} categories exceed the "
            "int64 bitmask (63); shard the mask")
    bit_of = {c: np.int64(1) << i for i, c in enumerate(cats)}

    distinct = (events_ds.groupby([user_col, cat_col])
                .aggregate(Count(alias_name="__c")))

    def add_bit(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            user_col: df[user_col],
            "__bit": df[cat_col].map(bit_of).astype(np.int64),
        })

    masks = (distinct.map_batches(add_bit, batch_format="pandas")
             .groupby(user_col)
             .aggregate(Sum("__bit", alias_name="__mask")))

    pair_list = [(a, b) for i, a in enumerate(cats)
                 for b in cats[i + 1:]]
    if not pair_list:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            n_alias: pa.array([], pa.int64())}))
    pair_masks = np.array([int(bit_of[a] | bit_of[b])
                           for a, b in pair_list], np.int64)

    def partial_counts(df: pd.DataFrame) -> pa.Table:
        m = df["__mask"].to_numpy(np.int64)
        # |C|^2/2 x batch vectorized containment test
        both = (m[None, :] & pair_masks[:, None]) == pair_masks[:, None]
        n = both.sum(axis=1).astype(np.int64)
        return pa.table({
            "type_a": pa.array([a for a, _ in pair_list], pa.string()),
            "type_b": pa.array([b for _, b in pair_list], pa.string()),
            n_alias: pa.array(n, pa.int64()),
        })

    summed = (masks.map_batches(partial_counts, batch_format="pandas")
              .groupby(["type_a", "type_b"])
              .aggregate(Sum(n_alias, alias_name=n_alias)))

    def drop_zero(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch[n_alias], 0))

    return summed.map_batches(drop_zero, batch_format="pyarrow",
                              zero_copy_batch=True)


def oracle_coengagement_sql(rows_sql: str, *, user_col: str,
                            cat_col: str, n_alias: str = "n_users") -> str:
    """DuckDB mirror of :func:`coengagement_pairs`."""
    return f"""
WITH ut AS (SELECT DISTINCT {user_col} AS u, {cat_col} AS c
            FROM ({rows_sql}))
SELECT a.c AS type_a, b.c AS type_b, CAST(COUNT(*) AS BIGINT) AS {n_alias}
FROM ut a JOIN ut b ON a.u = b.u AND a.c < b.c
GROUP BY a.c, b.c
"""
