"""Ratio-to-report: each subgroup's share of its parent group total,
in integer basis points — the distributed analog of
``n / SUM(n) OVER (PARTITION BY g)``.

Float shares are not reproducible across engines (division order), so
the share is ``n * 10_000 // n_group`` in exact int64 — hash-identical
to the BIGINT window oracle by construction.

Scale shape: ONE corpus-keyed (g, sub) count shuffle with map-side
combine; the parent totals are a second groupby over the already-tiny
(g, sub) table (not the corpus) re-attached broadcast-or-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .rayfix import arrow_blocks


def share_of_group(ds, *, group_col: str, sub_col: str,
                   n_alias: str = "n", total_alias: str = "n_group",
                   share_alias: str = "share_bps",
                   broadcast_max: int | None = None,
                   num_partitions: int | None = None):
    """Dataset -> one row per (group, sub): count, parent-group total,
    integer basis-point share."""
    from ray.data.aggregate import Sum

    from ..config import broadcast_max_rows, resolve_num_partitions

    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby([group_col, sub_col], as_index=False, sort=False)
               .size().rename(columns={"size": "__c"}))
        out["__c"] = out["__c"].astype(np.int64)
        return out

    counts = (arrow_blocks(ds.map_batches(partial, batch_format="pandas"))
              .groupby([group_col, sub_col])
              .aggregate(Sum("__c", alias_name=n_alias))
              .materialize())

    totals = (counts.groupby(group_col)
              .aggregate(Sum(n_alias, alias_name=total_alias))
              .materialize())

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        n = df[n_alias].to_numpy(np.int64)
        tot = df[total_alias].to_numpy(np.int64)
        df[share_alias] = n * 10_000 // tot
        return df[[group_col, sub_col, n_alias, total_alias, share_alias]]

    if totals.count() <= broadcast_max:
        import ray

        ref = ray.put(totals.to_pandas())

        def attach(df: pd.DataFrame, *, ref=ref) -> pd.DataFrame:
            return finish(df.merge(ray.get(ref), on=group_col, how="inner"))

        return counts.map_batches(attach, batch_format="pandas")

    from .rayfix import typed_side

    joined = counts.join(typed_side(totals), join_type="inner",
                         num_partitions=num_partitions, on=(group_col,))
    return joined.map_batches(finish, batch_format="pandas")


def oracle_share_sql(rows_sql: str, *, group_col: str, sub_col: str,
                     n_alias: str = "n", total_alias: str = "n_group",
                     share_alias: str = "share_bps") -> str:
    """DuckDB window mirror of :func:`share_of_group`."""
    return f"""
WITH c AS (
  SELECT {group_col}, {sub_col}, CAST(COUNT(*) AS BIGINT) AS {n_alias}
  FROM ({rows_sql}) GROUP BY {group_col}, {sub_col}
)
SELECT {group_col}, {sub_col}, {n_alias},
       CAST(SUM({n_alias}) OVER (PARTITION BY {group_col}) AS BIGINT)
         AS {total_alias},
       CAST({n_alias} * 10000 //
            SUM({n_alias}) OVER (PARTITION BY {group_col}) AS BIGINT)
         AS {share_alias}
FROM c
"""
