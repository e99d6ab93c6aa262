"""Distributed within-group rank — ``RANK() OVER (PARTITION BY g
ORDER BY v)`` without ever sorting the corpus.

The quality-gating primitive: "where does this page sit among its
domain's pages" powers percentile cuts, per-domain score calibration
and leaderboards.  A window function is a per-partition sort in SQL;
at corpus scale that is an all-to-all sort shuffle.  Rank only
depends on the per-group VALUE HISTOGRAM, so:

1. map-side combine: each batch reduces to (group, value, count)
   triples (vectorized pandas groupby) — the shuffle moves one row
   per distinct (g, v) per batch, never the corpus;
2. ``groupby(g, v)`` sums the partial counts (the only corpus-keyed
   shuffle);
3. histogram fold: triples get ``hash(g) % P`` buckets and ONE
   ``groupby(bucket).map_groups`` runs a vectorized
   sort + per-group cumsum over each bucket —
   ``rank(g, v) = 1 + sum(count of better values in g)``, plus the
   group size ``n_group`` from the same pass.  Buckets bound task
   count at P (:func:`config.default_num_partitions`), one pandas
   kernel per bucket, no per-group Python;
4. the (g, v) -> (rank, n_group) table re-attaches to the rows by
   broadcast pandas merge under ``config.broadcast_max_rows``
   (distinct values are often << rows) or a hash join above it.

Ties share a rank, SQL-RANK-style (next rank skips), because equal
values collapse into one histogram row.  Values must be integers
(int64-exact, hash-identical to the DuckDB window oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash128_batch_signed

from .rayfix import arrow_blocks


def _bucket_of(keys: pd.Series, num_buckets: int) -> np.ndarray:
    if keys.dtype == object or str(keys.dtype).startswith("string"):
        h1, _ = hash128_batch_signed(keys.tolist())
        return (h1.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
    return (keys.to_numpy().astype(np.uint64)
            % np.uint64(num_buckets)).astype(np.int64)


def rank_in_group(ds, *, group_col: str, value_col: str,
                  descending: bool = True,
                  rank_alias: str = "rank", size_alias: str = "n_group",
                  broadcast_max: int | None = None,
                  num_partitions: int | None = None):
    """Dataset -> the same rows plus ``rank_alias`` (SQL RANK within
    ``group_col`` by ``value_col``) and ``size_alias`` (group size)."""
    from ray.data.aggregate import Sum

    from ..config import broadcast_max_rows, resolve_num_partitions

    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby([group_col, value_col], as_index=False, sort=False)
               .size().rename(columns={"size": "__c"}))
        out["__c"] = out["__c"].astype(np.int64)
        return out

    counts = (arrow_blocks(ds.map_batches(partial, batch_format="pandas"))
              .groupby([group_col, value_col])
              .aggregate(Sum("__c", alias_name="__c")))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (_bucket_of(df[group_col], num_partitions)
                          if len(df) else
                          pd.Series([], dtype=np.int64))
        return df

    def bucket_fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.drop(columns=["__bucket"])
        df = df.sort_values([group_col, value_col],
                            ascending=[True, not descending],
                            kind="mergesort")
        c = df["__c"].to_numpy()
        cum = df.groupby(group_col, sort=False)["__c"].cumsum().to_numpy()
        df[rank_alias] = (cum - c + 1).astype(np.int64)
        df[size_alias] = (df.groupby(group_col, sort=False)["__c"]
                          .transform("sum").to_numpy().astype(np.int64))
        return df.drop(columns=["__bucket", "__c"])

    ranks = (counts.map_batches(add_bucket, batch_format="pandas")
             .groupby("__bucket")
             .map_groups(bucket_fold, batch_format="pandas")
             .materialize())

    n_ranks = ranks.count()
    if n_ranks <= broadcast_max:
        import ray

        ref = ray.put(ranks.to_pandas())

        def attach(df: pd.DataFrame, *, ref=ref) -> pd.DataFrame:
            lut = ray.get(ref)
            return df.merge(lut, on=[group_col, value_col], how="left")

        return ds.map_batches(attach, batch_format="pandas")
    from .rayfix import typed_side

    # typed_side: the map_groups output can carry schema-less empty
    # blocks that poison the hash join (see ops/rayfix.py)
    return ds.join(typed_side(ranks), join_type="inner",
                   num_partitions=num_partitions,
                   on=(group_col, value_col))


def oracle_rank_sql(rows_sql: str, *, group_col: str, value_col: str,
                    descending: bool = True, rank_alias: str = "rank",
                    size_alias: str = "n_group",
                    select: str = "*") -> str:
    """DuckDB window mirror of :func:`rank_in_group`."""
    direction = "DESC" if descending else "ASC"
    return (f"SELECT {select}, CAST(RANK() OVER (PARTITION BY {group_col} "
            f"ORDER BY {value_col} {direction}) AS BIGINT) AS {rank_alias}, "
            f"CAST(COUNT(*) OVER (PARTITION BY {group_col}) AS BIGINT) "
            f"AS {size_alias} FROM ({rows_sql})")
