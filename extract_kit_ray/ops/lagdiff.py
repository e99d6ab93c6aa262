"""Period-over-period deltas: the distributed analog of
``n - LAG(n) OVER (PARTITION BY key ORDER BY period)`` restricted to
*adjacent* periods (prev = period - 1), which keeps the semantics a
pure equi-join instead of a window scan.

Shape: ONE corpus shuffle builds the (key, period) count table (with
map-side per-batch combine so the shuffle moves one row per distinct
(key, period) per batch); the prev-period attach is broadcast when the
count table is small (the common case: days x event types), else an
int64-keyed left join of the table onto itself shifted by one period.

Adjacent-period (not previous-row) semantics are deliberate: LAG over
a sparse period axis returns the previous EXISTING period, which makes
the result depend on global density; prev = period - 1 is row-local,
deterministic, and what a monitoring rollup actually wants (a missing
yesterday IS a NULL, not a silent skip to last week).  The oracle
spells the same self-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .rayfix import arrow_blocks


DAY_US = 86_400_000_000


def daily_counts(ds, *, key_col: str, ts_col: str, day_alias: str = "day",
                 n_alias: str = "n", bucket_us: int = DAY_US):
    """Timestamped rows -> one row per (key, epoch-day): int64 counts,
    map-side combined (the shared front half of period_over_period)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # normalize the unit first: a ns-resolution source cast
        # straight to int64 would yield nanoseconds and shift every day
        us = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({key_col: batch[key_col].to_pandas(),
                           day_alias: us // bucket_us})
        out = (df.groupby([key_col, day_alias], as_index=False, sort=False)
               .size().rename(columns={"size": "__c"}))
        return pa.table({
            key_col: pa.Array.from_pandas(out[key_col]),
            day_alias: pa.array(out[day_alias].to_numpy(np.int64),
                                pa.int64()),
            "__c": pa.array(out["__c"].to_numpy(np.int64), pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby([key_col, day_alias])
            .aggregate(Sum("__c", alias_name=n_alias)))


def oracle_daily_counts_sql(rows_sql: str, *, key_col: str, ts_col: str,
                            day_alias: str = "day", n_alias: str = "n",
                            bucket_us: int = DAY_US) -> str:
    """DuckDB mirror of :func:`daily_counts`."""
    return (f"SELECT {key_col}, CAST(epoch_us({ts_col}) AS BIGINT) "
            f"// {bucket_us} AS {day_alias}, "
            f"CAST(COUNT(*) AS BIGINT) AS {n_alias} "
            f"FROM ({rows_sql}) GROUP BY 1, 2")


def period_over_period(ds, *, key_col: str, period_col: str,
                       n_alias: str = "n", prev_alias: str = "prev_n",
                       delta_alias: str = "delta",
                       broadcast_max: int | None = None,
                       num_partitions: int | None = None):
    """Dataset of rows carrying int64 ``period_col`` -> one row per
    (key, period): count, previous-period count (NULL if absent), delta."""
    from ray.data.aggregate import Sum

    from ..config import broadcast_max_rows, resolve_num_partitions

    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby([key_col, period_col], as_index=False, sort=False)
               .size().rename(columns={"size": "__c"}))
        out["__c"] = out["__c"].astype(np.int64)
        return out

    counts = (arrow_blocks(ds.map_batches(partial, batch_format="pandas"))
              .groupby([key_col, period_col])
              .aggregate(Sum("__c", alias_name=n_alias))
              .materialize())

    n_rows = counts.count()
    if n_rows <= broadcast_max:
        import ray

        lut = counts.to_pandas()
        lut_idx = {(k, int(p)): int(n) for k, p, n in
                   zip(lut[key_col], lut[period_col], lut[n_alias])}
        ref = ray.put(lut_idx)

        def attach(df: pd.DataFrame, *, ref=ref) -> pa.Table:
            idx = ray.get(ref)
            prev = [idx.get((k, int(p) - 1)) for k, p in
                    zip(df[key_col], df[period_col])]
            n = df[n_alias].to_numpy(np.int64)
            delta = [int(c) - p if p is not None else None
                     for c, p in zip(n, prev)]
            # plain arrow int64-with-nulls, NOT pandas nullable Int64:
            # the contract hash is dtype-faithful and the oracle side
            # round-trips nullable BIGINT through float64
            return pa.table({
                key_col: pa.Array.from_pandas(df[key_col]),
                period_col: pa.array(df[period_col].to_numpy(np.int64),
                                     pa.int64()),
                n_alias: pa.array(n, pa.int64()),
                prev_alias: pa.array(prev, pa.int64()),
                delta_alias: pa.array(delta, pa.int64()),
            })

        return counts.map_batches(attach, batch_format="pandas")

    # large period table: left join onto itself shifted by one period
    def shift(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__next"] = out[period_col].astype(np.int64) + 1
        out = out.rename(columns={n_alias: prev_alias})
        return out[[key_col, "__next", prev_alias]]

    from .rayfix import typed_side

    shifted = counts.map_batches(shift, batch_format="pandas")
    joined = counts.join(typed_side(shifted), join_type="left_outer",
                         num_partitions=num_partitions,
                         on=(key_col, period_col),
                         right_on=(key_col, "__next"))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.cast(batch[n_alias], pa.int64())
        prev = pc.cast(batch[prev_alias], pa.int64())
        return pa.table({
            key_col: batch[key_col],
            period_col: pc.cast(batch[period_col], pa.int64()),
            n_alias: n,
            prev_alias: prev,
            delta_alias: pc.subtract_checked(n, prev),
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def oracle_period_over_period_sql(rows_sql: str, *, key_col: str,
                                  period_col: str, n_alias: str = "n",
                                  prev_alias: str = "prev_n",
                                  delta_alias: str = "delta") -> str:
    """DuckDB self-join mirror of :func:`period_over_period`."""
    return f"""
WITH c AS (
  SELECT {key_col}, {period_col}, CAST(COUNT(*) AS BIGINT) AS {n_alias}
  FROM ({rows_sql}) GROUP BY {key_col}, {period_col}
)
SELECT a.{key_col}, a.{period_col}, a.{n_alias},
       b.{n_alias} AS {prev_alias},
       a.{n_alias} - b.{n_alias} AS {delta_alias}
FROM c a LEFT JOIN c b
  ON b.{key_col} = a.{key_col} AND b.{period_col} = a.{period_col} - 1
"""
