"""Per-key interval union — the gaps-and-islands primitive: merge a
key's overlapping [start, end) intervals into maximal "islands" and
report how many islands there are and how much time they cover.  This
is the session-coverage / user-active-time / crawl-window question
("how long was each user actually active, counting overlapping windows
once"), and the building block for SLA uptime, ad-exposure and
crawl-recency accounting.

Semantics: per key, intervals are totally ordered by ``(start, end)``;
an interval starts a new island iff its start is STRICTLY greater than
the running max of all previous ends for that key (touching intervals —
``start == prev_end`` — merge; exact-duplicate rows are idempotent, so
the order among them never matters and the result is hash-stable).
Output is one row per key: ``(key, n_islands, covered)`` with
``covered = sum over islands of (max_end - min_start)``.

Scale shape (the ops/transitions.py bucket-fold applied to intervals):

1. map-side projection to narrow ``(key, start, end)`` int64 triples —
   24 bytes/row rides the only shuffle, never the payload;
2. ``hash(key) % P`` bucket shuffle co-locates each key's intervals;
3. per-bucket vectorized sweep: one mergesort by ``(key, start,
   end)``, a C-level per-key cummax (pandas groupby), island starts
   from ONE shifted comparison, island extents gathered at island
   boundaries — no per-key Python loop.

Partitioning assumption (same as sessionize / running totals): one
key's intervals fit in a task.  Keys are users/domains — bounded per
key — while the number of keys is unbounded and spreads across P.

The DuckDB oracle is the classic gaps-and-islands window chain
(LAG-free variant: MAX(end) OVER previous rows), hash-exact because
the order is total up to idempotent duplicates and all arithmetic is
int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _fold(df: pd.DataFrame) -> pd.DataFrame:
    """One bucket's (k, s, e) rows -> per-key (key, n_islands, covered)."""
    if df.empty:
        return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                             "n_islands": pd.Series([], dtype=np.int64),
                             "covered": pd.Series([], dtype=np.int64)})
    df = df.sort_values(["k", "s", "e"], kind="mergesort")
    k = df["k"].to_numpy()
    s = df["s"].to_numpy()
    e = df["e"].to_numpy()
    # running max of end within key, inclusive of the current row
    cm = df.groupby("k", sort=False)["e"].cummax().to_numpy()
    new_key = np.empty(len(k), dtype=bool)
    new_key[0] = True
    new_key[1:] = k[1:] != k[:-1]
    prev_max = np.empty_like(cm)
    prev_max[1:] = cm[:-1]  # cummax over strictly-previous rows (same key)
    island_start = new_key | (s > prev_max)
    starts = np.flatnonzero(island_start)
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:] - 1
    ends[-1] = len(k) - 1
    islands = pd.DataFrame({"key": k[starts],
                            "len": cm[ends] - s[starts]})
    out = islands.groupby("key", sort=False).agg(
        n_islands=("len", "size"), covered=("len", "sum")).reset_index()
    return out.astype({"key": np.int64, "n_islands": np.int64,
                       "covered": np.int64})


def interval_union_per_key(ds, *, key_col: str, start_col: str,
                           end_col: str,
                           num_partitions: int | None = None):
    """(key, start, end) Dataset -> (key, n_islands, covered) Dataset.

    ``start_col`` / ``end_col`` must be int64 (callers integerize —
    epoch micros for time intervals); ``end >= start`` is assumed.
    """
    from ..config import resolve_num_partitions

    num_partitions = resolve_num_partitions(num_partitions)

    def project(batch: pa.Table) -> pa.Table:
        kid = batch[key_col].to_numpy()
        return pa.table({
            "k": pa.array(kid, pa.int64()),
            "s": batch[start_col].cast(pa.int64()),
            "e": batch[end_col].cast(pa.int64()),
            "__bucket": pa.array(
                (kid.astype(np.uint64) % np.uint64(num_partitions))
                .astype(np.int64), pa.int64()),
        })

    return (ds.map_batches(project, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(lambda df: _fold(df.drop(columns=["__bucket"])),
                        batch_format="pandas"))


def oracle_interval_union_sql(intervals_sql: str, *, key_col: str = "key",
                              start_col: str = "s",
                              end_col: str = "e") -> str:
    """DuckDB gaps-and-islands mirror of :func:`interval_union_per_key`.

    ``intervals_sql`` must yield int64 ``(key, start, end)`` columns
    named by the *_col args.
    """
    return f"""
WITH iv AS ({intervals_sql}),
w AS (
  SELECT {key_col} AS key, {start_col} AS s, {end_col} AS e,
         MAX({end_col}) OVER (
           PARTITION BY {key_col} ORDER BY {start_col}, {end_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM iv
),
f AS (
  SELECT key, s, e,
         CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni
  FROM w
),
g AS (
  SELECT key, s, e,
         SUM(ni) OVER (PARTITION BY key ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS isl
  FROM f
),
i AS (SELECT key, isl, MIN(s) AS s0, MAX(e) AS e1 FROM g GROUP BY 1, 2)
SELECT key, CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(e1 - s0) AS BIGINT) AS covered
FROM i GROUP BY key
"""
