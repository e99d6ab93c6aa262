"""Distributed as-of join: for each left row, the most recent right row
of the same key at-or-before (backward) / at-or-after (forward) its
timestamp — the lag / most-recent-prior-lookup family the Dataset API
has no primitive for (driver brief: custom operators, option (a):
composition of map_batches + groupby).

Shape: both sides tag + bucket on ``key % num_buckets`` and UNION into
one dataset (Ray Data has no two-sided co-group primitive; the union +
bucket groupby IS the co-partitioning).  Each bucket task splits by
side and runs ONE vectorized ``pandas.merge_asof`` over all its keys —
C-level, no per-key Python.

Partitioning assumptions (documented per the brief):
- bucket size ~ (|L| + |R|) / num_buckets must fit a worker heap —
  size num_buckets to the corpus, and salt hot keys upstream if one
  key dominates;
- keys are integral (hash to int upstream for string keys);
- timestamps are pinned to microseconds before the merge so pandas'
  datetime64 resolution can't drift between sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(
    left_ds,
    right_ds,
    *,
    key_col: str,
    ts_col: str,
    right_ts_out: str = "ts_prev",
    num_buckets: int = 32,
    allow_exact_matches: bool = True,
    direction: str = "backward",
):
    """left Dataset ⨝asof right Dataset -> left columns + ``right_ts_out``
    (the matched right timestamp, null when no match).

    Matches DuckDB ``ASOF LEFT JOIN ... ON l.key = r.key AND r.ts <= l.ts``
    for the default (backward, exact matches allowed).
    """
    left_schema = left_ds.schema()
    left_names = list(left_schema.names)
    left_types = {n: t for n, t in zip(left_schema.names, left_schema.types)}

    def tag(batch: pa.Table, side: int) -> pa.Table:
        keys = batch[key_col].to_numpy()
        cols = {
            "__side": pa.array(np.full(len(batch), side, dtype=np.int8)),
            "__bucket": pa.array((keys % num_buckets).astype(np.int32)),
            key_col: batch[key_col],
            ts_col: batch[ts_col],
        }
        for name in left_names:
            if name in (key_col, ts_col):
                continue
            if side == 0:
                cols[name] = batch[name]
            else:  # right side: null-fill the left-only columns
                cols[name] = pa.nulls(len(batch), left_types[name])
        return pa.table(cols)

    tagged = left_ds.map_batches(
        tag, fn_kwargs={"side": 0}, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right_ds.map_batches(
            tag, fn_kwargs={"side": 1}, batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[ts_col] = df[ts_col].astype("datetime64[us]")
        left = df[df["__side"] == 0].sort_values(ts_col, kind="mergesort")
        right = (
            df.loc[df["__side"] == 1, [key_col, ts_col]]
            .rename(columns={ts_col: right_ts_out})
            .sort_values(right_ts_out, kind="mergesort")
        )
        out = pd.merge_asof(
            left, right,
            left_on=ts_col, right_on=right_ts_out, by=key_col,
            direction=direction, allow_exact_matches=allow_exact_matches,
        )
        return out[left_names + [right_ts_out]]

    return tagged.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")
