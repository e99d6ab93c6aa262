"""Distributed range (interval-containment) join: each left row pairs
with every same-key right interval that contains its timestamp — the
band/interval-join family the Dataset API has no primitive for (driver
brief: custom operators, option (a): composition of map_batches +
groupby).  Inner-join semantics: a left row with no containing interval
is dropped; a row inside k intervals emits k pairs.

Shape (same co-partitioning as :mod:`.asof`): both sides tag + bucket
on ``key % num_buckets`` and UNION into one dataset, then one
``groupby(bucket).map_groups`` pass splits each bucket by side and runs
a vectorized ``pandas.merge`` on the key followed by a containment
filter — C-level, no per-key Python.

Partitioning assumptions (documented per the brief):
- bucket size ~ (|L| + |R|) / num_buckets must fit a worker heap;
  size num_buckets to the corpus and salt hot keys upstream;
- the per-key cross product |L_k| x |R_k| is materialized inside the
  bucket before the containment filter — right-side intervals per key
  must be bounded (telemetry windows, session bounds: dozens, not
  millions).  For unbounded intervals per key, pre-bucket BY TIME as
  well (interval chopping) before calling this;
- keys are integral (hash string keys upstream);
- timestamps are pinned to microseconds on both sides so pandas'
  datetime64 resolution can't drift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def range_join(
    left_ds,
    right_ds,
    *,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    num_buckets: int = 32,
    closed: str = "both",
):
    """left Dataset ⨝range right Dataset -> left columns + the matched
    interval's ``start_col``/``end_col``.

    ``closed``: "both" matches SQL ``ts BETWEEN start AND end``;
    "left" is the half-open ``start <= ts < end``.
    """
    if closed not in ("both", "left"):
        raise ValueError(f"closed must be 'both' or 'left', got {closed!r}")
    left_schema = left_ds.schema()
    left_names = list(left_schema.names)
    left_types = {n: t for n, t in zip(left_schema.names, left_schema.types)}
    right_schema = right_ds.schema()
    right_types = {n: t for n, t in zip(right_schema.names, right_schema.types)}

    def tag(batch: pa.Table, side: int) -> pa.Table:
        keys = batch[key_col].to_numpy()
        cols = {
            "__side": pa.array(np.full(len(batch), side, dtype=np.int8)),
            "__bucket": pa.array((keys % num_buckets).astype(np.int32)),
            key_col: batch[key_col],
        }
        n = len(batch)
        for name in left_names:
            if name == key_col:
                continue
            cols[name] = batch[name] if side == 0 else pa.nulls(n, left_types[name])
        for name in (start_col, end_col):
            cols[name] = batch[name] if side == 1 else pa.nulls(n, right_types[name])
        return pa.table(cols)

    tagged = left_ds.map_batches(
        tag, fn_kwargs={"side": 0}, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right_ds.map_batches(
            tag, fn_kwargs={"side": 1}, batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    out_names = left_names + [start_col, end_col]

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in (ts_col, start_col, end_col):
            df[c] = df[c].astype("datetime64[us]")
        left = df.loc[df["__side"] == 0, left_names]
        right = df.loc[df["__side"] == 1, [key_col, start_col, end_col]]
        m = left.merge(right, on=key_col)  # per-key cross product
        ge = m[ts_col] >= m[start_col]
        lt = (m[ts_col] <= m[end_col]) if closed == "both" else (
            m[ts_col] < m[end_col])
        return m.loc[ge & lt, out_names]

    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")
