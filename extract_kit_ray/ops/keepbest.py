"""Distributed group-wise argmax: keep ONE best row per key.

The canonical-selection shape every crawl pipeline needs: many captures
of the same logical page (URL spellings, re-crawls, mirrors) and a
quality ordering — keep the best capture, not the first one seen.
`keep-latest-per-key` (driver.q_latest_event_per_user) is the
``order_cols=[ts]`` special case of this operator; here the rule is
generic (any column list, per-column direction).

Scale shape — the textbook two-level reduce, no global sort:

1. map-side combine: each input batch reduces to at most ONE row per
   distinct key in it (vectorized pandas sort + drop_duplicates), so
   the shuffle moves <= n_batches x keys-per-batch rows, never the raw
   table;
2. bucket shuffle: survivors get ``hash(key) % num_buckets`` and ONE
   ``groupby(bucket)`` folds each bucket with the same vectorized
   reduction.  Buckets (default ``config.default_num_partitions()``)
   keep the group count bounded — a per-key ``map_groups`` would
   schedule one task per distinct URL.

Determinism contract: ``order_cols`` must be a TOTAL order within each
key (append the key of the row itself — e.g. doc_id — as the last
order column), otherwise ties are resolved by engine block order and
the result is not stable.  With a total order the winner is unique, so
the operator is exactly mirrorable by SQL
``QUALIFY row_number() OVER (PARTITION BY key ORDER BY ...) = 1``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.hashing import hash128_batch_signed


def _fold_factory(key_col: str, order_cols: list[str],
                  ascending: list[bool]):
    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        # mergesort = stable; with a total order per key stability is
        # belt-and-braces, not load-bearing
        df = df.sort_values(order_cols, ascending=ascending,
                            kind="mergesort")
        return df.drop_duplicates(subset=[key_col], keep="first")

    return fold


def keep_best(ds, *, key_col: str, order_cols: list[str],
              descending: list[bool] | bool = True,
              num_buckets: int | None = None):
    """One row per ``key_col`` value: the first under ``order_cols``
    sorted by ``descending`` (per-column or one flag for all).  Keys
    may be strings (URLs) or ints; string keys are bucketed by the
    corpus-wide blake2b hash, never Python ``hash``."""
    from ..config import resolve_num_partitions

    if isinstance(descending, bool):
        descending = [descending] * len(order_cols)
    if len(descending) != len(order_cols):
        raise ValueError("descending must match order_cols")
    ascending = [not d for d in descending]
    num_buckets = resolve_num_partitions(num_buckets)
    fold = _fold_factory(key_col, list(order_cols), ascending)

    partial = ds.map_batches(fold, batch_format="pandas")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col]
        if len(df) == 0:
            df = df.copy()
            df["__bucket"] = pd.Series([], dtype=np.int64)
            return df
        if keys.dtype == object or str(keys.dtype).startswith("string"):
            h1, _h2 = hash128_batch_signed(keys.tolist())
            b = h1.view(np.uint64) % np.uint64(num_buckets)
        else:
            b = keys.to_numpy().astype(np.uint64) % np.uint64(num_buckets)
        df = df.copy()
        df["__bucket"] = b.astype(np.int64)
        return df

    return (partial.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(fold, batch_format="pandas")
            .drop_columns(["__bucket"]))
