"""Sliding-window document chunking — the "split every document into
fixed-size overlapping training windows" fan-out that precedes
tokenized-corpus writing (the complement of ops/packing.py, which
packs small docs UP to a capacity; this splits large docs DOWN).

Layout per document of size n (tokens), window W, stride S (<= W):

    n_chunks = 1 + ceil(max(n - W, 0) / S)
    chunk i covers [i*S, i*S + min(W, n - i*S))

so consecutive chunks overlap by W - S tokens, the final chunk may be
short, and every token is covered.  n = 0 still yields one empty
chunk (a doc never disappears — failure-as-data house style).

Scale shape: a pure streaming ``map_batches`` flat emit — NO shuffle,
no state.  The fan-out is fully vectorized (np.repeat + one
arange-minus-offsets pass); output rows are narrow int64 so a 20x
chunk multiplier does not move text bytes (join chunk spans back to
payloads downstream, where needed, by doc_id).

All arithmetic is int64-exact; the DuckDB oracle replays the same
closed form over ``unnest(range(...))``.

Relation to ``driver.q_chunk_docs`` / ops/textops.chunk_batch: that
path MATERIALIZES word-window text (chunk rows carry the payload);
this one plans SPANS ONLY from a size column — at 100 TB you plan
spans first (narrow, groupable, joinable) and slice text once at the
final write, instead of multiplying payload bytes through the
pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def chunk_spans(ds, *, key_col: str = "doc_id", size_col: str,
                window: int, stride: int | None = None):
    """Dataset -> (key, chunk_id, start_tok, len_tok) Dataset with one
    row per sliding window (see module docstring)."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if stride is None:
        stride = window
    if not 1 <= stride <= window:
        raise ValueError(f"stride must be in [1, window], got {stride}")

    def fanout(batch: pa.Table) -> pa.Table:
        n = batch[size_col].to_numpy().astype(np.int64)
        if len(n) and int(n.min()) < 0:
            raise ValueError(f"chunk_spans: {size_col} has negative sizes")
        nc = 1 + (np.maximum(n - window, 0) + stride - 1) // stride
        total = int(nc.sum())
        key_rep = np.repeat(batch[key_col].to_numpy(), nc)
        n_rep = np.repeat(n, nc)
        offsets = np.repeat(np.cumsum(nc) - nc, nc)
        chunk_id = np.arange(total, dtype=np.int64) - offsets
        start = chunk_id * stride
        length = np.minimum(window, n_rep - start)
        return pa.table({
            key_col: pa.array(key_rep, pa.int64()),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "start_tok": pa.array(start, pa.int64()),
            "len_tok": pa.array(length, pa.int64()),
        })

    return ds.map_batches(fanout, batch_format="pyarrow",
                          zero_copy_batch=True)


def oracle_chunks_sql(rows_sql: str, *, key_col: str = "doc_id",
                      size_col: str, window: int,
                      stride: int | None = None) -> str:
    """DuckDB mirror of :func:`chunk_spans`."""
    if stride is None:
        stride = window
    return f"""
WITH d AS (
  SELECT {key_col}, CAST({size_col} AS BIGINT) AS n,
         1 + (GREATEST(CAST({size_col} AS BIGINT) - {window}, 0)
              + {stride} - 1) // {stride} AS nc
  FROM ({rows_sql})
), f AS (
  SELECT {key_col}, n, unnest(range(0, nc)) AS chunk_id FROM d
)
SELECT {key_col}, chunk_id, chunk_id * {stride} AS start_tok,
       LEAST({window}, n - chunk_id * {stride}) AS len_tok
FROM f
"""
