"""Deterministic float->integer quantization for embedding QC: per-
group moments of quantized squared norms — the "are these vectors
actually unit-normalized / did a shard come in unscaled" check a
vector pipeline runs before indexing.

Float arithmetic is NOT cross-engine hashable in general (summation
order), but a PER-ELEMENT quantization is: ``q = floor(double(x) *
scale + 0.5)`` involves one IEEE-double multiply and add, bit-exact in
any engine, and everything after q is int64.  This is the same
integer-determinism discipline as ops/pagerank.py / ops/kmeans.py,
applied at the float boundary itself.

Scale shape: the list column flattens zero-copy (Arrow values buffer +
offsets -> ``np.add.reduceat``), one row of partials per (group) per
batch rides the only shuffle.  Row-level squared norms are bounded by
dim * (scale * max|x|)^2 — 64-dim unit-ish vectors at scale 1000 sit
near 1e9, leaving ~9 orders of int64 headroom for the corpus sum; the
per-batch guard raises past half the headroom.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_I64_MAX = 2**63 - 1


def quantized_norm_moments(ds, *, group_col: str, vec_col: str,
                           scale: int = 1000):
    """Dataset -> one row per group: n_vecs, sum/min/max of the
    quantized squared norm  sum_i floor(x_i * scale + 0.5)^2."""
    from ray.data.aggregate import Max, Min, Sum

    def _row_q2(col) -> np.ndarray:
        """Quantized squared-norm per row for any vector layout: Arrow
        list / large_list (parquet), fixed_size_list, or Ray's tensor
        extension (in-memory from_pandas)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if hasattr(col, "offsets"):            # list / large_list
            offsets = col.offsets.to_numpy(zero_copy_only=False)
            vals = col.values.to_numpy(zero_copy_only=False
                                       ).astype(np.float64)
            q = np.floor(vals * scale + 0.5).astype(np.int64)
            q2 = q * q
            starts = offsets[:-1]
            row = np.zeros(len(starts), np.int64)
            nonempty = offsets[1:] > starts
            if q2.size:
                row[nonempty] = np.add.reduceat(q2, starts[nonempty])
            return row
        if isinstance(col, pa.FixedSizeListArray):
            dim = col.type.list_size
            vals = col.values.to_numpy(zero_copy_only=False
                                       ).astype(np.float64)
            q = np.floor(vals * scale + 0.5).astype(np.int64)
            return (q * q).reshape(-1, dim).sum(axis=1)
        # Ray ArrowTensorArray / anything exposing a 2-D to_numpy
        arr = np.asarray(col.to_numpy(zero_copy_only=False),
                         dtype=np.float64)
        q = np.floor(arr * scale + 0.5).astype(np.int64)
        return (q * q).sum(axis=1).astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        row = _row_q2(batch[vec_col])
        if row.size and int(row.max()) > _I64_MAX // 2**20:
            raise OverflowError(
                "quantized_norm_moments: row norm too large for the "
                "corpus-sum headroom; lower scale")
        df = pd.DataFrame({group_col: batch[group_col].to_pandas(),
                           "q2": row})
        agg = df.groupby(group_col, as_index=False, sort=False).agg(
            n_vecs=("q2", "size"), sum_qnorm2=("q2", "sum"),
            min_qnorm2=("q2", "min"), max_qnorm2=("q2", "max"))
        return pa.table({
            group_col: pa.Array.from_pandas(agg[group_col]),
            "n_vecs": pa.array(agg["n_vecs"].to_numpy(np.int64)),
            "sum_qnorm2": pa.array(agg["sum_qnorm2"].to_numpy(np.int64)),
            "min_qnorm2": pa.array(agg["min_qnorm2"].to_numpy(np.int64)),
            "max_qnorm2": pa.array(agg["max_qnorm2"].to_numpy(np.int64)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(group_col)
            .aggregate(Sum("n_vecs", alias_name="n_vecs"),
                       Sum("sum_qnorm2", alias_name="sum_qnorm2"),
                       Min("min_qnorm2", alias_name="min_qnorm2"),
                       Max("max_qnorm2", alias_name="max_qnorm2")))


def oracle_quantized_norms_sql(rows_sql: str, *, group_col: str,
                               vec_col: str, scale: int = 1000) -> str:
    """DuckDB mirror: the identical per-element double->int64
    quantization spelled as nested list_transforms."""
    q = (f"list_transform({vec_col}, x -> "
         f"CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT))")
    return f"""
WITH per_row AS (
  SELECT {group_col},
         COALESCE(list_sum(list_transform({q}, y -> y * y)), 0) AS q2
  FROM ({rows_sql})
)
SELECT {group_col},
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(q2) AS BIGINT) AS sum_qnorm2,
       CAST(MIN(q2) AS BIGINT) AS min_qnorm2,
       CAST(MAX(q2) AS BIGINT) AS max_qnorm2
FROM per_row GROUP BY {group_col}
"""
