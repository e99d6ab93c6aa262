"""Per-key running totals — ``SUM(v) OVER (PARTITION BY key ORDER BY
...)`` as a distributed primitive: every input row comes back with the
cumulative sum of its key's values up to and including itself.  This is
the balance/clv/cumulative-exposure question (running customer spend,
bytes crawled per domain over time, cumulative token budget per
source), the per-key sibling of ops/prefix.py's GLOBAL prefix scan.

Semantics: per key, rows are totally ordered by ``order_cols`` (pass a
unique tiebreak as the last column — an order/event id — or ties would
make the running value engine-dependent); the running value is the
int64 prefix sum in that order.  Values must already be integerized by
the caller (cents, micros) — int64 addition is engine-exact where
float accumulation order would not be.

Scale shape: one ``hash(key) % P`` bucket shuffle co-locates each
key's rows (narrow projection: key + order cols + value, no payload);
each bucket sorts once (mergesort) and computes every key's prefix sum
in a single C-level pandas groupby-cumsum — no per-key Python loop.

Partitioning assumption (same as sessionize / interval union): one
key's rows fit in a task; the KEY COUNT is what scales out.  Output
cardinality equals input cardinality — consume with write_parquet, not
a collect, at corpus scale.

The DuckDB oracle is the ROWS UNBOUNDED PRECEDING window over the same
total order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def running_total(ds, *, key_col: str, order_cols: list[str],
                  value_col: str, out_col: str = "running",
                  num_partitions: int | None = None):
    """(key, order..., value) Dataset -> same rows + int64 ``out_col``.

    ``value_col`` and every order col must be int64-castable; the last
    order col must make ``(key, *order_cols)`` unique.
    """
    from ..config import resolve_num_partitions

    num_partitions = resolve_num_partitions(num_partitions)
    cols = [key_col, *order_cols, value_col]

    def project(batch: pa.Table) -> pa.Table:
        kid = batch[key_col].to_numpy()
        out = {c: batch[c].cast(pa.int64()) for c in cols}
        out["__bucket"] = pa.array(
            (kid.astype(np.uint64) % np.uint64(num_partitions))
            .astype(np.int64), pa.int64())
        return pa.table(out)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64) for c in cols}
                | {out_col: pd.Series([], dtype=np.int64)})
        df = df.sort_values([key_col, *order_cols], kind="mergesort")
        df[out_col] = (df.groupby(key_col, sort=False)[value_col]
                       .cumsum().astype(np.int64))
        return df

    return (ds.map_batches(project, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(lambda df: fold(df.drop(columns=["__bucket"])),
                        batch_format="pandas"))


def oracle_running_total_sql(rows_sql: str, *, key_col: str,
                             order_cols: list[str], value_col: str,
                             out_col: str = "running") -> str:
    """DuckDB window mirror of :func:`running_total`.

    ``rows_sql`` must yield int64 columns named by the args (callers
    integerize — epoch micros, cents — in ``rows_sql`` itself).
    """
    order = ", ".join(order_cols)
    cols = ", ".join([key_col, *order_cols, value_col])
    return f"""
SELECT {cols},
       CAST(SUM({value_col}) OVER (
         PARTITION BY {key_col} ORDER BY {order}
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS {out_col}
FROM ({rows_sql})
"""
