"""2-D skyline (Pareto frontier): the rows not dominated in two
integer criteria — e.g. "shortest documents with the most tokens", the
classic multi-criteria selection a single ORDER BY cannot express.

Dominance (after orienting both axes toward "better = larger"):
q dominates p iff q.x >= p.x and q.y >= p.y with at least one strict.
Exact duplicates of a frontier point are all kept (neither dominates).

Distribution (local-then-merge, the textbook MR skyline): dominance is
transitive, so a point dominated in its batch is dominated globally,
and a globally-undominated point survives every local pass.  Each
batch reduces to its local skyline vectorized (group max y per x,
running max over x descending); candidates then merge in one final
single-partition pass over the union of local skylines.

Scale assumption (documented, enforced nowhere): the merge partition
must hold the union of local skylines.  For correlated axes that union
is tiny; fully anti-correlated axes degenerate to O(n) — at that point
a skyline is the wrong query, not a bigger cluster's job.

Oracle: distinct-x group-max + one window scan (the same closed form),
BIGINT-exact — no floats anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _local_skyline(df: pd.DataFrame, x: str, y: str) -> np.ndarray:
    """Boolean keep-mask of the skyline rows of this frame (axes
    already oriented so larger is better)."""
    xs = df[x].to_numpy(np.int64)
    ys = df[y].to_numpy(np.int64)
    order = np.lexsort((-ys, -xs))          # x desc, then y desc
    xo, yo = xs[order], ys[order]
    # group max y per distinct x (first y in the sorted run), then a
    # running strict-predecessor max over x descending
    new_x = np.empty(len(xo), bool)
    if len(xo):
        new_x[0] = True
        new_x[1:] = xo[1:] != xo[:-1]
    grp = np.cumsum(new_x) - 1              # dense x-group index
    ymax_per_grp = yo[new_x]                # first in run = max (y desc)
    run = np.maximum.accumulate(ymax_per_grp)
    rmax = np.full(len(ymax_per_grp), np.iinfo(np.int64).min)
    rmax[1:] = run[:-1]                     # max over strictly-greater x
    keep_sorted = (yo == ymax_per_grp[grp]) & (ymax_per_grp[grp] > rmax[grp])
    keep = np.empty(len(xo), bool)
    keep[order] = keep_sorted
    return keep


def skyline2d(ds, *, x_col: str, y_col: str, maximize_x: bool = True,
              maximize_y: bool = True, id_cols: tuple[str, ...] = ()):
    """Dataset -> its Pareto-optimal rows under (x_col, y_col)."""
    sx = np.int64(1 if maximize_x else -1)
    sy = np.int64(1 if maximize_y else -1)
    cols = list(id_cols) + [x_col, y_col]

    def orient(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = {c: batch[c] for c in cols}
        out["__sx"] = pc.multiply_checked(
            pc.cast(batch[x_col], pa.int64()), sx)
        out["__sy"] = pc.multiply_checked(
            pc.cast(batch[y_col], pa.int64()), sy)
        return pa.table(out)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return df[_local_skyline(df, "__sx", "__sy")]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = local(df)
        return out[cols]

    return (ds.map_batches(orient, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(local, batch_format="pandas")
            .repartition(1)
            .map_batches(merge, batch_format="pandas", batch_size=None))


def oracle_skyline_sql(rows_sql: str, *, x_col: str, y_col: str,
                       maximize_x: bool = True, maximize_y: bool = True,
                       id_cols: tuple[str, ...] = ()) -> str:
    """DuckDB closed-form mirror of :func:`skyline2d`."""
    sx = "" if maximize_x else "-"
    sy = "" if maximize_y else "-"
    ids = "".join(f"p.{c}, " for c in id_cols)
    return f"""
WITH pts AS (
  SELECT *, {sx}{x_col} AS __sx, {sy}{y_col} AS __sy FROM ({rows_sql})
),
agg AS (SELECT __sx, MAX(__sy) AS ymax FROM pts GROUP BY __sx),
r AS (
  SELECT __sx, ymax,
         MAX(ymax) OVER (ORDER BY __sx DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS rmax
  FROM agg
)
SELECT {ids}p.{x_col}, p.{y_col}
FROM pts p JOIN r ON p.__sx = r.__sx
WHERE p.__sy = r.ymax AND (r.rmax IS NULL OR r.ymax > r.rmax)
"""
