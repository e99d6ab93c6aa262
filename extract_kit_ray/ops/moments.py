"""Per-group bivariate moment sketch: the exact integer sufficient
statistics for mean / variance / covariance / Pearson correlation of
two integer columns, computed in one map-side-combined pass.

Emitting the raw moments (n, Sx, Sy, Sxx, Syy, Sxy) instead of the
final float correlation keeps the result hash-exact against the SQL
oracle (float corr differs across engines in summation order) while
remaining one trivially-parallel aggregation: moments are additive, so
each batch contributes one partial row per group and the only shuffle
is a tiny groupby-sum.  The caller derives corr/slope/R^2 driver-side
from six integers per group.

Overflow: Sxx/Syy/Sxy are int64 sums of products; per-batch partials
accumulate in Python ints and the final Sum aggregate is int64, so a
corpus where sum(x^2) exceeds 2^63 - 1 (e.g. 10^12 docs of 10^5 chars:
10^22) must pre-scale — the per-batch guard raises instead of
wrapping, mirroring ops/pagerank.py's loud-overflow contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .rayfix import arrow_blocks

_I64_MAX = 2**63 - 1
_COLS = ("n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy")


def group_moments(ds, *, group_col: str, x_col: str, y_col: str):
    """Dataset -> one row per group: (n, sum_x, sum_y, sum_xx, sum_yy,
    sum_xy), all exact int64."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(np.int64)
        y = df[y_col].to_numpy(np.int64)
        # object (Python int) products: exact regardless of magnitude,
        # overflow is checked once on the reduced per-group sums
        g = df[group_col]
        agg = pd.DataFrame({
            group_col: g,
            "n": np.ones(len(df), np.int64),
            "sum_x": x, "sum_y": y,
            "sum_xx": (x.astype(object) * x.astype(object)),
            "sum_yy": (y.astype(object) * y.astype(object)),
            "sum_xy": (x.astype(object) * y.astype(object)),
        }).groupby(group_col, as_index=False, sort=False).sum()
        for c in _COLS:
            vals = agg[c]
            if len(vals) and max(abs(int(v)) for v in vals) > _I64_MAX:
                raise OverflowError(
                    f"group_moments: partial {c} exceeds int64; "
                    "pre-scale the inputs")
            agg[c] = vals.astype(np.int64)
        return agg

    return (arrow_blocks(ds.map_batches(partial, batch_format="pandas"))
            .groupby(group_col)
            .aggregate(*[Sum(c, alias_name=c) for c in _COLS]))


def oracle_moments_sql(rows_sql: str, *, group_col: str,
                       x_col: str, y_col: str) -> str:
    """DuckDB mirror of :func:`group_moments` (BIGINT casts keep the
    HUGEINT sums comparable)."""
    return f"""
SELECT {group_col},
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM({x_col}) AS BIGINT) AS sum_x,
       CAST(SUM({y_col}) AS BIGINT) AS sum_y,
       CAST(SUM(CAST({x_col} AS BIGINT) * {x_col}) AS BIGINT) AS sum_xx,
       CAST(SUM(CAST({y_col} AS BIGINT) * {y_col}) AS BIGINT) AS sum_yy,
       CAST(SUM(CAST({x_col} AS BIGINT) * {y_col}) AS BIGINT) AS sum_xy
FROM ({rows_sql}) GROUP BY {group_col}
"""
