"""Concentration (Simpson/Gini-style purity) of a categorical mix per
group, in exact parts-per-million: purity_ppm = sum_i n_i^2 * 1e6 //
tot^2 — 1e6 means the group is a single category, 1e6/k a uniform
k-way mix.  The integer floor form is hash-exact in SQL; the float
1 - sum p_i^2 famously is not.

Shape: ONE corpus-keyed (group, category) count shuffle with map-side
combine, then a tiny per-group fold over the count table (bucketed by
group hash — the same pattern as ops/grouprank.py's bucket_fold, no
driver collection).

Overflow: sum_i n_i^2 * 1e6 needs tot <= ~3e6 per group in pure int64;
the fold computes in Python ints (exact at any magnitude) and only the
final ppm (<= 1e6) is cast down, so no guard is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .rayfix import arrow_blocks

from .grouprank import _bucket_of

PPM = 1_000_000


def group_concentration(ds, *, group_col: str, cat_col: str,
                        n_alias: str = "n_rows",
                        purity_alias: str = "purity_ppm",
                        num_partitions: int | None = None):
    """Dataset -> one row per group: total rows and the Simpson
    concentration of its ``cat_col`` mix in ppm."""
    from ray.data.aggregate import Sum

    from ..config import resolve_num_partitions

    num_partitions = resolve_num_partitions(num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby([group_col, cat_col], as_index=False, sort=False)
               .size().rename(columns={"size": "__c"}))
        out["__c"] = out["__c"].astype(np.int64)
        return out

    counts = (arrow_blocks(ds.map_batches(partial, batch_format="pandas"))
              .groupby([group_col, cat_col])
              .aggregate(Sum("__c", alias_name="__c")))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (_bucket_of(df[group_col], num_partitions)
                          if len(df) else pd.Series([], dtype=np.int64))
        return df

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 n_alias: pd.Series([], dtype=np.int64),
                                 purity_alias: pd.Series([], dtype=np.int64)})
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            ns = [int(v) for v in sub["__c"]]  # Python ints: exact n^2
            tot = sum(ns)
            rows.append((g, tot, sum(v * v for v in ns) * PPM // (tot * tot)))
        out = pd.DataFrame(rows, columns=[group_col, n_alias, purity_alias])
        out[n_alias] = out[n_alias].astype(np.int64)
        out[purity_alias] = out[purity_alias].astype(np.int64)
        return out

    return (counts.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(fold, batch_format="pandas"))


def oracle_concentration_sql(rows_sql: str, *, group_col: str,
                             cat_col: str, n_alias: str = "n_rows",
                             purity_alias: str = "purity_ppm") -> str:
    """DuckDB mirror of :func:`group_concentration` (HUGEINT keeps the
    n^2 sums exact before the final BIGINT ppm)."""
    return f"""
WITH c AS (
  SELECT {group_col}, {cat_col}, CAST(COUNT(*) AS BIGINT) AS n
  FROM ({rows_sql}) GROUP BY {group_col}, {cat_col}
)
SELECT {group_col},
       CAST(SUM(n) AS BIGINT) AS {n_alias},
       CAST(SUM(CAST(n AS HUGEINT) * n) * {PPM}
            // (SUM(CAST(n AS HUGEINT)) * SUM(n)) AS BIGINT)
         AS {purity_alias}
FROM c GROUP BY {group_col}
"""
