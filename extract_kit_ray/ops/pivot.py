"""Pivoted conditional aggregation — ``COUNT(*) FILTER (WHERE cat =
'x')`` per key for a FIXED category list, the long-to-wide reshape
behind per-user behavior vectors (n_view, n_click, ...), per-domain
mime mixes and per-source language mixes: one wide row per key instead
of k narrow rows, ready to feed a model or a join.

The category list must be fixed and known up front (it becomes the
output schema — a data-dependent column set would make the schema a
corpus property, which Ray Data and every SQL engine reject for good
reason).  Values outside the list are IGNORED by contract; append a
catch-all to the list's accounting by passing ``other_col``.

Scale shape — map-side combine, one narrow shuffle:

1. each input batch reduces to at most one wide row per distinct key
   in it (one vectorized crosstab — C-level, no Python per row);
2. ``groupby(key)`` sums the k int64 count columns — the only
   exchange, carrying partial rows bounded by n_batches x
   keys-per-batch, never the raw event stream.

The DuckDB oracle is the literal FILTER-clause aggregation over the
same category list, hash-exact (plain int64 counts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pivot_counts(ds, *, key_col: str, cat_col: str,
                 categories: list[str], prefix: str = "n_",
                 other_col: str | None = None):
    """(key, cat) Dataset -> one row per key: ``{prefix}{cat}`` int64
    counts per listed category (+ ``other_col`` for unlisted values
    when given)."""
    from ray.data.aggregate import Sum

    cats = list(categories)
    if len(set(cats)) != len(cats):
        raise ValueError("categories must be distinct")
    out_cols = [f"{prefix}{c}" for c in cats]
    if other_col is not None:
        out_cols = out_cols + [other_col]

    def partial(df: pd.DataFrame) -> "pa.Table":
        # emits ARROW blocks: Ray's sort-aggregate over pandas blocks
        # is ~10x slower on identical data (measured in BASELINE.md
        # round 5 — 20.2s vs 2.1s for the same 96k partial rows)
        import pyarrow as pa

        if len(df) == 0:
            return pa.table(
                {key_col: pa.array([], pa.int64())}
                | {c: pa.array([], pa.int64()) for c in out_cols})
        ct = pd.crosstab(df[key_col], df[cat_col])
        out = {key_col: pa.array(ct.index.to_numpy(), pa.int64())}
        seen = set()
        n = len(ct)
        for c, oc in zip(cats, out_cols):
            seen.add(c)
            vals = (ct[c].to_numpy().astype(np.int64) if c in ct.columns
                    else np.zeros(n, dtype=np.int64))
            out[oc] = pa.array(vals, pa.int64())
        if other_col is not None:
            rest = [c for c in ct.columns if c not in seen]
            vals = (ct[rest].sum(axis=1).to_numpy().astype(np.int64)
                    if rest else np.zeros(n, dtype=np.int64))
            out[other_col] = pa.array(vals, pa.int64())
        return pa.table(out)

    # materialize the (bounded, map-side-combined) partial table before
    # the aggregate: Ray's sort-aggregate over a still-streaming
    # upstream re-samples/re-executes it — measured 13.4 s streaming vs
    # 1.7 s materialized for the IDENTICAL partial table (BASELINE.md
    # round 5).  The partial rows are what the shuffle moves anyway, so
    # pinning them adds no asymptotic memory.
    partials = ds.map_batches(partial,
                              batch_format="pandas").materialize()
    return (partials.groupby(key_col)
            .aggregate(*[Sum(c, alias_name=c) for c in out_cols]))


def oracle_pivot_sql(rows_sql: str, *, key_col: str, cat_col: str,
                     categories: list[str], prefix: str = "n_",
                     other_col: str | None = None) -> str:
    """DuckDB FILTER-clause mirror of :func:`pivot_counts`."""
    cols = []
    quoted = []
    for c in categories:
        lit = c.replace("'", "''")
        quoted.append(f"'{lit}'")
        cols.append(f"CAST(COUNT(*) FILTER (WHERE {cat_col} = '{lit}') "
                    f"AS BIGINT) AS {prefix}{c}")
    if other_col is not None:
        cols.append(f"CAST(COUNT(*) FILTER (WHERE {cat_col} NOT IN "
                    f"({', '.join(quoted)})) AS BIGINT) AS {other_col}")
    return (f"SELECT {key_col}, {', '.join(cols)} FROM ({rows_sql}) "
            f"GROUP BY {key_col}")
