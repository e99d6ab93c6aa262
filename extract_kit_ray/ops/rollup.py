"""One-pass multi-granularity rollup — ``GROUP BY ROLLUP(c1, .., ck)``
as a single shuffle instead of k+1 separate aggregations.

A lineage/metrics dashboard wants the same counters at every
granularity (per (domain, lang), per domain, grand total).  Running
k+1 groupbys re-reads and re-shuffles the corpus k+1 times; the
classic trick (Gray et al., "Data Cube", 1997) is to emit ALL rollup
levels map-side and merge once:

1. map-side combine: each batch groups ONCE per rollup level
   (vectorized pandas groupby over the level's prefix of
   ``group_cols``) and emits partial rows tagged with the level via
   key encoding, so the shuffle moves at most
   ``sum_l(groups_in_batch_at_level_l)`` rows per batch — never the
   corpus;
2. one global ``groupby(encoded keys)`` sums the partials;
3. a decode map turns rolled-up key slots back into NULLs.

Key encoding makes levels collision-proof without a level column:
every real value is prefixed with ``"="`` , an input NULL becomes
``"n"``, and a rolled-up slot is ``"*"`` — three disjoint spaces, so
``("=a", "*")`` (per-domain row for domain "a") can never collide
with ``("=a", "=b")`` or with a data value that happens to be ``"*"``.

SQL-ROLLUP NULL ambiguity is inherited deliberately: an input NULL
group and a rolled-up slot both decode to NULL (two distinct output
rows with equal keys and different counters), exactly what ``GROUP BY
ROLLUP`` produces — the oracle and the engine agree row-for-row.

Aggregates are COUNT plus integer SUMs — exact int64, hash-identical
to DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .rayfix import arrow_blocks


def _encode(s: pd.Series) -> pd.Series:
    enc = "=" + s.astype("string")
    return enc.fillna("n").astype(object)


def rollup_aggregate(ds, group_cols: list[str],
                     sum_cols: list[str] | None = None, *,
                     count_alias: str = "n_rows", mode: str = "rollup"):
    """Dataset -> ROLLUP/CUBE(group_cols) Dataset with ``count_alias``
    = COUNT(*) and ``sum_<c>`` = SUM(c) for each ``sum_cols`` entry
    (int64-cast — integer inputs only, by contract).  Rolled-up key
    slots are NULL, SQL-style.  ``mode='rollup'`` emits the k+1
    hierarchy prefixes; ``mode='cube'`` all 2^k keep-subsets (map-side
    partial count scales with the subset count — keep k small for
    cube, exactly as in SQL)."""
    from ray.data.aggregate import Sum

    if not group_cols:
        raise ValueError("rollup_aggregate: need at least one group col")
    sum_cols = list(sum_cols or [])
    k = len(group_cols)
    out_sums = [f"sum_{c}" for c in sum_cols]
    if mode == "rollup":
        # keep-prefixes: {c1..ci} for i = k..0
        subsets = [frozenset(group_cols[:i]) for i in range(k, -1, -1)]
    elif mode == "cube":
        subsets = [frozenset(c for j, c in enumerate(group_cols)
                             if mask >> j & 1)
                   for mask in range((1 << k) - 1, -1, -1)]
    else:
        raise ValueError(f"unknown mode: {mode!r}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        base = pd.DataFrame({
            **{g: _encode(df[g]) for g in group_cols},
            count_alias: np.ones(len(df), dtype=np.int64),
            **{f"sum_{c}": df[c].to_numpy().astype(np.int64)
               for c in sum_cols},
        })
        for keep in subsets:
            cur = base.copy()
            for g in group_cols:
                if g not in keep:
                    cur[g] = "*"
            if len(cur):
                cur = cur.groupby(group_cols, as_index=False, sort=False)[
                    [count_alias] + out_sums].sum()
            frames.append(cur)
        out = pd.concat(frames, ignore_index=True)
        for c in [count_alias] + out_sums:
            out[c] = out[c].astype(np.int64)
        return out

    merged = (
        arrow_blocks(ds.map_batches(partial, batch_format="pandas"))
        .groupby(group_cols)
        .aggregate(Sum(count_alias, alias_name=count_alias),
                   *[Sum(c, alias_name=c) for c in out_sums])
    )

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {}
        for g in group_cols:
            col = batch[g].cast(pa.string())
            real = pc.starts_with(col, "=")
            cols[g] = pc.if_else(real, pc.utf8_slice_codeunits(col, 1),
                                 pa.scalar(None, pa.string()))
        for c in [count_alias] + out_sums:
            cols[c] = batch[c].cast(pa.int64())
        return pa.table(cols)

    return merged.map_batches(decode, batch_format="pyarrow",
                              zero_copy_batch=True)


def oracle_rollup_sql(rows_sql: str, group_cols: list[str],
                      sum_cols: list[str] | None = None, *,
                      count_alias: str = "n_rows",
                      mode: str = "rollup") -> str:
    """DuckDB mirror of :func:`rollup_aggregate`."""
    if mode not in ("rollup", "cube"):
        raise ValueError(f"unknown mode: {mode!r}")
    sum_cols = list(sum_cols or [])
    keys = ", ".join(group_cols)
    sums = "".join(f", CAST(SUM({c}) AS BIGINT) AS sum_{c}"
                   for c in sum_cols)
    return (f"SELECT {keys}, CAST(COUNT(*) AS BIGINT) AS {count_alias}{sums} "
            f"FROM ({rows_sql}) GROUP BY {mode.upper()}({keys})")
