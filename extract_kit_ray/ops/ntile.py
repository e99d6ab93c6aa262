"""NTILE(k) within groups without a corpus sort.

SQL's ``NTILE(k) OVER (PARTITION BY g ORDER BY v, tiebreak)`` assigns
each row to one of ``k`` near-equal buckets: with ``cnt`` rows in the
group, the first ``cnt % k`` buckets get ``cnt // k + 1`` rows and the
rest get ``cnt // k`` — a pure function of the row's 1-based row
number and the group size.

NTILE over a non-unique ORDER BY is nondeterministic across engines
(ties split arbitrarily), so this op REQUIRES a tiebreak column that
makes the ordering total: it ranks the composite integer
``value * 2**tiebreak_bits + tiebreak`` with :func:`.grouprank.
rank_in_group` (histogram -> bucketed prefix sum -> broadcast-or-join
re-attach — no corpus sort), where a RANK over unique keys IS the row
number, then applies the NTILE closed form per row, vectorized.

Scale shape: identical to ``rank_in_group`` — the only shuffle is the
(group, composite) histogram groupby; rows never sort.  The composite
requires ``0 <= tiebreak < 2**tiebreak_bits`` and
``value * 2**tiebreak_bits`` within int64 — both asserted per batch, so
an out-of-range corpus fails loudly instead of mis-bucketing.

Reference parity: the reference engine has no window functions; this
is part of the §2.10 "streaming analogs" family the survey maps to
Ray-side reimplementations (SURVEY.md §2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _ntile_of(rn: np.ndarray, cnt: np.ndarray, k: int) -> np.ndarray:
    """Vectorized SQL NTILE: 1-based row number rn of cnt rows -> bucket."""
    base = cnt // k
    rem = cnt % k
    big_span = rem * (base + 1)           # rows covered by the big buckets
    in_big = rn <= big_span
    tile_big = (rn - 1) // np.maximum(base + 1, 1) + 1
    tile_small = rem + (rn - 1 - big_span) // np.maximum(base, 1) + 1
    return np.where(in_big, tile_big, tile_small).astype(np.int64)


def ntile_in_group(ds, *, group_col: str, value_col: str,
                   tiebreak_col: str, k: int,
                   tiebreak_bits: int = 24,
                   tile_alias: str = "tile",
                   broadcast_max: int | None = None,
                   num_partitions: int | None = None):
    """Dataset -> same rows plus ``tile_alias`` = NTILE(k) within
    ``group_col`` ordered by ``(value_col, tiebreak_col)`` ascending."""
    from .grouprank import rank_in_group

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    shift = np.int64(1) << tiebreak_bits
    comp = "__ntile_comp"

    def add_composite(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        v = df[value_col].to_numpy(np.int64)
        t = df[tiebreak_col].to_numpy(np.int64)
        if len(t):
            if t.min() < 0 or t.max() >= shift:
                raise ValueError(
                    f"tiebreak {tiebreak_col} out of [0, 2**{tiebreak_bits})")
            if v.min() < 0 or int(v.max()) > (2**63 - 1) // int(shift):
                raise ValueError(
                    f"value {value_col} * 2**{tiebreak_bits} overflows int64")
        df[comp] = v * shift + t
        return df

    ranked = rank_in_group(
        ds.map_batches(add_composite, batch_format="pandas"),
        group_col=group_col, value_col=comp, descending=False,
        rank_alias="__rn", size_alias="__cnt",
        broadcast_max=broadcast_max, num_partitions=num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[tile_alias] = (_ntile_of(df["__rn"].to_numpy(np.int64),
                                    df["__cnt"].to_numpy(np.int64), k)
                          if len(df) else
                          pd.Series([], dtype=np.int64))
        return df.drop(columns=[comp, "__rn", "__cnt"])

    return ranked.map_batches(finish, batch_format="pandas")


def oracle_ntile_sql(rows_sql: str, *, group_col: str, value_col: str,
                     tiebreak_col: str, k: int,
                     tile_alias: str = "tile",
                     select: str = "*") -> str:
    """DuckDB window mirror of :func:`ntile_in_group`."""
    return (f"SELECT {select}, CAST(NTILE({k}) OVER (PARTITION BY {group_col} "
            f"ORDER BY {value_col} ASC, {tiebreak_col} ASC) AS BIGINT) "
            f"AS {tile_alias} FROM ({rows_sql})")
