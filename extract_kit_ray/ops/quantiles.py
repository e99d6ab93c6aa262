"""Exact distributed per-group quantiles — p50/p90/p99 of an integer
column per group, computed from the group's VALUE HISTOGRAM instead of
a per-group sort of the corpus.

Definition (discrete lower quantile, exact integer arithmetic): for a
group with n values sorted ascending, the q-quantile (q in micro
units, 0 < q_micro <= 1_000_000) is the value at 1-based rank

    t = max(1, ceil(q_micro * n / 1_000_000))
      = max(1, (q_micro * n + 999_999) // 1_000_000)

This is the classic "type 1" sample quantile.  DuckDB's
``quantile_disc`` computes the same rank but through float
arithmetic whose rounding is not reproducible from integers (0.9 * 20
is 18.000000000000004 in binary), so the oracle
(:func:`oracle_quantiles_sql`) spells the rank rule out with BIGINT
math over a ROW_NUMBER window — both sides are integer-exact and
hash-identical by construction, for any q and any group size.

Scale shape (same histogram trick as ops/grouprank.py):

1. map-side combine: batches reduce to (group, value, count) triples;
2. ``groupby(g, v)`` sums partials — the only corpus-keyed shuffle;
3. triples get ``hash(g) % P`` buckets; ONE vectorized pandas pass per
   bucket sorts (g, v), cumsums counts within g, and picks the first
   value whose cumulative count reaches each quantile's target rank
   (groupby-idxmax over a boolean mask — no per-group Python loop).

Output: one row per group — ``(group, n_<value>, <alias per q>)``.
Values must be integers; the histogram is exact, so ties and skew are
irrelevant to correctness (a hot value is ONE histogram row).

Relation to ``driver.q_chars_quantiles_by_lang``: that round-4 query
reads the per-group histogram off ON THE DRIVER (fine when groups are
few); this op folds the read-off inside bucketed tasks, so a
million-domain group column never lands driver-side, and it feeds the
composable :func:`filter_above_group_quantile` gate.
"""

from __future__ import annotations

from .rayfix import arrow_blocks

import numpy as np
import pandas as pd

from .grouprank import _bucket_of

MICRO = 1_000_000


def group_quantiles(ds, *, group_col: str, value_col: str,
                    qs_micro: dict[str, int],
                    count_alias: str | None = None,
                    num_partitions: int | None = None):
    """Dataset -> one row per ``group_col``: each ``qs_micro`` entry
    (alias -> q in micro units) becomes a column, plus the group size
    as ``count_alias`` (default ``n_<value_col>``)."""
    from ray.data.aggregate import Sum

    from ..config import resolve_num_partitions

    if not qs_micro:
        raise ValueError("group_quantiles: need at least one quantile")
    for a, q in qs_micro.items():
        if not 0 < q <= MICRO:
            raise ValueError(f"group_quantiles: {a}={q} outside (0, 1e6]")
    if count_alias is None:
        count_alias = f"n_{value_col}"
    num_partitions = resolve_num_partitions(num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby([group_col, value_col], as_index=False, sort=False)
               .size().rename(columns={"size": "__c"}))
        out["__c"] = out["__c"].astype(np.int64)
        return out

    counts = (arrow_blocks(ds.map_batches(partial, batch_format="pandas"))
              .groupby([group_col, value_col])
              .aggregate(Sum("__c", alias_name="__c")))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (_bucket_of(df[group_col], num_partitions)
                          if len(df) else pd.Series([], dtype=np.int64))
        return df

    def bucket_fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = [group_col, count_alias] + list(qs_micro)
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        df = (df.sort_values([group_col, value_col], kind="mergesort")
              .reset_index(drop=True))  # labels == positions for idxmax
        g = df.groupby(group_col, sort=False)
        cum = g["__c"].cumsum().to_numpy()
        n = g["__c"].transform("sum").to_numpy().astype(np.int64)
        vals = df[value_col].to_numpy()
        out = {group_col: g.head(1)[group_col].to_numpy(),
               count_alias: g["__c"].sum().to_numpy().astype(np.int64)}
        for alias, qm in qs_micro.items():
            t = np.maximum((qm * n + MICRO - 1) // MICRO, 1)
            hit = pd.Series(cum >= t)
            first = hit.groupby(df[group_col].to_numpy(),
                                sort=False).idxmax().to_numpy()
            out[alias] = vals[first].astype(np.int64)
        return pd.DataFrame(out)

    return (counts.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(bucket_fold, batch_format="pandas"))


def oracle_quantiles_sql(rows_sql: str, *, group_col: str, value_col: str,
                         qs_micro: dict[str, int],
                         count_alias: str | None = None) -> str:
    """DuckDB mirror of :func:`group_quantiles` — the integer rank rule
    spelled out over a ROW_NUMBER window (NOT quantile_disc, whose
    float rounding is irreproducible; see module docstring)."""
    if count_alias is None:
        count_alias = f"n_{value_col}"
    picks = ", ".join(
        f"MAX(CASE WHEN rn = GREATEST(({q} * n + {MICRO - 1}) // {MICRO}, 1) "
        f"THEN {value_col} END) AS {alias}"
        for alias, q in qs_micro.items())
    return f"""
WITH v AS (
  SELECT {group_col}, {value_col},
         ROW_NUMBER() OVER (PARTITION BY {group_col}
                            ORDER BY {value_col}) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n
  FROM ({rows_sql})
)
SELECT {group_col}, CAST(MAX(n) AS BIGINT) AS {count_alias}, {picks}
FROM v GROUP BY {group_col}
"""


def filter_above_group_quantile(ds, *, group_col: str, value_col: str,
                                q_micro: int,
                                broadcast_max: int | None = None,
                                num_partitions: int | None = None):
    """Keep rows with ``value >= the group's q-quantile`` — the
    per-domain "top decile by quality" gate, composed from
    :func:`group_quantiles`.  The per-group cut table (ONE row per
    group by construction) re-attaches by broadcast pandas merge under
    ``config.broadcast_max_rows`` or an inner hash join above it;
    either way the corpus rides at most one shuffle."""
    import ray

    from ..config import broadcast_max_rows, resolve_num_partitions
    from .rayfix import typed_side

    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    cuts = group_quantiles(ds, group_col=group_col, value_col=value_col,
                           qs_micro={"__cut": q_micro},
                           num_partitions=num_partitions).materialize()

    if cuts.count() <= broadcast_max:
        lut = cuts.to_pandas()[[group_col, "__cut"]]
        ref = ray.put(lut)

        def keep(df: pd.DataFrame, *, ref=ref) -> pd.DataFrame:
            cut = df.merge(ray.get(ref), on=group_col, how="left")
            mask = (df[value_col].to_numpy()
                    >= cut["__cut"].to_numpy())
            return df[mask]

        return ds.map_batches(keep, batch_format="pandas")

    joined = ds.join(
        typed_side(cuts.select_columns([group_col, "__cut"])),
        join_type="inner", num_partitions=num_partitions, on=(group_col,))

    def keep_joined(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df[value_col].to_numpy() >= df["__cut"].to_numpy()]
        return out.drop(columns=["__cut"])

    return joined.map_batches(keep_joined, batch_format="pandas")


def oracle_filter_quantile_sql(rows_sql: str, *, group_col: str,
                               value_col: str, q_micro: int,
                               select: str = "*") -> str:
    """DuckDB mirror of :func:`filter_above_group_quantile`."""
    cuts = oracle_quantiles_sql(rows_sql, group_col=group_col,
                                value_col=value_col,
                                qs_micro={"__cut": q_micro})
    return (f"SELECT {select} FROM ({rows_sql}) r JOIN ({cuts}) c "
            f"ON r.{group_col} = c.{group_col} "
            f"WHERE r.{value_col} >= c.__cut")
