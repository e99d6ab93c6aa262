"""Robust per-group outlier gate: median absolute deviation (MAD).

The classic robust alternative to mean/stddev filtering for corpus
curation (a handful of giant pages should not widen the cut for the
whole domain): per group compute the median m of an integer column,
then the median of |v - m| (the MAD), and flag rows with
|v - m| > mult * MAD.

Both medians are the exact discrete lower quantile from
ops/quantiles.py (integer rank rule — reproducible bit-for-bit in SQL,
unlike float quantile kernels), so the whole gate is hash-exact
against the ROW_NUMBER oracle.

Scale shape: two histogram-quantile passes (each ONE corpus-keyed
(group, value) shuffle with map-side combine) plus two
broadcast-or-join attaches of the tiny per-group tables; rows never
sort.  Degenerate groups where MAD = 0 (over half the mass on one
value) flag every row off the median — the standard MAD caveat, kept
deliberately (the oracle agrees by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MED_MICRO = 500_000


def _attach_small(ds, small_ds, *, on: str, broadcast_max: int,
                  num_partitions: int, seed: pa.Table):
    """Attach a one-row-per-group table: broadcast when tiny, else an
    inner hash join (schema-seeded, see ops/rayfix.py; the sentinel key
    "" never matches a real group, so the inner join drops it)."""
    small_ds = small_ds.materialize()
    if small_ds.count() <= broadcast_max:
        import ray

        lut = small_ds.to_pandas()
        ref = ray.put(lut)

        def attach(df: pd.DataFrame, *, ref=ref) -> pd.DataFrame:
            return df.merge(ray.get(ref), on=on, how="inner")

        return ds.map_batches(attach, batch_format="pandas")
    from .rayfix import typed_side

    # the LEFT side needs the compaction guard too: when ds is itself
    # a join output, its schema-less empty blocks poison this join
    # (ops/rayfix.py; same landmine as ops/funnel.py's chained joins) —
    # no sentinel on the left, compaction alone suffices
    return typed_side(ds).join(typed_side(small_ds, seed),
                               join_type="inner",
                               num_partitions=num_partitions, on=(on,))


def mad_outliers(ds, *, group_col: str, value_col: str, mult: int = 3,
                 id_cols: tuple[str, ...] = (),
                 broadcast_max: int | None = None,
                 num_partitions: int | None = None):
    """Dataset -> the rows whose ``value_col`` deviates from the group
    median by more than ``mult`` * MAD, with ``med``/``dev``/``mad``
    columns attached."""
    from ..config import broadcast_max_rows, resolve_num_partitions
    from .quantiles import group_quantiles

    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    med = group_quantiles(ds, group_col=group_col, value_col=value_col,
                          qs_micro={"med": _MED_MICRO},
                          num_partitions=num_partitions)
    med = med.select_columns([group_col, "med"])
    with_med = _attach_small(
        ds, med, on=group_col, broadcast_max=broadcast_max,
        num_partitions=num_partitions,
        seed=pa.table({group_col: pa.array([""], pa.string()),
                       "med": pa.array([-1], pa.int64())}))

    def add_dev(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.cast(batch[value_col], pa.int64())
        m = pc.cast(batch["med"], pa.int64())
        return batch.append_column(
            "dev", pc.abs_checked(pc.subtract_checked(v, m)))

    with_dev = with_med.map_batches(add_dev, batch_format="pyarrow",
                                    zero_copy_batch=True)

    mad = group_quantiles(with_dev, group_col=group_col, value_col="dev",
                          qs_micro={"mad": _MED_MICRO},
                          num_partitions=num_partitions)
    mad = mad.select_columns([group_col, "mad"])
    with_mad = _attach_small(
        with_dev, mad, on=group_col, broadcast_max=broadcast_max,
        num_partitions=num_partitions,
        seed=pa.table({group_col: pa.array([""], pa.string()),
                       "mad": pa.array([-1], pa.int64())}))

    def keep(batch: pa.Table, *, mult=mult) -> pa.Table:
        import pyarrow.compute as pc

        cut = pc.multiply_checked(pc.cast(batch["mad"], pa.int64()),
                                  np.int64(mult))
        mask = pc.greater(batch["dev"], cut)
        out = batch.filter(mask)
        cols = {c: out[c] for c in id_cols}
        cols[group_col] = out[group_col]
        for c in (value_col, "med", "dev", "mad"):
            cols[c] = pc.cast(out[c], pa.int64())
        return pa.table(cols)

    return with_mad.map_batches(keep, batch_format="pyarrow",
                                zero_copy_batch=True)


def oracle_mad_outliers_sql(rows_sql: str, *, group_col: str,
                            value_col: str, mult: int = 3,
                            id_cols: tuple[str, ...] = ()) -> str:
    """DuckDB mirror of :func:`mad_outliers` — the integer rank rule
    spelled twice (median, then MAD) over ROW_NUMBER windows."""
    # __cnt, not "n": a caller whose value_col is literally "n" (e.g.
    # a count table) would otherwise shadow the window count in the
    # rank expression and silently produce a wrong median
    rank = f"GREATEST(({_MED_MICRO} * __cnt + 999999) // 1000000, 1)"
    ids = "".join(f"d.{c}, " for c in id_cols)
    return f"""
WITH base AS ({rows_sql}),
r1 AS (
  SELECT {group_col}, {value_col},
         ROW_NUMBER() OVER (PARTITION BY {group_col}
                            ORDER BY {value_col}) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS __cnt
  FROM base
),
med AS (
  SELECT {group_col},
         MAX(CASE WHEN rn = {rank} THEN {value_col} END) AS med
  FROM r1 GROUP BY {group_col}
),
d AS (
  SELECT base.*, med.med,
         ABS(base.{value_col} - med.med) AS dev
  FROM base JOIN med USING ({group_col})
),
r2 AS (
  SELECT {group_col}, dev,
         ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY dev) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS __cnt
  FROM d
),
mad AS (
  SELECT {group_col}, MAX(CASE WHEN rn = {rank} THEN dev END) AS mad
  FROM r2 GROUP BY {group_col}
)
SELECT {ids}d.{group_col}, d.{value_col}, d.med, d.dev, mad.mad
FROM d JOIN mad USING ({group_col})
WHERE d.dev > {mult} * mad.mad
"""
