"""Event-sequence transition counts — the corpus-wide Markov bigram
matrix "how often does event type A directly precede event type B in a
user's stream", the sequence-mining primitive behind next-action
models, funnel discovery (which funnels exist, vs ops/funnel.py which
measures a GIVEN one) and bot detection (impossible transitions).

Semantics: per user, events are totally ordered by ``(ts, tiebreak)``
(pass a unique tiebreak column — event_id — or ties would make the
order engine-dependent); every adjacent pair contributes one
``(prev_type, next_type)`` count.  Output is the global transition
matrix ``(prev_type, next_type, n)``.

Scale shape (the ops/cocitation.py shifted-array trick applied to
sequences):

1. map-side projection to narrow ``(user, ts_us, tie, type)`` rows —
   one int64 triple + a small string per event;
2. ``hash(user) % P`` bucket shuffle (the only event-keyed exchange) —
   same-user rows co-locate, bucket fold sorts once and emits
   adjacent pairs with ONE vectorized shift comparison (no per-user
   Python);
3. ``groupby(prev, next)`` count — |types|^2-bounded.

The DuckDB oracle is the LEAD window over the same total order —
hash-exact because the order is total and the counts are plain int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def transition_counts(events_ds, *, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      tiebreak_col: str = "event_id",
                      num_partitions: int | None = None):
    """Events Dataset -> (prev_type, next_type, n) Dataset."""
    from ray.data.aggregate import Count

    from ..config import resolve_num_partitions

    num_partitions = resolve_num_partitions(num_partitions)

    def project(batch: pa.Table) -> pa.Table:
        ts = (batch[ts_col].cast(pa.timestamp("us")).to_numpy()
              .astype("datetime64[us]").astype(np.int64))
        uid = batch[user_col].to_numpy()
        return pa.table({
            "u": pa.array(uid, pa.int64()),
            "t": pa.array(ts, pa.int64()),
            "k": pa.array(batch[tiebreak_col].to_numpy(), pa.int64()),
            "e": batch[type_col].cast(pa.string()),
            "__bucket": pa.array(
                (uid.astype(np.uint64) % np.uint64(num_partitions))
                .astype(np.int64), pa.int64()),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"prev_type": pd.Series([], dtype=str),
                                 "next_type": pd.Series([], dtype=str)})
        df = df.sort_values(["u", "t", "k"], kind="mergesort")
        u = df["u"].to_numpy()
        e = df["e"].to_numpy()
        same = u[:-1] == u[1:]
        return pd.DataFrame({"prev_type": e[:-1][same],
                             "next_type": e[1:][same]})

    pairs = (events_ds.map_batches(project, batch_format="pyarrow",
                                   zero_copy_batch=True)
             .groupby("__bucket")
             .map_groups(lambda df: fold(df.drop(columns=["__bucket"])),
                         batch_format="pandas"))
    return pairs.groupby(["prev_type", "next_type"]).aggregate(
        Count(alias_name="n"))


def oracle_transitions_sql(events_sql: str, *, user_col: str = "user_id",
                           ts_col: str = "ts",
                           type_col: str = "event_type",
                           tiebreak_col: str = "event_id") -> str:
    """DuckDB LEAD-window mirror of :func:`transition_counts`."""
    return f"""
WITH o AS (
  SELECT {type_col} AS prev_type,
         LEAD({type_col}) OVER (
           PARTITION BY {user_col}
           ORDER BY epoch_us({ts_col}), {tiebreak_col}) AS next_type
  FROM ({events_sql})
)
SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2
"""
