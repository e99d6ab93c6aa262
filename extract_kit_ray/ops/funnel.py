"""Distributed funnel analysis over an event stream — "how far down
the view -> click -> purchase sequence did each user get", the classic
web-analytics pipeline.

Semantics: given an ordered step sequence [s1..sK], a user completes
step i at time t_i = MIN ts of an s_i-typed event with ts STRICTLY
greater than t_{i-1} (t_0 = -inf).  Greedy earliest-completion is
optimal for subsequence matching (standard exchange argument), so
``steps_completed(user) = max i with t_i defined``.  Strict inequality
makes ties deterministic: two events at the same timestamp can never
satisfy consecutive steps.

Shape: ONE bucket shuffle (user_id % B — the sessionize pattern), then
a fully VECTORIZED chained-min scan inside each bucket: rows lexsorted
by user once, per-step masked ``np.minimum.reduceat`` over the user
segments — K tiny numpy passes across ALL of the bucket's users at
once, no per-user Python, no joins, no sequential cross-cluster
barriers.  (The first implementation ran K chained min-passes with a
user-table join per step — semantically identical, but it paid K
sequential executor rounds and per-join aggregator startup; the
bucketed scan does the whole funnel in one round.  BASELINE.md
round 5 records the measured swap.)

Integer determinism: timestamps are compared as exact int64
microseconds (the Arrow timestamp[us] storage), so the chained-CTE
DuckDB oracle (:func:`oracle_funnel_sql`) matches hash-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_TS_MIN = np.iinfo(np.int64).min
_TS_MAX = np.iinfo(np.int64).max
_FUNNEL_BUCKETS = 32


def funnel_steps(events_ds, steps: list[str], *,
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type",
                 num_buckets: int = _FUNNEL_BUCKETS,
                 num_partitions: int | None = None):
    """Events Dataset -> (user_id, steps_completed) Dataset: for every
    user with at least one funnel-typed event, the longest prefix of
    ``steps`` completed in strict timestamp order.

    ``num_partitions`` is accepted for API compatibility with the
    join-chain implementation this replaced; the bucketed scan's only
    exchange is the bucket groupby, whose spread is ``num_buckets``."""
    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    step_set = list(dict.fromkeys(steps))  # preserve order, dedup for mask

    def project(batch: pa.Table) -> pa.Table:
        et = batch[type_col].to_pandas().to_numpy()
        keep = np.isin(et, step_set)
        ts = batch[ts_col].cast(pa.timestamp("us")).to_numpy()[keep]
        uid = batch[user_col].to_numpy()[keep]
        return pa.table({
            "user_id": pa.array(uid, pa.int64()),
            "ts_us": pa.array(ts.astype("datetime64[us]").astype(np.int64),
                              pa.int64()),
            "et": pa.array(et[keep]),
            "bucket": pa.array((uid % num_buckets).astype(np.int32)),
        })

    bucketed = events_ds.map_batches(project, batch_format="pyarrow",
                                     zero_copy_batch=True)

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        et = df["et"].to_numpy()
        order = np.lexsort((ts, u))
        u, ts, et = u[order], ts[order], et[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        uid = u[starts]
        n = len(starts)
        seg = np.repeat(np.arange(n), np.diff(np.r_[starts, len(u)]))
        tprev = np.full(n, _TS_MIN, dtype=np.int64)
        completed = np.zeros(n, dtype=np.int64)
        alive = np.ones(n, dtype=bool)
        for step in steps:
            mask = (et == step) & (ts > tprev[seg]) & alive[seg]
            big = np.where(mask, ts, _TS_MAX)
            m = np.minimum.reduceat(big, starts) if len(u) else big
            ok = alive & (m < _TS_MAX)
            completed[ok] += 1
            tprev = np.where(ok, m, tprev)
            alive = ok
            if not alive.any():
                break
        return pd.DataFrame({"user_id": uid, "steps_completed": completed})

    return bucketed.groupby("bucket").map_groups(scan_bucket,
                                                 batch_format="pandas")


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def oracle_funnel_sql(events_sql: str, steps: list[str], *,
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type") -> str:
    """Chained-CTE DuckDB mirror of :func:`funnel_steps`: s_i = per-user
    MIN ts of step-i events strictly after s_{i-1}; steps_completed is
    the count of non-null chain entries (monotone, so count = max)."""
    types = ", ".join(_q(s) for s in dict.fromkeys(steps))
    ctes = [
        f"ev AS (SELECT {user_col} AS user_id, "
        f"CAST(epoch_us({ts_col}) AS BIGINT) AS ts_us, "
        f"{type_col} AS et FROM ({events_sql}) WHERE {type_col} IN ({types}))",
        "users AS (SELECT DISTINCT user_id FROM ev)",
    ]
    for i, step in enumerate(steps, start=1):
        if i == 1:
            ctes.append(
                f"s1 AS (SELECT user_id, MIN(ts_us) AS t FROM ev "
                f"WHERE et = {_q(step)} GROUP BY user_id)")
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id, MIN(e.ts_us) AS t FROM ev e "
                f"JOIN s{i - 1} p ON p.user_id = e.user_id "
                f"AND e.ts_us > p.t "
                f"WHERE e.et = {_q(step)} GROUP BY e.user_id)")
    cases = " + ".join(
        f"(CASE WHEN s{i}.t IS NOT NULL THEN 1 ELSE 0 END)"
        for i in range(1, len(steps) + 1))
    joins = " ".join(
        f"LEFT JOIN s{i} ON s{i}.user_id = u.user_id"
        for i in range(1, len(steps) + 1))
    return ("WITH " + ", ".join(ctes)
            + f" SELECT u.user_id, CAST({cases} AS BIGINT) AS "
              f"steps_completed FROM users u {joins}")
