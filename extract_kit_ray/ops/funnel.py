"""Distributed funnel analysis over an event stream — "how far down
the view -> click -> purchase sequence did each user get", the classic
web-analytics pipeline, expressed as K chained min-passes instead of a
per-user Python scan.

Semantics: given an ordered step sequence [s1..sK], a user completes
step i at time t_i = MIN ts of an s_i-typed event with ts STRICTLY
greater than t_{i-1} (t_0 = -inf).  Greedy earliest-completion is
optimal for subsequence matching (standard exchange argument), so
``steps_completed(user) = max i with t_i defined`` and the min-chain
IS the funnel.  Strict inequality makes ties deterministic: two events
at the same timestamp can never satisfy consecutive steps.

Shape: each step-i pass touches ONLY type-s_i events (one vectorized
mask + groupby-min, plus one narrow inner join of the per-user t_{i-1}
table for i > 1) — every event row rides exactly one shuffle across
the whole funnel, and per-user state never exceeds one int64.  No
map_groups, no per-user Python loop; this is the same K-rounds-of-
narrow-join shape as ops/pagerank.py with K = funnel length.

Integer determinism: timestamps are compared as exact int64
microseconds (the Arrow timestamp[us] storage), so the chained-CTE
DuckDB oracle (:func:`oracle_funnel_sql`) matches hash-exact.

Non-negative user ids; -1 is the rayfix schema-seed sentinel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rayfix import seed_int64 as _seed

_TS_MIN = np.iinfo(np.int64).min


def funnel_steps(events_ds, steps: list[str], *,
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type",
                 num_partitions: int | None = None):
    """Events Dataset -> (user_id, steps_completed) Dataset: for every
    user with at least one funnel-typed event, the longest prefix of
    ``steps`` completed in strict timestamp order."""
    from ray.data.aggregate import Count, Max, Min

    from ..config import resolve_num_partitions

    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    num_partitions = resolve_num_partitions(num_partitions)
    step_set = list(dict.fromkeys(steps))  # preserve order, dedup for mask

    def project(batch: pa.Table) -> pa.Table:
        et = batch[type_col].to_pandas().to_numpy()
        keep = np.isin(et, step_set)
        ts = batch[ts_col].cast(pa.timestamp("us")).to_numpy()[keep]
        return pa.table({
            "user_id": pa.array(batch[user_col].to_numpy()[keep], pa.int64()),
            "ts_us": pa.array(ts.astype("datetime64[us]").astype(np.int64),
                              pa.int64()),
            "et": pa.array(et[keep]),
        })

    ev = events_ds.map_batches(project, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    users = _seed(
        ev.groupby("user_id").aggregate(Count(alias_name="_n"))
        .select_columns(["user_id"]),
        user_id=-1,
    )

    def only(step: str):
        def f(batch: pa.Table) -> pa.Table:
            keep = batch["et"].to_pandas().to_numpy() == step
            return pa.table({
                "user_id": pa.array(batch["user_id"].to_numpy()[keep],
                                    pa.int64()),
                "ts_us": pa.array(batch["ts_us"].to_numpy()[keep], pa.int64()),
            })
        return f

    levels = []
    t_prev = None
    for i, step in enumerate(steps):
        evi = ev.map_batches(only(step), batch_format="pyarrow",
                             zero_copy_batch=True)
        if i > 0:
            # attach t_{i-1} and keep strictly-later events only.  The
            # left side must carry a typed sentinel (rayfix): a step
            # with zero events would otherwise feed the hash join
            # schema-less empty shards and Acero rejects the key.  The
            # sentinel matches t_prev's own sentinel (pu = -1) but the
            # strict ts filter below drops it (_TS_MIN > _TS_MIN).
            evi = _seed(evi, user_id=-1, ts_us=_TS_MIN)
            evi = evi.join(t_prev, join_type="inner",
                           num_partitions=num_partitions,
                           on=("user_id",), right_on=("pu",))
            evi = evi.map_batches(
                lambda b: pa.table({
                    "user_id": b["user_id"].filter(
                        pa.array(b["ts_us"].to_numpy() > b["pt"].to_numpy())),
                    "ts_us": b["ts_us"].filter(
                        pa.array(b["ts_us"].to_numpy() > b["pt"].to_numpy())),
                }),
                batch_format="pyarrow", zero_copy_batch=True)
        ti = _seed(
            evi.groupby("user_id").aggregate(Min("ts_us", alias_name="t")),
            user_id=-1, t=_TS_MIN,
        ).materialize()
        levels.append(ti.map_batches(
            lambda b, s=i + 1: pa.table({
                "user_id": b["user_id"],
                "step": pa.array(np.full(b.num_rows, s), pa.int64()),
            }),
            batch_format="pyarrow", zero_copy_batch=True))
        t_prev = ti.map_batches(
            lambda b: pa.table({"pu": b["user_id"], "pt": b["t"]}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()

    reached = levels[0]
    for lvl in levels[1:]:
        reached = reached.union(lvl)
    best = _seed(
        reached.groupby("user_id").aggregate(
            Max("step", alias_name="steps_completed")),
        user_id=-1, steps_completed=0,
    )

    joined = users.join(best, join_type="left_outer",
                        num_partitions=num_partitions, on=("user_id",))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = batch["user_id"]
        s = pc.fill_null(pc.cast(batch["steps_completed"], pa.int64()), 0)
        keep = pa.array(u.to_numpy() >= 0)
        return pa.table({"user_id": u.filter(keep),
                         "steps_completed": s.filter(keep)})

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


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
