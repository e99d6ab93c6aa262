"""Distributed cohort-retention analysis over an event stream — "of
the users who first appeared on day D, how many were active again D+k
days later", the classic growth-analytics triangle, computed without
ever materializing a per-user event list.

Semantics: a user's *cohort day* is the UTC day (``ts_us //
86_400_000_000``, exact int64 floor division on the Arrow
timestamp[us] storage) of their FIRST event; for every day the user is
active, the pair ``(cohort_day, day - cohort_day)`` contributes one
user to that retention cell.  Output is ``(cohort_day, day_offset,
n_users)`` with ``day_offset >= 0`` (offset 0 = the cohort's own size).

Scale shape — every stage is narrow int64 triples, corpus text never
moves:

1. map-side distinct: each batch projects to per-batch-unique
   ``(user_id, day)`` pairs (vectorized numpy unique), so the first
   shuffle moves at most one row per user-day per batch;
2. ``groupby(user_id, day)`` makes the pairs globally distinct — this
   is the only stage that touches every event's key, and it ships two
   int64s per row;
3. ``groupby(user_id).min(day)`` over the distinct pairs yields the
   cohort table (one row per user);
4. the cohort table re-attaches to the pairs by broadcast
   searchsorted probe under ``config.broadcast_max_rows`` (users are
   often << user-days) or an inner hash join above it;
5. ``groupby(cohort_day, day_offset).count()`` — pairs are already
   user-day-distinct, so a plain COUNT is the distinct-user count.

:func:`daily_activity` reuses stages 1-4 for the other classic view:
per-day active/new/returning user counts.

Integer determinism: day indices are exact int64 epoch-day floor
divisions, so the DuckDB oracles match hash-exact.

Non-negative user ids; -1 is the rayfix schema-seed sentinel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rayfix import seed_int64 as _seed

DAY_US = 86_400_000_000


def _attached_user_days(events_ds, *, user_col: str, ts_col: str,
                        bucket_us: int, broadcast_max: int | None,
                        num_partitions: int | None):
    """Stages 1-4 of the module docstring: distinct (user_id, day)
    pairs with the user's cohort_day attached; sentinels filtered."""
    import ray
    from ray.data.aggregate import Count, Min

    from ..config import broadcast_max_rows, resolve_num_partitions

    if bucket_us <= 0:
        raise ValueError("cohort: bucket_us must be positive")
    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    def project(batch: pa.Table) -> pa.Table:
        ts = (batch[ts_col].cast(pa.timestamp("us")).to_numpy()
              .astype("datetime64[us]").astype(np.int64))
        uid = batch[user_col].to_numpy()
        pairs = np.unique(
            np.stack([uid, ts // bucket_us], axis=1), axis=0)
        return pa.table({
            "user_id": pa.array(pairs[:, 0], pa.int64()),
            "day": pa.array(pairs[:, 1], pa.int64()),
        })

    pairs = _seed(
        events_ds.map_batches(project, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby(["user_id", "day"]).aggregate(Count(alias_name="_n"))
        .select_columns(["user_id", "day"]),
        user_id=-1, day=0,
    ).materialize()

    cohort = _seed(
        pairs.groupby("user_id").aggregate(Min("day", alias_name="cohort_day")),
        user_id=-1, cohort_day=0,
    ).materialize()

    n_users = cohort.count()
    if n_users <= broadcast_max:
        cdf = cohort.to_pandas().drop_duplicates("user_id")
        order = np.argsort(cdf["user_id"].to_numpy(), kind="stable")
        ref = ray.put((cdf["user_id"].to_numpy().astype(np.int64)[order],
                       cdf["cohort_day"].to_numpy().astype(np.int64)[order]))

        def attach(batch: pa.Table, *, ref=ref) -> pa.Table:
            uids, cohs = ray.get(ref)
            uid = batch["user_id"].to_numpy()
            # every pairs row's user exists in the cohort table by
            # construction, so the probe is total
            coh = cohs[np.searchsorted(uids, uid)]
            return pa.table({
                "user_id": batch["user_id"],
                "day": batch["day"],
                "cohort_day": pa.array(coh, pa.int64()),
            })

        attached = pairs.map_batches(attach, batch_format="pyarrow",
                                     zero_copy_batch=True)
    else:
        joined = pairs.join(
            cohort.map_batches(
                lambda b: pa.table({"cu": b["user_id"],
                                    "cohort_day": b["cohort_day"]}),
                batch_format="pyarrow", zero_copy_batch=True).materialize(),
            join_type="inner", num_partitions=num_partitions,
            on=("user_id",), right_on=("cu",))
        attached = joined.map_batches(
            lambda b: pa.table({
                "user_id": b["user_id"],
                "day": b["day"],
                "cohort_day": b["cohort_day"],
            }),
            batch_format="pyarrow", zero_copy_batch=True)

    return attached.map_batches(
        lambda b: b.filter(pa.array(b["user_id"].to_numpy() >= 0)),
        batch_format="pyarrow", zero_copy_batch=True)


def cohort_retention(events_ds, *, user_col: str = "user_id",
                     ts_col: str = "ts", bucket_us: int = DAY_US,
                     broadcast_max: int | None = None,
                     num_partitions: int | None = None):
    """Events Dataset -> (cohort_day, day_offset, n_users) Dataset.
    ``bucket_us`` sets the cohort granularity (a day by default; pass
    ``7 * DAY_US`` for weekly cohorts)."""
    from ray.data.aggregate import Count

    attached = _attached_user_days(
        events_ds, user_col=user_col, ts_col=ts_col, bucket_us=bucket_us,
        broadcast_max=broadcast_max, num_partitions=num_partitions)

    def offset(b: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_day": b["cohort_day"],
            "day_offset": pa.array(
                b["day"].to_numpy() - b["cohort_day"].to_numpy(),
                pa.int64()),
        })

    cells = _seed(
        attached.map_batches(offset, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Count(alias_name="n_users")),
        cohort_day=-1, day_offset=-1, n_users=0,
    )
    return cells.map_batches(
        lambda b: b.filter(pa.array(b["day_offset"].to_numpy() >= 0)),
        batch_format="pyarrow", zero_copy_batch=True)


def daily_activity(events_ds, *, user_col: str = "user_id",
                   ts_col: str = "ts", bucket_us: int = DAY_US,
                   broadcast_max: int | None = None,
                   num_partitions: int | None = None):
    """Events Dataset -> (day, n_active, n_new, n_returning) Dataset —
    the growth dashboard's other axis, from the same distinct
    user-day + cohort machinery as :func:`cohort_retention` (a user is
    *new* on their cohort day, *returning* on every later active
    day)."""
    from ray.data.aggregate import Count, Sum

    attached = _attached_user_days(
        events_ds, user_col=user_col, ts_col=ts_col, bucket_us=bucket_us,
        broadcast_max=broadcast_max, num_partitions=num_partitions)

    def tag_new(b: pa.Table) -> pa.Table:
        is_new = (b["day"].to_numpy()
                  == b["cohort_day"].to_numpy()).astype(np.int64)
        return pa.table({"day": b["day"],
                         "is_new": pa.array(is_new, pa.int64())})

    per_day = _seed(
        attached.map_batches(tag_new, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("day")
        .aggregate(Count(alias_name="n_active"),
                   Sum("is_new", alias_name="n_new")),
        day=-1, n_active=0, n_new=0,
    )

    def finish(b: pa.Table) -> pa.Table:
        keep = pa.array(b["n_active"].to_numpy() > 0)
        act = b["n_active"].cast(pa.int64())
        new = b["n_new"].cast(pa.int64())
        import pyarrow.compute as pc

        return pa.table({
            "day": b["day"],
            "n_active": act,
            "n_new": new,
            "n_returning": pc.subtract(act, new),
        }).filter(keep)

    return per_day.map_batches(finish, batch_format="pyarrow",
                               zero_copy_batch=True)


def oracle_cohort_sql(events_sql: str, *, user_col: str = "user_id",
                      ts_col: str = "ts",
                      bucket_us: int = DAY_US) -> str:
    """DuckDB mirror of :func:`cohort_retention`: distinct user-days,
    per-user MIN day as the cohort, COUNT per (cohort, offset) cell."""
    return f"""
WITH ud AS (
  SELECT DISTINCT {user_col} AS user_id,
         CAST(epoch_us({ts_col}) AS BIGINT) // {bucket_us} AS day
  FROM ({events_sql})
), coh AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id
)
SELECT c.cohort_day, u.day - c.cohort_day AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ud u JOIN coh c ON c.user_id = u.user_id
GROUP BY 1, 2
"""


def oracle_daily_activity_sql(events_sql: str, *,
                              user_col: str = "user_id",
                              ts_col: str = "ts",
                              bucket_us: int = DAY_US) -> str:
    """DuckDB mirror of :func:`daily_activity`."""
    return f"""
WITH ud AS (
  SELECT DISTINCT {user_col} AS user_id,
         CAST(epoch_us({ts_col}) AS BIGINT) // {bucket_us} AS day
  FROM ({events_sql})
), coh AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id
)
SELECT u.day, CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN u.day = c.cohort_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new,
       CAST(COUNT(*) - SUM(CASE WHEN u.day = c.cohort_day THEN 1
                           ELSE 0 END) AS BIGINT) AS n_returning
FROM ud u JOIN coh c ON c.user_id = u.user_id
GROUP BY u.day
"""
