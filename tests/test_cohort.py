"""Cohort retention (ops/cohort.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.cohort import DAY_US, cohort_retention, oracle_cohort_sql

DAY_S = 86_400


def _mk(rows):
    """rows: (user, ts_seconds)"""
    return pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
    })


def _run(df, **kw):
    import ray.data

    out = cohort_retention(ray.data.from_pandas(df), num_partitions=2, **kw)
    return {(r["cohort_day"], r["day_offset"]): r["n_users"]
            for r in out.take_all()}


def test_basic_triangle(ray_session):
    df = _mk([(1, 0), (1, DAY_S), (1, 2 * DAY_S),
              (2, 0), (2, 2 * DAY_S),
              (3, DAY_S)])
    assert _run(df) == {(0, 0): 2, (0, 1): 1, (0, 2): 2, (1, 0): 1}


def test_same_day_events_count_once(ray_session):
    df = _mk([(1, 10), (1, 20), (1, DAY_S + 5), (1, DAY_S + 6)])
    assert _run(df) == {(0, 0): 1, (0, 1): 1}


def test_weekly_buckets(ray_session):
    df = _mk([(1, 0), (1, 8 * DAY_S)])
    assert _run(df, bucket_us=7 * DAY_US) == {(0, 0): 1, (0, 1): 1}


def test_bad_bucket_raises(ray_session):
    import ray.data

    with pytest.raises(ValueError):
        cohort_retention(ray.data.from_pandas(_mk([(1, 0)])), bucket_us=0)


@pytest.mark.parametrize("broadcast_max", [0, 10**6])
def test_oracle_parity_random(ray_session, broadcast_max):
    rng = np.random.default_rng(47)
    n = 800
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.to_datetime(rng.integers(0, 30 * DAY_S, n), unit="s"),
    })
    got = _run(df, broadcast_max=broadcast_max)
    con = duckdb.connect()
    con.register("ev0", df)
    want = con.execute(oracle_cohort_sql("SELECT * FROM ev0")).df()
    assert got == {(int(c), int(o)): int(n) for c, o, n in
                   zip(want["cohort_day"], want["day_offset"],
                       want["n_users"])}


def _run_daily(df, **kw):
    import ray.data

    from extract_kit_ray.ops.cohort import daily_activity

    out = daily_activity(ray.data.from_pandas(df), num_partitions=2, **kw)
    return {r["day"]: (r["n_active"], r["n_new"], r["n_returning"])
            for r in out.take_all()}


def test_daily_activity_basic(ray_session):
    df = _mk([(1, 0), (2, 0), (1, DAY_S), (3, DAY_S)])
    assert _run_daily(df) == {0: (2, 2, 0), 1: (2, 1, 1)}


@pytest.mark.parametrize("broadcast_max", [0, 10**6])
def test_daily_activity_oracle_parity(ray_session, broadcast_max):
    from extract_kit_ray.ops.cohort import oracle_daily_activity_sql

    rng = np.random.default_rng(109)
    n = 800
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.to_datetime(rng.integers(0, 30 * DAY_S, n), unit="s"),
    })
    got = _run_daily(df, broadcast_max=broadcast_max)
    con = duckdb.connect()
    con.register("ev1", df)
    want = con.execute(
        oracle_daily_activity_sql("SELECT * FROM ev1")).df()
    assert got == {int(d): (int(a), int(nw), int(r)) for d, a, nw, r in
                   zip(want["day"], want["n_active"], want["n_new"],
                       want["n_returning"])}
