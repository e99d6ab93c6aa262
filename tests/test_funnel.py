"""Distributed funnel analysis (ops/funnel.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.funnel import funnel_steps, oracle_funnel_sql


def _mk(rows):
    """rows: (user, ts_seconds, type)"""
    return pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
        "event_type": [r[2] for r in rows],
    })


def _run(df, steps):
    import ray.data

    out = funnel_steps(ray.data.from_pandas(df), steps, num_partitions=2)
    return {r["user_id"]: r["steps_completed"] for r in out.take_all()}


STEPS = ["view", "click", "purchase"]


def test_ordered_completion(ray_session):
    df = _mk([(1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
              (2, 10, "view"), (2, 20, "click"),
              (3, 10, "view"),
              (4, 10, "click")])  # click without a prior view
    assert _run(df, STEPS) == {1: 3, 2: 2, 3: 1, 4: 0}


def test_out_of_order_does_not_count(ray_session):
    df = _mk([(1, 30, "view"), (1, 20, "click"), (1, 10, "purchase")])
    assert _run(df, STEPS) == {1: 1}


def test_strict_ts_ties_block_consecutive_steps(ray_session):
    df = _mk([(1, 10, "view"), (1, 10, "click"), (1, 20, "click")])
    assert _run(df, STEPS) == {1: 2}  # the t=10 click is too early


def test_earliest_completion_is_used(ray_session):
    # late view would block the click; the funnel must use the early one
    df = _mk([(1, 5, "view"), (1, 50, "view"), (1, 10, "click")])
    assert _run(df, STEPS) == {1: 2}


def test_repeated_step_type(ray_session):
    df = _mk([(1, 10, "view"), (1, 20, "view"),
              (2, 10, "view")])
    assert _run(df, ["view", "view"]) == {1: 2, 2: 1}


def test_users_without_funnel_events_absent(ray_session):
    df = _mk([(1, 10, "view"), (2, 10, "other")])
    assert _run(df, STEPS) == {1: 1}


def test_empty_steps_raises(ray_session):
    import ray.data

    with pytest.raises(ValueError):
        funnel_steps(ray.data.from_pandas(_mk([(1, 1, "view")])), [])


def test_oracle_sql_parity_random(ray_session):
    rng = np.random.default_rng(31)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "event_type": rng.choice(
            ["view", "click", "purchase", "error"], n),
    })
    got = _run(df, STEPS)
    con = duckdb.connect()
    con.register("ev0", df)
    want = con.execute(oracle_funnel_sql("SELECT * FROM ev0", STEPS)).df()
    assert got == {int(u): int(s) for u, s in
                   zip(want["user_id"], want["steps_completed"])}
