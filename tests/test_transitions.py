"""Event transition counts (ops/transitions.py)."""

import duckdb
import numpy as np
import pandas as pd

from extract_kit_ray.ops.transitions import (oracle_transitions_sql,
                                             transition_counts)


def _mk(rows):
    """rows: (user, ts_seconds, event_id, type)"""
    return pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
        "event_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
    })


def _run(df):
    import ray.data

    out = transition_counts(ray.data.from_pandas(df), num_partitions=2)
    return {(r["prev_type"], r["next_type"]): r["n"]
            for r in out.take_all()}


def test_basic_chain(ray_session):
    df = _mk([(1, 10, 1, "view"), (1, 20, 2, "click"),
              (1, 30, 3, "purchase"),
              (2, 10, 4, "view"), (2, 20, 5, "click")])
    assert _run(df) == {("view", "click"): 2, ("click", "purchase"): 1}


def test_no_cross_user_pairs(ray_session):
    df = _mk([(1, 10, 1, "a"), (2, 20, 2, "b")])
    assert _run(df) == {}


def test_ts_tie_broken_by_event_id(ray_session):
    df = _mk([(1, 10, 2, "b"), (1, 10, 1, "a")])
    assert _run(df) == {("a", "b"): 1}


def test_self_transitions_counted(ray_session):
    df = _mk([(1, 10, 1, "x"), (1, 20, 2, "x"), (1, 30, 3, "x")])
    assert _run(df) == {("x", "x"): 2}


def test_oracle_parity_random(ray_session):
    rng = np.random.default_rng(107)
    n = 900
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.to_datetime(rng.integers(0, 5000, n), unit="s"),
        "event_id": rng.permutation(np.arange(n, dtype=np.int64)),
        "event_type": rng.choice(["view", "click", "purchase", "error"], n),
    })
    got = _run(df)
    con = duckdb.connect()
    con.register("e0", df)
    want = con.execute(oracle_transitions_sql("SELECT * FROM e0")).df()
    assert got == {(p, x): int(c) for p, x, c in
                   zip(want["prev_type"], want["next_type"], want["n"])}
