"""Per-key running totals (ops/running.py)."""

import duckdb
import numpy as np
import pandas as pd

from extract_kit_ray.ops.running import (oracle_running_total_sql,
                                         running_total)


def _run(df):
    import ray.data

    out = running_total(ray.data.from_pandas(df), key_col="k",
                        order_cols=["t", "i"], value_col="v",
                        num_partitions=2)
    return {(r["k"], r["i"]): r["running"] for r in out.take_all()}


def _mk(rows):
    """rows: (key, order_t, unique_i, value)"""
    return pd.DataFrame({c: np.array([r[j] for r in rows], np.int64)
                         for j, c in enumerate("ktiv")})


def test_basic_prefix(ray_session):
    df = _mk([(1, 10, 1, 5), (1, 20, 2, 7), (1, 30, 3, -2),
              (2, 10, 4, 100)])
    assert _run(df) == {(1, 1): 5, (1, 2): 12, (1, 3): 10, (2, 4): 100}


def test_order_tie_broken_by_unique_col(ray_session):
    df = _mk([(1, 10, 2, 7), (1, 10, 1, 5)])
    assert _run(df) == {(1, 1): 5, (1, 2): 12}


def test_all_rows_returned(ray_session):
    df = _mk([(k, t, k * 100 + t, 1) for k in range(5) for t in range(20)])
    out = _run(df)
    assert len(out) == 100
    assert out[(3, 319)] == 20  # last row of key 3 (t=19)


def test_oracle_parity_random(ray_session):
    rng = np.random.default_rng(73)
    n = 1500
    df = pd.DataFrame({
        "k": rng.integers(0, 25, n).astype(np.int64),
        "t": rng.integers(0, 500, n).astype(np.int64),
        "i": rng.permutation(np.arange(n, dtype=np.int64)),
        "v": rng.integers(-1000, 1000, n).astype(np.int64),
    })
    got = _run(df)
    con = duckdb.connect()
    con.register("r0", df)
    want = con.execute(oracle_running_total_sql(
        "SELECT * FROM r0", key_col="k", order_cols=["t", "i"],
        value_col="v")).df()
    assert got == {(int(k), int(i)): int(r) for k, i, r in
                   zip(want["k"], want["i"], want["running"])}
