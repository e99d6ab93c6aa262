"""Weighted deterministic sampling (ops/sampling.weighted_sample)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.sampling import (sample_hash, weighted_sample,
                                          weighted_sample_sql)


def _run(df, n):
    import ray.data

    out = weighted_sample(ray.data.from_pandas(df),
                          key_col="k", weight_col="w", n=n)
    rows = out.take_all()
    return sorted((r["k"], r["priority"]) for r in rows)


def test_selects_n_smallest_priorities(ray_session):
    df = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                       "w": np.ones(50, dtype=np.int64)})
    got = _run(df, 5)
    prio = sample_hash(np.arange(50)).astype(np.int64) * 1_000_000
    want = sorted(zip(np.arange(50), prio), key=lambda t: (t[1], t[0]))[:5]
    assert got == sorted((int(k), int(p)) for k, p in want)


def test_heavy_weight_wins(ray_session):
    # two keys with identical hash rank order; huge weight flips priority
    df = pd.DataFrame({"k": [1, 2], "w": [1, 10**9]})
    got = _run(df, 1)
    assert got[0][0] == 2  # priority ~ h/1e9 beats h/1


def test_weight_below_one_raises(ray_session):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "w": [0]}))
    with pytest.raises(Exception):
        weighted_sample(ds, key_col="k", weight_col="w", n=1).take_all()


def test_n_below_one_raises(ray_session):
    import ray.data

    with pytest.raises(ValueError):
        weighted_sample(ray.data.from_pandas(pd.DataFrame({"k": [1],
                                                           "w": [1]})),
                        key_col="k", weight_col="w", n=0)


def test_oracle_parity_random(ray_session):
    rng = np.random.default_rng(79)
    df = pd.DataFrame({
        "k": rng.permutation(np.arange(400, dtype=np.int64)),
        "w": rng.integers(1, 1000, 400).astype(np.int64),
    })
    got = _run(df, 25)
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(weighted_sample_sql(
        "SELECT * FROM t0", key_col="k", weight_col="w", n=25)).df()
    assert got == sorted((int(k), int(p)) for k, p in
                         zip(want["k"], want["priority"]))
