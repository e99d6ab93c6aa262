"""Group-quantile gate (ops/quantiles.filter_above_group_quantile)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.quantiles import (filter_above_group_quantile,
                                           oracle_filter_quantile_sql)


def _run(df, q, broadcast_max=None):
    import ray.data

    out = filter_above_group_quantile(
        ray.data.from_pandas(df), group_col="g", value_col="v",
        q_micro=q, broadcast_max=broadcast_max, num_partitions=2)
    return sorted((r["id"], r["g"], r["v"]) for r in out.take_all())


def test_median_gate(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3, 4],
                       "g": ["a"] * 4, "v": [10, 20, 30, 40]})
    # p50 of n=4 -> rank 2 -> 20; keep v >= 20
    assert _run(df, 500_000) == [(2, "a", 20), (3, "a", 30), (4, "a", 40)]


def test_per_group_cuts_differ(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3, 4],
                       "g": ["a", "a", "b", "b"], "v": [1, 100, 50, 60]})
    got = _run(df, 1_000_000)  # max per group
    assert got == [(2, "a", 100), (4, "b", 60)]


@pytest.mark.parametrize("broadcast_max", [0, 10**6])
def test_oracle_parity_random(ray_session, broadcast_max):
    rng = np.random.default_rng(103)
    n = 700
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.choice(["alpha", "beta", "gamma"], n),
        "v": rng.integers(0, 300, n),
    })
    got = _run(df, 900_000, broadcast_max=broadcast_max)
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_filter_quantile_sql(
        "SELECT * FROM t0", group_col="g", value_col="v",
        q_micro=900_000, select="r.id, r.g, r.v")).df()
    assert got == sorted((int(i), g, int(v)) for i, g, v in
                         zip(want["id"], want["g"], want["v"]))
