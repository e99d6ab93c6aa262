"""Within-group rank (ops/grouprank.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.grouprank import oracle_rank_sql, rank_in_group


def _run(df, broadcast_max=None, **kw):
    import ray.data

    out = rank_in_group(ray.data.from_pandas(df), num_partitions=2,
                        broadcast_max=broadcast_max, **kw)
    return sorted((r["id"], r["rank"], r["n_group"])
                  for r in out.take_all())


def test_basic_desc_rank(ray_session):
    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "g": ["a", "a", "a", "b"],
        "v": [10, 30, 20, 5],
    })
    assert _run(df, group_col="g", value_col="v") == [
        (1, 3, 3), (2, 1, 3), (3, 2, 3), (4, 1, 1)]


def test_ties_share_rank_and_skip(ray_session):
    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "g": ["a"] * 4,
        "v": [10, 10, 5, 5],
    })
    assert _run(df, group_col="g", value_col="v") == [
        (1, 1, 4), (2, 1, 4), (3, 3, 4), (4, 3, 4)]


def test_ascending(ray_session):
    df = pd.DataFrame({"id": [1, 2], "g": ["a", "a"], "v": [10, 20]})
    assert _run(df, group_col="g", value_col="v", descending=False) == [
        (1, 1, 2), (2, 2, 2)]


@pytest.mark.parametrize("broadcast_max", [0, 10**6])
def test_oracle_parity_random(ray_session, broadcast_max):
    rng = np.random.default_rng(61)
    n = 600
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.choice(["alpha", "beta", "gamma", "delta"], n),
        "v": rng.integers(0, 50, n),  # dense -> plenty of ties
    })
    got = _run(df, broadcast_max=broadcast_max, group_col="g", value_col="v")
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_rank_sql(
        "SELECT * FROM t0", group_col="g", value_col="v")).df()
    assert got == sorted((int(i), int(r), int(s)) for i, r, s in
                         zip(want["id"], want["rank"], want["n_group"]))


def test_int_group_keys(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3], "g": [7, 7, 9], "v": [1, 2, 3]})
    assert _run(df, group_col="g", value_col="v") == [
        (1, 2, 2), (2, 1, 2), (3, 1, 1)]
