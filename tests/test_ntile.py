"""NTILE(k) within groups (ops/ntile.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.ntile import _ntile_of, ntile_in_group, oracle_ntile_sql


def _run(df, k, broadcast_max=None):
    import ray.data

    out = ntile_in_group(ray.data.from_pandas(df), group_col="g",
                         value_col="v", tiebreak_col="id", k=k,
                         num_partitions=2, broadcast_max=broadcast_max)
    return sorted((r["id"], r["tile"]) for r in out.take_all())


def test_ntile_closed_form_matches_sql_definition():
    # 10 rows, 4 tiles -> sizes 3,3,2,2
    rn = np.arange(1, 11, dtype=np.int64)
    cnt = np.full(10, 10, dtype=np.int64)
    assert _ntile_of(rn, cnt, 4).tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    # fewer rows than tiles -> one row per tile
    rn = np.arange(1, 4, dtype=np.int64)
    cnt = np.full(3, 3, dtype=np.int64)
    assert _ntile_of(rn, cnt, 4).tolist() == [1, 2, 3]


def test_basic(ray_session):
    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5, 6],
        "g": ["a"] * 4 + ["b"] * 2,
        "v": [10, 20, 30, 40, 5, 5],  # b has a tie -> id breaks it
    })
    assert _run(df, k=2) == [
        (1, 1), (2, 1), (3, 2), (4, 2), (5, 1), (6, 2)]


@pytest.mark.parametrize("broadcast_max", [0, 10**6])
@pytest.mark.parametrize("k", [3, 4])
def test_oracle_parity_random(ray_session, broadcast_max, k):
    rng = np.random.default_rng(55)
    n = 500
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.choice(["alpha", "beta", "gamma"], n),
        "v": rng.integers(0, 40, n),  # dense values -> real tie pressure
    })
    got = _run(df, k=k, broadcast_max=broadcast_max)
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_ntile_sql(
        "SELECT * FROM t0", group_col="g", value_col="v",
        tiebreak_col="id", k=k)).df()
    assert got == sorted((int(i), int(t)) for i, t in
                         zip(want["id"], want["tile"]))


def test_out_of_range_tiebreak_fails_loudly(ray_session):
    import ray.data

    df = pd.DataFrame({"id": [-1, 2], "g": ["a", "a"], "v": [1, 2]})
    # rank_in_group materializes eagerly, so the per-batch guard fires
    # during construction already
    with pytest.raises(Exception, match="out of"):
        ntile_in_group(ray.data.from_pandas(df), group_col="g",
                       value_col="v", tiebreak_col="id", k=2).take_all()
