"""2-D skyline and co-engagement pairs (ops/skyline.py,
ops/coengage.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.coengage import (coengagement_pairs,
                                          oracle_coengagement_sql)
from extract_kit_ray.ops.skyline import (_local_skyline, oracle_skyline_sql,
                                         skyline2d)


def _brute_skyline(df, maximize_x, maximize_y):
    sx = 1 if maximize_x else -1
    sy = 1 if maximize_y else -1
    pts = [(sx * x, sy * y) for x, y in zip(df["x"], df["y"])]
    keep = []
    for i, (xi, yi) in enumerate(pts):
        dominated = any((xj >= xi and yj >= yi and (xj > xi or yj > yi))
                        for j, (xj, yj) in enumerate(pts) if j != i)
        if not dominated:
            keep.append(i)
    return sorted((int(df["id"].iloc[i]), int(df["x"].iloc[i]),
                   int(df["y"].iloc[i])) for i in keep)


def test_local_skyline_brute_parity():
    rng = np.random.default_rng(13)
    for trial in range(20):
        n = int(rng.integers(1, 60))
        df = pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            "x": rng.integers(0, 12, n).astype(np.int64),  # dense: ties
            "y": rng.integers(0, 12, n).astype(np.int64),
        })
        keep = _local_skyline(df.rename(columns={"x": "__sx",
                                                 "y": "__sy"}),
                              "__sx", "__sy")
        got = sorted((int(i), int(x), int(y)) for i, x, y in
                     zip(df["id"][keep], df["x"][keep], df["y"][keep]))
        assert got == _brute_skyline(df, True, True), trial


@pytest.mark.parametrize("maxx,maxy", [(True, True), (False, True)])
def test_skyline_oracle_parity(ray_session, maxx, maxy):
    import ray.data

    rng = np.random.default_rng(29)
    n = 800
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "x": rng.integers(0, 100, n).astype(np.int64),
        "y": rng.integers(0, 100, n).astype(np.int64),
    })
    out = skyline2d(ray.data.from_pandas(df), x_col="x", y_col="y",
                    maximize_x=maxx, maximize_y=maxy, id_cols=("id",))
    got = sorted((int(r["id"]), int(r["x"]), int(r["y"]))
                 for r in out.take_all())
    assert got == _brute_skyline(df, maxx, maxy)
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_skyline_sql(
        "SELECT * FROM t0", x_col="x", y_col="y", maximize_x=maxx,
        maximize_y=maxy, id_cols=("id",))).df()
    assert got == sorted((int(i), int(x), int(y)) for i, x, y in
                         zip(want["id"], want["x"], want["y"]))


def test_skyline_keeps_duplicate_frontier_points(ray_session):
    import ray.data

    df = pd.DataFrame({"id": [1, 2, 3], "x": [5, 5, 1],
                       "y": [9, 9, 1]})
    out = skyline2d(ray.data.from_pandas(df), x_col="x", y_col="y",
                    id_cols=("id",))
    assert sorted(r["id"] for r in out.take_all()) == [1, 2]


def test_coengagement_oracle_parity(ray_session):
    import ray.data

    rng = np.random.default_rng(37)
    n = 1200
    df = pd.DataFrame({
        "user_id": rng.integers(0, 80, n).astype(np.int64),
        "event_type": rng.choice(["buy", "view", "cart", "ship"], n),
    })
    out = coengagement_pairs(ray.data.from_pandas(df),
                             user_col="user_id", cat_col="event_type")
    got = sorted((r["type_a"], r["type_b"], int(r["n_users"]))
                 for r in out.take_all())
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_coengagement_sql(
        "SELECT * FROM t0", user_col="user_id",
        cat_col="event_type")).df()
    assert got == sorted((a, b, int(c)) for a, b, c in
                         zip(want["type_a"], want["type_b"],
                             want["n_users"]))
    assert len(got) > 0


def test_coengagement_single_category(ray_session):
    import ray.data

    df = pd.DataFrame({"user_id": [1, 2], "event_type": ["a", "a"]})
    out = coengagement_pairs(ray.data.from_pandas(df),
                             user_col="user_id", cat_col="event_type")
    assert out.take_all() == []
