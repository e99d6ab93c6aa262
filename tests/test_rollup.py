"""One-pass ROLLUP aggregation (ops/rollup.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.rollup import oracle_rollup_sql, rollup_aggregate


def _key(t):
    return tuple((v is None, repr(v)) for v in t)


def _run(df, group_cols, sum_cols=None):
    import ray.data

    out = rollup_aggregate(ray.data.from_pandas(df), group_cols, sum_cols)
    return sorted((tuple(None if pd.isna(v) else v for v in r.values())
                   for r in out.take_all()), key=_key)


def _oracle(df, group_cols, sum_cols=None):
    con = duckdb.connect()
    con.register("t0", df)
    tbl = con.execute(
        oracle_rollup_sql("SELECT * FROM t0", group_cols, sum_cols)).df()
    return sorted((tuple(None if pd.isna(v) else
                         (int(v) if isinstance(v, (np.integer, float)) else v)
                         for v in row)
                   for row in tbl.itertuples(index=False)), key=_key)


def test_two_level_rollup(ray_session):
    df = pd.DataFrame({
        "src": ["a", "a", "b"],
        "lang": ["en", "fr", "en"],
        "n": [1, 2, 4],
    })
    got = _run(df, ["src", "lang"], ["n"])
    assert got == sorted([
        ("a", "en", 1, 1), ("a", "fr", 1, 2), ("b", "en", 1, 4),
        ("a", None, 2, 3), ("b", None, 1, 4),
        (None, None, 3, 7),
    ], key=_key)


def test_rollup_value_star_does_not_collide(ray_session):
    df = pd.DataFrame({"src": ["*", "x"], "lang": ["en", "en"]})
    got = _run(df, ["src", "lang"])
    assert ("*", "en", 1) in got and ("*", None, 1) in got


def test_input_null_groups_like_sql(ray_session):
    df = pd.DataFrame({"src": ["a", None, None], "lang": ["en", "en", "fr"]})
    assert _run(df, ["src", "lang"]) == _oracle(df, ["src", "lang"])


def test_empty_group_cols_raises(ray_session):
    import ray.data

    with pytest.raises(ValueError):
        rollup_aggregate(ray.data.from_pandas(pd.DataFrame({"a": [1]})), [])


def test_oracle_parity_random(ray_session):
    rng = np.random.default_rng(53)
    n = 700
    df = pd.DataFrame({
        "src": rng.choice(["alpha", "beta", "gamma", "*", "="], n),
        "lang": rng.choice(["en", "fr", "de"], n),
        "n_chars": rng.integers(0, 10_000, n),
    })
    assert (_run(df, ["src", "lang"], ["n_chars"])
            == _oracle(df, ["src", "lang"], ["n_chars"]))


def test_three_level_oracle_parity(ray_session):
    rng = np.random.default_rng(59)
    n = 400
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], n),
        "b": rng.choice(["p", "q", "r"], n),
        "c": rng.choice(["1", "2"], n),
        "v": rng.integers(0, 100, n),
    })
    assert (_run(df, ["a", "b", "c"], ["v"])
            == _oracle(df, ["a", "b", "c"], ["v"]))


def test_cube_two_cols(ray_session):
    df = pd.DataFrame({"src": ["a", "b"], "lang": ["en", "en"]})
    import ray.data

    out = rollup_aggregate(ray.data.from_pandas(df), ["src", "lang"],
                           mode="cube").take_all()
    got = sorted((tuple(None if pd.isna(v) else v for v in r.values())
                  for r in out), key=_key)
    assert got == sorted([
        ("a", "en", 1), ("b", "en", 1),
        ("a", None, 1), ("b", None, 1),
        (None, "en", 2),
        (None, None, 2),
    ], key=_key)


def test_cube_oracle_parity_random(ray_session):
    rng = np.random.default_rng(127)
    n = 500
    df = pd.DataFrame({
        "src": rng.choice(["alpha", "beta", "gamma"], n),
        "lang": rng.choice(["en", "fr"], n),
        "v": rng.integers(0, 50, n),
    })
    import ray.data

    out = rollup_aggregate(ray.data.from_pandas(df), ["src", "lang"],
                           ["v"], mode="cube").take_all()
    got = sorted((tuple(None if pd.isna(x) else x for x in r.values())
                  for r in out), key=_key)
    con = duckdb.connect()
    con.register("t0", df)
    tbl = con.execute(oracle_rollup_sql(
        "SELECT * FROM t0", ["src", "lang"], ["v"], mode="cube")).df()
    want = sorted((tuple(None if pd.isna(x) else
                         (int(x) if isinstance(x, (np.integer, float)) else x)
                         for x in row)
                   for row in tbl.itertuples(index=False)), key=_key)
    assert got == want


def test_bad_mode_raises(ray_session):
    import ray.data

    with pytest.raises(ValueError):
        rollup_aggregate(ray.data.from_pandas(pd.DataFrame({"a": ["x"]})),
                         ["a"], mode="grouping")
