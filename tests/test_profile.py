"""Table profiler (ops/profile.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.profile import oracle_profile_sql, profile_table


def _run(df, int_cols, str_cols):
    import ray.data

    t = profile_table(ray.data.from_pandas(df), int_cols=int_cols,
                      str_cols=str_cols)
    return t.to_pandas().set_index("col_name")


def test_basic_profile(ray_session):
    df = pd.DataFrame({
        "i": np.array([3, 1, 2, 2, 10], np.int64),
        "s": ["b", "a", "a", "c", "c"],
    })
    got = _run(df, ["i"], ["s"])
    assert got.loc["i", "n_rows"] == 5
    assert got.loc["i", "n_distinct"] == 4
    assert got.loc["i", "min_int"] == 1 and got.loc["i", "max_int"] == 10
    assert pd.isna(got.loc["i", "min_str"])
    assert got.loc["s", "n_distinct"] == 3
    assert got.loc["s", "min_str"] == "a" and got.loc["s", "max_str"] == "c"
    assert pd.isna(got.loc["s", "max_int"])


def test_numeric_minmax_not_lexicographic(ray_session):
    # "10" < "9" lexicographically — typed min/max must not fall for it
    df = pd.DataFrame({"i": np.array([9, 10, 100], np.int64)})
    got = _run(df, ["i"], [])
    assert got.loc["i", "min_int"] == 9 and got.loc["i", "max_int"] == 100


def test_nulls_counted_and_excluded_from_distinct(ray_session):
    df = pd.DataFrame({"s": ["a", None, "a", None, "b"]})
    got = _run(df, [], ["s"])
    assert got.loc["s", "n_rows"] == 5
    assert got.loc["s", "n_nulls"] == 2
    assert got.loc["s", "n_distinct"] == 2


def test_wrong_dtype_raises(ray_session):
    import ray.data

    df = pd.DataFrame({"f": [1.5]})
    with pytest.raises(Exception):
        profile_table(ray.data.from_pandas(df), int_cols=["f"],
                      str_cols=[]).to_pandas()


def test_oracle_parity_random(ray_session):
    rng = np.random.default_rng(88)
    n = 4000
    df = pd.DataFrame({
        "a": rng.integers(-10**9, 10**9, n).astype(np.int64),
        "b": rng.integers(0, 50, n).astype(np.int64),
        "s": [f"w{x}" for x in rng.integers(0, 700, n)],
    })
    got = _run(df, ["a", "b"], ["s"]).sort_index()
    con = duckdb.connect()
    con.register("t0", df)
    want = (con.execute(oracle_profile_sql("SELECT * FROM t0",
                                           int_cols=["a", "b"],
                                           str_cols=["s"])).df()
            .set_index("col_name").sort_index())
    for col in ["n_rows", "n_nulls", "n_distinct"]:
        assert got[col].astype(int).tolist() == want[col].astype(int).tolist()
    for c in ["a", "b"]:
        assert int(got.loc[c, "min_int"]) == int(want.loc[c, "min_int"])
        assert int(got.loc[c, "max_int"]) == int(want.loc[c, "max_int"])
    assert got.loc["s", "min_str"] == want.loc["s", "min_str"]
    assert got.loc["s", "max_str"] == want.loc["s", "max_str"]
