"""Pivoted conditional aggregation (ops/pivot.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.pivot import oracle_pivot_sql, pivot_counts


def _run(df, cats, **kw):
    import ray.data

    out = pivot_counts(ray.data.from_pandas(df), key_col="k",
                       cat_col="c", categories=cats, **kw)
    return out.to_pandas().sort_values("k").reset_index(drop=True)


def test_basic_wide(ray_session):
    df = pd.DataFrame({"k": [1, 1, 1, 2], "c": ["a", "a", "b", "b"]})
    got = _run(df, ["a", "b"])
    assert got["n_a"].tolist() == [2, 0]
    assert got["n_b"].tolist() == [1, 1]


def test_unlisted_ignored_but_key_kept(ray_session):
    df = pd.DataFrame({"k": [1, 2], "c": ["a", "zzz"]})
    got = _run(df, ["a", "b"])
    assert got["k"].tolist() == [1, 2]
    assert got.loc[1, "n_a"] == 0 and got.loc[1, "n_b"] == 0


def test_other_catchall(ray_session):
    df = pd.DataFrame({"k": [1, 1, 1], "c": ["a", "x", "y"]})
    got = _run(df, ["a"], other_col="n_other")
    assert got["n_a"].tolist() == [1]
    assert got["n_other"].tolist() == [2]


def test_duplicate_categories_rejected(ray_session):
    import ray.data

    df = pd.DataFrame({"k": [1], "c": ["a"]})
    with pytest.raises(ValueError):
        pivot_counts(ray.data.from_pandas(df), key_col="k", cat_col="c",
                     categories=["a", "a"])


def test_oracle_parity_random(ray_session):
    rng = np.random.default_rng(55)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 80, n).astype(np.int64),
        "c": rng.choice(["view", "click", "buy", "weird"], n),
    })
    got = _run(df, ["view", "click", "buy"], other_col="n_rest")
    con = duckdb.connect()
    con.register("p0", df)
    want = con.execute(oracle_pivot_sql(
        "SELECT k, c FROM p0", key_col="k", cat_col="c",
        categories=["view", "click", "buy"], other_col="n_rest")).df()
    want = want.sort_values("k").reset_index(drop=True)
    for col in ["n_view", "n_click", "n_buy", "n_rest"]:
        assert got[col].astype(int).tolist() == want[col].astype(int).tolist()
