"""Exact per-group quantiles (ops/quantiles.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.quantiles import group_quantiles, oracle_quantiles_sql

QS = {"p50": 500_000, "p90": 900_000, "p99": 990_000}


def _run(df, qs=QS, **kw):
    import ray.data

    out = group_quantiles(ray.data.from_pandas(df), group_col="g",
                          value_col="v", qs_micro=qs, num_partitions=2, **kw)
    return {r["g"]: {k: r[k] for k in list(qs) + ["n_v"]}
            for r in out.take_all()}


def test_small_groups(ray_session):
    df = pd.DataFrame({"g": ["a"] * 4 + ["b"], "v": [10, 20, 30, 40, 7]})
    got = _run(df)
    # n=4: p50 rank ceil(2)=2 -> 20; p90 rank ceil(3.6)=4 -> 40
    assert got["a"] == {"p50": 20, "p90": 40, "p99": 40, "n_v": 4}
    assert got["b"] == {"p50": 7, "p90": 7, "p99": 7, "n_v": 1}


def test_heavy_tie_is_one_histogram_row(ray_session):
    df = pd.DataFrame({"g": ["a"] * 100, "v": [5] * 99 + [1000]})
    got = _run(df)
    assert got["a"]["p50"] == 5 and got["a"]["p99"] == 5
    assert got["a"]["n_v"] == 100


def test_q_one_is_max(ray_session):
    df = pd.DataFrame({"g": ["a"] * 3, "v": [3, 1, 2]})
    assert _run(df, qs={"pmax": 1_000_000}) == {
        "a": {"pmax": 3, "n_v": 3}}


def test_bad_q_raises(ray_session):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"g": ["a"], "v": [1]}))
    with pytest.raises(ValueError):
        group_quantiles(ds, group_col="g", value_col="v", qs_micro={})
    with pytest.raises(ValueError):
        group_quantiles(ds, group_col="g", value_col="v",
                        qs_micro={"bad": 0})


def test_oracle_parity_random(ray_session):
    rng = np.random.default_rng(67)
    n = 900
    df = pd.DataFrame({
        "g": rng.choice(["alpha", "beta", "gamma"], n),
        "v": rng.integers(0, 200, n),
    })
    got = _run(df)
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_quantiles_sql(
        "SELECT * FROM t0", group_col="g", value_col="v",
        qs_micro=QS)).df()
    assert got == {r.g: {"p50": int(r.p50), "p90": int(r.p90),
                         "p99": int(r.p99), "n_v": int(r.n_v)}
                   for r in want.itertuples()}


def test_matches_numpy_type1_quantile(ray_session):
    rng = np.random.default_rng(71)
    v = rng.integers(0, 1000, 501)
    df = pd.DataFrame({"g": ["a"] * len(v), "v": v})
    got = _run(df)["a"]
    s = np.sort(v)
    for alias, qm in QS.items():
        t = max(1, -(-qm * len(v) // 1_000_000))
        assert got[alias] == s[t - 1]
