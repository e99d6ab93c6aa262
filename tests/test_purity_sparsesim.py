"""Concentration index and sparse pair dots (ops/purity.py,
ops/sparsesim.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.purity import (group_concentration,
                                        oracle_concentration_sql)
from extract_kit_ray.ops.sparsesim import (oracle_sparse_dots_sql,
                                           sparse_pair_dots)


def test_purity_extremes(ray_session):
    import ray.data

    df = pd.DataFrame({
        "g": ["pure"] * 4 + ["mix"] * 4,
        "c": ["a"] * 4 + ["a", "b", "c", "d"],
    })
    out = {r["g"]: (r["n_rows"], r["purity_ppm"])
           for r in group_concentration(
               ray.data.from_pandas(df), group_col="g", cat_col="c",
               num_partitions=2).take_all()}
    assert out["pure"] == (4, 1_000_000)
    assert out["mix"] == (4, 250_000)


def test_purity_oracle_parity(ray_session):
    import ray.data

    rng = np.random.default_rng(43)
    n = 900
    df = pd.DataFrame({
        "g": rng.choice([f"s{i}" for i in range(12)], n),
        "c": rng.choice(["en", "fr", "de", "es"], n, p=[.6, .2, .1, .1]),
    })
    out = group_concentration(ray.data.from_pandas(df), group_col="g",
                              cat_col="c", num_partitions=3)
    got = sorted((r["g"], int(r["n_rows"]), int(r["purity_ppm"]))
                 for r in out.take_all())
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_concentration_sql(
        "SELECT * FROM t0", group_col="g", cat_col="c")).df()
    assert got == sorted((g, int(n_), int(p)) for g, n_, p in
                         zip(want["g"], want["n_rows"],
                             want["purity_ppm"]))


def test_sparse_dots_oracle_parity(ray_session):
    import ray.data

    rng = np.random.default_rng(47)
    rows = []
    for k in [f"k{i}" for i in range(8)]:
        for it in rng.choice([f"w{j}" for j in range(30)], 12,
                             replace=False):
            rows.append((k, it, int(rng.integers(1, 9))))
    df = pd.DataFrame(rows, columns=["key", "item", "w"])
    out = sparse_pair_dots(ray.data.from_pandas(df), key_col="key",
                           item_col="item", weight_col="w")
    got = sorted((r["key_a"], r["key_b"], int(r["dot"]))
                 for r in out.take_all())
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_sparse_dots_sql(
        "SELECT * FROM t0", key_col="key", item_col="item",
        weight_col="w")).df()
    assert got == sorted((a, b, int(v)) for a, b, v in
                         zip(want["key_a"], want["key_b"], want["dot"]))
    assert len(got) > 0
    # brute check one pair
    a = df[df["key"] == "k0"].set_index("item")["w"]
    b = df[df["key"] == "k1"].set_index("item")["w"]
    dot = int((a * b).dropna().sum())
    found = next((v for ka, kb, v in got if (ka, kb) == ("k0", "k1")), 0)
    assert found == dot


def test_sparse_dots_posting_cap(ray_session):
    import ray.data

    df = pd.DataFrame({"key": [f"k{i}" for i in range(5)],
                       "item": ["hot"] * 5, "w": [1] * 5})
    with pytest.raises(Exception, match="cap"):
        sparse_pair_dots(ray.data.from_pandas(df), key_col="key",
                         item_col="item", weight_col="w",
                         posting_cap=3).take_all()
