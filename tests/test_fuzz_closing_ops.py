"""Multi-seed randomized parity fuzz for the round-5 closing ops —
each trial re-derives the oracle in DuckDB on a fresh random frame, so
tie patterns, empty groups, and degenerate distributions rotate every
seed (the single-seed parity tests live in the per-module files)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SEEDS = [101, 202, 303]


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_ntile(ray_session, seed):
    import ray.data

    from extract_kit_ray.ops.ntile import ntile_in_group, oracle_ntile_sql

    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    k = int(rng.integers(2, 7))
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.choice(["a", "b", "c", "d", "e"][:rng.integers(1, 5)], n),
        "v": rng.integers(0, rng.integers(2, 30), n),
    })
    out = ntile_in_group(ray.data.from_pandas(df), group_col="g",
                         value_col="v", tiebreak_col="id", k=k,
                         num_partitions=2)
    got = sorted((int(r["id"]), int(r["tile"])) for r in out.take_all())
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_ntile_sql(
        "SELECT * FROM t0", group_col="g", value_col="v",
        tiebreak_col="id", k=k)).df()
    assert got == sorted((int(i), int(t)) for i, t in
                         zip(want["id"], want["tile"]))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_mad(ray_session, seed):
    import ray.data

    from extract_kit_ray.ops.mad import (mad_outliers,
                                         oracle_mad_outliers_sql)

    rng = np.random.default_rng(seed)
    n = int(rng.integers(100, 500))
    mult = int(rng.integers(1, 4))
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.choice(["p", "q", "r"], n),
        "v": rng.integers(0, 40, n) ** 2,  # right-skewed
    })
    out = mad_outliers(ray.data.from_pandas(df), group_col="g",
                       value_col="v", mult=mult, id_cols=("id",),
                       num_partitions=2)
    got = sorted((int(r["id"]), int(r["dev"]), int(r["mad"]))
                 for r in out.take_all())
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_mad_outliers_sql(
        "SELECT * FROM t0", group_col="g", value_col="v", mult=mult,
        id_cols=("id",))).df()
    assert got == sorted((int(i), int(d), int(m)) for i, d, m in
                         zip(want["id"], want["dev"], want["mad"]))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_skyline(ray_session, seed):
    import ray.data

    from extract_kit_ray.ops.skyline import oracle_skyline_sql, skyline2d

    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 600))
    lo = int(rng.integers(2, 50))
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "x": rng.integers(0, lo, n).astype(np.int64),
        "y": rng.integers(0, lo, n).astype(np.int64),
    })
    maxx = bool(rng.integers(0, 2))
    maxy = bool(rng.integers(0, 2))
    out = skyline2d(ray.data.from_pandas(df), x_col="x", y_col="y",
                    maximize_x=maxx, maximize_y=maxy, id_cols=("id",))
    got = sorted(int(r["id"]) for r in out.take_all())
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_skyline_sql(
        "SELECT * FROM t0", x_col="x", y_col="y", maximize_x=maxx,
        maximize_y=maxy, id_cols=("id",))).df()
    assert got == sorted(int(i) for i in want["id"])


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_share_and_purity(ray_session, seed):
    import ray.data

    from extract_kit_ray.ops.purity import (group_concentration,
                                            oracle_concentration_sql)
    from extract_kit_ray.ops.share import oracle_share_sql, share_of_group

    rng = np.random.default_rng(seed)
    n = int(rng.integers(100, 800))
    df = pd.DataFrame({
        "g": rng.choice([f"g{i}" for i in range(rng.integers(1, 9))], n),
        "s": rng.choice([f"s{i}" for i in range(rng.integers(1, 7))], n),
    })
    con = duckdb.connect()
    con.register("t0", df)

    out = share_of_group(ray.data.from_pandas(df), group_col="g",
                         sub_col="s", num_partitions=2)
    got = sorted((r["g"], r["s"], int(r["share_bps"]))
                 for r in out.take_all())
    want = con.execute(oracle_share_sql(
        "SELECT * FROM t0", group_col="g", sub_col="s")).df()
    assert got == sorted((g, s, int(b)) for g, s, b in
                         zip(want["g"], want["s"], want["share_bps"]))

    out2 = group_concentration(ray.data.from_pandas(df), group_col="g",
                               cat_col="s", num_partitions=2)
    got2 = sorted((r["g"], int(r["purity_ppm"])) for r in out2.take_all())
    want2 = con.execute(oracle_concentration_sql(
        "SELECT * FROM t0", group_col="g", cat_col="s")).df()
    assert got2 == sorted((g, int(p)) for g, p in
                          zip(want2["g"], want2["purity_ppm"]))
