"""MAD outlier gate, ratio-to-report, moment sketch (ops/mad.py,
ops/share.py, ops/moments.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.mad import mad_outliers, oracle_mad_outliers_sql
from extract_kit_ray.ops.moments import group_moments, oracle_moments_sql
from extract_kit_ray.ops.share import oracle_share_sql, share_of_group


def _heavy_tailed(seed=31, n=700):
    rng = np.random.default_rng(seed)
    v = rng.integers(90, 110, n)
    spikes = rng.random(n) < 0.05
    v = np.where(spikes, rng.integers(500, 2000, n), v)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.choice(["aa", "bb", "cc"], n),
        "v": v.astype(np.int64),
    })


@pytest.mark.parametrize("broadcast_max", [0, 10**6])
def test_mad_oracle_parity(ray_session, broadcast_max):
    import ray.data

    df = _heavy_tailed()
    out = mad_outliers(ray.data.from_pandas(df), group_col="g",
                       value_col="v", mult=2, id_cols=("id",),
                       broadcast_max=broadcast_max, num_partitions=2)
    got = sorted((int(r["id"]), r["g"], int(r["v"]), int(r["med"]),
                  int(r["dev"]), int(r["mad"])) for r in out.take_all())
    assert len(got) > 5  # the spikes must actually be flagged
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_mad_outliers_sql(
        "SELECT id AS doc_id, g, v FROM t0", group_col="g",
        value_col="v", mult=2, id_cols=("doc_id",))).df()
    assert got == sorted(
        (int(i), g, int(v), int(m), int(d), int(md)) for i, g, v, m, d, md
        in zip(want["doc_id"], want["g"], want["v"], want["med"],
               want["dev"], want["mad"]))


@pytest.mark.parametrize("broadcast_max", [0, 10**6])
def test_share_oracle_parity(ray_session, broadcast_max):
    import ray.data

    rng = np.random.default_rng(41)
    n = 900
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], n, p=[0.8, 0.2]),
        "s": rng.choice(["s1", "s2", "s3", "s4"], n),
    })
    out = share_of_group(ray.data.from_pandas(df), group_col="g",
                         sub_col="s", broadcast_max=broadcast_max,
                         num_partitions=2)
    got = sorted((r["g"], r["s"], int(r["n"]), int(r["n_group"]),
                  int(r["share_bps"])) for r in out.take_all())
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_share_sql(
        "SELECT * FROM t0", group_col="g", sub_col="s")).df()
    assert got == sorted(
        (g, s, int(n_), int(t), int(b)) for g, s, n_, t, b in
        zip(want["g"], want["s"], want["n"], want["n_group"],
            want["share_bps"]))
    # shares of a group sum to <= 10000 (floor) and > 10000 - n_subs
    by_g = {}
    for g, s, n_, t, b in got:
        by_g.setdefault(g, []).append(b)
    for g, bps in by_g.items():
        assert 10_000 - len(bps) < sum(bps) <= 10_000


def test_moments_oracle_parity(ray_session):
    import ray.data

    rng = np.random.default_rng(59)
    n = 800
    df = pd.DataFrame({
        "g": rng.choice(["p", "q"], n),
        "x": rng.integers(0, 1000, n).astype(np.int64),
        "y": rng.integers(-50, 50, n).astype(np.int64),  # negatives too
    })
    out = group_moments(ray.data.from_pandas(df), group_col="g",
                        x_col="x", y_col="y")
    got = sorted((r["g"], r["n"], r["sum_x"], r["sum_y"], r["sum_xx"],
                  r["sum_yy"], r["sum_xy"]) for r in out.take_all())
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_moments_sql(
        "SELECT * FROM t0", group_col="g", x_col="x", y_col="y")).df()
    cols = ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
    assert got == sorted((row["g"], *[int(row[c]) for c in cols])
                         for _, row in want.iterrows())
    # cross-check one group against numpy
    sub = df[df["g"] == "p"]
    row = next(r for r in got if r[0] == "p")
    assert row[1] == len(sub)
    assert row[4] == int((sub["x"].astype(object) ** 2).sum())


def test_moments_overflow_guard(ray_session):
    import ray.data

    big = np.int64(2**32)
    df = pd.DataFrame({"g": ["a"] * 3, "x": [big] * 3, "y": [1, 2, 3]})
    with pytest.raises(Exception, match="int64|OverflowError"):
        group_moments(ray.data.from_pandas(df), group_col="g",
                      x_col="x", y_col="y").take_all()


def test_mad_oracle_value_col_named_n(ray_session):
    """Regression: value_col='n' must not shadow the oracle's internal
    window count (the alias collision that zeroed anomalous_days)."""
    import ray.data

    rng = np.random.default_rng(71)
    m = 300
    df = pd.DataFrame({
        "g": rng.choice(["t1", "t2"], m),
        "n": np.where(rng.random(m) < 0.1,
                      rng.integers(500, 900, m),
                      rng.integers(95, 105, m)).astype(np.int64),
        "day": np.arange(m, dtype=np.int64),
    })
    out = mad_outliers(ray.data.from_pandas(df), group_col="g",
                       value_col="n", mult=2, id_cols=("day",),
                       num_partitions=2)
    got = sorted((int(r["day"]), r["g"], int(r["n"]), int(r["med"]),
                  int(r["dev"]), int(r["mad"])) for r in out.take_all())
    assert len(got) > 10
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_mad_outliers_sql(
        "SELECT * FROM t0", group_col="g", value_col="n", mult=2,
        id_cols=("day",))).df()
    assert got == sorted(
        (int(i), g, int(v), int(m_), int(d), int(md)) for i, g, v, m_, d, md
        in zip(want["day"], want["g"], want["n"], want["med"],
               want["dev"], want["mad"]))
