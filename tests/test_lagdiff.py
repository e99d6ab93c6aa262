"""Period-over-period deltas (ops/lagdiff.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.lagdiff import (oracle_period_over_period_sql,
                                         period_over_period)


def _run(df, broadcast_max=None):
    import ray.data

    out = period_over_period(ray.data.from_pandas(df), key_col="k",
                             period_col="p", num_partitions=2,
                             broadcast_max=broadcast_max)
    rows = out.take_all()
    return sorted((r["k"], int(r["p"]), int(r["n"]),
                   None if r["prev_n"] is None or pd.isna(r["prev_n"])
                   else int(r["prev_n"]),
                   None if r["delta"] is None or pd.isna(r["delta"])
                   else int(r["delta"]))
                  for r in rows)


def test_adjacent_periods_and_gaps(ray_session):
    # key "a": periods 1 (x2), 2 (x1), 4 (x3) -> 4's prev (3) is absent
    df = pd.DataFrame({
        "k": ["a"] * 6 + ["b"],
        "p": [1, 1, 2, 4, 4, 4, 9],
    })
    assert _run(df) == [
        ("a", 1, 2, None, None),
        ("a", 2, 1, 2, -1),
        ("a", 4, 3, None, None),   # adjacent semantics: NOT LAG-to-2
        ("b", 9, 1, None, None),
    ]


@pytest.mark.parametrize("broadcast_max", [0, 10**6])
def test_oracle_parity_random(ray_session, broadcast_max):
    rng = np.random.default_rng(77)
    n = 800
    df = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], n),
        "p": rng.integers(0, 25, n).astype(np.int64),
    })
    got = _run(df, broadcast_max=broadcast_max)
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_period_over_period_sql(
        "SELECT * FROM t0", key_col="k", period_col="p")).df()

    def norm(v):
        return None if pd.isna(v) else int(v)

    assert got == sorted(
        (k, int(p), int(c), norm(pn), norm(d)) for k, p, c, pn, d in
        zip(want["k"], want["p"], want["n"], want["prev_n"], want["delta"]))


def test_daily_counts_oracle_parity(ray_session):
    import ray.data

    from extract_kit_ray.ops.lagdiff import (daily_counts,
                                             oracle_daily_counts_sql)

    rng = np.random.default_rng(91)
    n = 500
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], n),
        "ts": pd.to_datetime(
            rng.integers(1_600_000_000, 1_600_900_000, n), unit="s"),
    })
    out = daily_counts(ray.data.from_pandas(df), key_col="k", ts_col="ts")
    got = sorted((r["k"], int(r["day"]), int(r["n"]))
                 for r in out.take_all())
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_daily_counts_sql(
        "SELECT * FROM t0", key_col="k", ts_col="ts")).df()
    assert got == sorted((k, int(d), int(c)) for k, d, c in
                         zip(want["k"], want["day"], want["n"]))
