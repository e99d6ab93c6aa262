"""Per-key interval union / gaps-and-islands (ops/intervals.py)."""

import duckdb
import numpy as np
import pandas as pd

from extract_kit_ray.ops.intervals import (interval_union_per_key,
                                           oracle_interval_union_sql)


def _run(df):
    import ray.data

    out = interval_union_per_key(ray.data.from_pandas(df), key_col="k",
                                 start_col="s", end_col="e",
                                 num_partitions=2)
    return {r["key"]: (r["n_islands"], r["covered"])
            for r in out.take_all()}


def _mk(rows):
    """rows: (key, start, end)"""
    return pd.DataFrame({"k": np.array([r[0] for r in rows], np.int64),
                         "s": np.array([r[1] for r in rows], np.int64),
                         "e": np.array([r[2] for r in rows], np.int64)})


def test_disjoint_islands(ray_session):
    df = _mk([(1, 0, 10), (1, 20, 30), (2, 5, 6)])
    assert _run(df) == {1: (2, 20), 2: (1, 1)}


def test_overlap_merges(ray_session):
    df = _mk([(1, 0, 10), (1, 5, 20), (1, 15, 25)])
    assert _run(df) == {1: (1, 25)}


def test_touching_merges(ray_session):
    # end == next start: one island (strict > rule)
    df = _mk([(1, 0, 10), (1, 10, 20)])
    assert _run(df) == {1: (1, 20)}


def test_contained_interval(ray_session):
    # an interval fully inside another must not end the island early
    df = _mk([(1, 0, 100), (1, 10, 20), (1, 50, 120)])
    assert _run(df) == {1: (1, 120)}


def test_duplicate_rows_idempotent(ray_session):
    df = _mk([(1, 0, 10), (1, 0, 10), (1, 0, 10)])
    assert _run(df) == {1: (1, 10)}


def test_oracle_parity_random(ray_session):
    rng = np.random.default_rng(41)
    n = 1200
    s = rng.integers(0, 10_000, n)
    df = pd.DataFrame({"k": rng.integers(0, 30, n).astype(np.int64),
                       "s": s.astype(np.int64),
                       "e": (s + rng.integers(0, 400, n)).astype(np.int64)})
    got = _run(df)
    con = duckdb.connect()
    con.register("iv0", df)
    want = con.execute(oracle_interval_union_sql(
        "SELECT k AS key, s, e FROM iv0")).df()
    assert got == {int(k): (int(n_), int(c)) for k, n_, c in
                   zip(want["key"], want["n_islands"], want["covered"])}
