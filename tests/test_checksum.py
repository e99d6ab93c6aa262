"""Order-invariant corpus checksum (ops/checksum.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.checksum import (corpus_checksum,
                                          oracle_checksum_sql)


def _chk(df):
    import ray.data

    t = corpus_checksum(ray.data.from_pandas(df), cols=["i", "t"])
    return (t["n_rows"][0].as_py(), t["checksum"][0].as_py())


def _df(rows):
    return pd.DataFrame({"i": np.array([r[0] for r in rows], np.int64),
                         "t": [r[1] for r in rows]})


def test_order_invariant(ray_session):
    rows = [(1, "a"), (2, "b"), (3, "c"), (-4, "d")]
    assert _chk(_df(rows)) == _chk(_df(rows[::-1]))


def test_detects_mutation_drop_and_dup(ray_session):
    base = _chk(_df([(1, "a"), (2, "b")]))
    assert _chk(_df([(1, "a"), (2, "x")])) != base     # mutated
    assert _chk(_df([(1, "a")])) != base               # dropped
    assert _chk(_df([(1, "a"), (2, "b"), (2, "b")])) != base  # duplicated


def test_unsupported_dtype_raises(ray_session):
    import ray.data

    df = pd.DataFrame({"i": [1], "t": ["a"], "f": [1.5]})
    with pytest.raises(TypeError):
        corpus_checksum(ray.data.from_pandas(df), cols=["i", "f"])


def test_oracle_parity_random(ray_session):
    rng = np.random.default_rng(21)
    n = 2000
    df = pd.DataFrame({
        "i": rng.integers(-10**12, 10**12, n).astype(np.int64),
        "t": ["d" + str(x) + ("é" if x % 7 == 0 else "") for x in range(n)],
    })
    got = _chk(df)
    con = duckdb.connect()
    con.register("c0", df)
    want = con.execute(oracle_checksum_sql(
        "SELECT i, t FROM c0", cols=["i", "t"])).fetchone()
    assert got == (int(want[0]), int(want[1]))


def test_empty_corpus(ray_session):
    got = _chk(_df([]))
    con = duckdb.connect()
    want = con.execute(oracle_checksum_sql(
        "SELECT 1 AS i, 'x' AS t WHERE false", cols=["i", "t"])).fetchone()
    assert got == (int(want[0]), int(want[1])) == (0, 0)
