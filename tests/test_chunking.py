"""Sliding-window chunk spans (ops/chunking.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.chunking import chunk_spans, oracle_chunks_sql


def _run(df, **kw):
    import ray.data

    out = chunk_spans(ray.data.from_pandas(df), size_col="n", **kw)
    return sorted((r["doc_id"], r["chunk_id"], r["start_tok"], r["len_tok"])
                  for r in out.take_all())


def test_short_doc_single_chunk(ray_session):
    df = pd.DataFrame({"doc_id": [1], "n": [5]})
    assert _run(df, window=10, stride=5) == [(1, 0, 0, 5)]


def test_exact_window_single_chunk(ray_session):
    df = pd.DataFrame({"doc_id": [1], "n": [10]})
    assert _run(df, window=10, stride=5) == [(1, 0, 0, 10)]


def test_overlapping_windows_cover_all(ray_session):
    df = pd.DataFrame({"doc_id": [1], "n": [23]})
    got = _run(df, window=10, stride=5)
    assert got == [(1, 0, 0, 10), (1, 1, 5, 10), (1, 2, 10, 10),
                   (1, 3, 15, 8)]
    # coverage: last chunk reaches exactly n
    assert got[-1][2] + got[-1][3] == 23


def test_empty_doc_one_empty_chunk(ray_session):
    df = pd.DataFrame({"doc_id": [7], "n": [0]})
    assert _run(df, window=4) == [(7, 0, 0, 0)]


def test_bad_params_raise(ray_session):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "n": [1]}))
    with pytest.raises(ValueError):
        chunk_spans(ds, size_col="n", window=0)
    with pytest.raises(ValueError):
        chunk_spans(ds, size_col="n", window=4, stride=5)
    with pytest.raises(Exception):
        chunk_spans(ray.data.from_pandas(
            pd.DataFrame({"doc_id": [1], "n": [-1]})),
            size_col="n", window=4).take_all()


def test_oracle_parity_random(ray_session):
    rng = np.random.default_rng(83)
    df = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "n": rng.integers(0, 500, 300).astype(np.int64),
    })
    got = _run(df, window=128, stride=64)
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_chunks_sql(
        "SELECT * FROM t0", size_col="n", window=128, stride=64)).df()
    assert got == sorted(
        (int(d), int(c), int(s), int(l)) for d, c, s, l in
        zip(want["doc_id"], want["chunk_id"], want["start_tok"],
            want["len_tok"]))
