"""Co-citation counts (ops/cocitation.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.cocitation import (cocitation_counts,
                                            oracle_cocitation_sql)


def _run(df, **kw):
    import ray.data

    out = cocitation_counts(ray.data.from_pandas(df), num_partitions=2, **kw)
    return {(r["a"], r["b"]): r["n_common"] for r in out.take_all()}


def test_two_common_sources(ray_session):
    df = pd.DataFrame({"src": [1, 1, 2, 2, 3],
                       "dst": [10, 20, 10, 20, 10]})
    assert _run(df) == {(10, 20): 2}


def test_duplicate_edges_collapse(ray_session):
    df = pd.DataFrame({"src": [1, 1, 1], "dst": [10, 10, 20]})
    assert _run(df) == {(10, 20): 1}


def test_min_count_filters(ray_session):
    df = pd.DataFrame({"src": [1, 1, 2, 2, 3, 3],
                       "dst": [10, 20, 10, 20, 10, 30]})
    assert _run(df, min_count=2) == {(10, 20): 2}


def test_cap_keeps_smallest_dsts(ray_session):
    # src 1 links to 10,20,30; cap 2 keeps 10,20 only
    df = pd.DataFrame({"src": [1, 1, 1], "dst": [30, 10, 20]})
    assert _run(df, max_out_degree=2) == {(10, 20): 1}


def test_hub_error(ray_session):
    df = pd.DataFrame({"src": np.zeros(60, dtype=np.int64),
                       "dst": np.arange(60, dtype=np.int64)})
    with pytest.raises(Exception):
        _run(df, hub_error_degree=50)
    assert len(_run(df, max_out_degree=5)) == 10


@pytest.mark.parametrize("cap", [None, 4])
def test_oracle_parity_random(ray_session, cap):
    rng = np.random.default_rng(97)
    n = 1500
    df = pd.DataFrame({"src": rng.integers(0, 80, n),
                       "dst": rng.integers(0, 50, n)})
    got = _run(df, min_count=2, max_out_degree=cap)
    con = duckdb.connect()
    con.register("e0", df)
    want = con.execute(oracle_cocitation_sql(
        "SELECT * FROM e0", min_count=2, max_out_degree=cap)).df()
    assert got == {(int(a), int(b)): int(c) for a, b, c in
                   zip(want["a"], want["b"], want["n_common"])}


def _run_recip(df):
    import ray.data

    from extract_kit_ray.ops.cocitation import reciprocal_links

    out = reciprocal_links(ray.data.from_pandas(df))
    return sorted((r["a"], r["b"]) for r in out.take_all())


def test_reciprocal_basic(ray_session):
    df = pd.DataFrame({"src": [1, 2, 1, 3, 4],
                       "dst": [2, 1, 3, 5, 4]})
    # 1<->2 mutual; 1->3 one-way; 3->5 one-way; 4->4 self-loop dropped
    assert _run_recip(df) == [(1, 2)]


def test_reciprocal_duplicates_collapse(ray_session):
    df = pd.DataFrame({"src": [1, 1, 2, 2], "dst": [2, 2, 1, 1]})
    assert _run_recip(df) == [(1, 2)]


def test_reciprocal_oracle_parity(ray_session):
    from extract_kit_ray.ops.cocitation import oracle_reciprocal_sql

    rng = np.random.default_rng(113)
    n = 2000
    df = pd.DataFrame({"src": rng.integers(0, 60, n),
                       "dst": rng.integers(0, 60, n)})
    got = _run_recip(df)
    con = duckdb.connect()
    con.register("e1", df)
    want = con.execute(oracle_reciprocal_sql("SELECT * FROM e1")).df()
    assert got == sorted((int(a), int(b)) for a, b in
                         zip(want["a"], want["b"]))
