"""Multi-source BFS hop labeling (ops/bfs.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.bfs import bfs_hops, oracle_bfs_sql


def _run(edges, seeds, max_hops=3):
    import ray.data

    eds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    sds = ray.data.from_pandas(pd.DataFrame({"node": seeds}))
    out = bfs_hops(eds, sds, max_hops=max_hops, num_partitions=2)
    return {r["node"]: r["hop"] for r in out.take_all()}


def _ref(edges, seeds, max_hops=3):
    """Plain-Python BFS truth."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt
    return dist


def test_chain_graph_hops(ray_session):
    edges = [(i, i + 1) for i in range(6)]
    got = _run(edges, [0], max_hops=3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # beyond max_hops absent


def test_multi_source_takes_min(ray_session):
    edges = [(0, 1), (1, 2), (2, 3), (10, 3)]
    got = _run(edges, [0, 10], max_hops=3)
    assert got == {0: 0, 10: 0, 1: 1, 3: 1, 2: 2}


def test_cycle_does_not_inflate_hops(ray_session):
    edges = [(0, 1), (1, 2), (2, 0)]
    assert _run(edges, [0], max_hops=4) == {0: 0, 1: 1, 2: 2}


def test_max_hops_zero_is_seeds_only(ray_session):
    assert _run([(0, 1)], [0, 5], max_hops=0) == {0: 0, 5: 0}


def test_random_graph_matches_reference(ray_session):
    rng = np.random.default_rng(9)
    edges = sorted({(int(a), int(b)) for a, b in
                    zip(rng.integers(0, 40, 120), rng.integers(0, 40, 120))})
    seeds = [0, 7, 23]
    assert _run(edges, seeds) == _ref(edges, seeds)


def test_oracle_sql_parity(ray_session):
    rng = np.random.default_rng(13)
    edges = sorted({(int(a), int(b)) for a, b in
                    zip(rng.integers(0, 35, 90), rng.integers(0, 35, 90))})
    seeds = [1, 2, 33]
    got = _run(edges, seeds)
    con = duckdb.connect()
    con.register("e", pd.DataFrame(edges, columns=["src", "dst"]))
    con.register("s", pd.DataFrame({"node": seeds}))
    want = con.execute(oracle_bfs_sql(
        "SELECT src, dst FROM e", "SELECT node FROM s")).df()
    assert got == {int(n): int(h)
                   for n, h in zip(want["node"], want["hop"])}


def test_negative_max_hops_raises(ray_session):
    import ray.data

    eds = ray.data.from_pandas(pd.DataFrame({"src": [0], "dst": [1]}))
    sds = ray.data.from_pandas(pd.DataFrame({"node": [0]}))
    with pytest.raises(ValueError):
        bfs_hops(eds, sds, max_hops=-1)
