"""Integer-exact distributed HITS (ops/hits.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.hits import MICRO, hits_int, oracle_hits_sql


def _run(edges, n_iters=2):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    out = hits_int(ds, n_iters=n_iters, num_partitions=2)
    return {r["node"]: (r["auth_micro"], r["hub_micro"])
            for r in out.take_all()}


def _ref(edges, n_iters=2):
    """Pure-Python mirror of the L1 half-step arithmetic."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    hub = {n: MICRO for n in nodes}
    auth = None
    for _ in range(n_iters):
        raw = {n: 0 for n in nodes}
        for a, b in edges:
            raw[b] += hub[a]
        total = sum(raw.values())
        auth = {n: raw[n] * MICRO // total for n in nodes}
        raw = {n: 0 for n in nodes}
        for a, b in edges:
            raw[a] += auth[b]
        total = sum(raw.values())
        hub = {n: raw[n] * MICRO // total for n in nodes}
    return {n: (auth[n], hub[n]) for n in nodes}


@pytest.mark.parametrize("n_iters", [1, 2])
def test_small_graph_matches_reference(ray_session, n_iters):
    edges = [(0, 1), (1, 2), (2, 0), (2, 1), (3, 0)]
    assert _run(edges, n_iters) == _ref(edges, n_iters)


def test_star_graph_roles(ray_session):
    """Leaves all point at node 0: node 0 is the pure authority (zero
    hub score), leaves are pure identical hubs (zero authority)."""
    edges = [(i, 0) for i in range(1, 10)]
    got = _run(edges)
    auth0, hub0 = got[0]
    assert auth0 == MICRO and hub0 == 0
    leaf_scores = {got[i] for i in range(1, 10)}
    assert len(leaf_scores) == 1
    la, lh = leaf_scores.pop()
    assert la == 0 and lh == MICRO // 9


def test_oracle_sql_parity(ray_session):
    rng = np.random.default_rng(7)
    edges = sorted({(int(a), int(b)) for a, b in
                    zip(rng.integers(0, 30, 80), rng.integers(0, 30, 80))})
    got = _run(edges)
    con = duckdb.connect()
    con.register("e", pd.DataFrame(edges, columns=["src", "dst"]))
    want = con.execute(oracle_hits_sql("SELECT src, dst FROM e")).df()
    assert got == {int(n): (int(a), int(h)) for n, a, h in
                   zip(want["node"], want["auth_micro"], want["hub_micro"])}


def test_l1_mass_conservation(ray_session):
    """Each score family sums to MICRO minus at most n floor losses."""
    rng = np.random.default_rng(3)
    edges = sorted({(int(a), int(b)) for a, b in
                    zip(rng.integers(0, 20, 50), rng.integers(0, 20, 50))})
    got = _run(edges)
    n = len(got)
    for idx in (0, 1):
        s = sum(v[idx] for v in got.values())
        assert MICRO - n <= s <= MICRO


def test_self_loop_single_node(ray_session):
    assert _run([(5, 5)]) == {5: (MICRO, MICRO)}
