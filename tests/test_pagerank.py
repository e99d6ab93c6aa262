"""Integer-exact distributed PageRank (ops/pagerank.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.pagerank import MICRO, oracle_pagerank_sql, pagerank_int


def _run(edges, n_iters=3, **kw):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    out = pagerank_int(ds, n_iters=n_iters, num_partitions=2, **kw)
    return {r["node"]: r["pr_micro"] for r in out.take_all()}


def _ref(edges, n_iters=3, damping=850_000):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    out = {n: 0 for n in nodes}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    pr = {n: MICRO for n in nodes}
    base = MICRO - damping
    for _ in range(n_iters):
        nxt = {n: base for n in nodes}
        for a, b in edges:
            nxt[b] += (pr[a] * damping // MICRO) // outdeg[a]
        pr = nxt
    return pr


@pytest.mark.parametrize("n_iters", [1, 3])
def test_small_graph_matches_reference(ray_session, n_iters):
    edges = [(0, 1), (1, 2), (2, 0), (2, 1), (3, 0)]
    assert _run(edges, n_iters) == _ref(edges, n_iters)


def test_star_graph_hub_dominates(ray_session):
    edges = [(i, 0) for i in range(1, 20)]
    pr = _run(edges)
    assert pr[0] > pr[1]            # hub accumulates mass
    assert len({pr[i] for i in range(1, 20)}) == 1  # leaves identical


def test_oracle_sql_parity(ray_session):
    rng = np.random.default_rng(5)
    edges = sorted({(int(a), int(b)) for a, b in
                    zip(rng.integers(0, 30, 80), rng.integers(0, 30, 80))})
    got = _run(edges)
    con = duckdb.connect()
    con.register("e", pd.DataFrame(edges, columns=["src", "dst"]))
    want = con.execute(
        oracle_pagerank_sql("SELECT src, dst FROM e")).df()
    want_map = dict(zip(want["node"], want["pr_micro"]))
    assert got == {int(k): int(v) for k, v in want_map.items()}


def test_overflow_guard_raises(ray_session):
    """The per-edge multiply pr_micro * damping_micro must fail loudly
    (like the DuckDB oracle) instead of wrapping int64: plant a rank
    beyond the documented ~1.08e13 micro-unit headroom via a giant
    damping and assert OverflowError, not silent wrong ranks."""
    import ray.data

    edges = [(0, 1), (1, 0)]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    with pytest.raises((OverflowError, Exception)) as ei:
        out = pagerank_int(ds, n_iters=2, num_partitions=2,
                           damping_micro=2**62)
        out.take_all()
    assert "int64" in str(ei.value) or "OverflowError" in str(ei.value)


def _ref_dangling(edges, n_iters=3, damping=850_000):
    """Python reference for redistribute_dangling=True."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    pr = {n: MICRO for n in nodes}
    base = MICRO - damping
    for _ in range(n_iters):
        d = sum(pr[n] for n in nodes if n not in outdeg)
        share = (d * damping // MICRO) // len(nodes)
        nxt = {n: base + share for n in nodes}
        for a, b in edges:
            nxt[b] += (pr[a] * damping // MICRO) // outdeg[a]
        pr = nxt
    return pr


@pytest.mark.parametrize("n_iters", [1, 3])
def test_dangling_redistribution_matches_reference(ray_session, n_iters):
    # node 3 and 4 are dangling (destinations only)
    edges = [(0, 1), (1, 2), (2, 3), (0, 4), (1, 4)]
    got = _run(edges, n_iters, redistribute_dangling=True)
    assert got == _ref_dangling(edges, n_iters)
    # and the redistributed total strictly exceeds the leaking variant's
    assert sum(got.values()) > sum(_run(edges, n_iters).values())


def test_dangling_no_dangling_nodes_matches_plain(ray_session):
    """With no dangling nodes the flag must be a no-op."""
    edges = [(0, 1), (1, 2), (2, 0)]
    assert _run(edges, 3, redistribute_dangling=True) == _run(edges, 3)


def test_dangling_oracle_sql_parity(ray_session):
    rng = np.random.default_rng(11)
    # only even nodes emit edges -> odd destinations are dangling
    edges = sorted({(int(a) * 2, int(b)) for a, b in
                    zip(rng.integers(0, 15, 60), rng.integers(0, 30, 60))})
    got = _run(edges, redistribute_dangling=True)
    con = duckdb.connect()
    con.register("e", pd.DataFrame(edges, columns=["src", "dst"]))
    want = con.execute(oracle_pagerank_sql(
        "SELECT src, dst FROM e", redistribute_dangling=True)).df()
    assert got == {int(k): int(v)
                   for k, v in zip(want["node"], want["pr_micro"])}
