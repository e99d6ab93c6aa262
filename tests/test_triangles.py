"""Distributed per-node triangle counting (ops/triangles.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.triangles import oracle_triangles_sql, triangle_counts


def _run(edges):
    import ray.data

    eds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    out = triangle_counts(eds, num_partitions=2)
    return {r["node"]: r["triangles"] for r in out.take_all()}


def test_single_triangle(ray_session):
    assert _run([(0, 1), (1, 2), (2, 0)]) == {0: 1, 1: 1, 2: 1}


def test_direction_and_duplicates_collapse(ray_session):
    """Reversed / duplicated / self-loop edges are one undirected set."""
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 0), (1, 2)]
    assert _run(edges) == {0: 1, 1: 1, 2: 1}


def test_triangle_free_graph_empty(ray_session):
    assert _run([(0, 1), (1, 2), (2, 3), (3, 0)]) == {}  # 4-cycle


def test_k4_counts(ray_session):
    """K4 has 4 triangles; every node sits on exactly 3."""
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _run(edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_hub_with_one_closing_edge(ray_session):
    """A star plus one rim edge: only the closed wedge counts, and the
    degree orientation generates wedges at the rim, not the hub."""
    edges = [(0, i) for i in range(1, 8)] + [(1, 2)]
    assert _run(edges) == {0: 1, 1: 1, 2: 1}


def test_oracle_sql_parity_random(ray_session):
    rng = np.random.default_rng(17)
    edges = sorted({(int(a), int(b)) for a, b in
                    zip(rng.integers(0, 30, 200), rng.integers(0, 30, 200))})
    got = _run(edges)
    con = duckdb.connect()
    con.register("e", pd.DataFrame(edges, columns=["src", "dst"]))
    want = con.execute(oracle_triangles_sql("SELECT src, dst FROM e")).df()
    assert got == {int(n): int(t)
                   for n, t in zip(want["node"], want["triangles"])}


def test_id_range_guard(ray_session):
    import ray.data

    eds = ray.data.from_pandas(pd.DataFrame(
        {"src": [2**31], "dst": [1]}))
    with pytest.raises(Exception) as ei:
        triangle_counts(eds, num_partitions=2).take_all()
    assert "2^31" in str(ei.value)
