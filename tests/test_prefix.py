"""Distributed prefix scan (ops/prefix.py): running-sum exactness vs a
single-process reference, block-boundary offsets, budget edge cases,
pruning behavior, and input validation."""

import numpy as np
import pyarrow as pa
import pytest

from extract_kit_ray.ops.prefix import budget_select


def _ref_select(vals: np.ndarray, keys: np.ndarray, budget: int):
    """Single-process reference: sort by (val DESC, key ASC), cumsum,
    keep cum <= budget."""
    order = np.lexsort((keys, -vals))
    v, k = vals[order], keys[order]
    cum = np.cumsum(v)
    keep = cum <= budget
    return k[keep], v[keep], cum[keep]


def _make_ds(ray_data, vals, keys, blocks=7):
    tbl = pa.table({"key": pa.array(keys, pa.int64()),
                    "val": pa.array(vals, pa.int64())})
    return ray_data.from_arrow(tbl).repartition(blocks)


def _run(ds, budget):
    out = budget_select(ds, value_col="val", budget=budget,
                        sort_cols=["val", "key"], descending=[True, False],
                        cum_col="cum").to_pandas()
    if out.empty:  # Ray surfaces an all-empty Dataset as a 0-column frame
        return out
    return out.sort_values("cum").reset_index(drop=True)


def test_budget_select_matches_reference(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 500, size=2000).astype(np.int64)
    keys = np.arange(2000, dtype=np.int64)
    ds = _make_ds(ray.data, vals, keys, blocks=13)
    budget = int(vals.sum() // 3)
    out = _run(ds, budget)
    rk, rv, rc = _ref_select(vals, keys, budget)
    assert out["key"].to_numpy().tolist() == rk.tolist()
    assert out["val"].to_numpy().tolist() == rv.tolist()
    assert out["cum"].to_numpy().tolist() == rc.tolist()


def test_budget_select_block_boundary_offsets(ray_session):
    """Every row identical value: the cut lands mid-block and the
    cross-block offsets must be exact (off-by-one-block would show as a
    wrong cum or wrong count)."""
    import ray.data

    n, v, budget = 100, 7, 7 * 33 + 3  # 33 rows fit, 3 tokens of slack
    ds = _make_ds(ray.data, np.full(n, v, np.int64),
                  np.arange(n, dtype=np.int64), blocks=9)
    out = _run(ds, budget)
    assert len(out) == 33
    assert out["cum"].to_numpy().tolist() == (7 * np.arange(1, 34)).tolist()
    # equal values -> key ascending is the tie order
    assert out["key"].to_numpy().tolist() == list(range(33))


def test_budget_select_edges(ray_session):
    import ray.data

    vals = np.array([5, 3, 9], dtype=np.int64)
    keys = np.array([1, 2, 3], dtype=np.int64)
    ds = _make_ds(ray.data, vals, keys, blocks=3)
    # budget 0: nothing fits (all values positive)
    assert len(_run(ds, 0)) == 0
    # budget >= total: everything, cum hits the total
    out = _run(ds, 17)
    assert len(out) == 3 and int(out["cum"].iloc[-1]) == 17
    # budget cuts exactly at a row boundary: that row stays
    out = _run(ds, 14)  # 9 + 5 = 14, next (3) would be 17
    assert out["key"].to_numpy().tolist() == [3, 1]


def test_budget_select_zero_value_rows_kept_at_frontier(ray_session):
    """A zero-value row sitting exactly at cum == budget must be kept
    (cum <= budget), including when its block starts at offset ==
    budget — the prune condition is o <= budget, not <."""
    import ray.data

    vals = np.array([10, 0, 0], dtype=np.int64)
    keys = np.array([1, 2, 3], dtype=np.int64)
    ds = _make_ds(ray.data, vals, keys, blocks=3)
    out = _run(ds, 10)
    assert sorted(out["key"].to_numpy().tolist()) == [1, 2, 3]


def test_budget_select_negative_value_raises(ray_session):
    import ray
    import ray.data

    ds = _make_ds(ray.data, np.array([4, -1], dtype=np.int64),
                  np.array([1, 2], dtype=np.int64), blocks=1)
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        _run(ds, 10)


def test_budget_select_negative_budget_raises(ray_session):
    import ray.data

    ds = _make_ds(ray.data, np.array([1], dtype=np.int64),
                  np.array([1], dtype=np.int64), blocks=1)
    with pytest.raises(ValueError, match="budget"):
        budget_select(ds, value_col="val", budget=-1,
                      sort_cols=["val", "key"], descending=[True, False])
