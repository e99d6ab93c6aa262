"""Group-wise argmax (ops/keepbest.py): winner selection vs a
single-process reference, direction flags, string and int keys,
map-side-combine row bound, and the total-order determinism contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from extract_kit_ray.ops.keepbest import keep_best


def _tbl(keys, scores, ids):
    return pa.table({"k": keys, "score": pa.array(scores, pa.int64()),
                     "doc_id": pa.array(ids, pa.int64())})


def _ref(keys, scores, ids, descending=True):
    df = pd.DataFrame({"k": keys, "score": scores, "doc_id": ids})
    df = df.sort_values(["score", "doc_id"],
                        ascending=[not descending, True])
    return df.drop_duplicates("k").set_index("k")


@pytest.mark.parametrize("keys", [
    ["a", "b", "a", "c", "b", "a"],
    [1, 2, 1, 3, 2, 1],
])
def test_keep_best_max_per_key(ray_session, keys):
    import ray.data

    scores = [5, 7, 9, 1, 7, 2]
    ids = [10, 11, 12, 13, 14, 15]
    ds = ray.data.from_arrow(_tbl(keys, scores, ids)).repartition(3)
    out = keep_best(ds, key_col="k", order_cols=["score", "doc_id"],
                    descending=[True, False]).to_pandas()
    ref = _ref(keys, scores, ids)
    assert len(out) == len(ref)
    for r in out.itertuples():
        assert ref.loc[r.k, "doc_id"] == r.doc_id, r


def test_keep_best_ascending(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_tbl(["x", "x", "y"], [4, 2, 8], [1, 2, 3]))
    out = keep_best(ds, key_col="k", order_cols=["score", "doc_id"],
                    descending=[False, False]).to_pandas()
    got = {r.k: r.doc_id for r in out.itertuples()}
    assert got == {"x": 2, "y": 3}


def test_keep_best_tie_break_deterministic(ray_session):
    import ray.data

    # equal scores: lowest doc_id must win regardless of partitioning
    keys = ["u"] * 40
    scores = [7] * 40
    ids = list(range(100, 140))
    for parts in (1, 4, 16):
        ds = ray.data.from_arrow(_tbl(keys, scores, ids)).repartition(parts)
        out = keep_best(ds, key_col="k",
                        order_cols=["score", "doc_id"],
                        descending=[True, False]).to_pandas()
        assert list(out["doc_id"]) == [100]


def test_mapside_combine_bounds_shuffle_rows(ray_session):
    import ray.data

    # one batch with k distinct keys reduces to exactly k rows before
    # the shuffle: the partial fold IS drop_duplicates per batch
    from extract_kit_ray.ops.keepbest import _fold_factory

    df = pd.DataFrame({"k": ["a", "a", "b"] * 100,
                       "score": range(300),
                       "doc_id": range(300)})
    fold = _fold_factory("k", ["score", "doc_id"], [False, True])
    assert len(fold(df)) == 2


def test_descending_length_guard():
    with pytest.raises(ValueError):
        keep_best(None, key_col="k", order_cols=["a", "b"],
                  descending=[True])
