"""Incremental cross-snapshot dedup (ops/incremental.py): index
build/append, broadcast vs join path equivalence, within-snapshot
duplicates pass through (documented), and composition with exact_dedup."""

import os
import tempfile

import pyarrow as pa
import pytest

from extract_kit_ray.ops.incremental import (build_hash_index,
                                             dedup_against_index)


def _docs(texts, ids):
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


@pytest.fixture()
def index_dir():
    d = tempfile.mkdtemp(prefix="ekray_test_index_")
    yield d
    import shutil

    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("broadcast_max", [None, 0])
def test_new_docs_survive_seen_docs_drop(ray_session, index_dir,
                                         broadcast_max):
    import ray.data

    old = ray.data.from_arrow(_docs(["alpha", "beta", "gamma"], [1, 2, 3]))
    build_hash_index(old, index_dir)
    new = ray.data.from_arrow(
        _docs(["beta", "delta", "alpha", "epsilon"], [10, 11, 12, 13]))
    kwargs = {} if broadcast_max is None else {"broadcast_max": broadcast_max}
    out = dedup_against_index(new, index_dir, **kwargs).to_pandas()
    assert sorted(out["doc_id"]) == [11, 13]
    assert "text_hash" not in out.columns


def test_append_mode_unions_snapshots(ray_session, index_dir):
    import ray.data

    build_hash_index(ray.data.from_arrow(_docs(["a"], [1])), index_dir)
    build_hash_index(ray.data.from_arrow(_docs(["b"], [2])), index_dir,
                     mode="append")
    out = dedup_against_index(
        ray.data.from_arrow(_docs(["a", "b", "c"], [5, 6, 7])),
        index_dir).to_pandas()
    assert sorted(out["doc_id"]) == [7]


def test_overwrite_mode_replaces(ray_session, index_dir):
    import ray.data

    build_hash_index(ray.data.from_arrow(_docs(["a"], [1])), index_dir)
    build_hash_index(ray.data.from_arrow(_docs(["b"], [2])), index_dir)
    out = dedup_against_index(
        ray.data.from_arrow(_docs(["a", "b"], [5, 6])), index_dir).to_pandas()
    assert sorted(out["doc_id"]) == [5]


def test_within_snapshot_dups_pass_through(ray_session, index_dir):
    """Documented contract: the probe does NOT collapse duplicates
    inside the new snapshot — compose with exact_dedup for that."""
    import ray.data

    from extract_kit_ray.ops.dedup import exact_dedup

    build_hash_index(ray.data.from_arrow(_docs(["old"], [1])), index_dir)
    new = ray.data.from_arrow(_docs(["x", "x", "old"], [10, 11, 12]))
    out = dedup_against_index(new, index_dir).to_pandas()
    assert sorted(out["doc_id"]) == [10, 11]
    composed = exact_dedup(
        dedup_against_index(
            ray.data.from_arrow(_docs(["x", "x", "old"], [10, 11, 12])),
            index_dir),
        text_col="text", key_col="doc_id").to_pandas()
    assert sorted(composed["doc_id"]) == [10]


def test_bad_mode_raises(ray_session, index_dir):
    import ray.data

    with pytest.raises(ValueError):
        build_hash_index(ray.data.from_arrow(_docs(["a"], [1])), index_dir,
                         mode="upsert")
