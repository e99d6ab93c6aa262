"""Sequence packing operator (ops/packing.py): next-fit semantics,
oversize handling, shard locality, cross-process bucket stability."""

import numpy as np
import pyarrow as pa

from extract_kit_ray.ops.packing import next_fit_pack, pack_sizes


def test_pack_sizes_basic():
    # capacity 10: [4,4,4] -> first two share, third opens bin 1
    assert pack_sizes(np.array([4, 4, 4]), 10).tolist() == [0, 0, 1]


def test_pack_sizes_exact_fit():
    assert pack_sizes(np.array([5, 5, 1]), 10).tolist() == [0, 0, 1]


def test_pack_sizes_oversize_own_bin():
    # 25 > capacity: own bin; following docs start fresh
    assert pack_sizes(np.array([3, 25, 3, 3]), 10).tolist() == [0, 1, 2, 2]
    # oversize first
    assert pack_sizes(np.array([99, 1]), 10).tolist() == [0, 1]


def test_pack_sizes_next_fit_not_first_fit():
    # next-fit never reopens a closed bin: the trailing 2 goes into the
    # CURRENT bin (with 9) even though bin 0 had room for it
    assert pack_sizes(np.array([8, 9, 1]), 10).tolist() == [0, 1, 1]


def test_pack_sizes_empty_and_single():
    assert pack_sizes(np.array([], dtype=np.int64), 10).tolist() == []
    assert pack_sizes(np.array([7]), 10).tolist() == [0]


def test_next_fit_pack_shard_local(ray_session):
    import ray.data

    # two sources interleaved; shard size 100 (default) -> one shard each
    n = 60
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(["a" if i % 2 == 0 else "b" for i in range(n)]),
        "sz": pa.array([40] * n, pa.int64()),
    })
    out = next_fit_pack(ray.data.from_arrow(tbl), capacity=100,
                        size_col="sz").to_pandas()
    assert len(out) == n
    # within each source: 2 docs of 40 per 100-bin (3rd would hit 120)
    for src in ("a", "b"):
        g = out[out.source == src].sort_values("doc_id")
        assert g["bin_id"].tolist() == [i // 2 for i in range(len(g))]
    # determinism across runs
    out2 = next_fit_pack(ray.data.from_arrow(tbl), capacity=100,
                         size_col="sz").to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_next_fit_pack_shard_boundaries(ray_session):
    import ray.data

    # shard_docs=10: doc 9 and doc 10 are in different shards, so the
    # bin counter must reset at doc 10 even though the bin had room
    tbl = pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "source": pa.array(["s"] * 20),
        "sz": pa.array([1] * 20, pa.int64()),
    })
    out = next_fit_pack(ray.data.from_arrow(tbl), capacity=1000,
                        size_col="sz", shard_docs=10).to_pandas()
    g = out.sort_values("doc_id")
    assert g[g.doc_id < 10]["bin_id"].tolist() == [0] * 10
    assert g[g.doc_id >= 10]["bin_id"].tolist() == [0] * 10
    assert set(g["shard"]) == {0, 1}
