"""Integer-exact k-means (ops/kmeans.py) + SemDeDup (ops/semdedup.py)
+ hash_split (ops/sampling.py): quantization contract, DuckDB-oracle
parity on a synthetic corpus, empty-cluster handling, planted-twin
semantic dedup with keep-min direction, and split determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from extract_kit_ray.ops.kmeans import (
    MICRO, OFFSET, kmeans_assign, kmeans_fit, kmeans_labels,
    oracle_kmeans_sql, quantize_matrix,
)


def _unit_rows(n, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def _emb_table(vecs, ids=None):
    n = len(vecs)
    ids = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids)
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in vecs],
                              pa.list_(pa.float32())),
    })


def test_quantize_round_half_up_and_offset():
    col = pa.array([[0.1234567], [-0.9999995], [1.0]], pa.list_(pa.float32()))
    q = quantize_matrix(col)
    v = np.array([0.1234567, -0.9999995, 1.0], dtype=np.float32)
    exp = np.floor(v.astype(np.float64) * MICRO + 0.5).astype(np.int64) + OFFSET
    assert q.ravel().tolist() == exp.tolist()
    assert (q >= 0).all()


def test_quantize_respects_list_slices():
    col = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                   pa.list_(pa.float32())).slice(1, 2)
    q = quantize_matrix(col)
    assert q.shape == (2, 2)
    assert q[0, 0] == 3 * MICRO + OFFSET


def test_quantize_rejects_out_of_range():
    col = pa.array([[-5.0]], pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="quantization contract"):
        quantize_matrix(col)


def test_kmeans_matches_duckdb_oracle(ray_session, tmp_path):
    import duckdb
    import pyarrow.parquet as pq
    import ray.data

    tbl = _emb_table(_unit_rows(120, dim=8))
    pq.write_table(tbl, str(tmp_path / "emb.parquet"))
    ds = ray.data.read_parquet(str(tmp_path / "emb.parquet")).repartition(5)
    got = kmeans_labels(ds, k=4, n_iters=3).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("embeddings", tbl)
    exp = con.execute(oracle_kmeans_sql(dim=8, k=4, n_iters=3)).df()
    exp = exp.sort_values("vec_id").reset_index(drop=True)
    assert got["cluster"].tolist() == exp["cluster"].tolist()
    assert got["cluster"].nunique() > 1


def test_kmeans_assign_ties_go_to_lowest_cluster(ray_session):
    import ray.data

    # two identical centroids: every row is equidistant -> cluster 0
    C = np.full((2, 3), OFFSET, dtype=np.int64)
    ds = ray.data.from_arrow(_emb_table(_unit_rows(10, dim=3)))
    out = kmeans_assign(ds, C).to_pandas()
    assert (out["cluster"] == 0).all()


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    import ray.data

    # k=3 over 3 distinct points plus many copies of two of them: after
    # round 1 the third centroid may lose membership; fit must not
    # divide by zero and must return 3 rows of centroids
    base = _unit_rows(3, dim=4, seed=1)
    vecs = np.concatenate([base, np.repeat(base[:2], 20, axis=0)])
    ds = ray.data.from_arrow(_emb_table(vecs))
    C = kmeans_fit(ds, k=3, n_iters=4)
    assert C.shape == (3, 4)
    assert (C >= 0).all()


def test_kmeans_fit_k_exceeds_corpus(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_emb_table(_unit_rows(3, dim=4)))
    with pytest.raises(ValueError, match="exceeds corpus"):
        kmeans_fit(ds, k=8, n_iters=1)


def test_semantic_dedup_planted_twins(ray_session):
    import ray.data

    from extract_kit_ray.ops.semdedup import semantic_dedup

    vecs = _unit_rows(60, dim=8, seed=3)
    ids = np.arange(60, dtype=np.int64)
    # twins: +1000 for ids % 10 == 0 (copy drops), -1000 for ids % 10
    # == 5 (ORIGINAL drops — keep-min direction)
    hi_src = ids[ids % 10 == 0]
    lo_src = ids[ids % 10 == 5]
    all_vecs = np.concatenate([vecs, vecs[hi_src], vecs[lo_src]])
    all_ids = np.concatenate([ids, hi_src + 1000, lo_src - 1000])
    ds = ray.data.from_arrow(_emb_table(all_vecs, all_ids)).repartition(4)

    kept, dropped = semantic_dedup(ds, k=3, n_iters=2, threshold=0.99)
    got = sorted(kept.to_pandas()["vec_id"])
    exp = sorted([int(i) for i in ids if i % 10 != 5] +
                 [int(i) - 1000 for i in lo_src])
    assert got == exp
    # dropped map points each evicted key at its survivor
    dm = {int(r.vec_id): int(r.kept_as) for r in dropped.itertuples()}
    for s in hi_src:
        assert dm[int(s) + 1000] == int(s)
    for s in lo_src:
        assert dm[int(s)] == int(s) - 1000


def test_semantic_dedup_no_dups_keeps_everything(ray_session):
    import ray.data

    from extract_kit_ray.ops.semdedup import semantic_dedup

    ds = ray.data.from_arrow(_emb_table(_unit_rows(40, dim=8, seed=9)))
    kept, dropped = semantic_dedup(ds, k=2, n_iters=1, threshold=0.99)
    assert len(dropped) == 0
    assert sorted(kept.to_pandas()["vec_id"]) == list(range(40))


def test_semantic_dedup_hot_cluster_cap_bounds_pairs(ray_session):
    import ray.data

    from extract_kit_ray.ops.semdedup import semantic_dedup

    # 500 identical vectors: uncapped would expand ~125k pairs; the cap
    # keeps the component intact (star edges) and still drops all but
    # the min key
    v = _unit_rows(1, dim=8)[0]
    vecs = np.tile(v, (500, 1))
    ds = ray.data.from_arrow(_emb_table(vecs)).repartition(4)
    kept, dropped = semantic_dedup(ds, k=1, n_iters=1, threshold=0.99,
                                   max_cluster_members=32)
    assert kept.to_pandas()["vec_id"].tolist() == [0]
    assert len(dropped) == 499
    assert (dropped["kept_as"] == 0).all()


def test_hash_split_matches_sql_and_is_stable(ray_session):
    import duckdb
    import ray.data

    from extract_kit_ray.ops.sampling import hash_split, hash_split_sql

    ids = np.array([0, 1, 7, 999, -5, 2**40, -(2**40), 123456789],
                   dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64())})
    w = {"train": 800, "val": 100, "test": 100}
    out = hash_split(ray.data.from_arrow(tbl), key_col="doc_id",
                     weights=w).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.execute(
        f"SELECT doc_id, {hash_split_sql('doc_id', w)} AS split FROM t").df()
    got = dict(zip(out["doc_id"], out["split"]))
    want = dict(zip(exp["doc_id"], exp["split"]))
    assert got == want
    # repartitioning must not move any row's split (hash, not position)
    out2 = hash_split(ray.data.from_arrow(tbl).repartition(3),
                      key_col="doc_id", weights=w).to_pandas()
    assert dict(zip(out2["doc_id"], out2["split"])) == got


def test_hash_split_rejects_bad_weights():
    from extract_kit_ray.ops.sampling import hash_split

    with pytest.raises(ValueError, match="sum to denom"):
        hash_split(None, key_col="k", weights={"a": 1, "b": 2})
