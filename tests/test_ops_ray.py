"""Ray tests for the scale ops: dedup family, similarity search,
multimodal plumbing, text analysis — over the driver's sf0.001 tables
plus purpose-built duplicate corpora."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dup_docs(ray_session):
    """Small corpus with exact and near duplicates planted."""
    import ray.data

    base = (
        "the quick brown fox jumps over the lazy dog near the old stone "
        "bridge by the river bank every single morning in summer"
    )
    near = base.replace("morning", "evening")  # 1-word change -> near-dup
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},               # exact dup of 1
        {"doc_id": 3, "text": near},               # near dup of 1
        {"doc_id": 4, "text": "completely different content about machine "
                              "learning pipelines and arrow batches at scale"},
        {"doc_id": 5, "text": base},               # exact dup of 1
        {"doc_id": 6, "text": "another unique document mentioning rivers "
                              "but sharing almost no full shingles at all"},
    ]
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_exact_dedup(dup_docs):
    from extract_kit_ray.ops.dedup import exact_dedup

    kept = sorted(r["doc_id"] for r in exact_dedup(dup_docs).take_all())
    assert kept == [1, 3, 4, 6]  # min doc_id wins per distinct text


def test_minhash_lsh_dedup(dup_docs):
    from extract_kit_ray.ops.dedup import minhash_lsh_dedup

    df = minhash_lsh_dedup(dup_docs, threshold=0.6)
    by_id = df.set_index("doc_id")
    # exact dups cluster with 1
    assert by_id.loc[2, "cluster_rep"] == 1 and bool(by_id.loc[2, "is_dup"])
    assert by_id.loc[5, "cluster_rep"] == 1
    # near dup clusters with 1 at threshold 0.6
    assert by_id.loc[3, "cluster_rep"] == 1
    # unique docs stay their own rep
    assert not bool(by_id.loc[4, "is_dup"]) and not bool(by_id.loc[6, "is_dup"])


def test_simhash_candidates(dup_docs):
    from extract_kit_ray.ops.dedup import simhash_candidates

    pairs = simhash_candidates(dup_docs, max_hamming=3).to_pandas()
    got = {tuple(sorted((int(a), int(b)))) for a, b in zip(pairs["key_a"], pairs["key_b"])}
    assert (1, 2) in got and (1, 5) in got and (2, 5) in got  # exact dups: hamming 0
    assert (1, 4) not in got


def test_ngram_jaccard_verification():
    from extract_kit_ray.ops.dedup import ngram_jaccard, verify_pairs_jaccard

    a = "one two three four five six seven"
    b = "one two three four five six eight"
    assert 0.5 < ngram_jaccard(a, b) < 1.0
    assert ngram_jaccard(a, a) == 1.0
    pairs = pd.DataFrame({"key_a": [1], "key_b": [2]})
    out = verify_pairs_jaccard(pairs, {1: a, 2: b}, threshold=0.5)
    assert len(out) == 1 and 0.5 <= out["jaccard"][0] <= 1.0


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data

    from extract_kit_ray.ops.similarity import brute_force_topk

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    import pyarrow.parquet as pq

    ref = pq.read_table(f"{SF}/embeddings.parquet")
    mat = np.asarray(ref["embedding"].to_pylist(), dtype=np.float32)
    ids = np.asarray(ref["vec_id"].to_pylist(), dtype=np.int64)
    queries = mat[:3]

    out = brute_force_topk(ds, queries, k=5, concurrency=2)
    # numpy oracle
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    scores = qn @ norm.T
    for q in range(3):
        got = out[out["query_id"] == q]["vec_id"].tolist()
        order = np.lexsort((ids, -scores[q]))
        expect = ids[order][:5].tolist()
        assert got == expect, f"query {q}: {got} != {expect}"
        # self should be its own nearest neighbor
        assert got[0] == ids[q]


def test_lsh_topk_recall(ray_session):
    import ray.data

    from extract_kit_ray.ops.similarity import brute_force_topk, lsh_topk

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    import pyarrow.parquet as pq

    mat = np.asarray(pq.read_table(f"{SF}/embeddings.parquet")["embedding"].to_pylist(),
                     dtype=np.float32)
    queries = mat[:5]
    exact = brute_force_topk(ds, queries, k=5, concurrency=2)
    ds2 = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    # n_bits sized to the corpus: 2^4 = 16 buckets over 500 vectors, so a
    # query probes ~5/16 of the corpus — the scale knob is n_bits, not code
    approx = lsh_topk(ds2, queries, k=5, n_bits=4, concurrency=2)
    # recall@5 of the approximate result vs exact
    recalls = []
    for q in range(5):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / 5)
    assert sum(recalls) / len(recalls) >= 0.4, recalls
    # the trivially-correct neighbor (self) must be found
    for q in range(5):
        a = approx[approx["query_id"] == q]
        assert len(a) > 0


def test_ivf_topk_recall(ray_session):
    import ray.data

    from extract_kit_ray.ops.similarity import brute_force_topk, ivf_topk

    import pyarrow.parquet as pq

    mat = np.asarray(pq.read_table(f"{SF}/embeddings.parquet")["embedding"].to_pylist(),
                     dtype=np.float32)
    queries = mat[:5]
    exact = brute_force_topk(
        ray.data.read_parquet(f"{SF}/embeddings.parquet"), queries, k=5, concurrency=2)
    approx = ivf_topk(
        ray.data.read_parquet(f"{SF}/embeddings.parquet"), queries, k=5,
        n_lists=8, n_probe=4, train_sample=mat, concurrency=2)
    recalls = []
    for q in range(5):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / 5)
    assert sum(recalls) / len(recalls) >= 0.4, recalls
    # determinism: same call -> same neighbor sets
    approx2 = ivf_topk(
        ray.data.read_parquet(f"{SF}/embeddings.parquet"), queries, k=5,
        n_lists=8, n_probe=4, train_sample=mat, concurrency=2)
    assert approx[["query_id", "vec_id"]].values.tolist() == \
        approx2[["query_id", "vec_id"]].values.tolist()


def test_embedding_near_dups(ray_session):
    import ray.data

    from extract_kit_ray.ops.similarity import embedding_near_dups

    base = np.eye(8, dtype=np.float32)
    rows = []
    for i in range(8):
        rows.append({"vec_id": i, "embedding": base[i].tolist()})
    rows.append({"vec_id": 100, "embedding": (base[0] + 0.01).tolist()})  # near dup of 0
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    pairs = embedding_near_dups(ds, threshold=0.95, n_bits=4, concurrency=2)
    got = {(int(a), int(b)) for a, b in zip(pairs["key_a"], pairs["key_b"])}
    assert (0, 100) in got


def test_multimodal_feature_stage(ray_session):
    import ray.data

    from extract_kit_ray.ops.multimodal import extract_media_features, make_media_table

    tbl = make_media_table(40)
    ds = ray.data.from_arrow(tbl)
    out = extract_media_features(ds, model="pixtral", concurrency=2).take_all()
    assert len(out) == 40
    ok = [r for r in out if r["valid"]]
    bad = [r for r in out if not r["valid"]]
    assert bad and all(r["error"] for r in bad)  # empty payloads fail as data
    for r in ok:
        assert len(r["features"]) == 32
        assert r["target_width"] * r["target_height"] <= 1024 * 1024 + 2048
    # determinism
    out2 = extract_media_features(ray.data.from_arrow(tbl), model="pixtral",
                                  concurrency=2).take_all()
    a = {r["media_id"]: list(r["features"]) for r in out}
    b = {r["media_id"]: list(r["features"]) for r in out2}
    assert a == b


def test_textops_stages(ray_session):
    import ray.data

    from extract_kit_ray.ops.textops import (
        LangIdStage,
        fingerprint_batch,
        quality_batch,
        token_count_batch,
    )

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = (
        ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=2)
        .map_batches(token_count_batch, batch_format="pyarrow")
        .map_batches(quality_batch, batch_format="pyarrow")
        .map_batches(fingerprint_batch, batch_format="pyarrow")
        .take_all()
    )
    assert len(out) == 500
    for r in out[:50]:
        assert r["pred_lang"] in ("en", "fr", "de", "es", "unknown")
        assert r["n_tokens_ws"] == len((r["text"] or "").split())
        assert 0.0 <= r["q_quality_score"] <= 1.0
        assert isinstance(r["fingerprint"], int)


def test_lsh_multiprobe_recall_improves(ray_session):
    """probe_bits=2 must find at least as much as probe_bits=1 at high
    n_bits (multi-probe decouples recall from bucket count)."""
    import pyarrow.parquet as pq
    import ray.data

    from extract_kit_ray.ops.similarity import brute_force_topk, lsh_topk

    mat = np.asarray(pq.read_table(f"{SF}/embeddings.parquet")["embedding"].to_pylist(),
                     dtype=np.float32)
    queries = mat[:4]
    exact = brute_force_topk(
        ray.data.read_parquet(f"{SF}/embeddings.parquet"), queries, k=5, concurrency=2)

    def recall(approx):
        rs = []
        for q in range(4):
            e = set(exact[exact["query_id"] == q]["vec_id"])
            a = set(approx[approx["query_id"] == q]["vec_id"])
            rs.append(len(e & a) / 5)
        return sum(rs) / len(rs)

    r1 = recall(lsh_topk(ray.data.read_parquet(f"{SF}/embeddings.parquet"),
                         queries, k=5, n_bits=8, probe_bits=1, concurrency=2))
    r2 = recall(lsh_topk(ray.data.read_parquet(f"{SF}/embeddings.parquet"),
                         queries, k=5, n_bits=8, probe_bits=2, concurrency=2))
    assert r2 >= r1


def test_ivf_no_sample_path(ray_session):
    """ivf_topk with no explicit train_sample draws a deterministic
    hash-based corpus sample and still returns k neighbors per query."""
    import pyarrow.parquet as pq
    import ray.data

    from extract_kit_ray.ops.similarity import ivf_topk

    mat = np.asarray(pq.read_table(f"{SF}/embeddings.parquet")["embedding"].to_pylist(),
                     dtype=np.float32)
    out = ivf_topk(ray.data.read_parquet(f"{SF}/embeddings.parquet"),
                   mat[:3], k=5, n_lists=8, n_probe=4, concurrency=2)
    assert set(out["query_id"]) == {0, 1, 2}
    for q in range(3):
        assert len(out[out["query_id"] == q]) == 5


def test_minhash_distributed_matches_driver(dup_docs, ray_session):
    """The corpus-scale path (join verification + distributed min-label
    propagation) must produce the same clustering as the driver path."""
    from extract_kit_ray.ops.dedup import minhash_lsh_dedup, minhash_lsh_dedup_distributed

    a = minhash_lsh_dedup(dup_docs, threshold=0.6).sort_values("doc_id").reset_index(drop=True)
    b = minhash_lsh_dedup_distributed(dup_docs, threshold=0.6, num_partitions=2)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a[["doc_id", "cluster_rep", "is_dup"]].values.tolist() == \
        b[["doc_id", "cluster_rep", "is_dup"]].values.tolist()


def test_minhash_distributed_on_documents(ray_session):
    import ray.data

    from extract_kit_ray.ops.dedup import minhash_lsh_dedup_distributed

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = minhash_lsh_dedup_distributed(ds, threshold=0.8, num_partitions=2)
    assert len(out) == 500
    assert (out["cluster_rep"] <= out["doc_id"]).all()  # rep is the min key


def test_minhash_dedup_ds_writeout(dup_docs, ray_session, tmp_path):
    """The Dataset-returning corpus-scale path (round-4 verdict #2):
    labels are consumed via count + write_parquet + read-back with NO
    to_pandas anywhere, and the read-back table matches the collecting
    wrapper row-for-row."""
    import ray.data

    from extract_kit_ray.ops.dedup import minhash_lsh_dedup, minhash_lsh_dedup_ds

    labels = minhash_lsh_dedup_ds(dup_docs, threshold=0.6, num_partitions=2)
    out = str(tmp_path / "labels")
    labels.write_parquet(out)
    back = (ray.data.read_parquet(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    ref = (minhash_lsh_dedup(dup_docs, threshold=0.6)
           .sort_values("doc_id").reset_index(drop=True))
    cols = ["doc_id", "cluster_rep", "is_dup"]
    assert back[cols].values.tolist() == ref[cols].values.tolist()


def test_default_num_partitions():
    """Partition default derives from the cluster (round-4 verdict #4):
    cpus/2 with a floor of 8 (the measured small-regime fixed cost is
    linear in partitions — see config docstring), env-overridable,
    explicit values pass through resolve."""
    from extract_kit_ray.config import default_num_partitions, resolve_num_partitions

    assert default_num_partitions(env={"EKRAY_NUM_PARTITIONS": "24"}) == 24
    with pytest.raises(ValueError):
        default_num_partitions(env={"EKRAY_NUM_PARTITIONS": "0"})
    with pytest.raises(ValueError):
        default_num_partitions(env={"EKRAY_NUM_PARTITIONS": "many"})
    derived = default_num_partitions(env={})
    assert derived >= 8        # floor
    assert resolve_num_partitions(4, env={}) == 4
    assert resolve_num_partitions(None, env={}) == derived


def test_exact_dedup_join_fallback(dup_docs):
    """Adversarial path: broadcast_max=0 forces the distributed
    left_outer-join keep-decision; result must equal the broadcast
    path's on a corpus that is mostly duplicates."""
    from extract_kit_ray.ops.dedup import exact_dedup

    kept = sorted(r["doc_id"] for r in
                  exact_dedup(dup_docs, broadcast_max=0,
                              num_partitions=2).take_all())
    assert kept == [1, 3, 4, 6]


def test_exact_dedup_join_fallback_all_dups(ray_session):
    """Fixture corpus x2 (every text duplicated) through the join path:
    the dup-cluster table is corpus-sized, exactly the regime the
    broadcast guard exists for."""
    import ray.data

    from extract_kit_ray.ops.dedup import exact_dedup

    rows = [{"doc_id": i, "text": f"document body number {i % 50}"}
            for i in range(100)]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    kept = sorted(r["doc_id"] for r in
                  exact_dedup(ds, broadcast_max=0, num_partitions=2).take_all())
    assert kept == list(range(50))


def test_minhash_distributed_join_completion(dup_docs):
    """broadcast_max=0 drives BOTH guarded fallbacks (full-table verify
    joins + left_outer label completion); clustering must match the
    broadcast path bit-for-bit."""
    from extract_kit_ray.ops.dedup import minhash_lsh_dedup_distributed

    a = minhash_lsh_dedup_distributed(dup_docs, threshold=0.6, num_partitions=2)
    b = minhash_lsh_dedup_distributed(dup_docs, threshold=0.6, num_partitions=2,
                                      broadcast_max=0)
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a[["doc_id", "cluster_rep", "is_dup"]].values.tolist() == \
        b[["doc_id", "cluster_rep", "is_dup"]].values.tolist()


def test_connected_components_chain(ray_session):
    """Hash-to-min on a path graph (diameter > 1) plus isolated keys:
    multi-round convergence and untouched-key completion."""
    import ray.data

    from extract_kit_ray.ops.components import connected_components

    pairs = ray.data.from_pandas(pd.DataFrame(
        {"key_a": [1, 2, 3, 10], "key_b": [2, 3, 4, 11]}))
    keys = ray.data.from_pandas(pd.DataFrame({"doc_id": list(range(1, 15))}))
    for guard in (None, 0):
        df = connected_components(pairs, keys, num_partitions=2,
                                  broadcast_max=guard)
        by = dict(zip(df["doc_id"], df["cluster_rep"]))
        assert by[1] == by[2] == by[3] == by[4] == 1
        assert by[10] == by[11] == 10
        for k in (5, 6, 7, 8, 9, 12, 13, 14):
            assert by[k] == k


def test_asof_join_backward_and_edges(ray_session):
    """Bucketed merge_asof: backward match at-or-before, null when no
    prior right row, keys isolated, exact-timestamp matches allowed."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from extract_kit_ray.ops.asof import asof_join

    def ts(s):
        return pd.Timestamp(s).as_unit("us").to_datetime64()

    left = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([10, 10, 10, 99], pa.int64()),
        "ts": pa.array([ts("2024-01-01 01:00"), ts("2024-01-01 03:00"),
                        ts("2024-01-01 00:30"), ts("2024-01-01 02:00")],
                       pa.timestamp("us")),
    })
    right = pa.table({
        "user_id": pa.array([10, 10, 77], pa.int64()),
        "ts": pa.array([ts("2024-01-01 01:00"), ts("2024-01-01 02:30"),
                        ts("2024-01-01 00:00")], pa.timestamp("us")),
    })
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    key_col="user_id", ts_col="ts", num_buckets=4).take_all()
    by_id = {r["event_id"]: r["ts_prev"] for r in out}
    assert by_id[1] == pd.Timestamp("2024-01-01 01:00")  # exact match allowed
    assert by_id[2] == pd.Timestamp("2024-01-01 02:30")  # latest at-or-before
    assert pd.isna(by_id[3])                             # before any right row
    assert pd.isna(by_id[4])                             # key has no right rows


def test_range_join_containment_semantics(ray_session):
    """Interval-containment join: multi-containment emits one row per
    window, non-contained rows drop (inner), keys isolated, and the
    closed='both' vs 'left' boundary."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from extract_kit_ray.ops.rangejoin import range_join

    def ts(s):
        return pd.Timestamp(s).as_unit("us").to_datetime64()

    left = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([10, 10, 10, 99], pa.int64()),
        "ts": pa.array([ts("2024-01-01 01:30"),   # inside both windows
                        ts("2024-01-01 02:00"),   # exactly at w1 end
                        ts("2024-01-01 05:00"),   # outside all
                        ts("2024-01-01 01:30")],  # key with no windows
                       pa.timestamp("us")),
    })
    right = pa.table({
        "user_id": pa.array([10, 10, 77], pa.int64()),
        "s": pa.array([ts("2024-01-01 01:00"), ts("2024-01-01 01:15"),
                       ts("2024-01-01 00:00")], pa.timestamp("us")),
        "e": pa.array([ts("2024-01-01 02:00"), ts("2024-01-01 03:00"),
                       ts("2024-01-01 09:00")], pa.timestamp("us")),
    })
    out = range_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        key_col="user_id", ts_col="ts", start_col="s", end_col="e",
        num_buckets=4).take_all()
    pairs = sorted((r["event_id"], str(r["s"])) for r in out)
    assert pairs == [
        (1, "2024-01-01 01:00:00"), (1, "2024-01-01 01:15:00"),
        (2, "2024-01-01 01:00:00"),  # closed='both': end inclusive
        (2, "2024-01-01 01:15:00"),
    ]
    out_l = range_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        key_col="user_id", ts_col="ts", start_col="s", end_col="e",
        num_buckets=4, closed="left").take_all()
    pairs_l = sorted((r["event_id"], str(r["s"])) for r in out_l)
    assert (2, "2024-01-01 01:00:00") not in pairs_l  # end exclusive
    assert (2, "2024-01-01 01:15:00") in pairs_l


def test_hll_sketch_accuracy_and_merge():
    import numpy as np

    from extract_kit_ray.ops.sketches import hll_estimate, hll_registers

    for n in (1_000, 50_000):
        keys = np.arange(n, dtype=np.int64) * 7919 + 13
        est = hll_estimate(hll_registers(keys))
        assert abs(est - n) / n < 0.05, (n, est)
    # merge(a, b) must equal the sketch of the union (register max)
    keys = np.arange(50_000, dtype=np.int64)
    merged = np.maximum(hll_registers(keys[:30_000]), hll_registers(keys[20_000:]))
    assert (merged == hll_registers(keys)).all()
    # determinism across calls
    assert (hll_registers(keys) == hll_registers(keys.copy())).all()


def test_hll_distinct_dataset(ray_session):
    import pandas as pd
    import ray.data

    from extract_kit_ray.ops.sketches import hll_distinct

    rows = pd.DataFrame({
        "g": ["a"] * 6000 + ["b"] * 3000,
        "k": list(range(2000)) * 3 + list(range(500)) * 6,
    })
    out = hll_distinct(ray.data.from_pandas(rows), group_col="g", key_col="k")
    by_g = {r["g"]: r["distinct_est"] for r in out.take_all()}
    assert abs(by_g["a"] - 2000) / 2000 < 0.05
    assert abs(by_g["b"] - 500) / 500 < 0.05


def test_bloom_filter_properties(ray_session):
    import numpy as np

    from extract_kit_ray.ops.sketches import bloom_build, bloom_probe

    members = np.arange(10_000, dtype=np.int64) * 31 + 7
    others = np.arange(10_000, dtype=np.int64) * 31 + 8
    m_bits = 16 * len(members)
    bm = bloom_build(members, m_bits)
    # NO false negatives — the load-bearing property
    assert bloom_probe(bm, members, m_bits).all()
    # false-positive rate near the design point (~2e-4 at 16 bits/key, k=8)
    fp = bloom_probe(bm, others, m_bits).mean()
    assert fp < 0.01, fp
    # mergeability: or(a, b) == bloom(union)
    a, b = members[:6000], members[4000:]
    assert (np.bitwise_or(bloom_build(a, m_bits), bloom_build(b, m_bits))
            == bm).all()


def test_bloom_build_ds(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from extract_kit_ray.ops.sketches import bloom_build, bloom_build_ds, bloom_probe

    keys = np.arange(5000, dtype=np.int64) * 13 + 1
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(4)
    m_bits = 16 * len(keys)
    bm = bloom_build_ds(ds, key_col="k", m_bits=m_bits)
    assert (bm == bloom_build(keys, m_bits)).all()
    assert bloom_probe(bm, keys, m_bits).all()


def test_chunk_batch_windows():
    import pyarrow as pa

    from extract_kit_ray.ops.textops import chunk_batch

    words = [f"w{i}" for i in range(100)]
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([" ".join(words), ""], pa.string())})
    out = chunk_batch(tbl, chunk_words=40, overlap=10)
    rows = out.to_pylist()
    doc1 = [r for r in rows if r["doc_id"] == 1]
    # starts 0, 30, 60: last window reaches the end
    assert [r["chunk_no"] for r in doc1] == [0, 1, 2]
    assert doc1[0]["chunk_text"].split()[:2] == ["w0", "w1"]
    assert doc1[1]["chunk_text"].split()[0] == "w30"  # 10-word overlap
    assert doc1[2]["chunk_text"].split()[-1] == "w99"
    assert [r["n_tokens"] for r in doc1] == [40, 40, 40]
    doc2 = [r for r in rows if r["doc_id"] == 2]
    assert doc2 == [{"doc_id": 2, "chunk_no": 0, "chunk_text": "", "n_tokens": 0}]
    # overlap >= chunk_words fails loudly
    import pytest

    with pytest.raises(ValueError):
        chunk_batch(tbl, chunk_words=10, overlap=10)


def test_stratified_sample_exact_across_blocks(ray_session):
    """The per-batch partial top-n plus per-group final head must equal
    a single-node selection, regardless of block boundaries."""
    import ray.data

    from extract_kit_ray.ops.sampling import sample_hash, stratified_sample

    df = pd.DataFrame({
        "doc_id": np.arange(1000, dtype=np.int64),
        "lang": [("en", "fr", "de", "es")[i % 4] for i in range(1000)],
    })
    ds = ray.data.from_pandas(df).repartition(7)
    out = stratified_sample(ds, group_col="lang", key_col="doc_id",
                            n_per_group=15).to_pandas()
    assert len(out) == 60
    # reference selection computed directly
    ref = df.assign(h=sample_hash(df["doc_id"].to_numpy()))
    ref = (ref.sort_values(["h", "doc_id"]).groupby("lang").head(15))
    assert set(map(tuple, out[["doc_id", "lang"]].values.tolist())) == \
        set(map(tuple, ref[["doc_id", "lang"]].values.tolist()))


def test_sample_fraction_deterministic(ray_session):
    import ray.data

    from extract_kit_ray.ops.sampling import sample_fraction

    df = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(5)
    a = sorted(r["doc_id"] for r in sample_fraction(ds, key_col="doc_id",
                                                    fraction=0.3).take_all())
    b = sorted(r["doc_id"] for r in sample_fraction(ds, key_col="doc_id",
                                                    fraction=0.3).take_all())
    assert a == b
    assert 0.2 < len(a) / 2000 < 0.4  # Bernoulli-style rate


def _quota_ref(df, target):
    """Single-process replay of quota_balanced_sample's keep rule."""
    from extract_kit_ray.ops.sampling import SAMPLE_HASH_MOD, sample_hash

    kept = []
    for g, grp in df.groupby("g"):
        wg = int(grp["w"].sum())
        cut = (SAMPLE_HASH_MOD if wg <= target
               else (target * SAMPLE_HASH_MOD) // wg)
        h = sample_hash(grp["doc_id"].to_numpy(np.int64))
        kept.extend(grp["doc_id"].to_numpy()[h < cut].tolist())
    return sorted(kept)


@pytest.mark.parametrize("broadcast_max", [None, 0])
def test_quota_balanced_sample_matches_reference(ray_session,
                                                 broadcast_max):
    import ray.data

    from extract_kit_ray.ops.sampling import quota_balanced_sample

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "doc_id": np.arange(600, dtype=np.int64),
        "g": np.repeat(["small", "big", "huge"], 200),
        "w": rng.integers(1, 50, 600),
    })
    # make group weights straddle the quota
    df.loc[df.g == "big", "w"] += 40
    df.loc[df.g == "huge", "w"] += 400
    target = int(df[df.g == "small"]["w"].sum()) + 100  # small under quota
    kwargs = {} if broadcast_max is None else {"broadcast_max": broadcast_max}
    ds = ray.data.from_pandas(df).repartition(5)
    out = quota_balanced_sample(ds, group_col="g", key_col="doc_id",
                                weight_col="w", target_per_group=target,
                                **kwargs).to_pandas()
    assert sorted(out["doc_id"]) == _quota_ref(df, target)
    # under-quota group keeps everything; over-quota groups shrink
    assert (out["g"] == "small").sum() == 200
    assert (out["g"] == "huge").sum() < 200
    # expected kept weight per over-quota group lands near the quota
    huge_kept = out.loc[out.g == "huge", "w"].sum()
    assert huge_kept < 2 * target


def test_quota_target_guard():
    from extract_kit_ray.ops.sampling import quota_balanced_sample

    with pytest.raises(ValueError):
        quota_balanced_sample(None, group_col="g", key_col="k",
                              weight_col="w", target_per_group=-1)


def _top_pct_ref(df, pct):
    out = []
    for g, grp in df.groupby("g"):
        k = (len(grp) * pct + 99) // 100
        grp = grp.sort_values(["score", "doc_id"], ascending=[False, True])
        out.extend(grp["doc_id"].head(k).tolist())
    return sorted(out)


@pytest.mark.parametrize("broadcast_max", [None, 0])
def test_top_pct_per_group_matches_reference(ray_session, broadcast_max):
    import ray.data

    from extract_kit_ray.ops.sampling import top_pct_per_group

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "g": rng.choice(["a", "b", "c"], 300).astype(object),
        "score": rng.integers(0, 40, 300),  # heavy score ties
    })
    kwargs = {} if broadcast_max is None else {"broadcast_max": broadcast_max}
    ds = ray.data.from_pandas(df).repartition(7)
    out = top_pct_per_group(ds, group_col="g", key_col="doc_id",
                            order_col="score", pct=25, **kwargs).to_pandas()
    assert sorted(out["doc_id"]) == _top_pct_ref(df, 25)
    assert "__k" not in out.columns


def test_top_pct_guard():
    from extract_kit_ray.ops.sampling import top_pct_per_group

    with pytest.raises(ValueError):
        top_pct_per_group(None, group_col="g", key_col="k",
                          order_col="s", pct=0)


def test_top_n_per_group_exact_across_blocks(ray_session):
    import ray.data

    from extract_kit_ray.ops.sampling import top_n_per_group

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], 400).astype(object),
        "score": rng.integers(0, 30, 400),
        "id": np.arange(400, dtype=np.int64),
    })
    out = top_n_per_group(
        ray.data.from_pandas(df).repartition(8), group_col="g",
        order_cols=["score", "id"], n=5,
        descending=[True, False]).to_pandas()
    ref = (df.sort_values(["score", "id"], ascending=[False, True])
           .groupby("g").head(5))
    assert sorted(out["id"]) == sorted(ref["id"])
    with pytest.raises(ValueError):
        top_n_per_group(None, group_col="g", order_cols=["s"], n=0)


# ---------------------------------------------------------------------------
# hot-bucket cap (LSH / SimHash overflow handling)
# ---------------------------------------------------------------------------


def test_lsh_hot_bucket_capped(ray_session):
    """10k identical docs put every key in ONE bucket per band (the
    boilerplate-crawl-slice regime).  With the cap, pair output must be
    O(cap^2 + n) per band — not n^2/2 ≈ 50M — every key must keep a
    candidate edge (star edges), and capped pairs must be flagged
    overflow=True."""
    import ray.data

    from extract_kit_ray.ops.dedup import minhash_lsh_candidates

    n, cap, n_bands = 10_000, 16, 4
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64),
         "text": ["identical cookie banner boilerplate accepted on every "
                  "page of the crawl slice today"] * n}))
    pairs_ds, _ = minhash_lsh_candidates(
        ds, n_bands=n_bands, max_bucket_members=cap)
    pairs = pairs_ds.to_pandas()
    bound = n_bands * (cap * (cap - 1) // 2 + (n - cap))
    assert 0 < len(pairs) <= bound          # quadratic would be ~2.0M
    assert pairs["overflow"].all()
    covered = set(pairs["key_a"]) | set(pairs["key_b"])
    assert covered == set(range(n))         # star edges keep every member


def test_lsh_capped_cluster_connectivity(ray_session):
    """Capped expansion must still produce ONE cluster for an
    all-identical corpus: star edges to the core hub verify (identical
    text -> Jaccard 1.0) and union-find closes the component."""
    import ray.data

    from extract_kit_ray.ops.dedup import minhash_lsh_dedup

    n = 500
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64),
         "text": ["the same boilerplate body repeated across the whole "
                  "slice of pages"] * n}))
    out = minhash_lsh_dedup(ds, threshold=0.8, max_bucket_members=8)
    assert (out["cluster_rep"] == 0).all()
    assert out["is_dup"].sum() == n - 1


def test_simhash_hot_bucket_capped(ray_session):
    import ray.data

    from extract_kit_ray.ops.dedup import simhash_candidates

    n, cap = 1000, 16
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64),
         "text": ["same accept cookies banner text on every single page "
                  "in the bucket"] * n}))
    pairs = simhash_candidates(ds, max_hamming=3,
                               max_bucket_members=cap).to_pandas()
    n_bands = 4
    bound = n_bands * (cap * (cap - 1) // 2 + (n - cap))
    assert 0 < len(pairs) <= bound
    assert pairs["overflow"].all()
    assert (pairs["hamming"] == 0).all()    # identical docs
    covered = set(pairs["key_a"]) | set(pairs["key_b"])
    assert covered == set(range(n))


def test_embedding_hot_bucket_capped(ray_session):
    """10k identical vectors land in ONE LSH bucket (the degenerate
    boilerplate-embedding regime from the round-4 verdict).  With the
    cap, pair output must be O(cap^2 + n) — not n^2/2 ≈ 50M — every key
    must keep an edge (star), capped pairs must be flagged, and all
    pairs verify at cosine 1.0."""
    import ray.data

    from extract_kit_ray.ops.similarity import embedding_near_dups

    n, cap = 10_000, 16
    vec = (np.arange(8, dtype=np.float32) + 1.0).tolist()
    ds = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": [vec] * n}))
    pairs = embedding_near_dups(ds, threshold=0.95, n_bits=4,
                                concurrency=2, max_bucket_members=cap)
    bound = cap * (cap - 1) // 2 + (n - cap)
    assert 0 < len(pairs) <= bound          # quadratic would be ~50M
    assert pairs["overflow"].all()
    assert (pairs["cosine"] >= 0.999).all()
    covered = set(pairs["key_a"]) | set(pairs["key_b"])
    assert covered == set(range(n))         # star edges keep every member


def test_embedding_cap_noop_below_threshold(ray_session):
    """A cap far above bucket sizes must not change pair output vs the
    uncapped run, and normal pairs must carry overflow=False."""
    import ray.data

    from extract_kit_ray.ops.similarity import embedding_near_dups

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 8)).astype(np.float32)
    rows = pd.DataFrame({
        "vec_id": np.arange(40, dtype=np.int64),
        "embedding": [v.tolist() for v in base],
    })
    # plant a near-dup of row 3
    rows = pd.concat([rows, pd.DataFrame(
        {"vec_id": [500], "embedding": [(base[3] * 1.001).tolist()]})],
        ignore_index=True)
    a = embedding_near_dups(ray.data.from_pandas(rows), threshold=0.99,
                            n_bits=4, concurrency=2, max_bucket_members=0)
    b = embedding_near_dups(ray.data.from_pandas(rows), threshold=0.99,
                            n_bits=4, concurrency=2, max_bucket_members=10_000)
    key = ["key_a", "key_b"]
    assert a[key].values.tolist() == b[key].values.tolist()
    assert (3, 500) in set(map(tuple, b[key].values.tolist()))
    assert not b["overflow"].any()


def test_lsh_cap_noop_below_threshold(dup_docs):
    """A cap far above bucket sizes must not change candidate output,
    and normal pairs must carry overflow=False."""
    from extract_kit_ray.ops.dedup import minhash_lsh_candidates

    a, _ = minhash_lsh_candidates(dup_docs, max_bucket_members=0)  # disabled
    b, _ = minhash_lsh_candidates(dup_docs, max_bucket_members=10_000)
    pa_df = a.to_pandas()
    pb_df = b.to_pandas()
    key = ["key_a", "key_b"]
    assert sorted(map(tuple, pa_df[key].values.tolist())) == \
        sorted(map(tuple, pb_df[key].values.tolist()))
    assert not pb_df["overflow"].any()


def test_dup_lookup_differential():
    """_DupLookup.keep_mask must equal the per-row dict reference on
    random 128-bit hash columns."""
    from extract_kit_ray.ops.dedup import _DupLookup

    rng = np.random.default_rng(7)
    n, m = 50_000, 5_000
    h1 = rng.integers(-2**62, 2**62, n)
    h2 = rng.integers(-2**62, 2**62, n)
    keys = np.arange(n, dtype=np.int64)
    idx = rng.choice(n, m, replace=False)
    lut = _DupLookup(h1[idx], h2[idx], keys[idx])
    got = lut.keep_mask(h1, h2, keys)
    ref_map = dict(zip(zip(h1[idx], h2[idx]), keys[idx]))
    ref = np.array([ref_map.get((a, b), k) == k
                    for a, b, k in zip(h1, h2, keys)])
    assert (got == ref).all()


def test_dup_lookup_collision_sidecar():
    """Two distinct dup keys sharing a combined 64-bit key must both
    resolve correctly through the collision sidecar."""
    from extract_kit_ray.ops.dedup import _DupLookup

    h1 = np.array([10, 20, 30], dtype=np.int64)
    h2 = np.array([1, 2, 3], dtype=np.int64)
    mins = np.array([100, 200, 300], dtype=np.int64)
    lut = _DupLookup(h1, h2, mins)
    # forge a collision state: keys 0 and 1 share a combined value
    lut.c = np.array([5, 5, 9], dtype=np.uint64)
    lut.h1 = h1
    lut.h2 = h2
    lut.min_key = mins
    lut.collisions = {5: [(10, 1, 100), (20, 2, 200)]}
    import extract_kit_ray.ops.dedup as dd

    orig = dd._combine128
    try:
        dd._combine128 = lambda a, b: np.where(
            a == 30, np.uint64(9), np.uint64(5)).astype(np.uint64)
        bh1 = np.array([10, 20, 20, 30, 77], dtype=np.int64)
        bh2 = np.array([1, 2, 2, 3, 77], dtype=np.int64)
        keys = np.array([100, 999, 200, 300, 1], dtype=np.int64)
        # row0: keeper of cluster (10,1); row1: dup (not min); row2:
        # keeper; row3: keeper; row4: combined-key collides with dup set
        # but (h1,h2) differs -> benign non-member, survives
        got = lut.keep_mask(bh1, bh2, keys)
        assert got.tolist() == [True, False, True, True, True]
    finally:
        dd._combine128 = orig


def test_video_header_codecs():
    """MP4/AVI writers round-trip through decode_video_meta; malformed
    payloads raise ValueError (failure-as-data upstream)."""
    from extract_kit_ray.ops.multimodal import (
        decode_video_meta,
        make_avi,
        make_mp4,
    )

    m = decode_video_meta(make_mp4(43210, 640, 360, filler=b"x" * 99))
    assert (m["duration_ms"], m["width"], m["height"]) == (43210, 640, 360)
    a = decode_video_meta(make_avi(7777, 320, 240))
    assert (a["duration_ms"], a["width"], a["height"]) == (7777, 320, 240)
    for bad in (b"", b"garbage bytes", b"RIFF\x04\x00\x00\x00AVI ",
                make_mp4(5, 1, 1)[:20]):
        try:
            decode_video_meta(bad)
            raise AssertionError(f"no error for {bad[:12]!r}")
        except ValueError:
            pass


def test_media_video_rows_real(ray_session):
    """Fixture video rows now decode to real header-derived
    duration/dimensions matching the closed-form geometry."""
    import ray.data

    from extract_kit_ray.ops.multimodal import (
        VID_DUR_MS,
        VID_H,
        VID_W,
        extract_media_features,
        make_media_table,
    )

    tbl = make_media_table(60)
    out = {r["media_id"]: r for r in extract_media_features(
        ray.data.from_arrow(tbl), model="pixtral", concurrency=2).take_all()}
    vids = [i for i in range(60) if i % 3 == 2 and i % 17 != 13]
    assert vids
    for i in vids:
        r = out[i]
        assert r["valid"], r["error"]
        assert r["duration_ms_out"] == VID_DUR_MS(i)
        assert r["decoded_width"] == VID_W(i)
        assert r["decoded_height"] == VID_H(i)


def test_components_nonconvergence_raises(ray_session):
    """A chain needing more rounds than allowed must raise, not return
    silently split cluster labels (round-3 ADVICE)."""
    import ray.data

    from extract_kit_ray.ops.components import connected_components_ds

    n = 64
    pairs = ray.data.from_pandas(pd.DataFrame(
        {"key_a": np.arange(n - 1, dtype=np.int64),
         "key_b": np.arange(1, n, dtype=np.int64)}))
    keys = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64)}))
    # broadcast_max=0 pins the ITERATIVE tier (the broadcast tier's
    # driver union-find needs no rounds and cannot non-converge)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_ds(pairs, keys, max_rounds=1,
                                num_partitions=2,
                                broadcast_max=0).materialize()
    # and with enough rounds the same chain resolves to one component
    out = connected_components_ds(pairs, keys, max_rounds=16,
                                  num_partitions=2,
                                  broadcast_max=0).take_all()
    assert all(r["cluster_rep"] == 0 for r in out)
    # the broadcast tier resolves the same chain identically
    out = connected_components_ds(pairs, keys, max_rounds=16,
                                  num_partitions=2).take_all()
    assert all(r["cluster_rep"] == 0 for r in out)


def test_sample_hash_sql_full_int64_domain():
    """The SQL mirror must equal numpy's uint64-wrapping hash over the
    FULL int64 key domain — negative keys and magnitudes past
    2^32 / 2654435761 included (round-3 ADVICE)."""
    import duckdb

    from extract_kit_ray.ops.sampling import sample_hash, sample_hash_sql

    rng = np.random.default_rng(3)
    keys = np.concatenate([
        rng.integers(-2**63, 2**63 - 1, 2000, dtype=np.int64),
        np.array([0, -1, 1, 2**62, -2**62, 2**31, -2**31, 2**32, -2**32,
                  2**63 - 1, -2**63], dtype=np.int64)])
    want = sample_hash(keys).astype(np.uint64)
    got = duckdb.sql(
        f"SELECT {sample_hash_sql('k')} AS h FROM (SELECT unnest(?) AS k)",
        params=[keys.tolist()]).df()["h"].to_numpy()
    assert (got.astype(np.uint64) == want).all()


def test_minhash_distributed_tiny_skewed_partitions(ray_session):
    """Regression (round 4, rayfix schema-seed guard): tiny pair sets
    with high num_partitions must not crash the verification joins or
    the label-completion join (Ray schema-less empty aggregate blocks)."""
    import ray.data

    from extract_kit_ray.ops.dedup import minhash_lsh_dedup_distributed

    base = ("the quick brown fox jumps over the lazy dog near the old "
            "stone bridge by the river bank every single morning")
    docs = [{"doc_id": 0, "text": base}, {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": "entirely different content here about "
                                  "arrow batches and streams at scale"}]
    out = minhash_lsh_dedup_distributed(
        ray.data.from_pandas(pd.DataFrame(docs)), threshold=0.8,
        num_partitions=8, broadcast_max=0)
    by_id = out.set_index("doc_id")
    assert by_id.loc[1, "cluster_rep"] == 0 and bool(by_id.loc[1, "is_dup"])
    assert not bool(by_id.loc[2, "is_dup"])


def test_exact_dedup_join_tiny_skewed_partitions(ray_session):
    """Same regression family for exact_dedup's left_outer fallback:
    one dup cluster, eight partitions."""
    import ray.data

    from extract_kit_ray.ops.dedup import exact_dedup

    rows = [{"doc_id": i, "text": "same text" if i < 2 else f"unique {i}"}
            for i in range(6)]
    kept = sorted(r["doc_id"] for r in exact_dedup(
        ray.data.from_pandas(pd.DataFrame(rows)), broadcast_max=0,
        num_partitions=8).take_all())
    assert kept == [0, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def test_mg_error_bound_lossy_regime():
    """Under compression, every estimate must satisfy
    true - n/(capacity+1) <= est <= true, for any merge tree."""
    from collections import Counter

    from extract_kit_ray.ops.sketches import mg_compress, mg_merge

    rng = np.random.default_rng(9)
    stream = rng.zipf(1.5, 5000)
    stream = stream[stream < 50].astype(str)
    true = Counter(stream)
    cap = 8
    # three different merge trees over 10 chunks
    chunks = np.array_split(stream, 10)
    partials = [mg_compress(dict(Counter(c.tolist())), cap) for c in chunks]
    import functools
    merged_l = functools.reduce(lambda a, b: mg_merge(a, b, cap), partials)
    merged_r = functools.reduce(lambda a, b: mg_merge(b, a, cap),
                                reversed(partials))
    halves = mg_merge(
        functools.reduce(lambda a, b: mg_merge(a, b, cap), partials[:5]),
        functools.reduce(lambda a, b: mg_merge(a, b, cap), partials[5:]), cap)
    n = len(stream)
    for summary in (merged_l, merged_r, halves):
        assert len(summary) <= cap
        for k, est in summary.items():
            assert est <= true[k]
            assert est >= true[k] - n / (cap + 1)


def test_mg_exact_when_capacity_covers_vocab():
    from collections import Counter

    from extract_kit_ray.ops.sketches import mg_compress, mg_merge

    a = dict(Counter("a a b b b c".split()))
    b = dict(Counter("a c c d".split()))
    merged = mg_merge(mg_compress(a, 10), mg_compress(b, 10), 10)
    assert merged == {"a": 3, "b": 3, "c": 3, "d": 1}


def test_heavy_hitters_dataset_exact(ray_session):
    import ray.data
    from collections import Counter

    from extract_kit_ray.ops.sketches import heavy_hitters

    texts = [f"w{i % 7} w{i % 3} filler{i}" for i in range(200)]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(8)

    def tok(batch):
        for t in batch["text"].to_pylist():
            yield from t.split()

    out = heavy_hitters(ds, col_tokens=tok, capacity=500, topk=5)
    true = Counter(w for t in texts for w in t.split())
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(out["term"], out["est_count"])) == want
    assert out["rank"].tolist() == [1, 2, 3, 4, 5]
