"""Bigram-LM surprisal scoring (ops/lm.py): fan-out correctness,
integer scoring vs a single-process reference, OOV penalty, broadcast
vs join path equivalence, short-doc contract, and the int64 headroom
guard."""

import numpy as np
import pyarrow as pa
import pytest

from extract_kit_ray.ops.lm import (OOV_INVP_MICRO, _C1_MAX, _invp,
                                    bigram_fanout, surprisal_scores)


def _doc_table(texts, ids=None):
    if ids is None:
        ids = list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _ref_scores(texts, ids, ref_texts):
    """Single-process reference: count unigrams/bigrams over ref_texts,
    then per doc sum floor(c1*1e6/c2) (OOV penalty when the pair or its
    prefix is unseen)."""
    uni, bi = {}, {}
    for t in ref_texts:
        ws = t.split()
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    out = {}
    for did, t in zip(ids, texts):
        ws = t.split()
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        s = 0
        for a, b in pairs:
            if (a, b) in bi and a in uni:
                s += (uni[a] * 1_000_000) // bi[(a, b)]
            else:
                s += OOV_INVP_MICRO
        out[did] = (len(pairs), s, s // len(pairs))
    return out


def test_bigram_fanout_adjacent_pairs_only():
    tbl = _doc_table(["a b c", "x y", "solo", ""])
    out = bigram_fanout(tbl)
    assert out["bg"].to_pylist() == ["a b", "b c", "x y"]
    assert out["w1"].to_pylist() == ["a", "b", "x"]
    assert out["doc_id"].to_pylist() == [0, 0, 1]


def test_bigram_fanout_no_cross_doc_pairs():
    # the boundary pair ("end", "start") must NOT appear
    tbl = _doc_table(["a end", "start b"])
    out = bigram_fanout(tbl)
    assert "end start" not in out["bg"].to_pylist()
    assert out["bg"].to_pylist() == ["a end", "start b"]


def test_bigram_fanout_empty_and_whitespace():
    tbl = _doc_table(["", "   ", "one"])
    out = bigram_fanout(tbl)
    assert out.num_rows == 0


def test_invp_exact_and_oov():
    c1 = np.array([10, 5, 0], dtype=np.int64)
    c2 = np.array([3, 1, 1], dtype=np.int64)
    seen = np.array([True, True, False])
    out = _invp(c1, c2, seen)
    assert out.tolist() == [10 * 1_000_000 // 3, 5_000_000, OOV_INVP_MICRO]


def test_invp_headroom_guard():
    c1 = np.array([_C1_MAX + 1], dtype=np.int64)
    c2 = np.array([1], dtype=np.int64)
    with pytest.raises(ValueError, match="headroom"):
        _invp(c1, c2, np.array([True]))


def _mk_corpus(rng, n_docs, vocab):
    texts = []
    for _ in range(n_docs):
        k = int(rng.integers(0, 12))
        texts.append(" ".join(rng.choice(vocab, size=k)))
    return texts


@pytest.mark.parametrize("force_join", [False, True])
def test_surprisal_matches_reference(ray_session, force_join):
    """Both paths (broadcast and distributed-join) must produce the
    identical integer scores as the single-process reference."""
    import ray.data

    rng = np.random.default_rng(7)
    vocab = np.array(["the", "cat", "sat", "on", "mat", "dog", "ran",
                      "big", "red", "zz"])
    texts = _mk_corpus(rng, 80, vocab)
    ids = list(range(80))
    ref_texts = [t for i, t in zip(ids, texts) if i % 10 == 0]

    ds = ray.data.from_arrow(_doc_table(texts, ids)).repartition(5)
    ref = ray.data.from_arrow(
        _doc_table(ref_texts, [i for i in ids if i % 10 == 0]))
    bmax = 0 if force_join else None  # 0 rows => every count table joins
    out = surprisal_scores(ds, ref, broadcast_max=bmax,
                           num_partitions=4).to_pandas()
    got = {int(r.doc_id): (int(r.n_bigrams), int(r.sum_invp_micro),
                           int(r.mean_invp_micro))
           for r in out.itertuples()}
    assert got == _ref_scores(texts, ids, ref_texts)


def test_surprisal_short_docs_emit_no_row(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_doc_table(["only", "", "a b"]))
    out = surprisal_scores(ds, ds).to_pandas()
    assert out["doc_id"].tolist() == [2]


def test_surprisal_all_oov(ray_session):
    """Docs scored against a disjoint reference: every pair pays the
    OOV penalty."""
    import ray.data

    ds = ray.data.from_arrow(_doc_table(["p q r s"]))
    ref = ray.data.from_arrow(_doc_table(["x y z"], [9]))
    out = surprisal_scores(ds, ref).to_pandas()
    assert out["n_bigrams"].tolist() == [3]
    assert out["sum_invp_micro"].tolist() == [3 * OOV_INVP_MICRO]
