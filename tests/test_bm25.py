"""BM25 operator (ops/bm25.py): tf matrix, scoring math, determinism
contract, end-to-end top-k over a hand-checkable corpus."""

import numpy as np
import pyarrow as pa

from extract_kit_ray.ops.bm25 import (
    B,
    K1,
    _tf_matrix,
    _tokens,
    bm25_topk,
    score_micro,
    top_terms,
)


def test_tokens_and_tf():
    col = pa.array(["cat dog cat", "  dog\t dog ", "", "bird"])
    words, dl = _tokens(col)
    assert dl.tolist() == [3, 2, 0, 1]
    tf = _tf_matrix(words, 4, ["cat", "dog", "fish"])
    assert tf[:, 0].tolist() == [2, 0, 0, 0]
    assert tf[:, 1].tolist() == [1, 2, 0, 0]
    assert tf[:, 2].tolist() == [0, 0, 0, 0]


def test_score_micro_closed_form():
    # single doc, tf=2, dl=4, N=10, df=3, avgdl=5.0 — hand computation
    tf = np.array([2], dtype=np.int64)
    dl = np.array([4], dtype=np.int64)
    idf = (10 - 3 + 0.5) / (3 + 0.5)
    denom = 2 + K1 * ((1.0 - B) + (B * 4) / 5.0)
    want = int(np.floor(idf * 2 / denom * 1e6 + 0.5))
    got = score_micro(tf, dl, n_docs=10, df=3, avgdl=5.0)
    assert got.tolist() == [want]
    assert got.dtype == np.int64


def test_zero_tf_scores_zero():
    s = score_micro(np.array([0, 0]), np.array([5, 9]),
                    n_docs=4, df=1, avgdl=6.0)
    assert s.tolist() == [0, 0]


def _corpus():
    texts = [
        "apple apple apple banana",       # 0: apple-heavy, short
        "apple " + "filler " * 40,        # 1: one apple, long doc
        "banana banana",                  # 2
        "cherry",                         # 3
        "apple banana cherry",            # 4
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_bm25_end_to_end(ray_session):
    import ray.data

    out = bm25_topk(ray.data.from_arrow(_corpus()), ["apple", "cherry"],
                    topk=3)
    apple = out[out.term == "apple"]
    # high-tf short doc 0 must outrank the long dilute doc 1
    assert apple.iloc[0]["doc_id"] == 0
    assert set(apple["doc_id"]) == {0, 1, 4}
    assert (apple["rank"] == [1, 2, 3]).all()
    cherry = out[out.term == "cherry"]
    assert set(cherry["doc_id"]) == {3, 4}  # only docs containing it
    assert cherry.iloc[0]["doc_id"] == 3    # pure doc beats mixed doc
    # deterministic across runs
    out2 = bm25_topk(ray.data.from_arrow(_corpus()), ["apple", "cherry"],
                     topk=3)
    assert out.equals(out2)


def test_top_terms_ranking(ray_session):
    import ray.data

    tbl = pa.table({"text": pa.array(
        ["a a a a b b b c c d", "a b c d e"], pa.string())})
    # counts: a=5 b=4 c=3 d=2 e=1 -> ranks 1..5
    terms = top_terms(ray.data.from_arrow(tbl), lo_rank=2, hi_rank=4)
    assert terms == ["b", "c", "d"]


def test_fused_stats_match_separate_passes(ray_session):
    """top_terms_with_stats must reproduce top_terms + corpus_stats
    exactly (same terms, same df/n_docs/sum_dl) from one fused pass."""
    import ray.data

    from extract_kit_ray.ops.bm25 import corpus_stats, top_terms_with_stats

    ds = ray.data.from_arrow(_corpus())
    terms, stats = top_terms_with_stats(ds, lo_rank=2, hi_rank=4)
    assert terms == top_terms(ray.data.from_arrow(_corpus()),
                              lo_rank=2, hi_rank=4)
    ref = corpus_stats(ray.data.from_arrow(_corpus()), terms)
    assert stats["n_docs"] == int(ref["n_docs"])
    assert stats["sum_dl"] == int(ref["sum_dl"])
    assert stats["df"] == [int(d) for d in ref["df"]]


def test_bm25_fused_end_to_end_matches(ray_session):
    """bm25_topk(stats=...) from the fused pass must equal the
    three-pass result bit-for-bit."""
    import ray.data

    from extract_kit_ray.ops.bm25 import top_terms_with_stats

    terms, stats = top_terms_with_stats(ray.data.from_arrow(_corpus()),
                                        lo_rank=1, hi_rank=2)
    fused = bm25_topk(ray.data.from_arrow(_corpus()), terms,
                      topk=3, stats=stats)
    sep = bm25_topk(ray.data.from_arrow(_corpus()), terms, topk=3)
    assert fused.values.tolist() == sep.values.tolist()


def test_top_terms_with_stats_empty_corpus(ray_session):
    """An empty input must raise a descriptive ValueError, not an
    opaque IndexError (ADVICE r4)."""
    import pyarrow as pa
    import pytest
    import ray.data

    from extract_kit_ray.ops.bm25 import top_terms_with_stats

    empty = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    with pytest.raises(ValueError, match="empty corpus"):
        top_terms_with_stats(empty, lo_rank=1, hi_rank=5)
