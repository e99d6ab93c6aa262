"""Duplicated k-token window detection (ops/dupspans.py): window-key
correctness vs a single-process reference, within-doc repeats,
overlapping-window coverage union, broadcast vs join path equivalence,
short/empty docs, and the k>=2 guard."""

import numpy as np
import pyarrow as pa
import pytest

from extract_kit_ray.ops.bm25 import _tokens
from extract_kit_ray.ops.dupspans import (_KeySet, _window_hashes,
                                          duplicated_spans)


def _doc_table(texts, ids=None):
    if ids is None:
        ids = list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _ref_stats(texts, ids, k):
    """Single-process reference: exact window-string census + interval
    union, straight from the definition."""
    from collections import Counter

    wins = Counter()
    toks = {i: t.split() for i, t in zip(ids, texts)}
    for i in ids:
        ws = toks[i]
        for s in range(len(ws) - k + 1):
            wins[" ".join(ws[s:s + k])] += 1
    out = {}
    for i in ids:
        ws = toks[i]
        starts = [s for s in range(len(ws) - k + 1)
                  if wins[" ".join(ws[s:s + k])] > 1]
        covered = set()
        for s in starts:
            covered.update(range(s, s + k))
        out[i] = (len(ws), max(len(ws) - k + 1, 0), len(starts),
                  len(covered))
    return out


def _check(df, texts, ids, k):
    ref = _ref_stats(texts, ids, k)
    assert len(df) == len(ids)
    for row in df.itertuples():
        assert (row.n_tokens, row.n_windows, row.dup_windows,
                row.covered_tokens) == ref[row.doc_id], row


def test_window_hashes_equal_text_equal_keys():
    words, _ = _tokens(_doc_table(["a b c d", "x a b c d y"])["text"])
    starts, parent, h1, h2, pf, n = _window_hashes(words, 4)
    # doc0 has 1 window "a b c d"; doc1 has 3, the middle one equal
    assert list(parent) == [0, 1, 1, 1]
    assert (h1[0], h2[0]) == (h1[2], h2[2])
    assert (h1[1], h2[1]) != (h1[0], h2[0])
    assert (h1[3], h2[3]) != (h1[0], h2[0])


def test_window_never_crosses_doc_boundary():
    words, _ = _tokens(_doc_table(["a b", "c d"])["text"])
    starts, parent, h1, h2, pf, n = _window_hashes(words, 2)
    # "b c" spans the boundary and must not appear: one window per doc
    assert list(parent) == [0, 1]


def test_keyset_membership_exact():
    rng = np.random.default_rng(7)
    h1 = rng.integers(-2**62, 2**62, 100, dtype=np.int64)
    h2 = rng.integers(-2**62, 2**62, 100, dtype=np.int64)
    ks = _KeySet(h1[:50], h2[:50])
    got = ks.contains(h1, h2)
    assert got[:50].all() and not got[50:].any()
    # same-h1 different-h2 probes are non-members
    assert not ks.contains(h1[:5], h2[5:10]).any()


@pytest.mark.parametrize("broadcast_max", [None, 0])
def test_duplicated_spans_matches_reference(ray_session, broadcast_max):
    import ray.data

    # doc0/doc1 share a 3-window; doc2 repeats it internally twice;
    # doc3 is clean; doc4 too short; doc5 empty
    texts = ["p q r s t", "z p q r y", "p q r u p q r",
             "unique words only here", "a b", ""]
    ids = [10, 11, 12, 13, 14, 15]
    kwargs = {} if broadcast_max is None else {
        "broadcast_max": broadcast_max}
    ds = ray.data.from_arrow(_doc_table(texts, ids)).repartition(4)
    df = (duplicated_spans(ds, key_col="doc_id", k=3, **kwargs)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    _check(df, texts, ids, 3)
    # the shared window is covered in all three docs
    by = {r.doc_id: r for r in df.itertuples()}
    assert by[10].dup_windows == 1 and by[10].covered_tokens == 3
    assert by[12].dup_windows == 2 and by[12].covered_tokens == 6
    assert by[13].dup_windows == 0 and by[13].covered_tokens == 0
    assert by[15].n_tokens == 0 and by[15].n_windows == 0


def test_overlapping_windows_union_not_sum(ray_session):
    import ray.data

    # "a a a a a" twice: every 2-window duplicated, coverage = n_tokens
    texts = ["a a a a a", "a a a a a", "b c"]
    ds = ray.data.from_arrow(_doc_table(texts))
    df = (duplicated_spans(ds, key_col="doc_id", k=2)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    _check(df, texts, [0, 1, 2], 2)
    assert df.loc[0, "dup_windows"] == 4
    assert df.loc[0, "covered_tokens"] == 5  # union, not 4*2


def test_stats_and_strip_agree_on_random_corpus(ray_session):
    """Cross-operator invariant on a seeded random corpus with planted
    repeats: for every doc, strip's n_kept == stats' n_tokens -
    covered_tokens, both ops see the same n_tokens, and results are
    identical across partitionings (hash order, not block order)."""
    import ray.data

    from extract_kit_ray.ops.dupspans import strip_duplicated_spans

    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(60):
        n = int(rng.integers(0, 25))
        texts.append(" ".join(rng.choice(vocab, n)))
    # plant a shared phrase into a third of the docs
    for i in range(0, 60, 3):
        texts[i] = texts[i] + " the quick brown fox jumps over the lazy dog"
    ids = list(range(60))

    frames = {}
    for parts in (2, 9):
        ds = ray.data.from_arrow(_doc_table(texts, ids)).repartition(parts)
        stats = (duplicated_spans(ds, key_col="doc_id", k=4)
                 .to_pandas().sort_values("doc_id").reset_index(drop=True))
        ds2 = ray.data.from_arrow(_doc_table(texts, ids)).repartition(parts)
        strip = (strip_duplicated_spans(ds2, key_col="doc_id", k=4)
                 .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert (stats["n_tokens"].values == strip["n_tokens"].values).all()
        assert (strip["n_kept"].values ==
                (stats["n_tokens"] - stats["covered_tokens"]).values).all()
        assert (stats["covered_tokens"] <= stats["n_tokens"]).all()
        assert (stats["dup_windows"] <= stats["n_windows"]).all()
        frames[parts] = (stats, strip)
    for col in ("dup_windows", "covered_tokens"):
        assert (frames[2][0][col].values == frames[9][0][col].values).all()
    assert (frames[2][1]["text"].values == frames[9][1]["text"].values).all()


def test_k_guard():
    with pytest.raises(ValueError):
        duplicated_spans(None, k=1)
    from extract_kit_ray.ops.dupspans import strip_duplicated_spans

    with pytest.raises(ValueError):
        strip_duplicated_spans(None, k=1)


def _ref_strip(texts, ids, k):
    from collections import Counter

    wins = Counter()
    toks = {i: t.split() for i, t in zip(ids, texts)}
    for i in ids:
        ws = toks[i]
        for s in range(len(ws) - k + 1):
            wins[" ".join(ws[s:s + k])] += 1
    out = {}
    for i in ids:
        ws = toks[i]
        covered = set()
        for s in range(len(ws) - k + 1):
            if wins[" ".join(ws[s:s + k])] > 1:
                covered.update(range(s, s + k))
        kept = [w for p, w in enumerate(ws) if p not in covered]
        out[i] = (" ".join(kept), len(ws), len(kept))
    return out


@pytest.mark.parametrize("broadcast_max", [None, 0])
def test_strip_duplicated_spans_matches_reference(ray_session,
                                                  broadcast_max):
    import ray.data

    from extract_kit_ray.ops.dupspans import strip_duplicated_spans

    texts = ["p q r s t", "z p q r y", "p q r u p q r",
             "unique words only here", "a b", ""]
    ids = [10, 11, 12, 13, 14, 15]
    kwargs = {} if broadcast_max is None else {
        "broadcast_max": broadcast_max}
    ds = ray.data.from_arrow(_doc_table(texts, ids)).repartition(4)
    df = (strip_duplicated_spans(ds, key_col="doc_id", k=3, **kwargs)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ref = _ref_strip(texts, ids, 3)
    assert len(df) == len(ids)
    for row in df.itertuples():
        assert (row.text, row.n_tokens, row.n_kept) == ref[row.doc_id], row
    by = {r.doc_id: r for r in df.itertuples()}
    assert by[10].text == "s t"          # shared "p q r" stripped
    assert by[12].text == "u"            # both occurrences stripped
    assert by[13].text == "unique words only here"
    assert by[15].text == "" and by[15].n_kept == 0
