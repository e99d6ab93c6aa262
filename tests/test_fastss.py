"""FastSS deletion-neighborhood similarity join (ops/fastss.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.fastss import (_deletion_neighborhood, _lev,
                                        capped_vocab, editk_pairs,
                                        oracle_editk_pairs_sql)


def test_lev_matches_duckdb():
    rng = np.random.default_rng(11)
    words = ["".join(rng.choice(list("abcd"), rng.integers(1, 8)))
             for _ in range(40)]
    con = duckdb.connect()
    for a in words[:20]:
        for b in words[20:]:
            want = con.execute(
                "SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
            assert _lev(a, b) == want, (a, b)


def test_deletion_neighborhood():
    nb = _deletion_neighborhood("abc", 2)
    assert nb == {"abc", "ab", "ac", "bc", "a", "b", "c"}
    assert _deletion_neighborhood("ab", 5) == {"ab", "a", "b", ""}


def test_editk_pairs_small_vocab(ray_session):
    import ray.data

    vocab = pd.DataFrame({"word": ["cat", "cart", "carts", "dog",
                                   "dig", "cast", "zebra"]})
    out = editk_pairs(ray.data.from_pandas(vocab), k=2)
    got = sorted((r["term_a"], r["term_b"], int(r["dist"]))
                 for r in out.take_all())
    con = duckdb.connect()
    con.register("v", vocab)
    want = con.execute(
        "SELECT a.word ta, b.word tb, levenshtein(a.word, b.word) d "
        "FROM v a JOIN v b ON a.word < b.word "
        "WHERE levenshtein(a.word, b.word) BETWEEN 1 AND 2").df()
    assert got == sorted((a, b, int(d)) for a, b, d in
                         zip(want["ta"], want["tb"], want["d"]))
    assert ("cart", "cat", 1) in got          # insertion
    assert ("cart", "carts", 1) in got        # deletion
    assert ("cart", "cast", 1) in got         # substitution
    assert ("dig", "dog", 1) in got
    assert ("carts", "cast", 2) in got        # sub + del


def test_end_to_end_oracle_parity(ray_session):
    import ray.data

    rng = np.random.default_rng(23)
    base = ["stream", "steam", "stone", "strum", "batch", "match",
            "latch", "zz9", "UPPER", "toolongwordbeyondtwelve"]
    docs = pd.DataFrame({
        "text": [" ".join(rng.choice(base, 12)) for _ in range(60)]})
    out = editk_pairs(capped_vocab(ray.data.from_pandas(docs), top_v=50))
    got = sorted((r["term_a"], r["term_b"], int(r["dist"]))
                 for r in out.take_all())
    con = duckdb.connect()
    con.register("docs", docs)
    want = con.execute(oracle_editk_pairs_sql(
        "SELECT text FROM docs", top_v=50)).df()
    assert len(got) > 0
    assert got == sorted((a, b, int(d)) for a, b, d in
                         zip(want["term_a"], want["term_b"], want["dist"]))
