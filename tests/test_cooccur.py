"""Term co-occurrence lift (ops/cooccur.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.cooccur import (MICRO, oracle_cooccur_sql,
                                         term_cooccurrence)


def _run(df, terms):
    import ray.data

    out = term_cooccurrence(ray.data.from_pandas(df), terms)
    return {(r["term_a"], r["term_b"]):
            (r["n_a"], r["n_b"], r["n_ab"], r["n_docs"], r["lift_micro"])
            for r in out.take_all()}


def test_perfect_cooccurrence(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["cat dog", "dog cat x"]})
    got = _run(df, ["cat", "dog"])
    # n=2, n_cat=n_dog=n_both=2 -> lift = 2*2/(2*2) = 1.0
    assert got[("cat", "dog")] == (2, 2, 2, 2, MICRO)


def test_never_together(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["cat", "dog"]})
    assert _run(df, ["cat", "dog"])[("cat", "dog")] == (1, 1, 0, 2, 0)


def test_positive_association(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "text": ["a b", "a b", "c", "d"]})
    # lift = 4*2/(2*2) = 2.0
    assert _run(df, ["a", "b"])[("a", "b")] == (2, 2, 2, 4, 2 * MICRO)


def test_absent_term_pair_dropped(ray_session):
    df = pd.DataFrame({"doc_id": [1], "text": ["cat"]})
    got = _run(df, ["cat", "zzz"])
    assert got == {}  # no pair: zzz never occurs


def test_multiplicity_ignored(ray_session):
    df = pd.DataFrame({"doc_id": [1], "text": ["cat cat cat dog"]})
    assert _run(df, ["cat", "dog"])[("cat", "dog")] == (1, 1, 1, 1, MICRO)


def test_single_term_raises(ray_session):
    import ray.data

    with pytest.raises(ValueError):
        term_cooccurrence(
            ray.data.from_pandas(pd.DataFrame({"text": ["x"]})), ["x"])


def test_oracle_parity_random(ray_session):
    rng = np.random.default_rng(73)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(words, rng.integers(1, 8)))
             for _ in range(300)]
    df = pd.DataFrame({"doc_id": np.arange(300), "text": texts})
    terms = ["alpha", "beta", "gamma", "delta", "nope"]
    got = _run(df, terms)
    con = duckdb.connect()
    con.register("d0", df)
    want = con.execute(
        oracle_cooccur_sql("SELECT * FROM d0", terms)).df()
    assert got == {(r.term_a, r.term_b):
                   (int(r.n_a), int(r.n_b), int(r.n_ab), int(r.n_docs),
                    int(r.lift_micro))
                   for r in want.itertuples()}
