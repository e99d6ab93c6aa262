"""Broadcast linear classifier (ops/classify.py): integer scoring,
SQL-oracle parity, broadcast-once plumbing."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from extract_kit_ray.ops.classify import (
    LinearScorer,
    model_weights,
    oracle_score_sql,
    score_documents,
)

DOCS = [
    {"doc_id": 0, "text": "data stream data pipeline"},
    {"doc_id": 1, "text": "the of the of the"},
    {"doc_id": 2, "text": ""},
    {"doc_id": 3, "text": "unrelated words only here"},
    {"doc_id": 4, "text": "vector   value\nvector  small"},  # messy ws
]
TERMS = ["data", "stream", "the", "of", "vector", "small", "pipeline",
         "value"]


def _expected(weights, bias):
    out = []
    for d in DOCS:
        s = bias + sum(weights.get(t, 0) for t in d["text"].split())
        out.append((d["doc_id"], s, s > 0))
    return out


def test_scorer_batch_matches_python():
    w = model_weights(TERMS)
    scorer = LinearScorer(weights=w, bias_micro=-100_000)
    batch = pa.Table.from_pandas(pd.DataFrame(DOCS), preserve_index=False)
    got = scorer(batch)
    want = _expected(w, -100_000)
    assert list(zip(got["doc_id"].to_pylist(), got["score_micro"].to_pylist(),
                    got["keep"].to_pylist())) == want


def test_oracle_parity():
    w = model_weights(TERMS)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS))
    want = con.execute(
        oracle_score_sql(w, bias_micro=-100_000)
    ).df().sort_values("doc_id").reset_index(drop=True)
    scorer = LinearScorer(weights=w, bias_micro=-100_000)
    got = scorer(pa.Table.from_pandas(pd.DataFrame(DOCS),
                                      preserve_index=False)).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert got["score_micro"].tolist() == want["score_micro"].tolist()
    assert got["keep"].tolist() == want["keep"].tolist()


def test_weights_deterministic_and_signed():
    w = model_weights(TERMS)
    assert w == model_weights(TERMS)
    assert any(v > 0 for v in w.values()) and any(v < 0 for v in w.values())
    assert all(v % 250_000 == 0 for v in w.values())


def test_dataset_wrapper_broadcast(ray_session):
    import ray.data

    w = model_weights(TERMS)
    ds = ray.data.from_pandas(pd.DataFrame(DOCS))
    rows = sorted(score_documents(ds, w, bias_micro=-100_000,
                                  concurrency=2).take_all(),
                  key=lambda r: r["doc_id"])
    want = _expected(w, -100_000)
    assert [(r["doc_id"], r["score_micro"], r["keep"]) for r in rows] == want


def test_oracle_sql_escapes_quotes():
    """Terms containing apostrophes must produce valid SQL (ADVICE r4):
    the VALUES list doubles single quotes."""
    w = {"don't": 5, "plain": 3}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        [{"doc_id": 0, "text": "don't stop plain"}]))
    out = con.execute(oracle_score_sql(w)).df()
    assert out["score_micro"].tolist() == [8]
