"""Broadcast linear text classification — the batched model-inference
pattern every training-data pipeline runs (fastText-style quality /
domain classifiers scoring billions of docs).

The model here is deliberately small and deterministic — a (term ->
integer micro-weight) vector plus bias — because the OPERATOR is the
point: the weights are shipped to every actor ONCE (``ray.put`` in the
wrapper, read in ``__init__``), each batch tokenizes vectorized (the
same Arrow split/flatten/bincount machinery as ops/bm25), and scoring
is one ``tf @ w`` matmul per batch — swap the toy vector for a real
embedding matrix + softmax head and nothing about the Ray plumbing
changes.

Determinism contract: weights are INTEGER micro-units (1e-6), scores
are ``bias + sum(count * weight)`` in int64 — no float summation
order anywhere, so a SQL oracle (token unnest + join + SUM) matches
bit-for-bit.

Scale shape: stateless-per-batch actor pool, weights broadcast once,
no shuffle; O(|vocab|) per batch from the tf-matrix columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .bm25 import _tf_matrix, _tokens


def model_weights(terms: list[str], seed: int = 11) -> dict[str, int]:
    """Deterministic toy micro-weight vector over ``terms``: the j-th
    (sorted) term gets ``((j * 7 + seed) % 13 - 6) * 250_000`` — signed,
    closed-form, exactly reproducible in SQL."""
    return {t: ((j * 7 + seed) % 13 - 6) * 250_000
            for j, t in enumerate(sorted(terms))}


class LinearScorer:
    """Actor-pool stage: weights fetched from the object store once per
    actor; per batch ONE vectorized tf-matrix build + integer matmul."""

    def __init__(self, weights_ref=None, *, weights: dict[str, int] | None = None,
                 bias_micro: int = 0, text_col: str = "text",
                 key_col: str = "doc_id",
                 keep_cols: list[str] | None = None):
        if weights is None:
            import ray as _r

            weights = _r.get(weights_ref)
        self.terms = sorted(weights)
        self.w = np.array([weights[t] for t in self.terms], dtype=np.int64)
        self.bias = int(bias_micro)
        self.text_col = text_col
        self.key_col = key_col
        self.keep_cols = list(keep_cols or [])

    def __call__(self, batch: pa.Table) -> pa.Table:
        words, _dl = _tokens(batch[self.text_col])
        tf = _tf_matrix(words, len(batch), self.terms)
        scores = tf @ self.w + self.bias
        out = pa.table({
            self.key_col: batch[self.key_col],
            "score_micro": pa.array(scores, pa.int64()),
            "keep": pa.array(scores > 0),
        })
        for c in self.keep_cols:
            out = out.append_column(c, batch[c])
        return out


def score_documents(ds, weights: dict[str, int], *, bias_micro: int = 0,
                    text_col: str = "text", key_col: str = "doc_id",
                    keep_cols: list[str] | None = None,
                    concurrency=4, batch_size: int | None = None):
    """documents Dataset -> (key, score_micro, keep[, keep_cols...])
    Dataset.  Weights ship through the object store once (``ray.put``),
    not per batch."""
    import ray as _ray

    ref = _ray.put(dict(weights))
    return ds.map_batches(
        LinearScorer,
        fn_constructor_args=(ref,),
        fn_constructor_kwargs={"bias_micro": bias_micro,
                               "text_col": text_col, "key_col": key_col,
                               "keep_cols": keep_cols},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
        **({"batch_size": batch_size} if batch_size else {}),
    )


def oracle_score_sql(terms_weights: dict[str, int], *, bias_micro: int = 0,
                     table: str = "documents", text_expr: str = "text",
                     key_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`LinearScorer`: whitespace-tokenize with
    the same normalize/split convention, join the weight VALUES list,
    SUM(count * weight) in BIGINT (integer — no float order issues)."""
    vals = ", ".join(
        "('{}', {})".format(t.replace("'", "''"), w)
        for t, w in sorted(terms_weights.items()))
    return f"""
WITH toks AS (
  SELECT {key_col},
         unnest(string_split(trim(regexp_replace({text_expr}, '\\s+', ' ', 'g'),
                                  ' '), ' ')) AS tok
  FROM {table}
), w(term, wt) AS (VALUES {vals}),
hits AS (
  SELECT t.{key_col}, CAST(SUM(w.wt) AS BIGINT) AS s
  FROM toks t JOIN w ON t.tok = w.term
  GROUP BY t.{key_col}
)
SELECT d.{key_col},
       CAST({bias_micro} + COALESCE(h.s, 0) AS BIGINT) AS score_micro,
       ({bias_micro} + COALESCE(h.s, 0)) > 0 AS keep
FROM {table} d LEFT JOIN hits h ON d.{key_col} = h.{key_col}
"""
