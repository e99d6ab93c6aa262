"""Term co-occurrence lift over the corpus — "which vocabulary terms
appear in the same documents far more often than independence
predicts", the association-mining primitive behind topic seeds,
collocation discovery and query expansion.

For a FIXED small term set T (ships once in the task closure, never a
shuffle side) and doc-level presence sets:

    lift(x, y) = N * n_xy / (n_x * n_y)     (x < y lexicographically)

reported in exact micro units: ``lift_micro = N * n_xy * 1_000_000 //
(n_x * n_y)`` with Python-int arithmetic (no int64 overflow for any
corpus size; the RESULT fits int64 while ``N <= ~9.2e12`` — the
quotient is bounded by N * MICRO) — the DuckDB oracle mirrors it in
HUGEINT.  lift_micro > 1_000_000 means positive association (PMI > 0
without the log, which would be float).

Scale shape: each batch builds a docs x |T| presence bit-matrix (one
tokenize pass per doc — same whitespace convention as
ops/classify.py) and reduces it to a |T| x |T| co-occurrence matrix
with ONE numpy matmul; the shuffle moves at most |T|^2/2 + 1 int64
triples per batch.  A single groupby sums the partials and one
constant-key fold (the merged matrix is |T|^2 rows — driver-side
small by construction) emits the pair table.

Pairs are emitted for every x < y with n_x > 0 and n_y > 0
(n_xy = 0 rows included — absence of co-occurrence is signal).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MICRO = 1_000_000


def term_cooccurrence(ds, terms: list[str], *, text_col: str = "text"):
    """Dataset -> (term_a, term_b, n_a, n_b, n_ab, n_docs, lift_micro)
    Dataset, one row per lexicographic term pair present in the
    corpus.  ``terms`` is deduped and sorted; presence is doc-level
    (multiplicity ignored)."""
    from ray.data.aggregate import Sum

    vocab = sorted(set(terms))
    if len(vocab) < 2:
        raise ValueError("term_cooccurrence: need at least two terms")
    k = len(vocab)
    index = {t: i for i, t in enumerate(vocab)}

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        m = np.zeros((len(texts), k), dtype=np.int64)
        for row, text in enumerate(texts):
            for tok in set((text or "").split()):
                j = index.get(tok)
                if j is not None:
                    m[row, j] = 1
        pairs = m.T @ m  # k x k, diagonal = per-term doc counts
        iu, ju = np.triu_indices(k)
        return pa.table({
            "i": pa.array(np.append(iu, -1), pa.int64()),
            "j": pa.array(np.append(ju, -1), pa.int64()),
            "c": pa.array(np.append(pairs[iu, ju], len(texts)), pa.int64()),
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["i", "j"]).aggregate(Sum("c", alias_name="c")))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        lut = {(int(i), int(j)): int(c)
               for i, j, c in zip(df["i"], df["j"], df["c"])}
        n_docs = lut.pop((-1, -1), 0)
        out = {c: [] for c in ["term_a", "term_b", "n_a", "n_b", "n_ab",
                               "n_docs", "lift_micro"]}
        for a in range(k):
            n_a = lut.get((a, a), 0)
            if n_a == 0:
                continue
            for b in range(a + 1, k):
                n_b = lut.get((b, b), 0)
                if n_b == 0:
                    continue
                n_ab = lut.get((a, b), 0)
                out["term_a"].append(vocab[a])
                out["term_b"].append(vocab[b])
                out["n_a"].append(n_a)
                out["n_b"].append(n_b)
                out["n_ab"].append(n_ab)
                out["n_docs"].append(n_docs)
                # Python ints: exact at any corpus size
                out["lift_micro"].append(
                    n_docs * n_ab * MICRO // (n_a * n_b))
        res = pd.DataFrame(out)
        for c in ["n_a", "n_b", "n_ab", "n_docs", "lift_micro"]:
            res[c] = res[c].astype(np.int64)
        return res

    def const_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__all"] = np.zeros(len(df), dtype=np.int64)
        return df

    return (merged.map_batches(const_key, batch_format="pandas")
            .groupby("__all")
            .map_groups(lambda df: fold(df.drop(columns=["__all"])),
                        batch_format="pandas"))


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def oracle_cooccur_sql(docs_sql: str, terms: list[str], *,
                       text_col: str = "text",
                       key_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`term_cooccurrence` (HUGEINT lift)."""
    vocab = sorted(set(terms))
    vals = ", ".join(f"({_q(t)})" for t in vocab)
    return f"""
WITH t(term) AS (VALUES {vals}),
docs AS (SELECT {key_col}, {text_col} FROM ({docs_sql})),
toks AS (
  SELECT {key_col},
         unnest(string_split(trim(regexp_replace({text_col}, '\\s+', ' ',
                                                 'g'), ' '), ' ')) AS tok
  FROM docs
), pres AS (
  SELECT DISTINCT d.{key_col}, t.term FROM toks d JOIN t ON d.tok = t.term
), cnt AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM pres GROUP BY term
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM docs),
co AS (
  SELECT p.term AS term_a, q.term AS term_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM pres p JOIN pres q
    ON p.{key_col} = q.{key_col} AND p.term < q.term
  GROUP BY 1, 2
)
SELECT a.term AS term_a, b.term AS term_b, a.c AS n_a, b.c AS n_b,
       COALESCE(co.n_ab, 0) AS n_ab, n.n_docs,
       CAST(CAST(n.n_docs AS HUGEINT) * COALESCE(co.n_ab, 0) * {MICRO}
            // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS lift_micro
FROM cnt a JOIN cnt b ON a.term < b.term
LEFT JOIN co ON co.term_a = a.term AND co.term_b = b.term
CROSS JOIN n
"""
