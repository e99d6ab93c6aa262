"""Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
SIGMOD'03 — the MOSS algorithm): slide a window of w consecutive
k-grams over each document and select each window's MINIMUM gram; the
selected set is a position-robust document fingerprint with the
guarantee that any shared substring of at least w + k - 1 tokens
yields at least one shared selection.

Deviation from the paper, deliberately: the ordering is LEXICOGRAPHIC
over the k-gram STRINGS, not numeric over their hashes.  The
selection-quality argument is unchanged (any total order works — the
paper's randomness only protects against adversarial inputs), and the
string order makes the whole algorithm REPLAYABLE IN SQL — the DuckDB
oracle computes the identical selected set with one window-MIN, so
winnowing gets a full value-hash oracle instead of the
equality-structure checks the hashed fingerprint family settles for.

Scale shape: per-doc linear pass (amortized O(n) with the descending
min-queue) inside ``map_batches`` — stateless, zero shuffles.
"""

from __future__ import annotations

from collections import deque

import pyarrow as pa


def winnow_select(tokens: list[str], *, k: int = 4, w: int = 4,
                  ) -> list[str]:
    """Sorted distinct window-min k-grams of one token sequence.

    Sliding-window minimum via the standard monotone deque — O(n)
    total, not O(n*w)."""
    n_grams = len(tokens) - k + 1
    if n_grams <= 0:
        return []
    grams = [" ".join(tokens[i:i + k]) for i in range(n_grams)]
    if n_grams <= w:
        return sorted({min(grams)})
    selected: set[str] = set()
    dq: deque[int] = deque()  # indices, grams ascending
    for i, g in enumerate(grams):
        while dq and grams[dq[-1]] >= g:
            dq.pop()
        dq.append(i)
        if dq[0] <= i - w:
            dq.popleft()
        if i >= w - 1:
            selected.add(grams[dq[0]])
    return sorted(selected)


def winnow_batch(batch: pa.Table, *, text_col: str = "text",
                 key_col: str = "doc_id", k: int = 4, w: int = 4,
                 ) -> pa.Table:
    """Per-doc selection summary: gram count, selected-set size, and
    the lexicographic first/last selected grams (NULL when the doc is
    shorter than one k-gram)."""
    n_g, n_sel, first, last = [], [], [], []
    for text in batch[text_col].to_pylist():
        toks = (text or "").split()
        sel = winnow_select(toks, k=k, w=w)
        n_g.append(max(len(toks) - k + 1, 0))
        n_sel.append(len(sel))
        first.append(sel[0] if sel else None)
        last.append(sel[-1] if sel else None)
    return pa.table({
        key_col: batch[key_col],
        "n_grams": pa.array(n_g, pa.int64()),
        "n_selected": pa.array(n_sel, pa.int64()),
        "first_sel": pa.array(first, pa.string()),
        "last_sel": pa.array(last, pa.string()),
    })


def oracle_winnow_sql(docs_sql: str, *, k: int = 4, w: int = 4,
                      key_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """DuckDB replay: k-grams by list slicing, window-MIN over w rows,
    distinct selected grams, same summary columns."""
    return (
        f"WITH src AS ({docs_sql}), "
        f"t AS (SELECT {key_col} AS id, list_filter("
        f"regexp_split_to_array({text_col}, '\\s+'), x -> x <> '') AS ws "
        "FROM src), "
        "m AS (SELECT id, ws, len(ws) AS nt FROM t), "
        f"g AS (SELECT id, i, array_to_string(ws[i : i+{k - 1}], ' ') "
        f"AS gram FROM m, LATERAL unnest(generate_series(1, nt - {k} + 1"
        ")) AS u(i)), "
        "ngs AS (SELECT id, COUNT(*) AS ng FROM g GROUP BY id), "
        "wins AS (SELECT id, i, MIN(gram) OVER (PARTITION BY id ORDER "
        f"BY i ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS sel "
        "FROM g), "
        # full windows for docs with ng >= w; docs with fewer grams
        # degenerate to the single global min (the engine's branch)
        "sel AS (SELECT w2.id, w2.sel FROM wins w2 JOIN ngs USING (id) "
        f"WHERE ngs.ng >= {w} AND w2.i <= ngs.ng - {w} + 1 "
        "UNION ALL SELECT g.id, MIN(g.gram) AS sel FROM g "
        f"JOIN ngs USING (id) WHERE ngs.ng < {w} GROUP BY g.id), "
        "agg AS (SELECT id, CAST(COUNT(DISTINCT sel) AS BIGINT) AS "
        "n_selected, MIN(sel) AS first_sel, MAX(sel) AS last_sel "
        "FROM sel GROUP BY id) "
        f"SELECT m.id AS {key_col}, "
        f"CAST(greatest(m.nt - {k} + 1, 0) AS BIGINT) AS n_grams, "
        "CAST(coalesce(agg.n_selected, 0) AS BIGINT) AS n_selected, "
        "agg.first_sel, agg.last_sel "
        "FROM m LEFT JOIN agg ON agg.id = m.id"
    )
