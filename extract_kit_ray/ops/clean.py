"""Web-text cleaning kernels: HTML entity decoding and C4-style
line-level quality filtering — the first transforms a web corpus sees
after extraction, both shaped as shuffle-free ``map_batches`` passes.

Entity decode is a FIXED, ordered replace chain (the named entities
that dominate real extracted text), ``&amp;`` deliberately LAST so the
decode is single-pass non-recursive (``&amp;amp;`` → ``&amp;``, the
HTML5 behavior for double-escaped text).  Each step is one vectorized
``pc.replace_substring`` kernel and has a literal DuckDB ``replace``
mirror, so the chain is byte-exact against the SQL oracle.  Numeric
character references are out of scope (documented; the named set
covers the overwhelming majority of double-escaped web text).

The line filter is C4's core rule (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning", §2.2 public description): keep only
lines with ≥ ``min_words`` words that end in terminal punctuation;
rebuild the doc from survivors.  Per-doc Python loop — inherent (the
decision is per-line over per-doc structure), same shape as the
paragraph ops in ops/paradedup.py.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (entity, replacement) IN ORDER; &amp; must stay last
ENTITY_STEPS: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

TERMINAL_PUNCT = (".", "!", "?")


def decode_entities_batch(batch: pa.Table, *, text_col: str = "text",
                          out_col: str = "text") -> pa.Table:
    col = batch[text_col]
    for ent, rep in ENTITY_STEPS:
        col = pc.replace_substring(col, ent, rep)
    if out_col in batch.column_names:
        return batch.set_column(batch.schema.get_field_index(out_col),
                                out_col, col)
    return batch.append_column(out_col, col)


def oracle_decode_entities_expr(source_expr: str) -> str:
    """DuckDB expression mirroring the replace chain step for step."""
    e = source_expr
    for ent, rep in ENTITY_STEPS:
        r = rep.replace("'", "''")
        e = f"replace({e}, '{ent}', '{r}')"
    return e


def c4_line_filter(lines: list[str], *, min_words: int = 5,
                   ) -> tuple[list[str], int]:
    """Return (kept_lines, n_dropped) under the C4 rule."""
    kept: list[str] = []
    dropped = 0
    for line in lines:
        if (len(line.split()) >= min_words and line
                and line.endswith(TERMINAL_PUNCT)):
            kept.append(line)
        else:
            dropped += 1
    return kept, dropped
