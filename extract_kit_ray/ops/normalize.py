"""Unicode text normalization — NFC composition + control-character
stripping, the canonicalization pass that precedes hashing/dedup in a
web pipeline (two byte-different spellings of "café" must dedup
together; stray C0 controls from broken encodings must not survive
into training text).

Order is part of the contract: controls are stripped FIRST (RE2 class,
vectorized in pyarrow), then NFC composition.  DuckDB mirrors both:
``regexp_replace`` (same RE2 class) nested inside ``nfc_normalize``,
so the oracle is byte-exact.

NFC is NOT ``pc.utf8_normalize``: the pinned pyarrow (16.1.0) maps
``form="NFC"``/``"NFKC"`` to the DECOMPOSED forms (its output equals
``unicodedata.normalize("NFD"/"NFKD", ...)`` — verified by the canary
test in tests/test_normalize.py, which flips when a fixed pyarrow
lands).  Instead the stage keeps the pass vectorized where it can:
``pc.string_is_ascii`` masks out pure-ASCII strings (ASCII is NFC by
construction — no codepoint above U+007F means no combining marks and
no composition candidates), only the non-ASCII minority is normalized
per-string (with ``unicodedata.is_normalized`` short-circuiting the
already-NFC common case), and results scatter back with
``pc.replace_with_mask``.  On mostly-ASCII web text the Python loop
touches a few percent of rows.

Scale shape: stateless ``map_batches``, no shuffle, text column only.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

# C0 controls except \t \n \r, plus DEL — the set browsers/parsers drop
CONTROL_CLASS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def normalize_batch(batch: pa.Table, *, text_col: str = "text",
                    out_col: str = "norm_text") -> pa.Table:
    """Strip controls, NFC-compose; emit ``out_col`` plus ``n_ctl``
    (controls removed) and ``changed`` (0/1 vs the input text)."""
    col = batch[text_col]
    n_ctl = pc.cast(pc.count_substring_regex(col, CONTROL_CLASS), pa.int64())
    stripped = pc.replace_substring_regex(col, CONTROL_CLASS, "")
    if isinstance(stripped, pa.ChunkedArray):
        stripped = stripped.combine_chunks()
    # ASCII rows are NFC already; normalize only the non-ASCII minority
    non_ascii = pc.fill_null(
        pc.and_kleene(pc.invert(pc.string_is_ascii(stripped)),
                      pc.is_valid(stripped)), False)
    if pc.any(non_ascii).as_py():
        sub = stripped.filter(non_ascii)
        fixed = pa.array(
            [s if unicodedata.is_normalized("NFC", s)
             else unicodedata.normalize("NFC", s)
             for s in sub.to_pylist()],
            pa.string(),
        )
        normed = pc.replace_with_mask(stripped, non_ascii, fixed)
    else:
        normed = stripped
    changed = pc.cast(pc.invert(pc.equal(normed, col)), pa.int64())
    out = batch.drop_columns([text_col])
    out = out.append_column(out_col, normed)
    out = out.append_column("n_ctl", n_ctl)
    return out.append_column("changed", changed)


def normalize_text(ds, *, text_col: str = "text", out_col: str = "norm_text"):
    """Dataset-level wrapper: one stateless vectorized pass."""
    return ds.map_batches(
        normalize_batch,
        fn_kwargs={"text_col": text_col, "out_col": out_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def oracle_normalize_expr(source_expr: str) -> str:
    """DuckDB expression mirroring :func:`normalize_batch` exactly."""
    return (f"nfc_normalize(regexp_replace({source_expr}, "
            f"'{CONTROL_CLASS}', '', 'g'))")
