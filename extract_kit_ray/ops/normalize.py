"""Unicode text normalization — NFC composition + control-character
stripping, the canonicalization pass that precedes hashing/dedup in a
web pipeline (two byte-different spellings of "café" must dedup
together; stray C0 controls from broken encodings must not survive
into training text).

Order is part of the contract: controls are stripped FIRST (RE2 class,
vectorized in pyarrow), then NFC composition (per-string C call via
``unicodedata`` — the only non-Arrow step, same cost class as any
tokenizer).  DuckDB mirrors both: ``regexp_replace`` (same RE2 class)
nested inside ``nfc_normalize``, so the oracle is byte-exact.

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
    normed = pa.array(
        [unicodedata.normalize("NFC", s) if s is not None else None
         for s in stripped.to_pylist()],
        pa.string(),
    )
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
