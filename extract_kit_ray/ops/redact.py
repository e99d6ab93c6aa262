"""PII redaction — a first-class training-data-pipeline stage.

Web corpora headed for model training get emails / phone numbers / IP
addresses masked before tokenization (C4 and Gopher both document a
scrub pass; the reference's pipeline stops at extraction, so this is an
engine extension, not a port).

Scale shape: a single ``map_batches`` over zero-copy Arrow batches.
Every kernel is pyarrow.compute's RE2 engine — no Python-level string
loop anywhere — and RE2 is also what DuckDB's ``regexp_replace`` uses,
so the SQL oracle is bit-exact, not approximate.  No shuffle, no state:
at 100 TB this stage is embarrassingly parallel and reads only the text
column.

Pattern order is part of the contract: emails are masked before IPs so
a dotted mail domain can never leave an IPv4-shaped residue, and phones
last.  The oracle nests its ``regexp_replace`` calls in the same order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — applied IN ORDER, counts taken on
# the text as it stands before that pattern's own replacement.  Patterns
# stay in the RE2 common subset (no lookaround/backrefs) so pyarrow and
# DuckDB agree byte-for-byte.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{3}-\d{4}", "<PHONE>"),
]


def redact_batch(batch: pa.Table, *, text_col: str = "text",
                 out_col: str = "red_text") -> pa.Table:
    """Mask every PII pattern in ``text_col``; emit the redacted text as
    ``out_col`` plus an int64 ``n_<name>`` count column per pattern.
    The input text column is dropped (the point of redaction is that
    the raw text does not travel further down the pipeline)."""
    col = batch[text_col]
    out = col
    counts: dict[str, pa.ChunkedArray] = {}
    for name, pat, repl in PII_PATTERNS:
        counts[name] = pc.cast(pc.count_substring_regex(out, pat), pa.int64())
        out = pc.replace_substring_regex(out, pat, repl)
    result = batch.drop_columns([text_col])
    result = result.append_column(out_col, out)
    for name in counts:
        result = result.append_column(f"n_{name}", counts[name])
    return result


def redact_pii(ds, *, text_col: str = "text", out_col: str = "red_text"):
    """Dataset-level wrapper: one stateless vectorized pass."""
    return ds.map_batches(
        redact_batch,
        fn_kwargs={"text_col": text_col, "out_col": out_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def oracle_redact_expr(source_expr: str) -> str:
    """DuckDB expression computing the same redaction as
    :func:`redact_batch` over ``source_expr`` — nested regexp_replace
    in PII_PATTERNS order (both engines are RE2, so this is exact)."""
    expr = source_expr
    for _name, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def oracle_count_exprs(source_expr: str) -> list[str]:
    """DuckDB expressions for the per-pattern counts, each taken on the
    text after the PRIOR patterns' replacements (mirrors redact_batch)."""
    exprs = []
    stage = source_expr
    for name, pat, _repl in PII_PATTERNS:
        exprs.append(
            f"CAST(len(regexp_extract_all({stage}, '{pat}')) AS BIGINT) AS n_{name}"
        )
        stage = f"regexp_replace({stage}, '{pat}', '{_repl}', 'g')"
    return exprs


# ---------------------------------------------------------------------------
# Credit-card redaction with Luhn verification
# ---------------------------------------------------------------------------
# A digit-run regex alone over-redacts (order ids, timestamps); real
# scrubbers (e.g. the public presidio/scrubadub designs) validate the
# Luhn checksum before masking.  The checksum is not RE2-expressible,
# so the stage is a vectorized RE2 PREFILTER (rows with a candidate at
# all — the rare case in web text) + a Python pass over only those
# rows.  The oracle cannot recompute Luhn either; queries plant cards
# from a SHARED fixture table (engine redacts for real, SQL replays
# the expected outcome), and hypothesis tests pin the checksum against
# a reference implementation.

_CARD_RE = r"\b\d(?:[ -]?\d){12,18}\b"

import re as _re

_CARD_CRE = _re.compile(_CARD_RE)


def luhn_valid(digits: str) -> bool:
    """Luhn checksum over a digit string (ISO/IEC 7812)."""
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = ord(ch) - 48
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _redact_cards_str(text: str) -> tuple[str, int]:
    n = 0

    def sub(m: "_re.Match[str]") -> str:
        nonlocal n
        digits = m.group(0).replace(" ", "").replace("-", "")
        if 13 <= len(digits) <= 19 and luhn_valid(digits):
            n += 1
            return "[CARD]"
        return m.group(0)

    return _CARD_CRE.sub(sub, text), n


def redact_cards_batch(batch: pa.Table, *, text_col: str = "text",
                       out_col: str = "text") -> pa.Table:
    """Mask Luhn-valid card numbers; ``n_cards`` counts masks per row.
    Vectorized RE2 prefilter -> Python only on candidate rows."""
    col = batch[text_col]
    has = pc.match_substring_regex(col, _CARD_RE)
    texts = col.to_pylist()
    counts = [0] * len(texts)
    for i, flag in enumerate(has.to_pylist()):
        if flag:
            texts[i], counts[i] = _redact_cards_str(texts[i] or "")
    result = batch.drop_columns([text_col])
    result = result.append_column(out_col, pa.array(texts, pa.string()))
    return result.append_column("n_cards", pa.array(counts, pa.int64()))
