"""The extraction stage: pages batch -> extracted batch.

An actor-pool callable class (the A3 analog — the reference builds its
TurndownService with 13 compiled rules once per converter instance,
html-to-markdown.ts:33-54; here compiled regexes / rule tables live at
module import and the class instance is constructed once per actor).

The per-row work (DOM parse, scoring, render) is genuinely row-wise
compute — the batch loop is the unit of vectorization-resistant work,
not a smell; batch assembly in/out is zero-copy Arrow.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.extract import extract_document, registrable_domain
from ..schemas import EXTRACTED_SCHEMA, META_TYPE, SPAN_TYPE


def extracted_batch_from_rows(
    urls: list[str],
    ts: list,
    langs: list[str],
    payloads: list[bytes],
    *,
    strip_boilerplate: bool = True,
) -> pa.Table:
    """Extract a list of rows into an EXTRACTED_SCHEMA Arrow table."""
    out = {name: [] for name in EXTRACTED_SCHEMA.names}
    for url, t, lang, payload in zip(urls, ts, langs, payloads):
        rec = extract_document(payload, url, strip_boilerplate=strip_boilerplate)
        out["url"].append(url)
        out["warc_ts"].append(t)
        out["lang"].append(lang)
        out["domain"].append(registrable_domain(url))
        out["doc_kind"].append(rec["doc_kind"])
        out["title"].append(rec["title"])
        out["text"].append(rec["text"])
        out["spans"].append(rec["spans"])
        out["valid"].append(rec["valid"])
        out["errors"].append(rec["errors"])
        out["meta"].append(rec["meta"])
    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "warc_ts": pa.array(out["warc_ts"], pa.timestamp("us")),
            "lang": pa.array(out["lang"], pa.string()),
            "domain": pa.array(out["domain"], pa.string()),
            "doc_kind": pa.array(out["doc_kind"], pa.string()),
            "title": pa.array(out["title"], pa.string()),
            "text": pa.array(out["text"], pa.large_string()),
            "spans": pa.array(out["spans"], pa.list_(SPAN_TYPE)),
            "valid": pa.array(out["valid"], pa.bool_()),
            "errors": pa.array(out["errors"], pa.list_(pa.string())),
            "meta": pa.array(out["meta"], META_TYPE),
        },
        schema=EXTRACTED_SCHEMA,
    )


class HtmlExtractor:
    """``ds.map_batches(HtmlExtractor, batch_format="pyarrow",
    concurrency=N, batch_size=B)`` — the flagship extraction actor.

    Carries per-stage structured metrics (A10): rows / failures /
    wall-ms counted per batch, a JSON log line every ``emit_every``
    batches (state/stagelog.py)."""

    def __init__(self, strip_boilerplate: bool = True, emit_every: int = 50):
        from ..state.stagelog import StageMetrics

        self.strip_boilerplate = strip_boilerplate
        self.metrics = StageMetrics("extract", emit_every=emit_every)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.metrics.start_batch()
        out = extracted_batch_from_rows(
            batch["url"].to_pylist(),
            batch["warc_ts"].to_pylist(),
            batch["lang"].to_pylist(),
            batch["html"].to_pylist(),
            strip_boilerplate=self.strip_boilerplate,
        )
        import pyarrow.compute as pc

        n_fail = out.num_rows - (pc.sum(pc.cast(out["valid"], pa.int32())).as_py() or 0)
        self.metrics.end_batch(out.num_rows, n_fail)
        return out
