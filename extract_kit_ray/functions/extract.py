"""Per-document extraction dispatcher: payload bytes -> extracted record.

The single-document core the Ray stage maps over batches.  Routes on
``doc_kind`` (detect.py M6 analog) inside ONE function so the pipeline
needs one ``map_batches`` stage instead of N dataset splits, and is
TOTAL: every failure becomes ``valid=False`` + error strings, never an
exception (reference contract processor.ts:115-131 and the
convertMultiple placeholder behavior, index.ts:241-251).
"""

from __future__ import annotations

import re
import time
from urllib.parse import urlsplit

from . import detect
from .boilerplate import select_content_root
from .docx import docx_to_html
from .htmldom import parse_html
from .markdown import (
    MarkdownResult,
    Span,
    extract_title,
    finalize_spans,
    postprocess_markdown,
    preprocess_html,
    render_tree,
    _render_element,
    _Ctx,
)
from .pdf_layout import assemble_document, assemble_page_text, parse_pages

_WS_RUNS = re.compile(r"\n{3,}")


def registrable_domain(url: str) -> str:
    """Lowercased host, port and leading ``www.`` stripped; '' when absent."""
    try:
        host = urlsplit(url).netloc
    except ValueError:
        return ""
    host = host.lower().rsplit("@", 1)[-1].split(":", 1)[0]
    if host.startswith("www."):
        host = host[4:]
    return host


def _result(
    doc_kind: str,
    *,
    title: str = "",
    text: str = "",
    spans: list[Span] | None = None,
    valid: bool = True,
    errors: list[str] | None = None,
    n_pages: int = 1,
    n_bytes_in: int = 0,
    parse_ms: float = 0.0,
) -> dict:
    return {
        "doc_kind": doc_kind,
        "title": title,
        "text": text,
        "spans": [
            {"start": s.start, "end": s.end, "kind": s.kind} for s in (spans or [])
        ],
        "valid": valid,
        "errors": errors or [],
        "meta": {
            "n_pages": n_pages,
            "n_bytes_in": n_bytes_in,
            "n_bytes_out": len(text.encode("utf-8")),
            "parse_ms": parse_ms,
        },
    }


def extract_html_text(html: str, *, strip_boilerplate: bool = True) -> MarkdownResult:
    """HTML string -> markdown text + title + spans.

    preprocess (reference regexes) -> parse -> optional boilerplate strip
    (new-engine component) -> render with reference Turndown-rule semantics
    -> reference postprocess -> span finalization.
    """
    root = parse_html(preprocess_html(html))
    title = extract_title(root)  # before stripping: h1/title may sit outside
    if strip_boilerplate:
        content = select_content_root(root)
        if content.tag == "#root" or content.tag in ("body", "html"):
            marked = render_tree(root)
        else:
            marked = _render_element(content, _Ctx())
    else:
        marked = render_tree(root)
    marked = postprocess_markdown(marked.strip("\n"))
    text, spans = finalize_spans(marked)
    return MarkdownResult(markdown=text, title=title, spans=spans)


def _extract_plain_text(raw: str) -> tuple[str, list[Span]]:
    """Plain-text passthrough: normalize line endings, collapse 3+ blank
    lines, trim; one paragraph span per blank-line-separated block."""
    text = raw.replace("\r\n", "\n").replace("\r", "\n")
    text = _WS_RUNS.sub("\n\n", text).strip()
    spans: list[Span] = []
    pos = 0
    for block in text.split("\n\n"):
        if block.strip():
            spans.append(Span(pos, pos + len(block), "paragraph"))
        pos += len(block) + 2
    return text, spans


def extract_document(payload: bytes, url: str = "", *, strip_boilerplate: bool = True) -> dict:
    """One payload -> one extracted record dict (see module docstring)."""
    t0 = time.perf_counter()
    n_in = len(payload) if payload is not None else 0

    # plugin routing first (U6 surface, stages/plugins.py): a registered
    # extractor that accepts the payload overrides the built-in chain
    from ..stages import plugins as _plugins

    plugin = _plugins.route(payload or b"", url) if _plugins.registered() else None
    if plugin is not None:
        try:
            fields = plugin.extract(payload or b"", url)
            spans = [
                Span(s["start"], s["end"], s["kind"]) if isinstance(s, dict) else s
                for s in fields.get("spans", [])
            ]
            return _result(
                plugin.name,
                title=fields.get("title", ""),
                text=fields.get("text", ""),
                spans=spans,
                valid=fields.get("valid", True),
                errors=fields.get("errors", []),
                n_pages=fields.get("n_pages", 1),
                n_bytes_in=n_in,
                parse_ms=(time.perf_counter() - t0) * 1e3,
            )
        except Exception as exc:  # plugin failure is data, not a crash
            return _result(
                plugin.name, valid=False,
                errors=[f"plugin error: {type(exc).__name__}: {exc}"],
                n_bytes_in=n_in, parse_ms=(time.perf_counter() - t0) * 1e3,
            )

    kind = detect.detect_doc_kind(payload or b"")

    try:
        if kind == detect.KIND_EMPTY:
            return _result(kind, valid=False, errors=["empty payload"], n_bytes_in=n_in)

        if kind == detect.KIND_HTML:
            try:
                html = payload.decode("utf-8")
            except UnicodeDecodeError as exc:
                return _result(
                    kind, valid=False, errors=[f"utf-8 decode failed: {exc}"],
                    n_bytes_in=n_in, parse_ms=(time.perf_counter() - t0) * 1e3,
                )
            r = extract_html_text(html, strip_boilerplate=strip_boilerplate)
            return _result(
                kind, title=r.title, text=r.markdown, spans=r.spans,
                n_bytes_in=n_in, parse_ms=(time.perf_counter() - t0) * 1e3,
            )

        if kind == detect.KIND_LAYOUT:
            try:
                pages = parse_pages(payload)
            except (ValueError, UnicodeDecodeError) as exc:
                return _result(
                    kind, valid=False, errors=[f"layout parse failed: {exc}"],
                    n_bytes_in=n_in, parse_ms=(time.perf_counter() - t0) * 1e3,
                )
            text, offsets = assemble_document([(p.page_no, p.text) for p in pages])
            spans = [Span(start, end, "paragraph") for (_no, start, end) in offsets if end > start]
            return _result(
                kind, text=text, spans=spans, n_pages=len(pages),
                n_bytes_in=n_in, parse_ms=(time.perf_counter() - t0) * 1e3,
            )

        if kind == detect.KIND_DOCX:
            try:
                html, warnings = docx_to_html(payload)
            except ValueError as exc:
                return _result(
                    kind, valid=False, errors=[str(exc)], n_bytes_in=n_in,
                    parse_ms=(time.perf_counter() - t0) * 1e3,
                )
            r = extract_html_text(html, strip_boilerplate=False)
            return _result(
                kind, title=r.title, text=r.markdown, spans=r.spans,
                errors=warnings, valid=True, n_bytes_in=n_in,
                parse_ms=(time.perf_counter() - t0) * 1e3,
            )

        if kind == detect.KIND_TEXT:
            try:
                raw = payload.decode("utf-8")
            except UnicodeDecodeError as exc:
                return _result(
                    kind, valid=False, errors=[f"utf-8 decode failed: {exc}"],
                    n_bytes_in=n_in, parse_ms=(time.perf_counter() - t0) * 1e3,
                )
            text, spans = _extract_plain_text(raw)
            return _result(
                kind, text=text, spans=spans, n_bytes_in=n_in,
                parse_ms=(time.perf_counter() - t0) * 1e3,
            )

        if kind == detect.KIND_PDF:
            # real binary PDF parse (functions/pdf_text.py): page tree ->
            # content streams (raw/Flate) -> Tj/TJ text runs -> the same
            # x/y line merge as ek-layout (file-processor.ts:52-57 role)
            from .pdf_text import pdf_to_layout_pages

            try:
                layout_pages = pdf_to_layout_pages(payload)
            except (ValueError, UnicodeDecodeError) as exc:
                return _result(
                    kind, valid=False, errors=[f"pdf parse failed: {exc}"],
                    n_bytes_in=n_in, parse_ms=(time.perf_counter() - t0) * 1e3,
                )
            pairs = [
                (i + 1, assemble_page_text(p.get("runs", [])))
                for i, p in enumerate(layout_pages)
            ]
            text, offsets = assemble_document(pairs)
            spans = [Span(start, end, "paragraph") for (_no, start, end) in offsets if end > start]
            return _result(
                kind, text=text, spans=spans, n_pages=len(pairs),
                n_bytes_in=n_in, parse_ms=(time.perf_counter() - t0) * 1e3,
            )

        return _result(kind, valid=False, errors=[f"unsupported payload kind: {kind}"], n_bytes_in=n_in)
    except Exception as exc:  # belt-and-braces: stage must be total
        return _result(
            kind, valid=False, errors=[f"extraction error: {type(exc).__name__}: {exc}"],
            n_bytes_in=n_in, parse_ms=(time.perf_counter() - t0) * 1e3,
        )
