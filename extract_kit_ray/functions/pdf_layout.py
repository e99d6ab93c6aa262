"""PDF-style layout parsing: text runs with x/y coordinates -> page text.

The north star names "PDF page-to-layout parsing (pdfminer-style text-run
assembly with x/y-sorted line merging)".  Real PDF decoding libraries are
not available in this environment, so the payload is our own deterministic
layout format (FIXTURES.md §1.2) — a JSON document of per-page text runs
with coordinates — and THIS module is the real thing: the line-merge /
reading-order algorithm that pdfminer-style extractors perform once runs
are decoded.  The reference's analog is the Ghostscript page render +
per-page fan-out (packages/pdf-processor/src/core/file-processor.ts:52-72);
page-order preservation mirrors its index-addressed writes
(file-processor.ts:64-72).

Payload format::

    {"kind": "ek-layout",
     "pages": [{"runs": [{"x": 72.0, "y": 700.0, "text": "Hello"}, ...]},
               ...]}

Algorithm (deterministic):
- runs are grouped into lines: two runs share a line when their y
  coordinates differ by <= ``line_tol`` (default 2.0)
- within a line, runs sort by (x, original index); joined with a single
  space when the gap is positive, or directly when x-adjacent
- lines sort top-to-bottom: DESCENDING y (PDF origin is bottom-left)
- page text = lines joined with "\\n"; document text = pages joined with
  "\\n\\n" in page order (within-group sort by page_no at reassembly)
"""

from __future__ import annotations

import json
from dataclasses import dataclass

DEFAULT_LINE_TOL = 2.0


@dataclass
class ParsedPage:
    page_no: int
    text: str
    n_runs: int


def parse_layout_payload(payload: bytes) -> list[dict]:
    """Decode the JSON payload; raises ValueError on malformed input
    (callers convert to failure-as-data rows)."""
    doc = json.loads(payload.decode("utf-8"))
    if not isinstance(doc, dict) or doc.get("kind") != "ek-layout":
        raise ValueError("not an ek-layout payload")
    pages = doc.get("pages")
    if not isinstance(pages, list):
        raise ValueError("ek-layout payload missing pages list")
    return pages


def assemble_page_text(runs: list[dict], line_tol: float = DEFAULT_LINE_TOL) -> str:
    """x/y-sorted line merge of one page's text runs (see module doc)."""
    if not runs:
        return ""
    indexed = []
    for i, run in enumerate(runs):
        x = float(run.get("x", 0.0))
        y = float(run.get("y", 0.0))
        text = str(run.get("text", ""))
        indexed.append((y, x, i, text))
    # group into lines by y proximity: sort by y desc first, then sweep
    indexed.sort(key=lambda r: (-r[0], r[1], r[2]))
    lines: list[list[tuple[float, float, int, str]]] = []
    current: list[tuple[float, float, int, str]] = []
    current_y: float | None = None
    for item in indexed:
        y = item[0]
        if current_y is None or abs(current_y - y) <= line_tol:
            current.append(item)
            current_y = y if current_y is None else current_y
        else:
            lines.append(current)
            current = [item]
            current_y = y
    if current:
        lines.append(current)
    out_lines = []
    for line in lines:
        line.sort(key=lambda r: (r[1], r[2]))  # by x, then original index
        out_lines.append(" ".join(part[3] for part in line if part[3]))
    return "\n".join(out_lines)


def parse_pages(payload: bytes, line_tol: float = DEFAULT_LINE_TOL) -> list[ParsedPage]:
    """Payload -> ordered list of parsed pages (1-based page_no, mirroring
    the reference's ``page-{i+1}.png`` naming, file-processor.ts:64-72)."""
    pages = parse_layout_payload(payload)
    out = []
    for i, page in enumerate(pages):
        runs = page.get("runs", []) if isinstance(page, dict) else []
        out.append(ParsedPage(page_no=i + 1, text=assemble_page_text(runs, line_tol), n_runs=len(runs)))
    return out


def assemble_document(page_texts: list[tuple[int, str]]) -> tuple[str, list[tuple[int, int, int]]]:
    """Reassemble per-page texts into one document.

    ``page_texts`` is a list of (page_no, text); sorted by page_no here
    (the within-group sort of SURVEY.md O1).  Returns (document_text,
    [(page_no, start_offset, end_offset)]) with offsets computed by prefix
    sums over the fixed page order (SURVEY.md §7.4 hard-part 3).
    """
    ordered = sorted(page_texts, key=lambda pt: pt[0])
    parts: list[str] = []
    offsets: list[tuple[int, int, int]] = []
    pos = 0
    for i, (page_no, text) in enumerate(ordered):
        if i > 0:
            parts.append("\n\n")
            pos += 2
        start = pos
        parts.append(text)
        pos += len(text)
        offsets.append((page_no, start, pos))
    return "".join(parts), offsets
