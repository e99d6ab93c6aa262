"""DOCX (WordprocessingML) -> HTML, dependency-free.

Rebuilds the reference's DOCX chain (SURVEY.md §3.3) without mammoth:

1. zip preprocess — OMML math in word/document.xml, word/footnotes.xml,
   word/endnotes.xml replaced with ``$...$``/``$$...$$`` LaTeX text runs
   (docx-preprocessor.ts:90-123, regex pack ported in :mod:`omml`)
2. a minimal WordprocessingML walker producing HTML: headings from
   pStyle Heading1-6, bold/italic runs, consecutive numPr paragraphs
   grouped into lists, w:tbl -> <table> (the mammoth step M9, rebuilt)
3. the HTML then flows through the shared HTML->Markdown stage (stage
   composition, SURVEY.md §7.2 step 5)

Mammoth-style conversion warnings surface in a warnings list, not as
exceptions (docx-converter.ts:191-202 contract).
"""

from __future__ import annotations

import io
import re
import zipfile
from html import escape
from xml.etree import ElementTree

from .omml import preprocess_math_xml

W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

MATH_PROCESS_FILES = (  # docx-preprocessor.ts:95-99
    "word/document.xml",
    "word/footnotes.xml",
    "word/endnotes.xml",
)

_HEADING_RE = re.compile(r"^Heading([1-6])$", re.I)
# strip any non-w namespace elements the tiny walker doesn't know
_NS_TAG = re.compile(r"^\{[^}]*\}")


def preprocess_docx(payload: bytes) -> bytes:
    """Rewrite math XML inside the DOCX zip; on any failure return the
    original bytes (docx-preprocessor.ts:118-122 fallback)."""
    try:
        src = zipfile.ZipFile(io.BytesIO(payload))
        out_buf = io.BytesIO()
        with zipfile.ZipFile(out_buf, "w", zipfile.ZIP_DEFLATED) as dst:
            for info in src.infolist():
                data = src.read(info.filename)
                if info.filename in MATH_PROCESS_FILES:
                    try:
                        data = preprocess_math_xml(data.decode("utf-8")).encode("utf-8")
                    except Exception:
                        pass  # keep original content (docx-preprocessor.ts:109-112)
                dst.writestr(info.filename, data)
        return out_buf.getvalue()
    except Exception:
        return payload


def _run_html(run: ElementTree.Element, warnings: list[str]) -> str:
    """One w:r -> inline HTML (bold/italic from rPr, text from w:t/w:br/w:tab)."""
    bold = False
    italic = False
    rpr = run.find(f"{W_NS}rPr")
    if rpr is not None:
        b = rpr.find(f"{W_NS}b")
        bold = b is not None and b.get(f"{W_NS}val", "true") not in ("false", "0")
        i = rpr.find(f"{W_NS}i")
        italic = i is not None and i.get(f"{W_NS}val", "true") not in ("false", "0")
    parts: list[str] = []
    for child in run:
        tag = child.tag
        if tag == f"{W_NS}t":
            parts.append(escape(child.text or ""))
        elif tag == f"{W_NS}br":
            parts.append("<br>")
        elif tag == f"{W_NS}tab":
            parts.append(" ")
        elif tag != f"{W_NS}rPr":
            short = _NS_TAG.sub("", tag)
            if short not in ("lastRenderedPageBreak", "noBreakHyphen", "softHyphen"):
                warnings.append(f"unsupported run element: {short}")
    text = "".join(parts)
    if not text:
        return ""
    if bold:
        text = f"<strong>{text}</strong>"
    if italic:
        text = f"<em>{text}</em>"
    return text


def _paragraph_info(p: ElementTree.Element, warnings: list[str]) -> tuple[str, str, bool]:
    """One w:p -> (inline_html, heading_level_tag_or_p, is_list_item)."""
    style = ""
    is_list = False
    ppr = p.find(f"{W_NS}pPr")
    if ppr is not None:
        pstyle = ppr.find(f"{W_NS}pStyle")
        if pstyle is not None:
            style = pstyle.get(f"{W_NS}val", "")
        if ppr.find(f"{W_NS}numPr") is not None:
            is_list = True
    inner_parts = []
    for child in p:
        if child.tag == f"{W_NS}r":
            inner_parts.append(_run_html(child, warnings))
        elif child.tag == f"{W_NS}hyperlink":
            for r in child.findall(f"{W_NS}r"):
                inner_parts.append(_run_html(r, warnings))
    inner = "".join(inner_parts)
    m = _HEADING_RE.match(style)
    tag = f"h{m.group(1)}" if m else "p"
    return inner, tag, is_list


def _table_html(tbl: ElementTree.Element, warnings: list[str]) -> str:
    rows = []
    for tr in tbl.findall(f"{W_NS}tr"):
        cells = []
        for tc in tr.findall(f"{W_NS}tc"):
            cell_parts = []
            for p in tc.findall(f"{W_NS}p"):
                inner, _, _ = _paragraph_info(p, warnings)
                if inner:
                    cell_parts.append(inner)
            cells.append(f"<td>{' '.join(cell_parts)}</td>")
        rows.append(f"<tr>{''.join(cells)}</tr>")
    return f"<table>{''.join(rows)}</table>"


def docx_xml_to_html(document_xml: str, warnings: list[str]) -> str:
    """word/document.xml -> HTML string (the rebuilt mammoth step)."""
    root = ElementTree.fromstring(document_xml)
    body = root.find(f"{W_NS}body")
    if body is None:
        warnings.append("document.xml has no body")
        return ""
    out: list[str] = []
    open_list = False
    for element in body:
        tag = element.tag
        if tag == f"{W_NS}p":
            inner, htag, is_list = _paragraph_info(element, warnings)
            if is_list:
                if not open_list:
                    out.append("<ul>")
                    open_list = True
                out.append(f"<li>{inner}</li>")
                continue
            if open_list:
                out.append("</ul>")
                open_list = False
            if inner:
                out.append(f"<{htag}>{inner}</{htag}>")
        elif tag == f"{W_NS}tbl":
            if open_list:
                out.append("</ul>")
                open_list = False
            out.append(_table_html(element, warnings))
        elif tag != f"{W_NS}sectPr":
            warnings.append(f"unsupported body element: {_NS_TAG.sub('', tag)}")
    if open_list:
        out.append("</ul>")
    return "".join(out)


def docx_to_html(payload: bytes) -> tuple[str, list[str]]:
    """Full DOCX bytes -> (HTML, warnings). Raises ValueError only when the
    payload is not a readable DOCX at all (callers turn that into a
    failure-as-data row)."""
    warnings: list[str] = []
    preprocessed = preprocess_docx(payload)
    try:
        zf = zipfile.ZipFile(io.BytesIO(preprocessed))
        document_xml = zf.read("word/document.xml").decode("utf-8")
    except (zipfile.BadZipFile, KeyError, UnicodeDecodeError) as exc:
        raise ValueError(f"unreadable docx: {exc}") from exc
    try:
        html = docx_xml_to_html(document_xml, warnings)
    except ElementTree.ParseError as exc:
        raise ValueError(f"malformed document.xml: {exc}") from exc
    return html, warnings
