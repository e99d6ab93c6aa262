"""DOCX (WordprocessingML) -> HTML, dependency-free.

Rebuilds the reference's DOCX chain (SURVEY.md §3.3) without mammoth:

1. zip preprocess — OMML math in word/document.xml, word/footnotes.xml,
   word/endnotes.xml replaced with ``$...$``/``$$...$$`` LaTeX text runs
   (docx-preprocessor.ts:90-123, regex pack ported in :mod:`omml`)
2. a WordprocessingML walker producing HTML (the mammoth step M9,
   rebuilt — docx-converter.ts:163-202 semantics):
   - headings from pStyle Heading1-6, bold/italic runs
   - numbered vs bulleted lists from ``w:numPr`` resolved through
     word/numbering.xml (numId -> abstractNum -> lvl numFmt), nested
     by ``w:ilvl``
   - hyperlinks from ``w:hyperlink`` r:id resolved through
     word/_rels/document.xml.rels (and ``w:anchor`` -> ``#fragment``)
   - images (``w:drawing`` / legacy ``w:pict``): embedded bytes are
     resolved a:blip r:embed -> document.xml.rels -> word/media/* and
     emitted as mammoth-default ``<img src="data:{type};base64,...">``
     (content type from [Content_Types].xml overrides/defaults), alt
     from docPr descr (fallback title/name); images whose bytes can't
     be resolved degrade to the ``<img alt>`` placeholder + warning
   - a mammoth-style styleMap: ``p[style-name='X'] => tag`` /
     ``r[style-name='X'] => tag`` entries override the defaults
     (docx-converter.ts:166-169 passthrough, U4)
   - w:tbl -> <table>
3. the HTML then flows through the shared HTML->Markdown stage (stage
   composition, SURVEY.md §7.2 step 5)

Mammoth-style conversion warnings surface in a warnings list, not as
exceptions (docx-converter.ts:191-202 contract).
"""

from __future__ import annotations

import base64
import io
import posixpath
import re
import zipfile
from html import escape
from xml.etree import ElementTree

from .omml import preprocess_math_xml

W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
RELS_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

MATH_PROCESS_FILES = (  # docx-preprocessor.ts:95-99
    "word/document.xml",
    "word/footnotes.xml",
    "word/endnotes.xml",
)

_HEADING_RE = re.compile(r"^Heading([1-6])$", re.I)
# strip any non-w namespace elements the tiny walker doesn't know
_NS_TAG = re.compile(r"^\{[^}]*\}")
# mammoth styleMap entry: p[style-name='Quote'] => blockquote
_STYLE_MAP_RE = re.compile(
    r"^\s*([pr])\[style-name=['\"]([^'\"]+)['\"]\]\s*=>\s*([A-Za-z][A-Za-z0-9]*)\s*$"
)

# numbering formats that render as ordered lists; anything else
# (bullet, none, unknown) renders unordered
_ORDERED_FMTS = frozenset(
    {"decimal", "lowerLetter", "upperLetter", "lowerRoman", "upperRoman",
     "decimalZero", "ordinal", "cardinalText", "ordinalText"}
)


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


def parse_style_map(entries: list[str] | None, warnings: list[str]) -> tuple[dict, dict]:
    """Mammoth-style styleMap entries -> ({p_style: tag}, {r_style: tag}).

    Unparseable entries warn and are skipped (mammoth contract: custom
    maps extend, never crash)."""
    p_map: dict[str, str] = {}
    r_map: dict[str, str] = {}
    for entry in entries or []:
        m = _STYLE_MAP_RE.match(entry)
        if not m:
            warnings.append(f"unparseable styleMap entry: {entry!r}")
            continue
        (p_map if m.group(1) == "p" else r_map)[m.group(2)] = m.group(3).lower()
    return p_map, r_map


def _load_rels(zf: zipfile.ZipFile) -> dict[str, str]:
    """word/_rels/document.xml.rels -> {rId: Target} (hyperlink hrefs)."""
    try:
        data = zf.read("word/_rels/document.xml.rels")
    except KeyError:
        return {}
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError:
        return {}
    out = {}
    for rel in root.iter(f"{RELS_NS}Relationship"):
        rid = rel.get("Id")
        target = rel.get("Target")
        if rid and target:
            out[rid] = target
    return out


CT_NS = "{http://schemas.openxmlformats.org/package/2006/content-types}"

# mammoth content-types.js fallback map for extensions missing from
# [Content_Types].xml (public mammoth.js behavior)
_CT_FALLBACK = {
    "png": "png", "gif": "gif", "jpeg": "jpeg", "jpg": "jpeg",
    "tif": "tiff", "tiff": "tiff", "bmp": "bmp",
}


def _load_content_types(zf: zipfile.ZipFile) -> tuple[dict[str, str], dict[str, str]]:
    """[Content_Types].xml -> ({extension: type}, {part name: type})."""
    try:
        root = ElementTree.fromstring(zf.read("[Content_Types].xml"))
    except (KeyError, ElementTree.ParseError):
        return {}, {}
    defaults: dict[str, str] = {}
    overrides: dict[str, str] = {}
    for el in root.iter(f"{CT_NS}Default"):
        ext, ct = el.get("Extension"), el.get("ContentType")
        if ext and ct:
            defaults[ext.lower()] = ct
    for el in root.iter(f"{CT_NS}Override"):
        part, ct = el.get("PartName"), el.get("ContentType")
        if part and ct:
            overrides[part] = ct
    return defaults, overrides


def _load_numbering(zf: zipfile.ZipFile) -> dict[str, dict[int, str]]:
    """word/numbering.xml -> {numId: {ilvl: numFmt}}."""
    try:
        data = zf.read("word/numbering.xml")
    except KeyError:
        return {}
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError:
        return {}
    abstract: dict[str, dict[int, str]] = {}
    for an in root.iter(f"{W_NS}abstractNum"):
        aid = an.get(f"{W_NS}abstractNumId")
        lvls: dict[int, str] = {}
        for lvl in an.iter(f"{W_NS}lvl"):
            try:
                ilvl = int(lvl.get(f"{W_NS}ilvl", "0"))
            except ValueError:
                continue
            fmt = lvl.find(f"{W_NS}numFmt")
            lvls[ilvl] = fmt.get(f"{W_NS}val", "bullet") if fmt is not None else "bullet"
        if aid is not None:
            abstract[aid] = lvls
    nums: dict[str, dict[int, str]] = {}
    for num in root.iter(f"{W_NS}num"):
        nid = num.get(f"{W_NS}numId")
        ref = num.find(f"{W_NS}abstractNumId")
        if nid is not None and ref is not None:
            nums[nid] = abstract.get(ref.get(f"{W_NS}val", ""), {})
    return nums


def _load_notes(zf: zipfile.ZipFile, which: str) -> dict[str, ElementTree.Element]:
    """word/footnotes.xml / word/endnotes.xml -> {id: note element},
    skipping the separator/continuation pseudo-notes."""
    try:
        data = zf.read(f"word/{which}.xml")
    except KeyError:
        return {}
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError:
        return {}
    tag = f"{W_NS}{which[:-1]}"  # footnote / endnote
    out = {}
    for note in root.iter(tag):
        if note.get(f"{W_NS}type") in ("separator", "continuationSeparator"):
            continue
        nid = note.get(f"{W_NS}id")
        if nid is not None:
            out[nid] = note
    return out


class _DocCtx:
    """Per-document conversion context: rels, numbering, styleMap,
    footnotes/endnotes (+ the in-document reference order)."""

    def __init__(self, rels=None, numbering=None, p_style_map=None,
                 r_style_map=None, footnotes=None, endnotes=None,
                 zf=None, ct_defaults=None, ct_overrides=None):
        self.rels = rels or {}
        self.numbering = numbering or {}
        self.p_style_map = p_style_map or {}
        self.r_style_map = r_style_map or {}
        self.footnotes = footnotes or {}
        self.endnotes = endnotes or {}
        self.zf = zf  # open ZipFile for embedded-image byte reads
        self.ct_defaults = ct_defaults or {}
        self.ct_overrides = ct_overrides or {}
        # (kind, id) in first-reference order -> sequential [n] numbering
        self.note_refs: list[tuple[str, str]] = []

    def note_number(self, kind: str, nid: str) -> int:
        ref = (kind, nid)
        if ref not in self.note_refs:
            self.note_refs.append(ref)
        return self.note_refs.index(ref) + 1


def _drawing_alt(element: ElementTree.Element) -> str:
    """Alt text of a w:drawing / w:pict: docPr descr (mammoth's
    preference), falling back to title then name."""
    for node in element.iter():
        if node.tag.endswith("}docPr"):
            return node.get("descr") or node.get("title") or node.get("name") or ""
    return ""


def _image_data_uri(
    element: ElementTree.Element, ctx: _DocCtx, warnings: list[str]
) -> str | None:
    """Resolve the embedded image bytes of a w:drawing / w:pict into a
    mammoth-default ``data:{contentType};base64,...`` URI.

    a:blip r:embed (DrawingML) / v:imagedata r:id (legacy VML) ->
    document.xml.rels target -> zip part under word/.  Returns None
    (degrade to alt placeholder) for linked-not-embedded images,
    unresolved relationships, or missing parts — each with a warning,
    never an exception (docx-converter.ts:191-202 contract)."""
    rid = None
    for node in element.iter():
        if node.tag.endswith("}blip"):
            rid = node.get(f"{R_NS}embed")
            if rid is None and node.get(f"{R_NS}link"):
                warnings.append("linked (non-embedded) image skipped")
                return None
            break
        if node.tag.endswith("}imagedata"):
            rid = node.get(f"{R_NS}id")
            break
    if rid is None or ctx.zf is None:
        return None
    target = ctx.rels.get(rid)
    if not target:
        warnings.append(f"image with unresolved relationship id {rid!r}")
        return None
    # part-name resolution: targets are relative to word/, absolute
    # targets ("/word/media/x.png") name the part directly
    part = target.lstrip("/") if target.startswith("/") else posixpath.normpath(
        "word/" + target)
    try:
        data = ctx.zf.read(part)
    except KeyError:
        warnings.append(f"image part not found in archive: {part!r}")
        return None
    ext = part.rsplit(".", 1)[-1].lower() if "." in part else ""
    ctype = ctx.ct_overrides.get("/" + part) or ctx.ct_defaults.get(ext)
    if not ctype:
        fb = _CT_FALLBACK.get(ext)
        ctype = f"image/{fb}" if fb else "application/octet-stream"
    return f"data:{ctype};base64,{base64.b64encode(data).decode('ascii')}"


def _run_html(run: ElementTree.Element, ctx: _DocCtx, warnings: list[str]) -> str:
    """One w:r -> inline HTML (bold/italic/rStyle from rPr, text from
    w:t/w:br/w:tab, images from w:drawing/w:pict)."""
    bold = False
    italic = False
    r_style_tag = ""
    rpr = run.find(f"{W_NS}rPr")
    if rpr is not None:
        b = rpr.find(f"{W_NS}b")
        bold = b is not None and b.get(f"{W_NS}val", "true") not in ("false", "0")
        i = rpr.find(f"{W_NS}i")
        italic = i is not None and i.get(f"{W_NS}val", "true") not in ("false", "0")
        rstyle = rpr.find(f"{W_NS}rStyle")
        if rstyle is not None:
            r_style_tag = ctx.r_style_map.get(rstyle.get(f"{W_NS}val", ""), "")
    parts: list[str] = []
    for child in run:
        tag = child.tag
        if tag == f"{W_NS}t":
            parts.append(escape(child.text or ""))
        elif tag == f"{W_NS}br":
            parts.append("<br>")
        elif tag == f"{W_NS}tab":
            parts.append(" ")
        elif tag in (f"{W_NS}drawing", f"{W_NS}pict", f"{W_NS}object"):
            alt = _drawing_alt(child)
            src = _image_data_uri(child, ctx, warnings)
            if src is not None:
                # mammoth default convertImage: data-URI src, alt only
                # when the drawing carries alt text
                alt_attr = f' alt="{escape(alt, quote=True)}"' if alt else ""
                parts.append(f'<img src="{src}"{alt_attr}>')
            else:
                parts.append(f'<img alt="{escape(alt, quote=True)}">')
        elif tag in (f"{W_NS}footnoteReference", f"{W_NS}endnoteReference"):
            kind = "footnote" if tag.endswith("footnoteReference") else "endnote"
            nid = child.get(f"{W_NS}id", "")
            notes = ctx.footnotes if kind == "footnote" else ctx.endnotes
            if nid in notes:
                n = ctx.note_number(kind, nid)
                parts.append(
                    f'<sup><a href="#{kind}-{nid}" id="{kind}-ref-{nid}">'
                    f"[{n}]</a></sup>"
                )
            else:
                warnings.append(f"unresolved {kind} reference id {nid!r}")
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
    if r_style_tag:
        text = f"<{r_style_tag}>{text}</{r_style_tag}>"
    return text


def _inline_html(p: ElementTree.Element, ctx: _DocCtx, warnings: list[str]) -> str:
    """Paragraph children -> inline HTML, resolving w:hyperlink wrappers."""
    parts: list[str] = []
    for child in p:
        if child.tag == f"{W_NS}r":
            parts.append(_run_html(child, ctx, warnings))
        elif child.tag == f"{W_NS}hyperlink":
            inner = "".join(
                _run_html(r, ctx, warnings) for r in child.findall(f"{W_NS}r")
            )
            rid = child.get(f"{R_NS}id")
            anchor = child.get(f"{W_NS}anchor")
            href = ctx.rels.get(rid, "") if rid else (f"#{anchor}" if anchor else "")
            if href and inner:
                parts.append(f'<a href="{escape(href, quote=True)}">{inner}</a>')
            elif inner:
                warnings.append("hyperlink with unresolved relationship id")
                parts.append(inner)
    return "".join(parts)


def _paragraph_info(
    p: ElementTree.Element, ctx: _DocCtx, warnings: list[str]
) -> tuple[str, str, tuple[int, str] | None]:
    """One w:p -> (inline_html, block_tag, list_info).

    list_info is None for non-list paragraphs, else (ilvl, "ol"|"ul")
    resolved through numbering.xml."""
    style = ""
    list_info: tuple[int, str] | None = None
    ppr = p.find(f"{W_NS}pPr")
    if ppr is not None:
        pstyle = ppr.find(f"{W_NS}pStyle")
        if pstyle is not None:
            style = pstyle.get(f"{W_NS}val", "")
        numpr = ppr.find(f"{W_NS}numPr")
        if numpr is not None:
            ilvl_el = numpr.find(f"{W_NS}ilvl")
            numid_el = numpr.find(f"{W_NS}numId")
            try:
                ilvl = int(ilvl_el.get(f"{W_NS}val", "0")) if ilvl_el is not None else 0
            except ValueError:
                ilvl = 0
            numid = numid_el.get(f"{W_NS}val", "") if numid_el is not None else ""
            fmt = ctx.numbering.get(numid, {}).get(ilvl, "bullet")
            list_info = (ilvl, "ol" if fmt in _ORDERED_FMTS else "ul")
    inner = _inline_html(p, ctx, warnings)
    if style in ctx.p_style_map:
        tag = ctx.p_style_map[style]
    else:
        m = _HEADING_RE.match(style)
        tag = f"h{m.group(1)}" if m else "p"
    return inner, tag, list_info


def _table_html(tbl: ElementTree.Element, ctx: _DocCtx, warnings: list[str]) -> str:
    rows = []
    for tr in tbl.findall(f"{W_NS}tr"):
        cells = []
        for tc in tr.findall(f"{W_NS}tc"):
            cell_parts = []
            for p in tc.findall(f"{W_NS}p"):
                inner, _, _ = _paragraph_info(p, ctx, warnings)
                if inner:
                    cell_parts.append(inner)
            cells.append(f"<td>{' '.join(cell_parts)}</td>")
        rows.append(f"<tr>{''.join(cells)}</tr>")
    return f"<table>{''.join(rows)}</table>"


def docx_xml_to_html(
    document_xml: str, warnings: list[str], ctx: _DocCtx | None = None
) -> str:
    """word/document.xml -> HTML string (the rebuilt mammoth step).

    Consecutive list paragraphs group into (possibly nested) <ul>/<ol>
    by ilvl; a list-type change at the same level closes and reopens."""
    ctx = ctx or _DocCtx()
    root = ElementTree.fromstring(document_xml)
    body = root.find(f"{W_NS}body")
    if body is None:
        warnings.append("document.xml has no body")
        return ""
    out: list[str] = []
    # stack of open list tags, one per nesting level
    stack: list[tuple[int, str]] = []

    def close_to(level: int) -> None:
        while stack and stack[-1][0] >= level:
            out.append(f"</{stack.pop()[1]}>")

    def close_all() -> None:
        close_to(-1)

    for element in body:
        tag = element.tag
        if tag == f"{W_NS}p":
            inner, htag, list_info = _paragraph_info(element, ctx, warnings)
            if list_info is not None:
                ilvl, ltag = list_info
                if stack and stack[-1][0] == ilvl and stack[-1][1] != ltag:
                    close_to(ilvl)  # type change at same level
                close_to(ilvl + 1)
                while not stack or stack[-1][0] < ilvl:
                    nxt = (stack[-1][0] + 1) if stack else 0
                    out.append(f"<{ltag}>")
                    stack.append((nxt, ltag))
                out.append(f"<li>{inner}</li>")
                continue
            close_all()
            if inner:
                out.append(f"<{htag}>{inner}</{htag}>")
        elif tag == f"{W_NS}tbl":
            close_all()
            out.append(_table_html(element, ctx, warnings))
        elif tag != f"{W_NS}sectPr":
            warnings.append(f"unsupported body element: {_NS_TAG.sub('', tag)}")
    close_all()
    # mammoth-style note list: one <ol> of referenced foot/endnotes in
    # first-reference order, each with a back-link arrow
    if ctx.note_refs:
        items = []
        for kind, nid in ctx.note_refs:
            note = (ctx.footnotes if kind == "footnote" else ctx.endnotes).get(nid)
            inner_parts = [
                _inline_html(p, ctx, warnings)
                for p in (note.findall(f"{W_NS}p") if note is not None else [])
            ]
            body_html = " ".join(x for x in inner_parts if x)
            items.append(
                f'<li id="{kind}-{nid}"><p>{body_html} '
                f'<a href="#{kind}-ref-{nid}">↑</a></p></li>'
            )
        out.append("<ol>" + "".join(items) + "</ol>")
    return "".join(out)


def docx_to_html(
    payload: bytes, *, style_map: list[str] | None = None
) -> tuple[str, list[str]]:
    """Full DOCX bytes -> (HTML, warnings). Raises ValueError only when the
    payload is not a readable DOCX at all (callers turn that into a
    failure-as-data row).  ``style_map`` takes mammoth-style entries
    (docx-converter.ts:166-169 passthrough)."""
    warnings: list[str] = []
    preprocessed = preprocess_docx(payload)
    try:
        zf = zipfile.ZipFile(io.BytesIO(preprocessed))
        document_xml = zf.read("word/document.xml").decode("utf-8")
    except (zipfile.BadZipFile, KeyError, UnicodeDecodeError) as exc:
        raise ValueError(f"unreadable docx: {exc}") from exc
    p_map, r_map = parse_style_map(style_map, warnings)
    ct_defaults, ct_overrides = _load_content_types(zf)
    ctx = _DocCtx(
        rels=_load_rels(zf),
        numbering=_load_numbering(zf),
        p_style_map=p_map,
        r_style_map=r_map,
        footnotes=_load_notes(zf, "footnotes"),
        endnotes=_load_notes(zf, "endnotes"),
        zf=zf,
        ct_defaults=ct_defaults,
        ct_overrides=ct_overrides,
    )
    try:
        html = docx_xml_to_html(document_xml, warnings, ctx)
    except ElementTree.ParseError as exc:
        raise ValueError(f"malformed document.xml: {exc}") from exc
    return html, warnings
