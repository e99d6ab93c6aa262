"""Deterministic DOM -> Markdown renderer with byte-offset span tracking.

This re-expresses the reference's custom Turndown conversion
(packages/office-to-markdown/src/utils/html-to-markdown.ts:30-423) as a
pure-Python recursive renderer over the :mod:`htmldom` tree.  Rule
semantics are preserved rule-for-rule, including quirks:

- headings: ATX, ``\\n\\n{#*level} {content}\\n\\n`` (html-to-markdown.ts:178-188)
- math: elements whose text is ``$...$`` / ``$$...$$`` pass through
  (ts:191-211); math rules outrank heading/table rules but are outranked
  by p/br/img/a/pre/li (Turndown addRule prepend order, ts:105-331)
- paragraphs: trimmed + ``\\n\\n``; math-block paragraphs get surrounding
  blank lines (ts:214-227)
- smart ``<br>``: two-space hard break inside P/LI, bare newline otherwise
  (ts:230-240)
- images: data-URIs >100 chars truncated to ``data:{mime}...``; srcs >500
  chars dropped to ``[alt]`` (ts:243-266)
- links: ``javascript:``/``vbscript:`` hrefs drop to text; hrefs with
  spaces are encodeURI'd; autolink when text == href (ts:269-299)
- code blocks: fenced, language from the ``code`` child's class with the
  literal ``language-`` prefix replaced once (ts:302-312)
- list items: always ``- `` (even in <ol> — reference uses
  options.bulletListMarker unconditionally, ts:315-331); continuation
  lines indented two spaces
- tables: cell = `` {content} |`` with pipes escaped and newlines
  flattened (ts:148-155); row = ``|{content.trim()}`` (so the first cell
  loses its leading space — reference quirk, ts:137-145); a separator row
  is inserted after the first row iff it "looks like a header"
  (bold text or name/title/date/description/id/type/status keyword,
  ts:418-422)
- postprocessing: the seven normalization steps of ts:377-405 applied in
  the same order with the same regexes (including the quirk that the
  heading-spacing regex inserts an extra newline after every heading line,
  yielding two blank lines after headings once collapsed)

Span tracking: handlers wrap content regions in invisible single-byte
markers (``\\x01``-``\\x07`` push one of the seven span kinds, ``\\x0e``
pops).  Markers ride through the string-level postprocessing (they are
not whitespace and never sit inside newline runs), and a final scan
strips them while recording ``(start, end, kind)`` spans over the final
byte offsets.  Innermost kind wins, so spans are non-overlapping and
sorted by construction.  Control chars are stripped from input text, so
markers can never collide with payload bytes.

Deviations from Turndown (documented; our goldens are produced by this
engine): no markdown-escaping of literal ``*``/``_``/``#`` in text, and a
simplified whitespace-collapse (runs of whitespace -> one space outside
``<pre>``; whitespace-only text dropped inside structural containers).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import quote

from .htmldom import Node, parse_html

# --------------------------------------------------------------------------
# span markers
# --------------------------------------------------------------------------

SPAN_KINDS = (
    "heading",
    "paragraph",
    "list_item",
    "table_cell",
    "math",
    "code",
    "link_text",
)
_PUSH = {k: chr(1 + i) for i, k in enumerate(SPAN_KINDS)}  # \x01..\x07
_POP = "\x0e"
_KIND_OF = {v: k for k, v in _PUSH.items()}
_MARKER_CHARS = frozenset(_PUSH.values()) | {_POP}
_MARKER_RE = re.compile("[\x01-\x07\x0e]")


def _visible(s: str) -> str:
    """Strip span markers."""
    return _MARKER_RE.sub("", s)


def _wrap(kind: str, s: str) -> str:
    """Mark ``s`` as a span of ``kind`` (skipped when visibly empty)."""
    if not _visible(s).strip():
        return s
    return _PUSH[kind] + s + _POP


# --------------------------------------------------------------------------
# whitespace / text handling
# --------------------------------------------------------------------------

# control chars except \t \n \r (markers live in this range — input text is
# sanitized so marker bytes can only come from our own handlers)
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
_WS_RE = re.compile(r"\s+")

# structural containers whose whitespace-only text children are dropped
_CONTAINER_TAGS = frozenset(
    (
        "#root html body head div article section main aside nav header "
        "footer ul ol table thead tbody tfoot tr blockquote figure dl"
    ).split()
)

# elements dropped wholesale (script/style are regex-stripped before the
# parse, mirroring ts:347-359, but may survive odd nesting)
_DROP_TAGS = frozenset(
    "script style noscript template iframe svg canvas audio video object head datalist".split()
)


# collapse pattern: runs of 2+ whitespace OR a lone non-space whitespace
# char — equivalent output to \s+ -> " " (every maximal run becomes one
# space) but a clean single-spaced string matches NOTHING, so re.sub
# returns it without a rebuild (the hot case: most text nodes)
_WS_COLLAPSE_RE = re.compile(r"\s{2,}|[^\S ]")


def _collapse_text(s: str, in_pre: bool) -> str:
    s = _CTRL_RE.sub("", s)
    if in_pre:
        return s.replace("\r\n", "\n")
    return _WS_COLLAPSE_RE.sub(" ", s)


def join_md(left: str, right: str) -> str:
    """Turndown's join: boundary newlines merge to max(left, right), cap 2."""
    if not left:
        return right
    if not right:
        return left
    stripped_l = left.rstrip("\n")
    stripped_r = right.lstrip("\n")
    n = min(max(len(left) - len(stripped_l), len(right) - len(stripped_r)), 2)
    return stripped_l + "\n" * n + stripped_r


# --------------------------------------------------------------------------
# rule precedence (Turndown addRule prepends → later-added wins;
# add order in the reference: table, tr, td/th, heading, mathInline,
# mathBlock, p, br, img, a, pre(codeBlock), li — ts:105-331)
# --------------------------------------------------------------------------

_TAG_RANK = {
    "li": 0,
    "pre": 1,
    "a": 2,
    "img": 3,
    "br": 4,
    "p": 5,
    # mathBlock = 6, mathInline = 7 (virtual)
    "h1": 8, "h2": 8, "h3": 8, "h4": 8, "h5": 8, "h6": 8,
    "td": 9, "th": 9,
    "tr": 10,
    "table": 11,
}
_MATH_BLOCK_RANK = 6
_MATH_INLINE_RANK = 7

_RE_MATH_INLINE = re.compile(r"\$[^$]+\$\Z")
_RE_MATH_BLOCK = re.compile(r"\$\$[\s\S]+\$\$\Z")

_RE_HEADER_BOLD = re.compile(r"\*\*.*\*\*")
_RE_HEADER_KEYWORD = re.compile(r"\b(name|title|date|description|id|type|status)\b", re.I)

# JS encodeURI leaves these unescaped
_ENCODE_URI_SAFE = "A-Za-z0-9;,/?:@&=+$-_.!~*'()#"
_ENCODE_URI_SAFE_CHARS = ";,/?:@&=+$-_.!~*'()#"


def _encode_uri(href: str) -> str:
    return quote(href, safe=_ENCODE_URI_SAFE_CHARS)


@dataclass
class _Ctx:
    in_pre: bool = False


# --------------------------------------------------------------------------
# renderer
# --------------------------------------------------------------------------


def _fold_children(node: Node, ctx: _Ctx) -> str:
    out = ""
    drop_ws_only = node.tag in _CONTAINER_TAGS
    for child in node.children:
        if isinstance(child, str):
            s = _collapse_text(child, ctx.in_pre)
            if drop_ws_only and not s.strip():
                continue
            if s:
                out = join_md(out, s) if ("\n" in s) else (out + s if out else s)
        else:
            r = _render_element(child, ctx)
            if r:
                out = join_md(out, r)
    return out


def _render_element(node: Node, ctx: _Ctx) -> str:
    tag = node.tag
    if tag in _DROP_TAGS:
        return ""

    rank = _TAG_RANK.get(tag, 99)
    # math rules outrank any rule added before them (heading/table family
    # and all default rules), reproducing Turndown precedence
    if rank > _MATH_INLINE_RANK:
        txt = node.text_content()
        if _RE_MATH_BLOCK.match(txt):
            content = _fold_children(node, ctx)
            return "\n\n" + _wrap("math", content.strip()) + "\n\n"
        if _RE_MATH_INLINE.match(txt):
            content = _fold_children(node, ctx)
            return _wrap("math", content.strip())

    handler = _HANDLERS.get(tag)
    if handler is not None:
        return handler(node, ctx)

    content = _fold_children(node, ctx)
    if node.is_block():
        return "\n\n" + content + "\n\n"
    return content


def _h_heading(node: Node, ctx: _Ctx) -> str:
    level = int(node.tag[1])
    content = _fold_children(node, ctx)
    clean = content.strip().replace("\n", " ")
    return "\n\n" + "#" * level + " " + _wrap("heading", clean) + "\n\n"


def _h_paragraph(node: Node, ctx: _Ctx) -> str:
    content = _fold_children(node, ctx)
    clean = content.strip()
    if not _visible(clean).strip():
        return ""
    if _RE_MATH_BLOCK.match(_visible(clean)):
        return "\n\n" + _wrap("math", clean) + "\n\n"
    return _wrap("paragraph", clean) + "\n\n"


def _h_br(node: Node, ctx: _Ctx) -> str:
    parent = node.parent
    if parent is not None and parent.tag in ("p", "li"):
        return "  \n"
    return "\n"


def _h_img(node: Node, ctx: _Ctx) -> str:
    alt = node.get("alt")
    src = node.get("src")
    title = node.attrs.get("title")
    if not src:  # src-less placeholder (DOCX embedded images): [alt]
        return f"[{alt}]" if alt else "[Image]"
    if src.startswith("data:"):
        if len(src) > 100:
            mime = src.split(";")[0].replace("data:", "", 1)
            label = alt if alt else "Image"
            return f"![{label}](data:{mime}...)"
    if len(src) > 500:
        return f"[{alt}]" if alt else "[Image]"
    title_part = ' "' + title.replace('"', '\\"') + '"' if title else ""
    return f"![{alt}]({src}{title_part})"


def _h_link(node: Node, ctx: _Ctx) -> str:
    content = _fold_children(node, ctx)
    href = node.attrs.get("href")
    title = node.attrs.get("title")
    if not href or href.startswith("javascript:") or href.startswith("vbscript:"):
        return content
    clean_href = href
    if " " in clean_href:
        clean_href = _encode_uri(clean_href)
    title_part = ' "' + title.replace('"', '\\"') + '"' if title else ""
    if _visible(content).strip() == clean_href and not title:
        return "<" + _wrap("link_text", clean_href) + ">"
    return "[" + _wrap("link_text", content) + "](" + clean_href + title_part + ")"


def _h_pre(node: Node, ctx: _Ctx) -> str:
    content = _fold_children(node, _Ctx(in_pre=True))
    code = node.find("code")
    if code is not None:
        language = code.get("class").replace("language-", "", 1)
        return "\n```" + language + "\n" + _wrap("code", content) + "\n```\n\n"
    return "\n```\n" + _wrap("code", content) + "\n```\n\n"


def _h_code(node: Node, ctx: _Ctx) -> str:
    parent = node.parent
    only_child = parent is not None and len(parent.children) == 1
    if parent is not None and parent.tag == "pre" and only_child:
        # code-block body: Turndown's inline-code rule excludes it; text
        # passes through verbatim for the pre rule to fence
        return _fold_children(node, _Ctx(in_pre=True))
    content = _fold_children(node, ctx)
    return "`" + _wrap("code", content) + "`"


def _h_li(node: Node, ctx: _Ctx) -> str:
    content = _fold_children(node, ctx)
    clean = content.strip()
    if not _visible(clean).strip():
        return ""
    clean = _wrap("list_item", clean)
    lines = clean.split("\n")
    indented = "\n".join(line if i == 0 else "  " + line for i, line in enumerate(lines))
    return f"- {indented}\n"


def _h_list(node: Node, ctx: _Ctx) -> str:
    content = _fold_children(node, ctx)
    parent = node.parent
    if parent is not None and parent.tag == "li":
        element_children = [c for c in parent.children if isinstance(c, Node)]
        if element_children and element_children[-1] is node:
            return "\n" + content
    return "\n\n" + content + "\n\n"


def _h_table(node: Node, ctx: _Ctx) -> str:
    content = _fold_children(node, ctx)
    rows = [r for r in content.strip().split("\n") if r.strip()]
    if not rows:
        return ""
    result = "\n"
    header_added = False
    for i, row in enumerate(rows):
        result += row + "\n"
        if not header_added and i == 0 and _looks_like_header_row(row):
            cell_count = row.count("|") - 1
            result += "|" + " --- |" * cell_count + "\n"
            header_added = True
    return result + "\n"


def _looks_like_header_row(row: str) -> bool:
    return bool(_RE_HEADER_BOLD.search(row)) or bool(_RE_HEADER_KEYWORD.search(row))


def _h_tr(node: Node, ctx: _Ctx) -> str:
    content = _fold_children(node, ctx)
    clean = content.strip()
    if not _visible(clean).strip():
        return ""
    return f"|{clean}\n"


def _h_cell(node: Node, ctx: _Ctx) -> str:
    content = _fold_children(node, ctx)
    content = content.strip().replace("|", "\\|").replace("\n", " ")
    return " " + _wrap("table_cell", content) + " |"


def _h_strong(node: Node, ctx: _Ctx) -> str:
    content = _fold_children(node, ctx)
    if not _visible(content).strip():
        return ""
    return "**" + content + "**"


def _h_em(node: Node, ctx: _Ctx) -> str:
    content = _fold_children(node, ctx)
    if not _visible(content).strip():
        return ""
    return "*" + content + "*"


_EDGE_NEWLINES_RE = re.compile(r"^\n+|\n+$")


def _h_blockquote(node: Node, ctx: _Ctx) -> str:
    content = _fold_children(node, ctx)
    content = _EDGE_NEWLINES_RE.sub("", content)
    quoted = "\n".join("> " + line for line in content.split("\n"))
    return "\n\n" + quoted + "\n\n"


def _h_hr(node: Node, ctx: _Ctx) -> str:
    return "\n\n---\n\n"


_HANDLERS = {
    "h1": _h_heading, "h2": _h_heading, "h3": _h_heading,
    "h4": _h_heading, "h5": _h_heading, "h6": _h_heading,
    "p": _h_paragraph,
    "br": _h_br,
    "img": _h_img,
    "a": _h_link,
    "pre": _h_pre,
    "code": _h_code,
    "li": _h_li,
    "ul": _h_list,
    "ol": _h_list,
    "table": _h_table,
    "tr": _h_tr,
    "td": _h_cell,
    "th": _h_cell,
    "strong": _h_strong, "b": _h_strong,
    "em": _h_em, "i": _h_em,
    "blockquote": _h_blockquote,
    "hr": _h_hr,
}


# --------------------------------------------------------------------------
# pre/post processing (exact reference regexes)
# --------------------------------------------------------------------------

_PRE_SCRIPT_STYLE = re.compile(r"<(script|style)[^>]*>[\s\S]*?</(script|style)>", re.I)
_PRE_BLANKS = re.compile(r"\n\s*\n\s*\n")
_PRE_W_OPEN = re.compile(r"<w:([^>]*)>")
_PRE_W_CLOSE = re.compile(r"</w:([^>]*)>")


def preprocess_html(html: str) -> str:
    """Reference preprocess (html-to-markdown.ts:347-359), regex-for-regex."""
    html = _PRE_SCRIPT_STYLE.sub("", html)
    html = _PRE_BLANKS.sub("\n\n", html)
    html = _PRE_W_OPEN.sub("", html)
    html = _PRE_W_CLOSE.sub("", html)
    return html


_POST_HEADING = re.compile(r"\n(#{1,6} .+)\n")
_POST_LIST = re.compile(r"\n([*\-+] .+)\n([*\-+] .+)")
_POST_TABLE = re.compile(r"\|\s*\|\s*\|")
_POST_BLANKS = re.compile(r"\n{4,}")


def _rstrip_keep_markers(line: str) -> str:
    """Drop trailing whitespace while preserving span-marker bytes."""
    markers: list[str] = []
    i = len(line) - 1
    while i >= 0:
        c = line[i]
        if c in _MARKER_CHARS:
            markers.append(c)
            i -= 1
        elif c in " \t":
            i -= 1
        else:
            break
    return line[: i + 1] + "".join(reversed(markers))


def postprocess_markdown(markdown: str) -> str:
    """Reference postprocess (html-to-markdown.ts:377-405) on marked text.

    Operates on text that may contain span markers; all regexes behave
    identically on visible text because markers are non-whitespace bytes
    that only ever hug content (never sit inside newline runs).
    """
    markdown = markdown.replace("\r\n", "\n")
    markdown = _POST_BLANKS.sub("\n\n\n", markdown)
    markdown = _POST_HEADING.sub(r"\n\1\n\n", markdown)
    markdown = _POST_LIST.sub(r"\n\1\n\2", markdown)
    markdown = _POST_TABLE.sub("| |", markdown)
    lines = markdown.split("\n")
    lines = [line if _visible(line).endswith("  ") else _rstrip_keep_markers(line) for line in lines]
    markdown = "\n".join(lines)
    markdown = _rstrip_keep_markers(markdown.rstrip("\n")).rstrip("\n") + "\n"
    return markdown


# --------------------------------------------------------------------------
# span finalization
# --------------------------------------------------------------------------


@dataclass
class Span:
    start: int
    end: int
    kind: str


_MARKER_SPLIT = re.compile("([" + re.escape("".join(sorted(_MARKER_CHARS))) + "])")


def finalize_spans(marked: str) -> tuple[str, list[Span]]:
    """Strip markers; return (visible_text, spans over visible offsets).

    Fragment-wise (regex split on the rare marker bytes) rather than
    char-by-char — the hot path of every extracted document.
    """
    parts = _MARKER_SPLIT.split(marked)
    out: list[str] = []
    spans: list[Span] = []
    stack: list[str] = []
    pos = 0
    run_start = 0
    run_kind: str | None = None
    run_has_content = False

    for i, part in enumerate(parts):
        if i % 2 == 0:  # text fragment
            if part:
                out.append(part)
                pos += len(part)
                if not run_has_content and part.strip():
                    run_has_content = True
        else:  # single marker char
            if run_kind is not None and pos > run_start and run_has_content:
                spans.append(Span(run_start, pos, run_kind))
            if part == _POP:
                if stack:
                    stack.pop()
            else:
                stack.append(_KIND_OF[part])
            run_kind = stack[-1] if stack else None
            run_start = pos
            run_has_content = False
    if run_kind is not None and pos > run_start and run_has_content:
        spans.append(Span(run_start, pos, run_kind))
    return "".join(out), spans


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


@dataclass
class MarkdownResult:
    markdown: str
    title: str
    spans: list[Span] = field(default_factory=list)


def render_tree(root: Node) -> str:
    """Render a parsed tree to marked markdown (before postprocessing)."""
    body = root.find("body")
    return _fold_children(body if body is not None else root, _Ctx())


def extract_title(root: Node) -> str:
    """First <h1> text (tags stripped) else <title> else "".

    Mirrors the reference's title heuristic
    (packages/office-to-markdown/src/converters/docx-converter.ts:205-219),
    extended with a <title> fallback for web pages.
    """
    for tag in ("h1", "title"):
        n = root.find(tag)
        if n is not None:
            t = _WS_RE.sub(" ", n.text_content()).strip()
            if t:
                return t
    return ""


def html_to_markdown(html: str, *, content_root: Node | None = None) -> MarkdownResult:
    """Full conversion pipeline: preprocess -> parse -> render -> postprocess.

    ``content_root`` lets the boilerplate-stripping stage pass a pre-selected
    subtree (the parse then happens upstream); otherwise the whole document
    body is rendered, matching the reference's whole-document conversion.
    """
    if content_root is None:
        root = parse_html(preprocess_html(html))
        title = extract_title(root)
        marked = render_tree(root)
    else:
        root = content_root
        title = extract_title(root)
        marked = _fold_children(root, _Ctx()) if root.tag == "#root" else _render_element(root, _Ctx())
    marked = marked.strip("\n")
    marked = postprocess_markdown(marked)
    text, spans = finalize_spans(marked)
    return MarkdownResult(markdown=text, title=title, spans=spans)
