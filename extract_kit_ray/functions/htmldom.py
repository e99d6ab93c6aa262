"""Lenient HTML -> lightweight DOM tree, built on stdlib ``html.parser``.

The reference converts HTML with Turndown, whose DOM comes from a browser
parser (reference: packages/office-to-markdown/src/utils/html-to-markdown.ts:74-85).
We need a dependency-free, *deterministic* parser: same bytes in -> same
tree, on any platform.  stdlib ``HTMLParser`` is lenient (never raises on
malformed markup), which matches the reference's never-throw contract
(packages/pdf-processor/src/core/vision/processor.ts:115-131).

Design notes
------------
- Void elements never get children; common implied-close rules (``<p>``,
  ``<li>``, ``<td>``/``<th>``/``<tr>``, ``<option>``) are applied so that
  tag-soup web pages produce sensible block structure.
- Unmatched end tags are ignored; end tags that skip levels close all
  intermediate open elements (browser-like recovery).
- Character references are decoded by HTMLParser (convert_charrefs=True).
"""

from __future__ import annotations

from html.parser import HTMLParser


VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Elements whose open tag implicitly closes certain open ancestors.
# Maps tag -> set of tags it closes if currently innermost-open.
_IMPLIED_CLOSE = {
    "p": {"p"},
    "li": {"li", "p"},
    "dt": {"dt", "dd", "p"},
    "dd": {"dt", "dd", "p"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "thead": {"tr", "td", "th"},
    "tbody": {"thead", "tr", "td", "th"},
    "tfoot": {"tbody", "tr", "td", "th"},
    "option": {"option"},
    # block elements close an open <p>
    "div": {"p"},
    "ul": {"p"},
    "ol": {"p"},
    "table": {"p"},
    "h1": {"p"},
    "h2": {"p"},
    "h3": {"p"},
    "h4": {"p"},
    "h5": {"p"},
    "h6": {"p"},
    "pre": {"p"},
    "blockquote": {"p"},
    "section": {"p"},
    "article": {"p"},
    "aside": {"p"},
    "nav": {"p"},
    "header": {"p"},
    "footer": {"p"},
    "main": {"p"},
    "figure": {"p"},
    "form": {"p"},
    "hr": {"p"},
}

BLOCK_TAGS = frozenset(
    (
        "address article aside blockquote body details dialog dd div dl dt "
        "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header "
        "hgroup hr html li main nav ol p pre section table tbody td tfoot "
        "th thead tr ul"
    ).split()
)

# Text inside these elements keeps its whitespace verbatim.
PRE_TAGS = frozenset({"pre", "textarea"})


class Node:
    """One DOM element. ``tag`` is lowercase; text children are plain str."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None, parent: "Node | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node | str] = []
        self.parent = parent

    # -- conveniences -------------------------------------------------------
    def get(self, name: str, default: str = "") -> str:
        return self.attrs.get(name, default)

    def iter(self):
        """Depth-first pre-order over element nodes (self included)."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(c for c in reversed(node.children) if isinstance(c, Node))

    def find(self, tag: str) -> "Node | None":
        for n in self.iter():
            if n.tag == tag:
                return n
        return None

    def text_content(self) -> str:
        """All descendant text, concatenated (no whitespace collapsing)."""
        parts: list[str] = []
        stack: list[Node | str] = [self]
        while stack:
            item = stack.pop()
            if isinstance(item, str):
                parts.append(item)
            else:
                stack.extend(reversed(item.children))
        return "".join(parts)

    def is_block(self) -> bool:
        return self.tag in BLOCK_TAGS

    def __repr__(self) -> str:  # debugging aid only
        return f"<{self.tag} children={len(self.children)}>"


# Adversarial pages nest absurdly deep; beyond this depth new elements
# attach flat to the current node instead of nesting, so the recursive
# renderer stays within Python's recursion limit (graceful degradation,
# not an error row).
MAX_TREE_DEPTH = 200


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack: list[Node] = [self.root]
        # open-tag multiset: O(1) "is this tag open?" in handle_endtag
        # instead of rebuilding a list of open tags per end tag
        self._open_counts: dict[str, int] = {}

    # stack helpers
    def _top(self) -> Node:
        return self.stack[-1]

    def _pop_top(self) -> Node:
        node = self.stack.pop()
        self._open_counts[node.tag] -= 1
        return node

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        # both callers (stdlib HTMLParser, _fast_parse) pass lowercase
        closes = _IMPLIED_CLOSE.get(tag)
        if closes:
            while len(self.stack) > 1 and self.stack[-1].tag in closes:
                self._pop_top()
        top = self.stack[-1]
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs} if attrs else {}, top)
        top.children.append(node)
        if tag not in VOID_ELEMENTS and len(self.stack) < MAX_TREE_DEPTH:
            self.stack.append(node)
            self._open_counts[tag] = self._open_counts.get(tag, 0) + 1

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, self._top())
        self._top().children.append(node)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        # close up to the matching open tag; ignore if not open at all
        if not self._open_counts.get(tag):
            return
        while len(self.stack) > 1:
            popped = self._pop_top()
            if popped.tag == tag:
                break

    def updatepos(self, i: int, j: int) -> int:
        """No-op position tracking: the base class counts newlines to
        maintain lineno/offset for getpos(), which we never use — this is
        pure overhead on the hot parse path."""
        return j

    def handle_data(self, data: str) -> None:
        if data:
            self._top().children.append(data)

    # comments / declarations / PIs are dropped
    def handle_comment(self, data: str) -> None:
        pass

    def handle_decl(self, decl: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass


# ---------------------------------------------------------------------------
# fast tokenizer for the common well-formed subset
# ---------------------------------------------------------------------------
#
# ``html.parser`` is ~half of extraction CPU.  This tokenizer handles the
# clean-markup subset with one regex scan and drives the SAME
# ``_TreeBuilder`` handlers (tree-building semantics — implied closes,
# void elements, depth cap — are shared by construction).  ANY construct
# it cannot map 1:1 onto HTMLParser behavior triggers a per-document
# fallback to the stdlib parser:
#   - comments / declarations / processing instructions  (<!  <?)
#   - <script>/<style> (stdlib switches to CDATA mode)
#   - a '<' that doesn't open a well-formed tag (tolerant-recovery paths)
#   - end tags carrying attributes / junk
#   - attribute blobs that don't match the strict grammar below
# Equivalence is enforced by tests/test_fast_parser_differential.py
# (fixture corpus + adversarial strings: tree must equal stdlib's).

import re as _re
from html import unescape as _unescape

# one token per scan step: comment | declaration | PI | start/end tag.
# Comments/decls/PIs are DROPPED by our handlers exactly like stdlib's,
# and crucially still split surrounding text into separate data events.
_TOKEN_RE = _re.compile(
    r"<!--(?P<comment>.*?)-->"
    r"|<!(?P<decl>(?!--)[^>]*)>"
    r"|<\?(?P<pi>[^>]*)>"
    r"|<(?P<closing>/?)(?P<tag>[a-zA-Z][^\t\n\r\f />\x00]*)"
    r"(?P<blob>(?:\"[^\"]*\"|'[^']*'|[^>])*)>",
    _re.DOTALL,
)
# strict attribute-blob grammar: sequences of name[=value] with quoted or
# simple unquoted values, optional trailing '/' (XHTML self-close)
_ATTRS_OK = _re.compile(
    r"^(?:\s+[^\s/=>\"'<][^\s/=>\"'<]*"
    r"(?:\s*=\s*(?:\"[^\"<]*\"|'[^'<]*'|[^>\s\"'`=<]+))?)*\s*/?\s*$"
)
_ATTR_RE = _re.compile(
    r"\s+([^\s/=>\"'<][^\s/=>\"'<]*)"
    r"(?:\s*=\s*(?:\"([^\"<]*)\"|'([^'<]*)'|([^>\s\"'`=<]+)))?"
)
_CDATA_TAGS = _re.compile(r"<script|<style", _re.IGNORECASE)

#: count of documents routed to the stdlib parser (observability)
FALLBACK_COUNT = 0


def _parse_attrs(blob: str) -> list[tuple[str, str | None]]:
    attrs: list[tuple[str, str | None]] = []
    for m in _ATTR_RE.finditer(blob):
        name = m.group(1).lower()
        value = m.group(2) if m.group(2) is not None else (
            m.group(3) if m.group(3) is not None else m.group(4))
        if value is not None and "&" in value:
            value = _unescape(value)
        attrs.append((name, value))
    return attrs


def _fast_parse(html: str) -> Node | None:
    """One-scan tokenizer; returns None when the input needs stdlib."""
    if _CDATA_TAGS.search(html):
        return None  # stdlib switches to CDATA mode inside script/style
    b = _TreeBuilder()
    pos = 0
    for m in _TOKEN_RE.finditer(html):
        text = html[pos : m.start()]
        if "<" in text:
            return None  # stray '<' -> stdlib tolerant recovery differs
        if text:
            b.handle_data(_unescape(text) if "&" in text else text)
        pos = m.end()
        _comment, decl, _pi, closing, tag, blob = m.groups()
        if tag is None:
            if decl is not None and decl.startswith("["):
                return None  # marked section (<![CDATA[...]]>): stdlib-specific
            continue  # comment / decl / PI: dropped, like stdlib handlers
        if closing:
            if blob.strip():
                return None  # end tag with attrs/junk: stdlib-specific
            b.handle_endtag(tag.lower())
        elif not blob:
            b.handle_starttag(tag.lower(), [])
        else:
            if not _ATTRS_OK.match(blob):
                return None
            attrs = _parse_attrs(blob)
            # stdlib self-closes only on a literal "/>" where the "/" is
            # its own token: "<a/ >" is a plain start tag (slash-then-
            # space is junk) and in "<a b=1/>" the "/" belongs to the
            # unquoted value.  Self-close iff "/" ends the blob AND
            # follows the tag name, whitespace, or a quoted value.
            if blob.endswith("/") and (
                len(blob) == 1 or blob[-2] in " \t\n\r\f\"'"
            ):
                b.handle_startendtag(tag.lower(), attrs)
            else:
                b.handle_starttag(tag.lower(), attrs)
    tail = html[pos:]
    if "<" in tail:
        return None
    if tail:
        b.handle_data(_unescape(tail) if "&" in tail else tail)
    return b.root


def parse_html(html: str) -> Node:
    """Parse an HTML string into a Node tree rooted at a synthetic ``#root``.

    Never raises on malformed markup (lenient recovery, see module
    docstring).  Clean markup takes the fast single-scan tokenizer; any
    construct with parser-specific recovery semantics falls back to
    stdlib ``HTMLParser`` per document.
    """
    try:
        root = _fast_parse(html)
        if root is not None:
            return root
    except Exception:
        pass
    global FALLBACK_COUNT
    FALLBACK_COUNT += 1
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        # HTMLParser is lenient but belt-and-braces: whatever was built so
        # far is returned — failure-as-data, never raise mid-batch.
        pass
    return builder.root
