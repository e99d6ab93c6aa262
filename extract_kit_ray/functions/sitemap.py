"""Sitemap XML (sitemaps.org protocol) build + parse — the second
web-ingest container next to WARC (functions/warc.py): crawlers
bootstrap frontiers from sitemaps, so a corpus engine needs to read
them at scale.

The parser is a strict single-pass scanner over ``<url>`` entries
(``<loc>`` required, ``<lastmod>``/``<priority>`` optional) with XML
entity escaping handled on both sides — URLs legitimately contain
``&``, which MUST be ``&amp;`` on the wire; the decode reuses the
ordered amp-last chain from ops/clean.py so build→parse is
byte-identical.  Malformed structure raises ``ValueError``
(failure-as-data at the stage layer).

Scale shape: sitemap blobs are opaque string cells; build/parse is
per-cell work inside ``map_batches`` — no shuffle.
"""

from __future__ import annotations

_XML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]


def _escape(s: str) -> str:
    for ch, ent in _XML_ESCAPES:
        s = s.replace(ch, ent)
    return s


def _unescape(s: str) -> str:
    # reverse order: amp LAST, mirroring ops/clean.ENTITY_STEPS
    for ch, ent in reversed(_XML_ESCAPES):
        s = s.replace(ent, ch)
    return s


def build_sitemap(entries: list[dict]) -> str:
    """Serialize ``[{loc, lastmod?, priority?}]`` into one sitemap
    document (deterministic layout)."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
    for e in entries:
        parts.append("<url>")
        parts.append(f"<loc>{_escape(e['loc'])}</loc>")
        if e.get("lastmod") is not None:
            parts.append(f"<lastmod>{_escape(e['lastmod'])}</lastmod>")
        if e.get("priority") is not None:
            parts.append(f"<priority>{_escape(e['priority'])}</priority>")
        parts.append("</url>")
    parts.append("</urlset>")
    return "\n".join(parts)


def _tag_text(block: str, tag: str, pos: int = 0) -> str | None:
    open_t, close_t = f"<{tag}>", f"</{tag}>"
    i = block.find(open_t, pos)
    if i < 0:
        return None
    j = block.find(close_t, i)
    if j < 0:
        raise ValueError(f"sitemap: unterminated <{tag}>")
    return block[i + len(open_t):j].strip()


def parse_sitemap(doc: str) -> list[dict]:
    """Parse one sitemap document into ``[{loc, lastmod, priority}]``
    (missing optional fields come back as ``None``)."""
    if "<urlset" not in doc:
        raise ValueError("sitemap: missing <urlset>")
    entries: list[dict] = []
    pos = 0
    while True:
        i = doc.find("<url>", pos)
        if i < 0:
            break
        j = doc.find("</url>", i)
        if j < 0:
            raise ValueError("sitemap: unterminated <url>")
        block = doc[i + 5:j]
        loc = _tag_text(block, "loc")
        if loc is None:
            raise ValueError("sitemap: <url> without <loc>")
        lastmod = _tag_text(block, "lastmod")
        priority = _tag_text(block, "priority")
        entries.append({"loc": _unescape(loc),
                        "lastmod": _unescape(lastmod) if lastmod is not None else None,
                        "priority": _unescape(priority) if priority is not None else None})
        pos = j + 6
    return entries
