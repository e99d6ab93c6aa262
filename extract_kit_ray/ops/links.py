"""Outlink extraction from raw HTML — the stage that turns an
extracted-page corpus into the LINK GRAPH the graph family
(pagerank/HITS/BFS/triangles/anchors) consumes.  Reference scope: the
reference's converters read single documents; link harvesting is the
web-corpus extension that feeds its outputs forward.

Contract (deterministic, SQL-statable):

* anchors are found with ONE compiled regex over the raw bytes-as-text
  (``<a ... href="...">`` / single-quoted / unquoted), in document
  order;
* href values are entity-decoded with the ordered amp-last chain
  (ops/clean.ENTITY_STEPS — href="?a=1&amp;b=2" is the wire form);
* resolution keeps ABSOLUTE http(s) URLs and ROOT-RELATIVE paths
  (joined as scheme://host + path); fragment-only, ``mailto:``,
  ``javascript:``, protocol-relative and dir-relative references are
  SKIPPED (documented subset — dir-relative resolution needs RFC 3986
  dot-segment handling, out of scope for the graph feed).

Scale shape: per-doc compiled-regex scan inside ``map_batches`` —
stateless, zero shuffles; the emitted (src doc, link_no, url) rows are
the narrow edge feed.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .clean import ENTITY_STEPS

_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL)
_BASE_RE = re.compile(r"^(https?://[^/?#]+)", re.IGNORECASE)


def _decode_entities(s: str) -> str:
    for ent, rep in ENTITY_STEPS:
        s = s.replace(ent, rep)
    return s


def extract_outlinks(html: str, base_url: str) -> list[str]:
    """Ordered outlink list for one page (see module contract)."""
    m = _BASE_RE.match(base_url)
    origin = m.group(1) if m else None
    out: list[str] = []
    for match in _HREF_RE.finditer(html):
        href = match.group(2)
        if href is None:
            href = match.group(3)
        if href is None:
            href = match.group(4)
        href = _decode_entities(href.strip())
        low = href.lower()
        if low.startswith(("http://", "https://")):
            out.append(href)
        elif href.startswith("//") or not href:
            continue  # protocol-relative: ambiguous scheme, skipped
        elif href.startswith("/"):
            if origin is not None:
                out.append(origin + href)
        # '#frag', 'mailto:', 'javascript:', dir-relative: skipped
    return out


def outlinks_batch(batch: pa.Table, *, html_col: str = "html",
                   base_col: str = "url",
                   key_col: str = "doc_id") -> pa.Table:
    keys, nos, urls = [], [], []
    for key, html, base in zip(batch[key_col].to_pylist(),
                               batch[html_col].to_pylist(),
                               batch[base_col].to_pylist()):
        for i, u in enumerate(extract_outlinks(html or "", base or "")):
            keys.append(key)
            nos.append(i)
            urls.append(u)
    return pa.table({
        key_col: pa.array(keys, pa.int64()),
        "link_no": pa.array(nos, pa.int64()),
        "url": pa.array(urls, pa.string()),
    })
