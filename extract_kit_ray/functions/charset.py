"""Charset sniffing + decoding for raw fetched HTML — the step between
"bytes arrived" and "text exists".  Real crawls carry pages in utf-8,
legacy 8-bit codepages and the occasional utf-16; the declared charset
lives in a BOM or a ``<meta>`` tag inside the payload itself.

Sniff order (the WHATWG-encoding prescan, reduced to the public
subset that matters for corpus work):

1. BOM — utf-8-sig / utf-16 LE / utf-16 BE
2. ``<meta charset=...>`` or ``<meta http-equiv=Content-Type
   content="...; charset=...">`` within the first 1024 bytes
   (case-insensitive, quote-optional)
3. default utf-8

Scale shape: pure per-cell byte work inside ``map_batches`` — the
regex is compiled once at module import, decoding never shuffles.
Reference scope: ingest hygiene ahead of the S-family readers
(SURVEY §2 S1/S8); the reference assumes utf-8 files, the sniffer is
the web-corpus extension.
"""

from __future__ import annotations

import re

_META_RE = re.compile(
    rb"<meta[^>]*charset\s*=\s*[\"']?\s*([A-Za-z0-9_.:-]+)", re.IGNORECASE)

# alias -> canonical (lowercased declared name otherwise)
_ALIASES = {
    "latin-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "l1": "iso-8859-1",
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
}


def sniff_charset(data: bytes) -> str:
    """Return the canonical lowercase charset name for ``data``."""
    if data.startswith(b"\xef\xbb\xbf"):
        return "utf-8"
    if data.startswith(b"\xff\xfe") or data.startswith(b"\xfe\xff"):
        return "utf-16"
    m = _META_RE.search(data[:1024])
    if m:
        name = m.group(1).decode("ascii", errors="replace").lower()
        return _ALIASES.get(name, name)
    return "utf-8"


def decode_html(data: bytes) -> tuple[str, str]:
    """Sniff + decode; returns ``(charset, text)``.  BOMs never reach
    the text (utf-8-sig / utf-16 codecs strip them); an unknown
    declared charset falls back to utf-8; undecodable bytes become
    U+FFFD (failure-as-data — a bad declaration must not kill the
    pipeline)."""
    cs = sniff_charset(data)
    codec = cs
    if cs == "utf-8" and data.startswith(b"\xef\xbb\xbf"):
        codec = "utf-8-sig"
    try:
        return cs, data.decode(codec, errors="replace")
    except (LookupError, TypeError, ValueError):
        # unknown name, or a codec that is not a bytes->str decoder
        # (e.g. a declared "rot13"): fall back to utf-8
        return cs, data.decode("utf-8", errors="replace")
