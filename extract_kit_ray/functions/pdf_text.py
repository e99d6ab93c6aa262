"""Minimal real-PDF text extraction: binary ``%PDF`` payloads -> the
engine's layout run model (x/y text runs per page), reusing the
pdfminer-style line merge in :mod:`.pdf_layout`.

Fills the reference's real-PDF parse role
(packages/pdf-processor/src/core/file-processor.ts:52-57, which shells
out to Ghostscript) with a pure-Python deterministic parser, so actual
``%PDF-`` payloads no longer dead-end as ``valid=False``.

Scope (deterministic, documented):

- object discovery by scanning ``N G obj ... endobj`` (no xref trust —
  robust to linearized/appended files; generation numbers ignored,
  last definition wins like an incremental update)
- page order from the catalog's page tree (``/Root -> /Pages ->
  /Kids`` recursion); falls back to content-stream discovery order
  when the tree is malformed
- content streams uncompressed or ``/FlateDecode`` (zlib)
- text from ``Tj``, ``TJ``, ``'`` and ``"`` operators in literal
  ``(...)`` strings (with escapes and octal) or hex ``<...>`` strings
- positioning via ``BT/ET``, ``Tm``, ``Td``, ``TD``, ``T*``, ``TL``;
  runs carry the text-line origin so the x/y line merge groups and
  orders them exactly like ek-layout runs
- strings decode as UTF-8 with Latin-1 fallback; CID fonts /
  ToUnicode glyph remapping are OUT of scope (they need font tables)

Raises ValueError on payloads outside this scope (callers convert to
failure-as-data rows, extract.py contract).
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)\bendobj", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")

# PDF whitespace + delimiters (ISO 32000 §7.2)
_WS = b"\x00\t\n\x0c\r "


def _objects(data: bytes) -> dict[int, bytes]:
    """All indirect objects, keyed by object number (last wins —
    incremental-update semantics)."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(2)
    if not objs:
        raise ValueError("no PDF objects found")
    return objs


def _dict_ref(body: bytes, name: bytes) -> int | None:
    m = re.search(rb"/" + name + rb"\s+(\d+)\s+\d+\s+R\b", body)
    return int(m.group(1)) if m else None


def _dict_refs(body: bytes, name: bytes) -> list[int]:
    """Refs from ``/Name [ ... ]`` (or a single ``/Name N 0 R``)."""
    m = re.search(rb"/" + name + rb"\s*\[(.*?)\]", body, re.S)
    if m:
        return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
    single = _dict_ref(body, name)
    return [single] if single is not None else []


def _stream_data(body: bytes) -> bytes | None:
    """Decoded stream bytes of an object body (None when no stream)."""
    i = body.find(b"stream")
    if i < 0:
        return None
    j = i + len(b"stream")
    if body[j : j + 2] == b"\r\n":
        j += 2
    elif body[j : j + 1] in (b"\n", b"\r"):
        j += 1
    m = _LENGTH_RE.search(body[:i])
    if m:
        raw = body[j : j + int(m.group(1))]
    else:
        end = body.rfind(b"endstream")
        if end < 0:
            raise ValueError("stream without endstream")
        raw = body[j:end].rstrip(b"\r\n")
    head = body[:i]
    if b"/FlateDecode" in head:
        try:
            raw = zlib.decompress(raw)
        except zlib.error as exc:
            raise ValueError(f"FlateDecode failed: {exc}") from exc
    elif b"/Filter" in head:
        m2 = re.search(rb"/Filter\s*/?(\w*)", head)
        raise ValueError(f"unsupported stream filter: {m2.group(1).decode('latin-1') if m2 else '?'}")
    return raw


def _page_content_objs(objs: dict[int, bytes]) -> list[list[int]]:
    """Page tree walk: per page, the list of content-stream object ids.

    Falls back to one pseudo-page per stream object containing a ``BT``
    text block when the catalog/page tree is absent or malformed."""
    catalog = None
    for body in objs.values():
        if re.search(rb"/Type\s*/Catalog\b", body):
            catalog = body
            break
    pages: list[list[int]] = []
    if catalog is not None:
        root_ref = _dict_ref(catalog, b"Pages")

        def walk(ref: int, depth: int = 0) -> None:
            if depth > 32 or ref not in objs:
                return
            body = objs[ref]
            if re.search(rb"/Type\s*/Pages\b", body):
                for kid in _dict_refs(body, b"Kids"):
                    walk(kid, depth + 1)
            elif re.search(rb"/Type\s*/Page\b", body):
                pages.append(_dict_refs(body, b"Contents"))

        if root_ref is not None:
            walk(root_ref)
    if not pages:
        # fallback: discovery order over text-bearing streams
        for num in sorted(objs):
            data = _stream_data(objs[num])
            if data is not None and b"BT" in data:
                pages.append([num])
    if not pages:
        raise ValueError("no pages with text content found")
    return pages


# ---------------------------------------------------------------------------
# content-stream tokenizer + text interpreter
# ---------------------------------------------------------------------------

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t", ord("b"): b"\b",
    ord("f"): b"\x0c", ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _lit_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse ``(...)`` literal string starting at index i (the '(')."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth > 0:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray()
                while i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37:
                    oct_digits.append(data[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
        out.append(c)
        i += 1
    return bytes(out), i


def _hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    end = data.find(b">", i)
    if end < 0:
        end = len(data)
    hx = re.sub(rb"\s", b"", data[i + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("latin-1")), end + 1


def _decode_text(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":  # UTF-16BE BOM (PDF text-string form)
        return raw[2:].decode("utf-16-be", errors="replace")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def extract_runs(content: bytes) -> list[dict]:
    """Interpret one content stream: text-showing ops -> layout runs.

    Run x/y is the current text-line origin (Tm translation + Td/TD/T*
    accumulation); after each shown string x advances by a nominal
    per-char width — enough for the within-line (x, index) ordering of
    the line merge, which does not need true font metrics."""
    runs: list[dict] = []
    i, n = 0, len(content)
    operands: list[tuple[str, object]] = []
    x = y = lx = ly = 0.0
    leading = 0.0
    in_text = False

    def nums(k: int) -> list[float]:
        vals = [v for t, v in operands if t == "num"]
        return [float(v) for v in vals[-k:]] if len(vals) >= k else []

    def show(s: bytes) -> None:
        nonlocal x
        text = _decode_text(s)
        if text:
            runs.append({"text": text, "x": x, "y": y})
            x += 6.0 * len(text)

    while i < n:
        c = content[i : i + 1]
        if c in (b"\x00", b"\t", b"\n", b"\x0c", b"\r", b" "):
            i += 1
            continue
        if c == b"%":  # comment to EOL
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == b"(":
            s, i = _lit_string(content, i)
            operands.append(("str", s))
            continue
        if c == b"<" and content[i + 1 : i + 2] == b"<":
            operands.append(("dict", None))
            i += 2
            continue
        if c == b">" and content[i + 1 : i + 2] == b">":
            i += 2
            continue
        if c == b"<":
            s, i = _hex_string(content, i)
            operands.append(("str", s))
            continue
        if c == b"[":
            operands.append(("arr_open", None))
            i += 1
            continue
        if c == b"]":
            i += 1
            continue
        if c == b"/":
            m = re.match(rb"/[^\s()<>\[\]{}/%]*", content[i:])
            operands.append(("name", m.group(0)))
            i += len(m.group(0))
            continue
        m = _NUM_RE.match(content, i)
        if m:  # no PDF operator starts with a digit/sign/dot
            operands.append(("num", float(m.group(0))))
            i = m.end()
            continue
        m = _OP_RE.match(content, i)
        if not m:
            i += 1  # unknown byte: skip (totality)
            continue
        op = m.group(0)
        i += len(m.group(0))
        if op == b"BT":
            in_text = True
            x = y = lx = ly = 0.0
        elif op == b"ET":
            in_text = False
        elif op == b"Tm":
            v = nums(6)
            if len(v) == 6:
                lx, ly = v[4], v[5]
                x, y = lx, ly
        elif op in (b"Td", b"TD"):
            v = nums(2)
            if len(v) == 2:
                if op == b"TD":
                    leading = -v[1]
                lx += v[0]
                ly += v[1]
                x, y = lx, ly
        elif op == b"TL":
            v = nums(1)
            if v:
                leading = v[0]
        elif op == b"T*":
            ly -= leading
            x, y = lx, ly
        elif op == b"Tj" and in_text:
            strs = [v for t, v in operands if t == "str"]
            if strs:
                show(strs[-1])
        elif op == b"TJ" and in_text:
            for t, v in operands:
                if t == "str":
                    show(v)
        elif op == b"'" and in_text:
            ly -= leading
            x, y = lx, ly
            strs = [v for t, v in operands if t == "str"]
            if strs:
                show(strs[-1])
        elif op == b'"' and in_text:
            ly -= leading
            x, y = lx, ly
            strs = [v for t, v in operands if t == "str"]
            if strs:
                show(strs[-1])
        operands = []
    return runs


def pdf_to_layout_pages(payload: bytes) -> list[dict]:
    """%PDF payload -> ek-layout-shaped pages ``[{"runs": [...]}, ...]``.

    Raises ValueError for payloads outside the documented scope."""
    if not payload.startswith(b"%PDF"):
        raise ValueError("not a PDF payload")
    objs = _objects(payload)
    pages = []
    for content_refs in _page_content_objs(objs):
        parts = []
        for ref in content_refs:
            if ref in objs:
                data = _stream_data(objs[ref])
                if data is not None:
                    parts.append(data)
        runs = extract_runs(b"\n".join(parts)) if parts else []
        pages.append({"runs": runs})
    return pages


# ---------------------------------------------------------------------------
# deterministic PDF writer (test/fixture tooling: roundtrip oracle input)
# ---------------------------------------------------------------------------


def _escape_pdf_string(s: str) -> bytes:
    out = s.encode("utf-8")
    return out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def make_pdf(pages: list[list[tuple[str, float, float]]], *, compress: bool = False) -> bytes:
    """Build a small valid PDF: one content stream per page, one ``Tj``
    per (text, x, y) run.  ``compress=True`` Flate-encodes the streams
    (exercising the decode path).  Classic xref table included."""
    objects: list[bytes] = []  # bodies, 1-based object numbers

    n_pages = len(pages)
    # obj 1: catalog, obj 2: pages node
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i, runs in enumerate(pages):
        page_obj = 3 + 2 * i
        content_obj = page_obj + 1
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_obj} 0 R /Resources << /Font << /F1 "
            f"{3 + 2 * n_pages} 0 R >> >> >>".encode())
        parts = [b"BT\n/F1 12 Tf"]
        for text, rx, ry in runs:
            parts.append(
                b"1 0 0 1 %.2f %.2f Tm (%s) Tj"
                % (rx, ry, _escape_pdf_string(text)))
        parts.append(b"ET")
        stream = b"\n".join(parts)
        if compress:
            data = zlib.compress(stream)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            data = stream
            head = b"<< /Length %d >>" % len(data)
        objects.append(head + b"\nstream\n" + data + b"\nendstream")
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_pos = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, xref_pos))
    return bytes(buf)
