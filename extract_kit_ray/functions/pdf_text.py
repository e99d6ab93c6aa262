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
- content streams uncompressed or filtered with ``/FlateDecode``,
  ``/LZWDecode``, ``/ASCIIHexDecode``, ``/ASCII85Decode``,
  ``/RunLengthDecode`` (and their abbreviations), alone or chained,
  with TIFF/PNG ``/Predictor`` support for Flate/LZW; ``/DCTDecode``
  (JPEG) and ``/JBIG2Decode`` remain out of scope (image-only filters
  — ValueError -> failure-as-data)
- text from ``Tj``, ``TJ``, ``'`` and ``"`` operators in literal
  ``(...)`` strings (with escapes and octal) or hex ``<...>`` strings
- positioning via ``BT/ET``, ``Tm``, ``Td``, ``TD``, ``T*``, ``TL``;
  runs carry the text-line origin so the x/y line merge groups and
  orders them exactly like ek-layout runs
- strings decode as UTF-8 with Latin-1 fallback; fonts carrying a
  /ToUnicode CMap (CID/composite subset fonts — most Word/LaTeX
  output) decode through the CMap (``beginbfchar``/``beginbfrange``,
  codespace-derived code width), tracked per page via /Resources
  (with /Pages inheritance) and the ``Tf`` operator

Raises ValueError on payloads outside this scope (callers convert to
failure-as-data rows, extract.py contract).
"""

from __future__ import annotations

import re
import zlib

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
# direct /Length only: the negative lookahead rejects indirect
# references ("/Length 12 0 R" would otherwise capture 12 — the object
# NUMBER — as a byte length and jump into the middle of the stream);
# indirect lengths fall back to the endstream scan
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R\b)")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")

# PDF whitespace + delimiters (ISO 32000 §7.2)
_WS = b"\x00\t\n\x0c\r "


def _objects(data: bytes) -> dict[int, bytes]:
    """All indirect objects, keyed by object number (last wins —
    incremental-update semantics).

    Stream-aware scan: compressed stream bodies are arbitrary bytes and
    can contain the literal sequences ``endobj`` / ``N G obj``, so a
    flat regex scan truncates objects mid-stream (round-2 advisor
    finding).  When a ``stream`` keyword appears before the candidate
    ``endobj``, the scan jumps over ``/Length`` bytes (or to
    ``endstream`` when /Length is an indirect ref) before resuming the
    search."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_HEAD_RE.search(data, pos)
        if m is None:
            break
        num = int(m.group(1))
        body_start = m.end()
        i = body_start
        end = -1
        while True:
            e = data.find(b"endobj", i)
            s = data.find(b"stream", i)
            if s != -1 and (e == -1 or s < e):
                if data[s - 3 : s] == b"end":  # matched inside 'endstream'
                    i = s + len(b"stream")
                    continue
                j = s + len(b"stream")
                if data[j : j + 2] == b"\r\n":
                    j += 2
                elif data[j : j + 1] in (b"\n", b"\r"):
                    j += 1
                lm = _LENGTH_RE.search(data, body_start, s)
                if lm:
                    j += int(lm.group(1))
                # trust /Length to jump over stream bytes that fake an
                # 'endstream', but fall back to the first real one when
                # the declared length overshoots (malformed writers)
                es = data.find(b"endstream", j)
                if es == -1:
                    es = data.find(b"endstream", s + len(b"stream"))
                i = es + len(b"endstream") if es != -1 else j
                continue
            end = e
            break
        if end == -1:
            break
        objs[num] = data[body_start:end]
        pos = end + len(b"endobj")
    _expand_object_streams(objs)
    if not objs:
        raise ValueError("no PDF objects found")
    return objs


_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm\b")
_MAX_OBJSTM_N = 10_000  # totality cap on hostile /N


def _expand_object_streams(objs: dict[int, bytes]) -> None:
    """PDF 1.5+ object streams (ISO 32000 §7.5.7): most modern writers
    pack the catalog / page / font DICTIONARIES into a single
    Flate-compressed ``/Type /ObjStm`` stream whose header lists
    ``objnum offset`` pairs.  Expand them into the object map so the
    page-tree walk sees them.  ``setdefault`` (never clobber): a
    top-level ``N G obj`` definition postdates the ObjStm in
    incrementally-updated files."""
    for num in sorted(objs):
        body = objs[num]
        if not _OBJSTM_RE.search(body):
            continue
        mn = re.search(rb"/N\s+(\d+)\b", body)
        mf = re.search(rb"/First\s+(\d+)\b", body)
        if not (mn and mf):
            continue
        n, first = int(mn.group(1)), int(mf.group(1))
        if not (0 < n <= _MAX_OBJSTM_N) or first < 0:
            continue
        try:
            data = _stream_data(body)
        except ValueError:
            continue
        if data is None or first > len(data):
            continue
        pairs = re.findall(rb"(\d+)\s+(\d+)", data[:first])[:n]
        offsets = [(int(a), int(b)) for a, b in pairs]
        for idx, (onum, off) in enumerate(offsets):
            end = offsets[idx + 1][1] if idx + 1 < len(offsets) else len(data) - first
            if 0 <= off <= end <= len(data) - first:
                objs.setdefault(onum, data[first + off : first + end])


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
    return _apply_filters(raw, body[:i])


# ---------------------------------------------------------------------------
# stream filters (ISO 32000-1 §7.4): Flate, LZW, ASCIIHex, ASCII85,
# RunLength — single names or chains, with optional Flate/LZW predictors
# ---------------------------------------------------------------------------

_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_PRED_RE = re.compile(rb"/Predictor\s+(\d+)")
_COLS_RE = re.compile(rb"/Columns\s+(\d+)")
_COLORS_RE = re.compile(rb"/Colors\s+(\d+)")
_EARLY_RE = re.compile(rb"/EarlyChange\s+(\d+)")


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF /LZWDecode (TIFF-convention LZW, ISO 32000-1 §7.4.4):
    MSB-first variable-width codes starting at 9 bits, Clear=256,
    EOD=257, width grows at table sizes 511/1023/2047 (one code early
    when EarlyChange=1, the default)."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    bitbuf = 0
    bitcnt = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= width:
            bitcnt -= width
            code = (bitbuf >> bitcnt) & ((1 << width) - 1)
            if code == 256:
                reset()
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= 256:
                    raise ValueError("LZW: first code after clear not literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW: code beyond table")
            out += entry
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)  # missing EOD: tolerate, emit what decoded


def _ascii_hex_decode(data: bytes) -> bytes:
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    digits = bytes(c for c in data if c not in _WS)
    if len(digits) % 2:
        digits += b"0"  # odd final digit implies trailing 0 (spec)
    try:
        return bytes.fromhex(digits.decode("ascii"))
    except (ValueError, UnicodeDecodeError) as exc:
        raise ValueError(f"ASCIIHexDecode failed: {exc}") from exc


def _ascii85_decode(data: bytes) -> bytes:
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    out = bytearray()
    group: list[int] = []
    for c in data:
        if c in _WS:
            continue
        if c == 0x7A:  # 'z' = four zero bytes, only between groups
            if group:
                raise ValueError("ASCII85Decode: 'z' inside group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= c <= 0x75:
            raise ValueError(f"ASCII85Decode: bad byte {c:#x}")
        group.append(c - 0x21)
        if len(group) == 5:
            acc = 0
            for d in group:
                acc = acc * 85 + d
            if acc > 0xFFFFFFFF:
                raise ValueError("ASCII85Decode: group overflow")
            out += acc.to_bytes(4, "big")
            group = []
    if group:  # partial final group: pad with 'u', keep len-1 bytes
        if len(group) == 1:
            raise ValueError("ASCII85Decode: lone trailing digit")
        n = len(group)
        acc = 0
        for d in group + [84] * (5 - n):
            acc = acc * 85 + d
        out += acc.to_bytes(4, "big")[: n - 1]
    return bytes(out)


def _run_length_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        l = data[i]
        if l == 128:  # EOD
            break
        if l < 128:
            out += data[i + 1 : i + 2 + l]
            i += 2 + l
        else:
            out += data[i + 1 : i + 2] * (257 - l)
            i += 2
    return bytes(out)


def _apply_predictor(data: bytes, parms: bytes) -> bytes:
    """Flate/LZW /DecodeParms predictors: 2 = TIFF horizontal diff,
    >=10 = PNG row filters (reuses the PNG codec's unfilter)."""
    m = _PRED_RE.search(parms)
    predictor = int(m.group(1)) if m else 1
    if predictor <= 1:
        return data
    mc = _COLS_RE.search(parms)
    columns = int(mc.group(1)) if mc else 1
    mk = _COLORS_RE.search(parms)
    colors = int(mk.group(1)) if mk else 1
    if b"/BitsPerComponent" in parms and not re.search(
        rb"/BitsPerComponent\s+8\b", parms
    ):
        raise ValueError("predictor with BitsPerComponent != 8 unsupported")
    import numpy as np

    if predictor == 2:
        arr = np.frombuffer(data, dtype=np.uint8).copy()
        rowlen = columns * colors
        if rowlen <= 0 or len(arr) % rowlen:
            raise ValueError("TIFF predictor: data not a row multiple")
        rows = arr.reshape(-1, columns, colors)
        np.cumsum(rows, axis=1, dtype=np.uint8, out=rows)
        return rows.tobytes()
    # PNG predictors (10..15): each row prefixed by its filter byte
    from .png import _unfilter

    rowlen = columns * colors + 1
    if rowlen <= 1 or len(data) % rowlen:
        raise ValueError("PNG predictor: data not a row multiple")
    height = len(data) // rowlen
    arr = _unfilter(np.frombuffer(data, dtype=np.uint8), height, columns, colors)
    return arr.tobytes()


_FILTERS = {
    b"FlateDecode": None,  # handled inline (predictor support)
    b"Fl": None,
    b"LZWDecode": None,
    b"LZW": None,
    b"ASCIIHexDecode": _ascii_hex_decode,
    b"AHx": _ascii_hex_decode,
    b"ASCII85Decode": _ascii85_decode,
    b"A85": _ascii85_decode,
    b"RunLengthDecode": _run_length_decode,
    b"RL": _run_length_decode,
}


def _decode_parms(head: bytes) -> bytes:
    """The /DecodeParms (or legacy /DP) dict bytes, b'' when absent.
    Chains with per-filter parm arrays keep only the dict contents —
    predictors apply to the single Flate/LZW stage in practice."""
    m = re.search(rb"/(?:DecodeParms|DP)\s*\[?\s*(?:null\s*)*<<(.*?)>>", head, re.S)
    return m.group(1) if m else b""


def _apply_filters(raw: bytes, head: bytes) -> bytes:
    """Run the stream's /Filter chain (ISO 32000-1 §7.4.1: a name or an
    array applied left to right) over the raw bytes."""
    m = _FILTER_RE.search(head)
    if m is None:
        if b"/Filter" in head:
            raise ValueError("unparseable /Filter entry")
        return raw
    names = [g.group(1) for g in _NAME_RE.finditer(m.group(1))]
    parms = _decode_parms(head)
    for name in names:
        if name not in _FILTERS:
            raise ValueError(
                f"unsupported stream filter: {name.decode('latin-1')}")
        fn = _FILTERS[name]
        if fn is not None:
            raw = fn(raw)
            continue
        if name in (b"FlateDecode", b"Fl"):
            try:
                raw = zlib.decompress(raw)
            except zlib.error as exc:
                raise ValueError(f"FlateDecode failed: {exc}") from exc
        else:  # LZWDecode
            me = _EARLY_RE.search(parms)
            raw = _lzw_decode(raw, int(me.group(1)) if me else 1)
        if parms:
            raw = _apply_predictor(raw, parms)
    return raw


def _inline_dict(body: bytes, name: bytes) -> bytes | None:
    """Balanced ``/Name << ... >>`` extraction (nested dicts supported —
    a non-greedy regex truncates at the first ``>>``)."""
    m = re.search(rb"/" + name + rb"\s*<<", body)
    if m is None:
        return None
    i = m.end()
    depth = 1
    n = len(body)
    start = i
    while i < n and depth > 0:
        if body[i : i + 2] == b"<<":
            depth += 1
            i += 2
        elif body[i : i + 2] == b">>":
            depth -= 1
            i += 2
        else:
            i += 1
    return body[start : i - 2] if depth == 0 else None


_MAX_BFRANGE = 1 << 16


def parse_tounicode(data: bytes) -> tuple[int, dict[int, str]]:
    """ToUnicode CMap stream -> (code byte-width, {code: unicode str}).

    Supports ``begincodespacerange`` (code width from hex token length),
    ``beginbfchar`` (src -> UTF-16BE dst) and ``beginbfrange`` in both
    forms (incrementing base ``<lo> <hi> <dst>`` and explicit array
    ``<lo> <hi> [<d1> <d2> ...]``).  ISO 32000 §9.10.3; ranges capped at
    2^16 entries for totality on hostile input."""
    code_len = 2
    m = re.search(rb"begincodespacerange(.*?)endcodespacerange", data, re.S)
    if m:
        h = re.search(rb"<([0-9A-Fa-f]+)>", m.group(1))
        if h:
            code_len = max(1, len(h.group(1)) // 2)
    mapping: dict[int, str] = {}

    def dst_text(hx: bytes) -> str:
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("latin-1")).decode("utf-16-be", "replace")

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for src, dst in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)):
            mapping[int(src, 16)] = dst_text(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for e in re.finditer(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
                rb"(\[[^\]]*\]|<[0-9A-Fa-f]+>)", m.group(1)):
            lo, hi = int(e.group(1), 16), int(e.group(2), 16)
            if hi < lo or hi - lo >= _MAX_BFRANGE:
                continue
            tgt = e.group(3)
            if tgt.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", tgt)
                for off, d in enumerate(dsts):
                    if lo + off > hi:
                        break
                    mapping[lo + off] = dst_text(d)
            else:
                base = bytearray.fromhex(tgt[1:-1].decode("latin-1"))
                if len(base) < 2:
                    base = bytearray(2 - len(base)) + base
                last = int.from_bytes(base[-2:], "big")
                for off in range(hi - lo + 1):
                    dst = bytes(base[:-2]) + ((last + off) & 0xFFFF).to_bytes(2, "big")
                    mapping[lo + off] = dst.decode("utf-16-be", "replace")
    return code_len, mapping


def _font_maps(objs: dict[int, bytes], res_body: bytes | None) -> dict[bytes, tuple[int, dict[int, str]]]:
    """Page /Resources -> {font name (b"F1"): (code width, ToUnicode
    map)} for fonts that carry a /ToUnicode CMap; simple fonts without
    one are absent (their strings decode via :func:`_decode_text`)."""
    if res_body is None:
        return {}
    font_dict = _inline_dict(res_body, b"Font")
    if font_dict is None:
        ref = _dict_ref(res_body, b"Font")
        if ref is not None and ref in objs:
            font_dict = objs[ref]
    if font_dict is None:
        return {}
    out: dict[bytes, tuple[int, dict[int, str]]] = {}
    for fm in re.finditer(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R\b", font_dict):
        name, ref = fm.group(1), int(fm.group(2))
        if ref not in objs:
            continue
        tu = _dict_ref(objs[ref], b"ToUnicode")
        if tu is None or tu not in objs:
            continue
        try:
            stream = _stream_data(objs[tu])
        except ValueError:
            continue
        if stream is None:
            continue
        out[name] = parse_tounicode(stream)
    return out


def _resources_body(objs: dict[int, bytes], body: bytes,
                    inherited: bytes | None) -> bytes | None:
    """A page node's /Resources (inline dict or ref), else the inherited
    one from its /Pages ancestors (ISO 32000 §7.8.3 inheritance)."""
    inline = _inline_dict(body, b"Resources")
    if inline is not None:
        return inline
    ref = _dict_ref(body, b"Resources")
    if ref is not None and ref in objs:
        return objs[ref]
    return inherited


def _page_content_objs(objs: dict[int, bytes]) -> list[tuple[list[int], dict]]:
    """Page tree walk: per page, (content-stream object ids, font map).

    Falls back to one pseudo-page per stream object containing a ``BT``
    text block when the catalog/page tree is absent or malformed."""
    catalog = None
    for body in objs.values():
        if re.search(rb"/Type\s*/Catalog\b", body):
            catalog = body
            break
    pages: list[tuple[list[int], dict]] = []
    if catalog is not None:
        root_ref = _dict_ref(catalog, b"Pages")

        def walk(ref: int, depth: int = 0, res: bytes | None = None) -> None:
            if depth > 32 or ref not in objs:
                return
            body = objs[ref]
            if re.search(rb"/Type\s*/Pages\b", body):
                res = _resources_body(objs, body, res)
                for kid in _dict_refs(body, b"Kids"):
                    walk(kid, depth + 1, res)
            elif re.search(rb"/Type\s*/Page\b", body):
                res = _resources_body(objs, body, res)
                pages.append((_dict_refs(body, b"Contents"),
                              _font_maps(objs, res)))

        if root_ref is not None:
            walk(root_ref)
    if not pages:
        # fallback: discovery order over text-bearing streams
        for num in sorted(objs):
            data = _stream_data(objs[num])
            if data is not None and b"BT" in data:
                pages.append(([num], {}))
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


def _decode_cid(raw: bytes, code_len: int, cmap: dict[int, str]) -> str:
    """Fixed-width CID string -> unicode via the font's ToUnicode map;
    unmapped codes become U+FFFD (pdfminer behavior)."""
    out = []
    for k in range(0, len(raw) - code_len + 1, code_len):
        out.append(cmap.get(int.from_bytes(raw[k : k + code_len], "big"), "�"))
    return "".join(out)


def extract_runs(content: bytes, fonts: dict[bytes, tuple[int, dict[int, str]]] | None = None) -> list[dict]:
    """Interpret one content stream: text-showing ops -> layout runs.

    Run x/y is the current text-line origin (Tm translation + Td/TD/T*
    accumulation); after each shown string x advances by a nominal
    per-char width — enough for the within-line (x, index) ordering of
    the line merge, which does not need true font metrics.

    ``fonts`` maps font resource names to (code width, ToUnicode map);
    ``Tf`` tracks the current font, and strings shown under a
    ToUnicode-carrying font (CID/composite fonts — the common case for
    Word/LaTeX-produced PDFs with subset fonts) decode through the CMap
    instead of the UTF-8/Latin-1 byte heuristic."""
    runs: list[dict] = []
    i, n = 0, len(content)
    operands: list[tuple[str, object]] = []
    x = y = lx = ly = 0.0
    leading = 0.0
    in_text = False
    fonts = fonts or {}
    cur_font: tuple[int, dict[int, str]] | None = None

    def nums(k: int) -> list[float]:
        vals = [v for t, v in operands if t == "num"]
        return [float(v) for v in vals[-k:]] if len(vals) >= k else []

    def show(s: bytes) -> None:
        nonlocal x
        if cur_font is not None:
            text = _decode_cid(s, cur_font[0], cur_font[1])
        else:
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
        if op == b"Tf":
            names = [v for t, v in operands if t == "name"]
            if names:
                cur_font = fonts.get(names[-1][1:])  # strip leading '/'
        elif op == b"BT":
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
    for content_refs, fonts in _page_content_objs(objs):
        parts = []
        for ref in content_refs:
            if ref in objs:
                data = _stream_data(objs[ref])
                if data is not None:
                    parts.append(data)
        runs = extract_runs(b"\n".join(parts), fonts) if parts else []
        pages.append({"runs": runs})
    return pages


# ---------------------------------------------------------------------------
# deterministic PDF writer (test/fixture tooling: roundtrip oracle input)
# ---------------------------------------------------------------------------


def _escape_pdf_string(s: str) -> bytes:
    out = s.encode("utf-8")
    return out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-convention LZW encoder (EarlyChange=1) — fixture tooling for
    exercising :func:`_lzw_decode`, mirror of its width schedule."""
    out = bytearray()
    bitbuf = 0
    bitcnt = 0
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258

    def emit(code: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            bitcnt -= 8
            out.append((bitbuf >> bitcnt) & 0xFF)

    emit(256)  # leading Clear (what real encoders write)
    seq = b""
    for i in range(len(data)):
        nxt = seq + data[i : i + 1]
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq])
        table[nxt] = next_code
        next_code += 1
        # decoder grows its read width when ITS table (one entry behind
        # the encoder's) reaches 2^width - 1 under EarlyChange=1
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code > 4094:  # table nearly full: clear and restart
            emit(256)
            table = {bytes([b]): b for b in range(256)}
            next_code = 258
            width = 9
        seq = data[i : i + 1]
    if seq:
        emit(table[seq])
    emit(257)  # EOD
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def _encode_stream(stream: bytes, stream_filter: str) -> tuple[bytes, bytes]:
    """(encoded bytes, dict head) for a fixture content stream."""
    if stream_filter == "none":
        return stream, b"<< /Length %d >>" % len(stream)
    if stream_filter == "flate":
        data = zlib.compress(stream)
        filt = b"/FlateDecode"
    elif stream_filter == "lzw":
        data = _lzw_encode(stream)
        filt = b"/LZWDecode"
    elif stream_filter == "rl":
        # naive run-length: literal copies in <=128-byte chunks
        data = b"".join(
            bytes([len(stream[i : i + 128]) - 1]) + stream[i : i + 128]
            for i in range(0, len(stream), 128)) + b"\x80"
        filt = b"/RunLengthDecode"
    elif stream_filter == "ahx":
        data = stream.hex().encode("ascii") + b">"
        filt = b"/ASCIIHexDecode"
    elif stream_filter == "a85flate":
        import base64

        data = base64.a85encode(zlib.compress(stream)) + b"~>"
        filt = b"[/ASCII85Decode /FlateDecode]"
    else:
        raise ValueError(f"unknown fixture stream_filter {stream_filter!r}")
    return data, b"<< /Length %d /Filter %s >>" % (len(data), filt)


def make_pdf(pages: list[list[tuple[str, float, float]]], *,
             compress: bool = False, stream_filter: str | None = None) -> bytes:
    """Build a small valid PDF: one content stream per page, one ``Tj``
    per (text, x, y) run.  ``compress=True`` Flate-encodes the streams
    (exercising the decode path); ``stream_filter`` picks any supported
    filter ("none"/"flate"/"lzw"/"rl"/"ahx"/"a85flate").  Classic xref
    table included."""
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
        data, head = _encode_stream(
            stream, stream_filter or ("flate" if compress else "none"))
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


def make_objstm_pdf(pages: list[list[tuple[str, float, float]]], *,
                    compress: bool = True) -> bytes:
    """Build a PDF 1.5-style file whose catalog / pages / page / font
    DICTIONARIES live inside a compressed ``/Type /ObjStm`` object
    stream (the layout every modern writer emits), with only the
    content streams and the ObjStm itself as top-level objects — a
    parser that ignores object streams sees no page tree at all."""
    n_pages = len(pages)
    # inner (ObjStm-resident) object numbers
    cat_num, pages_num, font_num = 100, 101, 200
    page_nums = [102 + i for i in range(n_pages)]
    # top-level: content streams 1..n_pages, ObjStm = n_pages + 1
    objstm_num = n_pages + 1

    kids = " ".join(f"{p} 0 R" for p in page_nums)
    inner: list[tuple[int, bytes]] = [
        (cat_num, b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num),
        (pages_num, b"<< /Type /Pages /Kids [%s] /Count %d >>"
         % (kids.encode(), n_pages)),
    ]
    for i, page_num in enumerate(page_nums):
        inner.append((page_num,
                      b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                      b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
                      % (pages_num, i + 1, font_num)))
    inner.append((font_num,
                  b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))

    bodies = [body for _, body in inner]
    header = b" ".join(b"%d %d" % (num, sum(len(b) + 1 for b in bodies[:k]))
                       for k, (num, _) in enumerate(inner))
    payload = header + b"\n" + b"\n".join(bodies) + b"\n"
    first = len(header) + 1
    stm_data = zlib.compress(payload) if compress else payload
    filt = b" /Filter /FlateDecode" if compress else b""
    objstm_body = (b"<< /Type /ObjStm /N %d /First %d /Length %d%s >>\nstream\n"
                   % (len(inner), first, len(stm_data), filt)
                   + stm_data + b"\nendstream")

    objects: list[bytes] = []
    for runs in pages:
        parts = [b"BT\n/F1 12 Tf"]
        for text, rx, ry in runs:
            parts.append(b"1 0 0 1 %.2f %.2f Tm (%s) Tj"
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
    objects.append(objstm_body)

    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    for num, body in enumerate(objects, start=1):
        buf += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    buf += (b"trailer\n<< /Size %d /Root %d 0 R >>\n%%%%EOF\n"
            % (objstm_num + 1, cat_num))
    return bytes(buf)


def make_cid_pdf(pages: list[list[tuple[str, float, float]]], *,
                 compress: bool = True) -> bytes:
    """Build a PDF whose text uses a Type0 (CID) font with a /ToUnicode
    CMap — the subset-font shape Word/LaTeX exporters emit, where text
    strings are 2-byte codes meaningless without the CMap.  Codes are
    assigned per unique character in first-seen order starting at 1;
    the CMap mixes ``bfrange`` (contiguous unicode runs) and ``bfchar``
    (singletons), exercising both decode forms.  Deterministic for
    fixture oracles."""
    # code assignment: first-seen order across all page texts
    code_of: dict[str, int] = {}
    for runs in pages:
        for text, _, _ in runs:
            for ch in text:
                if ch not in code_of:
                    code_of[ch] = len(code_of) + 1

    # CMap entries: walk codes in order, emitting a bfrange whenever
    # consecutive codes map to consecutive code units, else a bfchar
    items = sorted((c, ch) for ch, c in code_of.items())
    bfranges: list[bytes] = []
    bfchars: list[bytes] = []
    i = 0
    while i < len(items):
        j = i
        while (j + 1 < len(items)
               and items[j + 1][0] == items[j][0] + 1
               and len(items[j][1]) == 1 and len(items[j + 1][1]) == 1
               and ord(items[j + 1][1]) == ord(items[j][1]) + 1):
            j += 1
        if j > i:
            lo, hi = items[i][0], items[j][0]
            dst = items[i][1].encode("utf-16-be").hex().upper().encode()
            bfranges.append(b"<%04X> <%04X> <%s>" % (lo, hi, dst))
        else:
            c, ch = items[i]
            dst = ch.encode("utf-16-be").hex().upper().encode()
            bfchars.append(b"<%04X> <%s>" % (c, dst))
        i = j + 1

    cmap_parts = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin begincmap",
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange",
    ]
    if bfranges:
        cmap_parts.append(b"%d beginbfrange\n%s\nendbfrange"
                          % (len(bfranges), b"\n".join(bfranges)))
    if bfchars:
        cmap_parts.append(b"%d beginbfchar\n%s\nendbfchar"
                          % (len(bfchars), b"\n".join(bfchars)))
    cmap_parts.append(b"endcmap end end")
    cmap = b"\n".join(cmap_parts)

    objects: list[bytes] = []
    n_pages = len(pages)
    font_obj = 3 + 2 * n_pages
    tounicode_obj = font_obj + 1
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
            f"{font_obj} 0 R >> >> >>".encode())
        parts = [b"BT\n/F1 12 Tf"]
        for text, rx, ry in runs:
            hexcodes = b"".join(b"%04X" % code_of[ch] for ch in text)
            parts.append(b"1 0 0 1 %.2f %.2f Tm <%s> Tj" % (rx, ry, hexcodes))
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
        b"<< /Type /Font /Subtype /Type0 /BaseFont /EKRaySubset "
        b"/Encoding /Identity-H /ToUnicode %d 0 R >>" % tounicode_obj)
    cmap_data = zlib.compress(cmap) if compress else cmap
    filt = b" /Filter /FlateDecode" if compress else b""
    objects.append(b"<< /Length %d%s >>\nstream\n" % (len(cmap_data), filt)
                   + cmap_data + b"\nendstream")

    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
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
