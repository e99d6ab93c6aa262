"""Unit tests for the real-PDF text parser (functions/pdf_text.py):
writer/parser roundtrips, operator coverage, totality on malformed
input, and the extract_document / fan-out integration."""

import json
import zlib

import pytest

from extract_kit_ray.functions.extract import extract_document
from extract_kit_ray.functions.pdf_layout import assemble_page_text
from extract_kit_ray.functions.pdf_text import (
    extract_runs,
    make_cid_pdf,
    make_pdf,
    parse_tounicode,
    pdf_to_layout_pages,
)


def _texts(payload: bytes) -> list[str]:
    return [assemble_page_text(p["runs"]) for p in pdf_to_layout_pages(payload)]


def test_roundtrip_raw_and_flate():
    pages = [
        [("Hello", 72.0, 720.0), ("world", 112.0, 720.0), ("second line", 72.0, 700.0)],
        [("Page", 72.0, 720.0), ("two", 112.0, 720.0)],
    ]
    for compress in (False, True):
        assert _texts(make_pdf(pages, compress=compress)) == [
            "Hello world\nsecond line",
            "Page two",
        ]


def test_roundtrip_escapes_and_unicode():
    pdf = make_pdf([[("paren (x) \\ yes", 72.0, 720.0), ("héllo wörld", 72.0, 700.0)]])
    assert _texts(pdf) == ["paren (x) \\ yes\nhéllo wörld"]


def test_page_order_follows_page_tree():
    pdf = make_pdf([[("first", 72.0, 720.0)], [("second", 72.0, 720.0)],
                    [("third", 72.0, 720.0)]])
    assert _texts(pdf) == ["first", "second", "third"]


_HANDWRITTEN = b"""%PDF-1.4
1 0 obj
<< /Type /Catalog /Pages 2 0 R >>
endobj
2 0 obj
<< /Type /Pages /Kids [3 0 R] /Count 1 >>
endobj
3 0 obj
<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>
endobj
4 0 obj
<< /Length 104 >>
stream
BT
12 TL
1 0 0 1 72 720 Tm
[(A) -250 (B)] TJ
0 -20 Td
(C) Tj
(D) '
<4546> Tj
ET
endstream
endobj
trailer
<< /Root 1 0 R >>
"""


def test_operators_tj_array_td_quote_hex():
    # TJ array with kerning, Td line move, ' (T* + show), hex string
    assert _texts(_HANDWRITTEN) == ["A B\nC\nD EF"]


def test_octal_escape_and_line_continuation():
    runs = extract_runs(b"BT (A\\101\\\n B) Tj ET")
    assert runs[0]["text"] == "AA B"


def test_utf16be_text_string():
    raw = "Grüß".encode("utf-16-be")
    content = b"BT <FEFF" + raw.hex().upper().encode() + b"> Tj ET"
    runs = extract_runs(content)
    assert runs[0]["text"] == "Grüß"


def test_malformed_payloads_raise_valueerror():
    with pytest.raises(ValueError):
        pdf_to_layout_pages(b"not a pdf")
    with pytest.raises(ValueError):
        pdf_to_layout_pages(b"%PDF-1.4 garbage, no objects")
    # Flate stream with corrupt data
    bad = (b"%PDF-1.4\n1 0 obj\n<< /Length 4 /Filter /FlateDecode >>\n"
           b"stream\nXXXX\nendstream\nendobj\n")
    with pytest.raises(ValueError):
        pdf_to_layout_pages(bad)


def test_unsupported_filter_raises():
    bad = (b"%PDF-1.4\n1 0 obj\n<< /Length 4 /Filter /DCTDecode >>\n"
           b"stream\nXXXX\nendstream\nendobj\n")
    with pytest.raises(ValueError):
        pdf_to_layout_pages(bad)


@pytest.mark.parametrize("filt", ["none", "flate", "lzw", "rl", "ahx", "a85flate"])
def test_all_stream_filters_roundtrip(filt):
    pdf = make_pdf(
        [[("filtered text", 72.0, 700.0), ("line two", 72.0, 680.0)]],
        stream_filter=filt,
    )
    assert _texts(pdf) == ["filtered text\nline two"]


def test_lzw_spec_vector_and_roundtrip():
    from extract_kit_ray.functions.pdf_text import _lzw_decode, _lzw_encode

    # ISO 32000-1 §7.4.4 worked example
    assert _lzw_decode(bytes.fromhex("800B6050220C0C8501")) == b"-----A---B"
    # width growth past 9 bits + table reset (>4094 codes)
    big = (b"the quick brown fox jumps over the lazy dog " * 1500)
    assert _lzw_decode(_lzw_encode(big)) == big
    import random

    rnd = bytes(random.Random(3).randrange(256) for _ in range(4000))
    assert _lzw_decode(_lzw_encode(rnd)) == rnd


def test_ascii85_edge_cases():
    import base64

    from extract_kit_ray.functions.pdf_text import _ascii85_decode

    for payload in (b"", b"a", b"ab", b"abc", b"abcd", bytes(range(256))):
        assert _ascii85_decode(base64.a85encode(payload) + b"~>") == payload
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        _ascii85_decode(b"\x7fbad~>")  # byte outside '!'..'u'
    with pytest.raises(ValueError):
        _ascii85_decode(b"abcdea~>")  # lone trailing digit after a group


def test_flate_png_predictor():
    import numpy as np

    from extract_kit_ray.functions.pdf_text import _apply_filters

    cols = 8
    rows = np.arange(3 * cols, dtype=np.uint8).reshape(3, cols)
    pred = bytearray()
    prev = np.zeros(cols, dtype=np.uint8)
    for r in rows:  # PNG filter type 2 (Up) per row
        pred.append(2)
        pred += bytes((r - prev) & 0xFF)
        prev = r
    comp = zlib.compress(bytes(pred))
    head = (b"<< /Filter /FlateDecode /DecodeParms "
            b"<< /Predictor 12 /Columns 8 >> /Length %d >>" % len(comp))
    assert _apply_filters(comp, head) == rows.tobytes()


def test_fallback_without_page_tree():
    # no catalog: discovery order over BT-bearing streams
    raw = (b"%PDF-1.4\n7 0 obj\n<< /Length 31 >>\nstream\n"
           b"BT 1 0 0 1 72 720 Tm (x) Tj ET\nendstream\nendobj\n")
    assert _texts(raw) == ["x"]


def test_cid_font_tounicode_roundtrip():
    """Type0/CID font with ToUnicode CMap (the Word/LaTeX subset-font
    shape): 2-byte hex-string codes decode through bfrange + bfchar,
    byte-identical text and geometry, compressed and raw."""
    pages = [[("Hello, CID world! ÄÖÜ", 72.0, 700.0),
              ("second line with — dash", 72.0, 680.0)],
             [("page two käffee", 72.0, 700.0)]]
    for compress in (True, False):
        out = pdf_to_layout_pages(make_cid_pdf(pages, compress=compress))
        got = [[(r["text"], r["x"], r["y"]) for r in p["runs"]] for p in out]
        assert got == [[(t, x, y) for t, x, y in pg] for pg in pages]


def test_parse_tounicode_forms():
    """All three CMap entry forms: codespace width, bfchar, incrementing
    bfrange, and array-form bfrange; hostile giant range skipped."""
    cmap = b"""
    1 begincodespacerange <0000> <FFFF> endcodespacerange
    2 beginbfchar
    <0001> <0041>
    <0002> <00E4>
    endbfchar
    1 beginbfrange
    <0010> <0012> <0061>
    <0020> <0021> [<0058> <0059>]
    <0100> <FFFF> <0030>
    endbfrange
    """
    width, m = parse_tounicode(cmap)
    assert width == 2
    assert m[1] == "A" and m[2] == "ä"
    assert (m[0x10], m[0x11], m[0x12]) == ("a", "b", "c")
    assert (m[0x20], m[0x21]) == ("X", "Y")
    assert m[0x100] == "0" and m[0x1FF] == "į"  # big range still capped-safe


def test_unknown_cid_becomes_replacement_char():
    pdf = make_cid_pdf([[("ab", 10.0, 10.0)]], compress=False)
    # splice an unmapped code into the hex string: <0001 0002> -> <0001 00FF>
    bad = pdf.replace(b"<00010002>", b"<000100FF>")
    out = pdf_to_layout_pages(bad)
    assert out[0]["runs"][0]["text"] == "a�"


def test_objstm_page_tree_roundtrip():
    """PDF 1.5 object streams: catalog/pages/page/font dicts packed in
    a compressed /ObjStm (the modern-writer layout) — a parser without
    §7.5.7 support sees no page tree at all."""
    from extract_kit_ray.functions.pdf_text import make_objstm_pdf

    pages = [[("Hello ObjStm", 72.0, 700.0), ("line two", 72.0, 680.0)],
             [("page 2", 72.0, 700.0)]]
    for compress in (True, False):
        out = pdf_to_layout_pages(make_objstm_pdf(pages, compress=compress))
        got = [[(r["text"], r["x"], r["y"]) for r in p["runs"]] for p in out]
        assert got == [[(t, x, y) for t, x, y in pg] for pg in pages]


def test_objstm_top_level_definition_wins():
    """Incremental-update semantics: a top-level `N G obj` definition
    postdates (and must shadow) the same object inside an ObjStm."""
    from extract_kit_ray.functions.pdf_text import make_objstm_pdf

    pdf = make_objstm_pdf([[("original", 72.0, 700.0)]], compress=False)
    # append a top-level redefinition of the page object (102) pointing
    # at a new content stream (object 50)
    patch = (b"50 0 obj\n<< /Length 44 >>\nstream\n"
             b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (patched) Tj ET\nendstream\nendobj\n"
             b"102 0 obj\n<< /Type /Page /Parent 101 0 R /Contents 50 0 R >>\nendobj\n")
    out = pdf_to_layout_pages(pdf + patch)
    assert [r["text"] for r in out[0]["runs"]] == ["patched"]


def test_endobj_inside_stream_body_does_not_truncate():
    """Raw stream bytes containing 'endobj' / 'N 0 obj' (guaranteed
    verbatim with compress=False) must not break the object scan."""
    evil = [[("x endobj trap 7 0 obj y", 10.0, 10.0)]]
    for compress in (False, True):
        out = pdf_to_layout_pages(make_pdf(evil, compress=compress))
        assert out[0]["runs"][0]["text"] == "x endobj trap 7 0 obj y"


def test_extract_document_real_pdf():
    pdf = make_pdf(
        [[("alpha", 72.0, 720.0), ("beta", 112.0, 720.0)],
         [("gamma", 72.0, 720.0)]],
        compress=True,
    )
    rec = extract_document(pdf)
    assert rec["doc_kind"] == "pdf"
    assert rec["valid"] is True
    assert rec["text"] == "alpha beta\n\ngamma"
    assert rec["meta"]["n_pages"] == 2
    assert [s["kind"] for s in rec["spans"]] == ["paragraph", "paragraph"]


def test_extract_document_corrupt_pdf_is_failure_as_data():
    rec = extract_document(b"%PDF-1.4\nnothing here")
    assert rec["doc_kind"] == "pdf"
    assert rec["valid"] is False
    assert rec["errors"] and "pdf parse failed" in rec["errors"][0]


def test_fanout_handles_pdf_and_layout(ray_session):
    import pyarrow as pa
    import ray.data

    from extract_kit_ray.stages.pdf_stage import extract_layout_fanout

    pdf = make_pdf([[("p1", 72.0, 720.0)], [("p2", 72.0, 720.0)]])
    layout = json.dumps(
        {"kind": "ek-layout",
         "pages": [{"runs": [{"text": "lay", "x": 72.0, "y": 720.0}]}]}
    ).encode()
    tbl = pa.table(
        {
            "url": pa.array(["https://x/a.pdf", "https://x/b.layout", "https://x/c.bin"]),
            "warc_ts": pa.array([0, 1, 2], pa.timestamp("us")),
            "html": pa.array([pdf, layout, b"\x00\x01binary"], pa.binary()),
            "lang": pa.array(["en", "en", "en"]),
        }
    )
    out = {r["url"]: r for r in
           extract_layout_fanout(ray.data.from_arrow(tbl)).take_all()}
    assert out["https://x/a.pdf"]["text"] == "p1\n\np2"
    assert out["https://x/a.pdf"]["n_pages"] == 2
    assert out["https://x/b.layout"]["text"] == "lay"
    assert out["https://x/c.bin"]["valid"] is False


def test_indirect_length_falls_back_to_endstream_scan():
    """'/Length 12 0 R' must NOT be read as byte length 12 (the object
    number of the indirect ref): a stream whose early bytes contain a
    literal 'endstream' after that bogus jump point would truncate.
    The parser must fall back to scanning for the real endstream."""
    from extract_kit_ray.functions.pdf_text import _LENGTH_RE, _objects

    # payload contains a fake 'endstream' 14 bytes in; real stream is longer
    payload = b"AAAAAAendstreamBBBBBBBBBBCCCCCCCCCC"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Length 12 0 R >>\nstream\n"
           + payload +
           b"\nendstream\nendobj\n"
           b"12 0 obj\n" + str(len(payload)).encode() + b"\nendobj\n"
           b"%%EOF")
    assert _LENGTH_RE.search(b"<< /Length 12 0 R >>") is None
    assert _LENGTH_RE.search(b"<< /Length 35 >>").group(1) == b"35"
    objs = _objects(pdf)
    # object 1's body must span the WHOLE stream (fake endstream inside
    # the payload is part of it per the trailing real endstream)
    assert payload in objs[1]
