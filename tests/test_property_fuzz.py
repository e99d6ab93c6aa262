"""Property-based tests (hypothesis): the extraction core must be TOTAL
— arbitrary bytes never raise, always yield a well-formed record — and
span offsets must satisfy their invariants on every input (the
receipt.test.ts-style invariant family, SURVEY.md §5.2 item 3)."""

import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from extract_kit_ray.functions.extract import extract_document, extract_html_text  # noqa: E402


def _check_record(rec: dict) -> None:
    assert isinstance(rec["valid"], bool)
    assert isinstance(rec["text"], str)
    assert isinstance(rec["errors"], list)
    meta = rec["meta"]
    assert meta["n_bytes_out"] == len(rec["text"].encode("utf-8"))
    # span invariants: in-bounds, start < end, sorted by start
    n = len(rec["text"])
    starts = []
    for s in rec["spans"]:
        assert 0 <= s["start"] < s["end"] <= n, (s, n)
        starts.append(s["start"])
    assert starts == sorted(starts)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_never_raises_on_bytes(payload):
    _check_record(extract_document(payload, "https://fuzz.example/x"))


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=1024))
def test_extract_never_raises_on_texty_html(text):
    payload = f"<html><body><p>{text}</p></body></html>".encode("utf-8", "ignore")
    _check_record(extract_document(payload, "https://fuzz.example/y"))


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.sampled_from("<>/abp \n\"'=!-"), max_size=512))
def test_extract_tag_soup(soup):
    """Adversarial tag soup (unclosed/malformed/nested tags)."""
    rec = extract_document(soup.encode("utf-8"), "https://fuzz.example/z")
    _check_record(rec)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=512))
def test_html_extract_deterministic(text):
    """Same input -> byte-identical output (the north-rule property)."""
    html = f"<html><body><article><p>{text}</p></article></body></html>"
    a = extract_html_text(html)
    b = extract_html_text(html)
    assert a.markdown == b.markdown
    assert [(s.start, s.end, s.kind) for s in a.spans] == \
        [(s.start, s.end, s.kind) for s in b.spans]
    # spans address real content of the visible text
    for s in a.spans:
        assert a.markdown[s.start:s.end].strip()


# --- PDF parser roundtrip properties --------------------------------------

_pdf_word = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FF),
    min_size=1, max_size=12,
).map(lambda s: s.strip()).filter(bool)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(  # pages
        st.lists(_pdf_word, min_size=0, max_size=12),  # words per page
        min_size=1, max_size=4,
    ),
    st.booleans(),
)
def test_pdf_roundtrip_property(pages_words, compress):
    """make_pdf -> pdf_to_layout_pages recovers every page's words in
    order, for arbitrary unicode words (incl. ()\\ escapes) with and
    without Flate compression."""
    from extract_kit_ray.functions.pdf_layout import assemble_page_text
    from extract_kit_ray.functions.pdf_text import make_pdf, pdf_to_layout_pages

    pages = [
        [(w, 72.0 + 40.0 * j, 720.0) for j, w in enumerate(words)]
        for words in pages_words
    ]
    pdf = make_pdf(pages, compress=compress)
    out = pdf_to_layout_pages(pdf)
    assert len(out) == len(pages_words)
    for got_page, words in zip(out, pages_words):
        # collapse intra-word whitespace the same way the line merge does
        expect = " ".join(words)
        assert assemble_page_text(got_page["runs"]) == expect


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_pdf_parser_total_on_garbage(blob):
    """%PDF-prefixed garbage must ValueError or parse — never crash with
    anything else; extract_document must stay total."""
    from extract_kit_ray.functions.pdf_text import pdf_to_layout_pages

    payload = b"%PDF-1.4\n" + blob
    try:
        pdf_to_layout_pages(payload)
    except (ValueError, UnicodeDecodeError):
        pass
    rec = extract_document(payload, "https://fuzz.example/pdf")
    assert isinstance(rec["valid"], bool)


# --- DOCX converter totality ----------------------------------------------

@settings(max_examples=80, deadline=None)
@given(st.text(alphabet=st.sampled_from("<>/wprtb: =\"'ni"), max_size=400))
def test_docx_xml_soup_total(soup):
    """Arbitrary tag soup inside a valid zip: docx_to_html either
    converts or raises ValueError (malformed XML) — never anything
    else; extract_document stays total either way."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", soup)
    payload = buf.getvalue()

    from extract_kit_ray.functions.docx import docx_to_html

    try:
        html, warnings = docx_to_html(payload)
        assert isinstance(html, str) and isinstance(warnings, list)
    except ValueError:
        pass
    rec = extract_document(payload, "https://fuzz.example/docx")
    assert isinstance(rec["valid"], bool)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=4, max_size=512))
def test_docx_zip_garbage_total(blob):
    """PK-prefixed garbage must flow through extract_document as data."""
    rec = extract_document(b"PK\x03\x04" + blob, "https://fuzz.example/zip")
    assert isinstance(rec["valid"], bool)


# ---------------------------------------------------------------------------
# round-3 decoders: PNG / WAV / ToUnicode CMap must be total — on any
# input they either return a well-formed value or raise ValueError
# (callers convert to failure-as-data), never any other exception
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_png_decode_total(payload):
    import pytest

    from extract_kit_ray.functions.png import PNG_SIGNATURE, decode_png

    try:
        arr = decode_png(payload)
        assert arr.dtype.name == "uint8"
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=512))
def test_png_decode_total_with_signature(tail):
    """Adversarial: a valid signature followed by garbage chunks."""
    from extract_kit_ray.functions.png import PNG_SIGNATURE, decode_png

    try:
        decode_png(PNG_SIGNATURE + tail)
    except ValueError:
        pass


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_wav_decode_total(payload):
    from extract_kit_ray.ops.multimodal import decode_wav

    try:
        d = decode_wav(payload)
        assert d["sample_rate"] >= 1 and d["duration_ms"] >= 0
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=512))
def test_wav_decode_total_with_riff_header(tail):
    from extract_kit_ray.ops.multimodal import decode_wav

    try:
        decode_wav(b"RIFF\x00\x00\x00\x00WAVE" + tail)
    except ValueError:
        pass


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_parse_tounicode_total(payload):
    """CMap parser never raises on arbitrary bytes (it is fed decoded
    stream bytes from untrusted PDFs) and always returns a sane map."""
    from extract_kit_ray.functions.pdf_text import parse_tounicode

    width, mapping = parse_tounicode(payload)
    assert width >= 1
    assert all(isinstance(k, int) and isinstance(v, str)
               for k, v in mapping.items())


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=4096))
def test_media_extractor_total_on_bytes(payload):
    """The media stage converts ANY payload into a valid row or a
    failure-as-data row — never an exception."""
    import pyarrow as pa

    from extract_kit_ray.ops.multimodal import MediaFeatureExtractor

    batch = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "kind": pa.array(["image", "audio", "video"]),
        "payload": pa.array([payload] * 3, pa.binary()),
        "mime": pa.array(["image/png", "audio/wav", "video/mp4"]),
        "width": pa.array([-1] * 3, pa.int32()),
        "height": pa.array([-1] * 3, pa.int32()),
        "duration_ms": pa.array([-1, -1, 1234], pa.int32()),
    })
    out = MediaFeatureExtractor()(batch)
    assert out.num_rows == 3
    assert all(isinstance(v, bool) for v in out["valid"].to_pylist())


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=2048))
def test_video_meta_total_on_bytes(payload):
    """decode_video_meta is total: any byte string either yields a
    well-formed meta dict or raises ValueError — never another
    exception, never a hang."""
    from extract_kit_ray.ops.multimodal import decode_video_meta

    try:
        meta = decode_video_meta(payload)
    except ValueError:
        return
    assert set(meta) == {"duration_ms", "width", "height", "container"}
    assert meta["duration_ms"] >= 0


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10**6), st.integers(1, 4096), st.integers(1, 4096),
       st.binary(max_size=256))
def test_video_containers_roundtrip(dur, w, h, filler):
    """Every writable (duration, w, h) round-trips through both
    containers bit-exactly."""
    from extract_kit_ray.ops.multimodal import (
        decode_video_meta,
        make_avi,
        make_mp4,
    )

    for mk in (make_mp4, make_avi):
        m = decode_video_meta(mk(dur, w, h, filler=filler))
        assert (m["duration_ms"], m["width"], m["height"]) == (dur, w, h)
