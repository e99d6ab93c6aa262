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
