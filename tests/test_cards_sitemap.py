"""Luhn card redaction (ops/redact.py) and the sitemap XML codec
(functions/sitemap.py)."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from extract_kit_ray.functions.sitemap import (build_sitemap,
                                               parse_sitemap)
from extract_kit_ray.ops.redact import (_redact_cards_str, luhn_valid,
                                        redact_cards_batch)

# ------------------------------------------------------------------ luhn

KNOWN_VALID = ["4111111111111111", "5500005555555559", "340000000000009",
               "6011000990139424", "79927398713"]
KNOWN_INVALID = ["4111111111111112", "79927398710", "1234567812345678"]


@pytest.mark.parametrize("d", KNOWN_VALID)
def test_luhn_known_valid(d):
    assert luhn_valid(d)


@pytest.mark.parametrize("d", KNOWN_INVALID)
def test_luhn_known_invalid(d):
    assert not luhn_valid(d)


def _luhn_reference(digits: str) -> bool:
    # independent implementation: double every second digit from the
    # right via table lookup
    dbl = [0, 2, 4, 6, 8, 1, 3, 5, 7, 9]
    s = 0
    for i, ch in enumerate(reversed(digits)):
        s += dbl[int(ch)] if i % 2 else int(ch)
    return s % 10 == 0


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="0123456789", min_size=1, max_size=19))
def test_luhn_fuzz_vs_reference(digits):
    assert luhn_valid(digits) == _luhn_reference(digits)


def test_fixture_validity_flags_match_engine():
    from extract_kit_ray.driver import _CARD_FIXTURES

    for card, valid in _CARD_FIXTURES:
        digits = card.replace(" ", "").replace("-", "")
        assert (13 <= len(digits) <= 19 and luhn_valid(digits)) == valid, card


# ---------------------------------------------------------------- redact

def test_redact_valid_formats():
    for form in ["4111111111111111", "4111 1111 1111 1111",
                 "4111-1111-1111-1111"]:
        out, n = _redact_cards_str(f"pay {form} now")
        assert out == "pay [CARD] now" and n == 1


def test_redact_keeps_invalid_and_nondigits():
    out, n = _redact_cards_str("id 4111111111111112 t 12:30:45")
    assert out == "id 4111111111111112 t 12:30:45" and n == 0


def test_redact_too_short_run_kept():
    out, n = _redact_cards_str("order 123456789012")  # 12 digits
    assert n == 0 and "123456789012" in out


def test_redact_batch_counts():
    t = pa.table({"text": ["a 4111111111111111 b 5500005555555559",
                           "clean", None]})
    out = redact_cards_batch(t)
    assert out["n_cards"].to_pylist() == [2, 0, 0]
    assert out["text"][0].as_py() == "a [CARD] b [CARD]"


# --------------------------------------------------------------- sitemap

def test_sitemap_roundtrip_with_entities_and_nulls():
    entries = [
        {"loc": "https://e/p?a=1&b=<2>", "lastmod": "2026-01-01",
         "priority": "0.5"},
        {"loc": "https://e/q", "lastmod": None, "priority": None},
    ]
    assert parse_sitemap(build_sitemap(entries)) == entries


def test_sitemap_empty():
    assert parse_sitemap(build_sitemap([])) == []


@pytest.mark.parametrize("doc", [
    "<url><loc>x</loc></url>",                      # no urlset
    "<urlset><url><loc>x</loc>",                    # unterminated url
    "<urlset><url><lastmod>t</lastmod></url></urlset>",  # no loc
    "<urlset><url><loc>x</url></urlset>",           # unterminated loc
])
def test_sitemap_malformed_raises(doc):
    with pytest.raises(ValueError):
        parse_sitemap(doc)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.fixed_dictionaries({
    "loc": st.text(alphabet="ab&<>/:.", min_size=1, max_size=20),
    "lastmod": st.one_of(st.none(),
                         st.text(alphabet="0123456789-", min_size=1,
                                 max_size=10)),
    "priority": st.one_of(st.none(),
                          st.text(alphabet="0123456789.", min_size=1,
                                  max_size=4)),
}), max_size=6))
def test_sitemap_fuzz_roundtrip(entries):
    assert parse_sitemap(build_sitemap(entries)) == entries
