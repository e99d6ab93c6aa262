"""Charset sniffing (functions/charset.py) and the cleaning kernels
(ops/clean.py)."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from extract_kit_ray.functions.charset import decode_html, sniff_charset
from extract_kit_ray.ops.clean import (ENTITY_STEPS, c4_line_filter,
                                       decode_entities_batch,
                                       oracle_decode_entities_expr)

# --------------------------------------------------------------- charset

def test_sniff_bom_beats_meta():
    data = b"\xef\xbb\xbf<meta charset=iso-8859-1>x"
    assert sniff_charset(data) == "utf-8"
    assert decode_html(data)[1].startswith("<meta")  # BOM stripped


def test_sniff_meta_variants():
    assert sniff_charset(b'<meta charset="UTF-8">') == "utf-8"
    assert sniff_charset(b"<META CHARSET='Latin-1'>") == "iso-8859-1"
    assert sniff_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=ISO-8859-1">') == "iso-8859-1"


def test_sniff_meta_outside_prescan_window_ignored():
    data = b" " * 1200 + b'<meta charset="utf-16">'
    assert sniff_charset(data) == "utf-8"


def test_decode_latin1_accents():
    cs, text = decode_html("<meta charset=iso-8859-1>déjà"
                           .encode("iso-8859-1"))
    assert (cs, text) == ("iso-8859-1", "<meta charset=iso-8859-1>déjà")


def test_decode_utf16_bom():
    cs, text = decode_html("héllo".encode("utf-16"))
    assert (cs, text) == ("utf-16", "héllo")


def test_decode_unknown_charset_falls_back():
    cs, text = decode_html(b"<meta charset=x-klingon>ok")
    assert cs == "x-klingon" and text.endswith("ok")


def test_decode_bad_bytes_replace_not_raise():
    cs, text = decode_html(b"<meta charset=utf-8>\xff\xfe!")
    assert "�" in text


# -------------------------------------------------------------- entities

def _decode(s: str) -> str:
    t = pa.table({"text": [s]})
    return decode_entities_batch(t)["text"][0].as_py()


def test_entity_chain():
    # &nbsp; decodes to a real U+00A0, not an ASCII space
    assert _decode("&lt;b&gt;&quot;x&quot;&#39;y&#39;&nbsp;&amp;") == \
        '<b>"x"\'y\'\xa0&'


def test_double_escape_decodes_one_level():
    assert _decode("&amp;amp; &amp;lt;") == "&amp; &lt;"


def test_oracle_expr_matches_engine():
    import duckdb

    probes = ["&lt;&amp;lt;&gt;", "a&nbsp;&nbsp;b", "&amp;amp;amp;",
              "plain", "&quot;&#39;", "&", "&amp"]
    expr = oracle_decode_entities_expr("s")
    for p in probes:
        got = duckdb.sql(
            f"SELECT {expr} AS v FROM (SELECT ? AS s)", params=[p]
        ).fetchone()[0]
        assert got == _decode(p), p


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="&amp;ltgqu#39nbsp; x", max_size=30))
def test_entity_fuzz_vs_duckdb(s):
    import duckdb

    expr = oracle_decode_entities_expr("s")
    got = duckdb.sql(f"SELECT {expr} AS v FROM (SELECT ? AS s)",
                     params=[s]).fetchone()[0]
    assert got == _decode(s)


# --------------------------------------------------------------- c4 rule

def test_c4_keeps_only_terminal_punct_and_length():
    lines = ["one two three four five.",      # kept
             "one two three four five",       # no punct
             "short words.",                   # <5 words
             "a b c d e f?",                   # kept
             "", "ends bang one two three!"]   # empty; kept
    kept, dropped = c4_line_filter(lines)
    assert kept == ["one two three four five.", "a b c d e f?",
                    "ends bang one two three!"]
    assert dropped == 3


def test_c4_min_words_param():
    kept, dropped = c4_line_filter(["a b."], min_words=2)
    assert kept == ["a b."] and dropped == 0


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_sniff_and_decode_total(data):
    """Arbitrary bytes must never raise: sniff returns a lowercase
    name, decode returns a str (U+FFFD fallback)."""
    cs, text = decode_html(data)
    assert cs == cs.lower() and isinstance(text, str)


# ------------------------------------------------------------------- psl

def test_registered_domain_rules():
    from extract_kit_ray.ops.psl import registered_domain

    sfx = frozenset(["com", "co.uk", "uk", "example"])
    rd = lambda h: registered_domain(h, sfx)
    assert rd("www.site.co.uk") == "site.co.uk"      # longest beats 'uk'
    assert rd("a.b.site.com") == "site.com"
    assert rd("site.com") == "site.com"
    assert rd("co.uk") == "co.uk"                     # host IS a suffix
    assert rd("x.internal.zone") == "internal.zone"   # implicit * rule
    assert rd("localhost") == "localhost"             # single label
    assert rd("notco.uk") == "notco.uk"               # 'uk' match, not 'co.uk'
    # label boundary: 'xco.uk' must NOT match suffix 'co.uk'
    assert rd("a.xco.uk") == "xco.uk"


# ----------------------------------------------------------------- links

def test_extract_outlinks_contract():
    from extract_kit_ray.ops.links import extract_outlinks

    html = ('<a href="/a">1</a> <A HREF=\'https://x.example/b\'>2</A> '
            '<a href=/c>unquoted</a> <a href="#f">s</a> '
            '<a href="mailto:a@b">s</a> <a href="//proto.example/p">s</a> '
            '<a href="rel/dir">s</a> <a name="x">no href</a> '
            '<a href="?a=1&amp;b=2">s</a> '
            '<a href="https://y.example/?q=1&amp;r=2">abs-ent</a>')
    out = extract_outlinks(html, "https://base.example/dir/page")
    assert out == ["https://base.example/a", "https://x.example/b",
                   "https://base.example/c",
                   "https://y.example/?q=1&r=2"]


def test_extract_outlinks_no_base_origin():
    from extract_kit_ray.ops.links import extract_outlinks

    # unparseable base: root-relative links are dropped, absolute kept
    out = extract_outlinks('<a href="/a">1</a><a href="http://e/b">2</a>',
                           "not-a-url")
    assert out == ["http://e/b"]


# ---------------------------------------------------------------- winnow

def _winnow_brute(tokens, k=4, w=4):
    grams = [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
    if not grams:
        return []
    if len(grams) < w:
        return sorted({min(grams)})
    return sorted({min(grams[j:j + w]) for j in range(len(grams) - w + 1)})


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from("abcdef"), max_size=30),
       st.integers(2, 5), st.integers(2, 5))
def test_winnow_deque_matches_brute(tokens, k, w):
    from extract_kit_ray.ops.winnow import winnow_select

    assert winnow_select(tokens, k=k, w=w) == _winnow_brute(tokens, k, w)


def test_winnow_shared_substring_guarantee():
    """The MOSS property: two docs sharing a run of >= w + k - 1
    tokens share at least one selected gram."""
    from extract_kit_ray.ops.winnow import winnow_select

    shared = "q r s t u v w".split()          # 7 tokens = w + k - 1
    a = "x1 x2 x3".split() + shared + "x4 x5".split()
    b = "y1".split() + shared + "y2 y3 y4".split()
    sa = set(winnow_select(a, k=4, w=4))
    sb = set(winnow_select(b, k=4, w=4))
    assert sa & sb
