"""Differential tests for the fast HTML tokenizer: wherever the fast
path accepts a document, its tree AND the final extracted output must be
identical to the stdlib-parser result.  Fallback behavior itself is also
pinned (constructs with parser-specific recovery must decline)."""

import os
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from extract_kit_ray.functions import htmldom  # noqa: E402
from extract_kit_ray.functions.htmldom import Node, _fast_parse, _TreeBuilder  # noqa: E402


def _stdlib_parse(html: str) -> Node:
    b = _TreeBuilder()
    try:
        b.feed(html)
        b.close()
    except Exception:
        pass
    return b.root


def _serialize(node) -> object:
    if isinstance(node, str):
        return node
    return (node.tag, sorted(node.attrs.items()),
            [_serialize(c) for c in node.children])


def _assert_equiv(html: str) -> bool:
    """Returns True when the fast path handled the doc (and matched)."""
    fast = _fast_parse(html)
    if fast is None:
        return False
    assert _serialize(fast) == _serialize(_stdlib_parse(html)), html[:200]
    return True


def test_fixture_corpus_tree_equivalence():
    """Every HTML row of the fixture corpus (incl. skew) must take the
    fast path AND produce the stdlib-identical tree (post-preprocess,
    which is what parse_html actually sees)."""
    from extract_kit_ray.fixtures import make_pages_table
    from extract_kit_ray.functions import detect
    from extract_kit_ray.functions.markdown import preprocess_html

    tbl = make_pages_table(1500, include_skew=True)
    n_fast = n_total = 0
    for payload in tbl["html"].to_pylist():
        if detect.detect_doc_kind(payload) != detect.KIND_HTML:
            continue
        html = preprocess_html(payload.decode("utf-8", "replace"))
        n_total += 1
        n_fast += _assert_equiv(html)
    assert n_total > 1000
    # the corpus is clean markup: fast path must carry (nearly) all of it
    assert n_fast / n_total > 0.95, (n_fast, n_total)


CASES = [
    "<html><body><p>plain</p></body></html>",
    "<!DOCTYPE html><html><body><p>doc</p></body></html>",
    "<p>a<!--comment-->b</p>",                       # data split by comment
    "<p>a &amp; b &#65; &unknown; &</p>",            # entities incl. bogus
    '<a href="x?a=1&amp;b=2" title=\'t\'>l</a>',     # entity in attr
    '<img src="i.png" alt="" />',                    # XHTML self-close
    "<ul><li>one<li>two</ul>",                       # implied closes
    "<table><tr><td>1<td>2<tr><td>3</table>",        # table soup
    "<P CLASS=BIG>upper</P>",                        # case folding, unquoted
    "<div a b=2 c='3'>bare attrs</div>",
    "<br><hr><wbr>",                                 # voids
    "<h1>t</h1><p>body, text.</p>" * 50,             # repetition
    '<a href="a>b">quoted gt</a>',                   # '>' inside quotes
    "<em>unclosed <strong>nest</em>",
    "<?pi content?><p>x</p>",
    "text only, no tags at all",
    "",
]


@pytest.mark.parametrize("html", CASES)
def test_known_cases_equivalent_or_fallback(html):
    _assert_equiv(html)  # either fast==stdlib or clean fallback


FALLBACK_CASES = [
    "<p>a < b</p>",                # stray '<'
    "<script>var a=1;</script>",   # CDATA mode
    "<style>p{}</style>",
    "<![CDATA[raw]]>",
    "</p junk>",
    "<p><!--unterminated</p>",
]


@pytest.mark.parametrize("html", FALLBACK_CASES)
def test_parser_specific_constructs_decline(html):
    assert _fast_parse(html) is None


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.sampled_from("<>/ab p\"'=&;#!-\n"), max_size=200))
def test_adversarial_soup_equivalence(soup):
    """Random tag soup: fast path either declines or matches stdlib."""
    _assert_equiv(soup)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_random_text_equivalence(text):
    html = f'<div class="c"><p>{text}</p></div>'
    _assert_equiv(html)


def test_extraction_output_identical_on_corpus():
    """End-to-end: extract_html_text output must be byte-identical
    whether or not the fast path is used (golden invariant holds by
    construction since trees are equal — this pins the integration)."""
    from extract_kit_ray.fixtures import make_pages_table
    from extract_kit_ray.functions import detect
    from extract_kit_ray.functions.extract import extract_html_text

    tbl = make_pages_table(300)
    for payload in tbl["html"].to_pylist()[:120]:
        if detect.detect_doc_kind(payload) != detect.KIND_HTML:
            continue
        html = payload.decode("utf-8", "replace")
        via_default = extract_html_text(html)
        # force stdlib by monkey-patching the fast path off
        orig = htmldom._fast_parse
        htmldom._fast_parse = lambda _h: None
        try:
            via_stdlib = extract_html_text(html)
        finally:
            htmldom._fast_parse = orig
        assert via_default.markdown == via_stdlib.markdown
        assert via_default.title == via_stdlib.title
        assert [(s.start, s.end, s.kind) for s in via_default.spans] == \
            [(s.start, s.end, s.kind) for s in via_stdlib.spans]
