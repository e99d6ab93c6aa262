"""Unit tests for the DOM -> Markdown renderer (reference rule parity,
SURVEY.md §5.2 item 1: exact-string expected values — determinism is the
product)."""

from extract_kit_ray.functions.markdown import (
    html_to_markdown,
    join_md,
    postprocess_markdown,
    preprocess_html,
    finalize_spans,
)


def md(html: str) -> str:
    return html_to_markdown(html).markdown


def test_heading_atx_with_double_blank_line_quirk():
    # the reference's heading-spacing regex (html-to-markdown.ts:385)
    # inserts an extra newline after every heading that has a newline
    # BEFORE it — so document-leading headings get one blank line,
    # mid-document headings get two
    assert md("<h2>Title</h2><p>Body text.</p>") == "## Title\n\nBody text.\n"
    assert md("<p>Lead.</p><h2>Title</h2><p>Body.</p>") == "Lead.\n\n## Title\n\n\nBody.\n"


def test_heading_newlines_flattened():
    assert md("<h1>Two\nlines</h1>").startswith("# Two lines\n")


def test_paragraph_trim_and_spacing():
    assert md("<p>  Hello   world  </p><p>Second.</p>") == "Hello world\n\nSecond.\n"


def test_empty_paragraph_dropped():
    assert md("<p>   </p><p>Kept.</p>") == "Kept.\n"


def test_bold_italic_delimiters():
    assert md("<p><b>bold</b> and <i>it</i></p>") == "**bold** and *it*\n"


def test_br_inside_paragraph_is_hard_break():
    assert md("<p>one<br>two</p>") == "one  \ntwo\n"


def test_br_outside_paragraph_is_newline():
    assert "  \n" not in md("<div>one<br>two</div>")


def test_image_basic_and_title_escape():
    out = md('<p><img src="a.png" alt="x" title="say &quot;hi&quot;"></p>')
    assert out == '![x](a.png "say \\"hi\\"")\n'


def test_image_data_uri_truncated_over_100_chars():
    src = "data:image/png;base64," + "A" * 100
    assert md(f'<p><img src="{src}" alt="pic"></p>') == "![pic](data:image/png...)\n"


def test_image_short_data_uri_kept():
    src = "data:image/png;base64,AAAA"
    assert md(f'<p><img src="{src}" alt="pic"></p>') == f"![pic]({src})\n"


def test_image_url_over_500_dropped_to_alt():
    src = "https://x.example/" + "a" * 520
    assert md(f'<p><img src="{src}" alt="big"></p>') == "[big]\n"
    assert md(f'<p><img src="{src}"></p>') == "[Image]\n"


def test_link_javascript_dropped_to_text():
    assert md('<p><a href="javascript:alert(1)">txt</a></p>') == "txt\n"
    assert md('<p><a href="vbscript:x">txt</a></p>') == "txt\n"


def test_link_space_encoded():
    assert md('<p><a href="https://e.com/a b">t</a></p>') == "[t](https://e.com/a%20b)\n"


def test_autolink_when_text_equals_href():
    assert md('<p><a href="https://e.com/x">https://e.com/x</a></p>') == "<https://e.com/x>\n"


def test_autolink_suppressed_by_title():
    out = md('<p><a href="https://e.com/x" title="t">https://e.com/x</a></p>')
    assert out == '[https://e.com/x](https://e.com/x "t")\n'


def test_code_block_language_from_class():
    out = md('<pre><code class="language-python">x = 1</code></pre>')
    assert out == "```python\nx = 1\n```\n"


def test_code_block_no_language():
    assert md("<pre><code>y</code></pre>") == "```\ny\n```\n"


def test_inline_code_backticks():
    assert md("<p>see <code>f()</code></p>") == "see `f()`\n"


def test_list_always_dash_even_ordered():
    # reference quirk: listItem uses options.bulletListMarker
    # unconditionally (html-to-markdown.ts:321)
    assert md("<ol><li>one</li><li>two</li></ol>") == "- one\n- two\n"


def test_nested_list_two_space_indent():
    out = md("<ul><li>a<ul><li>b</li></ul></li></ul>")
    assert out == "- a\n  - b\n"


def test_table_header_detection_and_cell_escape():
    out = md(
        "<table><tr><th>Name</th><th>Status</th></tr>"
        "<tr><td>a|b</td><td>ok</td></tr></table>"
    )
    assert out == "|Name | Status |\n| --- | --- |\n|a\\|b | ok |\n"


def test_table_no_header_no_separator():
    out = md("<table><tr><td>xx</td><td>yy</td></tr></table>")
    assert out == "|xx | yy |\n"


def test_math_inline_passthrough():
    assert md("<p>x <span>$a+b$</span> y</p>") == "x $a+b$ y\n"


def test_math_block_paragraph():
    assert md("<p>$$x^2$$</p>") == "$$x^2$$\n"


def test_script_style_removed():
    assert md("<style>p{}</style><script>x()</script><p>kept</p>") == "kept\n"


def test_blockquote_prefix():
    assert md("<blockquote>quoted</blockquote>") == "> quoted\n"


def test_hr():
    assert md("<p>a</p><hr><p>b</p>") == "a\n\n---\n\nb\n"


def test_final_single_newline():
    out = md("<p>end</p>")
    assert out.endswith("\n") and not out.endswith("\n\n")


def test_preprocess_reference_regexes():
    assert preprocess_html("<script a=b>x</script>keep") == "keep"
    assert preprocess_html("a\n  \n  \nb") == "a\n\nb"
    assert preprocess_html("<w:foo>x</w:bar>") == "x"


def test_postprocess_crlf_and_blank_collapse():
    assert postprocess_markdown("a\r\nb") == "a\nb\n"
    assert postprocess_markdown("a\n\n\n\n\n\nb") == "a\n\n\nb\n"


def test_postprocess_trailing_spaces_kept_only_for_hard_breaks():
    assert postprocess_markdown("x  \ny   ") == "x  \ny\n"


def test_join_md_caps_newlines_at_two():
    assert join_md("a\n\n\n", "\n\n\nb") == "a\n\nb"
    assert join_md("a", "b") == "ab"


def test_title_h1_then_title_tag():
    r = html_to_markdown("<html><head><title>T2</title></head><body><h1>T1</h1></body></html>")
    assert r.title == "T1"
    r2 = html_to_markdown("<html><head><title>T2</title></head><body><p>x</p></body></html>")
    assert r2.title == "T2"


def test_spans_sorted_nonoverlapping_and_match_text():
    r = html_to_markdown(
        "<h1>Head</h1><p>Para with <a href='https://e.com/z'>link</a> text.</p>"
        "<ul><li>item</li></ul><pre><code>c=1</code></pre>"
    )
    last_end = 0
    for s in r.spans:
        assert s.start >= last_end, "spans overlap"
        assert s.end > s.start
        assert r.markdown[s.start:s.end].strip()
        last_end = s.end
    kinds = {s.kind for s in r.spans}
    assert {"heading", "paragraph", "list_item", "code", "link_text"} <= kinds


def test_finalize_spans_merges_markers():
    text, spans = finalize_spans("\x01abc\x0e plain \x05$x$\x0e")
    assert text == "abc plain $x$"
    assert [(s.kind, text[s.start:s.end]) for s in spans] == [
        ("heading", "abc"),
        ("math", "$x$"),
    ]


def test_deterministic_double_run():
    html = "<h1>T</h1>" + "".join(f"<p>para {i} with, commas, here</p>" for i in range(30))
    a = html_to_markdown(html)
    b = html_to_markdown(html)
    assert a.markdown == b.markdown
    assert [(s.start, s.end, s.kind) for s in a.spans] == [
        (s.start, s.end, s.kind) for s in b.spans
    ]
