"""DOCX parity features (docx-converter.ts:163-202 semantics): numbered
vs bulleted lists via numbering.xml, nesting by ilvl, hyperlinks via
rels, image placeholders, mammoth-style styleMap."""

import io
import zipfile

from extract_kit_ray.functions.docx import docx_to_html, parse_style_map
from extract_kit_ray.functions.extract import extract_document

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
RELS = "http://schemas.openxmlformats.org/package/2006/relationships"

NUMBERING = f"""<?xml version="1.0"?>
<w:numbering xmlns:w="{W}">
  <w:abstractNum w:abstractNumId="0">
    <w:lvl w:ilvl="0"><w:numFmt w:val="bullet"/></w:lvl>
    <w:lvl w:ilvl="1"><w:numFmt w:val="bullet"/></w:lvl>
  </w:abstractNum>
  <w:abstractNum w:abstractNumId="1">
    <w:lvl w:ilvl="0"><w:numFmt w:val="decimal"/></w:lvl>
  </w:abstractNum>
  <w:num w:numId="10"><w:abstractNumId w:val="0"/></w:num>
  <w:num w:numId="11"><w:abstractNumId w:val="1"/></w:num>
</w:numbering>"""

RELS_XML = f"""<?xml version="1.0"?>
<Relationships xmlns="{RELS}">
  <Relationship Id="rId5" Type="http://x/hyperlink"
    Target="https://example.com/page" TargetMode="External"/>
</Relationships>"""


def _docx(body: str, *, numbering: str | None = None, rels: str | None = None,
          files: dict[str, bytes] | None = None,
          content_types: str | None = None) -> bytes:
    document = (
        f'<w:document xmlns:w="{W}" xmlns:r="{R}"><w:body>{body}</w:body></w:document>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml",
                    content_types or '<?xml version="1.0"?><Types/>')
        zf.writestr("word/document.xml", document)
        if numbering:
            zf.writestr("word/numbering.xml", numbering)
        if rels:
            zf.writestr("word/_rels/document.xml.rels", rels)
        for name, data in (files or {}).items():
            zf.writestr(name, data)
    return buf.getvalue()


def _r(text: str) -> str:
    return f'<w:r><w:t xml:space="preserve">{text}</w:t></w:r>'


def _li(text: str, num_id: str, ilvl: int = 0) -> str:
    return (
        f'<w:p><w:pPr><w:numPr><w:ilvl w:val="{ilvl}"/>'
        f'<w:numId w:val="{num_id}"/></w:numPr></w:pPr>{_r(text)}</w:p>'
    )


def test_ordered_vs_bulleted_lists():
    body = _li("bullet one", "10") + _li("bullet two", "10") + \
        f"<w:p>{_r('between')}</w:p>" + _li("num one", "11") + _li("num two", "11")
    html, warnings = docx_to_html(_docx(body, numbering=NUMBERING))
    assert html == (
        "<ul><li>bullet one</li><li>bullet two</li></ul>"
        "<p>between</p>"
        "<ol><li>num one</li><li>num two</li></ol>"
    )
    assert warnings == []


def test_list_type_change_at_same_level_closes_list():
    body = _li("a", "10") + _li("b", "11")
    html, _ = docx_to_html(_docx(body, numbering=NUMBERING))
    assert html == "<ul><li>a</li></ul><ol><li>b</li></ol>"


def test_nested_list_levels():
    body = _li("top", "10", 0) + _li("sub", "10", 1) + _li("top2", "10", 0)
    html, _ = docx_to_html(_docx(body, numbering=NUMBERING))
    assert html == "<ul><li>top</li><ul><li>sub</li></ul><li>top2</li></ul>"


def test_unknown_numid_defaults_to_bullet():
    html, _ = docx_to_html(_docx(_li("x", "99")))
    assert html == "<ul><li>x</li></ul>"


def test_hyperlink_resolved_through_rels():
    body = (
        f'<w:p><w:hyperlink r:id="rId5">{_r("click here")}</w:hyperlink></w:p>'
    )
    html, warnings = docx_to_html(_docx(body, rels=RELS_XML))
    assert html == '<p><a href="https://example.com/page">click here</a></p>'
    assert warnings == []


def test_hyperlink_anchor_and_unresolved():
    body = (
        f'<w:p><w:hyperlink w:anchor="sec1">{_r("jump")}</w:hyperlink></w:p>'
        f'<w:p><w:hyperlink r:id="rId404">{_r("dangling")}</w:hyperlink></w:p>'
    )
    html, warnings = docx_to_html(_docx(body))
    assert '<a href="#sec1">jump</a>' in html
    assert "dangling" in html and 'href' not in html.split("jump</a>")[1]
    assert any("unresolved relationship" in w for w in warnings)


def test_image_placeholder_with_alt():
    wp = "http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing"
    body = (
        f'<w:p><w:r><w:drawing><wp:inline xmlns:wp="{wp}">'
        f'<wp:docPr id="1" name="Picture 1" descr="a red square"/>'
        f"</wp:inline></w:drawing></w:r></w:p>"
    )
    html, _ = docx_to_html(_docx(body))
    assert html == '<p><img alt="a red square"></p>'


WP = "http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing"
A = "http://schemas.openxmlformats.org/drawingml/2006/main"


def _drawing(rid: str, descr: str = "a red square") -> str:
    return (
        f'<w:p><w:r><w:drawing><wp:inline xmlns:wp="{WP}" xmlns:a="{A}" '
        f'xmlns:r="{R}"><wp:docPr id="1" name="Pic" descr="{descr}"/>'
        f'<a:graphic><a:graphicData><a:blip r:embed="{rid}"/>'
        f"</a:graphicData></a:graphic></wp:inline></w:drawing></w:r></w:p>"
    )


def _img_rels(rid: str, target: str) -> str:
    return (
        f'<?xml version="1.0"?><Relationships xmlns="{RELS}">'
        f'<Relationship Id="{rid}" Type="http://x/image" Target="{target}"/>'
        f"</Relationships>"
    )


def _tiny_png() -> bytes:
    import numpy as np
    from extract_kit_ray.functions.png import encode_png
    return encode_png(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))


def test_embedded_image_becomes_data_uri():
    import base64
    png = _tiny_png()
    payload = _docx(
        _drawing("rId9"),
        rels=_img_rels("rId9", "media/image1.png"),
        files={"word/media/image1.png": png},
        content_types=(
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxml'
            'formats.org/package/2006/content-types">'
            '<Default Extension="png" ContentType="image/png"/></Types>'
        ),
    )
    html, warnings = docx_to_html(payload)
    b64 = base64.b64encode(png).decode()
    assert html == (
        f'<p><img src="data:image/png;base64,{b64}" alt="a red square"></p>'
    )
    assert warnings == []
    # end-to-end markdown: the long data URI truncates to mime-only
    # (html-to-markdown.ts:242-255 smartImage rule)
    rec = extract_document(payload)
    assert "![a red square](data:image/png...)" in rec["text"]


def test_legacy_pict_imagedata_resolves_bytes():
    v = "urn:schemas-microsoft-com:vml"
    body = (
        f'<w:p><w:r><w:pict><v:shape xmlns:v="{v}" xmlns:r="{R}">'
        f'<v:imagedata r:id="rId3"/></v:shape></w:pict></w:r></w:p>'
    )
    payload = _docx(
        body,
        rels=_img_rels("rId3", "media/legacy.gif"),
        files={"word/media/legacy.gif": b"GIF89a-fake-bytes"},
    )
    html, warnings = docx_to_html(payload)
    # no [Content_Types].xml default: mammoth extension fallback map
    assert 'src="data:image/gif;base64,' in html
    assert warnings == []


def test_image_content_type_override_wins():
    payload = _docx(
        _drawing("rId9"),
        rels=_img_rels("rId9", "media/image1.bin"),
        files={"word/media/image1.bin": b"\x00\x01"},
        content_types=(
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxml'
            'formats.org/package/2006/content-types">'
            '<Override PartName="/word/media/image1.bin" '
            'ContentType="image/webp"/></Types>'
        ),
    )
    html, _ = docx_to_html(payload)
    assert 'src="data:image/webp;base64,' in html


def test_image_missing_part_degrades_to_placeholder():
    payload = _docx(_drawing("rId9"),
                    rels=_img_rels("rId9", "media/gone.png"))
    html, warnings = docx_to_html(payload)
    assert html == '<p><img alt="a red square"></p>'
    assert any("image part not found" in w for w in warnings)


def test_image_unresolved_relationship_degrades():
    payload = _docx(_drawing("rId404"))
    html, warnings = docx_to_html(payload)
    assert html == '<p><img alt="a red square"></p>'
    assert any("unresolved relationship id" in w for w in warnings)


def test_style_map_overrides():
    body = (
        f'<w:p><w:pPr><w:pStyle w:val="Quote"/></w:pPr>{_r("wise words")}</w:p>'
        f'<w:p><w:r><w:rPr><w:rStyle w:val="Code"/></w:rPr>'
        f'<w:t xml:space="preserve">x = 1</w:t></w:r></w:p>'
    )
    html, warnings = docx_to_html(
        _docx(body),
        style_map=["p[style-name='Quote'] => blockquote",
                   "r[style-name='Code'] => code"],
    )
    assert html == "<blockquote>wise words</blockquote><p><code>x = 1</code></p>"
    assert warnings == []


def test_style_map_bad_entry_warns():
    warnings: list[str] = []
    p_map, r_map = parse_style_map(["nonsense =>"], warnings)
    assert p_map == {} and r_map == {}
    assert any("unparseable styleMap" in w for w in warnings)


def test_end_to_end_markdown_with_links_lists_images():
    wp = "http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing"
    body = (
        f'<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>{_r("Title")}</w:p>'
        + _li("first", "11") + _li("second", "11")
        + f'<w:p><w:hyperlink r:id="rId5">{_r("a link")}</w:hyperlink></w:p>'
        + f'<w:p><w:r><w:drawing><wp:inline xmlns:wp="{wp}">'
          f'<wp:docPr id="1" name="img" descr="diagram"/></wp:inline>'
          f"</w:drawing></w:r></w:p>"
    )
    payload = _docx(body, numbering=NUMBERING, rels=RELS_XML)
    rec = extract_document(payload)
    assert rec["valid"] is True
    assert rec["title"] == "Title"
    text = rec["text"]
    assert "- first" in text and "- second" in text
    assert "[a link](https://example.com/page)" in text
    assert "[diagram]" in text


FOOTNOTES = f"""<?xml version="1.0"?>
<w:footnotes xmlns:w="{W}">
  <w:footnote w:type="separator" w:id="-1"><w:p>{{}}</w:p></w:footnote>
  <w:footnote w:id="2"><w:p><w:r><w:t>first note body</w:t></w:r></w:p></w:footnote>
  <w:footnote w:id="3"><w:p><w:r><w:t>second note body</w:t></w:r></w:p></w:footnote>
</w:footnotes>""".replace("{{}}", "")


def _docx_with_notes(body: str) -> bytes:
    import io
    import zipfile

    document = (
        f'<w:document xmlns:w="{W}" xmlns:r="{R}"><w:body>{body}</w:body></w:document>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", '<?xml version="1.0"?><Types/>')
        zf.writestr("word/document.xml", document)
        zf.writestr("word/footnotes.xml", FOOTNOTES)
    return buf.getvalue()


def test_footnotes_rendered_mammoth_style():
    body = (
        '<w:p><w:r><w:t>text</w:t></w:r>'
        '<w:r><w:footnoteReference w:id="3"/></w:r>'
        '<w:r><w:t> more</w:t></w:r>'
        '<w:r><w:footnoteReference w:id="2"/></w:r></w:p>'
    )
    html, warnings = docx_to_html(_docx_with_notes(body))
    # sequential numbering in first-reference order (3 first -> [1])
    assert '<sup><a href="#footnote-3" id="footnote-ref-3">[1]</a></sup>' in html
    assert '<sup><a href="#footnote-2" id="footnote-ref-2">[2]</a></sup>' in html
    # note list at the end, reference order, with back-links
    assert html.index("second note body") < html.index("first note body")
    assert '<a href="#footnote-ref-3">↑</a>' in html
    assert warnings == []


def test_unresolved_footnote_warns():
    body = '<w:p><w:r><w:footnoteReference w:id="99"/></w:r></w:p>'
    html, warnings = docx_to_html(_docx_with_notes(body))
    assert "[1]" not in html
    assert any("unresolved footnote" in w for w in warnings)
