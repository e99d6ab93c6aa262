"""Deterministic synthetic page corpus (FIXTURES.md §1).

Everything is seed-fixed and platform-stable: per-row ``random.Random``
instances keyed by ``(seed, row_index)`` so any row is reproducible
independently of corpus size (resume tests slice corpora freely), fixed
string formatting, no dict-order dependence.

Row mix (by index arithmetic, stable at any n >= 64):
- ~2 %  corruption rows (empty / invalid UTF-8 / truncated tags) — must
  become ``valid=False`` rows, never exceptions (processor.ts:115-131)
- ~5 %  multi-page ek-layout payloads, page counts cycling 1/2/3/5/20
  (20 = the reference's MAX_BATCH_SIZE, file-processor.ts:13)
- ~3 %  DOCX payloads (with OMML math, exercising the zip preprocess)
- rest  HTML pages with article content + nav/footer/sidebar boilerplate,
  tables, math spans, code blocks, tricky links/images (FIXTURES.md §1.1)
- optional ~1 % skew rows with 100-500x median payloads (FIXTURES.md §1.1)
"""

from __future__ import annotations

import io
import json
import random
import zipfile

import pyarrow as pa

from .schemas import PAGES_SCHEMA

DOMAINS = [
    "alpha-news.example", "beta-blog.example", "gamma-docs.example",
    "delta-shop.example", "epsilon-wiki.example", "zeta-forum.example",
    "eta-press.example", "theta-lab.example", "iota-mag.example",
    "kappa-hub.example", "lambda-net.example", "mu-review.example",
    "nu-portal.example", "xi-daily.example", "omicron-tech.example",
    "pi-science.example", "rho-sports.example", "sigma-travel.example",
    "tau-food.example", "upsilon-art.example",
]

LANGS = ["en", "fr", "de", "es", "unknown"]

_WORDS = (
    "the quick brown fox jumps over a lazy dog and then runs back to its "
    "den where it finds some food for the long cold winter nights that "
    "come with snow wind and ice on all of these hills near our town"
).split()

_EPOCH_US = 1_546_300_800_000_000  # 2019-01-01T00:00:00Z in microseconds

PAGE_COUNT_CYCLE = [1, 2, 3, 5, 20]


def _sentence(rng: random.Random, n_words: int) -> str:
    words = [rng.choice(_WORDS) for _ in range(n_words)]
    words[0] = words[0].capitalize()
    return " ".join(words) + rng.choice([".", ".", ".", "!", "?"])


def _paragraph(rng: random.Random) -> str:
    return " ".join(_sentence(rng, rng.randint(8, 18)) for _ in range(rng.randint(2, 5)))


def make_html_page(i: int, seed: int = 42, repeat_body: int = 1) -> str:
    """One deterministic HTML page exercising every converter rule."""
    rng = random.Random(f"{seed}:html:{i}")
    title = f"Article {i}: {_sentence(rng, 4)[:-1]}"
    paras = "\n".join(f"<p>{_paragraph(rng)}</p>" for _ in range(rng.randint(3, 6)))
    body_blocks = [f"<h1>{title}</h1>", paras]
    if i % 3 == 0:
        body_blocks.append(f"<h2>Section {i % 7}</h2>")
        items = "".join(f"<li>{_sentence(rng, 6)}</li>" for _ in range(3))
        nested = "<li>outer item<ul><li>nested item one</li><li>nested item two</li></ul></li>"
        body_blocks.append(f"<ul>{items}{nested}</ul>")
        body_blocks.append(f"<ol><li>{_sentence(rng, 5)}</li><li>{_sentence(rng, 5)}</li></ol>")
    if i % 5 == 0:
        body_blocks.append(
            "<table><tr><th>Name</th><th>Type</th><th>Status</th></tr>"
            f"<tr><td>row-{i}</td><td>a|b pipe</td><td>{_sentence(rng, 3)}</td></tr>"
            "<tr><td></td><td>empty-neighbor</td><td>ok</td></tr></table>"
        )
    if i % 4 == 0:
        body_blocks.append("<p>$$\\sum_{k=1}^{n} k = \\frac{n(n+1)}{2}$$</p>")
        body_blocks.append(f"<p>Inline math <span>$x_{{{i % 9}}}+y$</span> in flow.</p>")
    if i % 6 == 0:
        body_blocks.append(
            "<pre><code class=\"language-python\">def f(n):\n"
            "    return n * 2\n</code></pre>"
        )
    if i % 7 == 0:
        long_data = "data:image/png;base64," + "A" * 120
        long_url = "https://cdn.example/" + "x" * 520
        body_blocks.append(
            f'<p>Pics: <img src="pic-{i}.png" alt="fig {i}"> '
            f'<img src="{long_data}" alt="inline"> '
            f'<img src="{long_url}" alt="huge"></p>'
        )
        body_blocks.append(
            '<p>Links: <a href="https://example.com/ok">good</a> '
            '<a href="javascript:alert(1)">bad</a> '
            '<a href="https://example.com/a b/c">spaced</a> '
            '<a href="https://auto.example/x">https://auto.example/x</a></p>'
        )
    if i % 8 == 0:
        body_blocks.append(f"<blockquote>{_sentence(rng, 10)}</blockquote><hr>")
    if i % 9 == 0:
        body_blocks.append(f"<p>line one<br>line two of row {i}</p>")

    article = "\n".join(body_blocks * max(1, repeat_body))
    nav_links = "".join(
        f'<a href="/nav/{k}">Menu {k}</a> ' for k in range(8)
    )
    sidebar_links = "".join(
        f'<li><a href="/rel/{k}">Related story number {k}</a></li>' for k in range(6)
    )
    return (
        "<!DOCTYPE html>\n"
        f"<html><head><title>{title}</title>\n"
        "<style>.main { color: #222; }</style>\n"
        "<script>window.tracker = 1;</script>\n"
        "</head>\n<body>\n"
        f"<nav>{nav_links}</nav>\n"
        f'<header><a href="/">Home</a> | <a href="/about">About</a></header>\n'
        "<div class=\"wrap\">\n"
        f"<article>\n{article}\n</article>\n"
        f'<div class="sidebar"><ul>{sidebar_links}</ul></div>\n'
        "</div>\n"
        f'<footer><a href="/terms">Terms</a> <a href="/privacy">Privacy</a> (c) example</footer>\n'
        "</body></html>\n"
    )


def make_layout_payload(i: int, seed: int = 42, n_pages: int | None = None) -> bytes:
    """Deterministic multi-page ek-layout payload (FIXTURES.md §1.2)."""
    rng = random.Random(f"{seed}:layout:{i}")
    if n_pages is None:
        # layout rows are i % 20 == 7, so cycle on i // 20 to hit all counts
        n_pages = PAGE_COUNT_CYCLE[(i // 20) % len(PAGE_COUNT_CYCLE)]
    pages = []
    for p in range(n_pages):
        runs = []
        y = 720.0
        for line in range(rng.randint(4, 9)):
            text_parts = [_sentence(rng, rng.randint(2, 5)) for _ in range(rng.randint(1, 3))]
            x = 72.0
            # emit runs out of x-order to exercise the sort
            order = list(range(len(text_parts)))
            rng.shuffle(order)
            xs = [x + k * 150.0 for k in range(len(text_parts))]
            for k in order:
                runs.append({"x": xs[k], "y": y + (0.5 if k % 2 else 0.0),
                             "text": text_parts[k]})
            y -= 18.0
        pages.append({"runs": runs})
    return json.dumps({"kind": "ek-layout", "pages": pages}, sort_keys=True).encode("utf-8")


def make_docx_payload(i: int, seed: int = 42) -> bytes:
    """Minimal deterministic DOCX with heading, bold/italic runs, a list,
    and an OMML equation (exercises the math preprocess)."""
    rng = random.Random(f"{seed}:docx:{i}")
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    m = "http://schemas.openxmlformats.org/officeDocument/2006/math"

    def p(inner: str, style: str = "") -> str:
        ppr = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
        return f"<w:p>{ppr}{inner}</w:p>"

    def r(text: str, bold: bool = False, italic: bool = False) -> str:
        rpr = ""
        if bold or italic:
            rpr = "<w:rPr>" + ("<w:b/>" if bold else "") + ("<w:i/>" if italic else "") + "</w:rPr>"
        return f'<w:r>{rpr}<w:t xml:space="preserve">{text}</w:t></w:r>'

    omml = (
        f'<m:oMathPara><m:oMath><m:f><m:num><m:r><m:t>{1 + i % 5}</m:t></m:r></m:num>'
        "<m:den><m:r><m:t>2</m:t></m:r></m:den></m:f></m:oMath></m:oMathPara>"
    )
    list_items = "".join(
        f"<w:p><w:pPr><w:numPr/></w:pPr>{r(_sentence(rng, 5))}</w:p>" for _ in range(2)
    )
    body = (
        p(r(f"Docx Doc {i}"), "Heading1")
        + p(r(_paragraph(rng)))
        + p(r("bold lead ", bold=True) + r("and italic tail", italic=True))
        + list_items
        + omml
        + p(r(_paragraph(rng)))
    )
    document = (
        f'<w:document xmlns:w="{w}" xmlns:m="{m}"><w:body>{body}</w:body></w:document>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/></Types>',
        )
        # "word/" + "document.xml" markers inside the first KB drive the
        # office disambiguator (file-detector.ts:112-121)
        zf.writestr("word/document.xml", '<?xml version="1.0"?>' + document)
    return buf.getvalue()


def _corruption_payload(i: int, seed: int) -> bytes:
    mode = (i // 50) % 3
    if mode == 0:
        return b""
    if mode == 1:
        return b"<html><body><p>bad bytes \xff\xfe\x9c here</p></body></html>"
    return b"<html><body><h1>Truncated page " + str(i).encode() + b"</h1><p>unclosed <b>tag"


def row_payload(i: int, seed: int = 42, include_skew: bool = False) -> bytes:
    """The payload for corpus row ``i`` (stable across corpus sizes)."""
    if i % 50 == 41:  # ~2% corruption, cycling empty/bad-utf8/truncated
        return _corruption_payload(i, seed)
    if i % 20 == 7:  # ~5% layout payloads
        if include_skew and i % 400 == 107:
            return make_layout_payload(i, seed, n_pages=500)  # skew outlier
        return make_layout_payload(i, seed)
    if i % 33 == 11:  # ~3% docx
        return make_docx_payload(i, seed)
    repeat = 1
    if include_skew and i % 97 == 13:  # ~1% giant html rows
        repeat = 100 + (i % 5) * 100
    return make_html_page(i, seed, repeat_body=repeat).encode("utf-8")


def make_pages_table(n: int, seed: int = 42, include_skew: bool = False) -> pa.Table:
    """Deterministic pages table with the BASELINE input_hint schema."""
    return make_pages_table_range(0, n, seed=seed, include_skew=include_skew)


def write_pages_parquet(path: str, n: int, seed: int = 42, include_skew: bool = False,
                        rows_per_file: int = 5_000) -> None:
    """Write the corpus as a directory of parquet files (so reads
    parallelize across blocks)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    part = 0
    for start in range(0, n, rows_per_file):
        stop = min(start + rows_per_file, n)
        tbl = make_pages_table_range(start, stop, seed=seed, include_skew=include_skew)
        pq.write_table(tbl, os.path.join(path, f"pages-{part:05d}.parquet"))
        part += 1


def make_pages_table_range(start: int, stop: int, seed: int = 42,
                           include_skew: bool = False) -> pa.Table:
    """Rows [start, stop) of the corpus — identical bytes to the same rows
    of a full ``make_pages_table(n >= stop)`` (per-row seeding)."""
    urls, ts, htmls, texts, langs = [], [], [], [], []
    for i in range(start, stop):
        domain = DOMAINS[i % len(DOMAINS)]
        urls.append(f"https://{domain}/page/item-{i:06d}")
        ts.append(_EPOCH_US + i * 17_000_000)
        htmls.append(row_payload(i, seed, include_skew))
        texts.append("")
        langs.append(LANGS[i % len(LANGS)])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


# ---------------------------------------------------------------------------
# planted ground truth (oracle side)
# ---------------------------------------------------------------------------


def expected_layout_text(i: int, seed: int = 42, n_pages: int | None = None) -> str:
    """The text a layout payload is CONSTRUCTED to assemble to: the
    generator emits each line's parts shuffled in x, so the merge must
    restore part order within the line (space-joined), lines in y order
    (newline-joined), pages double-newline-joined.  Generator knowledge,
    not a re-run of the merge — replays the same rng draws as
    :func:`make_layout_payload`."""
    rng = random.Random(f"{seed}:layout:{i}")
    if n_pages is None:
        n_pages = PAGE_COUNT_CYCLE[(i // 20) % len(PAGE_COUNT_CYCLE)]
    pages = []
    for _ in range(n_pages):
        lines = []
        for _line in range(rng.randint(4, 9)):
            text_parts = [_sentence(rng, rng.randint(2, 5)) for _ in range(rng.randint(1, 3))]
            order = list(range(len(text_parts)))
            rng.shuffle(order)  # replay the same draw; intended order is 0..k
            lines.append(" ".join(text_parts))
        pages.append("\n".join(lines))
    return "\n\n".join(pages)


def expected_html_title(i: int, seed: int = 42) -> str:
    """The planted <title>/<h1> of HTML row ``i`` (same first rng draws
    as :func:`make_html_page`)."""
    rng = random.Random(f"{seed}:html:{i}")
    return f"Article {i}: {_sentence(rng, 4)[:-1]}"


def expected_meta_table(n: int, seed: int = 42) -> pa.Table:
    """Ground-truth table for the fixture corpus — PLANTED values only
    (row routing, validity, titles, layout page counts and assembled
    text), computed from the generator's own parameters WITHOUT running
    any extraction.  Backs the DuckDB oracles of the fixture-based
    queries (driver.py flagship_fixture / layout_fanout /
    domain_lineage).

    The validity/doc_kind columns encode the extraction CONTRACT per
    planted row class (e.g. an empty payload is failure-as-data with
    doc_kind='empty'; a truncated-tag HTML page still parses, processor
    leniency per processor.ts:115-131)."""
    urls, domains, kinds, valids, titles = [], [], [], [], []
    fan_valid, fan_pages, fan_text = [], [], []
    for i in range(n):
        domain = DOMAINS[i % len(DOMAINS)]
        urls.append(f"https://{domain}/page/item-{i:06d}")
        domains.append(domain)
        if i % 50 == 41:
            mode = (i // 50) % 3
            if mode == 0:
                kinds.append("empty")
                valids.append(False)
                titles.append("")
            elif mode == 1:
                kinds.append("html")
                valids.append(False)
                titles.append("")
            else:  # truncated tags: lenient HTML parse succeeds
                kinds.append("html")
                valids.append(True)
                titles.append(f"Truncated page {i}")
            fan_valid.append(False)
            fan_pages.append(0)
            fan_text.append("")
        elif i % 20 == 7:
            kinds.append("layout")
            valids.append(True)
            titles.append("")
            fan_valid.append(True)
            fan_pages.append(PAGE_COUNT_CYCLE[(i // 20) % len(PAGE_COUNT_CYCLE)])
            fan_text.append(expected_layout_text(i, seed))
        elif i % 33 == 11:
            kinds.append("docx")
            valids.append(True)
            titles.append(f"Docx Doc {i}")
            fan_valid.append(False)
            fan_pages.append(0)
            fan_text.append("")
        else:
            kinds.append("html")
            valids.append(True)
            titles.append(expected_html_title(i, seed))
            fan_valid.append(False)
            fan_pages.append(0)
            fan_text.append("")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "domain": pa.array(domains, pa.string()),
            "doc_kind": pa.array(kinds, pa.string()),
            "valid": pa.array(valids, pa.bool_()),
            "title": pa.array(titles, pa.string()),
            "fanout_valid": pa.array(fan_valid, pa.bool_()),
            "fanout_n_pages": pa.array(fan_pages, pa.int64()),
            "fanout_text": pa.array(fan_text, pa.string()),
        }
    )


def expected_meta_path(path: str, n: int, seed: int = 42) -> str:
    """Deterministic parquet path for the ground-truth table — pure
    string math, no I/O, so callers can embed it in SQL at import time
    and defer the actual write to first oracle use."""
    import os

    return os.path.join(path, f"fixture-meta-{n}-{seed}.parquet")


def write_expected_meta(path: str, n: int, seed: int = 42) -> str:
    """Write the ground-truth table to parquet (atomic rename) and
    return the file path — the driver's fixture oracles read it with
    DuckDB's read_parquet."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    final = expected_meta_path(path, n, seed)
    if not os.path.exists(final):
        tmp = final + f".tmp{os.getpid()}"
        pq.write_table(expected_meta_table(n, seed), tmp)
        os.replace(tmp, final)
    return final


# ---------------------------------------------------------------------------
# driver-testdata bridge: synthesize pages FROM the documents table
# ---------------------------------------------------------------------------


def pages_batch_from_documents(batch: pa.Table) -> pa.Table:
    """Wrap driver ``documents`` rows (doc_id, text, lang, source, n_chars)
    into deterministic HTML pages with boilerplate, so extraction pipelines
    can run over driver-provided inputs without external data."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()
    urls, ts, htmls, out_texts = [], [], [], []
    for doc_id, text, source in zip(doc_ids, texts, sources):
        text = text or ""
        paras = "\n".join(
            f"<p>{p}</p>" for p in text.split("\n") if p.strip()
        ) or f"<p>{text}</p>"
        html = (
            f"<html><head><title>Document {doc_id}</title></head><body>"
            f'<nav><a href="/a">A</a> <a href="/b">B</a> <a href="/c">C</a></nav>'
            f"<article><h1>Document {doc_id}</h1>{paras}</article>"
            f'<footer><a href="/t">T</a></footer></body></html>'
        )
        urls.append(f"https://{source or 'src'}.example/doc/{doc_id}")
        ts.append(_EPOCH_US + int(doc_id) * 17_000_000)
        htmls.append(html.encode("utf-8"))
        out_texts.append("")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_texts, pa.large_string()),
            "lang": pa.array([l or "" for l in langs], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
