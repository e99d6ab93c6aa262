"""PDF/layout fan-out stages: the skew-handling showcase (SURVEY.md §4.1).

A giant multi-page document must not dominate one task, so the layout
path explodes 1 doc -> N page rows (the reference's per-page Ghostscript
render, file-processor.ts:52-72, re-expressed as rows), parses pages
independently, then reassembles with ``groupby("url").map_groups`` —
within-group sort by page_no only, never a global sort (SURVEY.md O1).

Partitioning assumption: reassembly shuffles on ``url``; group size is
bounded by pages-per-doc, so no group exceeds a worker's memory even for
the 500-page skew outlier.  Span offsets are prefix sums computed inside
the group after the page sort (SURVEY.md §7.4 hard-part 3).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions import detect
from ..functions.pdf_layout import assemble_document, assemble_page_text

PAGE_ROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("page_no", pa.int32()),
        ("n_pages", pa.int32()),
        ("page_runs", pa.string()),  # JSON runs for one page
    ]
)


def fanout_layout_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> page rows (1 doc -> N rows). Handles ek-layout
    JSON AND real binary PDFs (functions/pdf_text.py); other payloads
    and malformed documents fan out to a single error-marked page row
    (page_no=-1) so failure stays data."""
    from ..functions.pdf_text import pdf_to_layout_pages

    urls = batch["url"].to_pylist()
    ts = batch["warc_ts"].to_pylist()
    langs = batch["lang"].to_pylist()
    payloads = batch["html"].to_pylist()
    out = {n: [] for n in PAGE_ROW_SCHEMA.names}

    def emit(url, t, lang, page_no, n_pages, runs_json):
        out["url"].append(url)
        out["warc_ts"].append(t)
        out["lang"].append(lang)
        out["page_no"].append(page_no)
        out["n_pages"].append(n_pages)
        out["page_runs"].append(runs_json)

    for url, t, lang, payload in zip(urls, ts, langs, payloads):
        payload = payload or b""
        kind = detect.detect_doc_kind(payload)
        if kind == detect.KIND_PDF:
            try:
                pages = pdf_to_layout_pages(payload)
            except (ValueError, UnicodeDecodeError):
                emit(url, t, lang, -1, 0, "")
                continue
            for i, page in enumerate(pages):
                runs = page.get("runs", []) if isinstance(page, dict) else []
                emit(url, t, lang, i + 1, len(pages),
                     json.dumps(runs, sort_keys=True))
            continue
        if kind != detect.KIND_LAYOUT:
            emit(url, t, lang, -1, 0, "")
            continue
        try:
            doc = json.loads(payload.decode("utf-8"))
            pages = doc["pages"]
        except Exception:
            emit(url, t, lang, -1, 0, "")
            continue
        # totality: a pages value that is not a non-empty list must still
        # produce a row (empty list -> doc silently absent; str/dict ->
        # bogus fabricated pages), mirroring parse_layout_payload's
        # validation so failure stays data end-to-end
        if not isinstance(pages, list) or not pages:
            emit(url, t, lang, -1, 0, "")
            continue
        for i, page in enumerate(pages):
            runs = page.get("runs", []) if isinstance(page, dict) else []
            emit(url, t, lang, i + 1, len(pages), json.dumps(runs, sort_keys=True))
    return pa.table(out, schema=PAGE_ROW_SCHEMA)


def parse_page_batch(batch: pa.Table) -> pa.Table:
    """Per-page text assembly (x/y line merge) — narrow, embarrassingly
    parallel; the heavy compute happens here, pre-shuffle."""
    texts = []
    for runs_json, page_no in zip(batch["page_runs"].to_pylist(), batch["page_no"].to_pylist()):
        if page_no < 0 or not runs_json:
            texts.append("")
            continue
        try:
            texts.append(assemble_page_text(json.loads(runs_json)))
        except Exception:
            texts.append("")
    return batch.drop_columns(["page_runs"]).append_column(
        "page_text", pa.array(texts, pa.large_string())
    )


def assemble_group(group: "pd.DataFrame") -> "pd.DataFrame":  # noqa: F821
    """Single-url reassembly (kept as the reference implementation for
    tests; the pipeline uses the bucketed :func:`assemble_bucket`)."""
    import pandas as pd

    url = group["url"].iloc[0]
    warc_ts = group["warc_ts"].iloc[0]
    lang = group["lang"].iloc[0]
    ok = group[group["page_no"] > 0]
    if len(ok) == 0:
        return pd.DataFrame(
            {
                "url": [url], "warc_ts": [warc_ts], "lang": [lang],
                "n_pages": [0], "text": [""], "valid": [False],
                "errors": [["not a parseable layout payload"]],
            }
        )
    pairs = list(zip(ok["page_no"].tolist(), ok["page_text"].tolist()))
    text, _offsets = assemble_document(pairs)
    return pd.DataFrame(
        {
            "url": [url], "warc_ts": [warc_ts], "lang": [lang],
            "n_pages": [len(pairs)], "text": [text], "valid": [True],
            "errors": [[]],
        }
    )


def assemble_bucket(df: "pd.DataFrame") -> "pd.DataFrame":  # noqa: F821
    """Bucket-level vectorized reassembly: one pandas groupby over ALL
    urls in the bucket instead of one Ray map_groups invocation per
    document.

    At 10^9 documents, per-group Python overhead (one DataFrame build +
    one function call per doc) dominated the round-1 reassembly; with
    url-hash buckets the per-group cost is paid once per BUCKET and the
    per-url work is pandas' C-level groupby join."""
    import pandas as pd

    df = df.sort_values(["url", "page_no"], kind="mergesort")
    first = df.drop_duplicates("url", keep="first").set_index("url")
    ok = df[df["page_no"] > 0]
    texts = ok.groupby("url", sort=False)["page_text"].agg("\n\n".join)
    counts = ok.groupby("url", sort=False)["page_no"].size()
    urls = first.index
    text_s = texts.reindex(urls).fillna("")
    n_pages = counts.reindex(urls).fillna(0).astype("int64")
    valid = urls.isin(texts.index)
    return pd.DataFrame(
        {
            "url": urls.to_numpy(),
            "warc_ts": first["warc_ts"].to_numpy(),
            "lang": first["lang"].to_numpy(),
            "n_pages": n_pages.to_numpy(),
            "text": text_s.to_numpy(),
            "valid": valid,
            "errors": [
                [] if v else ["not a parseable layout payload"] for v in valid
            ],
        }
    )


DEFAULT_REASSEMBLY_BUCKETS = 64


def _add_url_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    from ..functions.hashing import hash64

    buckets = [hash64(u, seed=11) % n_buckets for u in batch["url"].to_pylist()]
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))


def extract_layout_fanout(ds, *, batch_size: int = 128,
                          num_buckets: int = DEFAULT_REASSEMBLY_BUCKETS):
    """Full fan-out pipeline over a pages Dataset: flat-map to page rows
    -> parse pages -> bucketed groupby reassembly.

    Partitioning: the shuffle keys on hash(url) % num_buckets, so a
    bucket holds ~corpus/num_buckets pages — size num_buckets so that
    fits a worker heap (it bounds reassembly memory the same way the
    old per-url grouping did, while cutting per-group Python overhead
    by the mean docs-per-bucket factor)."""
    pages = ds.map_batches(fanout_layout_batch, batch_format="pyarrow", batch_size=batch_size)
    parsed = pages.map_batches(parse_page_batch, batch_format="pyarrow", batch_size=batch_size)
    bucketed = parsed.map_batches(
        _add_url_bucket, fn_kwargs={"n_buckets": num_buckets},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = bucketed.groupby("bucket").map_groups(assemble_bucket, batch_format="pandas")
    return out
