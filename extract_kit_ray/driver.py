"""Driver-contract query implementations (SURVEY.md §5.2 item 4).

Each ``q_*`` function takes an ``sf_dir`` ("/root/testdata/sf0.01") and
returns a Dataset / pandas DataFrame / pyarrow Table.  The matching
DuckDB oracle SQL lives in ``ORACLE_SQL``; column names are aligned on
both sides because the driver's compare hashes values per column name.

Exactness discipline for SQL-checked aggregates: every aggregated
measure is integerized per row FIRST (cents / counts), so sums are exact
int64 arithmetic on both engines — no float-summation-order drift can
break the value-hash compare.

Ray is assumed initialised by the caller (driver or bench harness);
nothing here calls ``ray.init``.
"""

from __future__ import annotations

import html as _html
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Sum

from .ops.dedup import add_simhash, add_text_hash, exact_dedup, minhash_lsh_dedup
from .ops.multimodal import extract_media_features, make_media_table
from .ops.similarity import brute_force_topk, embedding_near_dups, lsh_topk
from .ops.textops import LangIdStage, fingerprint_batch, quality_batch, token_count_batch
from .pipelines.lineage import lineage_rollup
from .stages.extract_stage import HtmlExtractor

# ---------------------------------------------------------------------------
# documents table -> pages-shaped wrap (the input_hint table synthesised from
# driver testdata so the extraction path is exercised over driver inputs)
# ---------------------------------------------------------------------------

_DOC_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z


def cents(values, *, scale: int = 100):
    """Exactly-N-decimal float measure -> exact int64 cents, with the
    precondition ENFORCED.

    All SQL-checked aggregates integerize per row before summing so
    int64 arithmetic is engine-exact.  That discipline silently relies
    on measures being exactly 2-decimal: a 3-decimal value lands between
    cents, where the engine's half-to-even rounding and DuckDB's
    half-away-from-zero diverge.  This helper asserts the precondition
    (rounded value within epsilon of value*scale) so a non-conforming
    measure fails loudly instead of hash-mismatching downstream.

    Accepts a pyarrow Array/ChunkedArray (returns pa.int64 array) or
    any numpy-coercible sequence (returns np.int64 array).
    """
    is_arrow = isinstance(values, (pa.Array, pa.ChunkedArray))
    x = np.asarray(values, dtype=np.float64)
    scaled = x * float(scale)
    rounded = np.rint(scaled)
    if not np.allclose(scaled, rounded, rtol=1e-9, atol=1e-6):
        worst = float(np.max(np.abs(scaled - rounded)))
        raise ValueError(
            f"cents(scale={scale}): input is not exactly "
            f"{len(str(scale)) - 1}-decimal (max deviation {worst:.3g}); "
            "round-half-mode divergence between engines would be silent"
        )
    out = rounded.astype(np.int64)
    return pa.array(out, pa.int64()) if is_arrow else out


def _pool() -> dict:
    """Deadlock-proof actor-pool kwargs: AUTOSCALING concurrency
    ``(1, max)`` with half-CPU reservation.

    The tuple matters twice: (a) the read / groupby task pools always
    keep schedulable cores, even under a 4-CPU test session (full-CPU
    actors sized to the whole cluster starve the task pools and hang
    the streaming executor); (b) actor STARTUP is the dominant cost for
    small inputs — a fixed pool of 16 pays ~16 interpreter spin-ups
    before the first batch, which tripled several bench queries in
    round 2 (structured_extract 19.3s -> 3.8s with autoscaling).  Ray
    scales the pool toward max only while batches queue, so the 100 TB
    run still saturates the cluster."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return {"concurrency": (1, max(2, min(cpus - 2, 16))), "num_cpus": 0.5}


def _fixed_concurrency() -> int:
    """Fixed pool size for COMPUTE-HEAVY actor stages (MinHasher, ANN
    scorers): their wall time is dominated by per-batch work, so the
    autoscaler's slow ramp from 1 actor costs more than paying full
    spin-up up-front (the same trade the flagship stage makes —
    pipelines/flagship._default_concurrency)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(cpus - 2, 16))


def _wrap_docs_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text, lang, ...) -> (url, warc_ts, html, lang) pages rows.

    The wrap is deterministic and 1:1 (doc_id recoverable from url), and
    the HTML is a plain article page, so the extractor's whitespace
    normalisation is the ONLY transform — giving the SQL oracle
    ``regexp_replace(trim(text), '\\s+', ' ', 'g') || chr(10)``.
    """
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    urls = [f"https://docs.example/{i}" for i in ids]
    ts = [_DOC_EPOCH_US + int(i) for i in ids]
    htmls = [
        (
            "<html><head><title>Doc {i}</title></head><body><article>{body}"
            "</article></body></html>"
        ).format(i=i, body=_html.escape(t or "")).encode("utf-8")
        for i, t in zip(ids, texts)
    ]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def docs_as_pages(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ds.map_batches(_wrap_docs_batch, batch_format="pyarrow", zero_copy_batch=True)


def _doc_id_from_url(batch: pa.Table) -> pa.Table:
    ids = [int(u.rsplit("/", 1)[1]) for u in batch["url"].to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pc.cast(batch["text"], pa.string()),
        }
    )


def q_extract_html_roundtrip(sf_dir: str) -> "ray.data.Dataset":
    """Flagship HTML extraction over driver docs wrapped as pages.

    The per-url byte-identity invariant, SQL-checkable: extracted text ==
    whitespace-collapsed source text + trailing newline.
    """
    pages = docs_as_pages(sf_dir)
    extracted = pages.map_batches(
        HtmlExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,
        **_pool(),
    )
    return extracted.map_batches(_doc_id_from_url, batch_format="pyarrow")


_DOCX_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_DOCX_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_DOCX_NUMBERING = (
    f'<?xml version="1.0"?><w:numbering xmlns:w="{_DOCX_W}">'
    '<w:abstractNum w:abstractNumId="0">'
    '<w:lvl w:ilvl="0"><w:numFmt w:val="bullet"/></w:lvl></w:abstractNum>'
    '<w:num w:numId="10"><w:abstractNumId w:val="0"/></w:num></w:numbering>'
)


def q_lineage_by_domain(sf_dir: str) -> pd.DataFrame:
    """The flagship's per-domain lineage rollup (G1/G-new) with a full
    SQL oracle: driver docs wrapped as pages spread over 10 domains
    (doc_id % 10), extracted, map-side-combined, grouped — doc counts,
    valid counts and output byte sums all reconstruct exactly
    (n_bytes_out = octet_length of the whitespace-collapsed text +
    newline)."""
    from .pipelines.lineage import lineage_rollup

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def wrap(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        urls = [f"https://s{int(i) % 10}.example/{i}" for i in ids]
        ts = [_DOC_EPOCH_US + int(i) for i in ids]
        htmls = [
            (
                "<html><head><title>Doc {i}</title></head><body><article>{body}"
                "</article></body></html>"
            ).format(i=i, body=_html.escape(t or "")).encode("utf-8")
            for i, t in zip(ids, texts)
        ]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "lang": pa.array(batch["lang"].to_pylist(), pa.string()),
            }
        )

    pages = ds.map_batches(wrap, batch_format="pyarrow", zero_copy_batch=True)
    extracted = pages.map_batches(
        HtmlExtractor, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64, **_pool(),
    )
    tbl = lineage_rollup(extracted)
    df = tbl.select(["domain", "n_docs", "n_valid", "n_bytes_out"]).to_pandas()
    return df.sort_values("domain").reset_index(drop=True)


def _wrap_docs_as_docx(batch: pa.Table) -> pa.Table:
    """documents rows -> DOCX payloads exercising the zip preprocess +
    document.xml -> HTML -> markdown chain (SURVEY.md S9, M7-M9,
    M12-M13) on driver data — including numbering.xml-resolved bulleted
    lists and a rels-resolved hyperlink, so the parity features carry
    the byte-identity oracle too."""
    import io
    import zipfile

    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    urls = [f"https://docs.example/{i}.docx" for i in ids]
    ts = [_DOC_EPOCH_US + int(i) for i in ids]
    payloads = []
    for i, t in zip(ids, texts):
        list_items = "".join(
            '<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="10"/>'
            f"</w:numPr></w:pPr><w:r><w:t>{item}</w:t></w:r></w:p>"
            for item in ("alpha", "beta")
        )
        doc = (
            '<?xml version="1.0"?>\n<w:document '
            f'xmlns:w="{_DOCX_W}" xmlns:r="{_DOCX_R}">'
            f"<w:body><w:p><w:r><w:t>{_html.escape(t or '')}</w:t></w:r></w:p>"
            f"{list_items}"
            '<w:p><w:hyperlink r:id="rId1"><w:r><w:t>more</w:t></w:r>'
            "</w:hyperlink></w:p>"
            "</w:body></w:document>"
        )
        rels = (
            '<?xml version="1.0"?><Relationships xmlns='
            '"http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://x/hyperlink" '
            f'Target="https://docs.example/{int(i)}" TargetMode="External"/>'
            "</Relationships>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("[Content_Types].xml", '<?xml version="1.0"?><Types/>')
            z.writestr("word/document.xml", doc)
            z.writestr("word/numbering.xml", _DOCX_NUMBERING)
            z.writestr("word/_rels/document.xml.rels", rels)
        payloads.append(buf.getvalue())
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "lang": pa.array(["unknown"] * len(ids), pa.string()),
        }
    )


def q_extract_docx_roundtrip(sf_dir: str) -> "ray.data.Dataset":
    """DOCX-path byte-identity, SQL-checkable with the same
    whitespace-collapse oracle as the HTML roundtrip."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pages = ds.map_batches(_wrap_docs_as_docx, batch_format="pyarrow",
                           zero_copy_batch=True)
    extracted = pages.map_batches(
        HtmlExtractor, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64, **_pool(),
    )

    def project(batch: pa.Table) -> pa.Table:
        ids = [int(u.rsplit("/", 1)[1].split(".")[0]) for u in batch["url"].to_pylist()]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "text": pc.cast(batch["text"], pa.string())}
        )

    return extracted.map_batches(project, batch_format="pyarrow")


_LAYOUT_WORDS_PER_PAGE = 40


def _wrap_docs_as_layout(batch: pa.Table) -> pa.Table:
    """documents rows -> multi-page ek-layout payloads (40 words/page,
    one run per word), so the FAN-OUT path (1 doc -> N page rows ->
    groupby(url) reassembly) gets an exact SQL oracle."""
    import json

    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    urls = [f"https://docs.example/{i}.layout" for i in ids]
    ts = [_DOC_EPOCH_US + int(i) for i in ids]
    payloads = []
    for t in texts:
        words = (t or "").split()
        pages = []
        for s in range(0, max(len(words), 1), _LAYOUT_WORDS_PER_PAGE):
            chunk = words[s : s + _LAYOUT_WORDS_PER_PAGE]
            runs = [
                {"text": w, "x": 72.0 + 40.0 * j, "y": 720.0}
                for j, w in enumerate(chunk)
            ]
            pages.append({"runs": runs})
        payloads.append(
            json.dumps({"kind": "ek-layout", "pages": pages}).encode("utf-8")
        )
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "lang": pa.array(["unknown"] * len(ids), pa.string()),
        }
    )


def q_layout_fanout_roundtrip(sf_dir: str) -> "ray.data.Dataset":
    """The skew-handling showcase with a byte-identity oracle: documents
    chunked into 40-word layout pages -> flat-map page rows -> per-page
    parse -> groupby(url).map_groups reassembly; reassembled text and
    page counts are SQL-reconstructable."""
    from .stages.pdf_stage import extract_layout_fanout

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pages = ds.map_batches(_wrap_docs_as_layout, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = extract_layout_fanout(pages)

    def project(batch: pa.Table) -> pa.Table:
        ids = [int(u.rsplit("/", 1)[1].split(".")[0]) for u in batch["url"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pc.cast(batch["text"], pa.string()),
                "n_pages": pc.cast(batch["n_pages"], pa.int64()),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


def _wrap_docs_as_pdf(batch: pa.Table) -> pa.Table:
    """documents rows -> REAL binary PDFs (40 words/page, one Tj run per
    word, same geometry as the ek-layout wrap) — doc_id % 3 == 0 rows
    become Type0/CID-font PDFs whose hex strings only decode through
    the embedded /ToUnicode CMap (the Word/LaTeX subset-font shape);
    doc_id % 5 == 4 rows become PDF 1.5 object-stream files whose
    page tree lives inside a compressed /ObjStm (the modern-writer
    layout); of the rest, even doc_ids get FlateDecode-compressed
    content streams and odd ones raw — four decode paths, one
    byte-identity oracle."""
    from .functions.pdf_text import make_cid_pdf, make_objstm_pdf, make_pdf

    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    urls = [f"https://docs.example/{i}.pdf" for i in ids]
    ts = [_DOC_EPOCH_US + int(i) for i in ids]
    payloads = []
    for i, t in zip(ids, texts):
        words = (t or "").split()
        pages = []
        for s in range(0, max(len(words), 1), _LAYOUT_WORDS_PER_PAGE):
            chunk = words[s : s + _LAYOUT_WORDS_PER_PAGE]
            pages.append(
                [(w, 72.0 + 40.0 * j, 720.0) for j, w in enumerate(chunk)]
            )
        if int(i) % 3 == 0:
            payloads.append(make_cid_pdf(pages, compress=(int(i) % 2 == 0)))
        elif int(i) % 5 == 4:
            payloads.append(make_objstm_pdf(pages, compress=(int(i) % 2 == 0)))
        else:
            payloads.append(make_pdf(pages, compress=(int(i) % 2 == 0)))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "lang": pa.array(["unknown"] * len(ids), pa.string()),
        }
    )


def q_extract_pdf_roundtrip(sf_dir: str) -> "ray.data.Dataset":
    """REAL-PDF byte-identity roundtrip: documents wrapped as binary
    PDFs (catalog/page tree/Flate streams/Tj runs), parsed by the
    engine's own PDF parser through the skew-defusing page fan-out, and
    checked against the same whitespace-exact SQL oracle as the
    ek-layout roundtrip."""
    from .stages.pdf_stage import extract_layout_fanout

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pages = ds.map_batches(_wrap_docs_as_pdf, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = extract_layout_fanout(pages)

    def project(batch: pa.Table) -> pa.Table:
        ids = [int(u.rsplit("/", 1)[1].split(".")[0]) for u in batch["url"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pc.cast(batch["text"], pa.string()),
                "n_pages": pc.cast(batch["n_pages"], pa.int64()),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# dedup / text analysis over documents
# ---------------------------------------------------------------------------


def q_exact_dedup_docs(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    kept = exact_dedup(ds, text_col="text", key_col="doc_id")
    return kept.select_columns(["doc_id", "lang", "source", "n_chars"])


def q_unique_docs(sf_dir: str) -> "ray.data.Dataset":
    """Anti-join: docs whose text occurs exactly once corpus-wide.  The
    duplicate-hash set comes from a narrow (hash, count) aggregate and is
    broadcast into a filter — the anti-join never shuffles full rows."""
    from ray.data.aggregate import Count as _Count

    from .ops.dedup import add_text_hash as _ath

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    hashed = ds.map_batches(_ath, batch_format="pyarrow", zero_copy_batch=True)
    counts = (
        hashed.select_columns(["text_hash", "text_hash2"])
        .groupby(["text_hash", "text_hash2"]).aggregate(_Count(alias_name="n"))
    )
    dups_df = counts.filter(expr="n > 1").to_pandas()
    # an all-filtered Dataset surfaces as a 0-column frame — no dups
    dup_hashes = (
        frozenset(zip(dups_df["text_hash"], dups_df["text_hash2"]))
        if "text_hash" in dups_df.columns else frozenset()
    )
    if not dup_hashes:
        return hashed.drop_columns(["text_hash", "text_hash2"]).select_columns(
            ["doc_id", "lang", "source", "n_chars"]
        )

    def keep_unique(batch: pa.Table) -> pa.Table:
        mask = pa.array(
            [(a, b) not in dup_hashes for a, b in
             zip(batch["text_hash"].to_pylist(), batch["text_hash2"].to_pylist())]
        )
        return batch.filter(mask).drop_columns(["text_hash", "text_hash2"])

    return hashed.map_batches(
        keep_unique, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "lang", "source", "n_chars"])


def _plant_exact_copies(batch: pa.Table) -> pa.Table:
    """Append an EXACT copy of every 10th doc under doc_id + _PLANT_OFFSET
    (SimHash Hamming distance 0 with the source, deterministically)."""
    ids = batch["doc_id"].to_numpy()
    sel = batch.select(["doc_id", "text"]).filter(pa.array(ids % 10 == 0))
    planted = sel.set_column(
        sel.schema.get_field_index("doc_id"), "doc_id",
        pc.add(sel["doc_id"], _PLANT_OFFSET),
    )
    return pa.concat_tables([batch.select(["doc_id", "text"]), planted])


def q_simhash_dups(sf_dir: str) -> pd.DataFrame:
    """SimHash as exact-dup candidate generator with a text-equality
    arbiter: banding -> hot-bucket prefilter -> in-bucket Hamming
    check -> keep Hamming-0 pairs whose TEXTS match.  (Hamming 0 alone
    is not SQL-reconstructable — one-word-edit docs genuinely collide
    at distance 0, which is the point of SimHash — so, like minhash's
    exact-Jaccard arbiter, the final check is exact and the oracle is
    the identical-text self-join.)  The driver-side text lookup here is
    corpus-bounded; the scale path joins texts onto pair endpoints like
    minhash_lsh_dedup_distributed."""
    from .ops.dedup import simhash_candidates

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    augmented = ds.map_batches(_plant_exact_copies, batch_format="pyarrow",
                               zero_copy_batch=True)
    pairs = simhash_candidates(augmented, max_hamming=3).to_pandas()
    cand = pairs[pairs["hamming"] == 0][["key_a", "key_b"]].drop_duplicates()
    base = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(base["doc_id"].to_pylist(), base["text"].to_pylist()))
    for i, t in list(texts.items()):
        if i % 10 == 0:
            texts[i + _PLANT_OFFSET] = t
    keep = [
        (int(a), int(b)) for a, b in zip(cand["key_a"], cand["key_b"])
        if texts.get(int(a)) == texts.get(int(b))
    ]
    out = pd.DataFrame(keep, columns=["key_a", "key_b"])
    return (
        out.sort_values(["key_a", "key_b"]).reset_index(drop=True).astype("int64")
    )


def q_bloom_cross_run_dups(sf_dir: str) -> pd.DataFrame:
    """Cross-RUN incremental dedup via a Bloom membership sketch
    (ops/sketches.py): docs split at the median doc_id into a
    'previous run' and a 'new run' (plus planted copies of every 25th
    old doc under shifted ids); a Bloom filter of the old run's content
    hashes (16 bits/key, k=8 — fixed-size state, the point at 100 TB)
    prefilters the new run with NO false negatives, and exact hash
    membership arbitrates the sketch's false positives, so the output
    is exactly the true cross-run duplicates (SQL: text join across
    the halves).  The exact-set collect here is test-scale; the scale
    path joins bloom-positive candidates against the old table."""
    from .ops.dedup import add_text_hash as _ath
    from .ops.sketches import BLOOM_BITS_PER_KEY, bloom_build_ds, bloom_probe

    import pyarrow.parquet as _pq

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    split = n_docs // 2

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    old = ds.filter(expr=f"doc_id < {split}")

    def make_new(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        newer = batch.filter(pa.array(ids >= split))
        planted_src = batch.filter(pa.array((ids < split) & (ids % 25 == 0)))
        planted = planted_src.set_column(
            planted_src.schema.get_field_index("doc_id"), "doc_id",
            pc.add(planted_src["doc_id"], _PLANT_OFFSET),
        )
        return pa.concat_tables([newer, planted])

    new = ds.map_batches(make_new, batch_format="pyarrow", zero_copy_batch=True)

    old_hashed = old.map_batches(_ath, batch_format="pyarrow", zero_copy_batch=True)
    m_bits = max(1024, BLOOM_BITS_PER_KEY * split)
    bitmap = bloom_build_ds(old_hashed, key_col="text_hash", m_bits=m_bits)
    bitmap_ref = __import__("ray").put(bitmap)

    # exact arbiter set (128-bit pairs) for the bloom candidates
    old_pairs = old_hashed.select_columns(["text_hash", "text_hash2"]).to_pandas()
    old_set = frozenset(zip(old_pairs["text_hash"], old_pairs["text_hash2"]))
    old_set_ref = __import__("ray").put(old_set)

    class BloomProber:
        def __init__(self):
            import ray as _ray

            self.bitmap = _ray.get(bitmap_ref)
            self.old_set = _ray.get(old_set_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            hashed = _ath(batch)
            keys = hashed["text_hash"].to_numpy().astype(np.int64)
            maybe = bloom_probe(self.bitmap, keys, m_bits)
            cand = hashed.filter(pa.array(maybe))
            mask = [
                (a, b) in self.old_set for a, b in
                zip(cand["text_hash"].to_pylist(), cand["text_hash2"].to_pylist())
            ]
            return cand.filter(pa.array(mask, pa.bool_())).select(["doc_id"])

    out = new.map_batches(BloomProber, batch_format="pyarrow",
                          zero_copy_batch=True, **_pool()).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype("int64")


def q_token_counts(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens_ws"]
    )


# 40/10 so the 10-100-word driver docs genuinely produce multi-chunk
# overlapping output (100 words -> starts 0/30/60, 3 chunks)
_CHUNK_WORDS, _CHUNK_OVERLAP = 40, 10


def q_chunk_docs(sf_dir: str) -> "ray.data.Dataset":
    """Sliding-window chunking (LLM-training staple): _CHUNK_WORDS-word
    windows with _CHUNK_OVERLAP-word overlap (40/10 -> starts every 30
    words), 1 doc -> N chunk rows inside map_batches (no shuffle);
    exact SQL reconstruction via generate_series + list slicing (the
    oracle's stride/width literals derive from the same constants)."""
    from .ops.textops import chunk_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        chunk_batch,
        fn_kwargs={"chunk_words": _CHUNK_WORDS, "overlap": _CHUNK_OVERLAP},
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_long_docs(sf_dir: str) -> "ray.data.Dataset":
    """Quality-style length filter: docs with >= 60 whitespace tokens."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    counted = ds.map_batches(token_count_batch, batch_format="pyarrow")
    return (
        counted.filter(expr="n_tokens_ws >= 60")
        .select_columns(["doc_id", "n_tokens_ws"])
    )


def q_lang_rollup(sf_dir: str) -> "ray.data.Dataset":
    """Per-lang doc/char counts — partial-aggregated per batch, then a tiny
    groupby (the map-side-combine pattern from pipelines/lineage.py)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"lang": batch["lang"], "one": pa.array([1] * len(batch), pa.int64()),
                      "n_chars": batch["n_chars"]})
            .group_by("lang")
            .aggregate([("one", "sum"), ("n_chars", "sum")])
        )
        return g.rename_columns(["lang", "n_docs", "sum_chars"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars")
    )


def q_source_rollup(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"source": batch["source"],
                      "one": pa.array([1] * len(batch), pa.int64()),
                      "n_chars": batch["n_chars"]})
            .group_by("source")
            .aggregate([("one", "sum"), ("n_chars", "sum")])
        )
        return g.rename_columns(["source", "n_docs", "sum_chars"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars")
    )


def q_top_sources(sf_dir: str) -> pd.DataFrame:
    """Top-5 sources by total chars (sort + limit over the tiny rollup)."""
    rolled = q_source_rollup(sf_dir)
    top = rolled.sort(["sum_chars", "source"], descending=[True, False]).limit(5)
    return top.to_pandas()[["source", "sum_chars"]]


# ---------------------------------------------------------------------------
# TPC-H-ish relational demos (general engine coverage)
# ---------------------------------------------------------------------------


def q_lineitem_pricing_rollup(sf_dir: str) -> "ray.data.Dataset":
    """Q1-family rollup; measures integerized per row so sums are exact."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        qty = pc.cast(batch["l_quantity"], pa.int64())  # integral by construction
        price_cents = cents(batch["l_extendedprice"])
        g = (
            pa.table(
                {
                    "l_returnflag": batch["l_returnflag"],
                    "l_linestatus": batch["l_linestatus"],
                    "one": pa.array([1] * len(batch), pa.int64()),
                    "qty": qty,
                    "cents": price_cents,
                }
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("one", "sum"), ("qty", "sum"), ("cents", "sum")])
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "n_rows", "sum_qty", "sum_price_cents"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
    )


def q_events_type_rollup(sf_dir: str) -> "ray.data.Dataset":
    """Per-type event counts, distinct users, exact cent-sums.

    Distinct-user counting is the two-level groupby pattern: dedupe
    (type, user) pairs per batch, shuffle on the pair, then count per
    type — no driver-side set-building.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "value"]
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        value_cents = cents(batch["value"])
        g = (
            pa.table(
                {
                    "event_type": batch["event_type"],
                    "user_id": batch["user_id"],
                    "one": pa.array([1] * len(batch), pa.int64()),
                    "cents": value_cents,
                }
            )
            .group_by(["event_type", "user_id"])
            .aggregate([("one", "sum"), ("cents", "sum")])
        )
        return g.rename_columns(["event_type", "user_id", "n_events", "sum_value_cents"])

    per_user = (
        ds.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "user_id"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_cents", alias_name="sum_value_cents"),
        )
    )
    return per_user.groupby("event_type").aggregate(
        Sum("n_events", alias_name="n_events"),
        Count(alias_name="n_users"),
        Sum("sum_value_cents", alias_name="sum_value_cents"),
    )


def q_hll_users_per_type(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct-user count per event type (ops/sketches.py):
    constant-size mergeable register state instead of the key-wide
    shuffle the exact two-level groupby pays.  The invariant oracle
    asserts every group's estimate lands within 5% of exact (exact
    computed by the engine's own q_events_type_rollup path, itself
    value-checked vs DuckDB); splitmix64 hashing makes the estimate
    deterministic, so the boolean is stable."""
    from .ops.sketches import hll_distinct

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    est = hll_distinct(ds, group_col="event_type", key_col="user_id").to_pandas()
    exact = (
        q_events_type_rollup(sf_dir).to_pandas()[["event_type", "n_users"]]
    )
    m = est.merge(exact, on="event_type")
    m["hll_ok"] = (m["distinct_est"] / m["n_users"] - 1.0).abs() <= 0.05
    return m[["event_type", "hll_ok"]].sort_values("event_type").reset_index(drop=True)


def q_revenue_by_brand(sf_dir: str) -> "ray.data.Dataset":
    """Broadcast hash join (SURVEY.md §2.5 J-family): the small ``part``
    table is shipped to the object store ONCE via ``ray.put`` and read in
    each joiner actor's ``__init__`` — no shuffle join for a small side.
    Measures integerized per row, so sums are engine-exact."""
    import ray as _ray

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    brand_by_key = dict(zip(part["p_partkey"].to_pylist(), part["p_brand"].to_pylist()))
    brand_ref = _ray.put(brand_by_key)

    class BrandJoiner:
        def __init__(self):
            self.brand_by_key = _ray.get(brand_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            brands = [self.brand_by_key.get(k, "") for k in batch["l_partkey"].to_pylist()]
            # integerize BEFORE multiplying: price (2 decimals) -> cents,
            # discount (2 decimals) -> percent; their product is exact
            # int64 "centi-cents" — no round-half-mode ambiguity between
            # engines (price*(1-disc)*100 lands on exact .5 for ~1% of
            # rows, where banker's and half-away rounding diverge)
            price_c = cents(batch["l_extendedprice"])
            disc_pct = cents(batch["l_discount"])
            centicents = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
            g = (
                pa.table({"p_brand": pa.array(brands, pa.string()),
                          "one": pa.array([1] * len(batch), pa.int64()),
                          "centicents": centicents})
                .group_by("p_brand")
                .aggregate([("one", "sum"), ("centicents", "sum")])
            )
            return g.rename_columns(["p_brand", "n_items", "revenue_centicents"])

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    partials = ds.map_batches(
        BrandJoiner, batch_format="pyarrow", zero_copy_batch=True, **_pool()
    )
    return partials.groupby("p_brand").aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("revenue_centicents", alias_name="revenue_centicents"),
    )


def q_events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling-window aggregate (the streaming-window analog, SURVEY.md
    §2.10): window key derived vectorized per row, then the partial-agg +
    tiny-groupby pattern."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        value_cents = cents(batch["value"])
        g = (
            pa.table({"window_start": hour, "event_type": batch["event_type"],
                      "one": pa.array([1] * len(batch), pa.int64()), "cents": value_cents})
            .group_by(["window_start", "event_type"])
            .aggregate([("one", "sum"), ("cents", "sum")])
        )
        return g.rename_columns(["window_start", "event_type", "n_events", "sum_value_cents"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(["window_start", "event_type"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value_cents", alias_name="sum_value_cents"),
    )


_USER_BUCKETS = 32


def _add_user_bucket(batch: pa.Table) -> pa.Table:
    """user_id % K bucket column: the per-key shuffle key becomes a
    bucket key, so downstream map_groups pays per-BUCKET Python
    overhead instead of per-user (round-1 verdict #6).  Bucket size is
    ~rows/K — size K so that fits a worker heap."""
    ids = batch["user_id"].to_numpy()
    return batch.append_column(
        "bucket", pa.array((ids % _USER_BUCKETS).astype(np.int32))
    )


def q_user_event_gaps(sf_dir: str) -> "ray.data.Dataset":
    """Per-key ordered window op (lag/as-of family): events shuffle on
    user-hash BUCKETS; within the bucket everything is one vectorized
    pandas pass (sort + boundary-masked diff + groupby max), never
    per-user Python."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    bucketed = ds.map_batches(_add_user_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)

    def gaps_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # epoch MICROseconds regardless of pandas' datetime64 resolution
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.zeros(len(g), dtype=np.int64)
        gap[1:] = us[1:] - us[:-1]
        gap[new_user] = 0  # gaps never cross users; single-event users -> 0
        out = (
            pd.DataFrame({"user_id": uid, "gap": gap})
            .groupby("user_id", sort=False)
            .agg(n_events=("gap", "size"), max_gap_us=("gap", "max"))
            .reset_index()
        )
        return out

    return bucketed.groupby("bucket").map_groups(gaps_bucket, batch_format="pandas")


def q_asof_last_purchase(sf_dir: str) -> "ray.data.Dataset":
    """As-of join (most-recent-prior lookup): every 'click' event joined
    to the same user's latest 'purchase' event at or before its
    timestamp (ops/asof.py — bucketed vectorized merge_asof).  SQL
    oracle is DuckDB's native ASOF LEFT JOIN."""
    from .ops.asof import asof_join

    clicks = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    ).filter(expr="event_type == 'click'").drop_columns(["event_type"])
    purchases = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).filter(expr="event_type == 'purchase'").drop_columns(["event_type"])
    out = asof_join(clicks, purchases, key_col="user_id", ts_col="ts",
                    right_ts_out="prev_purchase_ts", num_buckets=_USER_BUCKETS)

    def project(batch: pa.Table) -> pa.Table:
        # the union's right-side null-fill makes pandas promote left
        # int columns to float; restore the int64 contract here
        return pa.table(
            {
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "prev_purchase_ts": pc.cast(batch["prev_purchase_ts"],
                                            pa.timestamp("us")),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


def q_range_join_views(sf_dir: str) -> "ray.data.Dataset":
    """Range (interval-containment) join: every 'view' event paired with
    each same-user click window ``[click_ts, click_ts + 24h]`` that
    contains it (ops/rangejoin.py — bucketed union + vectorized
    per-bucket merge/filter; inner-join semantics, multi-containment
    emits one row per window).  SQL oracle is a plain theta join with
    BETWEEN."""
    from .ops.rangejoin import range_join

    views = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    ).filter(expr="event_type == 'view'").drop_columns(["event_type"])

    _WIN_US = 24 * 3_600_000_000

    def to_windows(batch: pa.Table) -> pa.Table:
        start = pc.cast(batch["ts"], pa.timestamp("us"))
        end = pc.cast(
            pc.add(pc.cast(start, pa.int64()), _WIN_US), pa.timestamp("us"))
        return pa.table(
            {"user_id": batch["user_id"], "win_start": start, "win_end": end})

    windows = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).filter(expr="event_type == 'click'").map_batches(
        to_windows, batch_format="pyarrow")

    out = range_join(
        views, windows, key_col="user_id", ts_col="ts",
        start_col="win_start", end_col="win_end",
        num_buckets=_USER_BUCKETS, closed="both")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "view_ts": pc.cast(batch["ts"], pa.timestamp("us")),
                "win_start": pc.cast(batch["win_start"], pa.timestamp("us")),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


def q_events_sliding(sf_dir: str) -> "ray.data.Dataset":
    """SLIDING-window aggregate (2h windows, 1h slide): each event lands
    in two windows — window keys expand per row inside map_batches (no
    self-join), then the partial-agg + tiny-groupby pattern."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    _HOUR_US = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        hour_us = pc.cast(
            pc.floor_temporal(batch["ts"], unit="hour"), pa.int64()
        ).to_numpy()
        value_cents = np.asarray(cents(batch["value"]))
        # two window keys per row: floor(ts) and floor(ts) - 1h
        starts = np.concatenate([hour_us, hour_us - _HOUR_US])
        doubled = pa.table({
            "window_start": pa.array(starts).cast(pa.timestamp("us")),
            "one": pa.array(np.ones(2 * len(batch), dtype=np.int64)),
            "cents": pa.array(np.concatenate([value_cents, value_cents])),
        })
        g = doubled.group_by("window_start").aggregate([("one", "sum"), ("cents", "sum")])
        return g.rename_columns(["window_start", "n_events", "sum_value_cents"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("window_start").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value_cents", alias_name="sum_value_cents"),
    )


def q_top_docs_per_source(sf_dir: str) -> "ray.data.Dataset":
    """Grouped top-k with a map-side combiner: each batch keeps its local
    top-2 per source (so the shuffle moves <= 2 x sources x batches rows,
    not the corpus), then the per-group finalizer re-ranks."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        return pa.Table.from_pandas(df.groupby("source", sort=False).head(2),
                                    preserve_index=False)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(2)

    partials = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("source").map_groups(final_topk, batch_format="pandas")


_QUANTILES = (0.5, 0.9, 0.99)


def q_chars_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact distributed quantiles via value histogram: the corpus never
    sorts globally — a groupby(n_chars) count produces a table bounded by
    the value domain, and the quantile read-off is a driver-side cumsum
    over that small histogram."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"n_chars": batch["n_chars"],
                      "one": pa.array([1] * len(batch), pa.int64())})
            .group_by("n_chars").aggregate([("one", "sum")])
        )
        return g.rename_columns(["n_chars", "cnt"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_chars").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas().sort_values("n_chars").reset_index(drop=True)
    )
    n = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum()
    out = {}
    for q in _QUANTILES:
        # DuckDB quantile_disc convention: element at ceil(q*n)-1 (0-based)
        idx = max(0, int(np.ceil(q * n)) - 1)
        out[f"p{int(q * 100)}"] = int(hist["n_chars"][cum > idx].iloc[0])
    return pd.DataFrame([out])


def q_chars_quantiles_by_lang(sf_dir: str) -> pd.DataFrame:
    """Exact GROUPED quantiles via per-group value histograms: the
    (lang, n_chars) count table is bounded by groups x value-domain —
    never a per-group sort of the corpus; the quantile read-off is a
    cumsum over each group's small histogram."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"lang": batch["lang"], "n_chars": batch["n_chars"],
                      "one": pa.array([1] * len(batch), pa.int64())})
            .group_by(["lang", "n_chars"]).aggregate([("one", "sum")])
        )
        return g.rename_columns(["lang", "n_chars", "cnt"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "n_chars"]).aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    rows = []
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("n_chars").reset_index(drop=True)
        n = int(g["cnt"].sum())
        cum = g["cnt"].cumsum()
        row = {"lang": lang}
        for q in _QUANTILES:
            idx = max(0, int(np.ceil(q * n)) - 1)  # quantile_disc position
            row[f"p{int(q * 100)}"] = int(g["n_chars"][cum > idx].iloc[0])
        rows.append(row)
    return pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)


_STOPWORD_FILTER_LANG = "en"


def q_content_token_counts(sf_dir: str) -> "ray.data.Dataset":
    """Stopword-removal cleaning op: per doc, tokens surviving the
    English stopword filter (lowercased whitespace tokens not in the
    list) — the standard pre-tokenization cleaning step, exactly
    SQL-reconstructable."""
    from .functions.textstats import _LANG_STOPWORDS

    stop = _LANG_STOPWORDS[_STOPWORD_FILTER_LANG]

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def count_content(batch: pa.Table) -> pa.Table:
        counts = [
            sum(1 for w in (t or "").split() if w.lower() not in stop)
            for t in batch["text"].to_pylist()
        ]
        return pa.table({"doc_id": batch["doc_id"],
                         "n_content_tokens": pa.array(counts, pa.int64())})

    return ds.map_batches(count_content, batch_format="pyarrow", zero_copy_batch=True)


def q_vocab_topk(sf_dir: str) -> pd.DataFrame:
    """Corpus vocabulary top-20 (canonical word-count): per-batch Counter
    partials (the map-side combine — the shuffle moves one row per
    distinct word per batch, never one per token), tiny groupby sum,
    driver-side top-k of the word table."""
    from collections import Counter

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            c.update((text or "").split())
        return pa.table(
            {"word": pa.array(list(c.keys()), pa.string()),
             "n": pa.array(list(c.values()), pa.int64())}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word").aggregate(Sum("n", alias_name="n"))
    )
    top = counts.sort(["n", "word"], descending=[True, False]).limit(20)
    return top.to_pandas()[["word", "n"]]


_TOP_TERMS = 5


def q_term_counts_by_source(sf_dir: str) -> "ray.data.Dataset":
    """Global top-k then per-partition breakdown: the corpus' top-5
    words (deterministic tie-break, as in vocab_topk) counted per
    source.  ONE set of per-batch (source, word) Counter partials feeds
    both consumers; the top-word set (tiny) broadcasts into a semi-join
    filter — the corpus-wide word table itself only shuffles once."""
    from collections import Counter

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for src, text in zip(batch["source"].to_pylist(), batch["text"].to_pylist()):
            for w in (text or "").split():
                counts[(src, w)] += 1
        if not counts:
            return pa.table({"source": pa.array([], pa.string()),
                             "word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        srcs, words = zip(*counts.keys())
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "word": pa.array(words, pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    by_src_word = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "word"]).aggregate(Sum("n", alias_name="n"))
        .materialize()  # two consumers: corpus top-k + the filtered output
    )
    totals = (
        by_src_word.groupby("word").aggregate(Sum("n", alias_name="total"))
        .sort(["total", "word"], descending=[True, False]).limit(_TOP_TERMS)
        .to_pandas()
    )
    top_words = frozenset(totals["word"])

    def keep_top(batch: pa.Table) -> pa.Table:
        mask = pa.array([w in top_words for w in batch["word"].to_pylist()])
        return batch.filter(mask)

    return by_src_word.map_batches(keep_top, batch_format="pyarrow",
                                   zero_copy_batch=True)


def q_distinct_lang_source(sf_dir: str) -> "ray.data.Dataset":
    """Set op (§2.8): distinct (lang, source) pairs via per-batch local
    distinct + keyed groupby count (count kept as evidence)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source"])

    def local_distinct(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"lang": batch["lang"], "source": batch["source"],
                      "one": pa.array([1] * len(batch), pa.int64())})
            .group_by(["lang", "source"]).aggregate([("one", "sum")])
        )
        return g.rename_columns(["lang", "source", "n_docs"])

    partials = ds.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(["lang", "source"]).aggregate(
        Sum("n_docs", alias_name="n_docs")
    )


_SESSION_GAP_US = 12 * 3600 * 1_000_000  # 12h (median inter-event gap ~7.3h)


def q_sessionize(sf_dir: str) -> "ray.data.Dataset":
    """Gap-based sessionization (training-data-pipeline staple): events
    shuffle on user BUCKETS; inside the bucket one vectorized pass
    computes per-user session numbers (boundary-masked cumsum — no
    per-user Python) and rolls up per (user, session)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    )
    bucketed = ds.map_batches(_add_user_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)

    def sessions_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gap_break = np.zeros(len(g), dtype=bool)
        gap_break[1:] = (us[1:] - us[:-1]) > _SESSION_GAP_US
        new_sess = new_user | gap_break
        cs = np.cumsum(new_sess.astype(np.int64))
        # per-user restart: subtract the cumsum value at each user's
        # first row (propagated forward), +1 -> 1-based session_no
        start_cs = np.where(new_user, cs, 0)
        start_cs = np.maximum.accumulate(start_cs)
        session_no = cs - start_cs + 1
        value_cents = cents(g["value"].to_numpy())
        out = (
            pd.DataFrame({"user_id": uid, "session_no": session_no,
                          "cents": value_cents})
            .groupby(["user_id", "session_no"], sort=False)
            .agg(n_events=("cents", "size"), sum_value_cents=("cents", "sum"))
            .reset_index()
        )
        return out

    return bucketed.groupby("bucket").map_groups(sessions_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

_N_QUERIES = 5
_TOPK = 10


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, list[int]]:
    """(queries, query vec_ids) — the _N_QUERIES lowest vec_ids."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = pc.sort_indices(tbl["vec_id"])
    first = tbl.take(order[: _N_QUERIES])
    mat = np.asarray(first["embedding"].to_pylist(), dtype=np.float32)
    return mat, [int(v) for v in first["vec_id"].to_pylist()]


def _remap_query_ids(out: pd.DataFrame, qids: list[int]) -> pd.DataFrame:
    """Positional query index -> the query's own vec_id (the oracle key)."""
    out = out[["query_id", "vec_id"]].copy()
    out["query_id"] = out["query_id"].map(lambda q: qids[int(q)]).astype("int64")
    return out


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Exact cosine top-k; returns ordering keys only (query_id, vec_id) —
    scores are fp32 and engine-specific in the last bit, so the hashable
    contract is the neighbor set, checked against DuckDB
    list_cosine_similarity."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    queries, qids = _query_matrix(sf_dir)
    out = brute_force_topk(ds, queries, k=_TOPK, concurrency=_fixed_concurrency())
    return _remap_query_ids(out, qids)


def _recall_vs_exact(sf_dir: str, approx: pd.DataFrame, min_hits: int) -> pd.DataFrame:
    """(query_id, recall_ok) rows: |approx ∩ exact| >= min_hits per query.

    The exact side is the engine's own brute_force_topk — itself
    value-checked against DuckDB (``ann_topk``), so the recall invariant
    composes into a SQL-checkable boolean: the oracle states every query
    must clear the bar (SELECT ..., TRUE AS recall_ok)."""
    exact = q_ann_topk(sf_dir)
    ex = {int(q): set(g["vec_id"]) for q, g in exact.groupby("query_id")}
    rows = []
    for q in sorted(ex):
        got = set(approx.loc[approx["query_id"] == q, "vec_id"])
        rows.append({"query_id": q, "recall_ok": len(got & ex[q]) >= min_hits})
    return pd.DataFrame(rows)


def q_lsh_recall(sf_dir: str) -> pd.DataFrame:
    """LSH ANN recall invariant: recall@10 >= 0.9 per query vs exact.

    The driver corpus is isotropic-random (measured same-label vs
    diff-label cosine are indistinguishable) — the ANN-adversarial
    worst case, where high recall requires probing most buckets; hence
    probe_bits=3 on n_bits=4 (15/16 buckets).  On clustered corpora the
    same operator reaches this recall at a small probe fraction."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    queries, qids = _query_matrix(sf_dir)
    out = lsh_topk(ds, queries, k=_TOPK, n_bits=4, probe_bits=3,
                   concurrency=_fixed_concurrency())
    return _recall_vs_exact(sf_dir, _remap_query_ids(out, qids), min_hits=9)


def q_ivf_recall(sf_dir: str) -> pd.DataFrame:
    """IVF ANN recall invariant: recall@10 >= 0.8 per query vs exact
    (n_probe=10 of 16 lists; same ANN-adversarial caveat as
    q_lsh_recall — random vectors spread true neighbors uniformly over
    centroids, so a 0.9 bar needs a near-full scan)."""
    from .ops.similarity import ivf_topk

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    sample = np.asarray(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        ["embedding"].to_pylist(), dtype=np.float32)
    queries, qids = _query_matrix(sf_dir)
    out = ivf_topk(ds, queries, k=_TOPK, n_lists=16, n_probe=10,
                   train_sample=sample, concurrency=_fixed_concurrency())
    return _recall_vs_exact(sf_dir, _remap_query_ids(out, qids), min_hits=8)


_PLANT_OFFSET = 10_000_000


def _plant_vec_copies(batch: pa.Table) -> pa.Table:
    """Append exact copies of every vec_id % 20 == 0 row under
    vec_id + _PLANT_OFFSET (cosine exactly 1.0 with the source)."""
    ids = batch["vec_id"].to_numpy()
    sel = batch.filter(pa.array(ids % 20 == 0))
    planted = sel.set_column(
        sel.schema.get_field_index("vec_id"), "vec_id",
        pc.add(sel["vec_id"], _PLANT_OFFSET),
    )
    return pa.concat_tables([batch, planted])


def q_embedding_near_dups(sf_dir: str) -> pd.DataFrame:
    """Embedding near-dup detection with PLANTED duplicates: exact
    copies of every 20th vector are appended under shifted ids, and the
    0.99-cosine threshold must recover exactly the planted pairs (the
    organic max pairwise cosine of the random corpus is ~0.5).  Exact
    copies share their source's LSH bucket deterministically, so the
    planted-pair oracle is exact SQL."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    augmented = ds.map_batches(_plant_vec_copies, batch_format="pyarrow",
                               zero_copy_batch=True)
    return embedding_near_dups(augmented, threshold=0.99, n_bits=4,
                               concurrency=_fixed_concurrency())[
        ["key_a", "key_b"]
    ]


# ---------------------------------------------------------------------------
# rows-only (non-SQL) operators
# ---------------------------------------------------------------------------


def q_lang_id(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        LangIdStage, batch_format="pyarrow", **_pool()
    ).select_columns(["doc_id", "pred_lang", "lang_confidence"])


def q_quality_signals(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(quality_batch, batch_format="pyarrow")
    return out.select_columns(
        ["doc_id", "q_n_words", "q_stopword_ratio", "q_dup_line_ratio", "q_quality_score"]
    )


def q_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """Document fingerprinting (rolling hash + 64-bit content hash +
    SimHash) checked through PAIR INVARIANTS: hash values themselves
    are not SQL-expressible, but their EQUALITY STRUCTURE is — planted
    exact copies must match on every fingerprint (SimHash Hamming 0),
    and adjacent-id pairs must match exactly when their texts are equal
    (the SQL side compares the texts directly).  Pairing runs as two
    narrow distributed self-joins of the fingerprint table."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    aug = ds.map_batches(_plant_exact_copies, batch_format="pyarrow",
                         zero_copy_batch=True)
    fp = (
        aug.map_batches(fingerprint_batch, batch_format="pyarrow")
        .map_batches(add_simhash, batch_format="pyarrow")
        .select_columns(["doc_id", "fingerprint", "text_hash", "simhash"])
        .materialize()
    )

    def as_right(batch: pa.Table, *, shift: int) -> pa.Table:
        return pa.table({
            "src_id": pc.subtract(batch["doc_id"], pa.scalar(shift, pa.int64())),
            "fp2": batch["fingerprint"],
            "th2": batch["text_hash"],
            "sh2": batch["simhash"],
        })

    def project(batch: pa.Table, *, kind: str, with_hamming: bool) -> pa.Table:
        xor = pc.bit_wise_xor(batch["simhash"], batch["sh2"])
        if with_hamming:
            ham = pa.array([bin(v & ((1 << 64) - 1)).count("1")
                            for v in xor.to_pylist()], pa.int64())
        else:
            ham = pa.array([-1] * len(batch), pa.int64())
        return pa.table({
            "doc_id": batch["doc_id"],
            "pair_kind": pa.array([kind] * len(batch), pa.string()),
            "fp_match": pc.equal(batch["fingerprint"], batch["fp2"]),
            "hash_match": pc.equal(batch["text_hash"], batch["th2"]),
            "simhash_hamming": ham,
        })

    base = fp.filter(expr=f"doc_id < {_PLANT_OFFSET}")
    copies = fp.filter(expr=f"doc_id >= {_PLANT_OFFSET}").map_batches(
        as_right, fn_kwargs={"shift": _PLANT_OFFSET}, batch_format="pyarrow",
        zero_copy_batch=True)
    copy_pairs = base.join(
        copies, join_type="inner", num_partitions=2,
        on=("doc_id",), right_on=("src_id",),
    ).map_batches(project, fn_kwargs={"kind": "copy", "with_hamming": True},
                  batch_format="pyarrow")

    nbr_right = base.map_batches(as_right, fn_kwargs={"shift": 1},
                                 batch_format="pyarrow", zero_copy_batch=True)
    nbr_pairs = base.join(
        nbr_right, join_type="inner", num_partitions=2,
        on=("doc_id",), right_on=("src_id",),
    ).map_batches(project, fn_kwargs={"kind": "neighbor", "with_hamming": False},
                  batch_format="pyarrow")
    return copy_pairs.union(nbr_pairs)


_PLANT_MIN_WORDS = 40


def _plant_near_dups(batch: pa.Table) -> pa.Table:
    """Append a near-duplicate (one word appended) of every 10th doc
    with >= _PLANT_MIN_WORDS words, under doc_id + _PLANT_OFFSET.

    The word floor keeps shingle-set Jaccard >= (W-2)/(W-1) ~ 0.974, so
    the 64-perm signature estimate clears the 0.8 threshold with
    per-doc failure probability ~1e-6 — and the fixed seed makes the
    outcome deterministic, so the planted-pair oracle is exact."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    p_ids, p_texts = [], []
    for i, t in zip(ids, texts):
        t = t or ""
        if i % 10 == 0 and len(t.split()) >= _PLANT_MIN_WORDS:
            p_ids.append(i + _PLANT_OFFSET)
            p_texts.append(t + " planteddup")
    planted = pa.table({"doc_id": pa.array(p_ids, pa.int64()),
                        "text": pa.array(p_texts, pa.string())})
    return pa.concat_tables([batch.select(["doc_id", "text"]), planted])


def _planted_docs(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_plant_near_dups, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_minhash_dedup(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH near-dup dedup over a corpus with PLANTED near
    duplicates: every planted copy must cluster with its source
    (is_dup=True, keep-min representative), and no organic pair in the
    synthetic corpus reaches 0.8 Jaccard — so the full (doc_id, is_dup)
    table is SQL-reconstructable."""
    out = minhash_lsh_dedup(_planted_docs(sf_dir), threshold=0.8,
                            concurrency=_fixed_concurrency())
    return out[["doc_id", "is_dup"]]


def q_minhash_dedup_distributed(sf_dir: str) -> pd.DataFrame:
    """Corpus-scale near-dup path: join-verified candidates +
    distributed min-label propagation (no driver-side signature map or
    union-find).  Same planted-pair oracle as q_minhash_dedup."""
    from .ops.dedup import minhash_lsh_dedup_distributed

    out = minhash_lsh_dedup_distributed(_planted_docs(sf_dir), threshold=0.8,
                                        concurrency=_fixed_concurrency(),
                                        num_partitions=4)
    return out[["doc_id", "is_dup"]]


def q_minhash_dedup_writeout(sf_dir: str) -> "ray.data.Dataset":
    """End-to-end Dataset-returning distributed dedup (round-4 verdict
    #2): labels flow from :func:`ops.dedup.minhash_lsh_dedup_ds`
    straight to partitioned Parquet and are read back as a Dataset —
    NO corpus-sized driver collect anywhere on this path (the pandas
    wrapper exists only as the oracle contract).  Same planted-pair
    oracle as minhash_dedup."""
    import tempfile

    from .ops.dedup import minhash_lsh_dedup_ds

    out_dir = tempfile.mkdtemp(prefix="ekray_dedup_labels_")
    labels = minhash_lsh_dedup_ds(_planted_docs(sf_dir), threshold=0.8,
                                  concurrency=_fixed_concurrency(),
                                  num_partitions=4)
    labels.select_columns(["doc_id", "is_dup"]).write_parquet(out_dir)
    return ray.data.read_parquet(out_dir)


def q_resume_extract_roundtrip(sf_dir: str) -> "ray.data.Dataset":
    """Oracle-checked resume (round-4 verdict #5, SURVEY S10/§4.4):
    write -> damage (delete 3 manifests) -> resume -> read back.

    Full partitioned extraction of docs-as-pages, then three manifests
    are deleted so their parts look crashed-mid-commit; the second run
    must clean + recompute EXACTLY those parts (asserted — the query
    raises on a wrong resume) and the final table read back via
    :func:`pipelines.resume.read_extracted` must match the same
    whitespace-collapse oracle as extract_html_roundtrip — i.e. the
    damage+resume cycle is invisible in the output."""
    import shutil
    import tempfile

    from .pipelines.resume import read_extracted, run_partitioned_extract
    from .state import manifests as mf

    root = tempfile.mkdtemp(prefix="ekray_resume_")
    pages_path = os.path.join(root, "pages")
    out_dir = os.path.join(root, "out")
    docs_as_pages(sf_dir).write_parquet(pages_path)

    n_parts = 16
    first = run_partitioned_extract(
        pages_path, out_dir, n_parts=n_parts,
        concurrency=_fixed_concurrency())
    damaged = sorted(first["parts_written"])[:3]
    for p in damaged:
        os.remove(mf.manifest_path(out_dir, p))

    second = run_partitioned_extract(
        pages_path, out_dir, n_parts=n_parts,
        concurrency=_fixed_concurrency())
    if sorted(second["parts_cleaned"]) != damaged or \
            sorted(second["parts_written"]) != damaged or not second["resumed"]:
        raise AssertionError(
            f"resume recomputed wrong parts: damaged={damaged} "
            f"cleaned={second['parts_cleaned']} "
            f"rewritten={second['parts_written']}")

    final = read_extracted(out_dir).select_columns(["url", "text"])
    out = final.map_batches(_doc_id_from_url, batch_format="pyarrow")
    shutil.rmtree(pages_path, ignore_errors=True)
    return out


def q_segment_sales(sf_dir: str) -> "ray.data.Dataset":
    """Shuffle hash join (Dataset.join) + rollup: orders joined to their
    customer's market segment, exact cent-sums per segment.  The
    broadcast-join pattern (revenue_by_brand) covers small sides; this is
    the both-sides-large path."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    joined = orders.join(
        customer, join_type="inner", num_partitions=4,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        price_cents = cents(batch["o_totalprice"])
        g = (
            pa.table({"c_mktsegment": batch["c_mktsegment"],
                      "one": pa.array([1] * len(batch), pa.int64()),
                      "cents": price_cents})
            .group_by("c_mktsegment").aggregate([("one", "sum"), ("cents", "sum")])
        )
        return g.rename_columns(["c_mktsegment", "n_orders", "sum_price_cents"])

    partials = joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("c_mktsegment").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
    )


_N_MEDIA = 240


def q_media_features(sf_dir: str) -> "ray.data.Dataset":
    """Multimodal decode/optimize over a deterministic synthetic media
    table (driver testdata has no binary media): REAL PNG decode ->
    budget resize -> contrast -> re-encode for images, REAL WAV header
    parse for audio, MP4/AVI header parse for video.  Every projected column is
    closed-form in media_id (ops/multimodal.py geometry constants), so
    the DuckDB oracle reconstructs the full expected table from
    range()."""
    ds = ray.data.from_arrow(make_media_table(_N_MEDIA))
    return extract_media_features(ds, model="pixtral", concurrency=2).select_columns(
        ["media_id", "kind", "decoded_width", "decoded_height",
         "target_width", "target_height", "duration_ms_out", "n_frames", "valid"]
    )


_N_FIXTURE = 400
_FIXTURE_META_DIR = "/tmp/ekray_fixture_meta"


def ensure_fixture_meta() -> str:
    """Write the PLANTED fixture ground-truth parquet (fixtures.py
    expected_meta_table — generator knowledge, no extraction run) if
    absent, atomically; read by the fixture-query DuckDB oracles.
    Called lazily from ``__ray_entry__.oracle_sql()`` — NOT at module
    import, so importing driver.py never touches /tmp and concurrent
    importers cannot race (round-3 ADVICE)."""
    from .fixtures import write_expected_meta

    return write_expected_meta(_FIXTURE_META_DIR, _N_FIXTURE)


def q_flagship_fixture(sf_dir: str) -> "ray.data.Dataset":
    """Full mixed-kind flagship extraction over the deterministic fixture
    corpus (HTML + DOCX + multi-page layout + corruption rows),
    projected onto the PLANTED columns (routing, validity, titles) so
    the ground-truth parquet is a full rows+hash oracle; byte-level
    output checks live in the roundtrip queries and golden tests."""
    from .fixtures import make_pages_table

    ds = ray.data.from_arrow(make_pages_table(_N_FIXTURE))
    extracted = ds.map_batches(
        HtmlExtractor, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64, **_pool(),
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"],
                "doc_kind": batch["doc_kind"],
                "valid": batch["valid"],
                "title": batch["title"],
            }
        )

    return extracted.map_batches(project, batch_format="pyarrow")


def _wrap_docs_as_invoices(batch: pa.Table) -> pa.Table:
    """documents rows -> invoice-style docs with doc_id-derived planted
    fields, so the fake-LLM extraction output is SQL-reconstructable."""
    ids = batch["doc_id"].to_pylist()
    texts = [
        (
            f"INVOICE\nInvoice No: INV-{i:08d}\n"
            f"Date: 2024-{1 + i % 12:02d}-{1 + i % 28:02d}\n"
            f"Total: {i % 9000 + 100}.{i % 100:02d} EUR"
        )
        for i in (int(x) for x in ids)
    ]
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


def q_structured_extract(sf_dir: str) -> "ray.data.Dataset":
    """The vision-LLM structured-extraction path (generate half of V7,
    A2/M21/M22) against the deterministic fake provider: client built
    once per actor, schema-derived prompt, validate + retry<=2,
    failure-as-data.  Planted fields, the retry count (doc_id%7 ->
    malformed first attempt), and the persistent-failure rows
    (doc_id%13 -> out-of-range confidence) are all doc_id-derived, so
    the full output is SQL-checkable."""
    import json as _json

    from .stages.llm_stage import StructuredExtractor

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    invoices = ds.map_batches(_wrap_docs_as_invoices, batch_format="pyarrow",
                              zero_copy_batch=True)
    extracted = invoices.map_batches(
        StructuredExtractor, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=128, **_pool(),
    )

    def project(batch: pa.Table) -> pa.Table:
        nums, dates, currs, cents_out = [], [], [], []
        for raw in batch["data"].to_pylist():
            if not raw:
                nums.append(None); dates.append(None)
                currs.append(None); cents_out.append(None)
                continue
            j = _json.loads(raw)
            nums.append(j["invoice_details"]["invoice_number"])
            dates.append(j["invoice_details"]["invoice_date"])
            currs.append(j["document_info"]["currency"])
            total = j["financial_totals"]["total_amount"]
            cents_out.append(int(cents([total])[0]))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "invoice_number": pa.array(nums, pa.string()),
                "invoice_date": pa.array(dates, pa.string()),
                "currency": pa.array(currs, pa.string()),
                "total_cents": pa.array(cents_out, pa.int64()),
                "valid": batch["valid"],
                "n_attempts": pc.cast(batch["n_attempts"], pa.int64()),
            }
        )

    return extracted.map_batches(project, batch_format="pyarrow")


def q_schema_validate(sf_dir: str) -> "ray.data.Dataset":
    """Zod-equivalent path end-to-end (SURVEY.md V2+V7): compile a
    JSON-Schema to a pyarrow struct, validate the events ``props`` JSON
    column against it in an actor pool, project the typed field.
    SQL-checkable because validation of well-formed input is the identity:
    k == json_extract(props, '$.k')."""
    from .schemas import compile_json_schema
    from .stages.validate_stage import SchemaValidator

    target = compile_json_schema(
        {"type": "object", "properties": {"k": {"type": "integer"}},
         "required": ["k"]}
    )
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])
    validated = ds.map_batches(
        SchemaValidator,
        fn_constructor_kwargs={"target": target, "input_col": "props"},
        batch_format="pyarrow", zero_copy_batch=True, **_pool(),
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "k": pc.struct_field(batch["data"], "k"),
                "valid": batch["valid"],
            }
        )

    return validated.map_batches(project, batch_format="pyarrow")


def q_layout_fanout(sf_dir: str) -> "ray.data.Dataset":
    """Skew-defusing layout path over the fixture corpus: 1 doc -> N page
    rows -> per-page parse -> bucketed groupby reassembly (SURVEY.md
    §4.1).  The assembled TEXT is checked byte-identically against the
    generator's planted line/page structure."""
    from .fixtures import make_pages_table
    from .stages.pdf_stage import extract_layout_fanout

    ds = ray.data.from_arrow(make_pages_table(_N_FIXTURE))
    out = extract_layout_fanout(ds)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"],
                "n_pages": pc.cast(batch["n_pages"], pa.int64()),
                "valid": batch["valid"],
                "text": pc.cast(batch["text"], pa.string()),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


def q_domain_lineage(sf_dir: str) -> pa.Table:
    """Per-domain lineage rollup over the fixture corpus (the flagship's
    wide shuffle, SURVEY.md §2.6-new), projected onto the
    SQL-reconstructable columns (doc/valid counts per domain from the
    planted routing table)."""
    from .fixtures import make_pages_table

    ds = ray.data.from_arrow(make_pages_table(_N_FIXTURE))
    extracted = ds.map_batches(
        HtmlExtractor, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64, **_pool(),
    )
    tbl = lineage_rollup(extracted)
    return tbl.select(["domain", "n_docs", "n_valid"])


# ---------------------------------------------------------------------------
# registry + oracle SQL
# ---------------------------------------------------------------------------

_SAMPLE_PER_LANG = 20
_SAMPLE_FRACTION = 0.25


def q_stratified_sample_by_lang(sf_dir: str) -> "ray.data.Dataset":
    """Reproducible stratified sample (training-data curation staple):
    the _SAMPLE_PER_LANG hash-smallest docs per language.  The Knuth
    multiplicative sample hash is mirrored exactly by the oracle's
    integer arithmetic, so the FULL selection (not just its size) is
    SQL-checked."""
    from .ops.sampling import stratified_sample

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    out = stratified_sample(ds, group_col="lang", key_col="doc_id",
                            n_per_group=_SAMPLE_PER_LANG)
    return out.select_columns(["doc_id", "lang"])


def q_sample_fraction_docs(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic Bernoulli-style corpus fraction (one streaming
    filter, no shuffle) — the resumable replacement for
    random_shuffle+limit subsampling."""
    from .ops.sampling import sample_fraction

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    return sample_fraction(ds, key_col="doc_id",
                           fraction=_SAMPLE_FRACTION).select_columns(["doc_id", "lang"])


def _plant_pii_batch(batch: pa.Table) -> pa.Table:
    """Append a deterministic PII footer (email + phone + IPv4, all
    closed-form in doc_id) to docs with doc_id % 3 != 2 — the driver
    corpus carries no organic PII, so the redactor would otherwise be
    tested on nothing.  The SQL oracle concatenates the identical
    footer, so redaction is checked end-to-end, not just counted."""
    did = batch["doc_id"].to_numpy()
    s = did.astype("U20")
    xxx = (did % 900 + 100).astype("U20")
    yyyy = (did % 9000 + 1000).astype("U20")
    a = (did % 200).astype("U20")
    b = ((did * 7) % 256).astype("U20")
    c = (did % 250).astype("U20")
    add = np.char.add
    footer = add(" Contact user", s)
    footer = add(footer, "@mail.example or +1-555-")
    footer = add(add(add(footer, xxx), "-"), yyyy)
    footer = add(add(footer, " at 10."), a)
    footer = add(add(add(add(footer, "."), b), "."), c)
    footer = np.where(did % 3 == 2, "", footer)
    import pyarrow.compute as pc

    aug = pc.binary_join_element_wise(batch["text"], pa.array(footer), "")
    return batch.set_column(batch.schema.get_field_index("text"), "text", aug)


def q_customers_no_orders(sf_dir: str) -> "ray.data.Dataset":
    """Distributed ANTI join (Dataset.join left_anti): customers with no
    1-URGENT order.  Completes the join family alongside inner shuffle
    (segment_sales), broadcast (revenue_by_brand), as-of and range
    joins — anti/semi are the dedup-against-reference primitives a
    100 TB pipeline uses constantly (e.g. "docs NOT in yesterday's
    crawl").  The right side is priority-filtered so the result is
    non-trivial at every sf (the driver corpus gives every customer at
    least one order of SOME priority)."""
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"])
    urgent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    ).filter(expr="o_orderpriority == '1-URGENT'").select_columns(["o_custkey"])
    return customer.join(urgent, join_type="left_anti", num_partitions=4,
                         on=("c_custkey",), right_on=("o_custkey",))


def q_urgent_customers_semi(sf_dir: str) -> "ray.data.Dataset":
    """Distributed SEMI join (Dataset.join left_semi): customers with at
    least one 1-URGENT order — existence filtering without duplicating
    left rows (what an inner join would do)."""
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal"])
    urgent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    ).filter(expr="o_orderpriority == '1-URGENT'").select_columns(["o_custkey"])
    return customer.join(urgent, join_type="left_semi", num_partitions=4,
                         on=("c_custkey",), right_on=("o_custkey",))


def q_decontaminate(sf_dir: str) -> "ray.data.Dataset":
    """Benchmark decontamination (GPT-3-style 13-gram probes): a small
    "benchmark" subset of the corpus (doc_id % 97 == 3) yields leading
    13-word probes; every doc is scanned for them verbatim after
    whitespace normalization.  Broadcast probes (ray.put once, read per
    actor) + one stateless vectorized pass — never a shuffle; the
    benchmark side is small by definition.  The corpus's organic
    near-duplicates (~5%) make hits non-trivial beyond self-matches."""
    from .ops.decontam import benchmark_probes, mark_contamination

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    probes = benchmark_probes(docs)
    return mark_contamination(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"]),
        probes,
    )


_BM25_LO, _BM25_HI, _BM25_TOPK = 6, 10, 10


def q_bm25_search(sf_dir: str) -> pd.DataFrame:
    """BM25 top-k retrieval (the lexical half of the search family next
    to ANN): query terms are the corpus's rank-6..10 words (self-
    contained pick both sides derive identically), two streaming passes
    (fused vocab+stats, then score+partial-top-k), candidates-only to
    the driver.  The rational-idf variant + pinned operation order +
    micro-unit floor make numpy and DuckDB agree bit-for-bit
    (ops/bm25.py)."""
    from .ops.bm25 import bm25_topk, top_terms_with_stats

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    terms, stats = top_terms_with_stats(ds, lo_rank=_BM25_LO,
                                        hi_rank=_BM25_HI)
    out = bm25_topk(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"]),
        terms, topk=_BM25_TOPK, stats=stats)
    return out.sort_values(["term", "rank"]).reset_index(drop=True)


def q_pack_sequences(sf_dir: str) -> "ray.data.Dataset":
    """Sequence packing (pre-training staple): docs packed next-fit
    into CAPACITY-token bins within (source, doc_id//SHARD_DOCS)
    shards.  Shard-local packing is the scale design — every shard
    packs independently (one bucket shuffle, per-bin loop inside) —
    and it bounds the oracle's recursive-CTE depth to the shard size."""
    from .ops.packing import next_fit_pack

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "text"])
    sized = ds.map_batches(token_count_batch, batch_format="pyarrow",
                           zero_copy_batch=True).drop_columns(["text"])
    return next_fit_pack(sized, size_col="n_tokens_ws").select_columns(
        ["doc_id", "source", "shard", "n_tokens_ws", "bin_id"])


def _plant_unicode_batch(batch: pa.Table) -> pa.Table:
    """Append deterministic non-NFC (decomposed e+combining-acute) and
    control-char (BEL) suffixes — the driver corpus is clean ASCII, so
    the normalizer would otherwise be tested on nothing.  The oracle
    concatenates the identical suffixes via chr()."""
    did = batch["doc_id"].to_numpy()
    suf = np.where(did % 4 == 1, " nfc" + chr(101) + chr(769), "")
    suf2 = np.where(did % 5 == 2, " x" + chr(7) + "y", "")
    import pyarrow.compute as pc

    aug = pc.binary_join_element_wise(
        batch["text"], pa.array(np.char.add(suf, suf2)), "")
    return batch.set_column(batch.schema.get_field_index("text"), "text", aug)


_PARA_WORDS = 20


def _plant_paragraphs_batch(batch: pa.Table) -> pa.Table:
    """Rewrap each doc into _PARA_WORDS-word paragraphs joined by blank
    lines (the corpus is flat word streams; paragraph structure must be
    planted for paragraph-dedup to have units to work on — the oracle
    rebuilds the same wrap via list slicing)."""
    texts = []
    for text in batch["text"].to_pylist():
        words = (text or "").split()
        n = max(-(-len(words) // _PARA_WORDS), 1)
        texts.append("\n\n".join(
            " ".join(words[i * _PARA_WORDS:(i + 1) * _PARA_WORDS])
            for i in range(n)))
    return batch.set_column(batch.schema.get_field_index("text"), "text",
                            pa.array(texts, pa.string()))


def q_canonical_urls(sf_dir: str) -> "ray.data.Dataset":
    """URL canonicalization (web-dedup prerequisite): messy URLs —
    mixed-case scheme/host, default ports, utm_* params, fragments,
    trailing slashes — planted closed-form from doc_id, canonicalized
    by the fixed RE2 rewrite sequence in ops/urlnorm.py.  Both engines
    run the same regex steps, so canon_url matches byte-exactly."""
    from .ops.urlnorm import canonicalize_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def plant(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        s = did.astype("U20")
        scheme = np.where(did % 2 == 1, "HtTpS", "HtTp")
        port = np.select([did % 6 == 0, did % 6 == 1], [":80", ":443"], "")
        slash = np.where(did % 4 == 1, "/", "")
        q = np.select(
            [did % 5 == 2, did % 5 == 3, did % 5 == 4],
            [np.char.add("?utm_source=news&id=", s),
             np.full_like(s, "?utm_x=1"),
             np.char.add("?id=", s)], "")
        frag = np.where(did % 7 == 4, np.char.add("#Sec", s), "")
        add = np.char.add
        url = add(add(add(scheme, "://WWW.Site"), (did % 20).astype("U4")),
                  ".EXample")
        url = add(add(add(add(add(url, port), "/Path/"), s), slash),
                  add(q, frag))
        return batch.append_column("url", pa.array(url.tolist(), pa.string()))

    return ds.map_batches(plant, batch_format="pyarrow",
                          zero_copy_batch=True).map_batches(
        canonicalize_batch, batch_format="pyarrow",
        zero_copy_batch=True).select_columns(["doc_id", "canon_url"])


def _plant_spread_urls(batch: pa.Table) -> pa.Table:
    """Append a deterministic ``url`` column spreading each logical
    page (…/Page/<doc_id%37>) across many spellings (mixed-case
    scheme/host, default ports, utm params, fragments, trailing slash
    varying by doc_id), so canonical groups of ~4+ docs genuinely
    collapse.  Mirrored in SQL by :data:`_URL_PLANT_SQL`."""
    did = batch["doc_id"].to_numpy()
    s37 = (did % 37).astype("U4")
    scheme = np.where(did % 2 == 1, "HtTpS", "HtTp")
    port = np.select([did % 6 == 0, did % 6 == 1], [":80", ":443"], "")
    slash = np.where(did % 4 == 1, "/", "")
    q = np.select(
        [did % 5 == 2, did % 5 == 3, did % 5 == 4],
        ["?utm_source=news&ref=1", "?utm_x=1", "?ref=1"], "")
    frag = np.where(did % 7 == 4, "#Top", "")
    add = np.char.add
    url = add(add(add(add(add(add(scheme, "://WWW.Site.EXample"), port),
                          "/Page/"), s37), slash), add(q, frag))
    return batch.append_column("url", pa.array(url.tolist(), pa.string()))


_URL_PLANT_SQL = (
    "CASE WHEN doc_id % 2 = 1 THEN 'HtTpS' ELSE 'HtTp' END || "
    "'://WWW.Site.EXample' || "
    "CASE WHEN doc_id % 6 = 0 THEN ':80' WHEN doc_id % 6 = 1 "
    "THEN ':443' ELSE '' END || '/Page/' || CAST(doc_id % 37 AS VARCHAR) || "
    "CASE WHEN doc_id % 4 = 1 THEN '/' ELSE '' END || "
    "CASE WHEN doc_id % 5 = 2 THEN '?utm_source=news&ref=1' "
    "WHEN doc_id % 5 = 3 THEN '?utm_x=1' "
    "WHEN doc_id % 5 = 4 THEN '?ref=1' ELSE '' END || "
    "CASE WHEN doc_id % 7 = 4 THEN '#Top' ELSE '' END"
)


def q_dedup_canonical_urls(sf_dir: str) -> "ray.data.Dataset":
    """URL-keyed dedup — THE web-crawl dedup primitive: canonicalize
    (ops/urlnorm.py fixed RE2 sequence) then keep the FIRST doc per
    canonical URL via the same exact_dedup operator keyed on the
    canonical string (content-hash groupby, min-key wins) — operator
    composition across family lines.  Scale shape: stateless
    canonicalize pass, then dedup's compact-key shuffle — URL strings
    never move after hashing."""
    from .ops.dedup import exact_dedup
    from .ops.urlnorm import canonicalize_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    canon = ds.map_batches(_plant_spread_urls, batch_format="pyarrow",
                           zero_copy_batch=True).map_batches(
        canonicalize_batch, batch_format="pyarrow",
        zero_copy_batch=True).select_columns(["doc_id", "canon_url"])
    return exact_dedup(canon, text_col="canon_url", key_col="doc_id")


def q_strip_dup_windows(sf_dir: str) -> "ray.data.Dataset":
    """Corpus cleaning by substring-level dedup (ops/dupspans.
    strip_duplicated_spans): every token under a duplicated 8-token
    window is removed and the doc rebuilt from the survivors — the
    emit-the-cleaned-corpus counterpart of dup_window_stats.  Text
    never shuffles on the broadcast path (one streaming rebuild map);
    byte-exact against the string_agg oracle."""
    from .ops.dupspans import strip_duplicated_spans

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return strip_duplicated_spans(ds, key_col="doc_id", k=8)


def q_anchor_text_topk(sf_dir: str) -> "ray.data.Dataset":
    """Anchor-text aggregation — the link-graph x text composition web
    search and page-quality pipelines run: every link (the pagerank
    plant's deterministic edge set) carries its source page's anchor
    terms (first 3 tokens), and each TARGET page is represented by its
    top-3 incoming anchor terms.  Scale shape: the fan-out emits
    narrow (dst, term) rows map-side pre-counted per batch, ONE
    groupby(dst, term) sums them, and the exact per-target top-3 rides
    ops/sampling.top_n_per_group (partial head per batch, hash-bucketed
    final fold — never one task per page)."""
    from ray.data.aggregate import Sum

    from .ops.bm25 import _tokens
    from .ops.sampling import top_n_per_group

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata, no scan

    def fanout(batch: pa.Table) -> pa.Table:
        words, _dl = _tokens(batch["text"])
        ats = pc.list_slice(words, 0, 3)
        if isinstance(ats, pa.ChunkedArray):
            ats = ats.combine_chunks()
        flat = pc.list_flatten(ats)
        parent = ats.value_parent_indices().to_numpy().astype(np.int64)
        # blank docs tokenize to ['']: drop empty terms (SQL list_filter)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        terms = flat.filter(pa.array(keep))
        parent = parent[keep]
        did = batch["doc_id"].to_numpy()
        d1 = (did * 7 + 1) % n_docs
        d2 = (did * 13 + 2) % n_docs
        d3 = (did * 29 + 3) % n_docs
        # per-src DISTINCT dsts (mirrors the pagerank oracle's UNION)
        edge_dsts = [d1, d2, d3]
        edge_valid = [np.ones(len(did), bool),
                      d2 != d1, (d3 != d1) & (d3 != d2)]
        out_dst, out_term = [], []
        for dst, valid in zip(edge_dsts, edge_valid):
            ok = valid[parent]
            if not ok.any():
                continue
            out_dst.append(dst[parent[ok]])
            out_term.append(terms.filter(pa.array(ok)))
        if not out_dst:
            return pa.table({"dst_doc": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "n_anchor": pa.array([], pa.int64())})
        tbl = pa.table({
            "dst_doc": pa.array(np.concatenate(out_dst), pa.int64()),
            "term": pa.concat_arrays(
                [t.combine_chunks() if isinstance(t, pa.ChunkedArray)
                 else t for t in out_term]),
        })
        # map-side combine: per-batch (dst, term) partial counts
        part = tbl.to_pandas().groupby(["dst_doc", "term"],
                                       sort=False).size()
        part = part.rename("n_anchor").reset_index()
        return pa.Table.from_pandas(part, preserve_index=False)

    counts = (ds.map_batches(fanout, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["dst_doc", "term"])
              .aggregate(Sum("n_anchor", alias_name="n_anchor")))
    return top_n_per_group(counts, group_col="dst_doc",
                           order_cols=["n_anchor", "term"], n=3,
                           descending=[True, False])


_BLOCKLIST = ["dom2.example", "dom3.example", "dom7.example",
              "dom11.example", "sub1.dom2.example"]


def q_blocklist_filter(sf_dir: str) -> "ray.data.Dataset":
    """Domain blocklist with subdomain inheritance (ops/blocklist.py):
    a `spam.example` entry blocks `news.spam.example` too, the way real
    crawl blocklists behave.  The plant spreads docs over two-level and
    three-level hosts; the operator extracts hosts vectorized (one RE2
    kernel), probes every >= 2-label domain suffix against the list
    (one index_in per depth level), and emits decision-as-data
    (blocked / blocked_by, most-specific entry wins).  Broadcast path
    at this scale; the narrow suffix fan-out anti-join path is the same
    call above config.broadcast_max_rows (tests/test_blocklist.py)."""
    from .ops.blocklist import apply_blocklist

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def plant(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        sub = np.where(did % 2 == 0,
                       np.char.add(np.char.add("sub", (did % 5).astype("U2")),
                                   "."), "")
        host = np.char.add(
            sub, np.char.add(np.char.add("dom", (did % 23).astype("U3")),
                             ".example"))
        url = np.char.add(np.char.add(np.char.add("https://", host), "/p/"),
                          did.astype("U8"))
        return batch.append_column("url", pa.array(url.tolist(), pa.string()))

    planted = ds.map_batches(plant, batch_format="pyarrow",
                             zero_copy_batch=True)
    return apply_blocklist(planted, _BLOCKLIST, key_col="doc_id")


_TOP_PCT = 20


def q_top_quality_per_source(sf_dir: str) -> "ray.data.Dataset":
    """Group-relative quality gate (ops/sampling.top_pct_per_group):
    keep each source's top 20% of docs by n_chars (ties by doc_id) —
    the group-fair filter that a single global threshold gets wrong
    when domains differ in scale.  Integer-exact head size
    k_g = ceil(n_g * pct / 100) without floats; partial top-k per
    batch bounds the shuffle.  Join path above the broadcast threshold
    (tests/test_ops_ray.py)."""
    from .ops.sampling import top_pct_per_group

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])
    return top_pct_per_group(ds, group_col="source", key_col="doc_id",
                             order_col="n_chars", pct=_TOP_PCT)


_QUOTA_CHARS = 7_200  # straddles the per-source char totals at test scales


def q_domain_balanced_sample(sf_dir: str) -> "ray.data.Dataset":
    """Domain-mixture rebalancing (ops/sampling.quota_balanced_sample,
    the Pile/Dolma recipe): cap every source's expected total chars at
    a quota by deterministic hash down-sampling — under-quota sources
    keep everything, over-quota sources keep ~quota worth.  One narrow
    groupby(source).sum produces the per-domain totals; the cut map
    broadcasts into a streaming filter (join path above the threshold,
    tests/test_ops_ray.py).  Selection replays exactly: the oracle
    recomputes cut_g = quota * 2^32 // W_g in HUGEINT and the same
    Knuth hash per doc."""
    from .ops.sampling import quota_balanced_sample

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])
    return quota_balanced_sample(ds, group_col="source", key_col="doc_id",
                                 weight_col="n_chars",
                                 target_per_group=_QUOTA_CHARS)


def q_incremental_new_docs(sf_dir: str) -> "ray.data.Dataset":
    """Incremental cross-snapshot dedup against a PERSISTED exact hash
    index (ops/incremental.py) — the crawl-ingestion shape: snapshot A
    (doc_id%3==0) is ingested and its 128-bit content hashes written as
    a parquet index (16 bytes/doc); snapshot B (the full table) is then
    probed against the index and only genuinely new documents survive.
    Broadcast path at this scale; the join path is the same call above
    config.broadcast_max_rows (tests/test_incremental.py).  The Bloom
    sketch query (bloom_cross_run_dups) is the probabilistic sibling;
    this one is exact."""
    import tempfile

    from .ops.incremental import build_hash_index, dedup_against_index

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")

    def snap_a(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch["doc_id"].to_numpy() % 3 == 0))

    index_dir = tempfile.mkdtemp(prefix="ekray_hash_index_")
    build_hash_index(ds.map_batches(snap_a, batch_format="pyarrow",
                                    zero_copy_batch=True), index_dir)
    new = dedup_against_index(ds, index_dir)
    return new.select_columns(["doc_id", "lang", "source", "n_chars"])


def q_keep_best_page_per_url(sf_dir: str) -> "ray.data.Dataset":
    """Quality-aware canonical selection — the re-crawl dedup rule real
    curation uses: many captures of one logical page (the URL-spelling
    plant above), each capture carrying its own text, and the BEST
    capture wins, not the first.  Composition: canonicalize
    (ops/urlnorm) -> broadcast integer quality scoring (ops/classify,
    canon_url rides through the scorer) -> distributed group-wise
    argmax (ops/keepbest: map-side combine, bucket shuffle, no global
    sort) on (score desc, doc_id asc) — a total order, so the winner
    is unique and the row_number() oracle matches exactly."""
    from .ops.classify import model_weights, score_documents
    from .ops.keepbest import keep_best
    from .ops.urlnorm import canonicalize_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    canon = ds.map_batches(_plant_spread_urls, batch_format="pyarrow",
                           zero_copy_batch=True).map_batches(
        canonicalize_batch, batch_format="pyarrow",
        zero_copy_batch=True)
    scored = score_documents(canon, model_weights(_QMODEL_TERMS),
                             bias_micro=_QMODEL_BIAS,
                             keep_cols=["canon_url"])
    best = keep_best(scored.select_columns(
        ["doc_id", "canon_url", "score_micro"]),
        key_col="canon_url", order_cols=["score_micro", "doc_id"],
        descending=[True, False])
    return best.select_columns(["doc_id", "canon_url", "score_micro"])


def q_heavy_hitter_terms(sf_dir: str) -> pd.DataFrame:
    """Heavy-hitter terms via mergeable Misra-Gries partials (Agarwal
    et al., Mergeable Summaries) — the frequency member of the sketch
    family next to Bloom (membership) and HLL (distinct).  One
    streaming pass, per-block exact counter -> MG compress, tree-merge.
    Exactness condition (documented in ops/sketches.heavy_hitters):
    capacity 64 exceeds the corpus vocabulary, so no compression
    triggers and the result is the exact top-10 the SQL oracle
    computes; the lossy regime's n/(capacity+1) bound is unit-tested."""
    from .ops.sketches import heavy_hitters

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def tok(batch: pa.Table):
        for t in batch["text"].to_pylist():
            yield from (t or "").split()

    return heavy_hitters(ds, col_tokens=tok, capacity=64, topk=10)


def q_pagerank_links(sf_dir: str) -> "ray.data.Dataset":
    """Distributed PageRank (integer-exact variant, ops/pagerank.py):
    the canonical iterative web-graph algorithm as K rounds of
    shuffle-join + groupby-sum over a closed-form link graph (each doc
    links to (id*7+1)%N, (id*13+2)%N, (id*29+3)%N — three out-edges,
    row-local dedup).  Micro-unit integer arithmetic with per-edge
    floor division makes every iteration order-free, so the chained-
    CTE DuckDB oracle matches bit-for-bit — the float variant is
    famously un-oracle-able across engines (summation order)."""
    from .ops.pagerank import pagerank_int

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    n = ds.count()

    def mk_edges(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        src = np.tile(did, 3)
        dst = np.concatenate([(did * 7 + 1) % n, (did * 13 + 2) % n,
                              (did * 29 + 3) % n])
        pairs = np.unique(np.column_stack([src, dst]), axis=0)
        return pa.table({"src": pa.array(pairs[:, 0], pa.int64()),
                         "dst": pa.array(pairs[:, 1], pa.int64())})

    edges = ds.map_batches(mk_edges, batch_format="pyarrow",
                           zero_copy_batch=True)
    return pagerank_int(edges, n_iters=3)


def q_pagerank_dangling(sf_dir: str) -> "ray.data.Dataset":
    """PageRank with dangling-mass redistribution (round-4 verdict #8):
    only docs with doc_id % 3 != 0 emit out-edges, so a third of the
    graph is dangling destinations; each round their damped mass is
    split evenly across all nodes (integer share formula, one bounded
    scalar collect per round).  Same chained-CTE oracle extended with a
    per-iteration dangling-sum CTE — still bit-exact."""
    from .ops.pagerank import pagerank_int

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    n = ds.count()

    def mk_edges(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        did = did[did % 3 != 0]
        src = np.tile(did, 2)
        dst = np.concatenate([(did * 7 + 1) % n, (did * 13 + 2) % n])
        pairs = np.unique(np.column_stack([src, dst]), axis=0)
        return pa.table({"src": pa.array(pairs[:, 0], pa.int64()),
                         "dst": pa.array(pairs[:, 1], pa.int64())})

    edges = ds.map_batches(mk_edges, batch_format="pyarrow",
                           zero_copy_batch=True)
    return pagerank_int(edges, n_iters=3, redistribute_dangling=True)


def q_hits_links(sf_dir: str) -> "ray.data.Dataset":
    """Distributed HITS (ops/hits.py) over the same closed-form link
    graph as pagerank_links: per half-step one narrow join + one
    groupby-sum + one bounded L1-total collect.  L1 (not L2)
    normalization keeps every operand integral, so the chained-CTE
    oracle matches bit-for-bit — same determinism family as
    pagerank_links (textbook L2 HITS is un-oracle-able: sqrt + float
    summation order)."""
    from .ops.hits import hits_int

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    n = ds.count()

    def mk_edges(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        src = np.tile(did, 3)
        dst = np.concatenate([(did * 7 + 1) % n, (did * 13 + 2) % n,
                              (did * 29 + 3) % n])
        pairs = np.unique(np.column_stack([src, dst]), axis=0)
        return pa.table({"src": pa.array(pairs[:, 0], pa.int64()),
                         "dst": pa.array(pairs[:, 1], pa.int64())})

    edges = ds.map_batches(mk_edges, batch_format="pyarrow",
                           zero_copy_batch=True)
    return hits_int(edges, n_iters=2)


def q_link_hops(sf_dir: str) -> "ray.data.Dataset":
    """Multi-source BFS crawl-depth labeling (ops/bfs.py) over the
    shared closed-form link graph: seeds are every 97th doc, every
    node reachable within 3 hops gets its shortest hop count.  Per
    round ONE frontier join + ONE groupby-distinct; hop counts are
    exact int64 so the chained-CTE oracle is hash-exact."""
    from .ops.bfs import bfs_hops

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    n = ds.count()

    def mk_edges(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        src = np.tile(did, 3)
        dst = np.concatenate([(did * 7 + 1) % n, (did * 13 + 2) % n,
                              (did * 29 + 3) % n])
        pairs = np.unique(np.column_stack([src, dst]), axis=0)
        return pa.table({"src": pa.array(pairs[:, 0], pa.int64()),
                         "dst": pa.array(pairs[:, 1], pa.int64())})

    edges = ds.map_batches(mk_edges, batch_format="pyarrow",
                           zero_copy_batch=True)
    def mk_seeds(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        return pa.table({"node": pa.array(did[did % 97 == 0], pa.int64())})

    seeds = ds.map_batches(mk_seeds, batch_format="pyarrow",
                           zero_copy_batch=True)
    return bfs_hops(edges, seeds, max_hops=3)


def q_link_triangles(sf_dir: str) -> "ray.data.Dataset":
    """Per-node triangle participation (ops/triangles.py) over the
    shared closed-form link graph, undirected: degree-ordered wedge
    generation (Suri & Vassilvitskii MPC shape — hub-skew-proof) plus
    one fused-key closing join.  Pure set counting, so the canonical
    a<b<c three-way-join oracle is hash-exact."""
    from .ops.triangles import triangle_counts

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    n = ds.count()

    def mk_edges(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        src = np.tile(did, 3)
        dst = np.concatenate([(did * 7 + 1) % n, (did * 13 + 2) % n,
                              (did * 29 + 3) % n])
        pairs = np.unique(np.column_stack([src, dst]), axis=0)
        return pa.table({"src": pa.array(pairs[:, 0], pa.int64()),
                         "dst": pa.array(pairs[:, 1], pa.int64())})

    edges = ds.map_batches(mk_edges, batch_format="pyarrow",
                           zero_copy_batch=True)
    return triangle_counts(edges)


_FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel_conversion(sf_dir: str) -> "ray.data.Dataset":
    """Per-user funnel depth over the events stream (ops/funnel.py):
    view -> click -> purchase via ONE bucket shuffle + a vectorized
    chained-min scan per bucket (masked minimum.reduceat over user
    segments — no joins, no per-user Python).  Exact int64 microsecond
    comparisons make the chained-CTE oracle hash-exact."""
    from .ops.funnel import funnel_steps

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])
    return funnel_steps(ds, _FUNNEL_STEPS)


def q_cohort_retention(sf_dir: str) -> "ray.data.Dataset":
    """Daily cohort-retention triangle over the events stream
    (ops/cohort.py): distinct user-days -> per-user min day ->
    (cohort_day, day_offset) cell counts.  Narrow int64 triples ride
    every shuffle; broadcast-or-join guarded cohort re-attach."""
    from .ops.cohort import cohort_retention

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    return cohort_retention(ds)


def q_rollup_doc_metrics(sf_dir: str) -> "ray.data.Dataset":
    """GROUP BY ROLLUP(source, lang) doc counters in ONE shuffle
    (ops/rollup.py): map-side emits all three rollup levels as encoded
    partials, a single groupby merges them, rolled slots decode to
    SQL-style NULLs."""
    from .ops.rollup import rollup_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "lang", "n_chars"])
    return rollup_aggregate(ds, ["source", "lang"], ["n_chars"],
                            count_alias="n_docs")


def q_rank_in_source(sf_dir: str) -> "ray.data.Dataset":
    """RANK() OVER (PARTITION BY source ORDER BY n_chars DESC) without
    a corpus sort (ops/grouprank.py): (source, n_chars) histogram ->
    bucketed prefix-sum -> broadcast-or-join re-attach."""
    from .ops.grouprank import rank_in_group

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])
    return rank_in_group(ds, group_col="source", value_col="n_chars")


_LEN_QS = {"p50": 500_000, "p90": 900_000, "p99": 990_000}


def q_length_quantiles_by_lang(sf_dir: str) -> "ray.data.Dataset":
    """Exact p50/p90/p99 doc-length per lang from the (lang, n_chars)
    histogram (ops/quantiles.py) — integer rank rule, no corpus sort;
    the oracle spells the same rule over a ROW_NUMBER window."""
    from .ops.quantiles import group_quantiles

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])
    return group_quantiles(ds, group_col="lang", value_col="n_chars",
                           qs_micro=_LEN_QS)


_COOC_TERMS = ["data", "stream", "value", "vector", "pipeline", "small",
               "the", "of", "index", "batch"]


def q_term_cooccurrence(sf_dir: str) -> "ray.data.Dataset":
    """Doc-level term-pair lift over documents (ops/cooccur.py): one
    presence-matmul per batch, |T|^2 partial triples per shuffle,
    Python-int lift vs the oracle's HUGEINT."""
    from .ops.cooccur import term_cooccurrence

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    return term_cooccurrence(ds, _COOC_TERMS)


def q_weighted_doc_sample(sf_dir: str) -> "ray.data.Dataset":
    """Length-biased deterministic doc sample (ops/sampling.py
    weighted_sample): integer priority hash*1e6 // (n_chars+1), global
    top-100 via per-batch partial heads + one constant-key fold."""
    from .ops.sampling import weighted_sample

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])
    ds = ds.map_batches(
        lambda b: b.append_column(
            "w", pa.compute.add(b["n_chars"], 1).cast(pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True)
    return weighted_sample(ds, key_col="doc_id", weight_col="w", n=100)


def q_chunk_spans(sf_dir: str) -> "ray.data.Dataset":
    """Sliding training-window fan-out over documents
    (ops/chunking.py): W=256 S=128 spans from n_chars, pure streaming
    flat emit — zero shuffles, narrow int64 output."""
    from .ops.chunking import chunk_spans

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])
    return chunk_spans(ds, size_col="n_chars", window=256, stride=128)


def q_snapshot_diff(sf_dir: str) -> "ray.data.Dataset":
    """Cross-snapshot url diff (ops/snapshot.py): two deterministic
    snapshot views of documents (old = doc_id % 7 != 0; new =
    doc_id % 5 != 0 with every doc_id % 3 == 0 text revised) classified
    new/deleted/changed/same via the one-groupby full-outer fold."""
    from .ops.snapshot import snapshot_diff

    base = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def old_view(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b["doc_id"].to_numpy() % 7 != 0))

    def new_view(b: pa.Table) -> pa.Table:
        b = b.filter(pa.array(b["doc_id"].to_numpy() % 5 != 0))
        rev = b["doc_id"].to_numpy() % 3 == 0
        text = pc.if_else(pa.array(rev),
                          pc.binary_join_element_wise(
                              b["text"].cast(pa.string()), " v2", ""),
                          b["text"].cast(pa.string()))
        return pa.table({"doc_id": b["doc_id"], "text": text})

    old = base.map_batches(old_view, batch_format="pyarrow",
                           zero_copy_batch=True)
    new = base.map_batches(new_view, batch_format="pyarrow",
                           zero_copy_batch=True)
    return snapshot_diff(old, new, key_col="doc_id")


def q_cocitation_links(sf_dir: str) -> "ray.data.Dataset":
    """Co-citation pair counts (ops/cocitation.py) over the shared
    closed-form link graph: source-side wedge expansion (shifted-array
    vectorized), pairs co-cited by >= 2 sources."""
    from .ops.cocitation import cocitation_counts

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    n = ds.count()

    def mk_edges(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        src = np.tile(did, 3)
        dst = np.concatenate([(did * 7 + 1) % n, (did * 13 + 2) % n,
                              (did * 29 + 3) % n])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    edges = ds.map_batches(mk_edges, batch_format="pyarrow",
                           zero_copy_batch=True)
    return cocitation_counts(edges, min_count=2)


def q_zorder_events(sf_dir: str) -> "ray.data.Dataset":
    """Morton locality keys over (user, hour) for events
    (ops/zorder.py): 12-bit dims, 6-bit tile bucket — the layout pass
    that makes 2-D range scans partition-prunable.  Pure streaming,
    zero shuffles."""
    from .ops.zorder import zorder_keys

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts"])

    def dims(b: pa.Table) -> pa.Table:
        ts = (b["ts"].cast(pa.timestamp("us")).to_numpy()
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "event_id": b["event_id"],
            "ux": pa.array(b["user_id"].to_numpy() & 0xFFF, pa.int64()),
            "hy": pa.array((ts // 3_600_000_000) & 0xFFF, pa.int64()),
        })

    ds = ds.map_batches(dims, batch_format="pyarrow", zero_copy_batch=True)
    return zorder_keys(ds, x_col="ux", y_col="hy", bits=12, bucket_bits=6)


def q_docs_above_p90(sf_dir: str) -> "ray.data.Dataset":
    """Per-lang top-decile length gate (ops/quantiles.py composition):
    histogram-exact p90 cut per lang, broadcast-or-join re-attach,
    corpus rides at most one shuffle."""
    from .ops.quantiles import filter_above_group_quantile

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])
    return filter_above_group_quantile(ds, group_col="lang",
                                       value_col="n_chars",
                                       q_micro=900_000)


def q_event_transitions(sf_dir: str) -> "ray.data.Dataset":
    """Global Markov transition matrix over per-user event streams
    (ops/transitions.py): user-bucket shuffle, one vectorized
    shifted-array pass per bucket, LEAD-window oracle."""
    from .ops.transitions import transition_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    return transition_counts(ds)


def q_daily_activity(sf_dir: str) -> "ray.data.Dataset":
    """Daily active/new/returning user counts (ops/cohort.py
    daily_activity) — same distinct user-day + cohort machinery as
    cohort_retention, grouped by calendar day instead of cohort cell."""
    from .ops.cohort import daily_activity

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    return daily_activity(ds)


def q_reciprocal_links(sf_dir: str) -> "ray.data.Dataset":
    """Mutual-link pairs over the shared closed-form link graph
    (ops/cocitation.reciprocal_links): row-local canonicalization +
    ONE direction-flag groupby — a single corpus-keyed shuffle."""
    from .ops.cocitation import reciprocal_links

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    n = ds.count()

    def mk_edges(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        src = np.tile(did, 3)
        dst = np.concatenate([(did * 7 + 1) % n, (did * 13 + 2) % n,
                              (did * 29 + 3) % n])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    edges = ds.map_batches(mk_edges, batch_format="pyarrow",
                           zero_copy_batch=True)
    return reciprocal_links(edges)


def q_cube_doc_metrics(sf_dir: str) -> "ray.data.Dataset":
    """GROUP BY CUBE(source, lang) doc counters — all four grouping
    subsets in the same ONE shuffle as rollup_doc_metrics
    (ops/rollup.py mode='cube')."""
    from .ops.rollup import rollup_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "lang", "n_chars"])
    return rollup_aggregate(ds, ["source", "lang"], ["n_chars"],
                            count_alias="n_docs", mode="cube")


def q_user_active_time(sf_dir: str) -> "ray.data.Dataset":
    """Per-user active-time accounting (ops/intervals.py): each event
    opens a 30-minute activity window; overlapping windows merge
    (gaps-and-islands) into sessions.  One 24-byte-row bucket shuffle,
    per-bucket vectorized sweep; windowed MAX-OVER oracle."""
    from .ops.intervals import interval_union_per_key

    window_us = 1_800_000_000  # 30 min
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def to_iv(batch: pa.Table) -> pa.Table:
        s = (batch["ts"].cast(pa.timestamp("us")).to_numpy()
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({"user_id": batch["user_id"].cast(pa.int64()),
                         "s": pa.array(s, pa.int64()),
                         "e": pa.array(s + window_us, pa.int64())})

    out = interval_union_per_key(
        ds.map_batches(to_iv, batch_format="pyarrow",
                       zero_copy_batch=True),
        key_col="user_id", start_col="s", end_col="e")
    return out.map_batches(
        lambda t: t.rename_columns(["user_id", "n_sessions", "active_us"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_customer_running_spend(sf_dir: str) -> "ray.data.Dataset":
    """Per-customer running spend (ops/running.py): every order row +
    the cumulative cents its customer has spent up to it, ordered by
    (order date, order key).  The per-key windowed prefix-sum sibling
    of token_budget_select's global scan; SUM-OVER oracle."""
    from .ops.running import running_total

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def to_rows(batch: pa.Table) -> pa.Table:
        od = (batch["o_orderdate"].cast(pa.timestamp("us")).to_numpy()
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({"o_custkey": batch["o_custkey"].cast(pa.int64()),
                         "od_us": pa.array(od, pa.int64()),
                         "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
                         "spend_cents": cents(batch["o_totalprice"])})

    rows = ds.map_batches(to_rows, batch_format="pyarrow",
                          zero_copy_batch=True)
    return running_total(rows, key_col="o_custkey",
                         order_cols=["od_us", "o_orderkey"],
                         value_col="spend_cents", out_col="running_cents")


def q_cms_user_counts(sf_dir: str) -> pa.Table:
    """Count-Min sketched per-user event counts (ops/cms.py): one
    map-side bincount pass + a d*width-bounded slot groupby; probes
    user ids 0..199 against the collected constant-size matrix.  The
    fixed multiplicative hash rows make the DuckDB oracle replay the
    ESTIMATE exactly, collisions included (width 256 < user count at
    sf0.1, so collisions genuinely occur there)."""
    from .ops.cms import cms_probe_counts

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])
    return cms_probe_counts(ds, key_col="user_id",
                            probes=np.arange(200, dtype=np.int64),
                            depth=4, width=256,
                            probe_col="user_id", est_col="est_n")


_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def q_event_type_pivot(sf_dir: str) -> "ray.data.Dataset":
    """Per-user behavior vector (ops/pivot.py): long event stream ->
    one wide row per user with a count column per event type.  One
    vectorized crosstab per batch (map-side combine), ONE key groupby
    summing the k int64 columns; FILTER-clause oracle."""
    from .ops.pivot import pivot_counts

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return pivot_counts(ds, key_col="user_id", cat_col="event_type",
                        categories=_EVENT_TYPES)


def q_dominant_lang_per_source(sf_dir: str) -> "ray.data.Dataset":
    """Group-wise MODE by composition: (source, lang) counts via one
    groupby, then ops/keepbest.keep_best picks each source's most
    frequent language (ties -> smallest lang, a total order, so the
    row_number oracle replays the winner exactly)."""
    from ray.data.aggregate import Count

    from .ops.keepbest import keep_best

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "lang"])
    counts = ds.groupby(["source", "lang"]).aggregate(
        Count(alias_name="n"))
    return keep_best(counts, key_col="source", order_cols=["n", "lang"],
                     descending=[True, False])


def q_corpus_checksum(sf_dir: str) -> pa.Table:
    """Order-invariant corpus checksum (ops/checksum.py): sum of 60-bit
    md5 row hashes mod 2^61-1 via a constant-size block-accumulate +
    tree-merge AggregateFn — the migration-validation primitive (equal
    outputs <=> equal (doc_id, text) multisets, mod collisions)."""
    from .ops.checksum import corpus_checksum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return corpus_checksum(ds, cols=["doc_id", "text"])


def q_revenue_by_nation(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q5-style multi-join chain: lineitem (read filtered on
    l_shipdate — the FIRST query exercising read_parquet(filter=...)
    row-group pruning) -> hash join orders -> hash join customer ->
    25-row nation broadcast -> map-side centicent rollup + one tiny
    groupby.  Two big-big exchanges sharing the 8-partition default;
    revenue integerized per row (the revenue_by_brand convention).
    At real 100 TB scale the centicent sums need the HUGEINT-headroom
    treatment documented for pagerank (int64 holds to ~SF 10^4)."""
    import datetime as _dt

    import ray as _ray

    cutoff = _dt.datetime(1996, 1, 1)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate")
                >= pa.scalar(cutoff, pa.timestamp("us"))))

    def to_rev(batch: pa.Table) -> pa.Table:
        price_c = cents(batch["l_extendedprice"])
        disc_pct = cents(batch["l_discount"])
        centicents = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "centicents": centicents})

    li = li.map_batches(to_rev, batch_format="pyarrow",
                        zero_copy_batch=True)
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    j1 = li.join(orders, join_type="inner", num_partitions=8,
                 on=("l_orderkey",), right_on=("o_orderkey",))
    customer = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                     columns=["c_custkey", "c_nationkey"])
    j2 = j1.join(customer, join_type="inner", num_partitions=8,
                 on=("o_custkey",), right_on=("c_custkey",))

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    name_by_key = dict(zip(nation["n_nationkey"].to_pylist(),
                           nation["n_name"].to_pylist()))
    name_ref = _ray.put(name_by_key)

    class NationRollup:
        def __init__(self):
            self.name_by_key = _ray.get(name_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            names = [self.name_by_key.get(k, "")
                     for k in batch["c_nationkey"].to_pylist()]
            g = (pa.table({"n_name": pa.array(names, pa.string()),
                           "one": pa.array([1] * len(batch), pa.int64()),
                           "centicents": batch["centicents"]})
                 .group_by("n_name")
                 .aggregate([("one", "sum"), ("centicents", "sum")]))
            return g.rename_columns(
                ["n_name", "n_items", "revenue_centicents"])

    partials = j2.map_batches(NationRollup, batch_format="pyarrow",
                              zero_copy_batch=True, **_pool())
    return partials.groupby("n_name").aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("revenue_centicents", alias_name="revenue_centicents"))


def q_profile_documents(sf_dir: str) -> pa.Table:
    """ANALYZE-style table profile (ops/profile.py): per-column
    row/null counts, EXACT distinct counts and typed min/max over the
    documents table — stats pass is pure map-side combine; the
    distinct pass's (col, val) exchange is the one exact-ANALYZE
    shuffle.  UNION-ALL-of-aggregates oracle."""
    from .ops.profile import profile_table

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "n_chars", "lang", "source"])
    return profile_table(ds, int_cols=["doc_id", "n_chars"],
                         str_cols=["lang", "source"])


_QMODEL_TERMS = ["data", "stream", "value", "the", "of", "vector",
                 "small", "pipeline"]
_QMODEL_BIAS = -500_000


def q_quality_model_scores(sf_dir: str) -> "ray.data.Dataset":
    """Broadcast linear classifier scoring (the batched model-inference
    pattern: fastText-style quality/domain classifiers over billions of
    docs).  Deterministic integer micro-weights ship via ray.put once,
    each batch scores with ONE vectorized tf-matrix matmul
    (ops/classify.py); integer scores make the SQL oracle (token
    unnest + weight join + SUM) bit-exact.  Swapping the toy weight
    vector for a real embedding matrix changes nothing about the Ray
    plumbing — that is the point of the operator."""
    from .ops.classify import model_weights, score_documents

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return score_documents(ds, model_weights(_QMODEL_TERMS),
                           bias_micro=_QMODEL_BIAS)


def q_repetition_signals(sf_dir: str) -> "ray.data.Dataset":
    """Gopher-style repetition filter signals: duplicated 2/3-gram
    character fractions + top-2-gram count fraction.  One stateless
    map_batches; docs with doc_id % 6 == 0 get a planted repeated
    phrase so high-repetition scores actually occur.  Each ratio is a
    single int/int IEEE division, so the SQL oracle is bit-exact."""
    from .ops.textops import repetition_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        did = batch["doc_id"].to_numpy()
        suf = np.where(did % 6 == 0, " buy now click here" * 8, "")
        aug = pc.binary_join_element_wise(batch["text"], pa.array(suf), "")
        return batch.set_column(batch.schema.get_field_index("text"),
                                "text", aug)

    return ds.map_batches(plant, batch_format="pyarrow",
                          zero_copy_batch=True).map_batches(
        repetition_batch, batch_format="pyarrow", zero_copy_batch=True)


def q_dedup_paragraphs(sf_dir: str) -> "ray.data.Dataset":
    """Corpus-wide paragraph dedup (Lee-et-al-style exact substring
    dedup at paragraph granularity): repeated paragraphs keep only
    their first occurrence; docs are rebuilt from survivors.  The
    corpus's organic near-dup docs (one-word edits) share most of
    their planted paragraphs, so drops are non-trivial.  Two compact-
    key shuffles; skew-guarded by Ray's partial aggregation
    (ops/paradedup.py)."""
    from .ops.paradedup import dedup_paragraphs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    planted = ds.map_batches(_plant_paragraphs_batch, batch_format="pyarrow",
                             zero_copy_batch=True)
    return dedup_paragraphs(planted)


def q_normalize_text(sf_dir: str) -> "ray.data.Dataset":
    """Unicode canonicalization (NFC + control strip) — the pass that
    precedes hashing/dedup so byte-different spellings collapse.  One
    stateless vectorized map_batches; DuckDB's nfc_normalize +
    regexp_replace mirror it byte-exactly (ops/normalize.py)."""
    from .ops.normalize import normalize_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(_plant_unicode_batch, batch_format="pyarrow",
                          zero_copy_batch=True).map_batches(
        normalize_batch, batch_format="pyarrow", zero_copy_batch=True)


def q_pii_redact(sf_dir: str) -> "ray.data.Dataset":
    """PII scrub — the C4/Gopher-style mask pass a web corpus gets
    before tokenization: emails -> <EMAIL>, IPv4 -> <IP>, phones ->
    <PHONE>, plus per-category counts.  Single stateless map_batches
    over zero-copy Arrow; every kernel is pyarrow.compute's RE2, which
    is the same regex engine DuckDB uses, so the oracle comparison is
    byte-exact.  No shuffle — embarrassingly parallel at any scale."""
    from .ops.redact import redact_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(_plant_pii_batch, batch_format="pyarrow",
                          zero_copy_batch=True).map_batches(
        redact_batch, batch_format="pyarrow", zero_copy_batch=True)


_CURATE_MIN_TOKENS = 20
_CURATE_MAX_DUP2 = 0.2
# 12 distinct words: passes both filters, so the planted dup cluster
# reaches the dedup stage intact
_CURATE_CONST = ("alpha bravo charlie delta echo foxtrot "
                 "golf hotel india juliet kilo lima")


def _plant_curation_batch(batch: pa.Table) -> pa.Table:
    """Two deterministic plants for the curation chain: doc_id%11==3
    docs become one shared constant text (an exact-dup cluster for the
    dedup stage — the corpus has no organic exact dups), and doc_id%6==0
    docs get the repeated spam phrase (fodder for the repetition
    filter).  The oracle replays both via CASE/repeat()."""
    import pyarrow.compute as pc

    did = batch["doc_id"].to_numpy()
    base = pc.if_else(pa.array(did % 11 == 3), pa.scalar(_CURATE_CONST),
                      batch["text"])
    suf = pa.array(np.where(did % 6 == 0, " buy now click here" * 8, ""))
    aug = pc.binary_join_element_wise(base, suf, "")
    return batch.set_column(batch.schema.get_field_index("text"), "text", aug)


def _curate_keep(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    mask = pc.and_(
        pc.greater_equal(batch["n_tokens_ws"],
                         pa.scalar(_CURATE_MIN_TOKENS, pa.int64())),
        pc.less_equal(batch["dup2_frac"], pa.scalar(_CURATE_MAX_DUP2)))
    return batch.filter(mask)


def q_curate_corpus(sf_dir: str) -> "ray.data.Dataset":
    """The composed curation chain — the pipeline a pre-training corpus
    actually runs, as ONE streaming Dataset: quality/repetition signals
    (fused single pass) -> threshold filter -> corpus-wide exact dedup
    (first occurrence wins) -> next-fit sequence packing into token
    bins.  Every stage is the already-oracled operator; composing them
    proves the stages stream into each other without materialization.
    Scale shape: two narrow map_batches + filter (no shuffle), then
    dedup's compact-key shuffle, then packing's bucket shuffle —
    full text never moves after the dedup keep-decision.

    STAGE-ORDER CONTRACT: exact dedup runs BEFORE any near-dup (LSH/
    SimHash) stage a user appends to this chain.  The hot-bucket cap
    in ops/dedup._expand_member_pairs relies on it — with true
    duplicates already removed here, a degenerate LSH bucket can only
    be a near-dup mega-cluster, where the capped core+star expansion
    is the standard trade (tests/test_pipeline_ray.py pins the
    ordering)."""
    from .ops.dedup import exact_dedup
    from .ops.packing import next_fit_pack
    from .ops.textops import curate_signals_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "text"])
    sig = ds.map_batches(_plant_curation_batch, batch_format="pyarrow",
                         zero_copy_batch=True).map_batches(
        curate_signals_batch, batch_format="pyarrow", zero_copy_batch=True)
    kept = sig.map_batches(_curate_keep, batch_format="pyarrow",
                           zero_copy_batch=True)
    deduped = exact_dedup(kept)
    sized = deduped.drop_columns(["text", "dup2_frac"])
    return next_fit_pack(sized, size_col="n_tokens_ws").select_columns(
        ["doc_id", "source", "shard", "n_tokens_ws", "bin_id"])


_LATEST_BUCKETS = 32


def _keep_latest_events(df: pd.DataFrame) -> pd.DataFrame:
    """Newest (ts, event_id) row per user — stable sort then keep-last,
    so the tie-break is deterministic and matches the oracle's
    ORDER BY ts DESC, event_id DESC."""
    g = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    return g.drop_duplicates("user_id", keep="last")


def q_latest_event_per_user(sf_dir: str) -> "ray.data.Dataset":
    """Keep-latest-per-key (the WARC re-crawl dedup shape: newest
    capture per url wins), as group-wise argmax.  Scale shape: a
    map-side combine FIRST — each batch reduces to at most one row per
    distinct user in it — so the bucket shuffle moves <= n_batches x
    users-per-batch rows, not the raw table; then one hash-bucket
    groupby with a vectorized keep-latest per bucket.  No global sort."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"])
    partial = ds.map_batches(_keep_latest_events, batch_format="pandas")

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = batch["user_id"].to_numpy() % _LATEST_BUCKETS
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    return (partial.map_batches(add_bucket, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(_keep_latest_events, batch_format="pandas")
            .drop_columns(["bucket"]))


_TOKEN_BUDGET = 10_000


def q_token_budget_select(sf_dir: str) -> "ray.data.Dataset":
    """Token-budget corpus selection: "take the longest documents until
    the budget is spent" — a global ORDER BY + running SUM + cutoff via
    the distributed prefix scan in ops/prefix.py (range-partitioned
    sort, ONE int64 per block to the driver, budget-pruned per-block
    cutoff tasks).  The emitted running total is part of the result, so
    the oracle checks the scan itself, not just the selection."""
    from .ops.prefix import budget_select

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    counted = ds.map_batches(token_count_batch,
                             batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens_ws"])
    return budget_select(counted, value_col="n_tokens_ws",
                         budget=_TOKEN_BUDGET,
                         sort_cols=["n_tokens_ws", "doc_id"],
                         descending=[True, False], cum_col="cum_tokens")


def q_lm_surprisal_scores(sf_dir: str) -> "ray.data.Dataset":
    """CCNet-style statistical-LM quality scoring (ops/lm.py): bigram +
    unigram counts over a deterministic 10% reference slice
    (doc_id%10==0 — the oracle replays it), then every doc scored by
    integer inverse-conditional-probability surprisal.  Broadcast path
    at this scale; the join path is the same call above
    config.broadcast_max_rows (exercised in tests/test_lm.py)."""
    from .ops.lm import surprisal_scores

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def ref_slice(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch["doc_id"].to_numpy() % 10 == 0))

    ref = ds.map_batches(ref_slice, batch_format="pyarrow",
                         zero_copy_batch=True)
    return surprisal_scores(ds, ref)


def q_dup_window_stats(sf_dir: str) -> "ray.data.Dataset":
    """Substring-level duplicated-window detection (ops/dupspans.py,
    Lee et al. 2021 "Deduplicating Training Data" windowed variant):
    per doc, how many of its 8-token windows occur more than once
    corpus-wide and how many token positions fall under at least one
    such window (the duplicated-text-fraction filter signal).
    Broadcast path at this scale; the join path is the same call above
    config.broadcast_max_rows (exercised in tests/test_dupspans.py)."""
    from .ops.dupspans import duplicated_spans

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return duplicated_spans(ds, key_col="doc_id", k=8)


_WEBCURATE_MIN_TOKENS = 15
# 16 distinct single-spaced words: survives html-escape + extraction
# verbatim (collapse is identity on it) and passes the length filter,
# so the planted cluster reaches the dedup stage intact
_WEBCURATE_CONST = ("zulu yankee xray whiskey victor uniform tango sierra "
                    "romeo quebec papa oscar november mike lima kilo")


def _plant_web_dups(batch: pa.Table) -> pa.Table:
    """doc_id%9==4 docs share one constant text — an exact-dup cluster
    planted BEFORE the html wrap, so the duplicates the chain must
    catch are duplicates of EXTRACTED text (the corpus has no organic
    exact dups)."""
    did = batch["doc_id"].to_numpy()
    text = pc.if_else(pa.array(did % 9 == 4), pa.scalar(_WEBCURATE_CONST),
                      batch["text"])
    return batch.set_column(batch.schema.get_field_index("text"), "text", text)


def q_curate_webpages(sf_dir: str) -> "ray.data.Dataset":
    """The web-scale headline chain END-TO-END as one streaming
    Dataset: html pages in -> extracted text -> token counting ->
    length filter -> corpus-wide exact dedup -> curated docs out.
    This is the composition the north rule describes (extraction) fused
    with the curation the corpus role needs, SQL-checked byte-identical
    per url: the extractor's whitespace collapse is the only text
    transform, dedup is first-wins on the EXTRACTED bytes.

    Scale shape: three narrow map stages (extract pool, id parse,
    count) + a filter — no shuffle touches html or text; the only
    all-to-all is exact_dedup's 24-byte (hash128, key) exchange."""
    from .ops.dedup import exact_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    pages = ds.map_batches(_plant_web_dups, batch_format="pyarrow",
                           zero_copy_batch=True).map_batches(
        _wrap_docs_batch, batch_format="pyarrow", zero_copy_batch=True)
    extracted = pages.map_batches(
        HtmlExtractor, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64, **_pool())
    docs = extracted.map_batches(_doc_id_from_url, batch_format="pyarrow")
    counted = docs.map_batches(token_count_batch, batch_format="pyarrow")
    kept = counted.filter(expr=f"n_tokens_ws >= {_WEBCURATE_MIN_TOKENS}")
    return exact_dedup(kept).select_columns(
        ["doc_id", "text", "n_tokens_ws"])


_KMEANS_K = 8
_KMEANS_ITERS = 3


def q_kmeans_clusters(sf_dir: str) -> "ray.data.Dataset":
    """Distributed integer-exact k-means (ops/kmeans.py): Lloyd rounds
    as broadcast-centroid map passes emitting k tiny partial rows per
    block — the corpus never shuffles.  The quantization/floor-division
    contract (module docstring) makes the chained-CTE DuckDB oracle
    reproduce every round bit-for-bit, same determinism family as
    pagerank_links — float k-means is un-oracle-able across engines."""
    from .ops.kmeans import kmeans_labels

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return kmeans_labels(ds, k=_KMEANS_K, n_iters=_KMEANS_ITERS)


def _plant_semdedup_copies(batch: pa.Table) -> pa.Table:
    """Exact copies both ABOVE and BELOW the original key range:
    vec_id % 20 == 0 -> twin at +_PLANT_OFFSET (copy must drop),
    vec_id % 20 == 10 -> twin at -_PLANT_OFFSET (ORIGINAL must drop) —
    so the oracle genuinely tests keep-min-key semantics, not just
    'planted rows vanish'."""
    import pyarrow.compute as pc

    ids = batch["vec_id"].to_numpy()
    hi = batch.filter(pa.array(ids % 20 == 0))
    hi = hi.set_column(hi.schema.get_field_index("vec_id"), "vec_id",
                       pc.add(hi["vec_id"], _PLANT_OFFSET))
    lo = batch.filter(pa.array(ids % 20 == 10))
    lo = lo.set_column(lo.schema.get_field_index("vec_id"), "vec_id",
                       pc.subtract(lo["vec_id"], _PLANT_OFFSET))
    return pa.concat_tables([batch, hi, lo])


def q_semantic_dedup(sf_dir: str) -> "ray.data.Dataset":
    """SemDeDup (ops/semdedup.py): k-means clusters bound the candidate
    space, in-cluster cosine>=0.99 pairs are verified on quantized
    integer vectors, keep-min-key per component; kept keys come back as
    a streaming Dataset via a broadcast drop-list.  Exact copies always
    share a cluster (identical integer distances), and the isotropic
    corpus' organic pairwise cosine tops out ~0.5, so the planted-twin
    oracle is exact — including the keep-min direction (negative-id
    twins evict their originals)."""
    from .ops.semdedup import semantic_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    aug = ds.map_batches(_plant_semdedup_copies, batch_format="pyarrow",
                         zero_copy_batch=True)
    kept, _dropped = semantic_dedup(aug, k=_KMEANS_K, n_iters=2,
                                    threshold=0.99)
    return kept


_SPLIT_WEIGHTS = {"train": 960, "val": 25, "test": 15}


def q_dataset_split(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic train/val/test assignment (ops/sampling.hash_split):
    Knuth-hash bucket of doc_id -> consecutive weight ranges.  Stable
    under re-partitioning/resume/append (hash-based, not positional);
    one streaming pass, no shuffle; CASE-over-hash SQL mirror is exact
    over the full int64 key domain."""
    from .ops.sampling import hash_split

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    return hash_split(ds, key_col="doc_id", weights=_SPLIT_WEIGHTS)


_CHAIN_HASH_MOD = 1_000_003
_CHAIN_HASH_MULT = 2_654_435_761


def q_link_components(sf_dir: str) -> "ray.data.Dataset":
    """Connected components (ops/components.py hash-to-min, Rastogi et
    al. 2013) over a deterministic chain graph: an undirected edge
    joins doc i and i+1 unless the integer hash of i marks a break
    (~1/4 of positions), giving geometric-length islands.  The engine
    runs the generic O(log diameter)-round algorithm oblivious to the
    closed form; the oracle knows it and spells a gaps-and-islands
    window scan (component rep = last break at or before doc_id)."""
    from .ops.components import connected_components_ds

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    n = ds.count()

    def mk_edges(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        h = ((did % _CHAIN_HASH_MOD) * _CHAIN_HASH_MULT
             % 4294967296 >> 13) % 4
        keep = (h != 0) & (did + 1 < n)
        src = did[keep]
        return pa.table({"key_a": pa.array(src, pa.int64()),
                         "key_b": pa.array(src + 1, pa.int64())})

    pairs = ds.map_batches(mk_edges, batch_format="pyarrow",
                           zero_copy_batch=True)
    return connected_components_ds(pairs, ds, key_col="doc_id")


def q_ntile_by_lang(sf_dir: str) -> "ray.data.Dataset":
    """NTILE(4) length quartiles within each lang (ops/ntile.py): the
    (lang, composite) histogram rank from ops/grouprank.py + the NTILE
    closed form — no corpus sort.  The doc_id tiebreak makes the
    ordering total (NTILE over ties is engine-dependent)."""
    from .ops.ntile import ntile_in_group

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])
    return ntile_in_group(ds, group_col="lang", value_col="n_chars",
                          tiebreak_col="doc_id", k=4)


def q_daily_change_by_type(sf_dir: str) -> "ray.data.Dataset":
    """Day-over-day event-count deltas per type (ops/lagdiff.py): ONE
    map-side-combined count shuffle, then a broadcast-or-join attach of
    the adjacent previous day (prev = day - 1, deterministic under
    sparse days — not LAG's previous-existing-row)."""
    from .ops.lagdiff import period_over_period

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts"])

    def add_day(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"event_type": batch["event_type"],
                         "day": pa.array(us // 86_400_000_000, pa.int64())})

    return period_over_period(
        ds.map_batches(add_day, batch_format="pyarrow", zero_copy_batch=True),
        key_col="event_type", period_col="day")


def q_typo_term_pairs(sf_dir: str) -> "ray.data.Dataset":
    """FastSS deletion-neighborhood similarity join (ops/fastss.py):
    vocabulary term pairs within Levenshtein distance 2 via shared
    <=2-deletion variants + exact DP verify — one variant-keyed
    shuffle, never O(V^2); the oracle cross-joins the identically
    capped vocabulary with DuckDB's levenshtein."""
    from .ops.fastss import capped_vocab, editk_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    return editk_pairs(capped_vocab(ds))


def q_mad_outlier_docs(sf_dir: str) -> "ray.data.Dataset":
    """Robust per-lang length outliers (ops/mad.py): |n_chars - median|
    > 2 * MAD, both medians exact integer rank-rule quantiles — two
    histogram shuffles + two broadcast-or-join attaches, no corpus
    sort, hash-exact vs the double-ROW_NUMBER oracle."""
    from .ops.mad import mad_outliers

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])
    return mad_outliers(ds, group_col="lang", value_col="n_chars",
                        mult=2, id_cols=("doc_id",))


def q_source_share_by_lang(sf_dir: str) -> "ray.data.Dataset":
    """Ratio-to-report (ops/share.py): each source's share of its
    lang's docs in integer basis points — ONE corpus count shuffle,
    parent totals re-aggregated from the tiny count table."""
    from .ops.share import share_of_group

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "source"])
    return share_of_group(ds, group_col="lang", sub_col="source")


def q_corr_moments_by_lang(sf_dir: str) -> "ray.data.Dataset":
    """Bivariate moment sketch (ops/moments.py): exact int64 sufficient
    statistics for corr(n_chars, n_tokens) per lang in one map-side-
    combined pass — the float corr itself is not cross-engine
    reproducible, the six integers are."""
    from .ops.moments import group_moments

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars", "text"])
    with_tok = ds.map_batches(token_count_batch, batch_format="pyarrow")
    return group_moments(with_tok, group_col="lang",
                         x_col="n_chars", y_col="n_tokens_ws")


def q_skyline_docs(sf_dir: str) -> "ray.data.Dataset":
    """2-D Pareto frontier (ops/skyline.py): docs where no other doc
    has BOTH fewer chars and more tokens — local skyline per batch
    (vectorized group-max + running max), one small merge pass.  The
    anti-correlated orientation (minimize chars, maximize tokens) keeps
    the frontier non-trivial (~dozens of points)."""
    from .ops.skyline import skyline2d
    from .ops.textops import token_count_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars", "text"])
    with_tok = ds.map_batches(token_count_batch, batch_format="pyarrow"
                              ).select_columns(
                                  ["doc_id", "n_chars", "n_tokens_ws"])
    return skyline2d(with_tok, x_col="n_chars", y_col="n_tokens_ws",
                     maximize_x=False, maximize_y=True,
                     id_cols=("doc_id",))


def q_type_coengagement(sf_dir: str) -> "ray.data.Dataset":
    """Category co-engagement pair counts (ops/coengage.py): distinct
    (user, type) -> per-user int64 bitmask fold -> vectorized pair
    containment partials; the |C|^2/2 pair expansion never rides a
    shuffle."""
    from .ops.coengage import coengagement_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return coengagement_pairs(ds, user_col="user_id",
                              cat_col="event_type")


def q_anomalous_days(sf_dir: str) -> "ray.data.Dataset":
    """Composition: daily event counts per type (the lagdiff count
    shuffle) -> MAD outlier gate over the per-type day-count
    distribution (ops/mad.py with mult=1) — "which days were abnormal
    for this event type", the standard robust burst detector."""
    from .ops.lagdiff import daily_counts
    from .ops.mad import mad_outliers

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts"])
    counts = daily_counts(ds, key_col="event_type", ts_col="ts")
    return mad_outliers(counts, group_col="event_type", value_col="n",
                        mult=1, id_cols=("day",))


_HIST_WIDTH = 200


def q_length_histogram(sf_dir: str) -> "ray.data.Dataset":
    """Equi-width doc-length histogram per lang: bucket floor =
    n_chars // W * W — pure map-side arithmetic + ONE small groupby
    (the bucketed sibling of the exact value histograms that power
    ops/quantiles.py)."""
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def bucketize(batch: pa.Table) -> pa.Table:
        n = batch["n_chars"].to_numpy()
        return pa.table({
            "lang": batch["lang"],
            "bucket": pa.array(n // _HIST_WIDTH * _HIST_WIDTH, pa.int64()),
        })

    return (ds.map_batches(bucketize, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["lang", "bucket"])
            .aggregate(Count(alias_name="n_docs")))


def q_lexical_diversity(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc type/token counts (lexical diversity numerator and
    denominator as exact ints — the float ratio is derived driver-side
    when wanted): one streaming map_batches, no shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        toks = [t.split() if t else [] for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array([len(t) for t in toks], pa.int64()),
            "n_distinct_tokens": pa.array([len(set(t)) for t in toks],
                                          pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_embedding_norm_stats(sf_dir: str) -> "ray.data.Dataset":
    """Vector-QC norm audit (ops/quantize.py): per-label moments of
    deterministically quantized squared norms — the float boundary
    crossed with one bit-exact floor(x*scale+0.5) per element, int64
    everywhere after; flat zero-copy Arrow list math + reduceat."""
    from .ops.quantize import quantized_norm_moments

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])
    return quantized_norm_moments(ds, group_col="label",
                                  vec_col="embedding")


def q_lang_purity_by_source(sf_dir: str) -> "ray.data.Dataset":
    """Simpson concentration of each source's lang mix in exact ppm
    (ops/purity.py): one count shuffle + a bucketed per-group fold —
    the integer-determinism form of the 1 - sum(p^2) diversity index."""
    from .ops.purity import group_concentration

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "lang"])
    return group_concentration(ds, group_col="source", cat_col="lang")


_SIM_TERMS = 50


def q_source_term_similarity(sf_dir: str) -> "ray.data.Dataset":
    """Pairwise source-vocabulary dot products (ops/sparsesim.py): the
    (source, word, n) sparse vectors capped to the corpus top-50 words,
    pair partials expanded inside ONE groupby(word) — the inverted-
    index similarity join, never a dense matrix."""
    from collections import Counter

    from .ops.sparsesim import sparse_pair_dots

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for src, text in zip(batch["source"].to_pylist(),
                             batch["text"].to_pylist()):
            for w in (text or "").split():
                counts[(src, w)] += 1
        srcs = [k[0] for k in counts]
        words = [k[1] for k in counts]
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "word": pa.array(words, pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    by_src_word = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "word"]).aggregate(Sum("n", alias_name="n"))
        .materialize()  # two consumers: the top-word cap + the postings
    )
    top = (by_src_word.groupby("word").aggregate(Sum("n", alias_name="total"))
           .sort(["total", "word"], descending=[True, False])
           .limit(_SIM_TERMS).to_pandas())
    top_words = frozenset(top["word"])

    def keep_top(batch: pa.Table) -> pa.Table:
        mask = pa.array([w in top_words for w in batch["word"].to_pylist()])
        return batch.filter(mask)

    capped = by_src_word.map_batches(keep_top, batch_format="pyarrow",
                                     zero_copy_batch=True)
    return sparse_pair_dots(capped, key_col="source", item_col="word",
                            weight_col="n")


def q_session_conversion(sf_dir: str) -> "ray.data.Dataset":
    """Per-user session conversion: the sessionize bucket fold (same
    12h-gap boundary-masked cumsum) extended with a per-session
    conversion flag — n_sessions / n_converting per user, one
    user-bucket shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    bucketed = ds.map_batches(_add_user_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gap_break = np.zeros(len(g), dtype=bool)
        gap_break[1:] = (us[1:] - us[:-1]) > _SESSION_GAP_US
        new_sess = new_user | gap_break
        cs = np.cumsum(new_sess.astype(np.int64))
        start_cs = np.where(new_user, cs, 0)
        start_cs = np.maximum.accumulate(start_cs)
        session_no = cs - start_cs + 1
        conv = (g["event_type"].to_numpy() == "purchase").astype(np.int64)
        per = (pd.DataFrame({"user_id": uid, "session_no": session_no,
                             "conv": conv})
               .groupby(["user_id", "session_no"], sort=False)["conv"]
               .max().reset_index())
        out = (per.groupby("user_id", sort=False)
               .agg(n_sessions=("session_no", "size"),
                    n_converting=("conv", "sum")).reset_index())
        out["n_sessions"] = out["n_sessions"].astype(np.int64)
        out["n_converting"] = out["n_converting"].astype(np.int64)
        return out

    return bucketed.groupby("bucket").map_groups(fold,
                                                 batch_format="pandas")


def q_percent_rank_docs(sf_dir: str) -> "ray.data.Dataset":
    """Integer PERCENT_RANK in basis points within each source
    ((rank-1)*10000 // (n-1), 0 for singleton groups) — the grouprank
    histogram attach plus row-local arithmetic; float PERCENT_RANK is
    not cross-engine hashable, the bps floor is."""
    from .ops.grouprank import rank_in_group

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])
    ranked = rank_in_group(ds, group_col="source", value_col="n_chars")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        r = df["rank"].to_numpy(np.int64)
        n = df["n_group"].to_numpy(np.int64)
        df["pr_bps"] = (r - 1) * 10_000 // np.maximum(n - 1, 1)
        return df.drop(columns=["rank", "n_group"])

    return ranked.map_batches(finish, batch_format="pandas")


def q_distinct_words_by_source(sf_dir: str) -> "ray.data.Dataset":
    """Exact per-source vocabulary size: per-batch (source, word) set
    partials -> ONE dedup groupby -> tiny count groupby — COUNT
    (DISTINCT) at corpus scale without ever shipping token streams
    (each batch contributes each (source, word) once)."""
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        seen: set = set()
        for src, text in zip(batch["source"].to_pylist(),
                             batch["text"].to_pylist()):
            for w in (text or "").split():
                seen.add((src, w))
        srcs = [k[0] for k in seen]
        words = [k[1] for k in seen]
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "word": pa.array(words, pa.string())})

    distinct = (ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby(["source", "word"])
                .aggregate(Count(alias_name="__c")))
    return (distinct.groupby("source")
            .aggregate(Count(alias_name="n_distinct_words")))


QUERIES = {
    "extract_html_roundtrip": q_extract_html_roundtrip,
    "extract_docx_roundtrip": q_extract_docx_roundtrip,
    "layout_fanout_roundtrip": q_layout_fanout_roundtrip,
    "extract_pdf_roundtrip": q_extract_pdf_roundtrip,
    "exact_dedup_docs": q_exact_dedup_docs,
    "unique_docs": q_unique_docs,
    "simhash_dups": q_simhash_dups,
    "bloom_cross_run_dups": q_bloom_cross_run_dups,
    "token_counts": q_token_counts,
    "chunk_docs": q_chunk_docs,
    "long_docs": q_long_docs,
    "lang_rollup": q_lang_rollup,
    "source_rollup": q_source_rollup,
    "top_sources": q_top_sources,
    "lineitem_pricing_rollup": q_lineitem_pricing_rollup,
    "events_type_rollup": q_events_type_rollup,
    "hll_users_per_type": q_hll_users_per_type,
    "revenue_by_brand": q_revenue_by_brand,
    "events_hourly": q_events_hourly,
    "user_event_gaps": q_user_event_gaps,
    "asof_last_purchase": q_asof_last_purchase,
    "range_join_views": q_range_join_views,
    "events_sliding": q_events_sliding,
    "sessionize": q_sessionize,
    "top_docs_per_source": q_top_docs_per_source,
    "chars_quantiles": q_chars_quantiles,
    "chars_quantiles_by_lang": q_chars_quantiles_by_lang,
    "content_token_counts": q_content_token_counts,
    "vocab_topk": q_vocab_topk,
    "term_counts_by_source": q_term_counts_by_source,
    "distinct_lang_source": q_distinct_lang_source,
    "ann_topk": q_ann_topk,
    "lsh_recall": q_lsh_recall,
    "ivf_recall": q_ivf_recall,
    "embedding_near_dups": q_embedding_near_dups,
    "lang_id": q_lang_id,
    "quality_signals": q_quality_signals,
    "fingerprints": q_fingerprints,
    "minhash_dedup": q_minhash_dedup,
    "minhash_dedup_distributed": q_minhash_dedup_distributed,
    "minhash_dedup_writeout": q_minhash_dedup_writeout,
    "resume_extract_roundtrip": q_resume_extract_roundtrip,
    "segment_sales": q_segment_sales,
    "media_features": q_media_features,
    "flagship_fixture": q_flagship_fixture,
    "domain_lineage": q_domain_lineage,
    "lineage_by_domain": q_lineage_by_domain,
    "structured_extract": q_structured_extract,
    "schema_validate": q_schema_validate,
    "layout_fanout": q_layout_fanout,
    "stratified_sample_by_lang": q_stratified_sample_by_lang,
    "sample_fraction_docs": q_sample_fraction_docs,
    "pii_redact": q_pii_redact,
    "customers_no_orders": q_customers_no_orders,
    "urgent_customers_semi": q_urgent_customers_semi,
    "decontaminate": q_decontaminate,
    "bm25_search": q_bm25_search,
    "pack_sequences": q_pack_sequences,
    "normalize_text": q_normalize_text,
    "dedup_paragraphs": q_dedup_paragraphs,
    "repetition_signals": q_repetition_signals,
    "canonical_urls": q_canonical_urls,
    "dedup_canonical_urls": q_dedup_canonical_urls,
    "quality_model_scores": q_quality_model_scores,
    "pagerank_links": q_pagerank_links,
    "pagerank_dangling": q_pagerank_dangling,
    "heavy_hitter_terms": q_heavy_hitter_terms,
    "curate_corpus": q_curate_corpus,
    "latest_event_per_user": q_latest_event_per_user,
    "token_budget_select": q_token_budget_select,
    "curate_webpages": q_curate_webpages,
    "lm_surprisal_scores": q_lm_surprisal_scores,
    "dup_window_stats": q_dup_window_stats,
    "keep_best_page_per_url": q_keep_best_page_per_url,
    "incremental_new_docs": q_incremental_new_docs,
    "domain_balanced_sample": q_domain_balanced_sample,
    "strip_dup_windows": q_strip_dup_windows,
    "top_quality_per_source": q_top_quality_per_source,
    "blocklist_filter": q_blocklist_filter,
    "anchor_text_topk": q_anchor_text_topk,
    "kmeans_clusters": q_kmeans_clusters,
    "semantic_dedup": q_semantic_dedup,
    "dataset_split": q_dataset_split,
    "hits_links": q_hits_links,
    "link_hops": q_link_hops,
    "link_triangles": q_link_triangles,
    "funnel_conversion": q_funnel_conversion,
    "cohort_retention": q_cohort_retention,
    "rollup_doc_metrics": q_rollup_doc_metrics,
    "rank_in_source": q_rank_in_source,
    "length_quantiles_by_lang": q_length_quantiles_by_lang,
    "term_cooccurrence": q_term_cooccurrence,
    "weighted_doc_sample": q_weighted_doc_sample,
    "chunk_spans": q_chunk_spans,
    "snapshot_diff": q_snapshot_diff,
    "cocitation_links": q_cocitation_links,
    "zorder_events": q_zorder_events,
    "docs_above_p90": q_docs_above_p90,
    "event_transitions": q_event_transitions,
    "daily_activity": q_daily_activity,
    "reciprocal_links": q_reciprocal_links,
    "cube_doc_metrics": q_cube_doc_metrics,
    "user_active_time": q_user_active_time,
    "customer_running_spend": q_customer_running_spend,
    "cms_user_counts": q_cms_user_counts,
    "event_type_pivot": q_event_type_pivot,
    "dominant_lang_per_source": q_dominant_lang_per_source,
    "corpus_checksum": q_corpus_checksum,
    "revenue_by_nation": q_revenue_by_nation,
    "profile_documents": q_profile_documents,
    "link_components": q_link_components,
    "ntile_by_lang": q_ntile_by_lang,
    "daily_change_by_type": q_daily_change_by_type,
    "typo_term_pairs": q_typo_term_pairs,
    "mad_outlier_docs": q_mad_outlier_docs,
    "source_share_by_lang": q_source_share_by_lang,
    "corr_moments_by_lang": q_corr_moments_by_lang,
    "skyline_docs": q_skyline_docs,
    "type_coengagement": q_type_coengagement,
    "anomalous_days": q_anomalous_days,
    "length_histogram": q_length_histogram,
    "lexical_diversity": q_lexical_diversity,
    "embedding_norm_stats": q_embedding_norm_stats,
    "lang_purity_by_source": q_lang_purity_by_source,
    "source_term_similarity": q_source_term_similarity,
    "session_conversion": q_session_conversion,
    "percent_rank_docs": q_percent_rank_docs,
    "distinct_words_by_source": q_distinct_words_by_source,
}

ORACLE_SQL = {
    "extract_html_roundtrip": (
        "SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') || chr(10) AS text "
        "FROM documents"
    ),
    # write -> damage -> resume -> read-back must be invisible: the
    # final table equals the plain extraction oracle
    "resume_extract_roundtrip": (
        "SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') || chr(10) AS text "
        "FROM documents"
    ),
    # flagship wide shuffle: per-domain doc/valid counts + exact output
    # byte sums over 10 synthetic domains (doc_id % 10)
    "lineage_by_domain": (
        "SELECT 's' || CAST(doc_id % 10 AS VARCHAR) || '.example' AS domain, "
        "count(*) AS n_docs, count(*) AS n_valid, "
        "CAST(sum(octet_length(encode(regexp_replace(trim(text), '\\s+', ' ', 'g') "
        "|| chr(10)))) AS BIGINT) AS n_bytes_out "
        "FROM documents GROUP BY 1"
    ),
    # paragraph + bulleted list (numbering.xml) + rels-resolved
    # hyperlink, reconstructed exactly; empty docs drop the leading
    # paragraph block
    "extract_docx_roundtrip": (
        "SELECT doc_id, "
        "CASE WHEN trim(text) = '' THEN '' ELSE "
        "regexp_replace(trim(text), '\\s+', ' ', 'g') || chr(10) || chr(10) END "
        "|| '- alpha' || chr(10) || '- beta' || chr(10) || chr(10) "
        "|| '[more](https://docs.example/' || doc_id || ')' || chr(10) AS text "
        "FROM documents"
    ),
    # general over ANY page count (list_transform over generate_series),
    # and empty docs yield one empty page (greatest(..., 1)) matching the
    # engine's max(len(words), 1) wrap — round-1 advisor flagged the
    # fixed 3-page reconstruction as silently input-bounded
    "layout_fanout_roundtrip": (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), "
        "x -> x <> '') AS ws FROM documents), "
        "p AS (SELECT doc_id, ws, "
        f"greatest(CAST(ceil(len(ws) / {_LAYOUT_WORDS_PER_PAGE}.0) AS BIGINT), 1) "
        "AS np FROM w) "
        "SELECT doc_id, "
        "array_to_string(list_transform(generate_series(1, np), i -> "
        f"array_to_string(ws[(i-1)*{_LAYOUT_WORDS_PER_PAGE}+1 : "
        f"i*{_LAYOUT_WORDS_PER_PAGE}], ' ')), chr(10) || chr(10)) AS text, "
        "np AS n_pages "
        "FROM p"
    ),
    # the real-PDF wrap uses the same 40-words/page geometry, so the
    # oracle is identical to the ek-layout roundtrip
    "extract_pdf_roundtrip": (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), "
        "x -> x <> '') AS ws FROM documents), "
        "p AS (SELECT doc_id, ws, "
        f"greatest(CAST(ceil(len(ws) / {_LAYOUT_WORDS_PER_PAGE}.0) AS BIGINT), 1) "
        "AS np FROM w) "
        "SELECT doc_id, "
        "array_to_string(list_transform(generate_series(1, np), i -> "
        f"array_to_string(ws[(i-1)*{_LAYOUT_WORDS_PER_PAGE}+1 : "
        f"i*{_LAYOUT_WORDS_PER_PAGE}], ' ')), chr(10) || chr(10)) AS text, "
        "np AS n_pages "
        "FROM p"
    ),
    "exact_dedup_docs": (
        "SELECT doc_id, lang, source, n_chars FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1"
    ),
    "unique_docs": (
        "SELECT doc_id, lang, source, n_chars FROM documents "
        "QUALIFY count(*) OVER (PARTITION BY text) = 1"
    ),
    "token_counts": (
        "SELECT doc_id, len(list_filter(regexp_split_to_array(text, '\\s+'), "
        "x -> x <> '')) AS n_tokens_ws FROM documents"
    ),
    # bloom prefilter + exact arbiter -> true cross-half duplicates:
    # new-run docs (upper half + planted copies of every 25th old doc)
    # whose text appears in the old half
    "bloom_cross_run_dups": (
        "WITH meta AS (SELECT CAST(count(*) / 2 AS BIGINT) AS split FROM documents), "
        "old AS (SELECT DISTINCT text FROM documents, meta WHERE doc_id < split), "
        "new AS (SELECT doc_id, text FROM documents, meta WHERE doc_id >= split "
        f"UNION ALL SELECT doc_id + {_PLANT_OFFSET}, text "
        "FROM documents, meta WHERE doc_id < split AND doc_id % 25 = 0) "
        "SELECT n.doc_id FROM new n JOIN old o ON n.text = o.text"
    ),
    # simhash-generated exact-dup pairs, text-equality arbiter ->
    # identical-text self-join over the exact-copy-augmented corpus
    "simhash_dups": (
        f"WITH aug AS (SELECT doc_id, text FROM documents "
        f"UNION ALL SELECT doc_id + {_PLANT_OFFSET}, text FROM documents "
        "WHERE doc_id % 10 = 0) "
        "SELECT a.doc_id AS key_a, b.doc_id AS key_b "
        "FROM aug a JOIN aug b ON a.text = b.text AND a.doc_id < b.doc_id"
    ),
    # sliding-window chunks: starts every (WORDS - OVERLAP); chunk count
    # = max(1, ceil((W - OVERLAP) / stride)); empty docs yield one empty
    # chunk.  Stride/width literals DERIVE from the query's constants so
    # the two can't drift (round-2 advisor finding).
    "chunk_docs": (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, "
        "'\\s+'), x -> x <> '') AS ws FROM documents), "
        "p AS (SELECT doc_id, ws, len(ws) AS nw, "
        f"greatest(CAST(ceil((len(ws) - {_CHUNK_OVERLAP}) / "
        f"{_CHUNK_WORDS - _CHUNK_OVERLAP}.0) AS BIGINT), 1) AS nc "
        "FROM w) "
        "SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_no, "
        f"array_to_string(ws[(i-1)*{_CHUNK_WORDS - _CHUNK_OVERLAP}+1 : "
        f"(i-1)*{_CHUNK_WORDS - _CHUNK_OVERLAP}+{_CHUNK_WORDS}], ' ') AS chunk_text, "
        f"CAST(least({_CHUNK_WORDS}, greatest(nw - "
        f"(i-1)*{_CHUNK_WORDS - _CHUNK_OVERLAP}, 0)) AS BIGINT) AS n_tokens "
        "FROM p, unnest(generate_series(1, nc)) AS t(i)"
    ),
    "long_docs": (
        "SELECT doc_id, n_tokens_ws FROM (SELECT doc_id, "
        "len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) "
        "AS n_tokens_ws FROM documents) WHERE n_tokens_ws >= 60"
    ),
    # NOTE: every aggregate sum below is wrapped CAST(sum(...) AS BIGINT)
    # because DuckDB promotes sum(BIGINT) to HUGEINT (arrow decimal128),
    # while the engine returns int64 — the driver's value-hash is
    # dtype-sensitive, so the unwrapped form fails hash_match even when
    # every value is identical (round-1 lesson).
    "lang_rollup": (
        "SELECT lang, count(*) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
        "FROM documents GROUP BY lang"
    ),
    "source_rollup": (
        "SELECT source, count(*) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
        "FROM documents GROUP BY source"
    ),
    "top_sources": (
        "SELECT source, CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents "
        "GROUP BY source ORDER BY sum_chars DESC, source ASC LIMIT 5"
    ),
    "lineitem_pricing_rollup": (
        "SELECT l_returnflag, l_linestatus, count(*) AS n_rows, "
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
        "AS sum_price_cents "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "hll_users_per_type": (
        "SELECT DISTINCT event_type, TRUE AS hll_ok FROM events"
    ),
    "events_type_rollup": (
        "SELECT event_type, count(*) AS n_events, "
        "count(DISTINCT user_id) AS n_users, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
        "AS sum_value_cents "
        "FROM events GROUP BY event_type"
    ),
    "revenue_by_brand": (
        "SELECT p.p_brand, count(*) AS n_items, "
        "CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
        "(100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) "
        "AS revenue_centicents "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "GROUP BY p.p_brand"
    ),
    "events_hourly": (
        "SELECT date_trunc('hour', ts) AS window_start, event_type, "
        "count(*) AS n_events, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
        "AS sum_value_cents "
        "FROM events GROUP BY date_trunc('hour', ts), event_type"
    ),
    "asof_last_purchase": (
        "SELECT a.event_id, a.user_id, b.ts AS prev_purchase_ts "
        "FROM (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'click') a "
        "ASOF LEFT JOIN (SELECT user_id, ts FROM events "
        "WHERE event_type = 'purchase') b "
        "ON a.user_id = b.user_id AND b.ts <= a.ts"
    ),
    "range_join_views": (
        "SELECT v.event_id AS event_id, v.user_id AS user_id, "
        "v.ts AS view_ts, c.ts AS win_start "
        "FROM (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'view') v "
        "JOIN (SELECT user_id, ts FROM events "
        "WHERE event_type = 'click') c "
        "ON v.user_id = c.user_id "
        "AND v.ts BETWEEN c.ts AND c.ts + INTERVAL 24 HOUR"
    ),
    # sliding 2h/1h windows: each event contributes to window_start =
    # floor(ts) and floor(ts) - 1h (UNION ALL expansion on the SQL side)
    "events_sliding": (
        "SELECT window_start, count(*) AS n_events, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
        "AS sum_value_cents FROM ("
        "SELECT date_trunc('hour', ts) AS window_start, value FROM events "
        "UNION ALL "
        "SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, value FROM events"
        ") GROUP BY window_start"
    ),
    "user_event_gaps": (
        "SELECT user_id, count(*) AS n_events, "
        "coalesce(max(gap), 0) AS max_gap_us FROM ("
        "SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap FROM events"
        ") GROUP BY user_id"
    ),
    "top_docs_per_source": (
        "SELECT doc_id, source, n_chars FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY source "
        "ORDER BY n_chars DESC, doc_id) <= 2"
    ),
    "chars_quantiles_by_lang": (
        "SELECT lang, quantile_disc(n_chars, 0.5) AS p50, "
        "quantile_disc(n_chars, 0.9) AS p90, "
        "quantile_disc(n_chars, 0.99) AS p99 FROM documents GROUP BY lang"
    ),
    "chars_quantiles": (
        "SELECT quantile_disc(n_chars, 0.5) AS p50, "
        "quantile_disc(n_chars, 0.9) AS p90, "
        "quantile_disc(n_chars, 0.99) AS p99 FROM documents"
    ),
    "segment_sales": (
        "SELECT c.c_mktsegment, count(*) AS n_orders, "
        "CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS sum_price_cents "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_mktsegment"
    ),
    "vocab_topk": (
        "SELECT word, count(*) AS n FROM ("
        "SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents"
        ") WHERE word <> '' GROUP BY word ORDER BY n DESC, word ASC LIMIT 20"
    ),
    "term_counts_by_source": (
        "WITH w AS (SELECT source, unnest(list_filter("
        "regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS word "
        "FROM documents), "
        "sw AS (SELECT source, word, count(*) AS n FROM w GROUP BY 1, 2), "
        "top AS (SELECT word FROM (SELECT word, CAST(sum(n) AS BIGINT) "
        "AS total FROM sw GROUP BY word) "
        f"ORDER BY total DESC, word ASC LIMIT {_TOP_TERMS}) "
        "SELECT sw.source, sw.word, CAST(sw.n AS BIGINT) AS n "
        "FROM sw JOIN top USING (word)"
    ),
    "distinct_lang_source": (
        "SELECT lang, source, count(*) AS n_docs FROM documents "
        "GROUP BY lang, source"
    ),
    "sessionize": (
        "WITH g AS ("
        "  SELECT user_id, event_id, ts, value, "
        "         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL "
        f"             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_SESSION_GAP_US} "
        "              THEN 1 ELSE 0 END AS new_sess "
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        "), s AS ("
        "  SELECT user_id, value, "
        "         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no "
        "  FROM g"
        ") SELECT user_id, session_no, count(*) AS n_events, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
        "AS sum_value_cents "
        "FROM s GROUP BY user_id, session_no"
    ),
    "schema_validate": (
        "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k, "
        "TRUE AS valid FROM events"
    ),
    # fake-LLM structured extraction: planted fields + deterministic
    # retry/failure pattern, all doc_id-derived
    "structured_extract": (
        "SELECT doc_id, "
        "CASE WHEN doc_id % 13 = 0 THEN NULL ELSE "
        "'INV-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') END AS invoice_number, "
        "CASE WHEN doc_id % 13 = 0 THEN NULL ELSE "
        "'2024-' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || '-' || "
        "lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') END AS invoice_date, "
        "CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 'EUR' END AS currency, "
        "CAST(CASE WHEN doc_id % 13 = 0 THEN NULL ELSE "
        "(doc_id % 9000 + 100) * 100 + doc_id % 100 END AS BIGINT) AS total_cents, "
        "doc_id % 13 <> 0 AS valid, "
        "CAST(CASE WHEN doc_id % 13 = 0 THEN 3 WHEN doc_id % 7 = 0 THEN 2 "
        "ELSE 1 END AS BIGINT) AS n_attempts "
        "FROM documents"
    ),
    "ann_topk": (
        "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
        f"ORDER BY vec_id LIMIT {_N_QUERIES}) "
        "SELECT q.query_id, e.vec_id FROM q CROSS JOIN embeddings e "
        "QUALIFY row_number() OVER (PARTITION BY q.query_id ORDER BY "
        f"list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) <= {_TOPK}"
    ),
    # recall invariants: the oracle asserts every query clears the bar;
    # the engine side computes |approx ∩ exact| with its own (ann_topk-
    # verified) exact scorer, so a recall regression flips the hash
    "lsh_recall": (
        "SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings "
        f"ORDER BY vec_id LIMIT {_N_QUERIES}"
    ),
    "ivf_recall": (
        "SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings "
        f"ORDER BY vec_id LIMIT {_N_QUERIES}"
    ),
    "embedding_near_dups": (
        f"SELECT vec_id AS key_a, vec_id + {_PLANT_OFFSET} AS key_b "
        "FROM embeddings WHERE vec_id % 20 = 0"
    ),
}

# The minhash oracle is EXACT: augmented corpus (originals + planted
# copies), all-pairs word-3-gram Jaccard >= 0.8 via a shared-shingle
# candidate join, transitive closure by recursive CTE, min-label rep.
# It reproduces the engine's cluster assignments because the engine's
# arbiter is the same exact Jaccard (LSH only generates candidates; a
# true pair escaping all 16 bands has p <= (1-0.8^4)^16 ~ 2e-4 at
# J=0.8 and ~3e-12 at the corpus' observed J>=0.95 — and the fixed
# seed makes the outcome deterministic either way).
_MINHASH_ORACLE = f"""
WITH RECURSIVE
aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_PLANT_OFFSET}, text || ' planteddup' FROM documents
  WHERE doc_id % 10 = 0 AND len(list_filter(regexp_split_to_array(text, '\\s+'),
    x -> x <> '')) >= {_PLANT_MIN_WORDS}
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(ws) = 0 THEN []
         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         ELSE list_distinct(list_transform(generate_series(1, len(ws) - 2),
              i -> array_to_string(ws[i:i+2], ' '))) END AS sh
  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
        x -> x <> '') AS ws FROM aug)
),
u AS (SELECT doc_id, unnest(sh) AS g FROM sh),
cand AS (SELECT DISTINCT a.doc_id AS ka, b.doc_id AS kb
         FROM u a JOIN u b ON a.g = b.g AND a.doc_id < b.doc_id),
edges AS (
  SELECT ka, kb FROM cand
  JOIN sh sa ON sa.doc_id = ka JOIN sh sb ON sb.doc_id = kb
  WHERE len(list_intersect(sa.sh, sb.sh)) >=
        0.8 * (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
),
bidir AS (SELECT ka AS a, kb AS b FROM edges UNION ALL SELECT kb, ka FROM edges),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM aug
  UNION
  SELECT r.a, e.b FROM reach r JOIN bidir e ON r.b = e.a
)
SELECT a AS doc_id, min(b) < a AS is_dup FROM reach GROUP BY a
"""

ORACLE_SQL["minhash_dedup"] = _MINHASH_ORACLE
ORACLE_SQL["minhash_dedup_distributed"] = _MINHASH_ORACLE
ORACLE_SQL["minhash_dedup_writeout"] = _MINHASH_ORACLE


def _media_oracle() -> str:
    """Expected media_features table rebuilt from the closed-form
    fixture geometry (ops/multimodal.py IMG_W/IMG_H/WAV_SAMPLES/
    WAV_RATE/VID_DUR_MS — change together).  The resize arithmetic
    mirrors resize_plan exactly: sqrt-scale both dims when pixels
    exceed the pixtral budget, floor, never upscale; audio duration is
    integer-floor sample math; video duration/dimensions are the MP4
    mvhd/tkhd (even rows) and AVI avih (odd rows) header fields the
    fixture writes, parsed back by ops/multimodal.decode_video_meta;
    video frame count is the 1 fps sample plan capped at 32."""
    budget = 1024 * 1024  # PIXEL_BUDGETS['pixtral']
    return f"""
WITH m AS (
  SELECT i AS media_id,
         CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         (i % 17 = 13) AS empty,
         400 + (i * 97) % 800 AS iw,
         300 + (i * 131) % 700 AS ih,
         1000 + (i * 331) % 16000 AS nsamp,
         8000 + (i % 8) * 1000 AS rate,
         1000 + (i * 37) % 59000 AS vdur,
         320 + (i * 53) % 640 AS vw,
         240 + (i * 71) % 480 AS vh
  FROM range({_N_MEDIA}) t(i)
)
SELECT media_id, kind,
  CAST(CASE WHEN empty THEN -1
       WHEN kind = 'image' THEN iw
       WHEN kind = 'video' THEN vw
       ELSE -1 END AS INTEGER) AS decoded_width,
  CAST(CASE WHEN empty THEN -1
       WHEN kind = 'image' THEN ih
       WHEN kind = 'video' THEN vh
       ELSE -1 END AS INTEGER) AS decoded_height,
  CAST(CASE WHEN empty OR kind <> 'image' THEN -1
       WHEN iw * ih <= {budget} THEN iw
       ELSE GREATEST(1, CAST(FLOOR(iw * SQRT({budget} / (CAST(iw AS DOUBLE) * ih))) AS INTEGER))
       END AS INTEGER) AS target_width,
  CAST(CASE WHEN empty OR kind <> 'image' THEN -1
       WHEN iw * ih <= {budget} THEN ih
       ELSE GREATEST(1, CAST(FLOOR(ih * SQRT({budget} / (CAST(iw AS DOUBLE) * ih))) AS INTEGER))
       END AS INTEGER) AS target_height,
  CAST(CASE WHEN empty THEN -1
       WHEN kind = 'audio' THEN (nsamp * 1000) // rate
       WHEN kind = 'video' THEN vdur
       ELSE -1 END AS INTEGER) AS duration_ms_out,
  CAST(CASE WHEN NOT empty AND kind = 'video'
       THEN LEAST(32, (vdur + 999) // 1000) ELSE 0 END AS INTEGER) AS n_frames,
  NOT empty AS valid
FROM m ORDER BY media_id
"""


ORACLE_SQL["media_features"] = _media_oracle()

# fixture-corpus oracles: planted ground truth written to parquet by the
# GENERATOR (fixtures.expected_meta_table — no extraction involved), so
# DuckDB checks routing/validity/titles, the assembled layout text, and
# the per-domain rollup counts independently of the Ray pipeline.  The
# path is pure string math here; ensure_fixture_meta() writes the file
# lazily at first oracle_sql() call.
from .fixtures import expected_meta_path as _expected_meta_path  # noqa: E402

_FIXTURE_META = _expected_meta_path(_FIXTURE_META_DIR, _N_FIXTURE)
ORACLE_SQL["flagship_fixture"] = (
    f"SELECT url, doc_kind, valid, title FROM read_parquet('{_FIXTURE_META}')"
)
ORACLE_SQL["layout_fanout"] = (
    "SELECT url, fanout_n_pages AS n_pages, fanout_valid AS valid, "
    f"fanout_text AS text FROM read_parquet('{_FIXTURE_META}')"
)
def _sampling_oracles() -> dict[str, str]:
    from .ops.sampling import SAMPLE_HASH_MOD, sample_hash_sql

    h = sample_hash_sql("doc_id")
    cut = int(_SAMPLE_FRACTION * SAMPLE_HASH_MOD)
    return {
        "stratified_sample_by_lang": (
            "SELECT doc_id, lang FROM ("
            "SELECT doc_id, lang, row_number() OVER ("
            f"PARTITION BY lang ORDER BY {h}, doc_id) AS rn "
            f"FROM documents) WHERE rn <= {_SAMPLE_PER_LANG}"
        ),
        "sample_fraction_docs": (
            f"SELECT doc_id, lang FROM documents WHERE {h} < {cut}"
        ),
    }


ORACLE_SQL.update(_sampling_oracles())

# fingerprint pair-invariant oracle: hashes are opaque, equality isn't —
# planted copies match everywhere (Hamming 0); adjacent-id pairs match
# exactly when the SQL side sees their texts equal
ORACLE_SQL["fingerprints"] = (
    "SELECT doc_id, 'copy' AS pair_kind, TRUE AS fp_match, "
    "TRUE AS hash_match, CAST(0 AS BIGINT) AS simhash_hamming "
    "FROM documents WHERE doc_id % 10 = 0 "
    "UNION ALL "
    "SELECT d1.doc_id, 'neighbor' AS pair_kind, d1.text = d2.text AS fp_match, "
    "d1.text = d2.text AS hash_match, CAST(-1 AS BIGINT) AS simhash_hamming "
    "FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1"
)

ORACLE_SQL["domain_lineage"] = (
    "SELECT domain, COUNT(*) AS n_docs, "
    "CAST(SUM(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid "
    f"FROM read_parquet('{_FIXTURE_META}') GROUP BY domain"
)


def _sql_strlist(words) -> str:
    """Deterministic SQL list literal for a stopword set."""
    return "[" + ",".join("'" + w.replace("'", "''") + "'" for w in sorted(words)) + "]"


def _lang_id_oracle() -> str:
    """Full-value oracle for the stopword-argmax language heuristic:
    per-language stopword coverage over lowercase letter-runs, argmax
    with sorted-lang tie-break, 'unknown' below 3 words or 8% coverage.
    Scores are count/n double divisions — identical operands on both
    engines, so the floats hash-match exactly."""
    from .functions.textstats import _LANG_STOPWORDS

    langs = sorted(_LANG_STOPWORDS)  # ['de', 'en', 'es', 'fr']
    scores = ", ".join(
        "CASE WHEN nw = 0 THEN 0.0 ELSE CAST(len(list_filter(ws, x -> "
        f"list_contains({_sql_strlist(_LANG_STOPWORDS[lang])}, x))) AS DOUBLE)"
        f" / nw END AS s_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    # first maximal language in sorted order wins (mirrors the Python
    # strictly-greater scan over sorted langs)
    pick = ""
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{lang} >= s_{other}" for other in langs[i + 1:])
        pick += f"WHEN {conds} THEN '{lang}' "
    pick += f"ELSE '{langs[-1]}'"
    return (
        "WITH w AS (SELECT doc_id, list_transform("
        "regexp_extract_all(text, '\\p{L}+'), x -> lower(x)) AS ws FROM documents), "
        f"s AS (SELECT doc_id, len(ws) AS nw, {scores} FROM w) "
        "SELECT doc_id, "
        "CASE WHEN nw < 3 THEN 'unknown' "
        f"WHEN {best} < 0.08 THEN 'unknown' "
        f"{pick} END AS pred_lang, "
        f"CASE WHEN nw < 3 THEN 0.0 ELSE {best} END AS lang_confidence "
        "FROM s"
    )


def _quality_oracle() -> str:
    """Full-value oracle for the Gopher/C4-family quality signals the
    ``quality_signals`` query projects: word count, English stopword
    ratio (punct-stripped lowercase words), duplicate-line ratio, and
    the composite score.  Every float derives from int/int divisions
    and the same double constants, so values hash-match exactly."""
    from .functions.textstats import _LANG_STOPWORDS, _PUNCT

    en = _sql_strlist(_LANG_STOPWORDS["en"])
    punct = "".join(sorted(_PUNCT)).replace("'", "''")
    return (
        "WITH w AS (SELECT doc_id, "
        "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws, "
        "list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), "
        "x -> x <> '') AS ls FROM documents), "
        "s AS (SELECT doc_id, len(ws) AS nw, "
        "CASE WHEN len(ws)=0 THEN 0.0 ELSE "
        "CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE)/len(ws) END AS mwl, "
        "CASE WHEN len(ws)=0 THEN 0.0 ELSE "
        f"CAST(len(list_filter(list_transform(ws, x -> trim(lower(x), '{punct}')), "
        f"x -> list_contains({en}, x))) AS DOUBLE)/len(ws) END AS stop_r, "
        "CASE WHEN len(ls)=0 THEN 0.0 ELSE "
        "1.0 - CAST(len(list_distinct(ls)) AS DOUBLE)/len(ls) END AS dup_r "
        "FROM w) "
        "SELECT doc_id, CAST(nw AS DOUBLE) AS q_n_words, "
        "stop_r AS q_stopword_ratio, "
        "CASE WHEN nw=0 THEN 0.0 ELSE dup_r END AS q_dup_line_ratio, "
        "CASE WHEN nw=0 THEN 0.0 ELSE "
        "least(1.0, nw/50.0)*0.3 "
        "+ (CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.5 END)*0.2 "
        "+ least(1.0, stop_r/0.2)*0.3 "
        "+ (1.0 - dup_r)*0.2 END AS q_quality_score "
        "FROM s"
    )


ORACLE_SQL["lang_id"] = _lang_id_oracle()
ORACLE_SQL["quality_signals"] = _quality_oracle()

# stopword-filter cleaning op: list built from the same source table as
# the engine (functions/textstats._LANG_STOPWORDS)
def _content_tokens_oracle() -> str:
    from .functions.textstats import _LANG_STOPWORDS

    en = _sql_strlist(_LANG_STOPWORDS["en"])
    return (
        "SELECT doc_id, CAST(len(list_filter("
        "regexp_split_to_array(text, '\\s+'), "
        f"x -> x <> '' AND NOT list_contains({en}, lower(x)))) AS BIGINT) "
        "AS n_content_tokens FROM documents"
    )


ORACLE_SQL["content_token_counts"] = _content_tokens_oracle()


# PII scrub: the oracle rebuilds the planted footer with the same
# integer arithmetic, then nests regexp_replace in PII_PATTERNS order —
# both engines are RE2, so red_text matches byte-for-byte
def _pii_oracle() -> str:
    from .ops.redact import oracle_count_exprs, oracle_redact_expr

    footer = (
        "' Contact user' || doc_id || '@mail.example or +1-555-' || "
        "CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || "
        "CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' at 10.' || "
        "CAST(doc_id % 200 AS VARCHAR) || '.' || "
        "CAST(doc_id * 7 % 256 AS VARCHAR) || '.' || "
        "CAST(doc_id % 250 AS VARCHAR)"
    )
    counts = ", ".join(oracle_count_exprs("t"))
    return (
        "WITH aug AS (SELECT doc_id, text || "
        f"CASE WHEN doc_id % 3 = 2 THEN '' ELSE {footer} END AS t "
        "FROM documents) "
        f"SELECT doc_id, {oracle_redact_expr('t')} AS red_text, {counts} "
        "FROM aug"
    )


ORACLE_SQL["pii_redact"] = _pii_oracle()

ORACLE_SQL["customers_no_orders"] = (
    "SELECT c_custkey, c_name, c_mktsegment FROM customer c "
    "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
    "AND o.o_orderpriority = '1-URGENT')"
)

# sequence packing: next-fit is inherently sequential within a shard,
# so the oracle walks each (source, shard) with a recursive CTE — depth
# bounded by SHARD_DOCS (the same bound that makes the engine's packing
# embarrassingly parallel)
def _pack_oracle() -> str:
    from .ops.packing import CAPACITY, SHARD_DOCS

    return (
        "WITH RECURSIVE "
        "t AS (SELECT doc_id, source, doc_id // "
        f"{SHARD_DOCS} AS shard, "
        "len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) "
        "AS n_tokens_ws FROM documents), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY source, shard "
        "ORDER BY doc_id) AS rn FROM t), "
        "pack AS ("
        "SELECT source, shard, doc_id, n_tokens_ws, rn, "
        "CAST(0 AS BIGINT) AS bin_id, n_tokens_ws AS fill "
        "FROM r WHERE rn = 1 "
        "UNION ALL "
        "SELECT r.source, r.shard, r.doc_id, r.n_tokens_ws, r.rn, "
        f"CASE WHEN p.fill + r.n_tokens_ws <= {CAPACITY} THEN p.bin_id "
        "ELSE p.bin_id + 1 END, "
        f"CASE WHEN p.fill + r.n_tokens_ws <= {CAPACITY} "
        "THEN p.fill + r.n_tokens_ws ELSE r.n_tokens_ws END "
        "FROM pack p JOIN r ON r.source = p.source AND r.shard = p.shard "
        "AND r.rn = p.rn + 1) "
        "SELECT doc_id, source, shard, n_tokens_ws, bin_id FROM pack"
    )


ORACLE_SQL["pack_sequences"] = _pack_oracle()


# unicode canonicalization: plant the same suffixes via chr(), mirror
# control-strip + NFC in the engine's order
def _normalize_oracle() -> str:
    from .ops.normalize import oracle_normalize_expr

    aug = ("text || CASE WHEN doc_id % 4 = 1 THEN ' nfc' || chr(101) || "
           "chr(769) ELSE '' END || CASE WHEN doc_id % 5 = 2 THEN ' x' || "
           "chr(7) || 'y' ELSE '' END")
    from .ops.normalize import CONTROL_CLASS

    return (
        f"WITH aug AS (SELECT doc_id, {aug} AS t FROM documents) "
        f"SELECT doc_id, {oracle_normalize_expr('t')} AS norm_text, "
        f"CAST(len(regexp_extract_all(t, '{CONTROL_CLASS}')) AS BIGINT) AS n_ctl, "
        f"CAST(({oracle_normalize_expr('t')} <> t) AS BIGINT) AS changed "
        "FROM aug"
    )


ORACLE_SQL["normalize_text"] = _normalize_oracle()


# paragraph dedup: the oracle rebuilds the planted wrap via list
# slicing, marks first occurrences with a window min over the same
# (doc_id << 20 | idx) position key, and reassembles with an ordered
# string_agg (NULL-skipping, so dropped paragraphs leave no separator)
def _paradedup_oracle() -> str:
    from .ops.paradedup import _IDX_BITS

    pk = f"doc_id * {1 << _IDX_BITS} + idx"
    return (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, "
        "'\\s+'), x -> x <> '') AS ws FROM documents), "
        "p0 AS (SELECT doc_id, ws, greatest(CAST(ceil(len(ws) / "
        f"{_PARA_WORDS}.0) AS BIGINT), 1) AS np FROM w), "
        "para AS (SELECT doc_id, unnest(generate_series(1, np)) AS i, ws "
        "FROM p0), "
        "pp AS (SELECT doc_id, i - 1 AS idx, "
        f"array_to_string(ws[(i-1)*{_PARA_WORDS}+1 : i*{_PARA_WORDS}], ' ') "
        "AS p FROM para), "
        f"m AS (SELECT *, min({pk}) OVER (PARTITION BY p) AS mp FROM pp), "
        f"k AS (SELECT doc_id, idx, p, ({pk} = mp) AS kept FROM m) "
        "SELECT doc_id, coalesce(string_agg(CASE WHEN kept THEN p END, "
        "chr(10) || chr(10) ORDER BY idx), '') AS text, "
        "CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT) AS n_kept, "
        "CAST(count(CASE WHEN NOT kept THEN 1 END) AS BIGINT) AS n_dropped "
        "FROM k GROUP BY doc_id"
    )


ORACLE_SQL["dedup_paragraphs"] = _paradedup_oracle()


# repetition signals: per-doc n-gram multiplicity via unnest + groupby;
# each output ratio is one int/int division in both engines
def _repetition_oracle() -> str:
    def ngram_ctes(n: int, tag: str) -> str:
        concat = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n))
        return (
            f"g{tag} AS (SELECT doc_id, unnest(list_transform("
            f"generate_series(1, greatest(len(ws) - {n - 1}, 0)), "
            f"i -> {concat})) AS g FROM w), "
            f"c{tag} AS (SELECT doc_id, g, count(*) AS c FROM g{tag} "
            "GROUP BY 1, 2), "
            f"a{tag} AS (SELECT doc_id, CAST(sum(c * length(g)) AS BIGINT) "
            "AS tot, CAST(coalesce(sum(CASE WHEN c > 1 THEN c * length(g) "
            "END), 0) AS BIGINT) AS dup, CAST(max(c) AS BIGINT) AS mx, "
            f"CAST(sum(c) AS BIGINT) AS n FROM c{tag} GROUP BY 1)"
        )

    return (
        "WITH aug AS (SELECT doc_id, text || CASE WHEN doc_id % 6 = 0 THEN "
        "repeat(' buy now click here', 8) ELSE '' END AS t FROM documents), "
        "w AS (SELECT doc_id, list_filter(regexp_split_to_array(t, '\\s+'), "
        "x -> x <> '') AS ws FROM aug), "
        + ngram_ctes(2, "2") + ", " + ngram_ctes(3, "3") + " "
        "SELECT d.doc_id, "
        "coalesce(CAST(a2.dup AS DOUBLE) / a2.tot, 0.0) AS dup2_frac, "
        "coalesce(CAST(a3.dup AS DOUBLE) / a3.tot, 0.0) AS dup3_frac, "
        "coalesce(CAST(a2.mx AS DOUBLE) / a2.n, 0.0) AS top2_frac "
        "FROM documents d LEFT JOIN a2 USING (doc_id) "
        "LEFT JOIN a3 USING (doc_id)"
    )


ORACLE_SQL["repetition_signals"] = _repetition_oracle()


# URL canonicalization: rebuild the planted messy URL with the same
# doc_id arithmetic, then apply the identical RE2 step sequence
def _urlnorm_oracle() -> str:
    from .ops.urlnorm import oracle_canonicalize_expr

    plant = (
        "CASE WHEN doc_id % 2 = 1 THEN 'HtTpS' ELSE 'HtTp' END || "
        "'://WWW.Site' || CAST(doc_id % 20 AS VARCHAR) || '.EXample' || "
        "CASE WHEN doc_id % 6 = 0 THEN ':80' WHEN doc_id % 6 = 1 "
        "THEN ':443' ELSE '' END || '/Path/' || doc_id || "
        "CASE WHEN doc_id % 4 = 1 THEN '/' ELSE '' END || "
        "CASE WHEN doc_id % 5 = 2 THEN '?utm_source=news&id=' || doc_id "
        "WHEN doc_id % 5 = 3 THEN '?utm_x=1' "
        "WHEN doc_id % 5 = 4 THEN '?id=' || doc_id ELSE '' END || "
        "CASE WHEN doc_id % 7 = 4 THEN '#Sec' || doc_id ELSE '' END"
    )
    return (
        f"WITH aug AS (SELECT doc_id, {plant} AS u FROM documents) "
        f"SELECT doc_id, {oracle_canonicalize_expr('u')} AS canon_url "
        "FROM aug"
    )


ORACLE_SQL["canonical_urls"] = _urlnorm_oracle()


def _dedup_canon_oracle() -> str:
    from .ops.urlnorm import oracle_canonicalize_expr

    return (
        f"WITH aug AS (SELECT doc_id, {_URL_PLANT_SQL} AS u FROM documents), "
        f"canon AS (SELECT doc_id, {oracle_canonicalize_expr('u')} AS canon_url "
        "FROM aug) "
        "SELECT MIN(doc_id) AS doc_id, canon_url FROM canon GROUP BY canon_url"
    )


ORACLE_SQL["dedup_canonical_urls"] = _dedup_canon_oracle()


def _keep_best_url_oracle() -> str:
    from .ops.classify import model_weights, oracle_score_sql
    from .ops.urlnorm import oracle_canonicalize_expr

    score = oracle_score_sql(model_weights(_QMODEL_TERMS),
                             bias_micro=_QMODEL_BIAS)
    return (
        f"WITH scores AS ({score}), "
        f"aug AS (SELECT doc_id, {_URL_PLANT_SQL} AS u FROM documents), "
        f"canon AS (SELECT doc_id, {oracle_canonicalize_expr('u')} AS canon_url "
        "FROM aug) "
        "SELECT c.doc_id, c.canon_url, s.score_micro "
        "FROM canon c JOIN scores s USING (doc_id) "
        "QUALIFY row_number() OVER (PARTITION BY c.canon_url "
        "ORDER BY s.score_micro DESC, c.doc_id) = 1"
    )


ORACLE_SQL["keep_best_page_per_url"] = _keep_best_url_oracle()

# incremental_new_docs: exact anti-semijoin by content against the
# indexed snapshot (doc_id%3==0).  The engine equates docs by 128-bit
# blake2b hash; the text-equality oracle matches (collision p ~2^-128).
ORACLE_SQL["incremental_new_docs"] = (
    "SELECT doc_id, lang, source, n_chars FROM documents "
    "WHERE text NOT IN (SELECT text FROM documents WHERE doc_id % 3 = 0)"
)


def _domain_quota_oracle() -> str:
    from .ops.sampling import SAMPLE_HASH_MOD, sample_hash_sql

    return (
        "WITH w AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS wg "
        "FROM documents GROUP BY source), "
        "cut AS (SELECT source, "
        f"CASE WHEN wg <= {_QUOTA_CHARS} THEN CAST({SAMPLE_HASH_MOD} AS HUGEINT) "
        f"ELSE (CAST({_QUOTA_CHARS} AS HUGEINT) * {SAMPLE_HASH_MOD}) // wg END "
        "AS cut FROM w) "
        "SELECT d.doc_id, d.source, d.n_chars "
        "FROM documents d JOIN cut c ON d.source = c.source "
        f"WHERE {sample_hash_sql('d.doc_id')} < c.cut"
    )


ORACLE_SQL["domain_balanced_sample"] = _domain_quota_oracle()

def _blocklist_oracle() -> str:
    host = ("CASE WHEN doc_id % 2 = 0 THEN 'sub' || (doc_id % 5) || '.' "
            "ELSE '' END || 'dom' || (doc_id % 23) || '.example'")
    vals = ", ".join(f"('{e}')" for e in _BLOCKLIST)
    return f"""
WITH hosts AS (SELECT doc_id, {host} AS host FROM documents),
sfx AS (
  SELECT doc_id,
         unnest(list_transform(
             generate_series(1, len(string_split(host, '.')) - 1),
             i -> array_to_string(
                 string_split(host, '.')[i:len(string_split(host, '.'))],
                 '.'))) AS suffix
  FROM hosts),
bl(e) AS (VALUES {vals}),
m AS (SELECT doc_id, suffix FROM sfx JOIN bl ON sfx.suffix = bl.e
      QUALIFY row_number() OVER (PARTITION BY doc_id
                                 ORDER BY length(suffix) DESC) = 1)
SELECT h.doc_id, 'https://' || h.host || '/p/' || h.doc_id AS url,
       (m.suffix IS NOT NULL) AS blocked,
       COALESCE(m.suffix, '') AS blocked_by
FROM hosts h LEFT JOIN m USING (doc_id)
"""


ORACLE_SQL["blocklist_filter"] = _blocklist_oracle()

# anchor_text_topk: pagerank's UNION-distinct edge plant, each edge
# carrying its src's first-3-token anchor; per-target counts; exact
# top-3 by (count desc, term) — total order, so row_number mirrors
# top_n_per_group bit-for-bit
ORACLE_SQL["anchor_text_topk"] = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
anch AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x <> '')[1:3] AS ats
  FROM documents),
edges AS (
  SELECT src, dst FROM (
    SELECT doc_id AS src, (doc_id * 7 + 1) % nn.n AS dst
    FROM documents, nn
    UNION
    SELECT doc_id, (doc_id * 13 + 2) % nn.n FROM documents, nn
    UNION
    SELECT doc_id, (doc_id * 29 + 3) % nn.n FROM documents, nn)),
terms AS (
  SELECT e.dst AS dst_doc, unnest(a.ats) AS term
  FROM edges e JOIN anch a ON a.doc_id = e.src),
cnt AS (
  SELECT dst_doc, term, CAST(count(*) AS BIGINT) AS n_anchor
  FROM terms GROUP BY dst_doc, term)
SELECT dst_doc, term, n_anchor FROM cnt
QUALIFY row_number() OVER (PARTITION BY dst_doc
                           ORDER BY n_anchor DESC, term) <= 3
"""


# top_quality_per_source: row_number within source by (n_chars desc,
# doc_id) <= integer-ceil head size — no floats anywhere
ORACLE_SQL["top_quality_per_source"] = f"""
SELECT doc_id, source, n_chars FROM documents
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY n_chars DESC, doc_id)
        <= (COUNT(*) OVER (PARTITION BY source) * {_TOP_PCT} + 99) // 100
"""

# strip_dup_windows: same window census as dup_window_stats, then the
# rebuilt doc = non-covered tokens re-joined in position order
# (string_agg ORDER BY p); all-covered and empty docs COALESCE to ''.
ORACLE_SQL["strip_dup_windows"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ts
  FROM documents),
wins AS (
  SELECT doc_id,
         unnest(generate_series(1, len(ts) - 7)) AS s,
         unnest(list_transform(generate_series(1, len(ts) - 7),
                               i -> array_to_string(ts[i:i+7], ' '))) AS w
  FROM toks WHERE len(ts) >= 8),
dupw AS (SELECT w FROM wins GROUP BY w HAVING count(*) > 1),
dw AS (SELECT doc_id, s FROM wins WHERE w IN (SELECT w FROM dupw)),
cov AS (SELECT DISTINCT doc_id, unnest(generate_series(s, s + 7)) AS p
        FROM dw),
pos AS (SELECT doc_id, unnest(ts) AS tok,
               unnest(generate_series(1, len(ts))) AS p
        FROM toks),
keep AS (SELECT pos.doc_id, pos.tok, pos.p
         FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
         WHERE cov.p IS NULL),
agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM keep GROUP BY doc_id)
SELECT t.doc_id, COALESCE(a.text, '') AS text,
       CAST(len(ts) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept
FROM toks t LEFT JOIN agg a USING (doc_id)
"""


def _qmodel_oracle() -> str:
    from .ops.classify import model_weights, oracle_score_sql

    return oracle_score_sql(model_weights(_QMODEL_TERMS),
                            bias_micro=_QMODEL_BIAS)


ORACLE_SQL["quality_model_scores"] = _qmodel_oracle()


def _pagerank_oracle() -> str:
    from .ops.pagerank import oracle_pagerank_sql

    edges = (
        "WITH nn AS (SELECT COUNT(*) AS n FROM documents) "
        "SELECT src, dst FROM ("
        "SELECT doc_id AS src, (doc_id * 7 + 1) % nn.n AS dst "
        "FROM documents, nn "
        "UNION "
        "SELECT doc_id, (doc_id * 13 + 2) % nn.n FROM documents, nn "
        "UNION "
        "SELECT doc_id, (doc_id * 29 + 3) % nn.n FROM documents, nn)"
    )
    return oracle_pagerank_sql(edges, n_iters=3)


ORACLE_SQL["pagerank_links"] = _pagerank_oracle()


def _pagerank_dangling_oracle() -> str:
    from .ops.pagerank import oracle_pagerank_sql

    edges = (
        "WITH nn AS (SELECT COUNT(*) AS n FROM documents), "
        "srcs AS (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0) "
        "SELECT src, dst FROM ("
        "SELECT doc_id AS src, (doc_id * 7 + 1) % nn.n AS dst FROM srcs, nn "
        "UNION "
        "SELECT doc_id, (doc_id * 13 + 2) % nn.n FROM srcs, nn)"
    )
    return oracle_pagerank_sql(edges, n_iters=3, redistribute_dangling=True)


ORACLE_SQL["pagerank_dangling"] = _pagerank_dangling_oracle()

ORACLE_SQL["heavy_hitter_terms"] = """
SELECT term, est_count, rank FROM (
  SELECT tok AS term, COUNT(*) AS est_count,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC) AS rank
  FROM (SELECT unnest(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g'),
                                        ' '), ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY tok
) WHERE rank <= 10 ORDER BY rank
"""


# BM25: the oracle re-derives the query terms, df/dl stats and scores
# with the SAME pinned double-precision operation order as ops/bm25.py
# (rational idf, e0-suffixed double literals, floor(x*1e6+0.5)) — the
# micro-unit BIGINT scores therefore match bit-for-bit
def _bm25_oracle() -> str:
    from .ops.bm25 import B, K1

    k1, b = f"{K1!r}e0", f"{B!r}e0"
    idf = "((s.n_docs - d.df + 0.5e0) / (d.df + 0.5e0))"
    avgdl = "(CAST(s.sum_dl AS DOUBLE) / s.n_docs)"
    denom = f"(tf.tf + {k1} * ((1e0 - {b}) + ({b} * len(w2.ws)) / {avgdl}))"
    return (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, "
        "'\\s+'), x -> x <> '') AS ws FROM documents), "
        "tok AS (SELECT doc_id, unnest(ws) AS word FROM w), "
        "vocab AS (SELECT word, count(*) AS n FROM tok GROUP BY word), "
        "terms AS (SELECT word FROM (SELECT word, row_number() OVER "
        "(ORDER BY n DESC, word ASC) AS r FROM vocab) "
        f"WHERE r BETWEEN {_BM25_LO} AND {_BM25_HI}), "
        "stats AS (SELECT count(*) AS n_docs, CAST(sum(len(ws)) AS BIGINT) "
        "AS sum_dl FROM w), "
        "tf AS (SELECT tok.doc_id, tok.word, count(*) AS tf FROM tok "
        "JOIN terms USING (word) GROUP BY 1, 2), "
        "df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word), "
        "scored AS (SELECT tf.word AS term, tf.doc_id, "
        f"CAST(floor({idf} * tf.tf / {denom} * 1e6 + 0.5e0) AS BIGINT) "
        "AS score_micro FROM tf "
        "JOIN w w2 USING (doc_id) JOIN df d ON d.word = tf.word "
        "CROSS JOIN stats s) "
        "SELECT term, CAST(rank AS BIGINT) AS rank, doc_id, score_micro "
        "FROM (SELECT *, row_number() OVER (PARTITION BY term "
        "ORDER BY score_micro DESC, doc_id ASC) AS rank FROM scored) "
        f"WHERE rank <= {_BM25_TOPK} ORDER BY term, rank"
    )


ORACLE_SQL["bm25_search"] = _bm25_oracle()


# decontamination: SQL rebuilds the distinct leading-13-word probes of
# the doc_id % 97 == 3 subset, then counts containment per doc over the
# same whitespace-normalized text (LEFT JOIN ON TRUE keeps all docs
# even if the probe set were empty)
def _decontam_oracle() -> str:
    from .ops.decontam import PROBE_WORDS

    return (
        "WITH w AS (SELECT doc_id, "
        "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws, "
        "trim(regexp_replace(text, '\\s+', ' ', 'g')) AS norm FROM documents), "
        "probes AS (SELECT DISTINCT "
        f"array_to_string(ws[1:{PROBE_WORDS}], ' ') AS probe "
        f"FROM w WHERE doc_id % 97 = 3 AND len(ws) >= {PROBE_WORDS}) "
        "SELECT w.doc_id, CAST(coalesce(sum(CASE WHEN contains(w.norm, p.probe) "
        "THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_probes_hit "
        "FROM w LEFT JOIN probes p ON TRUE GROUP BY w.doc_id"
    )


ORACLE_SQL["decontaminate"] = _decontam_oracle()

ORACLE_SQL["urgent_customers_semi"] = (
    "SELECT c_custkey, c_name, c_acctbal FROM customer c "
    "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
    "AND o.o_orderpriority = '1-URGENT')"
)


# composed curation chain: the stage oracles fused in one statement —
# repetition plant + signals (repetition_signals oracle's 2-gram CTEs),
# threshold filter, exact dedup (QUALIFY min(doc_id) per text), and the
# pack_sequences recursive CTE over the survivors.  Recursion depth is
# still bounded by SHARD_DOCS.
def _curate_oracle() -> str:
    from .ops.packing import CAPACITY, SHARD_DOCS

    return (
        "WITH RECURSIVE "
        "aug AS (SELECT doc_id, source, "
        f"(CASE WHEN doc_id % 11 = 3 THEN '{_CURATE_CONST}' ELSE text END) || "
        "CASE WHEN doc_id % 6 = 0 THEN repeat(' buy now click here', 8) "
        "ELSE '' END AS t FROM documents), "
        "w AS (SELECT doc_id, source, t, "
        "list_filter(regexp_split_to_array(t, '\\s+'), x -> x <> '') AS ws "
        "FROM aug), "
        "g2 AS (SELECT doc_id, unnest(list_transform("
        "generate_series(1, greatest(len(ws) - 1, 0)), "
        "i -> ws[i] || ' ' || ws[i+1])) AS g FROM w), "
        "c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2), "
        "a2 AS (SELECT doc_id, CAST(sum(c * length(g)) AS BIGINT) AS tot, "
        "CAST(coalesce(sum(CASE WHEN c > 1 THEN c * length(g) END), 0) "
        "AS BIGINT) AS dup FROM c2 GROUP BY 1), "
        "sig AS (SELECT w.doc_id, w.source, w.t, len(ws) AS n_tokens_ws, "
        "coalesce(CAST(a2.dup AS DOUBLE) / a2.tot, 0.0) AS dup2_frac "
        "FROM w LEFT JOIN a2 USING (doc_id)), "
        f"kept AS (SELECT * FROM sig WHERE n_tokens_ws >= {_CURATE_MIN_TOKENS} "
        f"AND dup2_frac <= {_CURATE_MAX_DUP2}), "
        "ded AS (SELECT doc_id, source, n_tokens_ws FROM kept "
        "QUALIFY doc_id = min(doc_id) OVER (PARTITION BY t)), "
        f"r AS (SELECT doc_id, source, doc_id // {SHARD_DOCS} AS shard, "
        "n_tokens_ws, row_number() OVER (PARTITION BY source, "
        f"doc_id // {SHARD_DOCS} ORDER BY doc_id) AS rn FROM ded), "
        "pack AS ("
        "SELECT source, shard, doc_id, n_tokens_ws, rn, "
        "CAST(0 AS BIGINT) AS bin_id, n_tokens_ws AS fill "
        "FROM r WHERE rn = 1 "
        "UNION ALL "
        "SELECT r.source, r.shard, r.doc_id, r.n_tokens_ws, r.rn, "
        f"CASE WHEN p.fill + r.n_tokens_ws <= {CAPACITY} THEN p.bin_id "
        "ELSE p.bin_id + 1 END, "
        f"CASE WHEN p.fill + r.n_tokens_ws <= {CAPACITY} "
        "THEN p.fill + r.n_tokens_ws ELSE r.n_tokens_ws END "
        "FROM pack p JOIN r ON r.source = p.source AND r.shard = p.shard "
        "AND r.rn = p.rn + 1) "
        "SELECT doc_id, source, shard, n_tokens_ws, bin_id FROM pack"
    )


ORACLE_SQL["curate_corpus"] = _curate_oracle()


# group-wise argmax: one window, deterministic tie-break mirrors the
# engine's stable-sort keep-last
ORACLE_SQL["latest_event_per_user"] = (
    "SELECT event_id, ts, user_id, event_type, value FROM events "
    "QUALIFY row_number() OVER (PARTITION BY user_id "
    "ORDER BY ts DESC, event_id DESC) = 1"
)


# prefix scan: the window's running total is PART of the compared
# result, so a wrong block offset or a non-total sort order shows up
# as a value-hash mismatch, not just a row-count drift.  CAST because
# DuckDB widens window SUM(BIGINT) to HUGEINT (decimal128).
ORACLE_SQL["token_budget_select"] = (
    "WITH t AS (SELECT doc_id, len(list_filter("
    "regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tokens_ws "
    "FROM documents), "
    "c AS (SELECT doc_id, n_tokens_ws, CAST(sum(n_tokens_ws) OVER ("
    "ORDER BY n_tokens_ws DESC, doc_id) AS BIGINT) AS cum_tokens FROM t) "
    f"SELECT doc_id, n_tokens_ws, cum_tokens FROM c WHERE cum_tokens <= {_TOKEN_BUDGET}"
)


# end-to-end web curation: extraction's whitespace collapse (the
# byte-identity invariant), the %9==4 dup plant, the length filter and
# first-wins dedup on EXTRACTED bytes, replayed exactly in SQL
# bigram-LM surprisal (ops/lm.py): counts from the doc_id%10==0
# reference slice, invp = c1(prefix) * 1e6 // c2(pair) for seen pairs,
# OOV penalty otherwise, all-BIGINT — the unnest/join/SUM mirror of the
# engine's index_in probes + reduceat fold.  Docs with < 2 tokens emit
# no row on both sides (no bigram evidence).
ORACLE_SQL["lm_surprisal_scores"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ts
  FROM documents),
big AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - 1),
                               i -> ts[i] || ' ' || ts[i + 1])) AS bg,
         unnest(list_transform(generate_series(1, len(ts) - 1),
                               i -> ts[i])) AS w1
  FROM toks),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(ts) AS w FROM toks WHERE doc_id % 10 = 0)
  GROUP BY w),
bi AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS c2
  FROM (SELECT doc_id, bg FROM big WHERE doc_id % 10 = 0)
  GROUP BY bg),
scored AS (
  SELECT b.doc_id,
         CASE WHEN bi.c2 IS NULL OR uni.c1 IS NULL THEN 1000000000
              ELSE uni.c1 * 1000000 // bi.c2 END AS invp
  FROM big b
  LEFT JOIN uni ON uni.w = b.w1
  LEFT JOIN bi ON bi.bg = b.bg)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(invp) AS BIGINT) AS sum_invp_micro,
       CAST(sum(invp) // count(*) AS BIGINT) AS mean_invp_micro
FROM scored GROUP BY doc_id
"""


# dup_window_stats: windows via parallel aligned unnests (same trick as
# the lm bigram oracle); dup set = window text occurring >1 time
# corpus-wide; coverage = DISTINCT token positions under generate_series
# expansion of each dup window's [s, s+7] span.  The engine equates
# windows by 128-bit hash (two blake2b token lanes combined
# polynomially) — equal text always collides, distinct text collides
# with p ~ 2^-128, so the string-equality oracle matches.
ORACLE_SQL["dup_window_stats"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ts
  FROM documents),
wins AS (
  SELECT doc_id,
         unnest(generate_series(1, len(ts) - 7)) AS s,
         unnest(list_transform(generate_series(1, len(ts) - 7),
                               i -> array_to_string(ts[i:i+7], ' '))) AS w
  FROM toks WHERE len(ts) >= 8),
dupw AS (SELECT w FROM wins GROUP BY w HAVING count(*) > 1),
dw AS (SELECT doc_id, s FROM wins WHERE w IN (SELECT w FROM dupw)),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_windows
        FROM dw GROUP BY doc_id),
cov AS (SELECT doc_id, CAST(count(DISTINCT p) AS BIGINT) AS covered_tokens
        FROM (SELECT doc_id, unnest(generate_series(s, s + 7)) AS p FROM dw)
        GROUP BY doc_id)
SELECT t.doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
       CAST(greatest(len(ts) - 7, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(a.dup_windows, 0) AS BIGINT) AS dup_windows,
       CAST(COALESCE(c.covered_tokens, 0) AS BIGINT) AS covered_tokens
FROM toks t LEFT JOIN agg a USING (doc_id) LEFT JOIN cov c USING (doc_id)
"""


ORACLE_SQL["curate_webpages"] = (
    "WITH e AS (SELECT doc_id, "
    f"CASE WHEN doc_id % 9 = 4 THEN '{_WEBCURATE_CONST}' "
    "ELSE regexp_replace(trim(text), '\\s+', ' ', 'g') END || chr(10) AS text "
    "FROM documents), "
    "t AS (SELECT doc_id, text, len(list_filter("
    "regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tokens_ws FROM e) "
    f"SELECT doc_id, text, n_tokens_ws FROM t WHERE n_tokens_ws >= {_WEBCURATE_MIN_TOKENS} "
    "QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1"
)


def _kmeans_oracle() -> str:
    from .ops.kmeans import oracle_kmeans_sql

    return oracle_kmeans_sql(dim=64, k=_KMEANS_K, n_iters=_KMEANS_ITERS)


ORACLE_SQL["kmeans_clusters"] = _kmeans_oracle()

# semantic_dedup: exact planted arithmetic — copies always share their
# source's k-means cluster (identical integer vectors -> identical
# argmin), organic cosines stay far under the 0.99 bar, so the kept set
# is: every original except those evicted by a smaller-id twin, plus
# the smaller-id twins themselves.
ORACLE_SQL["semantic_dedup"] = (
    "SELECT vec_id FROM embeddings WHERE vec_id % 20 <> 10 "
    "UNION ALL "
    f"SELECT vec_id - {_PLANT_OFFSET} FROM embeddings WHERE vec_id % 20 = 10"
)


def _dataset_split_oracle() -> str:
    from .ops.sampling import hash_split_sql

    expr = hash_split_sql("doc_id", _SPLIT_WEIGHTS)
    return f"SELECT doc_id, {expr} AS split FROM documents"


ORACLE_SQL["dataset_split"] = _dataset_split_oracle()


def _hits_oracle() -> str:
    from .ops.hits import oracle_hits_sql

    edges = (
        "WITH nn AS (SELECT COUNT(*) AS n FROM documents) "
        "SELECT src, dst FROM ("
        "SELECT doc_id AS src, (doc_id * 7 + 1) % nn.n AS dst "
        "FROM documents, nn "
        "UNION "
        "SELECT doc_id, (doc_id * 13 + 2) % nn.n FROM documents, nn "
        "UNION "
        "SELECT doc_id, (doc_id * 29 + 3) % nn.n FROM documents, nn)"
    )
    return oracle_hits_sql(edges, n_iters=2)


ORACLE_SQL["hits_links"] = _hits_oracle()


def _link_hops_oracle() -> str:
    from .ops.bfs import oracle_bfs_sql

    edges = (
        "WITH nn AS (SELECT COUNT(*) AS n FROM documents) "
        "SELECT src, dst FROM ("
        "SELECT doc_id AS src, (doc_id * 7 + 1) % nn.n AS dst "
        "FROM documents, nn "
        "UNION "
        "SELECT doc_id, (doc_id * 13 + 2) % nn.n FROM documents, nn "
        "UNION "
        "SELECT doc_id, (doc_id * 29 + 3) % nn.n FROM documents, nn)"
    )
    seeds = "SELECT doc_id AS node FROM documents WHERE doc_id % 97 = 0"
    return oracle_bfs_sql(edges, seeds, max_hops=3)


ORACLE_SQL["link_hops"] = _link_hops_oracle()


def _link_triangles_oracle() -> str:
    from .ops.triangles import oracle_triangles_sql

    edges = (
        "WITH nn AS (SELECT COUNT(*) AS n FROM documents) "
        "SELECT src, dst FROM ("
        "SELECT doc_id AS src, (doc_id * 7 + 1) % nn.n AS dst "
        "FROM documents, nn "
        "UNION "
        "SELECT doc_id, (doc_id * 13 + 2) % nn.n FROM documents, nn "
        "UNION "
        "SELECT doc_id, (doc_id * 29 + 3) % nn.n FROM documents, nn)"
    )
    return oracle_triangles_sql(edges)


ORACLE_SQL["link_triangles"] = _link_triangles_oracle()


def _funnel_oracle() -> str:
    from .ops.funnel import oracle_funnel_sql

    return oracle_funnel_sql(
        "SELECT user_id, ts, event_type FROM events", _FUNNEL_STEPS)


ORACLE_SQL["funnel_conversion"] = _funnel_oracle()


def _cohort_oracle() -> str:
    from .ops.cohort import oracle_cohort_sql

    return oracle_cohort_sql("SELECT user_id, ts FROM events")


ORACLE_SQL["cohort_retention"] = _cohort_oracle()


def _rollup_oracle() -> str:
    from .ops.rollup import oracle_rollup_sql

    return oracle_rollup_sql(
        "SELECT source, lang, n_chars FROM documents",
        ["source", "lang"], ["n_chars"], count_alias="n_docs")


ORACLE_SQL["rollup_doc_metrics"] = _rollup_oracle()


def _rank_in_source_oracle() -> str:
    from .ops.grouprank import oracle_rank_sql

    return oracle_rank_sql(
        "SELECT doc_id, source, n_chars FROM documents",
        group_col="source", value_col="n_chars",
        select="doc_id, source, n_chars")


ORACLE_SQL["rank_in_source"] = _rank_in_source_oracle()


def _length_quantiles_oracle() -> str:
    from .ops.quantiles import oracle_quantiles_sql

    return oracle_quantiles_sql(
        "SELECT lang, n_chars FROM documents",
        group_col="lang", value_col="n_chars", qs_micro=_LEN_QS)


ORACLE_SQL["length_quantiles_by_lang"] = _length_quantiles_oracle()


def _cooccur_oracle() -> str:
    from .ops.cooccur import oracle_cooccur_sql

    return oracle_cooccur_sql("SELECT doc_id, text FROM documents",
                              _COOC_TERMS)


ORACLE_SQL["term_cooccurrence"] = _cooccur_oracle()


def _weighted_sample_oracle() -> str:
    from .ops.sampling import weighted_sample_sql

    return weighted_sample_sql(
        "SELECT doc_id, source, n_chars, "
        "CAST(n_chars + 1 AS BIGINT) AS w FROM documents",
        key_col="doc_id", weight_col="w", n=100)


ORACLE_SQL["weighted_doc_sample"] = _weighted_sample_oracle()


def _chunk_spans_oracle() -> str:
    from .ops.chunking import oracle_chunks_sql

    return oracle_chunks_sql("SELECT doc_id, n_chars FROM documents",
                             size_col="n_chars", window=256, stride=128)


ORACLE_SQL["chunk_spans"] = _chunk_spans_oracle()


def _snapshot_diff_oracle() -> str:
    from .ops.snapshot import oracle_snapshot_diff_sql

    return oracle_snapshot_diff_sql(
        "SELECT doc_id, text FROM documents WHERE doc_id % 7 != 0",
        "SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN text || ' v2' "
        "ELSE text END AS text FROM documents WHERE doc_id % 5 != 0",
        key_col="doc_id")


ORACLE_SQL["snapshot_diff"] = _snapshot_diff_oracle()


def _cocitation_oracle() -> str:
    from .ops.cocitation import oracle_cocitation_sql

    edges = (
        "WITH nn AS (SELECT COUNT(*) AS n FROM documents) "
        "SELECT src, dst FROM ("
        "SELECT doc_id AS src, (doc_id * 7 + 1) % nn.n AS dst "
        "FROM documents, nn "
        "UNION "
        "SELECT doc_id, (doc_id * 13 + 2) % nn.n FROM documents, nn "
        "UNION "
        "SELECT doc_id, (doc_id * 29 + 3) % nn.n FROM documents, nn)"
    )
    return oracle_cocitation_sql(edges, min_count=2)


ORACLE_SQL["cocitation_links"] = _cocitation_oracle()


def _zorder_oracle() -> str:
    from .ops.zorder import zorder_key_sql

    z = zorder_key_sql("ux", "hy", bits=12)
    return f"""
WITH d AS (
  SELECT event_id, user_id & 4095 AS ux,
         (CAST(epoch_us(ts) AS BIGINT) // 3600000000) & 4095 AS hy
  FROM events
)
SELECT event_id, ux, hy, {z} AS zkey, {z} >> 18 AS zbucket FROM d
"""


ORACLE_SQL["zorder_events"] = _zorder_oracle()


def _docs_above_p90_oracle() -> str:
    from .ops.quantiles import oracle_filter_quantile_sql

    return oracle_filter_quantile_sql(
        "SELECT doc_id, lang, n_chars FROM documents",
        group_col="lang", value_col="n_chars", q_micro=900_000,
        select="r.doc_id, r.lang, r.n_chars")


ORACLE_SQL["docs_above_p90"] = _docs_above_p90_oracle()


def _transitions_oracle() -> str:
    from .ops.transitions import oracle_transitions_sql

    return oracle_transitions_sql(
        "SELECT user_id, ts, event_id, event_type FROM events")


ORACLE_SQL["event_transitions"] = _transitions_oracle()


def _daily_activity_oracle() -> str:
    from .ops.cohort import oracle_daily_activity_sql

    return oracle_daily_activity_sql("SELECT user_id, ts FROM events")


ORACLE_SQL["daily_activity"] = _daily_activity_oracle()


def _reciprocal_oracle() -> str:
    from .ops.cocitation import oracle_reciprocal_sql

    edges = (
        "WITH nn AS (SELECT COUNT(*) AS n FROM documents) "
        "SELECT src, dst FROM ("
        "SELECT doc_id AS src, (doc_id * 7 + 1) % nn.n AS dst "
        "FROM documents, nn "
        "UNION "
        "SELECT doc_id, (doc_id * 13 + 2) % nn.n FROM documents, nn "
        "UNION "
        "SELECT doc_id, (doc_id * 29 + 3) % nn.n FROM documents, nn)"
    )
    return oracle_reciprocal_sql(edges)


ORACLE_SQL["reciprocal_links"] = _reciprocal_oracle()


def _cube_oracle() -> str:
    from .ops.rollup import oracle_rollup_sql

    return oracle_rollup_sql(
        "SELECT source, lang, n_chars FROM documents",
        ["source", "lang"], ["n_chars"], count_alias="n_docs",
        mode="cube")


ORACLE_SQL["cube_doc_metrics"] = _cube_oracle()


def _active_time_oracle() -> str:
    from .ops.intervals import oracle_interval_union_sql

    inner = oracle_interval_union_sql(
        "SELECT user_id AS key, CAST(epoch_us(ts) AS BIGINT) AS s, "
        "CAST(epoch_us(ts) AS BIGINT) + 1800000000 AS e FROM events")
    return (f"SELECT key AS user_id, n_islands AS n_sessions, "
            f"covered AS active_us FROM ({inner})")


ORACLE_SQL["user_active_time"] = _active_time_oracle()


def _running_spend_oracle() -> str:
    from .ops.running import oracle_running_total_sql

    return oracle_running_total_sql(
        "SELECT o_custkey, CAST(epoch_us(o_orderdate) AS BIGINT) AS od_us, "
        "o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS "
        "spend_cents FROM orders",
        key_col="o_custkey", order_cols=["od_us", "o_orderkey"],
        value_col="spend_cents", out_col="running_cents")


ORACLE_SQL["customer_running_spend"] = _running_spend_oracle()


def _cms_oracle() -> str:
    from .ops.cms import oracle_cms_sql

    return oracle_cms_sql(
        "SELECT user_id FROM events", key_col="user_id",
        probes_sql="SELECT CAST(range AS BIGINT) AS k FROM range(0, 200)",
        depth=4, width=256, probe_col="user_id", est_col="est_n")


ORACLE_SQL["cms_user_counts"] = _cms_oracle()


def _pivot_oracle() -> str:
    from .ops.pivot import oracle_pivot_sql

    return oracle_pivot_sql("SELECT user_id, event_type FROM events",
                            key_col="user_id", cat_col="event_type",
                            categories=_EVENT_TYPES)


ORACLE_SQL["event_type_pivot"] = _pivot_oracle()

ORACLE_SQL["dominant_lang_per_source"] = """
WITH c AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
)
SELECT source, lang, n FROM c
QUALIFY row_number() OVER (PARTITION BY source ORDER BY n DESC, lang) = 1
"""


def _checksum_oracle() -> str:
    from .ops.checksum import oracle_checksum_sql

    return oracle_checksum_sql("SELECT doc_id, text FROM documents",
                               cols=["doc_id", "text"])


ORACLE_SQL["corpus_checksum"] = _checksum_oracle()

ORACLE_SQL["revenue_by_nation"] = """
SELECT n.n_name, count(*) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
                (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_centicents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY n.n_name
"""


def _profile_oracle() -> str:
    from .ops.profile import oracle_profile_sql

    return oracle_profile_sql(
        "SELECT doc_id, n_chars, lang, source FROM documents",
        int_cols=["doc_id", "n_chars"], str_cols=["lang", "source"])


ORACLE_SQL["profile_documents"] = _profile_oracle()


# chain-graph connected components: the oracle knows the closed form
# (islands broken where the hash marks a break) and labels each doc
# with the last break at or before it — gaps-and-islands
ORACLE_SQL["link_components"] = f"""
WITH flags AS (
  SELECT doc_id,
         CASE WHEN doc_id = 0 THEN 1
              WHEN ((((doc_id - 1) % {_CHAIN_HASH_MOD}) *
                     {_CHAIN_HASH_MULT}) % 4294967296 // 8192) % 4 = 0
              THEN 1 ELSE 0 END AS brk
  FROM documents
), lab AS (
  SELECT doc_id,
         MAX(CASE WHEN brk = 1 THEN doc_id END) OVER
           (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cluster_rep
  FROM flags
)
SELECT doc_id, CAST(cluster_rep AS BIGINT) AS cluster_rep FROM lab
"""


def _ntile_oracle() -> str:
    from .ops.ntile import oracle_ntile_sql

    return oracle_ntile_sql(
        "SELECT doc_id, lang, n_chars FROM documents",
        group_col="lang", value_col="n_chars", tiebreak_col="doc_id", k=4)


ORACLE_SQL["ntile_by_lang"] = _ntile_oracle()


def _daily_change_oracle() -> str:
    from .ops.lagdiff import oracle_period_over_period_sql

    return oracle_period_over_period_sql(
        "SELECT event_type, CAST(epoch_us(ts) AS BIGINT) // 86400000000 "
        "AS day FROM events",
        key_col="event_type", period_col="day")


ORACLE_SQL["daily_change_by_type"] = _daily_change_oracle()


def _typo_pairs_oracle() -> str:
    from .ops.fastss import oracle_editk_pairs_sql

    return oracle_editk_pairs_sql("SELECT text FROM documents")


ORACLE_SQL["typo_term_pairs"] = _typo_pairs_oracle()


def _mad_oracle() -> str:
    from .ops.mad import oracle_mad_outliers_sql

    return oracle_mad_outliers_sql(
        "SELECT doc_id, lang, n_chars FROM documents",
        group_col="lang", value_col="n_chars", mult=2, id_cols=("doc_id",))


ORACLE_SQL["mad_outlier_docs"] = _mad_oracle()


def _share_oracle() -> str:
    from .ops.share import oracle_share_sql

    return oracle_share_sql("SELECT lang, source FROM documents",
                            group_col="lang", sub_col="source")


ORACLE_SQL["source_share_by_lang"] = _share_oracle()


def _moments_oracle() -> str:
    from .ops.moments import oracle_moments_sql

    return oracle_moments_sql(
        "SELECT lang, n_chars, len(list_filter("
        "regexp_split_to_array(text, '\\s+'), x -> x <> '')) "
        "AS n_tokens_ws FROM documents",
        group_col="lang", x_col="n_chars", y_col="n_tokens_ws")


ORACLE_SQL["corr_moments_by_lang"] = _moments_oracle()


def _skyline_oracle() -> str:
    from .ops.skyline import oracle_skyline_sql

    return oracle_skyline_sql(
        "SELECT doc_id, n_chars, len(list_filter("
        "regexp_split_to_array(text, '\\s+'), x -> x <> '')) "
        "AS n_tokens_ws FROM documents",
        x_col="n_chars", y_col="n_tokens_ws",
        maximize_x=False, maximize_y=True, id_cols=("doc_id",))


ORACLE_SQL["skyline_docs"] = _skyline_oracle()


def _coengagement_oracle() -> str:
    from .ops.coengage import oracle_coengagement_sql

    return oracle_coengagement_sql(
        "SELECT user_id, event_type FROM events",
        user_col="user_id", cat_col="event_type")


ORACLE_SQL["type_coengagement"] = _coengagement_oracle()


def _anomalous_days_oracle() -> str:
    from .ops.lagdiff import oracle_daily_counts_sql
    from .ops.mad import oracle_mad_outliers_sql

    counts = oracle_daily_counts_sql(
        "SELECT event_type, ts FROM events",
        key_col="event_type", ts_col="ts")
    return oracle_mad_outliers_sql(counts, group_col="event_type",
                                   value_col="n", mult=1,
                                   id_cols=("day",))


ORACLE_SQL["anomalous_days"] = _anomalous_days_oracle()

ORACLE_SQL["length_histogram"] = (
    "SELECT lang, n_chars // 200 * 200 AS bucket, "
    "CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1, 2"
)

ORACLE_SQL["lexical_diversity"] = (
    "SELECT doc_id, "
    "len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) "
    "AS n_tokens, "
    "len(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), "
    "x -> x <> ''))) AS n_distinct_tokens "
    "FROM documents"
)


def _embedding_norms_oracle() -> str:
    from .ops.quantize import oracle_quantized_norms_sql

    return oracle_quantized_norms_sql(
        "SELECT label, embedding FROM embeddings",
        group_col="label", vec_col="embedding")


ORACLE_SQL["embedding_norm_stats"] = _embedding_norms_oracle()


def _purity_oracle() -> str:
    from .ops.purity import oracle_concentration_sql

    return oracle_concentration_sql(
        "SELECT source, lang FROM documents",
        group_col="source", cat_col="lang")


ORACLE_SQL["lang_purity_by_source"] = _purity_oracle()


def _source_sim_oracle() -> str:
    from .ops.sparsesim import oracle_sparse_dots_sql

    counts_sql = (
        "WITH w AS (SELECT source, unnest(list_filter("
        "regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS word "
        "FROM documents), "
        "sw AS (SELECT source, word, count(*) AS n FROM w GROUP BY 1, 2), "
        "top AS (SELECT word FROM (SELECT word, CAST(sum(n) AS BIGINT) "
        f"AS total FROM sw GROUP BY word) ORDER BY total DESC, word ASC "
        f"LIMIT {_SIM_TERMS}) "
        "SELECT sw.source, sw.word, CAST(sw.n AS BIGINT) AS n "
        "FROM sw JOIN top USING (word)")
    return oracle_sparse_dots_sql(counts_sql, key_col="source",
                                  item_col="word", weight_col="n")


ORACLE_SQL["source_term_similarity"] = _source_sim_oracle()


ORACLE_SQL["session_conversion"] = f"""
WITH g AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                 > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_type,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts,
              event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM g
), per AS (
  SELECT user_id, session_no,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM s GROUP BY user_id, session_no
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(conv) AS BIGINT) AS n_converting
FROM per GROUP BY user_id
"""

ORACLE_SQL["percent_rank_docs"] = (
    "SELECT doc_id, source, n_chars, "
    "CAST((RANK() OVER (PARTITION BY source ORDER BY n_chars DESC) - 1) "
    "* 10000 // GREATEST(COUNT(*) OVER (PARTITION BY source) - 1, 1) "
    "AS BIGINT) AS pr_bps FROM documents"
)


ORACLE_SQL["distinct_words_by_source"] = (
    "SELECT source, CAST(COUNT(DISTINCT word) AS BIGINT) "
    "AS n_distinct_words FROM ("
    "SELECT source, unnest(list_filter(regexp_split_to_array(text, "
    "'\\s+'), x -> x <> '')) AS word FROM documents) GROUP BY source"
)


# ---------------------------------------------------------------------------
# Round-5 web-ingest family: robots.txt gate, URL templates, WARC reader,
# language confusion matrix
# ---------------------------------------------------------------------------

def _robots_rule_tuples(i: int) -> list[tuple[bool, str]]:
    """The ``*``-group rules host ``site{i}.example`` publishes, as
    (is_allow, prefix) tuples — the SHARED source of truth: the engine
    renders them to robots.txt TEXT (plus junk the parser must skip)
    and the oracle renders them to a VALUES rule table, so a parser
    bug breaks the hash match."""
    d1, d2 = i % 11, (3 * i + 1) % 11
    rules = [(False, f"/sec{d1}/"), (False, f"/sec{d2}/p"),
             (True, f"/sec{d2}/p7")]
    if i % 5 == 0:
        rules.append((True, ""))  # empty Disallow: == allow-all no-op
    return rules


def _robots_texts() -> dict[str, str]:
    """Render each host's rules as a realistic robots.txt body: a
    non-matching UA group that must be IGNORED, comments, blank-line
    group breaks, mixed field-name case, Crawl-delay/Sitemap noise."""
    out: dict[str, str] = {}
    for i in range(20):
        lines = [
            "# synthetic fixture for site%d" % i,
            "User-agent: badbot",
            "Disallow: /",
            "",
            "user-agent: *   # comment after the agent",
        ]
        for is_allow, prefix in _robots_rule_tuples(i):
            if is_allow and prefix == "":
                lines.append("Disallow:")
            else:
                lines.append(("Allow: " if is_allow else "disallow: ")
                             + prefix)
        lines += ["Crawl-delay: 2",
                  f"Sitemap: https://site{i}.example/sitemap.xml"]
        out[f"site{i}.example"] = "\n".join(lines)
    return out


_ROBOTS_HOST_SQL = "'site' || CAST(doc_id % 20 AS VARCHAR) || '.example'"
_ROBOTS_PATH_SQL = ("'/sec' || CAST(doc_id % 11 AS VARCHAR) || '/p' || "
                    "CAST(doc_id % 13 AS VARCHAR)")


def _plant_host_path(batch: pa.Table) -> pa.Table:
    """(host, path) plant mirrored by _ROBOTS_HOST_SQL/_ROBOTS_PATH_SQL."""
    did = batch["doc_id"].to_numpy()
    add = np.char.add
    host = add(add("site", (did % 20).astype("U2")), ".example")
    path = add(add(add("/sec", (did % 11).astype("U2")), "/p"),
               (did % 13).astype("U2"))
    return pa.table({
        "doc_id": batch["doc_id"],
        "host": pa.array(host.tolist(), pa.string()),
        "path": pa.array(path.tolist(), pa.string()),
    })


def q_robots_filter(sf_dir: str) -> "ray.data.Dataset":
    """robots.txt crawl gate (ops/robots.py): parse each host's
    robots.txt ONCE per actor from a ray.put broadcast, then filter
    the URL stream vectorized with most-specific-match / Allow-wins
    semantics.  Scale shape: zero shuffles — the rules table is tiny
    and broadcast; the URL table only streams.  The oracle replays the
    decision over the same rule tuples as a VALUES table + window
    pick, so BOTH the parser and the decision logic are hash-checked."""
    from .ops.robots import robots_filter

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    urls = ds.map_batches(_plant_host_path, batch_format="pyarrow",
                          zero_copy_batch=True)
    return robots_filter(urls, _robots_texts())


def _robots_oracle() -> str:
    vals = []
    for i in range(20):
        for is_allow, prefix in _robots_rule_tuples(i):
            vals.append(f"('site{i}.example', '{prefix}', "
                        f"{'TRUE' if is_allow else 'FALSE'}, {len(prefix)})")
    values = ", ".join(vals)
    return (
        f"WITH u AS (SELECT doc_id, {_ROBOTS_HOST_SQL} AS host, "
        f"{_ROBOTS_PATH_SQL} AS path FROM documents), "
        f"r(host, prefix, is_allow, plen) AS (VALUES {values}), "
        "m AS (SELECT u.doc_id, r.is_allow, ROW_NUMBER() OVER ("
        "PARTITION BY u.doc_id ORDER BY r.plen DESC, r.is_allow DESC"
        ") AS rn FROM u JOIN r ON u.host = r.host "
        "AND starts_with(u.path, r.prefix)) "
        "SELECT u.doc_id, u.host, u.path FROM u "
        "LEFT JOIN (SELECT doc_id, is_allow FROM m WHERE rn = 1) b "
        "USING (doc_id) WHERE b.doc_id IS NULL OR b.is_allow"
    )


_URL_TPL_RE = r"/\d+(/|$)"
_URL_TPL_SUB = r"/<n>\1"


def q_url_templates(sf_dir: str) -> "ray.data.Dataset":
    """URL path-template mining (the crawl-frontier analysis that
    finds calendar traps and infinite facet spaces): numeric path
    segments collapse to ``/<n>`` via ONE RE2 global replace —
    identical kernel (pyarrow replace_substring_regex vs DuckDB
    regexp_replace, both RE2) — then one small groupby for (count,
    min doc).  Scale shape: stateless map + a template-cardinality
    shuffle (tiny)."""
    from ray.data.aggregate import Count, Min

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def plant_and_template(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        add = np.char.add
        path = add(add(add("/cat", (did % 7).astype("U2")), "/item/"),
                   did.astype("U20"))
        path = np.where(did % 3 == 0, add(path, "/view"), path)
        tpl = pc.replace_substring_regex(
            pa.array(path.tolist(), pa.string()),
            _URL_TPL_RE, _URL_TPL_SUB)
        return pa.table({"doc_id": batch["doc_id"], "template": tpl})

    return (ds.map_batches(plant_and_template, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("template")
            .aggregate(Count(alias_name="n_urls"),
                       Min("doc_id", alias_name="min_doc")))


_URL_TPL_PLANT_SQL = (
    "'/cat' || CAST(doc_id % 7 AS VARCHAR) || '/item/' || "
    "CAST(doc_id AS VARCHAR) || "
    "CASE WHEN doc_id % 3 = 0 THEN '/view' ELSE '' END"
)


def q_lang_confusion(sf_dir: str) -> "ray.data.Dataset":
    """Language-ID confusion matrix: the declared ``lang`` column vs
    the stopword-argmax classifier's prediction, one (truth, pred)
    count per cell — the QC table that decides whether a lang filter
    is trustworthy.  Composition: LangIdStage actor pool (model built
    once per actor) + ONE tiny groupby; the oracle reuses the full
    lang_id classifier CTE."""
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    pred = ds.map_batches(LangIdStage, batch_format="pyarrow", **_pool())
    return (pred.groupby(["lang", "pred_lang"])
            .aggregate(Count(alias_name="n_docs")))


def _lang_confusion_oracle() -> str:
    return (
        f"WITH pred AS ({_lang_id_oracle()}) "
        "SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs "
        "FROM documents d JOIN pred p USING (doc_id) GROUP BY 1, 2"
    )


def q_warc_roundtrip(sf_dir: str) -> "ray.data.Dataset":
    """WARC ingest bridge (functions/warc.py): serialize each batch's
    docs into concatenated WARC/1.0 response records (8 per blob) and
    parse them back with the strict Content-Length framing walker —
    url, record-id and payload must survive byte-identically (the
    oracle reads the same fields straight off the table).  Scale
    shape: blobs never leave the batch; zero shuffles."""
    from .functions.warc import build_warc, parse_warc

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        recs = [{
            "url": f"https://site{d % 20}.example/doc/{d}",
            "ts": "2026-01-01T00:00:00Z",
            "record_id": f"urn:doc:{d}",
            "payload": (t or "").encode("utf-8"),
        } for d, t in zip(ids, texts)]
        out_id, out_url, out_nb, out_text = [], [], [], []
        for i in range(0, len(recs), 8):
            for r in parse_warc(build_warc(recs[i:i + 8])):
                out_id.append(int(r["record_id"].rsplit(":", 1)[1]))
                out_url.append(r["url"])
                out_nb.append(len(r["payload"]))
                out_text.append(r["payload"].decode("utf-8"))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "url": pa.array(out_url, pa.string()),
            "n_bytes": pa.array(out_nb, pa.int64()),
            "text": pa.array(out_text, pa.string()),
        })

    return ds.map_batches(roundtrip, batch_format="pyarrow")


QUERIES["robots_filter"] = q_robots_filter
QUERIES["url_templates"] = q_url_templates
QUERIES["lang_confusion"] = q_lang_confusion
QUERIES["warc_roundtrip"] = q_warc_roundtrip

ORACLE_SQL["robots_filter"] = _robots_oracle()
ORACLE_SQL["url_templates"] = (
    f"SELECT regexp_replace({_URL_TPL_PLANT_SQL}, '{_URL_TPL_RE}', "
    f"'{_URL_TPL_SUB}', 'g') AS template, "
    "CAST(COUNT(*) AS BIGINT) AS n_urls, MIN(doc_id) AS min_doc "
    "FROM documents GROUP BY 1"
)
ORACLE_SQL["lang_confusion"] = _lang_confusion_oracle()
ORACLE_SQL["warc_roundtrip"] = (
    "SELECT doc_id, 'https://site' || CAST(doc_id % 20 AS VARCHAR) || "
    "'.example/doc/' || CAST(doc_id AS VARCHAR) AS url, "
    "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, text "
    "FROM documents"
)


# ---------------------------------------------------------------------------
# Round-5 web-text cleaning family: charset sniff/decode, entity decode,
# C4 line filter
# ---------------------------------------------------------------------------

def q_charset_sniff(sf_dir: str) -> "ray.data.Dataset":
    """Charset sniff + decode (functions/charset.py): pages planted in
    four real wire shapes — bare utf-8, <meta charset>, legacy
    iso-8859-1 via http-equiv, and BOM'd utf-16 — must come back as
    (charset, text) with the BOM stripped and the 8-bit accents
    decoded.  The engine sniffs REAL bytes (WHATWG-style prescan); the
    oracle states the closed-form expectation, so a sniffing or
    decoding bug breaks the hash.  Scale shape: per-cell byte work,
    zero shuffles."""
    from .functions.charset import decode_html

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def plant_and_decode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        cs_out, tx_out = [], []
        for d in ids:
            body = f"Body {d} déjà vu"
            v = d % 4
            if v == 0:
                raw = f"<html><body>{body}".encode("utf-8")
            elif v == 1:
                raw = (f'<html><head><meta charset="UTF-8"></head>{body}'
                       ).encode("utf-8")
            elif v == 2:
                raw = ('<meta http-equiv="Content-Type" '
                       'content="text/html; charset=ISO-8859-1">'
                       + body).encode("iso-8859-1")
            else:
                raw = f"<html>{body}".encode("utf-16")
            cs, text = decode_html(raw)
            cs_out.append(cs)
            tx_out.append(text)
        return pa.table({
            "doc_id": batch["doc_id"],
            "charset": pa.array(cs_out, pa.string()),
            "text": pa.array(tx_out, pa.string()),
        })

    return ds.map_batches(plant_and_decode, batch_format="pyarrow",
                          zero_copy_batch=True)


def _charset_oracle() -> str:
    body = "'Body ' || CAST(doc_id AS VARCHAR) || ' déjà vu'"
    return (
        "SELECT doc_id, "
        "CASE doc_id % 4 WHEN 2 THEN 'iso-8859-1' WHEN 3 THEN 'utf-16' "
        "ELSE 'utf-8' END AS charset, "
        "CASE doc_id % 4 "
        f"WHEN 0 THEN '<html><body>' || {body} "
        "WHEN 1 THEN '<html><head><meta charset=\"UTF-8\"></head>' || "
        f"{body} "
        "WHEN 2 THEN '<meta http-equiv=\"Content-Type\" "
        "content=\"text/html; charset=ISO-8859-1\">' || "
        f"{body} "
        f"ELSE '<html>' || {body} END AS text "
        "FROM documents"
    )


_ENTITY_PLANT_SQL = (
    "'&lt;p&gt; ' || text || ' &amp;amp; &quot;' || "
    "CAST(doc_id % 5 AS VARCHAR) || '&quot; &nbsp;&#39;end&#39;'"
)


def q_decode_entities(sf_dir: str) -> "ray.data.Dataset":
    """HTML entity decode (ops/clean.py): docs wrapped in an
    entity-laden frame — including the double-escaped ``&amp;amp;``
    that must decode exactly ONE level — cleaned by the fixed ordered
    replace chain, one vectorized kernel per entity.  The oracle
    replays the identical chain with nested ``replace``.  Scale shape:
    stateless map, zero shuffles."""
    from .ops.clean import decode_entities_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        tail = pc.binary_join_element_wise(
            pa.array((did % 5).astype("U1").tolist(), pa.string()),
            "&quot; &nbsp;&#39;end&#39;", "")
        planted = pc.binary_join_element_wise(
            "&lt;p&gt; ", batch["text"], " &amp;amp; &quot;", tail, "")
        return pa.table({"doc_id": batch["doc_id"], "text": planted})

    return (ds.map_batches(plant, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(decode_entities_batch, batch_format="pyarrow",
                         zero_copy_batch=True))


_LINE_WORDS = 8


def q_c4_line_filter(sf_dir: str) -> "ray.data.Dataset":
    """C4-style line-level quality filter (ops/clean.py): docs wrapped
    into 8-word lines with planted terminal punctuation on a
    (doc_id + idx) % 3 schedule, then only lines with >= 5 words
    ending in . ! ? survive; the doc is rebuilt from survivors with
    kept/dropped counts.  The oracle rebuilds the SAME wrap via
    generate_series + list slicing (the dedup_paragraphs technique)
    and replays the keep rule.  Scale shape: per-doc linear pass,
    zero shuffles."""
    from .ops.clean import c4_line_filter

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def filt(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_t, out_k, out_d = [], [], []
        for d, t in zip(ids, texts):
            words = (t or "").split()
            n = max(-(-len(words) // _LINE_WORDS), 1)
            lines = []
            for i in range(n):
                seg = words[i * _LINE_WORDS:(i + 1) * _LINE_WORDS]
                line = " ".join(seg)
                m = (d + i) % 3
                if m == 0:
                    line += "."
                elif m == 1:
                    line += "!"
                lines.append(line)
            kept, dropped = c4_line_filter(lines)
            out_t.append("\n".join(kept))
            out_k.append(len(kept))
            out_d.append(dropped)
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": pa.array(out_t, pa.string()),
            "n_kept": pa.array(out_k, pa.int64()),
            "n_dropped": pa.array(out_d, pa.int64()),
        })

    return ds.map_batches(filt, batch_format="pyarrow",
                          zero_copy_batch=True)


def _c4_oracle() -> str:
    lw = _LINE_WORDS
    return (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "text, '\\s+'), x -> x <> '') AS ws FROM documents), "
        "p0 AS (SELECT doc_id, ws, greatest(CAST(ceil(len(ws) / "
        f"{lw}.0) AS BIGINT), 1) AS np FROM w), "
        "para AS (SELECT doc_id, unnest(generate_series(1, np)) AS i, "
        "ws FROM p0), "
        "ln AS (SELECT doc_id, i - 1 AS idx, "
        f"ws[(i-1)*{lw}+1 : i*{lw}] AS seg FROM para), "
        "l2 AS (SELECT doc_id, idx, len(seg) AS nw, "
        "array_to_string(seg, ' ') || CASE (doc_id + idx) % 3 "
        "WHEN 0 THEN '.' WHEN 1 THEN '!' ELSE '' END AS line FROM ln), "
        "k AS (SELECT doc_id, idx, line, (nw >= 5 AND ("
        "ends_with(line, '.') OR ends_with(line, '!') OR "
        "ends_with(line, '?'))) AS kept FROM l2) "
        "SELECT doc_id, coalesce(string_agg(CASE WHEN kept THEN line "
        "END, chr(10) ORDER BY idx), '') AS text, "
        "CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT) AS n_kept, "
        "CAST(count(CASE WHEN NOT kept THEN 1 END) AS BIGINT) "
        "AS n_dropped FROM k GROUP BY doc_id"
    )


QUERIES["charset_sniff"] = q_charset_sniff
QUERIES["decode_entities"] = q_decode_entities
QUERIES["c4_line_filter"] = q_c4_line_filter

ORACLE_SQL["charset_sniff"] = _charset_oracle()


def _decode_entities_oracle() -> str:
    from .ops.clean import oracle_decode_entities_expr

    return ("SELECT doc_id, "
            + oracle_decode_entities_expr(_ENTITY_PLANT_SQL)
            + " AS text FROM documents")


ORACLE_SQL["decode_entities"] = _decode_entities_oracle()
ORACLE_SQL["c4_line_filter"] = _c4_oracle()


# ---------------------------------------------------------------------------
# Round-5 corpus-QC additions: OOV rate vs broadcast vocab, per-source
# duplicate ratio
# ---------------------------------------------------------------------------

_OOV_VOCAB_K = 100


def q_oov_rate(sf_dir: str) -> "ray.data.Dataset":
    """Out-of-vocabulary audit (ops/textops.OovScorer): pass 1 builds
    the corpus top-100 vocabulary (per-batch Counter partials -> one
    tiny word groupby -> deterministic n DESC, word ASC cut); pass 2
    broadcasts the vocab via ray.put and scores every doc's OOV share
    in integer basis points.  Two corpus reads, zero text shuffles —
    the word table (bounded by vocab size after the cut) is the only
    thing that moves."""
    from collections import Counter

    from .ops.textops import OovScorer

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            c.update((text or "").split())
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("word").aggregate(Sum("n", alias_name="n")))
    top = (counts.sort(["n", "word"], descending=[True, False])
           .limit(_OOV_VOCAB_K).to_pandas())
    vocab_ref = ray.put(top["word"].tolist())

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return docs.map_batches(
        OovScorer, fn_constructor_kwargs={"vocab_ref": vocab_ref},
        batch_format="pyarrow", **_pool())


def _oov_oracle() -> str:
    return (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "text, '\\s+'), x -> x <> '') AS ws FROM documents), "
        "tok AS (SELECT unnest(ws) AS word FROM w), "
        "top AS (SELECT word, 1 AS hit FROM (SELECT word, "
        "CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY word) "
        f"ORDER BY n DESC, word ASC LIMIT {_OOV_VOCAB_K}), "
        "t AS (SELECT doc_id, unnest(ws) AS word FROM w), "
        "o AS (SELECT t.doc_id, count(*) AS n_oov FROM t "
        "LEFT JOIN top USING (word) WHERE top.hit IS NULL "
        "GROUP BY t.doc_id) "
        "SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_tokens, "
        "CAST(coalesce(o.n_oov, 0) AS BIGINT) AS n_oov, "
        "CAST(CASE WHEN len(w.ws) = 0 THEN 0 ELSE "
        "coalesce(o.n_oov, 0) * 10000 // len(w.ws) END AS BIGINT) "
        "AS oov_bps FROM w LEFT JOIN o ON w.doc_id = o.doc_id"
    )


def q_dup_ratio_by_source(sf_dir: str) -> "ray.data.Dataset":
    """Per-source duplicate-ratio QC — the table that decides which
    crawl sources need aggressive dedup: texts truncated to a planted
    (doc_id % 4 + 1)-word prefix (manufacturing real collisions,
    mirrored by list slicing in SQL) are counted by 128-bit content
    hash within source; dup_bps = (n_docs - n_unique) * 10000 //
    n_docs.  Scale shape: text never shuffles — only (source, h1, h2)
    rows ride the ONE groupby; hash-equality == text-equality per the
    exact_dedup 128-bit contract (ops/dedup.add_text_hash)."""
    from ray.data.aggregate import Count as _Count

    from .ops.dedup import add_text_hash

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "text"])

    def truncate(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        cut = [" ".join((t or "").split()[:d % 4 + 1])
               for d, t in zip(ids, texts)]
        return pa.table({"source": batch["source"],
                         "text": pa.array(cut, pa.string())})

    hashed = (ds.map_batches(truncate, batch_format="pyarrow",
                             zero_copy_batch=True)
              .map_batches(add_text_hash, batch_format="pyarrow")
              .select_columns(["source", "text_hash", "text_hash2"]))
    per_text = (hashed.groupby(["source", "text_hash", "text_hash2"])
                .aggregate(_Count(alias_name="n")))
    per_src = (per_text.groupby("source")
               .aggregate(Sum("n", alias_name="n_docs"),
                          _Count(alias_name="n_unique")))

    def ratio(batch: pa.Table) -> pa.Table:
        nd = batch["n_docs"].to_numpy()
        nu = batch["n_unique"].to_numpy()
        bps = (nd - nu) * 10000 // nd
        return batch.append_column("dup_bps", pa.array(bps, pa.int64()))

    return per_src.map_batches(ratio, batch_format="pyarrow",
                               zero_copy_batch=True)


def _dup_ratio_oracle() -> str:
    return (
        "WITH c AS (SELECT doc_id, source, array_to_string("
        "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
        "[1 : doc_id % 4 + 1], ' ') AS t FROM documents), "
        "g AS (SELECT source, t, count(*) AS n FROM c GROUP BY 1, 2) "
        "SELECT source, CAST(sum(n) AS BIGINT) AS n_docs, "
        "CAST(count(*) AS BIGINT) AS n_unique, "
        "(CAST(sum(n) AS BIGINT) - count(*)) * 10000 // "
        "CAST(sum(n) AS BIGINT) AS dup_bps FROM g GROUP BY source"
    )


QUERIES["oov_rate"] = q_oov_rate
QUERIES["dup_ratio_by_source"] = q_dup_ratio_by_source
ORACLE_SQL["oov_rate"] = _oov_oracle()
ORACLE_SQL["dup_ratio_by_source"] = _dup_ratio_oracle()


# ---------------------------------------------------------------------------
# Round-5 PII upgrade + second ingest container: Luhn card redaction,
# sitemap XML roundtrip
# ---------------------------------------------------------------------------

# (display form, Luhn-valid) — validity pinned by tests/test_redact_cards
_CARD_FIXTURES: list[tuple[str, bool]] = [
    ("4111 1111 1111 1111", True),
    ("5500005555555559", True),
    ("3400-0000-0000-09", False),   # 14 digits — fails the checksum
    ("6011000990139424", True),
    ("4111 1111 1111 1112", False),
    ("5500005555555550", False),
    ("340000000000001", False),
    ("6011-0009-9013-9425", False),
]


def q_luhn_redact(sf_dir: str) -> "ray.data.Dataset":
    """Credit-card redaction with REAL checksum verification
    (ops/redact.redact_cards_batch): digit runs are only masked when
    the Luhn checksum passes — the order-id/timestamp false-positive
    killer.  Vectorized RE2 prefilter, Python only on candidate rows.
    The checksum is not SQL-expressible, so cards come from a shared
    fixture table (half valid, half one-digit-off or misformatted) and
    the oracle replays the expected mask from the same tuples — an
    engine that validates wrongly breaks the hash."""
    from .ops.redact import redact_cards_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    cards = [c for c, _v in _CARD_FIXTURES]

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        planted = [f"{t or ''} card: {cards[d % 8]}"
                   for d, t in zip(ids, texts)]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(planted, pa.string())})

    return (ds.map_batches(plant, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(redact_cards_batch, batch_format="pyarrow",
                         zero_copy_batch=True))


def _luhn_oracle() -> str:
    vals = ", ".join(
        f"({i}, '{card}', {'TRUE' if valid else 'FALSE'})"
        for i, (card, valid) in enumerate(_CARD_FIXTURES))
    return (
        f"WITH cards(i, card, valid) AS (VALUES {vals}) "
        "SELECT d.doc_id, d.text || ' card: ' || "
        "CASE WHEN c.valid THEN '[CARD]' ELSE c.card END AS text, "
        "CAST(CASE WHEN c.valid THEN 1 ELSE 0 END AS BIGINT) AS n_cards "
        "FROM documents d JOIN cards c ON c.i = d.doc_id % 8"
    )


def q_sitemap_roundtrip(sf_dir: str) -> "ray.data.Dataset":
    """Sitemap XML ingest bridge (functions/sitemap.py): 10 urls per
    sitemap document, urls carrying a real ``&`` that must be
    ``&amp;``-escaped on the wire and decoded back, optional
    lastmod/priority fields planted on modular schedules (NULLs
    roundtrip as NULLs).  Build -> parse inside one batch; the oracle
    states the closed form.  Zero shuffles."""
    from .functions.sitemap import build_sitemap, parse_sitemap

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        entries = [{
            "loc": f"https://site{d % 20}.example/p/{d}?a=1&b=2",
            "lastmod": f"2026-0{d % 9 + 1}-01" if d % 2 == 0 else None,
            "priority": f"0.{d % 10}" if d % 3 == 0 else None,
        } for d in ids]
        out_id, out = [], []
        for i in range(0, len(entries), 10):
            chunk = entries[i:i + 10]
            parsed = parse_sitemap(build_sitemap(chunk))
            out_id.extend(ids[i:i + 10])
            out.extend(parsed)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "loc": pa.array([e["loc"] for e in out], pa.string()),
            "lastmod": pa.array([e["lastmod"] for e in out], pa.string()),
            "priority": pa.array([e["priority"] for e in out],
                                 pa.string()),
        })

    return ds.map_batches(roundtrip, batch_format="pyarrow",
                          zero_copy_batch=True)


ORACLE_SQL["sitemap_roundtrip"] = (
    "SELECT doc_id, 'https://site' || CAST(doc_id % 20 AS VARCHAR) || "
    "'.example/p/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS loc, "
    "CASE WHEN doc_id % 2 = 0 THEN '2026-0' || "
    "CAST(doc_id % 9 + 1 AS VARCHAR) || '-01' END AS lastmod, "
    "CASE WHEN doc_id % 3 = 0 THEN '0.' || "
    "CAST(doc_id % 10 AS VARCHAR) END AS priority FROM documents"
)

QUERIES["luhn_redact"] = q_luhn_redact
QUERIES["sitemap_roundtrip"] = q_sitemap_roundtrip
ORACLE_SQL["luhn_redact"] = _luhn_oracle()


# ---------------------------------------------------------------------------
# Round-5: near-dup cluster-size histogram
# ---------------------------------------------------------------------------

def q_dup_cluster_sizes(sf_dir: str) -> "ray.data.Dataset":
    """Near-dup cluster-size distribution — the one-screen audit of how
    duplicated a crawl is (singletons vs pathological mega-clusters),
    and the number that sizes dedup's shuffle skew risk.  Rides the
    full corpus-scale path (ops/dedup.minhash_lsh_dedup_ds: ONE
    banding shuffle, join-verified candidates, hash-to-min
    components), then two TINY groupbys: label -> cluster size ->
    histogram.  The oracle extends the minhash reachability CTE with
    the same double aggregation."""
    from ray.data.aggregate import Count as _Count

    from .ops.dedup import minhash_lsh_dedup_ds

    labels = minhash_lsh_dedup_ds(_planted_docs(sf_dir), threshold=0.8,
                                  concurrency=_fixed_concurrency(),
                                  num_partitions=4)
    sizes = (labels.groupby("cluster_rep")
             .aggregate(_Count(alias_name="cluster_size")))
    return (sizes.groupby("cluster_size")
            .aggregate(_Count(alias_name="n_clusters")))


_DUP_SIZES_FINAL = "SELECT a AS doc_id, min(b) < a AS is_dup FROM reach GROUP BY a"
assert _DUP_SIZES_FINAL in _MINHASH_ORACLE  # oracle-prefix contract

ORACLE_SQL["dup_cluster_sizes"] = _MINHASH_ORACLE.replace(
    _DUP_SIZES_FINAL,
    "SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters FROM ("
    "SELECT CAST(count(*) AS BIGINT) AS cluster_size FROM ("
    "SELECT a, min(b) AS rep FROM reach GROUP BY a) GROUP BY rep) "
    "GROUP BY cluster_size")

QUERIES["dup_cluster_sizes"] = q_dup_cluster_sizes


# ---------------------------------------------------------------------------
# Round-5: composed web-ingest chain and a capped inverted index
# ---------------------------------------------------------------------------

def q_web_ingest_chain(sf_dir: str) -> "ray.data.Dataset":
    """The web-side sibling of curate_corpus — the full crawl-frontier
    hygiene chain as ONE streaming Dataset: robots.txt gate
    (broadcast rules, no shuffle) -> URL assembly with planted
    scheme-case and utm noise -> RE2 canonicalization (stateless) ->
    URL-keyed exact dedup (first-wins; only (hash128, key) tuples ride
    the one shuffle).  Oracle: the same chain as chained CTEs over the
    shared robots rule tuples and the shared canonicalize rewrite
    sequence."""
    from .ops.dedup import exact_dedup
    from .ops.robots import robots_filter
    from .ops.urlnorm import canonicalize_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def plant_coarse(batch: pa.Table) -> pa.Table:
        # coarser residues than _plant_host_path (lcm 330), so the
        # final URL dedup genuinely collapses groups at test scale
        did = batch["doc_id"].to_numpy()
        add = np.char.add
        host = add(add("site", (did % 5).astype("U1")), ".example")
        path = add(add(add("/sec", (did % 11).astype("U2")), "/p"),
                   (did % 3).astype("U1"))
        return pa.table({
            "doc_id": batch["doc_id"],
            "host": pa.array(host.tolist(), pa.string()),
            "path": pa.array(path.tolist(), pa.string()),
        })

    urls = ds.map_batches(plant_coarse, batch_format="pyarrow",
                          zero_copy_batch=True)
    allowed = robots_filter(urls, _robots_texts())

    def build_url(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        hosts = np.asarray(batch["host"].to_pylist(), dtype="U")
        paths = np.asarray(batch["path"].to_pylist(), dtype="U")
        scheme = np.where(did % 2 == 1, "HTTPS://", "http://")
        q = np.select([did % 5 == 2, did % 5 == 3],
                      ["?utm_source=x", "?id=9&utm_x=1"], "")
        add = np.char.add
        url = add(add(add(scheme.astype("U8"), hosts), paths), q)
        return pa.table({"doc_id": batch["doc_id"],
                         "url": pa.array(url.tolist(), pa.string())})

    canon = (allowed.map_batches(build_url, batch_format="pyarrow",
                                 zero_copy_batch=True)
             .map_batches(canonicalize_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
             .select_columns(["doc_id", "canon_url"]))
    return exact_dedup(canon, text_col="canon_url", key_col="doc_id")


def _web_chain_oracle() -> str:
    from .ops.urlnorm import oracle_canonicalize_expr

    vals = ", ".join(
        f"('site{i}.example', '{prefix}', "
        f"{'TRUE' if allow else 'FALSE'}, {len(prefix)})"
        for i in range(20) for allow, prefix in _robots_rule_tuples(i))
    return (
        "WITH u AS (SELECT doc_id, "
        "'site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS host, "
        "'/sec' || CAST(doc_id % 11 AS VARCHAR) || '/p' || "
        "CAST(doc_id % 3 AS VARCHAR) AS path FROM documents), "
        f"r(host, prefix, is_allow, plen) AS (VALUES {vals}), "
        "m AS (SELECT u.doc_id, r.is_allow, ROW_NUMBER() OVER ("
        "PARTITION BY u.doc_id ORDER BY r.plen DESC, r.is_allow DESC"
        ") AS rn FROM u JOIN r ON u.host = r.host "
        "AND starts_with(u.path, r.prefix)), "
        "a AS (SELECT u.* FROM u LEFT JOIN (SELECT doc_id, is_allow "
        "FROM m WHERE rn = 1) b USING (doc_id) "
        "WHERE b.doc_id IS NULL OR b.is_allow), "
        "raw AS (SELECT doc_id, CASE WHEN doc_id % 2 = 1 THEN "
        "'HTTPS://' ELSE 'http://' END || host || path || "
        "CASE WHEN doc_id % 5 = 2 THEN '?utm_source=x' "
        "WHEN doc_id % 5 = 3 THEN '?id=9&utm_x=1' ELSE '' END AS u2 "
        "FROM a), "
        f"canon AS (SELECT doc_id, {oracle_canonicalize_expr('u2')} "
        "AS canon_url FROM raw) "
        "SELECT MIN(doc_id) AS doc_id, canon_url FROM canon "
        "GROUP BY canon_url"
    )


_IDX_TERMS = 30
_IDX_POSTINGS = 10


def q_inverted_index(sf_dir: str) -> "ray.data.Dataset":
    """Capped inverted index — the IR-side artifact (BM25's sibling):
    for the corpus' top-30 words by document frequency, the doc
    frequency and the first 10 doc_ids as a comma-joined posting
    string.  ONE corpus read: per-batch partials carry (word,
    df_partial, first-10-postings_partial) — doc_ids are globally
    unique, so per-doc word SETS make the pairs distinct with no
    dedup shuffle; the word groupby merges partials (sum df,
    merge-sort-cap postings) and the top-30 cut happens after.
    Postings travel as bounded strings, never unbounded lists."""
    from collections import defaultdict

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        agg: dict[str, list] = defaultdict(lambda: [0, []])
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            for w in set((t or "").split()):
                e = agg[w]
                e[0] += 1
                e[1].append(d)
        words, dfs, posts = [], [], []
        for w, (n, ids) in agg.items():
            words.append(w)
            dfs.append(n)
            posts.append(",".join(map(str,
                                      sorted(ids)[:_IDX_POSTINGS])))
        return pa.table({"word": pa.array(words, pa.string()),
                         "df": pa.array(dfs, pa.int64()),
                         "post": pa.array(posts, pa.string())})

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(int(x) for p in group["post"] if p
                     for x in p.split(","))[:_IDX_POSTINGS]
        return pd.DataFrame({
            "word": [group["word"].iloc[0]],
            "n_docs": [int(group["df"].sum())],
            "postings": [",".join(map(str, ids))],
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("word").map_groups(merge))
    return (merged.sort(["n_docs", "word"], descending=[True, False])
            .limit(_IDX_TERMS))


def _inverted_index_oracle() -> str:
    return (
        "WITH w AS (SELECT doc_id, list_distinct(list_filter("
        "regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS ws "
        "FROM documents), "
        "tok AS (SELECT doc_id, unnest(ws) AS word FROM w), "
        "g AS (SELECT word, CAST(count(*) AS BIGINT) AS n_docs, "
        "array_to_string(list_transform(list_sort(list(doc_id))"
        f"[1 : {_IDX_POSTINGS}], x -> CAST(x AS VARCHAR)), ',') "
        "AS postings FROM tok GROUP BY word) "
        "SELECT word, n_docs, postings FROM g "
        f"ORDER BY n_docs DESC, word ASC LIMIT {_IDX_TERMS}"
    )


QUERIES["web_ingest_chain"] = q_web_ingest_chain
QUERIES["inverted_index"] = q_inverted_index
ORACLE_SQL["web_ingest_chain"] = _web_chain_oracle()
ORACLE_SQL["inverted_index"] = _inverted_index_oracle()


# ---------------------------------------------------------------------------
# Round-5: registered-domain rollup (public-suffix matching) and
# PDF-style dehyphenation
# ---------------------------------------------------------------------------

_PSL = ["com", "org", "net", "co.uk", "org.uk", "ac.jp", "example"]


def q_registered_domains(sf_dir: str) -> "ray.data.Dataset":
    """Per-registrant rollup via public-suffix-style longest-match
    (ops/psl.py): hosts planted across multi-label suffixes
    (``co.uk``/``ac.jp``), deep subdomains, an UNLISTED suffix (the
    implicit last-two-labels rule) and a host that IS a suffix.  The
    engine runs the real matcher; the oracle states the ground-truth
    registered domain closed-form from the plant — so a matcher bug
    (wrong boundary, shortest-match, off-by-one label) breaks the
    hash, which is stronger than replaying the algorithm in SQL.
    Scale shape: suffix set broadcast once per actor; one tiny
    groupby."""
    from ray.data.aggregate import Count as _Count

    from .ops.psl import RegisteredDomainStage

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def plant(batch: pa.Table) -> pa.Table:
        hosts = []
        for d in batch["doc_id"].to_pylist():
            if d % 13 == 0:
                hosts.append("co.uk")
            elif d % 11 == 0:
                hosts.append(f"www.site{d % 6}.internal")
            else:
                sub = ["", "www.", "cdn.blog."][d % 3]
                hosts.append(f"{sub}site{d % 6}.{_PSL[d % 7]}")
        return pa.table({"doc_id": batch["doc_id"],
                         "host": pa.array(hosts, pa.string())})

    tagged = (ds.map_batches(plant, batch_format="pyarrow",
                             zero_copy_batch=True)
              .map_batches(
                  RegisteredDomainStage,
                  fn_constructor_kwargs={"suffixes": _PSL},
                  batch_format="pyarrow", **_pool()))
    return (tagged.groupby("reg_domain")
            .aggregate(_Count(alias_name="n_docs")))


def _registered_domains_oracle() -> str:
    psl_case = " ".join(
        f"WHEN doc_id % 7 = {i} THEN '{s}'" for i, s in enumerate(_PSL))
    return (
        "WITH r AS (SELECT doc_id, CASE "
        "WHEN doc_id % 13 = 0 THEN 'co.uk' "
        "WHEN doc_id % 11 = 0 THEN 'site' || CAST(doc_id % 6 AS VARCHAR)"
        " || '.internal' "
        "ELSE 'site' || CAST(doc_id % 6 AS VARCHAR) || '.' || "
        f"CASE {psl_case} END END AS reg_domain FROM documents) "
        "SELECT reg_domain, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM r GROUP BY reg_domain"
    )


_HYPH_RE = r"-\n([a-z])"
_HYPH_SUB = r"\1"


def q_dehyphenate(sf_dir: str) -> "ray.data.Dataset":
    """Line-break dehyphenation — the classic PDF-extraction repair
    ("mer-\\nge" -> "merge"): hyphen-newline splits planted inside a
    corpus word by a shared replace(), repaired by ONE RE2 capture
    rewrite identical in pyarrow and DuckDB; n_joined counts repairs.
    Stateless vectorized map, zero shuffles."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def fix(batch: pa.Table) -> pa.Table:
        planted = pc.replace_substring(batch["text"], "merge",
                                       "mer-\nge")
        n = pc.cast(pc.count_substring_regex(planted, _HYPH_RE),
                    pa.int64())
        fixed = pc.replace_substring_regex(planted, _HYPH_RE, _HYPH_SUB)
        return pa.table({"doc_id": batch["doc_id"], "text": fixed,
                         "n_joined": n})

    return ds.map_batches(fix, batch_format="pyarrow",
                          zero_copy_batch=True)


ORACLE_SQL["dehyphenate"] = (
    "WITH p AS (SELECT doc_id, replace(text, 'merge', "
    "'mer-' || chr(10) || 'ge') AS t FROM documents) "
    "SELECT doc_id, "
    f"regexp_replace(t, '{_HYPH_RE}', '{_HYPH_SUB}', 'g') AS text, "
    f"CAST(len(regexp_extract_all(t, '{_HYPH_RE}')) AS BIGINT) "
    "AS n_joined FROM p"
)

QUERIES["registered_domains"] = q_registered_domains
QUERIES["dehyphenate"] = q_dehyphenate
ORACLE_SQL["registered_domains"] = _registered_domains_oracle()


# ---------------------------------------------------------------------------
# Round-5: retrieval-eval harness (MRR of first relevant doc)
# ---------------------------------------------------------------------------

def q_bm25_mrr(sf_dir: str) -> pd.DataFrame:
    """Retrieval evaluation over the BM25 engine (ops/bm25.
    mrr_first_relevant): per query term, the EXACT rank of the first
    relevant doc (relevance proxy: min doc key containing the term)
    and its reciprocal rank in micro-units — computed without any
    global sort (rank = 1 + count-of-better, two streaming passes,
    O(T) rows collected).  The oracle extends the shared BM25 scored
    CTE with the same rel/count/rank algebra."""
    from .ops.bm25 import mrr_first_relevant, top_terms_with_stats

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    terms, stats = top_terms_with_stats(ds, lo_rank=_BM25_LO,
                                        hi_rank=_BM25_HI)
    return mrr_first_relevant(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"]),
        terms, stats=stats)


def _bm25_mrr_oracle() -> str:
    full = _bm25_oracle()
    final = "SELECT term, CAST(rank AS BIGINT) AS rank, doc_id, score_micro"
    assert final in full  # shared-prefix contract with bm25_search
    prefix = full[:full.index(final)]
    return prefix + (
        ", rel AS (SELECT word AS term, min(doc_id) AS rel_doc "
        "FROM tf GROUP BY word), "
        "rs AS (SELECT r.term, r.rel_doc, s.score_micro AS rel_score "
        "FROM rel r JOIN scored s ON s.term = r.term "
        "AND s.doc_id = r.rel_doc), "
        "cnt AS (SELECT s.term, count(*) AS better FROM scored s "
        "JOIN rs ON rs.term = s.term WHERE s.score_micro > rs.rel_score "
        "OR (s.score_micro = rs.rel_score AND s.doc_id < rs.rel_doc) "
        "GROUP BY s.term) "
        "SELECT rs.term, rs.rel_doc, "
        "CAST(1 + coalesce(c.better, 0) AS BIGINT) AS rank, "
        "CAST(1000000 // (1 + coalesce(c.better, 0)) AS BIGINT) "
        "AS rr_micro FROM rs LEFT JOIN cnt c USING (term) "
        "ORDER BY rs.term"
    )


QUERIES["bm25_mrr"] = q_bm25_mrr
ORACLE_SQL["bm25_mrr"] = _bm25_mrr_oracle()


# ---------------------------------------------------------------------------
# Round-5: outlink extraction and Unicode script mix
# ---------------------------------------------------------------------------

def q_extract_outlinks(sf_dir: str) -> "ray.data.Dataset":
    """Outlink harvesting (ops/links.py) — the bridge from the
    extraction family to the link-graph family: planted pages carry a
    root-relative link, an absolute link with an ``&amp;``-escaped
    query, and distractors (fragment-only, mailto, single-quoted
    duplicate suppressed by position) that the regex + entity-decode +
    resolution subset must handle exactly.  Stateless per-doc scan,
    zero shuffles; the oracle states the resolved links closed-form."""
    from .ops.links import outlinks_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        htmls, bases = [], []
        for d in ids:
            base = f"https://site{d % 5}.example/dir/page{d}"
            html = (
                f'<html><body><p>x</p>'
                f'<a class="n" href="/p/{d % 7}">rel</a>'
                f'<a href="#top">frag</a>'
                f'<a href="mailto:a@b.example">mail</a>'
                f"<a href='https://other{d % 3}.example/q?a=1&amp;b=2'>abs</a>"
                f'<a href="javascript:void(0)">js</a>'
                f'</body></html>')
            htmls.append(html)
            bases.append(base)
        return pa.table({"doc_id": batch["doc_id"],
                         "html": pa.array(htmls, pa.string()),
                         "url": pa.array(bases, pa.string())})

    return ds.map_batches(plant, batch_format="pyarrow",
                          zero_copy_batch=True).map_batches(
        outlinks_batch, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL["extract_outlinks"] = (
    "SELECT doc_id, 0 AS link_no, "
    "'https://site' || CAST(doc_id % 5 AS VARCHAR) || '.example/p/' || "
    "CAST(doc_id % 7 AS VARCHAR) AS url FROM documents "
    "UNION ALL SELECT doc_id, 1 AS link_no, "
    "'https://other' || CAST(doc_id % 3 AS VARCHAR) || "
    "'.example/q?a=1&b=2' AS url FROM documents"
)


_SCRIPT_PATTERNS = [("latin", r"\p{Latin}"), ("cyrillic", r"\p{Cyrillic}"),
                    ("han", r"\p{Han}"), ("arabic", r"\p{Arabic}")]


def q_script_mix(sf_dir: str) -> "ray.data.Dataset":
    """Unicode script-mix detection — the cheap pre-langid routing
    signal for multilingual crawls: per-doc codepoint counts for
    Latin/Cyrillic/Han/Arabic via one RE2 ``\\p{Script}`` count kernel
    each, identical in pyarrow and DuckDB.  Script snippets planted on
    a doc_id % 4 schedule so every class is exercised.  Stateless map,
    zero shuffles."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def mix(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        tails = np.select(
            [did % 4 == 1, did % 4 == 2, did % 4 == 3],
            [" Привет мир", " 你好世界", " مرحبا بالعالم"], "")
        planted = pc.binary_join_element_wise(
            batch["text"], pa.array(tails.tolist(), pa.string()), "")
        out = {"doc_id": batch["doc_id"]}
        for name, pat in _SCRIPT_PATTERNS:
            out[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(planted, pat), pa.int64())
        return pa.table(out)

    return ds.map_batches(mix, batch_format="pyarrow",
                          zero_copy_batch=True)


def _script_mix_oracle() -> str:
    plant = ("text || CASE doc_id % 4 WHEN 1 THEN ' Привет мир' "
             "WHEN 2 THEN ' 你好世界' WHEN 3 THEN ' مرحبا بالعالم' "
             "ELSE '' END")
    cols = ", ".join(
        f"CAST(len(regexp_extract_all({plant}, '\\p{{{name.capitalize()}}}'"
        f")) AS BIGINT) AS n_{name}"
        for name, _pat in _SCRIPT_PATTERNS)
    return f"SELECT doc_id, {cols} FROM documents"


QUERIES["extract_outlinks"] = q_extract_outlinks
QUERIES["script_mix"] = q_script_mix
ORACLE_SQL["script_mix"] = _script_mix_oracle()


# ---------------------------------------------------------------------------
# Round-5: end-to-end pages -> outlinks -> domain graph -> PageRank
# ---------------------------------------------------------------------------

def q_domain_pagerank(sf_dir: str) -> "ray.data.Dataset":
    """The full web loop in ONE streaming pipeline: planted HTML pages
    -> outlink harvest (ops/links.py regex + entity decode +
    resolution) -> vectorized host-digit parse to integer domain ids
    (site{k} -> k, other{j} -> 100 + j) -> integer-exact distributed
    PageRank (ops/pagerank.py) over the resulting multi-edge domain
    graph.  Multi-edges kept as multiplicity on BOTH sides; the
    other{j} nodes are dangling (default leak semantics, as
    pagerank_links).  The oracle feeds the closed-form edge plant to
    the same chained-CTE PageRank mirror — extraction, graph build and
    the iterative algorithm are all inside one hash check."""
    from .ops.links import outlinks_batch
    from .ops.pagerank import pagerank_int

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        htmls, bases = [], []
        for d in ids:
            bases.append(f"https://site{d % 5}.example/dir/page{d}")
            htmls.append(
                f'<html><body><a href="/p/{d % 7}">rel</a>'
                f"<a href='https://other{d % 3}.example/q?a=1&amp;b=2'>x</a>"
                f'</body></html>')
        return pa.table({"doc_id": batch["doc_id"],
                         "html": pa.array(htmls, pa.string()),
                         "url": pa.array(bases, pa.string())})

    links = (ds.map_batches(plant, batch_format="pyarrow",
                            zero_copy_batch=True)
             .map_batches(outlinks_batch, batch_format="pyarrow",
                          zero_copy_batch=True))

    def to_edges(batch: pa.Table) -> pa.Table:
        site = pc.extract_regex(batch["url"],
                                r"^https://site(?P<k>\d+)\.example")
        other = pc.extract_regex(batch["url"],
                                 r"^https://other(?P<j>\d+)\.example")
        k = pc.struct_field(site, "k")
        j = pc.struct_field(other, "j")
        kv = np.array([int(x) if x is not None else -1
                       for x in k.to_pylist()], dtype=np.int64)
        jv = np.array([int(x) if x is not None else -1
                       for x in j.to_pylist()], dtype=np.int64)
        dst = np.where(kv >= 0, kv, 100 + jv)
        keep = (kv >= 0) | (jv >= 0)
        src = batch["doc_id"].to_numpy() % 5
        return pa.table({"src": pa.array(src[keep], pa.int64()),
                         "dst": pa.array(dst[keep], pa.int64())})

    edges = links.map_batches(to_edges, batch_format="pyarrow",
                              zero_copy_batch=True)
    return pagerank_int(edges, n_iters=3)


def _domain_pagerank_oracle() -> str:
    from .ops.pagerank import oracle_pagerank_sql

    edges = ("SELECT doc_id % 5 AS src, doc_id % 5 AS dst FROM documents "
             "UNION ALL SELECT doc_id % 5 AS src, 100 + doc_id % 3 AS dst "
             "FROM documents")
    return oracle_pagerank_sql(edges, n_iters=3)


QUERIES["domain_pagerank"] = q_domain_pagerank
ORACLE_SQL["domain_pagerank"] = _domain_pagerank_oracle()


# ---------------------------------------------------------------------------
# Round-5: IDN (punycode) host decoding
# ---------------------------------------------------------------------------

def _decode_idn(host: str) -> tuple[str, bool]:
    """Punycode host -> Unicode via the stdlib idna codec; malformed
    labels keep the wire form with ok=False (failure-as-data)."""
    try:
        return host.encode("ascii").decode("idna"), True
    except (UnicodeError, UnicodeDecodeError):
        return host, False


def q_idn_hosts(sf_dir: str) -> "ray.data.Dataset":
    """Internationalized-domain decoding — multilingual crawls carry
    xn-- punycode hosts on the wire; per-domain rollups need the
    Unicode form.  Hosts planted across real punycode (Latin-diacritic
    and Cyrillic labels), plain ASCII, and one MALFORMED label that
    must fall back to the wire form with ok=false, not raise.  The
    engine runs the real RFC 3492 decode (stdlib idna codec); the
    oracle states the expected Unicode closed-form — a decoder bug
    breaks the hash."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def decode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hosts, out, ok = [], [], []
        for d in ids:
            if d % 13 == 6:
                h = "xn--zzz@@.example"     # malformed punycode
            elif d % 4 == 0:
                h = "xn--mnchen-3ya.example"
            elif d % 4 == 1:
                h = "xn--caf-dma.example"
            elif d % 4 == 2:
                h = "xn--80akhbyknj4f.example"
            else:
                h = f"plain{d % 7}.example"
            u, good = _decode_idn(h)
            hosts.append(h)
            out.append(u)
            ok.append(good)
        return pa.table({"doc_id": batch["doc_id"],
                         "host": pa.array(hosts, pa.string()),
                         "unicode_host": pa.array(out, pa.string()),
                         "ok": pa.array(ok, pa.bool_())})

    return ds.map_batches(decode, batch_format="pyarrow",
                          zero_copy_batch=True)


ORACLE_SQL["idn_hosts"] = (
    "SELECT doc_id, "
    "CASE WHEN doc_id % 13 = 6 THEN 'xn--zzz@@.example' "
    "WHEN doc_id % 4 = 0 THEN 'xn--mnchen-3ya.example' "
    "WHEN doc_id % 4 = 1 THEN 'xn--caf-dma.example' "
    "WHEN doc_id % 4 = 2 THEN 'xn--80akhbyknj4f.example' "
    "ELSE 'plain' || CAST(doc_id % 7 AS VARCHAR) || '.example' END "
    "AS host, "
    "CASE WHEN doc_id % 13 = 6 THEN 'xn--zzz@@.example' "
    "WHEN doc_id % 4 = 0 THEN 'münchen.example' "
    "WHEN doc_id % 4 = 1 THEN 'café.example' "
    "WHEN doc_id % 4 = 2 THEN 'испытание.example' "
    "ELSE 'plain' || CAST(doc_id % 7 AS VARCHAR) || '.example' END "
    "AS unicode_host, "
    "doc_id % 13 <> 6 AS ok FROM documents"
)

QUERIES["idn_hosts"] = q_idn_hosts


# ---------------------------------------------------------------------------
# Round-5: winnowing fingerprint selection
# ---------------------------------------------------------------------------

def q_winnow_selection(sf_dir: str) -> "ray.data.Dataset":
    """Winnowing (ops/winnow.py — the MOSS fingerprint selector,
    SIGMOD'03) with the lexicographic-order variant that makes the
    whole selection REPLAYABLE in SQL: per-doc window-min k-grams
    (monotone-deque O(n) engine pass vs one window-MIN in DuckDB),
    summarized as (n_grams, n_selected, first/last selected gram).
    Unlike the hashed fingerprint family's equality-structure checks,
    this is a full value-hash oracle over the algorithm's actual
    output.  Stateless map, zero shuffles."""
    from .ops.winnow import winnow_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(winnow_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def _winnow_oracle() -> str:
    from .ops.winnow import oracle_winnow_sql

    return oracle_winnow_sql("SELECT doc_id, text FROM documents")


QUERIES["winnow_selection"] = q_winnow_selection
ORACLE_SQL["winnow_selection"] = _winnow_oracle()


# ---------------------------------------------------------------------------
# Round-5: shuffle-quality audit (per-shard source run lengths)
# ---------------------------------------------------------------------------

_SHUF_SHARDS = 16
_SHUF_SHARD_WIDTH = (1 << 32) // _SHUF_SHARDS


def q_shuffle_run_lengths(sf_dir: str) -> "ray.data.Dataset":
    """Shuffle-quality audit — the pre-training check that a
    deterministically shuffled corpus actually interleaves its
    sources: docs ordered by the Knuth hash (ops/sampling.sample_hash,
    ties by doc_id) within 16 contiguous hash-range SHARDS (what one
    data-loader worker would read), runs of consecutive same-source
    docs measured per shard, aggregated into a run-length histogram
    (a healthy shuffle is dominated by short runs).  Shard-bucketed
    map_groups with one vectorized boundary-diff pass per shard — the
    sessionize shape; runs never merge across shards by design.  The
    oracle replays the order with the HUGEINT-exact hash mirror and a
    gaps-and-islands window."""
    from ray.data.aggregate import Sum as _Sum

    from .ops.sampling import sample_hash

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])

    def add_shard(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        h = sample_hash(did)
        # skew plant: a third of the corpus collapses into one
        # megasource (the realistic bad case a shuffle audit exists
        # for); without it the synthetic source=id%20 column and the
        # hash order's three-distance strides make every run length 1
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        src[did % 3 == 0] = "mega"
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": pa.array(src.tolist(), pa.string()),
            "h": pa.array(h.astype(np.int64), pa.int64()),
            "shard": pa.array((h // _SHUF_SHARD_WIDTH).astype(np.int64),
                              pa.int64()),
        })

    def runs_in_shard(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["h", "doc_id"], kind="mergesort")
        src = g["source"].to_numpy()
        new_run = np.ones(len(g), dtype=bool)
        new_run[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.r_[starts, len(g)])
        ln, cnt = np.unique(lens, return_counts=True)
        return pd.DataFrame({"run_len": ln.astype(np.int64),
                             "n_runs": cnt.astype(np.int64)})

    partial = (ds.map_batches(add_shard, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("shard").map_groups(runs_in_shard,
                                            batch_format="pandas"))
    from .ops.rayfix import arrow_blocks

    return (arrow_blocks(partial).groupby("run_len")
            .aggregate(_Sum("n_runs", alias_name="n_runs")))


def _shuffle_runs_oracle() -> str:
    from .ops.sampling import sample_hash_sql

    h = sample_hash_sql("doc_id")
    return (
        f"WITH o AS (SELECT CASE WHEN doc_id % 3 = 0 THEN 'mega' "
        f"ELSE source END AS source, doc_id, CAST({h} AS BIGINT) AS h "
        "FROM documents), "
        "s AS (SELECT source, doc_id, h, "
        f"h // {_SHUF_SHARD_WIDTH} AS shard FROM o), "
        "r AS (SELECT shard, source, "
        "ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) "
        "- ROW_NUMBER() OVER (PARTITION BY shard, source "
        "ORDER BY h, doc_id) AS island FROM s), "
        "runs AS (SELECT shard, source, island, COUNT(*) AS run_len "
        "FROM r GROUP BY 1, 2, 3) "
        "SELECT CAST(run_len AS BIGINT) AS run_len, "
        "CAST(COUNT(*) AS BIGINT) AS n_runs FROM runs GROUP BY 1"
    )


QUERIES["shuffle_run_lengths"] = q_shuffle_run_lengths
ORACLE_SQL["shuffle_run_lengths"] = _shuffle_runs_oracle()


# ---------------------------------------------------------------------------
# Round-5: crawl-politeness budgets and rel=canonical extraction
# ---------------------------------------------------------------------------

_DELAY_SCHEDULE = [1, 2, 5, 10, -1]  # -1 == no Crawl-delay line


def _politeness_texts() -> dict[str, str]:
    """Robots bodies with per-host Crawl-delay (absent for i%5==4) and
    a badbot group whose delay must be IGNORED."""
    out = {}
    for i in range(20):
        d = _DELAY_SCHEDULE[i % 5]
        lines = ["User-agent: badbot", "Crawl-delay: 99", "Disallow: /",
                 "", "User-agent: *   # us"]
        if d >= 0:
            lines.append(f"Crawl-delay: {d}")
        lines.append("Disallow: /private/")
        out[f"site{i}.example"] = "\n".join(lines)
    return out


def q_crawl_budget(sf_dir: str) -> "ray.data.Dataset":
    """Per-host politeness budget — the crawl scheduler's core number:
    parse each host's Crawl-delay from the ``*`` group (the badbot
    group's delay is a planted trap) and derive fetches/hour =
    3600 // max(delay, 1), default 3600 when absent.  The host table
    derives from the corpus (distinct doc_id%20) and the robots map
    broadcasts; the oracle states delay and budget closed-form."""
    from ray.data.aggregate import Count as _Count

    from .ops.robots import parse_crawl_delay

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def host_of(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        add = np.char.add
        host = add(add("site", (did % 20).astype("U2")), ".example")
        return pa.table({"host": pa.array(host.tolist(), pa.string())})

    hosts = (ds.map_batches(host_of, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("host").aggregate(_Count(alias_name="n_docs")))
    texts_ref = ray.put(_politeness_texts())

    def budget(batch: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        hs = batch["host"].to_pylist()
        delays, budgets = [], []
        for h in hs:
            d = parse_crawl_delay(texts.get(h, ""))
            delays.append(-1 if d is None else d)
            budgets.append(3600 if d is None else 3600 // max(d, 1))
        return pa.table({
            "host": batch["host"],
            "n_docs": batch["n_docs"],
            "crawl_delay": pa.array(delays, pa.int64()),
            "budget_per_hour": pa.array(budgets, pa.int64()),
        })

    return hosts.map_batches(budget, batch_format="pyarrow",
                             zero_copy_batch=True)


def _crawl_budget_oracle() -> str:
    delay_case = " ".join(
        f"WHEN {i} THEN {d}" for i, d in enumerate(_DELAY_SCHEDULE))
    return (
        "WITH h AS (SELECT 'site' || CAST(doc_id % 20 AS VARCHAR) || "
        "'.example' AS host, doc_id % 20 AS i FROM documents), "
        "g AS (SELECT host, i % 5 AS s, CAST(COUNT(*) AS BIGINT) "
        "AS n_docs FROM h GROUP BY 1, 2) "
        f"SELECT host, n_docs, CAST(CASE s {delay_case} END AS BIGINT) "
        "AS crawl_delay, "
        f"CAST(CASE s {' '.join(f'WHEN {i} THEN {3600 if d < 0 else 3600 // max(d, 1)}' for i, d in enumerate(_DELAY_SCHEDULE))} END "
        "AS BIGINT) AS budget_per_hour FROM g"
    )


def q_rel_canonical(sf_dir: str) -> "ray.data.Dataset":
    """rel=canonical extraction + self-canonical audit — the dedup
    signal publishers declare themselves: pages planted with a
    canonical link that strips the page's own utm junk (self), points
    at a DIFFERENT page (syndication), or is absent (implicitly
    self).  One vectorized RE2 extract + the shared urlnorm
    canonicalize chain on both sides of the comparison; closed-form
    oracle."""
    from .ops.urlnorm import canonicalize_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        urls, htmls = [], []
        for d in ids:
            page = f"https://site{d % 5}.example/p/{d % 11}?utm_x=1"
            if d % 3 == 0:
                link = (f'<link rel="canonical" href='
                        f'"https://site{d % 5}.example/p/{d % 11}">')
            elif d % 3 == 1:
                link = (f'<link rel="canonical" href='
                        f'"https://site{d % 5}.example/p/master">')
            else:
                link = ""
            urls.append(page)
            htmls.append(f"<html><head>{link}</head><body>x</body></html>")
        return pa.table({"doc_id": batch["doc_id"],
                         "url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.string())})

    def audit(batch: pa.Table) -> pa.Table:
        href = pc.struct_field(pc.extract_regex(
            batch["html"],
            r'<link rel="canonical" href="(?P<h>[^"]*)"'), "h")
        canon_page = canonicalize_batch(
            pa.table({"url": batch["url"]}))["canon_url"]
        has = pc.is_valid(href)
        canon_href = canonicalize_batch(
            pa.table({"url": pc.if_else(has, href, "")}))["canon_url"]
        self_canon = pc.or_(pc.invert(has),
                            pc.equal(canon_href, canon_page))
        return pa.table({
            "doc_id": batch["doc_id"],
            "canonical_href": pc.if_else(has, href, None),
            "self_canonical": self_canon,
        })

    return (ds.map_batches(plant, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(audit, batch_format="pyarrow",
                         zero_copy_batch=True))


ORACLE_SQL["rel_canonical"] = (
    "SELECT doc_id, "
    "CASE WHEN doc_id % 3 = 0 THEN 'https://site' || "
    "CAST(doc_id % 5 AS VARCHAR) || '.example/p/' || "
    "CAST(doc_id % 11 AS VARCHAR) "
    "WHEN doc_id % 3 = 1 THEN 'https://site' || "
    "CAST(doc_id % 5 AS VARCHAR) || '.example/p/master' "
    "END AS canonical_href, "
    "doc_id % 3 <> 1 AS self_canonical FROM documents"
)

QUERIES["crawl_budget"] = q_crawl_budget
QUERIES["rel_canonical"] = q_rel_canonical
ORACLE_SQL["crawl_budget"] = _crawl_budget_oracle()


def q_crawl_schedule(sf_dir: str) -> "ray.data.Dataset":
    """Crawl-completion ETA — the scheduler roll-up that the robots
    gate and the politeness budget exist to feed: per host, the count
    of robots-ALLOWED urls (ops/robots.py decision over the shared
    rule tuples), the Crawl-delay budget (fetches/hour), and
    hours_to_crawl = ceil(n_allowed / budget).  Three-op composition
    in one streaming pipeline (robots filter -> host rollup ->
    broadcast budget attach); the oracle chains the VALUES decision,
    the closed-form budget and the integer ceiling."""
    from ray.data.aggregate import Count as _Count

    from .ops.robots import parse_crawl_delay, robots_filter

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    urls = ds.map_batches(_plant_host_path, batch_format="pyarrow",
                          zero_copy_batch=True)
    allowed = robots_filter(urls, _robots_texts())
    per_host = (allowed.groupby("host")
                .aggregate(_Count(alias_name="n_allowed")))
    texts_ref = ray.put(_politeness_texts())

    def attach(batch: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        hs = batch["host"].to_pylist()
        n = batch["n_allowed"].to_numpy()
        budgets = []
        for h in hs:
            d = parse_crawl_delay(texts.get(h, ""))
            budgets.append(3600 if d is None else 3600 // max(d, 1))
        b = np.asarray(budgets, dtype=np.int64)
        hours = -(-n // b)  # ceil division
        return pa.table({
            "host": batch["host"],
            "n_allowed": batch["n_allowed"],
            "budget_per_hour": pa.array(b, pa.int64()),
            "hours_to_crawl": pa.array(hours, pa.int64()),
        })

    return per_host.map_batches(attach, batch_format="pyarrow",
                                zero_copy_batch=True)


def _crawl_schedule_oracle() -> str:
    vals = []
    for i in range(20):
        for is_allow, prefix in _robots_rule_tuples(i):
            vals.append(f"('site{i}.example', '{prefix}', "
                        f"{'TRUE' if is_allow else 'FALSE'}, {len(prefix)})")
    budget_case = " ".join(
        f"WHEN {i} THEN {3600 if d < 0 else 3600 // max(d, 1)}"
        for i, d in enumerate(_DELAY_SCHEDULE))
    return (
        f"WITH u AS (SELECT doc_id, {_ROBOTS_HOST_SQL} AS host, "
        f"{_ROBOTS_PATH_SQL} AS path, doc_id % 20 AS hi FROM documents), "
        f"r(host, prefix, is_allow, plen) AS (VALUES {', '.join(vals)}), "
        "m AS (SELECT u.doc_id, r.is_allow, ROW_NUMBER() OVER ("
        "PARTITION BY u.doc_id ORDER BY r.plen DESC, r.is_allow DESC"
        ") AS rn FROM u JOIN r ON u.host = r.host "
        "AND starts_with(u.path, r.prefix)), "
        "a AS (SELECT u.host, u.hi FROM u LEFT JOIN (SELECT doc_id, "
        "is_allow FROM m WHERE rn = 1) b USING (doc_id) "
        "WHERE b.doc_id IS NULL OR b.is_allow), "
        "g AS (SELECT host, hi % 5 AS s, CAST(COUNT(*) AS BIGINT) AS "
        "n_allowed FROM a GROUP BY 1, 2) "
        f"SELECT host, n_allowed, CAST(CASE s {budget_case} END AS "
        "BIGINT) AS budget_per_hour, "
        f"CAST(ceil(CAST(n_allowed AS DOUBLE) / (CASE s {budget_case} "
        "END)) AS BIGINT) AS hours_to_crawl FROM g"
    )


QUERIES["crawl_schedule"] = q_crawl_schedule
ORACLE_SQL["crawl_schedule"] = _crawl_schedule_oracle()
