"""Ray Data integration tests: flagship pipeline, fan-out reassembly,
lineage rollup, resumable partitioned output (single shared Ray session
via conftest)."""

import glob
import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def extracted_rows(ray_session, pages_parquet):
    import ray.data

    from extract_kit_ray.pipelines.flagship import extract_pages

    ds = ray.data.read_parquet(pages_parquet, columns=["url", "warc_ts", "html", "lang"])
    return extract_pages(ds, concurrency=2).take_all()


def test_flagship_row_count_and_validity(extracted_rows):
    assert len(extracted_rows) == 300
    invalid = [r for r in extracted_rows if not r["valid"]]
    # corruption rows 41 (empty), 91 (bad utf8), 191 (empty), 241 (bad utf8)
    assert len(invalid) == 4
    assert all(r["errors"] for r in invalid)


def test_flagship_boilerplate_stripped(extracted_rows):
    html_rows = [r for r in extracted_rows if r["doc_kind"] == "html" and r["valid"]]
    assert html_rows
    for r in html_rows[:20]:
        assert "Menu 0" not in r["text"]  # nav
        assert "Privacy" not in r["text"]  # footer
        assert "Related story" not in r["text"]  # link-dense sidebar


def test_flagship_domain_column(extracted_rows):
    domains = {r["domain"] for r in extracted_rows}
    assert "alpha-news.example" in domains and len(domains) == 20


def test_layout_fanout_reassembly_matches_inline(ray_session, pages_parquet):
    """The fan-out path (page rows + groupby reassembly) must produce
    byte-identical text to the inline layout parse."""
    import ray.data

    from extract_kit_ray.pipelines.flagship import extract_pages
    from extract_kit_ray.stages.pdf_stage import extract_layout_fanout

    ds = ray.data.read_parquet(pages_parquet, columns=["url", "warc_ts", "html", "lang"])
    fan = {r["url"]: r for r in extract_layout_fanout(ds).take_all() if r["valid"]}
    ds2 = ray.data.read_parquet(pages_parquet, columns=["url", "warc_ts", "html", "lang"])
    inline = {
        r["url"]: r for r in extract_pages(ds2, concurrency=2).take_all()
        if r["doc_kind"] == "layout" and r["valid"]
    }
    assert set(fan) == set(inline) and fan
    for url, r in fan.items():
        assert r["text"] == inline[url]["text"], f"fanout/inline text mismatch for {url}"
        assert r["n_pages"] == inline[url]["meta"]["n_pages"]
    assert {r["n_pages"] for r in fan.values()} == {1, 2, 3, 5, 20}


def test_lineage_rollup_counts(ray_session, pages_parquet):
    import ray.data

    from extract_kit_ray.pipelines.flagship import extract_pages
    from extract_kit_ray.pipelines.lineage import lineage_rollup

    ds = ray.data.read_parquet(pages_parquet, columns=["url", "warc_ts", "html", "lang"])
    tbl = lineage_rollup(extract_pages(ds, concurrency=2))
    assert tbl.num_rows == 20
    assert sum(tbl["n_docs"].to_pylist()) == 300
    assert sum(tbl["n_valid"].to_pylist()) == 296
    assert all(b >= 0 for b in tbl["n_bytes_out"].to_pylist())


def test_resumable_partitioned_output(ray_session, pages_parquet, tmp_path):
    from extract_kit_ray.pipelines.resume import run_partitioned_extract
    from extract_kit_ray.state.manifests import read_done_parts

    out = str(tmp_path / "out")
    stats = run_partitioned_extract(pages_parquet, out, n_parts=8, concurrency=2)
    assert stats["parts_written"] == list(range(8))
    assert not stats["resumed"]
    total1 = pq.read_table(out).num_rows
    assert total1 == 300

    # kill two partitions' manifests -> resume recomputes exactly those
    for m in sorted(glob.glob(os.path.join(out, "_manifests", "*.json")))[:2]:
        os.remove(m)
    stats2 = run_partitioned_extract(pages_parquet, out, n_parts=8, concurrency=2)
    assert stats2["resumed"]
    assert stats2["parts_cleaned"] == [0, 1] == stats2["parts_written"]
    tbl = pq.read_table(out)
    assert tbl.num_rows == 300
    assert len(set(tbl["url"].to_pylist())) == 300  # no double-writes
    assert len(read_done_parts(out)) == 8

    # fully-complete rerun extracts nothing new
    stats3 = run_partitioned_extract(pages_parquet, out, n_parts=8, concurrency=2)
    assert stats3["parts_written"] == [] and stats3["parts_cleaned"] == []


def test_one_file_per_part_at_512_parts(ray_session, pages_parquet, tmp_path):
    """High part-count guard: B blocks x P parts must NOT explode into
    B*P files — the groupby(part) writer yields exactly one data file
    per non-empty part, even at n_parts=512 with tiny parts."""
    from extract_kit_ray.pipelines.resume import run_partitioned_extract

    out = str(tmp_path / "out512")
    stats = run_partitioned_extract(pages_parquet, out, n_parts=512, concurrency=2)
    data_files = glob.glob(os.path.join(out, "part=*", "*.parquet"))
    assert len(data_files) == len(stats["parts_written"])
    per_dir = {}
    for f in data_files:
        d = os.path.basename(os.path.dirname(f))
        per_dir[d] = per_dir.get(d, 0) + 1
    assert all(n == 1 for n in per_dir.values())
    assert pq.read_table(out).num_rows == 300


def test_read_extracted_dedup_parallel(ray_session, pages_parquet, tmp_path):
    """Double-write guard: a duplicated part file must dedupe on url in
    BOTH regimes — split+groupby under the broadcast guard, and the
    full groupby(url) keep-one fallback (broadcast_max=0)."""
    import shutil

    from extract_kit_ray.pipelines.resume import read_extracted, run_partitioned_extract

    out = str(tmp_path / "outdup")
    run_partitioned_extract(pages_parquet, out, n_parts=4, concurrency=2)
    # simulate a torn double-write: clone part 0's data file
    src = glob.glob(os.path.join(out, "part=0", "*.parquet"))[0]
    shutil.copy(src, os.path.join(out, "part=0", "data-dup.parquet"))
    raw = pq.read_table(out).num_rows
    assert raw > 300
    for guard in (None, 0):
        ds = read_extracted(out, broadcast_max=guard)
        urls = [r["url"] for r in ds.select_columns(["url"]).take_all()]
        assert len(urls) == 300
        assert len(set(urls)) == 300


def test_detect_stage(ray_session, pages_parquet):
    import ray.data

    from extract_kit_ray.stages.detect_stage import detect_batch

    ds = ray.data.read_parquet(pages_parquet, columns=["url", "warc_ts", "html", "lang"])
    out = ds.map_batches(detect_batch, batch_format="pyarrow").take_all()
    kinds = {r["doc_kind"] for r in out}
    assert {"html", "layout", "docx", "empty"} <= kinds
    docx = [r for r in out if r["doc_kind"] == "docx"]
    assert docx and all(r["detected_ext"] == ".docx" for r in docx)


def test_flagship_skewed_corpus(ray_session):
    """Skew rows (100-500x median payloads, 500-page layout docs) must
    flow through extraction as normal valid rows — no task blowup, no
    exception (SURVEY.md §4.1 skew row / §7.4 hard-part 4)."""
    import ray.data

    from extract_kit_ray.fixtures import make_pages_table
    from extract_kit_ray.pipelines.flagship import extract_pages

    tbl = make_pages_table(500, include_skew=True)
    sizes = [len(p) for p in tbl["html"].to_pylist()]
    assert max(sizes) > 50 * (sorted(sizes)[len(sizes) // 2])  # skew present
    ds = ray.data.from_arrow(tbl)
    rows = extract_pages(ds, concurrency=2, batch_size=32).take_all()
    assert len(rows) == 500
    by_url = {r["url"]: r for r in rows}
    # the giant rows themselves extracted fine
    giant_urls = [u for u, s in zip(tbl["url"].to_pylist(), sizes)
                  if s > 50 * (sorted(sizes)[len(sizes) // 2])]
    assert giant_urls
    for u in giant_urls:
        r = by_url[u]
        assert r["valid"], r["errors"]
        assert len(r["text"]) > 0


def test_oversize_isolation_survives_block_builder(ray_session):
    """Yields alone do NOT survive Ray's output-buffer coalescing
    (round-2 advisor finding) — with isolate_oversize_blocks=True the
    scoped block-size cap makes every >threshold payload a true
    single-row batch at the extractor."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from extract_kit_ray.pipelines.flagship import _route_oversize

    big = b"<html><body>" + b"y" * 3_000_000 + b"</body></html>"
    payloads = [b"x" * 1000] * 100 + [big] + [b"x" * 1000] * 100 + [big, big]
    tbl = pa.table({
        "url": pa.array([f"u{i}" for i in range(len(payloads))]),
        "html": pa.array(payloads, pa.binary()),
    })
    threshold = 1 << 20
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = threshold  # what isolate_oversize_blocks sets
    try:
        routed = ray.data.from_arrow(tbl).map_batches(
            _route_oversize,
            fn_kwargs={"threshold": threshold, "normal_rows": 64},
            batch_format="pyarrow", zero_copy_batch=True, batch_size=64,
        )

        def probe(batch: pa.Table) -> pa.Table:
            has_big = pc.max(pc.binary_length(batch["html"])).as_py() > threshold
            return pa.table({"n_rows": pa.array([batch.num_rows]),
                             "has_big": pa.array([has_big])})

        shapes = routed.map_batches(probe, batch_format="pyarrow",
                                    batch_size=None).take_all()
    finally:
        ctx.target_max_block_size = old
    big_batches = [r for r in shapes if r["has_big"]]
    assert len(big_batches) == 3
    assert all(r["n_rows"] == 1 for r in big_batches)
    assert sum(r["n_rows"] for r in shapes) == len(payloads)


def test_lineage_rollup_skew_mapside_combine(ray_session):
    """Heavy-hitter guarantee (SURVEY.md §4.2): one domain holding 50%
    of docs must NOT make the lineage shuffle move per-document rows —
    the map-side combine emits at most n_batches x n_domains partial
    rows, and the rollup stays exact."""
    import pyarrow as pa
    import ray.data

    from extract_kit_ray.pipelines.lineage import lineage_rollup, partial_rollup_batch
    from extract_kit_ray.stages.extract_stage import HtmlExtractor

    n = 400
    hot = "hot.example"
    domains = [hot if i % 2 == 0 else f"d{i % 8}.example" for i in range(n)]
    html = [f"<html><head><title>T{i}</title></head><body><article>"
            f"<h1>T{i}</h1><p>body {i} words here</p></article></body></html>"
            .encode() for i in range(n)]
    tbl = pa.table({
        "url": pa.array([f"https://{d}/p/{i}" for i, d in enumerate(domains)]),
        "warc_ts": pa.array([i for i in range(n)], pa.timestamp("us")),
        "html": pa.array(html, pa.binary()),
        "lang": pa.array(["en"] * n),
    })
    extracted = ray.data.from_arrow(tbl).map_batches(
        HtmlExtractor, batch_format="pyarrow", batch_size=50, concurrency=2)
    # the combine bound: partial rows <= n_batches x n_domains, far
    # below the 400 document rows a naive groupby would shuffle
    partials = extracted.map_batches(partial_rollup_batch,
                                     batch_format="pyarrow", zero_copy_batch=True)
    n_partial = partials.count()
    n_batches = 400 // 50
    assert n_partial <= n_batches * 9
    assert n_partial < n
    out = lineage_rollup(extracted)
    by = {d: n for d, n in zip(out["domain"].to_pylist(),
                               out["n_docs"].to_pylist())}
    assert by[hot] == 200
    assert sum(by.values()) == n


def test_oversize_route_block_shapes():
    """_route_oversize isolates >threshold payloads into single-row
    blocks; normal rows stay in normal_rows-row blocks."""
    import pyarrow as pa

    from extract_kit_ray.pipelines.flagship import _route_oversize

    payloads = [b"x" * 10] * 7 + [b"y" * 5000, b"z" * 6000]
    batch = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(9)]),
            "warc_ts": pa.array(list(range(9)), pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "lang": pa.array(["en"] * 9),
        }
    )
    blocks = list(_route_oversize(batch, threshold=1000, normal_rows=4))
    assert [b.num_rows for b in blocks] == [1, 1, 4, 3]
    assert blocks[0]["url"][0].as_py() == "u7"
    assert blocks[1]["url"][0].as_py() == "u8"
    # nothing lost, nothing duplicated
    urls = [u for b in blocks for u in b["url"].to_pylist()]
    assert sorted(urls) == sorted(batch["url"].to_pylist())


def test_oversize_route_5mb_page_same_outputs(ray_session):
    """A 5 MB page flows through the side route with outputs identical
    to inline extraction (M24 analog: no batch-stall, same results)."""
    import pyarrow as pa
    import ray.data

    from extract_kit_ray.functions.extract import extract_document
    from extract_kit_ray.fixtures import make_html_page
    from extract_kit_ray.pipelines.flagship import extract_pages

    payloads = [make_html_page(i).encode() for i in range(40)]
    big = make_html_page(999, repeat_body=4000).encode()
    assert len(big) > 5_000_000
    payloads.append(big)
    urls = [f"https://s.example/{i}" for i in range(41)]
    tbl = pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.array(list(range(41)), pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "lang": pa.array(["en"] * 41),
        }
    )
    ds = ray.data.from_arrow(tbl)
    rows = extract_pages(ds, concurrency=2, batch_size=16,
                         oversize_threshold=1 << 20).take_all()
    assert len(rows) == 41
    by_url = {r["url"]: r for r in rows}
    for url, payload in zip(urls, payloads):
        inline = extract_document(payload, url)
        assert by_url[url]["text"] == inline["text"], url
        assert by_url[url]["valid"] == inline["valid"]


def test_read_pages_from_files(ray_session, tmp_path):
    """Loose-file ingest: raw html/docx/pdf files on disk extract
    identically to payloads in a parquet pages table."""
    from extract_kit_ray.fixtures import make_docx_payload, make_html_page
    from extract_kit_ray.functions.pdf_text import make_pdf
    from extract_kit_ray.pipelines.flagship import (
        extract_pages, read_pages_from_files)

    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.html").write_bytes(make_html_page(1).encode())
    (d / "b.docx").write_bytes(make_docx_payload(2))
    (d / "c.pdf").write_bytes(make_pdf([[("pdf", 72.0, 720.0),
                                         ("words", 112.0, 720.0)]]))
    ds = read_pages_from_files(str(d))
    rows = {r["url"].rsplit("/", 1)[1]: r
            for r in extract_pages(ds, concurrency=2).take_all()}
    assert set(rows) == {"a.html", "b.docx", "c.pdf"}
    assert all(r["valid"] for r in rows.values())
    assert rows["c.pdf"]["text"] == "pdf words"
    assert rows["a.html"]["doc_kind"] == "html"
    assert rows["b.docx"]["doc_kind"] == "docx"


def test_job_entrypoint_end_to_end(tmp_path):
    """jobs/run_extract.py in a fresh subprocess: full run writes all
    parts + manifests, rerun resumes as a no-op (the `ray job submit`
    payload, driven in local mode)."""
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq2

    from extract_kit_ray.fixtures import make_pages_table

    pp = tmp_path / "pages"
    pp.mkdir()
    pq2.write_table(make_pages_table(120), str(pp / "p0.parquet"))
    out = tmp_path / "out"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAY_ADDRESS="local",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    cmd = [sys.executable, os.path.join(repo, "jobs", "run_extract.py"),
           "--input", str(pp), "--output", str(out),
           "--n-parts", "4", "--address", "local"]
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=300, env=env)
    stats1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert stats1["parts_written"] == [0, 1, 2, 3]
    assert pq2.read_table(str(out)).num_rows == 120
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300, env=env)
    stats2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert stats2["resumed"] and stats2["parts_written"] == []


def test_curate_chain_dedups_before_packing(ray_session):
    """Stage-order contract (see driver.q_curate_corpus): exact dedup
    runs upstream of packing (and of any near-dup stage a user
    appends), so the planted exact-dup cluster (doc_id%11==3, one
    shared constant text) must reach the packed output at most once.
    The LSH hot-bucket cap's core+star approximation relies on this
    ordering — freeze it."""
    from extract_kit_ray.driver import q_curate_corpus

    rows = q_curate_corpus("/root/testdata/sf0.001").take_all()
    assert rows
    planted = [r["doc_id"] for r in rows if r["doc_id"] % 11 == 3]
    assert len(planted) <= 1          # dedup collapsed the cluster
    if planted:
        # first-occurrence-wins: the survivor is the smallest planted id
        all_ids = {r["doc_id"] for r in rows}
        assert planted[0] == min(i for i in range(0, 501) if i % 11 == 3
                                 and i in all_ids.union(planted))
