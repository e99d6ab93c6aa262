"""Flagship pipeline: Common-Crawl-style pages -> extracted text table.

Target shape (SURVEY.md §3.4)::

    read_parquet(pages)                                   # S1
    -> map_batches(HtmlExtractor, concurrency=N)          # M1-M13 + route
    -> [write_parquet partitioned + manifests]            # S10/§4.4
    then groupby(domain).aggregate(...)                   # lineage rollup

Scale notes:
- the read prunes to the columns the stage needs (url/warc_ts/html/lang);
  the raw ``text`` dump column never leaves storage
- extraction is the only heavy stage; it streams — no materialization
- skew: modest ``batch_size`` keeps a giant page from freezing a whole
  batch; the layout fan-out path (stages/pdf_stage.py) covers multi-page
  monsters via per-page rows + groupby(url) reassembly
"""

from __future__ import annotations

import ray
import ray.data

from ..stages.extract_stage import HtmlExtractor

PAGES_READ_COLUMNS = ["url", "warc_ts", "html", "lang"]


def _default_concurrency() -> int:
    """Actor-pool size = CPUs minus headroom for the task-pool operators
    (read / consume). A pool of full-CPU actors sized to ALL cluster CPUs
    starves ReadParquet of cores and deadlocks the streaming executor.
    ``EKRAY_EXTRACT_WORKERS`` overrides (U7 env surface, config.py).

    Deliberately a FIXED pool, not autoscaling ``(min, max)``: the
    flagship stage is the cluster-saturating workhorse, and Ray's
    actor-pool upscaler ramps too slowly for jobs in the tens of
    seconds (measured 13.4s fixed vs 28.5s autoscaled on the 200k-doc
    headline) — at 100 TB the pool is busy for hours, so paying full
    spin-up up-front is strictly right.  Small interactive queries use
    driver._pool(), which IS autoscaling for the opposite reason."""
    from ..config import pool_config_from_env

    override = pool_config_from_env()["extract_workers"]
    if override is not None:
        return override
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, cpus - 2)


def read_pages(path: str) -> "ray.data.Dataset":
    """Column-pruned read of a pages parquet directory/file (S1)."""
    return ray.data.read_parquet(path, columns=PAGES_READ_COLUMNS)


def read_pages_from_files(path: str, *, lang: str = "") -> "ray.data.Dataset":
    """Loose-file ingest (the S1/S8 source-normalizer mapping): a
    directory of raw documents (html/docx/pdf/...) becomes a pages
    Dataset via ``read_binary_files`` — url is the ``file://`` path,
    warc_ts is epoch 0 (no crawl timestamp for loose files), and
    payload detection happens downstream in the extractor, exactly as
    for crawl payloads."""
    import pyarrow as pa

    ds = ray.data.read_binary_files(path, include_paths=True)

    def to_pages(batch: "pa.Table") -> "pa.Table":
        paths = batch["path"].to_pylist()
        return pa.table(
            {
                "url": pa.array([f"file://{p}" for p in paths], pa.string()),
                "warc_ts": pa.array([0] * len(paths), pa.timestamp("us")),
                "html": pa.array(batch["bytes"].to_pylist(), pa.binary()),
                "lang": pa.array([lang] * len(paths), pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)


# payloads above this route to their own single-row blocks (M24 analog:
# the reference's oversize-payload side route, api/validation.ts:57-59)
OVERSIZE_THRESHOLD_BYTES = 1 << 20


def _route_oversize(batch, threshold: int, normal_rows: int):
    """Generator stage: yield each OVERSIZE payload as its own
    single-row table, normal rows in ``normal_rows``-row tables.

    One pass, no second read: the alternative (two ``filter`` branches
    unioned) re-executes the upstream read per branch — 2x I/O at
    100 TB.

    What a yield does and does NOT guarantee (round-2 advisor finding):
    Ray's output buffer coalesces generator yields into blocks up to
    ``DataContext.target_max_block_size``, so a 5 MB yield does NOT
    stay a single-row block under the 128 MiB default — it shares a
    block (and therefore a batch, since the extractor runs
    batch_size=None downstream) with up to ~target of neighbors.  The
    yield granularity is still what lets the block cutter place a
    boundary AT the monster: blocks are finalized whenever the buffer
    crosses the target, so per-task memory stays bounded by
    ~target_max_block_size regardless of row sizes.  HARD single-row
    isolation needs the cap lowered to the threshold —
    ``extract_pages(isolate_oversize_blocks=True)`` does exactly that,
    at the cost of more blocks (driver metadata) — worth it only for
    skew-heavy corpora."""
    import pyarrow.compute as pc

    lens = pc.fill_null(pc.binary_length(batch["html"]), 0)
    mask = pc.greater(lens, threshold)
    big = batch.filter(mask)
    normal = batch.filter(pc.invert(mask))
    for i in range(big.num_rows):
        yield big.slice(i, 1)
    for s in range(0, normal.num_rows, normal_rows):
        yield normal.slice(s, normal_rows)


def extract_pages(
    ds: "ray.data.Dataset",
    *,
    strip_boilerplate: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 64,
    num_cpus: float = 1,
    oversize_threshold: int | None = OVERSIZE_THRESHOLD_BYTES,
    isolate_oversize_blocks: bool = False,
) -> "ray.data.Dataset":
    """pages Dataset -> EXTRACTED_SCHEMA Dataset (streaming, actor pool).

    ``oversize_threshold`` (bytes) activates the skew side-route:
    bigger payloads become their own generator yields, giving the block
    cutter a boundary at each monster (per-task memory bounded by
    ~target_max_block_size).  Pass None to disable (tests of raw
    batching behavior).

    ``isolate_oversize_blocks`` additionally builds the routed stages
    under a DataContext whose target_max_block_size equals the
    threshold, which makes each oversize payload a true SINGLE-ROW
    block/batch — more blocks (driver metadata cost), so reserve it for
    skew-heavy corpora."""
    if concurrency is None:
        concurrency = _default_concurrency()
    extractor_batch_size: int | None = batch_size

    import contextlib

    @contextlib.contextmanager
    def _scoped_block_cap():
        # DataContext is captured at dataset-construction time, so the
        # cap scopes to the stages built inside this block
        ctx = ray.data.DataContext.get_current()
        old = ctx.target_max_block_size
        if isolate_oversize_blocks and oversize_threshold is not None:
            ctx.target_max_block_size = oversize_threshold
        try:
            yield
        finally:
            ctx.target_max_block_size = old

    with _scoped_block_cap():
        if oversize_threshold is not None:
            ds = ds.map_batches(
                _route_oversize,
                fn_kwargs={"threshold": oversize_threshold, "normal_rows": batch_size},
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=batch_size,
            )
            extractor_batch_size = None  # batch = routed block
        return ds.map_batches(
            HtmlExtractor,
            fn_constructor_kwargs={"strip_boilerplate": strip_boilerplate},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=extractor_batch_size,
            concurrency=concurrency,
            num_cpus=num_cpus,
        )


def extract_pages_from_path(path: str, **kwargs) -> "ray.data.Dataset":
    return extract_pages(read_pages(path), **kwargs)
