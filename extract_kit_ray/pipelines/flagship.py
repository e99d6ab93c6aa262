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
    starves ReadParquet of cores and deadlocks the streaming executor."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, cpus - 2)


def read_pages(path: str) -> "ray.data.Dataset":
    """Column-pruned read of a pages parquet directory/file (S1)."""
    return ray.data.read_parquet(path, columns=PAGES_READ_COLUMNS)


def extract_pages(
    ds: "ray.data.Dataset",
    *,
    strip_boilerplate: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 64,
    num_cpus: float = 1,
) -> "ray.data.Dataset":
    """pages Dataset -> EXTRACTED_SCHEMA Dataset (streaming, actor pool)."""
    if concurrency is None:
        concurrency = _default_concurrency()
    return ds.map_batches(
        HtmlExtractor,
        fn_constructor_kwargs={"strip_boilerplate": strip_boilerplate},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def extract_pages_from_path(path: str, **kwargs) -> "ray.data.Dataset":
    return extract_pages(read_pages(path), **kwargs)
