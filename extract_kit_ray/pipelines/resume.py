"""Resumable partitioned extraction run (SURVEY.md §4.4).

Flow::

    done = read manifests; delete unmanifested part dirs
    pages -> add part = hash(url) % P -> filter(part not done)   # skip work
          -> HtmlExtractor actor pool -> write_parquet(partition_cols=[part])
    read back (url, meta.n_bytes_out) per new part  -> write manifests

The done-part filter is a broadcast-small-side semi-join: the done set is
captured in the map closure (a few KB), no shuffle.  The read-back for
manifests prunes to two cheap columns — it never re-reads text.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..state import manifests as mf
from .flagship import extract_pages, read_pages

DEFAULT_N_PARTS = 64


def _add_part_batch(batch: pa.Table, n_parts: int) -> pa.Table:
    parts = [mf.url_part(u, n_parts) for u in batch["url"].to_pylist()]
    return batch.append_column("part", pa.array(parts, pa.int32()))


def _part_from_urls(batch: pa.Table, n_parts: int) -> pa.Table:
    return _add_part_batch(batch, n_parts)


def run_partitioned_extract(
    pages_path: str,
    out_dir: str,
    *,
    n_parts: int = DEFAULT_N_PARTS,
    strip_boilerplate: bool = True,
    concurrency=None,
    batch_size: int = 64,
) -> dict:
    """Run (or resume) the flagship extraction into partitioned parquet +
    manifests. Returns run stats."""
    removed = mf.clean_incomplete_parts(out_dir)
    done = mf.read_done_parts(out_dir)

    ds = read_pages(pages_path)
    ds = ds.map_batches(
        _add_part_batch, fn_kwargs={"n_parts": n_parts}, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if done:
        done_set = frozenset(done)  # broadcast-small-side anti-join

        def _filter_done(batch: pa.Table) -> pa.Table:
            mask = pa.array([p not in done_set for p in batch["part"].to_pylist()])
            return batch.filter(mask)

        ds = ds.map_batches(_filter_done, batch_format="pyarrow", zero_copy_batch=True)

    extracted = extract_pages(
        ds.drop_columns(["part"]),
        strip_boilerplate=strip_boilerplate,
        concurrency=concurrency,
        batch_size=batch_size,
    )
    # recompute part from url post-extraction (cheaper than threading the
    # column through the extractor's fresh output table)
    extracted = extracted.map_batches(
        _part_from_urls, fn_kwargs={"n_parts": n_parts}, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # Co-locate rows by part BEFORE writing: write_parquet(partition_cols)
    # splits every block into per-part files, so B blocks x P parts would
    # emit B*P tiny files (observed 12,800 for 200k docs).  The groupby
    # shuffle — keyed on the same part id resume depends on — yields one
    # output block (= one file) per part.  Size n_parts so corpus/n_parts
    # is a sane file size (~1 GB at scale).
    def _identity(group: pa.Table) -> pa.Table:
        return group

    extracted = extracted.groupby("part").map_groups(_identity, batch_format="pyarrow")
    os.makedirs(out_dir, exist_ok=True)
    extracted.write_parquet(out_dir, partition_cols=["part"])

    new_parts = _publish_manifests(out_dir, skip_parts=frozenset(done))
    return {
        "resumed": bool(done),
        "parts_done_before": sorted(done),
        "parts_cleaned": removed,
        "parts_written": sorted(new_parts),
        "n_parts": n_parts,
    }


def _publish_manifests(out_dir: str, skip_parts: frozenset[int]) -> list[int]:
    """Column-pruned read-back of newly written parts -> manifests."""
    new_parts = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("part="):
            continue
        part = int(name.split("=", 1)[1])
        if part in skip_parts:
            continue
        new_parts.append(part)
    for part in new_parts:
        part_dir = os.path.join(out_dir, f"part={part}")
        tbl = _read_part_stats(part_dir)
        mf.write_manifest(
            out_dir, part,
            row_count=tbl.num_rows,
            url_checksum=mf.checksum_urls(tbl["url"].to_pylist()),
            n_bytes_out=pc.sum(pc.struct_field(tbl["meta"], "n_bytes_out")).as_py() or 0,
        )
    return new_parts


def _read_part_stats(part_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(part_dir, columns=["url", "meta"])


def read_extracted(out_dir: str) -> "ray.data.Dataset":
    """Read a completed partitioned output back as a Dataset, deduped on
    url to guard against any double-write (SURVEY.md §2.8).

    Scale shape (mirrors ops/dedup.exact_dedup): a Count aggregate over
    the url column finds double-written urls (normally none — manifests
    prevent them), which are broadcast into a keep-first filter; the full
    rows never shuffle and the happy path adds no per-group Python."""
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(out_dir)
    counts = (
        ds.select_columns(["url"]).groupby("url").aggregate(Count(alias_name="n"))
    )
    dups = counts.filter(expr="n > 1").to_pandas()
    if len(dups) == 0:
        return ds
    dup_urls = frozenset(dups["url"])

    class KeepFirst:
        """Single actor (concurrency=1) so the seen-set survives across
        batches; dup rows are byte-identical re-extractions, so keeping
        whichever copy arrives first is correct."""

        def __init__(self):
            self.seen: set[str] = set()

        def __call__(self, batch: "pa.Table") -> "pa.Table":
            mask = []
            for u in batch["url"].to_pylist():
                if u in dup_urls:
                    if u in self.seen:
                        mask.append(False)
                        continue
                    self.seen.add(u)
                mask.append(True)
            return batch.filter(pa.array(mask))

    return ds.map_batches(KeepFirst, batch_format="pyarrow", concurrency=1)
