"""Resumable partitioned extraction run (SURVEY.md §4.4).

Flow::

    done = read manifests; delete unmanifested part dirs
    pages -> add part = hash(url) % P -> filter(part not done)   # skip work
          -> HtmlExtractor actor pool -> groupby(part)
          -> per-part task: write data-0.parquet, commit manifest

The done-part filter is a broadcast-small-side semi-join: the done set is
captured in the map closure (a few KB), no shuffle.  Manifest stats are
computed inside the part-keyed group task (which holds the whole part),
never by a driver-side read-back of the output.
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
    # Co-locate rows by part, then each part-keyed group task WRITES its
    # own parquet file and COMMITS its manifest (write-then-commit per
    # part).  Two scale problems solved at once:
    # - write_parquet(partition_cols) splits every block into per-part
    #   files, so B blocks x P parts would emit B*P tiny files (observed
    #   12,800 for 200k docs); the groupby yields one file per part.
    # - manifest stats (row count / url checksum / byte sum) are computed
    #   IN the task that already holds the whole part — the round-1
    #   driver-side read-back of the full output's url+meta columns was a
    #   sequential scan of the corpus at 100 TB.
    # Commit order inside the task is crash-safe: tmp file -> rename ->
    # manifest (atomic os.replace).  A crash between rename and manifest
    # leaves an unmanifested part dir, which the next run's
    # clean_incomplete_parts deletes and recomputes.  Assumes out_dir is
    # shared storage (same assumption the partitioned write made).
    os.makedirs(out_dir, exist_ok=True)
    import functools

    stats_rows = (
        extracted.groupby("part")
        .map_groups(functools.partial(_write_part_group, out_dir=out_dir),
                    batch_format="pyarrow")
        .take_all()
    )  # bounded: one tiny stats row per part
    new_parts = sorted(int(r["part"]) for r in stats_rows)
    return {
        "resumed": bool(done),
        "parts_done_before": sorted(done),
        "parts_cleaned": removed,
        "parts_written": new_parts,
        "n_parts": n_parts,
    }


def _write_part_group(group: pa.Table, *, out_dir: str) -> pa.Table:
    """Part-keyed group writer: data file + manifest from one task."""
    import pyarrow.parquet as pq

    part = int(group["part"][0].as_py())
    part_dir = os.path.join(out_dir, f"part={part}")
    os.makedirs(part_dir, exist_ok=True)
    data = group.drop_columns(["part"])
    final = os.path.join(part_dir, "data-0.parquet")
    tmp = final + ".tmp"
    pq.write_table(data, tmp)
    os.replace(tmp, final)
    n_bytes = pc.sum(pc.struct_field(data["meta"], "n_bytes_out")).as_py() or 0
    mf.write_manifest(
        out_dir, part,
        row_count=data.num_rows,
        url_checksum=mf.checksum_urls(data["url"].to_pylist()),
        n_bytes_out=int(n_bytes),
    )
    return pa.table({
        "part": pa.array([part], pa.int32()),
        "row_count": pa.array([data.num_rows], pa.int64()),
        "n_bytes_out": pa.array([int(n_bytes)], pa.int64()),
    })


def read_extracted(out_dir: str, *, broadcast_max: int | None = None) -> "ray.data.Dataset":
    """Read a completed partitioned output back as a Dataset, deduped on
    url to guard against any double-write (SURVEY.md §2.8).

    Scale shape (mirrors ops/dedup.exact_dedup): a Count aggregate over
    the url column finds double-written urls (normally none — manifests
    prevent them).  Happy path: zero extra work.  Dups present: the dup
    url set splits the stream — clean rows pass through untouched while
    ONLY the dup rows (bounded by double-write volume) shuffle through a
    groupby(url) keep-one; dup copies are byte-identical re-extractions,
    so keeping the group's first row is correct.  (Round 2 serialized
    the ENTIRE re-read through one seen-set actor — a 100 TB stall.)
    Above config.broadcast_max_rows the split set can't broadcast, so
    the whole dataset takes the groupby(url) keep-one — one corpus
    shuffle, still fully parallel."""
    from ray.data.aggregate import Count

    from ..config import broadcast_max_rows

    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()

    ds = ray.data.read_parquet(out_dir)
    counts = (
        ds.select_columns(["url"]).groupby("url").aggregate(Count(alias_name="n"))
    )
    dup_counts = counts.filter(expr="n > 1").materialize()
    n_dup_urls = dup_counts.count()
    if n_dup_urls == 0:
        return ds

    def _keep_one(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    if n_dup_urls > broadcast_max:
        return ds.groupby("url").map_groups(_keep_one, batch_format="pyarrow")

    dup_urls = frozenset(dup_counts.to_pandas()["url"])

    def _split(batch: pa.Table, *, want_dups: bool) -> pa.Table:
        mask = pa.array([(u in dup_urls) == want_dups
                         for u in batch["url"].to_pylist()])
        return batch.filter(mask)

    clean = ds.map_batches(_split, fn_kwargs={"want_dups": False},
                           batch_format="pyarrow", zero_copy_batch=True)
    deduped = (
        ds.map_batches(_split, fn_kwargs={"want_dups": True},
                       batch_format="pyarrow", zero_copy_batch=True)
        .groupby("url").map_groups(_keep_one, batch_format="pyarrow")
    )
    return clean.union(deduped)
