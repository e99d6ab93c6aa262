"""Incremental cross-snapshot exact dedup against a persisted hash index.

The production crawl-ingestion shape: snapshot N+1 arrives and only
documents whose content was NOT seen in snapshots 1..N should enter the
corpus.  The seen-set is a PERSISTED PARQUET INDEX of 128-bit content
hashes (16 bytes/doc — ~160 GB for 10^10 docs, vs re-reading petabytes
of text), appended after every ingest.  ops/sketches' Bloom filter is
the probabilistic sibling (constant memory, false positives); this
operator is the exact one.

Scale shape:

- index build/append: one hashing ``map_batches`` over the snapshot,
  ``write_parquet`` of the two int64 hash lanes — narrow, partitioned,
  resumable like any other sink.  Text never leaves its blocks.
- probe, broadcast-or-join guarded like ops/dedup: under
  ``config.broadcast_max_rows`` the index ships once as a
  :class:`~.dedup.KeySet128` (one ``np.searchsorted`` per batch);
  above it, a distributed left-outer ANTI join on (h1, h2) — new-side
  rows ship once, the index side is already narrow.  At 10^10-key
  scale the index read prunes to the two hash columns and the join is
  the only shuffle.

Exactness contract: same as ops/dedup — documents are equated by their
128-bit blake2b content hash with no text verification
(functions/hashing.hash128_signed documents the collision math).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .dedup import KeySet128, add_text_hash


def build_hash_index(ds, index_dir: str, *, text_col: str = "text",
                     mode: str = "overwrite") -> None:
    """Hash ``ds`` and write/append the (h1, h2) index under
    ``index_dir``.  ``mode='append'`` adds new files next to existing
    ones (parquet dirs are append-friendly); dedup within the index is
    unnecessary — membership probes are idempotent."""
    hashed = ds.map_batches(
        add_text_hash, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
    ).select_columns(["text_hash", "text_hash2"])
    if mode == "overwrite":
        import shutil

        shutil.rmtree(index_dir, ignore_errors=True)
    elif mode != "append":
        raise ValueError(f"unknown mode: {mode!r}")
    hashed.write_parquet(index_dir)


def dedup_against_index(ds, index_dir: str, *, text_col: str = "text",
                        broadcast_max: int | None = None,
                        num_partitions: int | None = None):
    """Rows of ``ds`` whose content hash is NOT in the index — the
    snapshot's genuinely new documents.  Within-snapshot duplicates are
    NOT collapsed here (compose with :func:`~.dedup.exact_dedup` when
    the snapshot itself may repeat)."""
    import ray

    from ..config import broadcast_max_rows, resolve_num_partitions
    from .rayfix import seed_join_side

    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    index = ray.data.read_parquet(index_dir,
                                  columns=["text_hash", "text_hash2"])
    hashed = ds.map_batches(
        add_text_hash, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True)

    n_index = index.count()
    if n_index <= broadcast_max:
        idx = index.to_pandas()
        keyset = KeySet128(idx["text_hash"].to_numpy(),
                           idx["text_hash2"].to_numpy())

        def keep_new(batch: pa.Table) -> pa.Table:
            seen = keyset.contains(batch["text_hash"].to_numpy(),
                                   batch["text_hash2"].to_numpy())
            return batch.filter(pa.array(~seen)).drop_columns(
                ["text_hash", "text_hash2"])

        return hashed.map_batches(keep_new, batch_format="pyarrow",
                                  zero_copy_batch=True)

    # join fallback: ANTI via left_outer + null-marker filter.  The
    # sentinel (0, 0) rides with a NULL marker, so a 2^-128 coincidence
    # filters to "not seen" instead of dropping a real new doc; the
    # index side is distinct-ified so the left join cannot fan out.
    from ray.data.aggregate import Count

    marked = index.groupby(["text_hash", "text_hash2"]).aggregate(
        Count(alias_name="n"))

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "ih1": batch["text_hash"], "ih2": batch["text_hash2"],
            "seen_marker": pc.cast(pc.greater(batch["n"], 0), pa.int64()),
        })

    idx_side = seed_join_side(
        marked.map_batches(tag, batch_format="pyarrow",
                           zero_copy_batch=True),
        pa.table({"ih1": pa.array([0], pa.int64()),
                  "ih2": pa.array([0], pa.int64()),
                  "seen_marker": pa.array([None], pa.int64())}))
    joined = hashed.join(idx_side, join_type="left_outer",
                         num_partitions=num_partitions,
                         on=("text_hash", "text_hash2"),
                         right_on=("ih1", "ih2"))

    def keep_unseen(batch: pa.Table) -> pa.Table:
        new = batch.filter(pc.is_null(batch["seen_marker"]))
        return new.drop_columns(
            [c for c in ("text_hash", "text_hash2", "seen_marker")
             if c in new.column_names])

    return joined.map_batches(keep_unseen, batch_format="pyarrow",
                              zero_copy_batch=True)
