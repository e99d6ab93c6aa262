"""Workaround for a Ray Data hash-shuffle edge case on small or
skewed inputs.

An aggregate partition that received no rows emits a SCHEMA-LESS empty
block (a known Ray TODO, see plan_udf_map_op.py "some all-to-all
operators output empty blocks with no schema").  Those blocks are
invisible to map UDFs — the block-to-batch path returns an all-empty
task's block verbatim without calling the function — so they survive
any map_batches "schema pin".  When such a dataset later feeds a
``Dataset.join``, the shuffle fans the schema-less block's empty
shards to EVERY partition while typed 0-row shards are not sent, so
any join partition whose only received shards are schema-less builds a
zero-column table and Acero fails with ``No match or multiple matches
for key field reference FieldRef.Name(...)``.  (Partitions that
receive no shards at all are fine — observed empirically — which is
why removing the schema-less blocks fixes every layout.)

:func:`typed_side` therefore materializes the fragile side and drops
its zero-row blocks (block refs are reused zero-copy through
``from_arrow_refs``), optionally unioning ONE typed sentinel row to
cover the all-blocks-empty case (whose key must never match a real
row: inner joins drop it, outer joins never surface it).

At production scale (millions of groups per aggregate) every shuffle
partition holds typed shards anyway; the guard exists for the
small/skewed regime — unit tests, adversarial single-cluster corpora,
degenerate key distributions — and costs one materialize of a side
the callers materialize (or re-shuffle immediately) regardless.
"""

from __future__ import annotations

import pyarrow as pa


def typed_side(ds, seed_table: pa.Table | None = None):
    """Return ``ds`` with schema-less empty blocks removed (see module
    docstring).  ``seed_table`` (one typed sentinel row) covers the
    all-empty case and is unioned when given."""
    import ray
    import ray.data as rd

    mat = ds if isinstance(ds, rd.dataset.MaterializedDataset) else ds.materialize()
    refs = []
    any_empty = False
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
            else:
                any_empty = True
    if refs and not any_empty and seed_table is None:
        return mat  # nothing to fix
    out = rd.from_arrow_refs(refs) if refs else None
    if seed_table is not None:
        assert seed_table.num_rows == 1
        seed = rd.from_arrow(seed_table)
        out = seed if out is None else out.union(seed)
    elif out is None:
        out = mat  # all-empty, no sentinel available: leave unchanged
    return out


def typed_side_int64(ds, **cols: int):
    """Shorthand: :func:`typed_side` with an all-int64 sentinel row."""
    return typed_side(
        ds, pa.table({k: pa.array([v], pa.int64()) for k, v in cols.items()}))


def seed_join_side(ds, table: pa.Table):
    """Backwards-compat alias used while the guard evolved; now routes
    through :func:`typed_side` (compaction + sentinel)."""
    return typed_side(ds, table)


def seed_int64(ds, **cols: int):
    return typed_side_int64(ds, **cols)


def _identity_batch(b: pa.Table) -> pa.Table:
    return b


def arrow_blocks(ds):
    """Re-encode a Dataset's blocks as ARROW before a
    ``groupby().aggregate()``.

    Ray's sort-based aggregate is ~10x slower when its input blocks
    are pandas (measured, BASELINE.md round 5: identical 96k partial
    rows, 64 blocks, groupby-sum — 20.2 s pandas vs 2.1 s arrow), so
    every map-side-combine stage whose UDF returns DataFrames pipes
    through this one fused pass-through map.  The pandas->arrow
    conversion happens once per block inside the producing task."""
    return ds.map_batches(_identity_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
