"""Paragraph-level exact deduplication — remove repeated paragraphs
across the whole corpus, keeping only the first occurrence.

The web-corpus reality this models: boilerplate paragraphs (cookie
banners, license blocks, nav text) repeat across millions of pages;
document-level dedup never sees them.  Paragraph-granularity exact
substring dedup is the practical middle ground (Lee et al., "Deduplicating
Training Data Makes Language Models Better", does it with suffix
arrays; hash-per-paragraph is the shuffle-friendly approximation).

Scale shape — TEXT NEVER RIDES A SHUFFLE.  Every wide operation moves
only fixed-width integers:

1. **narrow split pass** (stateless ``map_batches``): each doc fans
   out to (key, idx, h1, h2, pos) rows — 40 bytes per paragraph, NO
   text.  The 128-bit content hash makes equality collision-free
   without a verify pass (same math as exact doc dedup,
   ``functions/hashing.hash128_signed``); ``pos = key << 20 | idx``
   orders occurrences corpus-wide.
2. **first-occurrence shuffle**: ``groupby(h1, h2).min(pos)``.  Ray's
   hash aggregate combines partially per block before the exchange,
   so a boilerplate paragraph repeated 10^9 times ships one partial
   row per block, not 10^9 rows — the skew guard.
3. **drop-list**: paragraphs inner-join the (h1, h2, min_pos) table
   (both sides narrow → cheap shuffle hash join); rows with
   ``pos != min_pos`` are the DROPS — bounded by duplicate-paragraph
   volume, typically a small fraction of the corpus.  Drops aggregate
   to one (key, drop_idxs: list<int>) row per affected doc.
4. **reassembly**: docs re-split their own text locally and skip the
   dropped indexes.  Under :func:`config.broadcast_max_rows` the
   drop-list is collected once and broadcast into a streaming
   ``map_batches`` — the text column never moves AT ALL (zero text
   shuffles, down from two in the round-3 design).  Above it, ONE
   ``left_outer`` join ships text once — the honest worst case.

Recomputing the paragraph split at reassembly costs one extra pass of
``str.split`` per doc — orders of magnitude cheaper than shipping the
corpus text through an all-to-all exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash128_batch_signed

_IDX_BITS = 20          # max 2^20 paragraphs per doc
PARA_SEP = "\n\n"


def split_paragraph_hashes(batch: pa.Table, *, text_col: str,
                           key_col: str) -> pa.Table:
    """Doc rows -> NARROW paragraph rows (key, idx, h1, h2, pos) — no
    text in the fan-out payload.  The flat paragraph list feeds ONE
    batched hash call (hashing.hash128_batch_signed); key fan-out and
    within-doc indexes are vectorized repeats, no per-paragraph Python
    appends."""
    keys = np.asarray(batch[key_col].to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    para_lists = [(t or "").split(PARA_SEP)
                  for t in batch[text_col].to_pylist()]
    counts = np.fromiter((len(p) for p in para_lists), dtype=np.int64,
                         count=len(para_lists))
    flat: list[str] = []
    for ps in para_lists:
        flat.extend(ps)
    h1, h2 = hash128_batch_signed(flat)
    keys_np = np.repeat(keys, counts)
    starts = np.cumsum(counts) - counts
    idx_np = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, counts)
    return pa.table({
        key_col: pa.array(keys_np),
        "idx": pa.array(idx_np),
        "h1": pa.array(h1, pa.int64()),
        "h2": pa.array(h2, pa.int64()),
        "pos": pa.array((keys_np << _IDX_BITS) | idx_np),
    })


def _rebuild_batch(batch: pa.Table, *, text_col: str, key_col: str,
                   drops_by_key) -> pa.Table:
    """Re-split each doc locally, skip dropped paragraph indexes,
    rejoin.  ``drops_by_key`` maps key -> iterable of dropped idx."""
    keys = batch[key_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out_text, n_kept, n_dropped = [], [], []
    for key, text in zip(keys, texts):
        parts = (text or "").split(PARA_SEP)
        drop = drops_by_key.get(key)
        if not drop:
            out_text.append(text or "")
            n_kept.append(len(parts))
            n_dropped.append(0)
            continue
        drop_set = set(drop)
        kept = [p for i, p in enumerate(parts) if i not in drop_set]
        out_text.append(PARA_SEP.join(kept))
        n_kept.append(len(kept))
        n_dropped.append(len(parts) - len(kept))
    return pa.table({
        key_col: pa.array(keys, pa.int64()),
        "text": pa.array(out_text, pa.string()),
        "n_kept": pa.array(n_kept, pa.int64()),
        "n_dropped": pa.array(n_dropped, pa.int64()),
    })


def dedup_paragraphs(ds, *, text_col: str = "text", key_col: str = "doc_id",
                     broadcast_max: int | None = None,
                     num_partitions: int | None = None):
    """Corpus-wide first-occurrence paragraph dedup.  Returns a Dataset
    of (key, text, n_kept, n_dropped) with ``text`` the doc rebuilt
    from its surviving paragraphs (PARA_SEP-joined, original order).

    Text never moves through a shuffle: the dedup decision runs on
    40-byte hash rows, and reassembly re-splits each doc in place (see
    module docstring).  ``broadcast_max`` guards the drop-list
    broadcast exactly like exact_dedup's dup-map guard."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from ..config import broadcast_max_rows, resolve_num_partitions
    from .dedup import _collect_agg
    from .rayfix import seed_join_side

    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    narrow = ds.map_batches(
        split_paragraph_hashes,
        fn_kwargs={"text_col": text_col, "key_col": key_col},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # schema-seed guard (ops/rayfix.py): min_pos is NULL on the
    # sentinel, so even a 2^-128 hash collision with a real paragraph
    # yields a null comparison -> filtered -> "no drop decision",
    # never a wrong one
    firsts = seed_join_side(
        narrow.groupby(["h1", "h2"]).aggregate(Min("pos", alias_name="min_pos")),
        pa.table({"h1": pa.array([0], pa.int64()),
                  "h2": pa.array([0], pa.int64()),
                  "min_pos": pa.array([None], pa.int64())}),
    )
    joined = narrow.join(firsts, join_type="inner",
                         num_partitions=num_partitions, on=("h1", "h2"))

    def to_drops(batch: pa.Table) -> pa.Table:
        # null min_pos (sentinel-matched row) -> null mask -> filtered
        mask = pc.invert(pc.equal(batch["pos"], batch["min_pos"]))
        kept = batch.filter(mask)
        return pa.table({key_col: kept[key_col], "idx": kept["idx"]})

    drop_lists = (
        joined.map_batches(to_drops, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(_collect_agg("idx", alias="drop_idxs"))
        .materialize()  # bounded by docs-with-dropped-paragraphs
    )
    n_affected = drop_lists.count()

    if n_affected <= broadcast_max:
        drops_by_key = {
            int(r[key_col]): r["drop_idxs"] for r in drop_lists.take_all()
        }
        return ds.map_batches(
            _rebuild_batch,
            fn_kwargs={"text_col": text_col, "key_col": key_col,
                       "drops_by_key": drops_by_key},
            batch_format="pyarrow", zero_copy_batch=True,
        )

    # join fallback: ship text ONCE through a left_outer join onto the
    # drop-list (null drop_idxs -> doc unchanged).  Acero joins reject
    # list-typed payload columns, so the idx list rides as a compact
    # comma-joined string.
    def _encode(b: pa.Table) -> pa.Table:
        return pa.table({
            "drop_key": b[key_col],
            "drop_idxs": pa.array(
                [",".join(map(str, d)) for d in b["drop_idxs"].to_pylist()],
                pa.string()),
        })

    renamed = seed_join_side(
        drop_lists.map_batches(_encode, batch_format="pyarrow",
                               zero_copy_batch=True),
        pa.table({"drop_key": pa.array([-1], pa.int64()),
                  "drop_idxs": pa.array([""], pa.string())}),
    )  # doc keys are non-negative; -1 never matches, "" decodes to no-op
    joined_docs = ds.join(renamed, join_type="left_outer",
                          num_partitions=num_partitions,
                          on=(key_col,), right_on=("drop_key",))

    def rebuild_joined(batch: pa.Table) -> pa.Table:
        by_key = {
            int(k): [int(x) for x in d.split(",")]
            for k, d in zip(batch[key_col].to_pylist(),
                            batch["drop_idxs"].to_pylist())
            if d
        }
        return _rebuild_batch(batch, text_col=text_col, key_col=key_col,
                              drops_by_key=by_key)

    return joined_docs.map_batches(rebuild_joined, batch_format="pyarrow",
                                   zero_copy_batch=True)
