"""Paragraph-level exact deduplication — remove repeated paragraphs
across the whole corpus, keeping only the first occurrence.

The web-corpus reality this models: boilerplate paragraphs (cookie
banners, license blocks, nav text) repeat across millions of pages;
document-level dedup never sees them.  Paragraph-granularity exact
substring dedup is the practical middle ground (Lee et al., "Deduplicating
Training Data Makes Language Models Better", does it with suffix
arrays; hash-per-paragraph is the shuffle-friendly approximation).

Scale shape — two shuffles, both on compact keys:

1. **split pass** (stateless ``map_batches``): each doc fans out to
   (doc, idx, h1, h2, text) paragraph rows; the 128-bit content hash
   makes equality collision-free without a verify pass (same math as
   exact doc dedup, ``functions/hashing.hash128_signed``).
2. **first-occurrence shuffle**: ``groupby(h1, h2).min(pos_key)``
   where ``pos_key = doc_key << 20 | idx`` orders occurrences.
   Ray's hash aggregate combines partially per block before the
   exchange, so a boilerplate paragraph repeated 10^9 times ships one
   partial row per block, not 10^9 rows — the skew guard.
3. **keep-join + reassembly shuffle**: paragraphs inner-join the
   (h1, h2, min_pos) table (both sides large → shuffle hash join),
   keep rows whose pos equals the min, and docs reassemble on a
   doc-bucket groupby (every doc emits ≥1 paragraph row, so no doc is
   lost even when all its paragraphs were dropped elsewhere's dups).

Only hashes, positions and paragraph text travel; at 100 TB you would
drop the text from pass 2's payload and re-join it at reassembly —
here paragraphs ride along because they are needed for output anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash128_signed

_IDX_BITS = 20          # max 2^20 paragraphs per doc
_N_BUCKETS = 32
PARA_SEP = "\n\n"


def split_paragraphs_batch(batch: pa.Table, *, text_col: str,
                           key_col: str) -> pa.Table:
    """Doc rows -> paragraph rows (key, idx, h1, h2, para)."""
    keys_out, idxs, h1s, h2s, paras = [], [], [], [], []
    keys = batch[key_col].to_pylist()
    for key, text in zip(keys, batch[text_col].to_pylist()):
        parts = (text or "").split(PARA_SEP)
        for i, p in enumerate(parts):
            h1, h2 = hash128_signed(p)
            keys_out.append(key)
            idxs.append(i)
            h1s.append(h1)
            h2s.append(h2)
            paras.append(p)
    return pa.table({
        key_col: pa.array(keys_out, pa.int64()),
        "idx": pa.array(idxs, pa.int64()),
        "h1": pa.array(h1s, pa.int64()),
        "h2": pa.array(h2s, pa.int64()),
        "para": pa.array(paras, pa.string()),
    })


def dedup_paragraphs(ds, *, text_col: str = "text", key_col: str = "doc_id"):
    """Corpus-wide first-occurrence paragraph dedup.  Returns a Dataset
    of (key, text, n_kept, n_dropped) with ``text`` the doc rebuilt
    from its surviving paragraphs (PARA_SEP-joined, original order)."""
    from ray.data.aggregate import Min

    paras = ds.map_batches(
        split_paragraphs_batch,
        fn_kwargs={"text_col": text_col, "key_col": key_col},
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def add_pos(batch: pa.Table) -> pa.Table:
        pos = (batch[key_col].to_numpy() << _IDX_BITS) | batch["idx"].to_numpy()
        return batch.append_column("pos", pa.array(pos, pa.int64()))

    positioned = paras.map_batches(add_pos, batch_format="pyarrow",
                                   zero_copy_batch=True)
    firsts = positioned.groupby(["h1", "h2"]).aggregate(
        Min("pos", alias_name="min_pos"))
    joined = positioned.join(firsts, join_type="inner", num_partitions=8,
                             on=("h1", "h2"))

    def mark(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kept = pc.equal(batch["pos"], batch["min_pos"])
        bucket = batch[key_col].to_numpy() % _N_BUCKETS
        return pa.table({
            key_col: batch[key_col],
            "idx": batch["idx"],
            "para": batch["para"],
            "kept": pc.cast(kept, pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
        })

    marked = joined.map_batches(mark, batch_format="pyarrow",
                                zero_copy_batch=True)

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values([key_col, "idx"], kind="mergesort")
        g["pk"] = g["para"].where(g["kept"] == 1)
        out = (
            g.groupby(key_col, sort=False)
            .agg(text=("pk", lambda s: PARA_SEP.join(s.dropna())),
                 n_kept=("kept", "sum"),
                 n_total=("kept", "size"))
            .reset_index()
        )
        out["n_dropped"] = (out["n_total"] - out["n_kept"]).astype("int64")
        out["n_kept"] = out["n_kept"].astype("int64")
        return out[[key_col, "text", "n_kept", "n_dropped"]]

    return marked.groupby("bucket").map_groups(rebuild, batch_format="pandas")
