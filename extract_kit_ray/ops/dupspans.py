"""Duplicated k-token window detection (substring-level dedup signal).

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(2021) show that web corpora are full of REPEATED SUBSTRINGS that
whole-document dedup never sees (boilerplate footers, licence blocks,
templated paragraphs), and that removing or down-weighting them
improves LMs.  Their ExactSubstr tool builds a corpus-wide suffix
array; this module is the windowed variant that maps onto a shuffle
engine: every k-token window whose exact text occurs MORE THAN ONCE
corpus-wide (all occurrences counted — within-doc repeats included,
matching the suffix-array semantics) is a duplicated span, and per
document we report how many of its windows are duplicated and how many
token positions fall under at least one duplicated window (the
"fraction of doc covered by duplicated text" signal used for
filtering).

Scale shape — two streaming passes, text never shuffles:

- pass A (window census): one tokenize ``map_batches`` emits per-batch
  PARTIAL (wh1, wh2, n) counts of 128-bit window keys (map-side
  combine: the ``groupby`` shuffle moves distinct-window partials of
  ~24 bytes, never tokens or text), one ``groupby(wh1, wh2)`` sums
  them, ``n >= 2`` filters to the dup-window key table — bounded by
  the number of DISTINCT duplicated windows, not occurrences.
- pass B (per-doc fold), broadcast-or-join guarded like ops/dedup:
  under ``config.broadcast_max_rows`` the dup-key table ships once via
  ``ray.put`` (a :class:`_KeySet` — one ``np.searchsorted`` per batch)
  and each batch folds its own coverage locally; above it, a narrow
  (key, s, wh1, wh2) fan-out inner-joins the dup table (16 bytes/row
  of window id + 16 of key/pos — the document text stays columnar in
  the original blocks) and a groupby(key) collect folds the interval
  union per doc.

Window keys are 128-bit: token-level blake2b hashes (computed once per
DISTINCT token per batch via ``pc.unique`` + ``pc.index_in``) combined
positionally by two independent 64-bit polynomial lanes — equal window
text always gives equal keys; distinct windows collide with
probability ~2^-128 per pair (same no-verify contract as
ops/dedup.add_text_hash, see functions/hashing.hash128_signed).

Tokenization is the corpus-wide ``text.split()`` convention
(ops/bm25._tokens), mirrored in SQL by
``list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .bm25 import _tokens
from .dedup import KeySet128, _collect_agg, _combine128
from ..functions.hashing import hash128_batch_signed

# distinct odd multipliers per lane (splitmix64 / Weyl constants); the
# lanes stay independent because the token-hash inputs differ per lane
_R1 = np.uint64(0x9E3779B97F4A7C15)
_R2 = np.uint64(0xBF58476D1CE4E5B9)


def _window_hashes(words: pa.ListArray, k: int):
    """Vectorized per-batch window keys.

    Returns ``(starts, parent_w, wh1, wh2, parent_flat, n_flat)``:
    global flat-token index of each valid window start, its doc row
    index, the two int64 key lanes, plus the per-token parent vector
    and flat length (for the coverage fold).  A window is valid iff its
    k tokens share one parent doc.  Zero Python rows: one blake2b pass
    over the batch's DISTINCT tokens, one ``pc.index_in`` probe, k
    fused multiply-adds per lane."""
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(flat)
    empty = (np.array([], np.int64),) * 4
    if n == 0:
        return (*empty, np.array([], np.int64), 0)
    parent_flat = words.value_parent_indices().to_numpy().astype(np.int64)
    if n < k:
        return (*empty, parent_flat, n)
    uniq = pc.unique(flat)
    uh1, uh2 = hash128_batch_signed(uniq.to_pylist())
    tid = pc.index_in(flat, value_set=uniq).to_numpy(
        zero_copy_only=False).astype(np.int64)
    th1 = uh1.view(np.uint64)[tid]
    th2 = uh2.view(np.uint64)[tid]
    m = n - k + 1
    w1 = np.zeros(m, dtype=np.uint64)
    w2 = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            w1 = w1 * _R1 + th1[j:j + m]
            w2 = w2 * _R2 + th2[j:j + m]
    valid = parent_flat[:m] == parent_flat[k - 1:]
    starts = np.flatnonzero(valid)
    return (starts, parent_flat[starts],
            w1[valid].view(np.int64), w2[valid].view(np.int64),
            parent_flat, n)


# re-export: the membership probe lives next to its write side in
# ops/dedup (KeySet128); dupspans and incremental both broadcast it
_KeySet = KeySet128


def _census_partial(batch: pa.Table, *, text_col: str, k: int) -> pa.Table:
    """Per-batch PARTIAL window-key counts (map-side combine): lexsort
    the (wh1, wh2) pairs and run-length count — exact on the full 128
    bits, no 64-bit fold in the combine path."""
    words, _dl = _tokens(batch[text_col])
    _s, _p, wh1, wh2, _pf, _n = _window_hashes(words, k)
    if len(wh1) == 0:
        return pa.table({"wh1": pa.array([], pa.int64()),
                         "wh2": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    order = np.lexsort((wh2, wh1))
    s1, s2 = wh1[order], wh2[order]
    new = np.empty(len(s1), dtype=bool)
    new[0] = True
    new[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
    firsts = np.flatnonzero(new)
    counts = np.diff(np.append(firsts, len(s1)))
    return pa.table({"wh1": pa.array(s1[firsts], pa.int64()),
                     "wh2": pa.array(s2[firsts], pa.int64()),
                     "n": pa.array(counts, pa.int64())})


def dup_window_keys(ds, *, text_col: str = "text", k: int = 8):
    """Dataset of (wh1, wh2, n_occ) for every k-token window occurring
    more than once corpus-wide."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        _census_partial, fn_kwargs={"text_col": text_col, "k": k},
        batch_format="pyarrow", zero_copy_batch=True)
    totals = partials.groupby(["wh1", "wh2"]).aggregate(
        Sum("n", alias_name="n_occ"))
    return totals.filter(expr="n_occ >= 2")


def _doc_stats(batch: pa.Table, *, text_col: str, key_col: str, k: int,
               keyset: _KeySet) -> pa.Table:
    """Broadcast-path per-doc fold: probe this batch's windows against
    the dup-key set, then one cumsum interval-union over the flat token
    axis (windows never cross doc boundaries, so per-doc coverage is a
    bincount of covered positions by parent)."""
    words, dl = _tokens(batch[text_col])
    starts, parent_w, wh1, wh2, parent_flat, n_flat = _window_hashes(words, k)
    n_rows = len(batch)
    n_windows = np.maximum(dl - (k - 1), 0)
    member = keyset.contains(wh1, wh2)
    dup_starts = starts[member]
    dup_windows = np.bincount(parent_w[member], minlength=n_rows)[:n_rows]
    if len(dup_starts):
        delta = (np.bincount(dup_starts, minlength=n_flat + k)
                 - np.bincount(dup_starts + k, minlength=n_flat + k))
        covered = np.cumsum(delta[:n_flat]) > 0
        covered_tokens = np.bincount(
            parent_flat[covered], minlength=n_rows)[:n_rows]
    else:
        covered_tokens = np.zeros(n_rows, dtype=np.int64)
    return pa.table({
        key_col: batch[key_col],
        "n_tokens": pa.array(dl, pa.int64()),
        "n_windows": pa.array(n_windows, pa.int64()),
        "dup_windows": pa.array(dup_windows.astype(np.int64), pa.int64()),
        "covered_tokens": pa.array(covered_tokens.astype(np.int64),
                                   pa.int64()),
    })


def _fanout(batch: pa.Table, *, text_col: str, key_col: str,
            k: int) -> pa.Table:
    """Join-path narrow fan-out: (key, s, wh1, wh2) per valid window,
    with ``s`` the 0-based token start WITHIN the doc."""
    words, _dl = _tokens(batch[text_col])
    starts, parent_w, wh1, wh2, parent_flat, n_flat = _window_hashes(words, k)
    # first flat index of each window's parent (parent_flat is sorted)
    if len(starts):
        doc_first = np.searchsorted(parent_flat, parent_w, side="left")
        s_in_doc = starts - doc_first
        keys = batch[key_col].to_numpy()[parent_w]
    else:
        s_in_doc = np.array([], np.int64)
        keys = np.array([], np.int64)
    return pa.table({key_col: pa.array(keys, pa.int64()),
                     "s": pa.array(s_in_doc, pa.int64()),
                     "wh1": pa.array(wh1, pa.int64()),
                     "wh2": pa.array(wh2, pa.int64())})


def _base_stats(batch: pa.Table, *, text_col: str, key_col: str,
                k: int) -> pa.Table:
    words, dl = _tokens(batch[text_col])
    return pa.table({
        key_col: batch[key_col],
        "n_tokens": pa.array(dl, pa.int64()),
        "n_windows": pa.array(np.maximum(dl - (k - 1), 0), pa.int64()),
    })


def _union_len(starts: list, k: int) -> int:
    """Union length of fixed-length intervals [s, s+k): sort starts,
    sum clipped gaps."""
    s = np.sort(np.asarray(starts, dtype=np.int64))
    if len(s) == 0:
        return 0
    return int(np.minimum(np.diff(s), k).sum() + k)


def _covered_mask(batch: pa.Table, *, text_col: str, k: int,
                  keyset: KeySet128):
    """Shared probe+union: (words, dl, parent_flat, covered bool mask
    over the batch's flat token axis)."""
    words, dl = _tokens(batch[text_col])
    starts, parent_w, wh1, wh2, parent_flat, n_flat = _window_hashes(words, k)
    member = keyset.contains(wh1, wh2)
    dup_starts = starts[member]
    if len(dup_starts):
        delta = (np.bincount(dup_starts, minlength=n_flat + k)
                 - np.bincount(dup_starts + k, minlength=n_flat + k))
        covered = np.cumsum(delta[:n_flat]) > 0
    else:
        covered = np.zeros(n_flat, dtype=bool)
    return words, dl, parent_flat, parent_w[member], dup_starts, covered


def _rebuild_from_mask(batch: pa.Table, *, text_col: str, key_col: str,
                       words, dl, parent_flat, covered) -> pa.Table:
    """Join each doc's NON-covered tokens back with single spaces —
    one flat filter + one list rebuild, no per-token Python."""
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    keepers = ~covered
    # empty-doc convention: _tokens leaves [''] for blank docs (dl==0);
    # drop those tokens so the rebuilt text is '' not a stray token
    if len(dl):
        blank_doc = np.flatnonzero(dl == 0)
        if len(blank_doc):
            keepers &= ~np.isin(parent_flat, blank_doc)
    kept_flat = flat.filter(pa.array(keepers))
    kept_parent = parent_flat[keepers]
    n_rows = len(batch)
    counts = np.bincount(kept_parent, minlength=n_rows)[:n_rows]
    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    kept_lists = pa.ListArray.from_arrays(pa.array(offsets),
                                          kept_flat.combine_chunks()
                                          if isinstance(kept_flat,
                                                        pa.ChunkedArray)
                                          else kept_flat)
    text_out = pc.binary_join(kept_lists, " ")
    return pa.table({
        key_col: batch[key_col],
        "text": text_out,
        "n_tokens": pa.array(dl, pa.int64()),
        "n_kept": pa.array(counts.astype(np.int64), pa.int64()),
    })


def strip_duplicated_spans(ds, *, text_col: str = "text",
                           key_col: str = "doc_id", k: int = 8,
                           broadcast_max: int | None = None,
                           num_partitions: int | None = None):
    """Rebuild every document with its duplicated-window tokens REMOVED
    — the corpus-cleaning counterpart of :func:`duplicated_spans`
    (stats for filtering; this one emits the stripped text).

    Removal rule: a token is dropped iff it lies under at least one
    k-token window whose text occurs >1 time corpus-wide — ALL
    occurrences go, the aggressive variant (Lee et al.'s suffix-array
    tool keeps one canonical copy; with overlapping fixed-k windows a
    global keep-one assignment is ill-defined, and for boilerplate
    removal dropping every occurrence is the common production
    choice).  Returns (key, text, n_tokens, n_kept).

    Scale shape matches duplicated_spans: the window census shuffle
    moves 24-byte partials; under ``config.broadcast_max_rows`` the
    rebuild is one streaming map (text never shuffles), above it the
    per-doc dup-start lists ride a left join onto the docs
    (comma-encoded like ops/paradedup — Acero rejects list payloads),
    shipping text exactly once."""
    from ..config import broadcast_max_rows, resolve_num_partitions
    from .rayfix import seed_join_side

    if k < 2:
        raise ValueError("strip_duplicated_spans requires k >= 2")
    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    dup_keys = dup_window_keys(ds, text_col=text_col, k=k).materialize()
    n_dup = dup_keys.count()

    if n_dup <= broadcast_max:
        if n_dup:
            dup_rows = dup_keys.to_pandas()
            h1 = dup_rows["wh1"].to_numpy().astype(np.int64)
            h2 = dup_rows["wh2"].to_numpy().astype(np.int64)
        else:
            h1 = h2 = np.array([], np.int64)
        keyset = KeySet128(h1, h2)

        def rebuild(batch: pa.Table) -> pa.Table:
            words, dl, parent_flat, _pw, _ds_, covered = _covered_mask(
                batch, text_col=text_col, k=k, keyset=keyset)
            return _rebuild_from_mask(batch, text_col=text_col,
                                      key_col=key_col, words=words, dl=dl,
                                      parent_flat=parent_flat,
                                      covered=covered)

        return ds.map_batches(rebuild, batch_format="pyarrow",
                              zero_copy_batch=True)

    # join fallback: per-doc dup-start lists (narrow) left-join onto
    # the docs; text ships once
    fan = ds.map_batches(
        _fanout, fn_kwargs={"text_col": text_col, "key_col": key_col,
                            "k": k},
        batch_format="pyarrow", zero_copy_batch=True)
    seeded = seed_join_side(
        dup_keys,
        pa.table({"wh1": pa.array([0], pa.int64()),
                  "wh2": pa.array([0], pa.int64()),
                  "n_occ": pa.array([None], pa.int64())}))
    hits = fan.join(seeded, join_type="inner",
                    num_partitions=num_partitions, on=("wh1", "wh2"))
    hits = hits.map_batches(
        lambda b: b.filter(pc.is_valid(b["n_occ"])),
        batch_format="pyarrow", zero_copy_batch=True)
    starts_per_doc = (hits
                      .map_batches(lambda b: b.select([key_col, "s"]),
                                   batch_format="pyarrow",
                                   zero_copy_batch=True)
                      .groupby(key_col)
                      .aggregate(_collect_agg("s", alias="starts")))

    def encode(batch: pa.Table) -> pa.Table:
        return pa.table({
            "dup_key": batch[key_col],
            "starts": pa.array([",".join(map(str, s)) for s in
                                batch["starts"].to_pylist()], pa.string()),
        })

    enc = seed_join_side(
        starts_per_doc.map_batches(encode, batch_format="pyarrow",
                                   zero_copy_batch=True),
        pa.table({"dup_key": pa.array([-1], pa.int64()),
                  "starts": pa.array([""], pa.string())}))
    joined = ds.join(enc, join_type="left_outer",
                     num_partitions=num_partitions,
                     on=(key_col,), right_on=("dup_key",))

    def rebuild_joined(batch: pa.Table) -> pa.Table:
        words, dl = _tokens(batch[text_col])
        flat_len = len(pc.list_flatten(words))
        parent_flat = (words.value_parent_indices().to_numpy()
                       .astype(np.int64) if flat_len else
                       np.array([], np.int64))
        doc_first = np.searchsorted(
            parent_flat, np.arange(len(batch), dtype=np.int64), side="left")
        covered = np.zeros(flat_len, dtype=bool)
        starts_col = batch["starts"].to_pylist() if "starts" in \
            batch.column_names else [None] * len(batch)
        dup_starts = []
        for row, enc_s in enumerate(starts_col):
            if not enc_s:
                continue
            base = doc_first[row]
            dup_starts.extend(base + int(x) for x in enc_s.split(","))
        if dup_starts:
            st = np.asarray(dup_starts, dtype=np.int64)
            delta = (np.bincount(st, minlength=flat_len + k)
                     - np.bincount(st + k, minlength=flat_len + k))
            covered = np.cumsum(delta[:flat_len]) > 0
        out = _rebuild_from_mask(batch, text_col=text_col, key_col=key_col,
                                 words=words, dl=dl,
                                 parent_flat=parent_flat, covered=covered)
        return out

    return joined.map_batches(rebuild_joined, batch_format="pyarrow",
                              zero_copy_batch=True)


def duplicated_spans(ds, *, text_col: str = "text", key_col: str = "doc_id",
                     k: int = 8, broadcast_max: int | None = None,
                     num_partitions: int | None = None):
    """Per-document duplicated-window stats over the whole corpus.

    Returns a Dataset of (key, n_tokens, n_windows, dup_windows,
    covered_tokens): window/token counts under the ``text.split()``
    convention, the number of this doc's k-token windows whose text
    occurs >1 time corpus-wide, and the number of token positions
    covered by at least one such window.  ``covered_tokens /
    n_tokens`` is the Lee-et-al duplicated-text fraction used to
    filter or down-weight templated pages."""
    from ..config import broadcast_max_rows, resolve_num_partitions
    from .rayfix import seed_join_side

    if k < 2:
        raise ValueError("duplicated_spans requires k >= 2")
    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    dup_keys = dup_window_keys(ds, text_col=text_col, k=k).materialize()
    # bounded by DISTINCT duplicated windows (not occurrences); the
    # broadcast guard below routes big dup tables through the join path
    n_dup = dup_keys.count()

    if n_dup <= broadcast_max:
        if n_dup:
            dup_rows = dup_keys.to_pandas()
            h1 = dup_rows["wh1"].to_numpy().astype(np.int64)
            h2 = dup_rows["wh2"].to_numpy().astype(np.int64)
        else:
            h1 = h2 = np.array([], np.int64)
        # closure-captured like ops/dedup's _DupLookup: serialized with
        # the UDF once, not re-shipped per batch
        keyset = _KeySet(h1, h2)
        return ds.map_batches(
            _doc_stats,
            fn_kwargs={"text_col": text_col, "key_col": key_col, "k": k,
                       "keyset": keyset},
            batch_format="pyarrow", zero_copy_batch=True)

    # join fallback: narrow fan-out x dup-key table.  The sentinel row
    # (wh 0,0) carries a NULL n_occ, so a 2^-128 hash coincidence with
    # a real window filters out instead of minting a false duplicate.
    fan = ds.map_batches(
        _fanout, fn_kwargs={"text_col": text_col, "key_col": key_col,
                            "k": k},
        batch_format="pyarrow", zero_copy_batch=True)
    seeded = seed_join_side(
        dup_keys,
        pa.table({"wh1": pa.array([0], pa.int64()),
                  "wh2": pa.array([0], pa.int64()),
                  "n_occ": pa.array([None], pa.int64())}))
    hits = fan.join(seeded, join_type="inner",
                    num_partitions=num_partitions, on=("wh1", "wh2"))
    hits = hits.map_batches(
        lambda b: b.filter(pc.is_valid(b["n_occ"])),
        batch_format="pyarrow", zero_copy_batch=True)

    starts_per_doc = (hits
                      .map_batches(lambda b: b.select([key_col, "s"]),
                                   batch_format="pyarrow",
                                   zero_copy_batch=True)
                      .groupby(key_col)
                      .aggregate(_collect_agg("s", alias="starts")))

    def fold(batch: pa.Table) -> pa.Table:
        starts = batch["starts"].to_pylist()
        return pa.table({
            "dup_key": batch[key_col],
            "dup_windows": pa.array([len(s) for s in starts], pa.int64()),
            "covered_tokens": pa.array([_union_len(s, k) for s in starts],
                                       pa.int64()),
        })

    agg = starts_per_doc.map_batches(fold, batch_format="pyarrow",
                                     zero_copy_batch=True)
    base = ds.map_batches(
        _base_stats, fn_kwargs={"text_col": text_col, "key_col": key_col,
                                "k": k},
        batch_format="pyarrow", zero_copy_batch=True)
    agg = seed_join_side(
        agg, pa.table({"dup_key": pa.array([-1], pa.int64()),
                       "dup_windows": pa.array([0], pa.int64()),
                       "covered_tokens": pa.array([0], pa.int64())}))
    joined = base.join(agg, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=(key_col,), right_on=("dup_key",))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch[key_col],
            "n_tokens": batch["n_tokens"],
            "n_windows": batch["n_windows"],
            "dup_windows": pc.fill_null(batch["dup_windows"], 0),
            "covered_tokens": pc.fill_null(batch["covered_tokens"], 0),
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)
