"""Statistical n-gram LM quality scoring (CCNet-style), integer-exact.

The CCNet recipe (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", 2019) scores every web
document by its perplexity under a language model trained on a clean
reference corpus, then filters/buckets on that score.  This module is
that operator re-expressed Ray-Data-first with a deterministic,
SQL-mirrorable scoring rule:

- the "LM" is bigram + unigram counts over a REFERENCE SUBSET of the
  corpus (CCNet uses Wikipedia; here a deterministic doc_id slice so
  the oracle can replay it);
- per adjacent token pair (a, b) the surprisal proxy is the INVERSE
  conditional probability in micro-units —
  ``invp = floor(C1(a) * 1e6 / C2(a, b))`` (= 1e6 / P(b|a)), with a
  fixed OOV penalty for pairs the reference never saw;
- a document's score is the bigram count, the invp sum, and the mean
  ``floor(sum / n)`` — all int64, no float anywhere, so a DuckDB
  oracle (unnest + join + SUM) matches bit-for-bit.  (A real
  perplexity needs ``log``; libm ulp differences across engines break
  value-hash oracles, and the MONOTONE filter/bucket decision is the
  same under 1/P as under -log P.)

Scale shape:

- count pass: one tokenize ``map_batches`` emits per-batch PARTIAL
  (gram, kind, n) rows via ``pc.value_counts`` (map-side combine — the
  groupby shuffle moves vocab-sized partials, never tokens), one
  ``groupby(gram, kind)`` folds them;
- score pass, broadcast-or-join guarded like ops/dedup: under
  ``config.broadcast_max_rows`` the count table ships to every actor
  ONCE (``ray.put``; per batch TWO ``pc.index_in`` probes — the same
  one-pass hash-join kernel as ops/bm25._tf_matrix); above it, the
  doc->bigram fan-out joins the count table distributed (two narrow
  ``Dataset.join``s + one groupby(key) fold — no driver collect).

int64 headroom: ``C1(a) * 1e6`` requires per-unigram reference counts
below 2^63/1e6 ~ 9.2e12 — guarded with a loud ValueError (same
fail-loud contract as ops/pagerank's micro-unit guard).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .bm25 import _tokens

OOV_INVP_MICRO = 1_000_000_000  # unseen pair ~ P = 1e-3 proxy
_C1_MAX = (2**63 - 1) // 1_000_000


def bigram_fanout(batch: pa.Table, *, text_col: str = "text",
                  key_col: str = "doc_id") -> pa.Table:
    """Doc rows -> (key, w1, bg) rows, one per ADJACENT in-doc token
    pair, fully vectorized: flatten once, pair by slice, keep pairs
    whose two tokens share a parent doc."""
    words, _dl = _tokens(batch[text_col])
    flat = pc.list_flatten(words)
    n = len(flat)
    empty = pa.table({key_col: pa.array([], pa.int64()),
                      "w1": pa.array([], pa.string()),
                      "bg": pa.array([], pa.string())})
    if n < 2:
        return empty
    parent = words.value_parent_indices().to_numpy()
    same = parent[:-1] == parent[1:]
    if not same.any():
        return empty
    w1 = flat.slice(0, n - 1)
    bg = pc.binary_join_element_wise(w1, flat.slice(1, n - 1), " ")
    mask = pa.array(same)
    keys = batch[key_col].to_numpy()[parent[:-1][same]]
    return pa.table({key_col: pa.array(keys, pa.int64()),
                     "w1": w1.filter(mask), "bg": bg.filter(mask)})


def reference_counts(ref_ds, *, text_col: str = "text",
                     key_col: str = "doc_id"):
    """Reference subset -> Dataset of (gram, kind 'u'|'b', n): unigram
    and bigram counts fused through ONE groupby (the bm25 fusion
    trick), map-side combined per batch via ``pc.value_counts``."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        words, _dl = _tokens(batch[text_col])
        flat = pc.list_flatten(words)
        uni = pc.value_counts(flat.filter(pc.not_equal(flat, "")))
        pairs = bigram_fanout(batch, text_col=text_col, key_col=key_col)
        bi = pc.value_counts(pairs["bg"].combine_chunks())
        return pa.table({
            "gram": pa.concat_arrays([uni.field("values"),
                                      bi.field("values")]),
            "kind": pa.array(["u"] * len(uni) + ["b"] * len(bi),
                             pa.string()),
            "n": pa.concat_arrays([pc.cast(uni.field("counts"), pa.int64()),
                                   pc.cast(bi.field("counts"), pa.int64())]),
        })

    return (ref_ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(["gram", "kind"]).aggregate(Sum("n", alias_name="n")))


def _invp(c1: np.ndarray, c2: np.ndarray, seen: np.ndarray) -> np.ndarray:
    """floor(c1 * 1e6 / c2) where the pair was seen, OOV penalty
    elsewhere.  A seen bigram implies a seen prefix (c1 >= c2 >= 1)."""
    out = np.full(len(c1), OOV_INVP_MICRO, dtype=np.int64)
    if seen.any():
        if c1[seen].max(initial=0) > _C1_MAX:
            raise ValueError(
                "surprisal_scores: unigram count exceeds int64 micro-unit "
                f"headroom ({_C1_MAX}); shard the reference corpus")
        out[seen] = (c1[seen] * 1_000_000) // c2[seen]
    return out


def surprisal_scores(ds, ref_ds, *, text_col: str = "text",
                     key_col: str = "doc_id", broadcast_max: int | None = None,
                     num_partitions: int | None = None):
    """Score every doc of ``ds`` under the bigram LM counted from
    ``ref_ds``.  Returns a Dataset (key, n_bigrams, sum_invp_micro,
    mean_invp_micro); docs with fewer than two tokens emit no row
    (they have no bigram evidence — same contract as the SQL oracle).
    """
    from ..config import broadcast_max_rows, resolve_num_partitions

    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    counts = reference_counts(ref_ds, text_col=text_col,
                              key_col=key_col).materialize()
    if counts.count() <= broadcast_max:
        return _score_broadcast(ds, counts, text_col=text_col,
                                key_col=key_col)
    return _score_join(ds, counts, text_col=text_col, key_col=key_col,
                       num_partitions=resolve_num_partitions(num_partitions))


def _finalize(batch: pa.Table, key_col: str) -> pa.Table:
    s = batch["sum_invp_micro"].to_numpy()
    n = batch["n_bigrams"].to_numpy()
    return pa.table({
        key_col: batch[key_col],
        "n_bigrams": batch["n_bigrams"],
        "sum_invp_micro": batch["sum_invp_micro"],
        "mean_invp_micro": pa.array(s // n, pa.int64()),
    })


def _score_broadcast(ds, counts, *, text_col: str, key_col: str):
    """Counts ship once via the object store; per batch the lookup is
    two ``pc.index_in`` probes + gathers — no shuffle at all, the
    per-doc fold happens in-batch (bigram rows never leave the task)."""
    import ray as _ray

    tbl = pa.concat_tables(_ray.get(counts.to_arrow_refs()))
    is_u = pc.equal(tbl["kind"], "u")
    ref = _ray.put({
        "uni_g": tbl.filter(is_u)["gram"].combine_chunks(),
        "uni_n": tbl.filter(is_u)["n"].to_numpy(zero_copy_only=False),
        "bi_g": tbl.filter(pc.invert(is_u))["gram"].combine_chunks(),
        "bi_n": tbl.filter(pc.invert(is_u))["n"].to_numpy(zero_copy_only=False),
    })

    class Scorer:
        def __init__(self):
            import ray as _r

            self.m = _r.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = self.m
            pairs = bigram_fanout(batch, text_col=text_col, key_col=key_col)
            if pairs.num_rows == 0:
                return pa.table({key_col: pa.array([], pa.int64()),
                                 "n_bigrams": pa.array([], pa.int64()),
                                 "sum_invp_micro": pa.array([], pa.int64()),
                                 "mean_invp_micro": pa.array([], pa.int64())})
            bi_id = pc.index_in(pairs["bg"], value_set=m["bi_g"]).fill_null(
                -1).to_numpy(zero_copy_only=False).astype(np.int64)
            uni_id = pc.index_in(pairs["w1"], value_set=m["uni_g"]).fill_null(
                -1).to_numpy(zero_copy_only=False).astype(np.int64)
            seen = (bi_id >= 0) & (uni_id >= 0)
            c1 = np.where(uni_id >= 0, m["uni_n"][np.maximum(uni_id, 0)], 0)
            c2 = np.where(bi_id >= 0, m["bi_n"][np.maximum(bi_id, 0)], 1)
            invp = _invp(c1, c2, seen)
            # in-batch per-doc fold: bigram rows are doc-CONTIGUOUS by
            # construction (fanout follows parent order), not sorted —
            # segment boundaries, not np.unique (whose first-occurrence
            # indices are non-monotone on unsorted keys)
            keys = pairs[key_col].to_numpy()
            start = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
            uk = keys[start]
            sums = np.add.reduceat(invp, start)
            ns = np.diff(np.append(start, len(invp)))
            return pa.table({
                key_col: pa.array(uk, pa.int64()),
                "n_bigrams": pa.array(ns, pa.int64()),
                "sum_invp_micro": pa.array(sums, pa.int64()),
                "mean_invp_micro": pa.array(sums // ns, pa.int64()),
            })

    return ds.map_batches(Scorer, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 8))


def _score_join(ds, counts, *, text_col: str, key_col: str,
                num_partitions: int):
    """Above the broadcast threshold: doc->bigram fan-out rows join the
    count table distributed (w1 -> c1, bg -> c2), then ONE groupby(key)
    folds sum + count.  Nothing corpus-sized touches the driver."""
    from ray.data.aggregate import Count, Sum

    from .rayfix import typed_side

    pairs = ds.map_batches(bigram_fanout,
                           fn_kwargs={"text_col": text_col,
                                      "key_col": key_col},
                           batch_format="pyarrow", zero_copy_batch=True)
    uni = counts.filter(expr="kind == 'u'").select_columns(["gram", "n"])
    bi = counts.filter(expr="kind == 'b'").select_columns(["gram", "n"])
    j1 = typed_side(pairs).join(
        typed_side(uni.rename_columns({"gram": "w1", "n": "c1"})),
        join_type="left_outer", on=("w1",), num_partitions=num_partitions)
    j2 = typed_side(j1).join(
        typed_side(bi.rename_columns({"gram": "bg", "n": "c2"})),
        join_type="left_outer", on=("bg",), num_partitions=num_partitions)

    def row_invp(batch: pa.Table) -> pa.Table:
        c1 = batch["c1"].fill_null(0).to_numpy(zero_copy_only=False)
        c2 = batch["c2"].fill_null(0).to_numpy(zero_copy_only=False)
        seen = (c1 > 0) & (c2 > 0)
        invp = _invp(c1.astype(np.int64),
                     np.maximum(c2.astype(np.int64), 1), seen)
        return pa.table({key_col: batch[key_col],
                         "invp": pa.array(invp, pa.int64())})

    folded = (j2.map_batches(row_invp, batch_format="pyarrow")
              .groupby(key_col)
              .aggregate(Sum("invp", alias_name="sum_invp_micro"),
                         Count(alias_name="n_bigrams")))
    return folded.map_batches(_finalize, fn_kwargs={"key_col": key_col},
                              batch_format="pyarrow")
