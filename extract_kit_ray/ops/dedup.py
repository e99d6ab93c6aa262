"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (ray_guide.md "Aggregation at scale"):
- exact: vectorized content-hash column -> ``groupby(hash)`` keep-first
  (hash-partitioned shuffle moves only rows sharing a 64-bit key)
- MinHash-LSH: per-batch shingle->minhash (numpy, vectorized across
  permutations) -> explode to (band_id, band_hash, id) rows ->
  ``groupby(band)`` emits candidate pairs -> signature-estimated Jaccard
  filter -> connected components.  Components run as driver union-find
  over the *candidate pair* set only — bounded by true-duplicate volume,
  not corpus size (documented assumption; the 100 TB path swaps in
  iterated min-label propagation over the same pair Dataset).
- SimHash: 64-bit signature, banded into 4x16-bit keys; Hamming<=k check
  inside band groups.

All hashes derive from functions/hashing.py (blake2b / splitmix64) — no
process-salted ``hash()`` anywhere, so results are stable across runs
and nodes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (
    hash64,
    hash128_batch_signed,
    hash128_signed,
    mix64,
    permutation_params,
)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_text_hash(batch: pa.Table, text_col: str = "text", out_col: str = "text_hash") -> pa.Table:
    """Append a 128-bit content hash as two int64 columns
    (``out_col``, ``out_col + '2'``).

    128 bits because dedup equates documents by hash with no text
    verification: a 64-bit key expects ~2.7M birthday collisions at
    10^10 docs (n^2/2^65), silently merging distinct documents; at 128
    bits the expected collision count is ~1.5e-19 (see
    ``hashing.hash128_signed``)."""
    h1, h2 = hash128_batch_signed(batch[text_col].to_pylist())
    batch = batch.append_column(out_col, pa.array(h1, pa.int64()))
    return batch.append_column(out_col + "2", pa.array(h2, pa.int64()))


def _combine128(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Mix two int64 hash columns into one uint64 sort/search key."""
    with np.errstate(over="ignore"):
        return mix64(h1.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                     + h2.astype(np.uint64))


class KeySet128:
    """Vectorized broadcast 128-bit key membership (the read side of
    :class:`_DupLookup`, without the payload): sorted combined-key
    array, ONE ``np.searchsorted`` + two gathers per probe batch.
    64-bit combined-key collisions between DISTINCT members are
    detected at build time and resolved through a sidecar set, so
    membership stays exact in the 128-bit key space.  Shared by
    ops/dupspans (dup-window probes) and ops/incremental (persisted
    hash-index probes)."""

    def __init__(self, h1: np.ndarray, h2: np.ndarray):
        c = _combine128(h1, h2)
        order = np.argsort(c, kind="stable")
        self.c = c[order]
        self.h1 = h1[order]
        self.h2 = h2[order]
        self.collide: dict[int, set] = {}
        for i in np.flatnonzero(self.c[1:] == self.c[:-1]):
            for j in (i, i + 1):
                self.collide.setdefault(int(self.c[j]), set()).add(
                    (int(self.h1[j]), int(self.h2[j])))

    def contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        out = np.zeros(len(h1), dtype=bool)
        if len(self.c) == 0 or len(h1) == 0:
            return out
        bc = _combine128(h1, h2)
        pi = np.minimum(np.searchsorted(self.c, bc), len(self.c) - 1)
        cand = self.c[pi] == bc
        out = cand & (self.h1[pi] == h1) & (self.h2[pi] == h2)
        if self.collide:
            for i in np.flatnonzero(cand & ~out):
                if (int(h1[i]), int(h2[i])) in self.collide.get(int(bc[i]), ()):
                    out[i] = True
        return out


class _DupLookup:
    """Vectorized broadcast (h1, h2) -> min_key lookup for the exact-dedup
    keep filter.  Build once driver-side (sorted combined-key arrays, a
    few numpy vectors — cheap to ``ray.put``); per batch the lookup is
    ONE ``np.searchsorted`` plus three gathers, no per-row Python.

    Exactness: the combined key is 64-bit, so distinct dup keys CAN
    collide.  Collisions inside the dup set are detected at build time
    (adjacent equal sorted keys) and resolved through a tiny sidecar
    dict; a batch row whose combined key matches but whose (h1, h2)
    differs is a benign non-member and keeps mask=True."""

    def __init__(self, h1: np.ndarray, h2: np.ndarray, min_key: np.ndarray):
        c = _combine128(h1, h2)
        order = np.argsort(c, kind="stable")
        self.c = c[order]
        self.h1 = h1[order]
        self.h2 = h2[order]
        self.min_key = min_key[order]
        self.collisions: dict[int, list[tuple[int, int, int]]] = {}
        for i in np.flatnonzero(self.c[1:] == self.c[:-1]):
            for j in (i, i + 1):
                self.collisions.setdefault(int(self.c[j]), []).append(
                    (int(self.h1[j]), int(self.h2[j]), int(self.min_key[j])))

    def keep_mask(self, h1: np.ndarray, h2: np.ndarray,
                  keys: np.ndarray) -> np.ndarray:
        """True where the row survives: not in a dup cluster, or IS the
        cluster's min-key row."""
        bc = _combine128(h1, h2)
        pi = np.minimum(np.searchsorted(self.c, bc), len(self.c) - 1)
        cand = self.c[pi] == bc
        hit = cand & (self.h1[pi] == h1) & (self.h2[pi] == h2)
        mask = np.ones(len(h1), dtype=bool)
        mask[hit] = self.min_key[pi[hit]] == keys[hit]
        if self.collisions:
            for i in np.flatnonzero(cand & ~hit):
                for ch1, ch2, cmin in self.collisions.get(int(bc[i]), ()):
                    if ch1 == h1[i] and ch2 == h2[i]:
                        mask[i] = cmin == keys[i]
                        break
        return mask


def exact_dedup(ds, *, text_col: str = "text", key_col: str = "doc_id",
                broadcast_max: int | None = None,
                num_partitions: int | None = None):
    """Keep the min-key row per distinct text (first-wins, deterministic).

    SQL-oracle equivalent: ``SELECT min(doc_id) ... GROUP BY text``.

    Scale shape, two-tier: the dup-cluster table (hash -> min key, only
    hashes with count > 1) is bounded by duplicate volume.  When it fits
    under :func:`config.broadcast_max_rows` it is collected once and
    broadcast into a streaming filter — the only shuffle then moves
    24-byte (hash128, key) tuples and full text rows never move.  Above
    the threshold (web corpora run 30-50% duplicates — NOT small) the
    keep-decision instead runs as a distributed ``left_outer`` join of
    the rows onto the dup-cluster table: that pays ONE corpus-wide
    hash-partition (the classic shuffle-by-content-hash dedup shape),
    but the driver never holds an unbounded frame.
    """
    from ray.data.aggregate import Count, Min

    from ..config import broadcast_max_rows, resolve_num_partitions

    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    hashed = ds.map_batches(
        add_text_hash, fn_kwargs={"text_col": text_col}, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # narrow 24-byte (h1, h2, key) projection, MATERIALIZED before the
    # groupby: Ray's sort-aggregate re-samples/re-executes a streaming
    # upstream (measured ~8-13x on identical data, BASELINE.md round
    # 5), and this upstream re-runs the per-doc blake2b hash pass.
    # The pinned rows are exactly what the shuffle moves anyway.
    narrow = hashed.select_columns(
        ["text_hash", "text_hash2", key_col]).materialize()
    groups = (
        narrow.groupby(["text_hash", "text_hash2"])
        .aggregate(Min(key_col, alias_name="min_key"), Count(alias_name="n"))
    )
    # materialize: the count is then free metadata, and both the
    # broadcast path and the join path read it without recompute
    dup_groups = groups.filter(expr="n > 1").materialize()
    n_dup_groups = dup_groups.count()
    if n_dup_groups == 0:
        return hashed.drop_columns(["text_hash", "text_hash2"])

    if n_dup_groups <= broadcast_max:
        # Vectorized keep-decision: no per-row dict lookups in the hot
        # path — one np.searchsorted + gathers per batch (see _DupLookup).
        dup_rows = dup_groups.to_pandas()
        lut = _DupLookup(dup_rows["text_hash"].to_numpy(),
                         dup_rows["text_hash2"].to_numpy(),
                         dup_rows["min_key"].to_numpy())

        def keep(batch: pa.Table) -> pa.Table:
            mask = lut.keep_mask(batch["text_hash"].to_numpy(),
                                 batch["text_hash2"].to_numpy(),
                                 batch[key_col].to_numpy())
            return batch.filter(pa.array(mask)).drop_columns(
                ["text_hash", "text_hash2"])

        return hashed.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)

    # join fallback: left_outer onto the dup-cluster table; a row
    # survives iff its hash has no dup cluster (min_key null) or it IS
    # the cluster's min-key row
    from .rayfix import seed_join_side

    dup_side = seed_join_side(
        dup_groups.map_batches(
            lambda b: pa.table({"dh1": b["text_hash"], "dh2": b["text_hash2"],
                                "min_key": b["min_key"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        # schema-seed guard (ops/rayfix.py); min_key NULL means a
        # 2^-128 sentinel-hash collision degrades to keeping the row
        # (same decision as "no dup cluster") — same risk class as the
        # 128-bit hash equality the operator is already built on
        pa.table({"dh1": pa.array([-0x5A5A5A5A5A5A5A5A], pa.int64()),
                  "dh2": pa.array([0x3C3C3C3C3C3C3C3C], pa.int64()),
                  "min_key": pa.array([None], pa.int64())}),
    )
    joined = hashed.join(
        dup_side, join_type="left_outer", num_partitions=num_partitions,
        on=("text_hash", "text_hash2"), right_on=("dh1", "dh2"),
    )

    def keep_joined(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        min_key = batch["min_key"]
        mask = pc.or_kleene(pc.is_null(min_key),
                            pc.equal(min_key, batch[key_col]))
        return batch.filter(pc.fill_null(mask, False)).drop_columns(
            ["text_hash", "text_hash2", "min_key"])

    return joined.map_batches(keep_joined, batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------------------------------
# shingling + minhash (vectorized)
# ---------------------------------------------------------------------------


def word_shingles(text: str, w: int = 3) -> np.ndarray:
    """uint64 hashes of word w-shingles (deduped, sorted — a set)."""
    words = text.split()
    if len(words) < w:
        blob = " ".join(words)
        return np.array([hash64(blob)], dtype=np.uint64) if blob else np.array([], dtype=np.uint64)
    shingles = {hash64(" ".join(words[i : i + w])) for i in range(len(words) - w + 1)}
    return np.fromiter(shingles, dtype=np.uint64, count=len(shingles))


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_perm,) uint64 signature — min over permuted shingle hashes."""
    n_perm = len(a)
    if shingle_hashes.size == 0:
        return np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # (n_shingles, n_perm) permuted matrix, min along shingles
        permuted = mix64(shingle_hashes[:, None] * a[None, :] + b[None, :])
    return permuted.min(axis=0)


class MinHasher:
    """Actor-pool stage: permutation params AND a token-hash cache built
    once per actor.

    Hot-path design: tokens are blake2b-hashed once and memoized (web
    vocabulary is Zipfian, so the per-actor cache absorbs most lookups);
    shingle hashes are a vectorized position-weighted rolling combine of
    the token hashes (numpy uint64, wraparound arithmetic) rather than
    per-shingle string joins + hashes.  Deterministic across processes
    and platforms: blake2b + fixed odd constants, no salted hash()."""

    def __init__(self, text_col: str = "text", n_perm: int = 64, shingle_w: int = 3,
                 seed: int = 1337, token_cache_max: int = 1_000_000):
        self.text_col = text_col
        self.n_perm = n_perm
        self.shingle_w = shingle_w
        self.a, self.b = permutation_params(n_perm, seed)
        # position constants for the rolling combine (odd -> invertible)
        self._pos_c = mix64(
            (np.arange(1, shingle_w + 1, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))
        ) | np.uint64(1)
        self._token_cache: dict[str, int] = {}
        self._token_cache_max = token_cache_max

    def _shingle_hashes(self, text: str) -> np.ndarray:
        words = text.split()
        if not words:
            return np.array([], dtype=np.uint64)
        cache = self._token_cache
        hs = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = cache.get(w)
            if h is None:
                h = hash64(w)
                if len(cache) < self._token_cache_max:
                    cache[w] = h
            hs[i] = h
        w_ = self.shingle_w
        with np.errstate(over="ignore"):
            if len(words) < w_:
                c = self._pos_c[: len(words)]
                return mix64((hs * c).sum(dtype=np.uint64, keepdims=True))
            windows = np.lib.stride_tricks.sliding_window_view(hs, w_)
            combined = mix64((windows * self._pos_c).sum(axis=1, dtype=np.uint64))
        return np.unique(combined)

    # max shingles per vectorized chunk: permuted matrix is
    # chunk x n_perm x 8B (32k x 64 -> 16 MB), bounding actor heap
    _CHUNK_SHINGLES = 32_768

    def _token_hashes(self, words: list[str]) -> np.ndarray:
        cache = self._token_cache
        hs = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = cache.get(w)
            if h is None:
                h = hash64(w)
                if len(cache) < self._token_cache_max:
                    cache[w] = h
            hs[i] = h
        return hs

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch-vectorized: all docs' token hashes concatenate into one
        array; shingle windows that would span doc boundaries are masked
        out; signatures come from ONE permute + segment-min
        (np.minimum.reduceat) per chunk instead of per-doc numpy calls.
        Duplicate shingles are NOT deduped — min() is idempotent under
        duplicates, so results equal the per-doc unique'd path."""
        texts = batch[self.text_col].to_pylist()
        w_ = self.shingle_w
        n_docs = len(texts)
        sigs: list[list[int] | None] = [None] * n_docs
        maxsig = np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)

        long_idx: list[int] = []      # docs entering the batch path
        long_hs: list[np.ndarray] = []
        with np.errstate(over="ignore"):
            for i, text in enumerate(texts):
                words = (text or "").split()
                if not words:
                    sigs[i] = maxsig.astype(np.int64).tolist()
                elif len(words) < w_:
                    hs = self._token_hashes(words)
                    sh = mix64((hs * self._pos_c[: len(hs)]).sum(
                        dtype=np.uint64, keepdims=True))
                    sigs[i] = minhash_signature(sh, self.a, self.b).astype(
                        np.int64).tolist()
                else:
                    long_idx.append(i)
                    long_hs.append(self._token_hashes(words))

            # chunk the long docs by total shingle count
            pos = 0
            while pos < len(long_idx):
                end = pos
                total = 0
                while end < len(long_idx) and total < self._CHUNK_SHINGLES:
                    total += len(long_hs[end]) - w_ + 1
                    end += 1
                chunk_hs = long_hs[pos:end]
                concat = np.concatenate(chunk_hs)
                windows = np.lib.stride_tricks.sliding_window_view(concat, w_)
                all_sh = mix64((windows * self._pos_c).sum(axis=1, dtype=np.uint64))
                # valid window starts: within-doc only
                lens = np.array([len(h) for h in chunk_hs], dtype=np.int64)
                offs = np.concatenate(([0], np.cumsum(lens)))
                keep = np.zeros(len(all_sh), dtype=bool)
                seg_starts = []
                kept_before = 0
                for d in range(len(chunk_hs)):
                    s, e = offs[d], offs[d] + lens[d] - w_ + 1
                    keep[s:e] = True
                    seg_starts.append(kept_before)
                    kept_before += e - s
                sh_kept = all_sh[keep]
                permuted = mix64(sh_kept[:, None] * self.a[None, :] + self.b[None, :])
                mins = np.minimum.reduceat(permuted, np.array(seg_starts), axis=0)
                for row, i in enumerate(long_idx[pos:end]):
                    sigs[i] = mins[row].astype(np.int64).tolist()
                pos = end

        return batch.append_column("minhash", pa.array(sigs, pa.list_(pa.int64())))


def explode_bands(batch: pa.Table, *, key_col: str = "doc_id", n_bands: int = 16) -> pa.Table:
    """(id, minhash) rows -> (band_id, band_hash, id) candidate rows."""
    keys = batch[key_col].to_pylist()
    sigs = batch["minhash"].to_pylist()
    out_band, out_hash, out_key = [], [], []
    for key, sig in zip(keys, sigs):
        r = len(sig) // n_bands
        for band in range(n_bands):
            chunk = sig[band * r : (band + 1) * r]
            band_hash = hash64(np.array(chunk, dtype=np.int64).tobytes()) - (1 << 63)
            out_band.append(band)
            out_hash.append(band_hash)
            out_key.append(key)
    return pa.table(
        {
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
            key_col: pa.array(out_key, pa.int64()),
        }
    )


def estimated_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def _collect_agg(col: str, *, alias: str = "members"):
    """List-collect AggregateFn: gathers a group's ``col`` values into a
    Python list.  Singleton groups (the overwhelming majority of LSH
    buckets) cost one cheap block-slice accumulate — no per-group pandas
    frame, no pre-count pass."""
    from ray.data.aggregate import AggregateFn

    return AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: a + b,
        accumulate_block=lambda acc, blk: acc + blk.column(col).to_pylist(),
        name=alias,
    )


def _sample_members(ids: list[int], cap: int, salt: int) -> list[int]:
    """Deterministic hash-order sample of ``cap`` members.  The order key
    is ``mix64(key XOR bucket_salt)`` so (a) the sample is independent of
    input row order, (b) different buckets sample *different* subsets
    (the salt is the bucket's band hash), and (c) reruns are identical."""
    arr = np.array(ids, dtype=np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        order = np.argsort(mix64(arr ^ np.uint64(salt & 0xFFFFFFFFFFFFFFFF)),
                           kind="stable")
    return sorted(int(ids[i]) for i in order[:cap])


def _expand_member_pairs(batch: pa.Table, *, members_col: str = "members",
                         max_members: int | None = None,
                         salt_col: str = "band_hash") -> pa.Table:
    """Bucket rows (.., members: list<key>) -> unique sorted (key_a <
    key_b) pairs, deduped batch-locally.

    Giant buckets (degenerate band hashes — e.g. a corpus slice of
    identical cookie-banner boilerplate) would expand quadratically:
    10^6 members in one bucket is 10^12 pairs in one task.  Above
    ``max_members`` the bucket is CAPPED, not exploded: full pair
    expansion runs over a deterministic hash-sampled core of
    ``max_members`` members, and every unsampled member gets ONE star
    edge to the core's min member.  Output is O(cap^2 + n) per bucket;
    bucket connectivity survives in full (every member keeps a candidate
    edge into the core, so the all-identical-boilerplate cluster still
    comes out as one component after verification), and capped pairs
    carry ``overflow=True`` so the cap is auditable, never silent.
    What IS lost under overflow: core-external near-dup pairs whose
    star edge fails exact verification while some dropped in-bucket
    pair would have passed — which is why exact dedup runs UPSTREAM of
    LSH in composed pipelines (see ``driver.q_curate_corpus``): with
    true duplicates already removed, buckets this degenerate are
    near-dup mega-clusters where the star-to-core approximation is the
    standard trade."""
    out_a: list[int] = []
    out_b: list[int] = []
    out_o: list[bool] = []
    salts = (batch[salt_col].to_pylist()
             if salt_col in batch.column_names else [0] * batch.num_rows)
    for members, salt in zip(batch[members_col].to_pylist(), salts):
        ids = sorted(set(members))
        if len(ids) < 2:
            continue
        overflow = max_members is not None and len(ids) > max_members
        core = _sample_members(ids, max_members, int(salt)) if overflow else ids
        for i in range(len(core) - 1):
            for j in range(i + 1, len(core)):
                out_a.append(core[i])
                out_b.append(core[j])
                out_o.append(overflow)
        if overflow:
            hub = core[0]
            core_set = set(core)
            for k in ids:
                if k not in core_set:
                    lo, hi = (hub, k) if hub < k else (k, hub)
                    out_a.append(lo)
                    out_b.append(hi)
                    out_o.append(True)
    if not out_a:
        return pa.table({"key_a": pa.array([], pa.int64()),
                         "key_b": pa.array([], pa.int64()),
                         "overflow": pa.array([], pa.bool_())})
    df = pd.DataFrame({"key_a": out_a, "key_b": out_b, "overflow": out_o})
    # batch-local dedupe; a pair seen both capped and uncapped keeps the
    # uncapped (overflow=False) row
    df = df.sort_values("overflow", kind="stable").drop_duplicates(
        ["key_a", "key_b"], keep="first")
    return pa.Table.from_pandas(df, preserve_index=False)


def minhash_lsh_candidates(ds, *, text_col: str = "text", key_col: str = "doc_id",
                           n_perm: int = 64, n_bands: int = 16, concurrency=4,
                           num_cpus: float = 0.5,
                           max_bucket_members: int | None = None):
    """pages/documents Dataset -> (candidate-pair Dataset, signature
    Dataset).

    ONE shuffle end-to-end: band rows groupby(band_id, band_hash) with a
    list-collect aggregate, then vectorless-but-tiny pair expansion over
    the bucket rows.  (Round-2 used two shuffles — a count aggregate to
    find hot buckets, broadcast into a filter, then a map_groups pair
    expansion; the list-collect aggregate subsumes all three stages and
    halves the fixed all-to-all cost, which dominates wall time until
    block counts are large.)

    ``max_bucket_members`` (default :func:`config.lsh_bucket_cap`,
    ``EKRAY_LSH_BUCKET_CAP``; 0 disables) bounds per-bucket pair
    expansion — see :func:`_expand_member_pairs` for the core+star
    overflow scheme.  Pair rows carry an ``overflow`` bool column."""
    from ..config import lsh_bucket_cap

    if max_bucket_members is None:
        max_bucket_members = lsh_bucket_cap()
    cap = max_bucket_members if max_bucket_members > 0 else None

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"text_col": text_col, "n_perm": n_perm},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency,
        num_cpus=num_cpus,
    ).select_columns([key_col, "minhash"])
    # Signatures feed two consumers (banding, verification read-back);
    # materialize once so MinHash isn't recomputed per consumer.
    # Signature volume is n_perm x 8 bytes/doc (~0.5 KB) — object-store
    # resident with spilling at corpus scale.
    sigs = sigs.materialize()
    bands = sigs.map_batches(
        explode_bands, fn_kwargs={"key_col": key_col, "n_bands": n_bands},
        batch_format="pyarrow",
    )
    buckets = bands.groupby(["band_id", "band_hash"]).aggregate(
        _collect_agg(key_col)
    )
    pairs = buckets.map_batches(
        _expand_member_pairs, fn_kwargs={"max_members": cap},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return pairs, sigs


def minhash_lsh_dedup(ds, *, text_col: str = "text", key_col: str = "doc_id",
                      n_perm: int = 64, n_bands: int = 16, threshold: float = 0.8,
                      concurrency=4,
                      max_bucket_members: int | None = None) -> pd.DataFrame:
    """Full near-dup pipeline. Returns a pandas frame
    (key, cluster_rep, is_dup) for ALL input keys — materialized because
    cluster assignments are the (small) result, not the corpus.

    PRODUCTION DEFAULT at corpus scale is
    :func:`minhash_lsh_dedup_distributed` (join/broadcast-verified
    candidates + distributed clustering); this variant runs driver-side
    union-find and exists as the compact equivalence/test oracle.  Its
    collects are bounded by CANDIDATE volume, never corpus size: the
    narrow key column (the result table itself), plus signatures and
    texts for candidate-pair endpoints only, filtered distributed-side
    before ``to_pandas``.

    Verification is two-stage: a signature-estimated Jaccard prefilter
    at (threshold - 0.2) — which keeps a true >=threshold pair with
    probability ~1 - 3e-8 per pair at n_perm=64 — then EXACT word
    3-gram Jaccard of the candidate texts as the arbiter.  The exact
    final check makes cluster assignments reproducible by a SQL oracle
    (no signature noise at the threshold boundary)."""
    pairs_ds, sigs_ds = minhash_lsh_candidates(
        ds, text_col=text_col, key_col=key_col, n_perm=n_perm,
        n_bands=n_bands, concurrency=concurrency,
        max_bucket_members=max_bucket_members,
    )
    pairs = (pairs_ds.select_columns(["key_a", "key_b"]).to_pandas()
             .drop_duplicates())
    # the result table needs one row per key, but only the NARROW key
    # column ever leaves the cluster — signatures and texts are fetched
    # below for candidate-pair endpoints only (round-2 collected the
    # full signature table AND the full text column; the collects here
    # are bounded by candidate volume, not corpus size)
    all_keys = sorted(
        int(k) for k in sigs_ds.select_columns([key_col]).to_pandas()[key_col]
    )
    pair_list = [
        (int(a), int(b)) for a, b in
        zip(pairs.get("key_a", []), pairs.get("key_b", []))
    ]
    keep = []
    if pair_list:
        endpoint_keys = {k for p in pair_list for k in p}

        def _filter_keys(batch: pa.Table, *, cols) -> pa.Table:
            mask = pa.array([int(k) in endpoint_keys
                             for k in batch[key_col].to_pylist()])
            return batch.select(cols).filter(mask)

        sig_rows = sigs_ds.map_batches(
            _filter_keys, fn_kwargs={"cols": [key_col, "minhash"]},
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()
        sig_by_key = {
            int(k): np.array(s, dtype=np.int64) for k, s in
            zip(sig_rows[key_col], sig_rows["minhash"])
        }
        cand = [
            (ka, kb) for ka, kb in pair_list
            if estimated_jaccard(sig_by_key[ka], sig_by_key[kb])
            >= threshold - 0.2
        ]
        if cand:
            cand_keys = {k for p in cand for k in p}

            def _filter_texts(batch: pa.Table) -> pa.Table:
                mask = pa.array([int(k) in cand_keys
                                 for k in batch[key_col].to_pylist()])
                return batch.select([key_col, text_col]).filter(mask)

            texts_df = ds.map_batches(
                _filter_texts, batch_format="pyarrow", zero_copy_batch=True,
            ).to_pandas()
            texts_by_key = {
                int(k): (t or "") for k, t in
                zip(texts_df[key_col], texts_df[text_col])
            }
            for ka, kb in cand:
                if ngram_jaccard(texts_by_key[ka], texts_by_key[kb]) >= threshold:
                    keep.append((ka, kb))
    # union-find over verified pairs (bounded by duplicate volume)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for ka, kb in keep:
        ra, rb = find(ka), find(kb)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    reps = [find(k) for k in all_keys]
    return pd.DataFrame(
        {key_col: all_keys, "cluster_rep": reps,
         "is_dup": [k != r for k, r in zip(all_keys, reps)]}
    )


def minhash_lsh_dedup_ds(
    ds, *, text_col: str = "text", key_col: str = "doc_id",
    n_perm: int = 64, n_bands: int = 16, threshold: float = 0.8,
    concurrency=4, num_partitions: int | None = None,
    broadcast_max: int | None = None,
    max_bucket_members: int | None = None,
) -> "ray.data.Dataset":
    """Corpus-scale variant of :func:`minhash_lsh_dedup` — THE
    production default at 10^12-doc scale: candidate verification
    happens distributed-side (no driver-side text or signature maps),
    clustering is distributed hash-to-min propagation
    (ops/components.py) instead of driver union-find, and the result
    is a **Dataset** of (key, cluster_rep, is_dup) — one row per
    corpus key — meant to be consumed with ``write_parquet`` /
    ``count``; NOTHING corpus-sized is ever collected on the driver.
    Semantics identical to the driver variant (same exact-Jaccard
    arbiter).

    Verification is two-tier on candidate-pair count (the materialized
    pair table makes the count free): under
    :func:`config.broadcast_max_rows`, the endpoint KEY SET (int64s
    only, never texts) is broadcast into a streaming filter that
    shrinks the text table to candidate endpoints before two small
    hash joins; above it, the joins run against the full text table —
    one corpus-wide hash-partition per side, the honest worst case.
    """
    from ..config import broadcast_max_rows, resolve_num_partitions
    from .components import connected_components_ds

    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    pairs_ds, sigs_ds = minhash_lsh_candidates(
        ds, text_col=text_col, key_col=key_col, n_perm=n_perm,
        n_bands=n_bands, concurrency=concurrency,
        max_bucket_members=max_bucket_members,
    )
    # pairs are deduped batch-locally in the expansion; cross-batch dups
    # (the same pair surfacing from different bands) are harmless for
    # both verification and propagation (idempotent), so no global
    # dedupe shuffle is spent on them.  The overflow audit column is
    # dropped here so the verification joins move only 16-byte pairs.
    pairs_ds = pairs_ds.select_columns(["key_a", "key_b"]).materialize()
    from .rayfix import seed_int64
    n_pairs = pairs_ds.count()

    text_src = ds
    if 0 < n_pairs <= broadcast_max:
        endpoints = set()
        for row in pairs_ds.take_all():
            endpoints.add(int(row["key_a"]))
            endpoints.add(int(row["key_b"]))

        def _filter_endpoints(batch: pa.Table) -> pa.Table:
            mask = pa.array([int(k) in endpoints
                             for k in batch[key_col].to_pylist()])
            return batch.select([key_col, text_col]).filter(mask)

        text_src = ds.map_batches(
            _filter_endpoints, batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()

    # ONE (key, text) join per endpoint, exact word-3-gram Jaccard as
    # the sole arbiter (same as the driver variant and the SQL oracle).
    def _keyed_text(b: pa.Table, key_out: str, text_out: str) -> pa.Table:
        return pa.table({key_out: b[key_col], text_out: b[text_col]})

    text_a = text_src.map_batches(
        _keyed_text, fn_kwargs={"key_out": "key_a_t", "text_out": "text_a"},
        batch_format="pyarrow", zero_copy_batch=True)
    text_b = text_src.map_batches(
        _keyed_text, fn_kwargs={"key_out": "key_b_t", "text_out": "text_b"},
        batch_format="pyarrow", zero_copy_batch=True)
    # schema guard (ops/rayfix.py): pairs come from a bucket aggregate
    # and can carry empty blocks that break the join shuffle's one-shot
    # schema broadcast; the intermediate join output needs the same
    # treatment before the second join.  Sentinel key -1 never matches
    # a real non-negative doc key, so inner joins drop it.
    from .rayfix import typed_side

    pairs_ds = seed_int64(pairs_ds, key_a=-1, key_b=-1)
    half = typed_side(
        pairs_ds.join(
            text_a, join_type="inner", num_partitions=num_partitions,
            on=("key_a",), right_on=("key_a_t",),
        ),
        pa.table({"key_a": pa.array([-1], pa.int64()),
                  "key_b": pa.array([-1], pa.int64()),
                  "text_a": pa.array([""], pa.string())}),
    )
    joined = half.join(
        text_b, join_type="inner", num_partitions=num_partitions,
        on=("key_b",), right_on=("key_b_t",),
    )

    def verify(batch: pa.Table) -> pa.Table:
        keep_a, keep_b = [], []
        for a, b, ta, tb in zip(batch["key_a"].to_pylist(),
                                batch["key_b"].to_pylist(),
                                batch["text_a"].to_pylist(),
                                batch["text_b"].to_pylist()):
            if ngram_jaccard(ta or "", tb or "") >= threshold:
                keep_a.append(a)
                keep_b.append(b)
        return pa.table({"key_a": pa.array(keep_a, pa.int64()),
                         "key_b": pa.array(keep_b, pa.int64())})

    verified = joined.map_batches(verify, batch_format="pyarrow")
    labels = connected_components_ds(
        verified, sigs_ds, key_col=key_col, num_partitions=num_partitions,
        broadcast_max=broadcast_max,
    )

    def _flag(batch: pa.Table, *, c=key_col) -> pa.Table:
        return batch.append_column(
            "is_dup", pc.not_equal(batch[c], batch["cluster_rep"]))

    return labels.map_batches(_flag, batch_format="pyarrow",
                              zero_copy_batch=True)


def minhash_lsh_dedup_distributed(
    ds, *, text_col: str = "text", key_col: str = "doc_id",
    n_perm: int = 64, n_bands: int = 16, threshold: float = 0.8,
    concurrency=4, num_partitions: int | None = None,
    broadcast_max: int | None = None,
    max_bucket_members: int | None = None,
) -> pd.DataFrame:
    """Collecting wrapper over :func:`minhash_lsh_dedup_ds` — the
    oracle/test contract (sorted pandas label table).  A corpus-scale
    run uses the Dataset variant directly and writes the labels out
    instead of collecting them."""
    out = minhash_lsh_dedup_ds(
        ds, text_col=text_col, key_col=key_col, n_perm=n_perm,
        n_bands=n_bands, threshold=threshold, concurrency=concurrency,
        num_partitions=num_partitions, broadcast_max=broadcast_max,
        max_bucket_members=max_bucket_members,
    )
    return out.to_pandas().sort_values(key_col).reset_index(drop=True)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (unsigned)."""
    tokens = text.split()
    if not tokens:
        return 0
    hashes = np.fromiter((hash64(t) for t in tokens), dtype=np.uint64, count=len(tokens))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    counts = bits.sum(axis=0)
    vec = (counts * 2) > len(tokens)
    return sum(1 << int(i) for i in np.nonzero(vec)[0])


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    sh = [simhash64(t or "") - (1 << 63) for t in batch[text_col].to_pylist()]
    return batch.append_column("simhash", pa.array(sh, pa.int64()))


def simhash_candidates(ds, *, text_col: str = "text", key_col: str = "doc_id",
                       max_hamming: int = 3,
                       max_bucket_members: int | None = None):
    """SimHash near-dup candidates: band the 64-bit signature into
    ``max_hamming + 1`` contiguous bit ranges — by pigeonhole, any pair
    within Hamming<=max_hamming differs in at most max_hamming bands, so
    at least one band matches exactly.  Band count is DERIVED from
    max_hamming (a fixed 4-band split silently under-recalls for
    max_hamming >= 4 — round-1 advisor finding); max_hamming must stay
    below 64 bands of >= 1 bit.

    ``max_bucket_members`` (default :func:`config.lsh_bucket_cap`;
    0 disables) bounds per-bucket pair expansion with the same
    core+star overflow scheme as :func:`_expand_member_pairs`: full
    Hamming-checked expansion over a hash-sampled core, one star edge
    per unsampled member to the core hub, ``overflow`` audit column."""
    from ..config import lsh_bucket_cap

    if not 0 <= max_hamming < 64:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    if max_bucket_members is None:
        max_bucket_members = lsh_bucket_cap()
    cap = max_bucket_members if max_bucket_members > 0 else None
    n_bands = max_hamming + 1
    # contiguous bit ranges covering all 64 bits (first bands get the
    # extra bits when 64 % n_bands != 0)
    base, extra = divmod(64, n_bands)
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    starts = [sum(widths[:i]) for i in range(n_bands)]

    hashed = ds.map_batches(
        add_simhash, fn_kwargs={"text_col": text_col}, batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns([key_col, "simhash"])

    def explode(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        sigs = batch["simhash"].to_pylist()
        ob, ok2, osig, okey = [], [], [], []
        for key, sig in zip(keys, sigs):
            u = sig + (1 << 63)
            for band in range(n_bands):
                v = (u >> starts[band]) & ((1 << widths[band]) - 1)
                if v >= (1 << 63):  # 64-bit band (max_hamming=0) -> fold to int64
                    v -= 1 << 64
                ob.append(band)
                ok2.append(v)
                osig.append(sig)
                okey.append(key)
        return pa.table(
            {
                "band_id": pa.array(ob, pa.int32()),
                "band_key": pa.array(ok2, pa.int64()),
                "simhash": pa.array(osig, pa.int64()),
                key_col: pa.array(okey, pa.int64()),
            }
        )

    bands = hashed.map_batches(explode, batch_format="pyarrow")

    # ONE shuffle (same design as minhash_lsh_candidates): groupby with
    # a list-collect of (key, simhash) tuples, then in-batch pair
    # expansion with the Hamming check.  Singleton buckets — the
    # overwhelming majority — cost one cheap accumulate each; no
    # count-prefilter pass, no broadcast hot set, no per-group pandas.
    from ray.data.aggregate import AggregateFn

    collect_members = AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: a + b,
        accumulate_block=lambda acc, blk: acc + list(
            zip(blk.column(key_col).to_pylist(),
                blk.column("simhash").to_pylist())
        ),
        name="members",
    )
    buckets = bands.groupby(["band_id", "band_key"]).aggregate(collect_members)

    def expand_pairs(batch: pa.Table) -> pa.Table:
        a, b, d, o = [], [], [], []
        salts = batch["band_key"].to_pylist()

        def emit(ra, rb, overflow):
            ham = bin((ra[1] ^ rb[1]) & ((1 << 64) - 1)).count("1")
            if ham <= max_hamming:
                lo, hi = (ra, rb) if ra[0] < rb[0] else (rb, ra)
                a.append(lo[0])
                b.append(hi[0])
                d.append(ham)
                o.append(overflow)

        for members, salt in zip(batch["members"].to_pylist(), salts):
            rows = sorted({(int(k), int(s)) for k, s in members})
            if len(rows) < 2:
                continue
            overflow = cap is not None and len(rows) > cap
            if overflow:
                keys = [r[0] for r in rows]
                core_keys = set(_sample_members(keys, cap, int(salt)))
                core = [r for r in rows if r[0] in core_keys]
                hub = core[0]
                for r in rows:
                    if r[0] not in core_keys:
                        emit(hub, r, True)
            else:
                core = rows
            for i in range(len(core) - 1):
                for j in range(i + 1, len(core)):
                    emit(core[i], core[j], overflow)
        df = pd.DataFrame({"key_a": pd.array(a, dtype="int64"),
                           "key_b": pd.array(b, dtype="int64"),
                           "hamming": pd.array(d, dtype="int64"),
                           "overflow": pd.array(o, dtype="bool")})
        df = df.sort_values("overflow", kind="stable").drop_duplicates(
            ["key_a", "key_b", "hamming"], keep="first")
        return pa.Table.from_pandas(df, preserve_index=False)

    return buckets.map_batches(expand_pairs, batch_format="pyarrow",
                               zero_copy_batch=True)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verification operator)
# ---------------------------------------------------------------------------


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard similarity of two texts."""
    sa = set(map(tuple, _ngrams(text_a.split(), n)))
    sb = set(map(tuple, _ngrams(text_b.split(), n)))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _ngrams(tokens: list[str], n: int):
    if len(tokens) < n:
        return [tuple(tokens)] if tokens else []
    return [tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def verify_pairs_jaccard(pairs: pd.DataFrame, texts_by_key: dict[int, str],
                         n: int = 3, threshold: float = 0.5) -> pd.DataFrame:
    """Exact-Jaccard verification of candidate pairs (broadcast lookup)."""
    out = []
    for ka, kb in zip(pairs["key_a"], pairs["key_b"]):
        j = ngram_jaccard(texts_by_key.get(int(ka), ""), texts_by_key.get(int(kb), ""), n)
        if j >= threshold:
            out.append((int(ka), int(kb), j))
    return pd.DataFrame(out, columns=["key_a", "key_b", "jaccard"])
