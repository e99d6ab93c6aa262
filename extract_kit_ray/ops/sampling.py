"""Deterministic sampling operators for training-data curation:
stratified per-group samples and corpus fractions, reproducible across
runs/nodes and SQL-mirrorable.

Randomness is a fixed Knuth multiplicative hash of the key column —
``h(key) = (key * 2654435761) mod 2^32`` — so the "random" order is (a)
deterministic (resumable pipelines re-select the identical sample), (b)
exactly expressible in DuckDB integer arithmetic (the oracle reproduces
the full selection, not just its size), and (c) injective for keys
below 2^32 (odd multiplier), so no ties beyond the key tiebreaker.

Scale shape (ray_guide.md "Aggregation at scale"): a per-batch partial
top-n keeps at most ``n_per_group`` rows per group per batch, so the
``groupby(group)`` shuffle moves O(n_batches x groups x n) rows — never
the corpus; the final per-group head is exact because the global top-n
is a subset of the union of per-batch top-ns (min-monotone selection).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SAMPLE_HASH_MULT = 2654435761  # Knuth multiplicative hash constant
SAMPLE_HASH_MOD = 1 << 32


def sample_hash(keys: np.ndarray) -> np.ndarray:
    """(n,) uint64 deterministic sample order for int64 keys."""
    with np.errstate(over="ignore"):
        return (keys.astype(np.uint64) * np.uint64(SAMPLE_HASH_MULT)) % np.uint64(SAMPLE_HASH_MOD)


def sample_hash_sql(key_col: str) -> str:
    """The DuckDB expression computing exactly :func:`sample_hash` over
    the FULL int64 key domain.  numpy's path is ``uint64(key) * M mod
    2^32``; since 2^32 divides 2^64, that equals ``((key mod 2^32) * M)
    mod 2^32`` with mathematical (non-negative) mod — so the SQL first
    masks the key to a non-negative sub-2^32 value (double-% because
    DuckDB's % keeps the dividend's sign), then multiplies in HUGEINT
    (the product can reach ~1.8e19, past BIGINT's 2^63-1 — a plain
    BIGINT multiply raised an overflow error for large keys and
    diverged for negative ones, round-3 ADVICE)."""
    masked = (f"((({key_col} % {SAMPLE_HASH_MOD}) + {SAMPLE_HASH_MOD}) "
              f"% {SAMPLE_HASH_MOD})")
    return (f"((CAST({masked} AS HUGEINT) * {SAMPLE_HASH_MULT}) "
            f"% {SAMPLE_HASH_MOD})")


def stratified_sample(ds, *, group_col: str, key_col: str, n_per_group: int):
    """Keep the ``n_per_group`` hash-smallest rows of every group —
    a reproducible stratified sample (e.g. N docs per language for an
    eval set).  Returns a Dataset with the input columns."""
    if n_per_group < 1:
        raise ValueError(f"n_per_group must be >= 1, got {n_per_group}")

    def partial_topn(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["__h"] = sample_hash(df[key_col].to_numpy(np.int64))
        df = df.sort_values(["__h", key_col], kind="mergesort")
        out = df.groupby(group_col, sort=False).head(n_per_group)
        return pa.Table.from_pandas(out, preserve_index=False)

    def final_topn(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["__h", key_col], kind="mergesort").head(n_per_group)
        return g.drop(columns=["__h"])

    partials = ds.map_batches(partial_topn, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.groupby(group_col).map_groups(final_topn,
                                                  batch_format="pandas")


def _group_key_type(ds, group_col: str) -> "pa.DataType":
    """Arrow type of a (materialized, non-empty) dataset's group key —
    robust to pandas-block schemas, where Ray's ``schema()`` has no
    ``field()``: fall back to inferring from one row's value."""
    sch = ds.schema()
    try:
        return sch.base_schema.field(group_col).type
    except AttributeError:
        return pa.array([ds.take(1)[0][group_col]]).type


def quota_balanced_sample(ds, *, group_col: str, key_col: str,
                          weight_col: str, target_per_group: int,
                          broadcast_max: int | None = None,
                          num_partitions: int | None = None):
    """Domain-mixture rebalancing (the Pile/Dolma recipe): cap every
    group's expected total ``weight_col`` at ``target_per_group`` by
    deterministic down-sampling; groups already under the quota keep
    everything.

    Per group g with total weight W_g the keep cut is
    ``cut_g = 2^32            if W_g <= target``
    ``cut_g = target * 2^32 // W_g   otherwise``  (integer floor), and
    a row survives iff ``sample_hash(key) < cut_g`` — so the kept
    rows' expected weight is ~target, selection is reproducible
    across runs/nodes, and the oracle replays it exactly (HUGEINT for
    the 2^32-scaled product).

    Scale shape: ONE narrow groupby(group).sum(weight) (map-side
    combined by Ray's aggregate) produces the per-group totals —
    bounded by the number of domains; under
    ``config.broadcast_max_rows`` the cut map broadcasts into a
    streaming filter (no second shuffle), above it the cut table joins
    on the group key (the only shuffle that touches data rows)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..config import broadcast_max_rows, resolve_num_partitions

    if target_per_group < 0:
        raise ValueError("target_per_group must be >= 0")
    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)

    totals = (ds.select_columns([group_col, weight_col])
              .groupby(group_col)
              .aggregate(Sum(weight_col, alias_name="wg"))
              .materialize())  # bounded by distinct domains
    n_groups = totals.count()

    def cut_of(wg: int) -> int:
        if wg <= target_per_group:
            return SAMPLE_HASH_MOD
        return (target_per_group * SAMPLE_HASH_MOD) // wg

    if n_groups <= broadcast_max:
        rows = totals.take_all()
        group_keys = pa.array([r[group_col] for r in rows])
        cut_vec = np.array([cut_of(int(r["wg"])) for r in rows],
                           dtype=np.uint64)

        def keep(batch: pa.Table) -> pa.Table:
            h = sample_hash(batch[key_col].to_numpy())
            # vectorized group -> cut: one index_in hash probe + gather
            # (every group is in the totals by construction)
            gi = pc.index_in(batch[group_col], value_set=group_keys)
            cut = cut_vec[gi.to_numpy(zero_copy_only=False).astype(np.int64)]
            return batch.filter(pa.array(h < cut))

        return ds.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)

    # join fallback: cut table rides the group key; rows ship once
    from .rayfix import seed_join_side

    def to_cuts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cut_group": batch[group_col],
            "cut": pa.array([cut_of(int(w)) for w in
                             batch["wg"].to_pylist()], pa.int64()),
        })

    # sentinel group key is NULL: nulls never match in Acero joins, so
    # the seed row fixes the schema broadcast without being matchable,
    # for string AND integer group keys alike
    gtype = _group_key_type(totals, group_col)
    cut_side = seed_join_side(
        totals.map_batches(to_cuts, batch_format="pyarrow",
                           zero_copy_batch=True),
        pa.table({"cut_group": pa.array([None], gtype),
                  "cut": pa.array([None], pa.int64())}))
    joined = ds.join(cut_side, join_type="inner",
                     num_partitions=num_partitions,
                     on=(group_col,), right_on=("cut_group",))

    def keep_joined(batch: pa.Table) -> pa.Table:
        # every real group has a cut row; a null cut (sentinel match)
        # fills to 0 -> h < 0 never holds -> filtered
        cut = pc.fill_null(batch["cut"], 0).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        h = sample_hash(batch[key_col].to_numpy())
        return batch.filter(pa.array(h < cut)).drop_columns(["cut"])

    return joined.map_batches(keep_joined, batch_format="pyarrow",
                              zero_copy_batch=True)


def top_pct_per_group(ds, *, group_col: str, key_col: str, order_col: str,
                      pct: int, descending: bool = True,
                      broadcast_max: int | None = None,
                      num_partitions: int | None = None):
    """Group-relative selection: keep each group's top ``pct`` percent
    of rows by ``order_col`` (ties broken by ``key_col`` ascending) —
    "top 20% by quality PER DOMAIN", the group-fair alternative to one
    global threshold that would let big domains crowd out small ones.

    Integer-exact head size ``k_g = (n_g * pct + 99) // 100`` (ceil,
    no float), so the SQL row_number() oracle matches bit-for-bit.

    Scale shape: one narrow ``groupby(group).count()`` for the group
    sizes, then the proven partial-top-n trick (ops/sampling.
    stratified_sample): every batch keeps at most k_g rows per group
    BEFORE the shuffle — exact because the global top-k is a subset of
    the union of per-batch top-ks under a monotone total order.  Under
    ``config.broadcast_max_rows`` the k-map broadcasts; above it, k_g
    rides every row through one narrow join."""
    from ray.data.aggregate import Count

    from ..config import broadcast_max_rows, resolve_num_partitions

    if not 1 <= pct <= 100:
        raise ValueError(f"pct must be in [1, 100], got {pct}")
    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()
    num_partitions = resolve_num_partitions(num_partitions)
    asc = [not descending, True]

    counts = (ds.select_columns([group_col])
              .groupby(group_col).aggregate(Count(alias_name="n"))
              .materialize())  # bounded by distinct groups
    n_groups = counts.count()

    def head_per_group(df: pd.DataFrame, kvec) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values([order_col, key_col], ascending=asc,
                            kind="mergesort")
        rn = df.groupby(group_col, sort=False).cumcount()
        return df[rn.to_numpy() < kvec(df)]

    if n_groups <= broadcast_max:
        kmap = {r[group_col]: (int(r["n"]) * pct + 99) // 100
                for r in counts.take_all()}

        def kvec(df):
            return df[group_col].map(kmap).to_numpy()

        fold = lambda df: head_per_group(df, kvec)  # noqa: E731
        partial = ds.map_batches(fold, batch_format="pandas")
        return partial.groupby(group_col).map_groups(
            fold, batch_format="pandas")

    # join fallback: k rides every row (one narrow join), folds read it
    from .rayfix import seed_join_side

    def to_k(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"k_group": batch[group_col],
                         "__k": pa.array((n * pct + 99) // 100, pa.int64())})

    # null sentinel key: schema-fixes the join side without ever
    # matching (works for string and integer group keys)
    gtype = _group_key_type(counts, group_col)
    k_side = seed_join_side(
        counts.map_batches(to_k, batch_format="pyarrow",
                           zero_copy_batch=True),
        pa.table({"k_group": pa.array([None], gtype),
                  "__k": pa.array([0], pa.int64())}))
    joined = ds.join(k_side, join_type="inner",
                     num_partitions=num_partitions,
                     on=(group_col,), right_on=("k_group",))

    def kvec_joined(df):
        return df["__k"].to_numpy()

    fold_j = lambda df: head_per_group(df, kvec_joined)  # noqa: E731
    partial = joined.map_batches(fold_j, batch_format="pandas")
    return (partial.groupby(group_col)
            .map_groups(fold_j, batch_format="pandas")
            .drop_columns(["__k"]))


def top_n_per_group(ds, *, group_col: str, order_cols: list[str], n: int,
                    descending: list[bool] | bool = True,
                    num_buckets: int | None = None):
    """Exact top-``n`` rows per group under a TOTAL order (make
    ``order_cols`` end in a unique tiebreaker) — the fixed-n sibling of
    :func:`top_pct_per_group` and the k>1 generalization of
    ops/keepbest.  Same two-level shape: per-batch partial head(n) per
    group bounds the shuffle (global top-n is a subset of the union of
    per-batch top-ns), then hash-bucketed groups fold vectorized —
    never one task per group."""
    from ..config import resolve_num_partitions
    from ..functions.hashing import hash128_batch_signed

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if isinstance(descending, bool):
        descending = [descending] * len(order_cols)
    if len(descending) != len(order_cols):
        raise ValueError("descending must match order_cols")
    asc = [not d for d in descending]
    num_buckets = resolve_num_partitions(num_buckets)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values(list(order_cols), ascending=asc,
                            kind="mergesort")
        return df.groupby(group_col, sort=False).head(n)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__bucket"] = pd.Series([], dtype=np.int64)
            return df
        keys = df[group_col]
        if keys.dtype == object or str(keys.dtype).startswith("string"):
            h1, _h2 = hash128_batch_signed(keys.tolist())
            b = h1.view(np.uint64) % np.uint64(num_buckets)
        else:
            b = keys.to_numpy().astype(np.uint64) % np.uint64(num_buckets)
        df["__bucket"] = b.astype(np.int64)
        return df

    partial = ds.map_batches(fold, batch_format="pandas")
    return (partial.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(fold, batch_format="pandas")
            .drop_columns(["__bucket"]))


def hash_split(ds, *, key_col: str, weights: dict[str, int],
               denom: int = 1000):
    """Deterministic train/val/test assignment: bucket =
    ``sample_hash(key) % denom``; consecutive weight ranges (in
    insertion order of ``weights``, which must sum to ``denom``) map
    buckets to split names.  Hash-based (not positional), so the split
    is stable under re-partitioning, resumes, and corpus appends — the
    property a training/eval split must have that ``ds.split()`` lacks.
    One streaming ``add_column`` pass, no shuffle; the SQL mirror is a
    CASE over :func:`sample_hash_sql` (exact, full int64 key domain)."""
    if sum(weights.values()) != denom:
        raise ValueError(f"weights must sum to denom={denom}, got "
                         f"{sum(weights.values())}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    names = list(weights)
    bounds = np.cumsum([weights[n] for n in names]).astype(np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        h = sample_hash(batch[key_col].to_numpy()) % np.uint64(denom)
        idx = np.searchsorted(bounds, h.astype(np.int64), side="right")
        return batch.append_column(
            "split", pa.array(np.array(names, dtype=object)[idx]))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def hash_split_sql(key_col: str, weights: dict[str, int],
                   denom: int = 1000) -> str:
    """The DuckDB CASE expression replaying :func:`hash_split` exactly."""
    bucket = f"({sample_hash_sql(key_col)} % {denom})"
    arms, lo = [], 0
    names = list(weights)
    for n in names[:-1]:
        lo += weights[n]
        arms.append((lo, n))
    cases = " ".join(f"WHEN {bucket} < {b} THEN '{n}'" for b, n in arms)
    return f"CASE {cases} ELSE '{names[-1]}' END"


def sample_fraction(ds, *, key_col: str, fraction: float):
    """Keep rows whose sample hash falls under ``fraction`` of the hash
    space — a deterministic Bernoulli-style corpus sample (no shuffle,
    one streaming filter; exact-in-expectation rate, exactly
    reproducible and SQL-mirrorable)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(fraction * SAMPLE_HASH_MOD)

    def keep(batch: pa.Table) -> pa.Table:
        h = sample_hash(batch[key_col].to_numpy())
        return batch.filter(pa.array(h < cut))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(ds, *, key_col: str, weight_col: str, n: int):
    """Global weight-biased top-``n`` sample: keep the rows with the
    smallest ``priority = sample_hash(key) * 1_000_000 // weight`` —
    heavier rows draw proportionally smaller priorities, the
    deterministic integer analog of the A-ES weighted-reservoir trick
    (Efraimidis & Spirakis 2006 use ``u^(1/w)``; the monotone
    ``h // w`` variant keeps the whole pipeline in exact int64:
    ``hash < 2^32`` so ``hash * 1e6`` tops out near 4.3e15).  Weights
    must be >= 1 (validated per batch — fail loudly, house style).

    Scale shape: per-batch partial top-n (global winners are a subset
    of the union of per-batch winners), then ONE constant-key fold
    over <= n * n_batches rows.  Ties are impossible given unique
    keys: (priority, key) is a total order, mirrored by the oracle's
    ``row_number() OVER (ORDER BY priority, key)``.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def with_priority(df: pd.DataFrame) -> pd.DataFrame:
        w = df[weight_col].to_numpy()
        if len(w) and int(w.min()) < 1:
            raise ValueError(
                f"weighted_sample: {weight_col} has values < 1")
        df = df.copy()
        df["priority"] = (
            sample_hash(df[key_col].to_numpy()).astype(np.int64)
            * np.int64(1_000_000) // w.astype(np.int64))
        return df.sort_values(["priority", key_col]).head(n)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["priority", key_col]).head(n)
                .drop(columns=["__all"]))

    def const_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__all"] = np.zeros(len(df), dtype=np.int64)
        return df

    return (ds.map_batches(with_priority, batch_format="pandas")
            .map_batches(const_key, batch_format="pandas")
            .groupby("__all")
            .map_groups(fold, batch_format="pandas"))


def weighted_sample_sql(rows_sql: str, *, key_col: str, weight_col: str,
                        n: int, select: str = "*") -> str:
    """DuckDB mirror of :func:`weighted_sample`."""
    prio = (f"CAST({sample_hash_sql(key_col)} * 1000000 "
            f"// {weight_col} AS BIGINT)")
    return (f"SELECT * EXCLUDE (__rn) FROM (SELECT {select}, "
            f"{prio} AS priority, "
            f"row_number() OVER (ORDER BY {prio}, {key_col}) AS __rn "
            f"FROM ({rows_sql})) WHERE __rn <= {n}")
