"""Cross-snapshot corpus diff — classify every page key across two
crawl snapshots as ``new`` / ``deleted`` / ``changed`` / ``same``, the
bookkeeping pass behind incremental re-extraction (only ``new`` +
``changed`` keys re-enter the expensive pipeline; see
ops/incremental.py for the hash-index sibling that handles
content-dup NEW docs).

Scale shape — a FULL OUTER JOIN expressed as ONE groupby, because the
per-key state is four int64s:

1. each side maps to narrow tagged rows
   ``(key, is_old, is_new, h1_old, h2_old, h1_new, h2_new)`` with the
   128-bit blake2b content hash (ops/dedup.add_text_hash) in its
   side's slots and ``INT64_MIN`` sentinels in the other side's —
   text never leaves the map stage;
2. ``union`` + ``groupby(key)`` with Sum/Max aggregates merges the
   sides — the one corpus-keyed shuffle, two int64-quads per key;
3. a vectorized decode emits the status.

Contract: keys are unique WITHIN each snapshot (crawl snapshots are
keyed by url; run ops/keepbest first if not).  Equal 128-bit hashes
are treated as equal text — the collision math is documented at
functions/hashing.hash128_signed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SENT = np.iinfo(np.int64).min


def snapshot_diff(old_ds, new_ds, *, key_col: str, text_col: str = "text"):
    """Two snapshot Datasets -> (key, status) Dataset, one row per key
    present in either snapshot."""
    from ray.data.aggregate import Max, Sum

    from .dedup import add_text_hash

    def tag(is_old: bool):
        def f(batch: pa.Table) -> pa.Table:
            hashed = add_text_hash(batch, text_col=text_col)
            n = batch.num_rows
            h1 = hashed["text_hash"].to_numpy()
            h2 = hashed["text_hash2"].to_numpy()
            sent = np.full(n, _SENT, dtype=np.int64)
            one = np.ones(n, dtype=np.int64)
            zero = np.zeros(n, dtype=np.int64)
            return pa.table({
                "key": batch[key_col],
                "is_old": pa.array(one if is_old else zero, pa.int64()),
                "is_new": pa.array(zero if is_old else one, pa.int64()),
                "h1_old": pa.array(h1 if is_old else sent, pa.int64()),
                "h2_old": pa.array(h2 if is_old else sent, pa.int64()),
                "h1_new": pa.array(sent if is_old else h1, pa.int64()),
                "h2_new": pa.array(sent if is_old else h2, pa.int64()),
            })
        return f

    tagged = (old_ds.map_batches(tag(True), batch_format="pyarrow",
                                 zero_copy_batch=True)
              .union(new_ds.map_batches(tag(False), batch_format="pyarrow",
                                        zero_copy_batch=True)))
    merged = tagged.groupby("key").aggregate(
        Sum("is_old", alias_name="n_old"),
        Sum("is_new", alias_name="n_new"),
        Max("h1_old", alias_name="h1_old"),
        Max("h2_old", alias_name="h2_old"),
        Max("h1_new", alias_name="h1_new"),
        Max("h2_new", alias_name="h2_new"),
    )

    def decode(batch: pa.Table) -> pa.Table:
        n_old = batch["n_old"].to_numpy()
        n_new = batch["n_new"].to_numpy()
        same = ((batch["h1_old"].to_numpy() == batch["h1_new"].to_numpy())
                & (batch["h2_old"].to_numpy() == batch["h2_new"].to_numpy()))
        status = np.where(
            n_old == 0, "new",
            np.where(n_new == 0, "deleted",
                     np.where(same, "same", "changed")))
        return pa.table({"key": batch["key"],
                         "status": pa.array(status, pa.string())})

    return merged.map_batches(decode, batch_format="pyarrow",
                              zero_copy_batch=True)


def oracle_snapshot_diff_sql(old_sql: str, new_sql: str, *,
                             key_col: str, text_col: str = "text") -> str:
    """DuckDB FULL OUTER JOIN mirror of :func:`snapshot_diff` (text
    equality instead of hash equality — identical by the collision
    contract)."""
    return f"""
WITH o AS ({old_sql}), n AS ({new_sql})
SELECT COALESCE(o.{key_col}, n.{key_col}) AS key,
       CASE WHEN o.{key_col} IS NULL THEN 'new'
            WHEN n.{key_col} IS NULL THEN 'deleted'
            WHEN o.{text_col} = n.{text_col} THEN 'same'
            ELSE 'changed' END AS status
FROM o FULL OUTER JOIN n ON o.{key_col} = n.{key_col}
"""
