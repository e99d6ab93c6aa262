"""Order-invariant corpus checksum — ONE number that certifies "these
two corpora hold exactly the same rows", regardless of row order,
partitioning or engine: the migration/replication validation primitive
(did the 100 TB copy lose a shard? did the rewrite change any row?).

Construction: each row hashes to a 60-bit integer (md5 over the
':'-joined column values — md5 because BOTH sides can compute it:
hashlib here, DuckDB's ``md5()`` in the oracle); the checksum is the
SUM of row hashes mod the Mersenne prime 2^61-1.  Addition is
commutative and associative, so ANY execution order / merge tree gives
the same value — which is also exactly why it certifies multisets:
a dropped row, a duplicated row or a mutated row each shift the sum.
(An adversary could forge collisions — this is an integrity check for
honest mistakes, not an authenticator.)

Scale shape: constant-size accumulator ``(n_rows, sum mod p)`` via a
block-accumulate + tree-merge AggregateFn (the ops/sketches.py
Misra-Gries pattern) — one streaming pass, nothing shuffles, the
driver receives two integers.  The per-row md5 loop is the inherent
per-row C call (same convention as the blake2b key loops in
ops/dedup.py); Python-int modular sums avoid int64 overflow that a
naive numpy sum of 2^60-scale values hits within one batch.

Column contract: int64 and string columns only — both sides must
render values identically (``str(int)`` == ``CAST(x AS VARCHAR)``);
the ':' join is NOT ambiguity-proof ("a:b"+"c" vs "a"+"b:c") — fine
for a checksum, do not use it as a row key.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

CHECKSUM_PRIME = (1 << 61) - 1


def _row_hashes(tbl: pa.Table, cols: list[str]):
    rendered = []
    for c in cols:
        col = tbl[c]
        if pa.types.is_integer(col.type):
            rendered.append([str(v) for v in col.to_pylist()])
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            rendered.append(col.to_pylist())
        else:
            raise TypeError(f"corpus_checksum: column {c} has "
                            f"unsupported type {col.type} (int64/string only)")
    for parts in zip(*rendered):
        yield int(hashlib.md5(
            ":".join(parts).encode("utf-8")).hexdigest()[:15], 16)


def corpus_checksum(ds, *, cols: list[str]) -> pa.Table:
    """Dataset -> one row ``(n_rows, checksum)``; equal outputs <=>
    equal row multisets over ``cols`` (mod md5 collisions)."""
    from ray.data.aggregate import AggregateFn

    def accumulate(acc, blk):
        tbl = (blk if isinstance(blk, pa.Table)
               else pa.Table.from_pandas(blk, preserve_index=False))
        n, s = acc
        for h in _row_hashes(tbl, cols):
            s = (s + h) % CHECKSUM_PRIME
        return (n + tbl.num_rows, s)

    agg = AggregateFn(
        init=lambda k: (0, 0),
        merge=lambda a, b: (a[0] + b[0], (a[1] + b[1]) % CHECKSUM_PRIME),
        accumulate_block=accumulate,
        name="chk",
    )
    out = ds.aggregate(agg)
    # Ray returns no accumulator at all for an empty dataset
    n, s = (0, 0) if not out or out.get("chk") is None else out["chk"]
    return pa.table({"n_rows": pa.array([n], pa.int64()),
                     "checksum": pa.array([s], pa.int64())})


def oracle_checksum_sql(rows_sql: str, *, cols: list[str]) -> str:
    """DuckDB mirror: same md5-prefix row hash, same modular sum.
    ``SUM(BIGINT)`` accumulates in HUGEINT (no overflow up to ~2^66
    rows), then reduces mod the same prime."""
    rendered = " || ':' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    h = f"CAST(('0x' || substr(md5({rendered}), 1, 15)) AS BIGINT)"
    return (f"SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(COALESCE(SUM({h}), 0) % {CHECKSUM_PRIME} AS BIGINT) "
            f"AS checksum FROM ({rows_sql})")
