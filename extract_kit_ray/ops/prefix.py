"""Distributed prefix scan + budget selection over a sorted Dataset.

The training-data use case: "take the best documents until the token
budget is spent" — a global ORDER BY + cumulative SUM + cutoff, the
one shape the Dataset API genuinely cannot express (a prefix scan is
a sequential dependency across blocks).  This is the sanctioned
raw-Ray escape hatch: the *data* never leaves the Dataset plane; only
ONE int64 per block crosses the driver.

Scale shape (the reason this survives 100 TB):

1. ``ds.sort(...)`` — Ray Data's range-partitioned sort, the one
   unavoidable all-to-all.  Sort keys must end in a unique column so
   the order (and therefore the cumulative sum) is total and
   reproducible — the SQL window oracle requires it.
2. per-block partial sums — one tiny ``@ray.remote`` task per block
   returns a single int64; at 128 MB blocks and 100 TB input the
   driver holds ~800k ints (~6 MB).  The blocks themselves stay in
   the object store (``to_arrow_refs`` hands out refs, not bytes).
3. driver exclusive-scan over the per-block sums (numpy cumsum on a
   vector of block count length).
4. per-block cutoff tasks, **budget-pruned**: a block whose starting
   offset is already past the budget is never touched — on a
   99%-trimmed selection the tail blocks are skipped entirely, so the
   cut pass costs O(selected), not O(corpus).
5. ``from_arrow_refs`` re-enters the Dataset plane zero-copy for
   downstream streaming consumption.

The reference has no analog (its engine is per-document); this is an
engine extension for the corpus-curation role, same family as
:mod:`.packing` / :mod:`.sampling`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def budget_select(ds, *, value_col: str, budget: int,
                  sort_cols: list[str], descending: list[bool],
                  cum_col: str = "cum"):
    """Rows of ``ds`` in (total) ``sort_cols`` order whose running
    ``value_col`` sum stays within ``budget``, with the running sum
    appended as ``cum_col`` (int64) — exactly DuckDB's

    ``SUM(value) OVER (ORDER BY sort_cols...) AS cum ... QUALIFY cum <= budget``.

    ``sort_cols`` must end in a unique tiebreak column (doc key); with
    ties in the prefix the cumulative sum is order-dependent and no
    oracle can match it.  Values must be non-negative (a negative
    value would make the budget frontier non-monotone and void the
    block pruning); raises ValueError if a block sum turns out
    negative.  int64 throughout — the corpus-total sum must stay under
    2^63 (9.2e18; at ~1e3 tokens/doc that is 9e15 documents of
    headroom past the 10^12 target).
    """
    import ray

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")

    sorted_ds = ds.sort(sort_cols, descending=descending).materialize()
    refs = sorted_ds.to_arrow_refs()
    schema = sorted_ds.schema().base_schema
    out_schema = schema.append(pa.field(cum_col, pa.int64()))
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote(num_cpus=0.25)
    def block_sum(tbl: pa.Table) -> int:
        if tbl.num_rows == 0:
            return 0
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if (v < 0).any():
            raise ValueError(f"budget_select: negative {value_col} value")
        return int(v.sum())

    sums = np.asarray(ray.get([block_sum.remote(r) for r in refs]),
                      dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))

    @ray.remote(num_cpus=0.25)
    def cut(tbl: pa.Table, offset: int) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl.append_column(cum_col, pa.array([], pa.int64()))
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = offset + np.cumsum(v)
        keep = cum <= budget
        return tbl.append_column(cum_col, pa.array(cum, pa.int64())).filter(
            pa.array(keep))

    # budget pruning: blocks starting past the frontier never run
    out_refs = [cut.remote(r, int(o))
                for r, o in zip(refs, offsets) if o <= budget]
    if not out_refs:
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.from_arrow_refs(out_refs)
