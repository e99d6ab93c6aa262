"""Co-citation counting over a link graph — "how many pages link to
BOTH a and b", the classic link-based relatedness signal (Small 1973;
the SEO/web-graph variant of collaborative filtering's item-item
co-occurrence).  Sibling of ops/triangles.py: same narrow-int64
discipline, different wedge.

Semantics: over DISTINCT directed edges (src, dst), for every pair
a < b, ``n_common = |{s : s->a and s->b}|``; pairs below ``min_count``
are dropped (at web scale almost all pairs have count 1 — the filter
is the point).

Skew story: pairs are generated AT THE SOURCE — a source with
out-degree k fans out k(k-1)/2 wedges, so a directory hub with 10^5
out-links would emit 5e9 pairs.  ``max_out_degree`` caps every
source's fan-out to its k SMALLEST dst ids — deterministic and
order-independent, so the DuckDB oracle replays the cap exactly
(``row_number() OVER (PARTITION BY src ORDER BY dst) <= k``), unlike
a sampled cap.  Uncapped hubs fail loudly above
``hub_error_degree`` instead of silently exploding a task.

Scale shape: distinct-edges groupby -> hash(src)-bucketed fold (cap +
wedge expansion, vectorized as <= max-group-size shifted-array
passes — no per-source Python) -> (a, b) groupby count.  Three
shuffles, all over int64 pairs/triples.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def cocitation_counts(edges_ds, *, min_count: int = 1,
                      max_out_degree: int | None = None,
                      hub_error_degree: int = 10_000,
                      num_partitions: int | None = None):
    """(src, dst) int64 edge Dataset -> (a, b, n_common) Dataset over
    distinct edges, a < b, n_common >= min_count."""
    from ray.data.aggregate import Count

    from ..config import resolve_num_partitions

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_out_degree is not None and max_out_degree < 2:
        raise ValueError("max_out_degree must be >= 2")
    num_partitions = resolve_num_partitions(num_partitions)

    edges = (edges_ds.groupby(["src", "dst"])
             .aggregate(Count(alias_name="_n"))
             .select_columns(["src", "dst"]))

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["src"].to_numpy().astype(np.uint64)
             % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("__bucket", pa.array(b, pa.int64()))

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                              "b": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        df = df.sort_values(["src", "dst"], kind="mergesort")
        if max_out_degree is not None:
            df = df.groupby("src", sort=False).head(max_out_degree)
        s = df["src"].to_numpy()
        v = df["dst"].to_numpy()
        sizes = df.groupby("src", sort=False).size()
        kmax = int(sizes.max())
        if max_out_degree is None and kmax > hub_error_degree:
            raise ValueError(
                f"cocitation_counts: a source has out-degree {kmax} > "
                f"{hub_error_degree}; pass max_out_degree to cap hubs")
        parts_a, parts_b = [], []
        for d in range(1, kmax):
            m = s[:-d] == s[d:]
            parts_a.append(v[:-d][m])
            parts_b.append(v[d:][m])
        if not parts_a:
            return empty
        return pd.DataFrame({"a": np.concatenate(parts_a),
                             "b": np.concatenate(parts_b)})

    pairs = (edges.map_batches(add_bucket, batch_format="pyarrow",
                               zero_copy_batch=True)
             .groupby("__bucket")
             .map_groups(lambda df: wedges(df.drop(columns=["__bucket"])),
                         batch_format="pandas"))

    counts = pairs.groupby(["a", "b"]).aggregate(
        Count(alias_name="n_common"))
    if min_count > 1:
        counts = counts.map_batches(
            lambda b: b.filter(
                pa.array(b["n_common"].to_numpy() >= min_count)),
            batch_format="pyarrow", zero_copy_batch=True)
    return counts


def oracle_cocitation_sql(edges_sql: str, *, min_count: int = 1,
                          max_out_degree: int | None = None) -> str:
    """DuckDB mirror of :func:`cocitation_counts` (cap replayed via a
    dst-ordered row_number window)."""
    base = f"SELECT DISTINCT src, dst FROM ({edges_sql})"
    if max_out_degree is not None:
        base = (f"SELECT src, dst FROM (SELECT src, dst, row_number() "
                f"OVER (PARTITION BY src ORDER BY dst) AS rn "
                f"FROM ({base})) WHERE rn <= {max_out_degree}")
    having = f"HAVING COUNT(*) >= {min_count}" if min_count > 1 else ""
    return f"""
WITH e AS ({base})
SELECT e1.dst AS a, e2.dst AS b, CAST(COUNT(*) AS BIGINT) AS n_common
FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
GROUP BY 1, 2 {having}
"""


def reciprocal_links(edges_ds, *, num_partitions: int | None = None):
    """(src, dst) edge Dataset -> (a, b) pairs linked in BOTH
    directions (a < b) — mutual-link detection, the web-spam /
    link-farm signal (reciprocal linking rings) and the
    undirected-core extractor for the graph family above.

    Scale shape: edges canonicalize row-locally to (lo, hi, dir)
    flags (dir 1 = lo->hi, dir 2 = hi->lo), then ONE
    ``groupby(a, b)`` Max-folds each direction; a pair is mutual iff
    both Maxes are set.  Self-loops drop; duplicate edges collapse in
    the same groupby — a single corpus-keyed shuffle total.
    """
    from ray.data.aggregate import Max

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy().astype(np.int64)
        d = batch["dst"].to_numpy().astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        fwd = (s < d)
        return pa.table({
            "a": pa.array(lo, pa.int64()),
            "b": pa.array(hi, pa.int64()),
            "has_fwd": pa.array(fwd.astype(np.int64), pa.int64()),
            "has_rev": pa.array((~fwd).astype(np.int64), pa.int64()),
        })

    folded = (edges_ds.map_batches(canon, batch_format="pyarrow",
                                   zero_copy_batch=True)
              .groupby(["a", "b"])
              .aggregate(Max("has_fwd", alias_name="has_fwd"),
                         Max("has_rev", alias_name="has_rev")))

    def keep_mutual(batch: pa.Table) -> pa.Table:
        m = ((batch["has_fwd"].to_numpy() > 0)
             & (batch["has_rev"].to_numpy() > 0))
        return pa.table({"a": batch["a"].filter(pa.array(m)),
                         "b": batch["b"].filter(pa.array(m))})

    return folded.map_batches(keep_mutual, batch_format="pyarrow",
                              zero_copy_batch=True)


def oracle_reciprocal_sql(edges_sql: str) -> str:
    """DuckDB mirror of :func:`reciprocal_links`."""
    return f"""
WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src != dst)
SELECT e1.src AS a, e1.dst AS b
FROM e e1 JOIN e e2 ON e1.src = e2.dst AND e1.dst = e2.src
WHERE e1.src < e1.dst
"""
