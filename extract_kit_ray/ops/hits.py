"""Distributed HITS (hubs & authorities, Kleinberg 1999) over a link
graph — PageRank's companion iterative graph algorithm, expressed in
the same Ray Data shape as ops/pagerank.py: per half-step ONE narrow
join (scores onto edges) plus ONE groupby-sum, with the edge table
materialized once and reused.

Integer determinism contract (the ops/pagerank.py family rule): scores
live in micro-units (int64) and each half-step L1-normalizes with
integer floor division —

    auth_raw(v) = SUM over edges (u,v) of hub(u)
    auth(v)     = auth_raw(v) * MICRO // SUM(auth_raw)      (then the
    symmetric hub half-step against the fresh auth scores).

L1 (sum) normalization instead of the textbook L2: the L2 norm needs a
square root, which drags the whole iteration into floats and makes
cross-engine summation order observable; L1 keeps every operand
integral, so numpy and the chained-CTE DuckDB oracle agree
bit-for-bit.  Ranking order under L1 equals ranking order under L2
within an iteration (both are positive scalings of the same raw sums);
across iterations the trajectories differ from textbook HITS the same
way any fixed-point rescaling does — documented, deterministic, and
convergent to the same principal directions for connected graphs.

Integer headroom: after normalization scores sum to <= MICRO + n
(floor loss), so raw sums are <= ~(MICRO + n) * max_degree and the
``raw * MICRO`` product stays inside int64 while total graph mass is
below ~9.2e12 micro-units — the per-batch guard fails loudly (like the
oracle's HUGEINT-vs-BIGINT cast) rather than wrapping.

Scale shape: score tables are two int64 columns; the only all-to-all
per half-step is the (src|dst)-keyed aggregate; the L1 total is ONE
bounded scalar collect per half-step (same honest price as
redistribute_dangling in pagerank).  Non-negative node ids; -1 is the
rayfix schema-seed sentinel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MICRO = 1_000_000

from .rayfix import seed_int64 as _seed  # noqa: E402  (schema-seed guard)


def _half_step(edges_ds, nodes, scores, *, score_col: str, from_col: str,
               to_col: str, num_partitions: int):
    """One HITS half-step: fan ``scores`` (node, score) across edges
    from ``from_col``, sum into ``to_col`` nodes, L1-normalize to MICRO
    total.  Returns the new (node, score) Dataset (seeded)."""
    from ray.data.aggregate import Sum

    fanned = edges_ds.join(
        scores, join_type="inner", num_partitions=num_partitions,
        on=(from_col,), right_on=("node",),
    )
    raw = _seed(
        fanned.groupby(to_col).aggregate(Sum(score_col, alias_name="r")),
        **{to_col: -1, "r": 0},
    ).materialize()  # reused: once for the L1 total, once for the join
    total = int(raw.filter(expr=f"{to_col} >= 0").sum("r") or 0)
    if total <= 0:
        raise ValueError(
            "hits_int: zero total mass in a half-step (edge set empty or "
            "disconnected from the score support) — HITS is undefined here")

    def norm(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        r = pc.fill_null(pc.cast(b["r"], pa.int64()), 0).to_numpy()
        if r.size and int(r.max()) > (2**63 - 1) // MICRO:
            raise OverflowError(
                "hits_int: raw * MICRO would exceed int64 "
                f"(max raw {int(r.max())}); rescale MICRO for this graph")
        return pa.table({
            "node": b["node"],
            score_col: pa.array(r * MICRO // total, pa.int64()),
        })

    return _seed(
        nodes.join(raw, join_type="left_outer",
                   num_partitions=num_partitions,
                   on=("node",), right_on=(to_col,))
        .map_batches(norm, batch_format="pyarrow", zero_copy_batch=True),
        node=-1, **{score_col: 0},
    )


def hits_int(edges_ds, *, n_iters: int = 2,
             num_partitions: int | None = None):
    """(src, dst) int64 edge Dataset -> (node, auth_micro, hub_micro)
    Dataset after ``n_iters`` integer-exact HITS iterations from a
    uniform hub start of MICRO per node."""
    from ray.data.aggregate import Count

    from ..config import resolve_num_partitions

    num_partitions = resolve_num_partitions(num_partitions)

    def col_as(b: pa.Table, src: str, out: str) -> pa.Table:
        return pa.table({out: b[src]})

    nodes = _seed(
        edges_ds.map_batches(lambda b: col_as(b, "src", "node"),
                             batch_format="pyarrow", zero_copy_batch=True)
        .union(edges_ds.map_batches(lambda b: col_as(b, "dst", "node"),
                                    batch_format="pyarrow",
                                    zero_copy_batch=True))
        .groupby("node").aggregate(Count(alias_name="_n"))
        .select_columns(["node"]),
        node=-1,
    ).materialize()
    edges_ds = edges_ds.materialize()  # reused every half-step

    hub = nodes.map_batches(
        lambda b: b.append_column(
            "hub_micro", pa.array(np.full(b.num_rows, MICRO, dtype=np.int64))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    hub = _seed(hub, node=-1, hub_micro=MICRO)
    auth = None
    for _ in range(n_iters):
        auth = _half_step(edges_ds, nodes, hub.select_columns(
            ["node", "hub_micro"]).rename_columns(["node", "s"]),
            score_col="s", from_col="src", to_col="dst",
            num_partitions=num_partitions).rename_columns(
            ["node", "auth_micro"])
        hub = _half_step(edges_ds, nodes, auth.select_columns(
            ["node", "auth_micro"]).rename_columns(["node", "s"]),
            score_col="s", from_col="dst", to_col="src",
            num_partitions=num_partitions).rename_columns(
            ["node", "hub_micro"])

    out = auth.join(hub, join_type="inner", num_partitions=num_partitions,
                    on=("node",))
    return out.filter(expr="node >= 0").select_columns(
        ["node", "auth_micro", "hub_micro"])


def oracle_hits_sql(edges_sql: str, *, n_iters: int = 2) -> str:
    """Chained-CTE DuckDB mirror of :func:`hits_int` — two CTE triples
    (raw sum, L1 total, normalize) per iteration, identical integer
    arithmetic (sums promote to HUGEINT in DuckDB, stay exact, and the
    final CAST to BIGINT matches the engine's int64)."""
    ctes = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM edges UNION "
        "SELECT dst AS node FROM edges)",
        f"h0 AS (SELECT node, CAST({MICRO} AS BIGINT) AS s FROM nodes)",
    ]
    for i in range(1, n_iters + 1):
        prev_h = f"h{i - 1}"
        ctes.append(
            f"ar{i} AS (SELECT e.dst AS node, SUM(p.s) AS r "
            f"FROM edges e JOIN {prev_h} p ON p.node = e.src GROUP BY e.dst)")
        ctes.append(
            f"a{i} AS (SELECT n.node, CAST(COALESCE(r.r, 0) * {MICRO} "
            f"// (SELECT SUM(r) FROM ar{i}) AS BIGINT) AS s "
            f"FROM nodes n LEFT JOIN ar{i} r ON r.node = n.node)")
        ctes.append(
            f"hr{i} AS (SELECT e.src AS node, SUM(a.s) AS r "
            f"FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY e.src)")
        ctes.append(
            f"h{i} AS (SELECT n.node, CAST(COALESCE(r.r, 0) * {MICRO} "
            f"// (SELECT SUM(r) FROM hr{i}) AS BIGINT) AS s "
            f"FROM nodes n LEFT JOIN hr{i} r ON r.node = n.node)")
    return ("WITH " + ", ".join(ctes)
            + f" SELECT a.node, a.s AS auth_micro, h.s AS hub_micro "
              f"FROM a{n_iters} a JOIN h{n_iters} h ON h.node = a.node")
