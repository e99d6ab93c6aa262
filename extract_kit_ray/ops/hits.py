"""Distributed HITS (hubs & authorities, Kleinberg 1999) over a link
graph — PageRank's companion iterative graph algorithm, expressed in
the same Ray Data shape as ops/pagerank.py.

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

Scale shape, two-tier on NODE COUNT (the score table is node-sized):

* under :func:`config.broadcast_max_rows`, the score map ships by
  ``ray.put`` and each half-step is ONE vectorized map over the edge
  table plus ONE narrow (node, partial-sum) groupby whose result —
  bounded by the node count, i.e. by the threshold — is collected for
  the L1 total and the next broadcast.  No joins anywhere on this
  tier (Ray's hash-shuffle join pays per-partition aggregator startup
  on every call — 9 joins made this the slowest query in the round-5
  bench before the tier split).
* above it, the honest distributed path: per half-step one
  score-onto-edges join + one groupby-sum; zero-mass nodes are NOT
  re-attached between iterations (an inner fan treats a missing node
  exactly as score 0 — proved by the parity of the two tiers), only
  the FINAL table left-joins the full node set back with fill 0.

Non-negative node ids; -1 is the rayfix schema-seed sentinel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MICRO = 1_000_000

from .rayfix import seed_int64 as _seed  # noqa: E402  (schema-seed guard)


def _guard_headroom(r: np.ndarray) -> None:
    if r.size and int(r.max()) > (2**63 - 1) // MICRO:
        raise OverflowError(
            "hits_int: raw * MICRO would exceed int64 "
            f"(max raw {int(r.max())}); rescale MICRO for this graph")


def _half_step_join(edges_ds, scores, *, score_col: str, from_col: str,
                    to_col: str, num_partitions: int):
    """Join-tier half-step over SUPPORT nodes only (zero-mass nodes
    drop out; the final zero-fill re-attaches them once)."""
    from ray.data.aggregate import Sum

    fanned = edges_ds.join(
        scores, join_type="inner", num_partitions=num_partitions,
        on=(from_col,), right_on=("node",),
    )
    raw = _seed(
        fanned.groupby(to_col).aggregate(Sum(score_col, alias_name="r")),
        **{to_col: -1, "r": 0},
    ).materialize()  # reused: once for the L1 total, once for norm
    total = int(raw.filter(expr=f"{to_col} >= 0").sum("r") or 0)
    if total <= 0:
        raise ValueError(
            "hits_int: zero total mass in a half-step (edge set empty or "
            "disconnected from the score support) — HITS is undefined here")

    def norm(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        r = pc.fill_null(pc.cast(b["r"], pa.int64()), 0).to_numpy()
        _guard_headroom(r)
        return pa.table({
            "node": b[to_col],
            score_col: pa.array(r * MICRO // total, pa.int64()),
        })

    return _seed(
        raw.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True),
        node=-1, **{score_col: 0},
    )


def _half_step_bcast(edges_ds, score_map: dict, *, from_col: str,
                     to_col: str) -> dict:
    """Broadcast-tier half-step: one vectorized edge map + one narrow
    groupby; returns the next node->score dict (bounded by the node
    count, which this tier guarantees is under the broadcast
    threshold)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    ref = _ray.put(score_map)

    def fan(b: pa.Table) -> pa.Table:
        import ray as _r

        m = _r.get(ref)
        src = b[from_col].to_pylist()
        vals = np.fromiter((m.get(k, 0) for k in src), np.int64,
                           count=len(src))
        keep = vals != 0
        return pa.table({
            "node": pa.array(np.asarray(b[to_col].to_numpy())[keep],
                             pa.int64()),
            "s": pa.array(vals[keep], pa.int64()),
        })

    raw = _seed(
        edges_ds.map_batches(fan, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("node").aggregate(Sum("s", alias_name="r")),
        node=-1, r=0,
    ).to_pandas()
    raw = raw[raw["node"] >= 0]
    total = int(raw["r"].sum())
    if total <= 0:
        raise ValueError(
            "hits_int: zero total mass in a half-step (edge set empty or "
            "disconnected from the score support) — HITS is undefined here")
    r = raw["r"].to_numpy(dtype=np.int64)
    _guard_headroom(r)
    return dict(zip((int(k) for k in raw["node"]),
                    (int(v) for v in r * MICRO // total)))


def hits_int(edges_ds, *, n_iters: int = 2,
             num_partitions: int | None = None,
             broadcast_max: int | None = None):
    """(src, dst) int64 edge Dataset -> (node, auth_micro, hub_micro)
    Dataset after ``n_iters`` integer-exact HITS iterations from a
    uniform hub start of MICRO per node."""
    from ray.data.aggregate import Count

    from ..config import broadcast_max_rows, resolve_num_partitions

    num_partitions = resolve_num_partitions(num_partitions)
    if broadcast_max is None:
        broadcast_max = broadcast_max_rows()

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
    n_nodes = nodes.filter(expr="node >= 0").count()

    if n_nodes <= broadcast_max:
        # ---- broadcast tier: dicts between half-steps, zero joins
        hub = {int(r["node"]): MICRO
               for r in nodes.filter(expr="node >= 0").take_all()}
        auth: dict = {}
        for _ in range(n_iters):
            auth = _half_step_bcast(edges_ds, hub,
                                    from_col="src", to_col="dst")
            hub = _half_step_bcast(edges_ds, auth,
                                   from_col="dst", to_col="src")
        import ray as _ray

        a_ref, h_ref = _ray.put(auth), _ray.put(hub)

        def attach(b: pa.Table) -> pa.Table:
            import ray as _r

            am, hm = _r.get(a_ref), _r.get(h_ref)
            ks = b["node"].to_pylist()
            return pa.table({
                "node": b["node"],
                "auth_micro": pa.array([am.get(k, 0) for k in ks],
                                       pa.int64()),
                "hub_micro": pa.array([hm.get(k, 0) for k in ks],
                                      pa.int64()),
            })

        return nodes.filter(expr="node >= 0").map_batches(
            attach, batch_format="pyarrow", zero_copy_batch=True)

    # ---- join tier: support-only iteration, one zero-fill at the end
    hub = nodes.map_batches(
        lambda b: b.append_column(
            "hub_micro", pa.array(np.full(b.num_rows, MICRO, dtype=np.int64))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    hub = _seed(hub, node=-1, hub_micro=MICRO)
    auth = None
    for _ in range(n_iters):
        auth = _half_step_join(edges_ds, hub.select_columns(
            ["node", "hub_micro"]).rename_columns(["node", "s"]),
            score_col="s", from_col="src", to_col="dst",
            num_partitions=num_partitions).rename_columns(
            ["node", "auth_micro"])
        hub = _half_step_join(edges_ds, auth.select_columns(
            ["node", "auth_micro"]).rename_columns(["node", "s"]),
            score_col="s", from_col="dst", to_col="src",
            num_partitions=num_partitions).rename_columns(
            ["node", "hub_micro"])

    from .rayfix import typed_side

    out = typed_side(nodes).join(
        auth.rename_columns(["a_node", "auth_micro"]),
        join_type="left_outer", num_partitions=num_partitions,
        on=("node",), right_on=("a_node",))
    out = typed_side(out).join(
        hub.rename_columns(["h_node", "hub_micro"]),
        join_type="left_outer", num_partitions=num_partitions,
        on=("node",), right_on=("h_node",))

    def fill(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "node": b["node"],
            "auth_micro": pc.fill_null(
                pc.cast(b["auth_micro"], pa.int64()), 0),
            "hub_micro": pc.fill_null(
                pc.cast(b["hub_micro"], pa.int64()), 0),
        })

    return out.filter(expr="node >= 0").map_batches(
        fill, batch_format="pyarrow", zero_copy_batch=True)


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
