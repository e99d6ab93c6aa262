"""Distributed PageRank over a link graph — the canonical iterative
graph algorithm of web-scale processing, expressed in Ray Data
primitives: one shuffle join (rank onto edge sources) plus one
groupby-sum (contributions by destination) per iteration.

Integer determinism contract: ranks live in micro-units (int64).  Each
iteration computes, per edge,

    contrib = (pr[src] * damping_micro // 1_000_000) // outdeg[src]

and the next rank is ``base + SUM(contrib)`` where ``base =
1_000_000 - damping_micro`` (the teleport mass, NOT degree-normalized
— a deliberate simplification that keeps every operand integral).
Floor division on non-negative int64 is identical in numpy and DuckDB
(``//``), and integer SUM is order-free, so a chained-CTE SQL oracle
reproduces every iteration bit-for-bit — no float summation-order
hazard, which is precisely what makes textbook float PageRank
un-oracle-able across engines.

Scale shape: the edge table is hash-partitioned once and REUSED every
round (materialized — it is the big table and never changes); the rank
table (two int64 columns) is the only thing that moves through the
per-round join + aggregate.  K rounds cost K narrow shuffles — the
honest distributed-PageRank price.  Dangling nodes (no out-edges)
simply leak their damped mass by default; ``redistribute_dangling=True``
switches to the standard treatment (damped dangling mass split evenly
across all nodes, integer-exact, one bounded scalar collect per round).

Integer headroom: the per-edge multiply ``pr_micro * damping_micro``
must stay below 2^63, i.e. a node's accumulated rank below ~1.08e13
micro-units (≈ 10^7 nodes' worth of mass concentrated on one hub at
default damping).  Beyond that regime numpy would wrap while DuckDB
raises — switch the contribution arithmetic to object/HUGEINT or
rescale MICRO before running planetary-hub graphs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MICRO = 1_000_000


from .rayfix import seed_int64 as _seed  # noqa: E402  (schema-seed guard)


def pagerank_int(edges_ds, *, n_iters: int = 3, damping_micro: int = 850_000,
                 num_partitions: int | None = None,
                 redistribute_dangling: bool = False):
    """(src, dst) int64 edge Dataset -> (node, pr_micro) Dataset after
    ``n_iters`` integer-exact iterations from a uniform start of
    MICRO per node (unnormalized — ranks are comparable, not a
    distribution; keeps the start state exactly representable).

    ``redistribute_dangling=True`` switches to the standard
    dangling-mass treatment: each round, the summed rank of nodes with
    NO out-edges is damped and split evenly across all nodes —
    ``share = (D * damping_micro // MICRO) // n_nodes`` — instead of
    leaking.  Integer-exact like everything else (the round's dangling
    sum D is ONE scalar aggregate per round — a bounded driver
    collect, the honest distributed price of the redistribution; the
    K-round loop already synchronizes per round).

    Two-tier on NODE COUNT (the ops/hits.py pattern): under
    :func:`config.broadcast_max_rows` the rank and out-degree tables
    are node-sized dicts, per-source contributions are computed
    driver-side, and each round is ONE vectorized edge map + ONE
    narrow (dst, partial) groupby with a bounded collect — zero joins;
    above the threshold, the original 3-joins-per-round distributed
    path.  Both tiers are integer-identical (same formula, same
    operands).

    Contract: node ids are NON-NEGATIVE int64 (-1 is reserved as the
    schema-seed sentinel, see :func:`_seed`)."""
    from ray.data.aggregate import Count, Sum

    from ..config import broadcast_max_rows, resolve_num_partitions

    num_partitions = resolve_num_partitions(num_partitions)
    base = MICRO - damping_micro

    # node universe = sources + destinations, deduped distributed-side
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
    outdeg = _seed(
        edges_ds.groupby("src").aggregate(Count(alias_name="outdeg")),
        src=-1, outdeg=1,
    ).materialize()
    edges_ds = edges_ds.materialize()  # reused every round

    n_total = nodes.filter(expr="node >= 0").count()
    if n_total <= broadcast_max_rows():
        return _pagerank_bcast(
            edges_ds, nodes, outdeg, n_iters=n_iters,
            damping_micro=damping_micro,
            redistribute_dangling=redistribute_dangling)

    n_nodes = 0
    if redistribute_dangling:
        # dangling membership is STATIC — tag it on the node table once
        # (left join against outdeg, no per-round join for the mass)
        def tag_dang(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            isd = pc.and_(pc.is_null(b["outdeg"]),
                          pc.greater_equal(b["node"], 0))
            return pa.table({
                "node": b["node"],
                "dang": pc.cast(isd, pa.int64()),
            })

        nodes = _seed(
            nodes.join(outdeg, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("node",), right_on=("src",))
            .map_batches(tag_dang, batch_format="pyarrow",
                         zero_copy_batch=True),
            node=-1, dang=0,
        ).materialize()
        n_nodes = nodes.filter(expr="node >= 0").count()

    pr = nodes.map_batches(
        lambda b: b.append_column(
            "pr_micro", pa.array(np.full(b.num_rows, MICRO, dtype=np.int64))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    for _ in range(n_iters):
        share = 0
        if redistribute_dangling and n_nodes:
            # ONE bounded scalar per round: pr is materialized, the
            # filter+sum is a narrow scan, and Python ints can't wrap
            dang_mass = pr.filter(expr="dang == 1").sum("pr_micro") or 0
            share = (int(dang_mass) * damping_micro // MICRO) // n_nodes

        ranked_src = pr.join(
            outdeg, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=("src",),
        )  # (node, pr_micro, outdeg) for nodes WITH out-edges

        def per_source(batch: pa.Table) -> pa.Table:
            prm = batch["pr_micro"].to_numpy()
            od = batch["outdeg"].to_numpy()
            # int64 headroom guard (see module docstring): numpy would
            # silently wrap where the DuckDB oracle raises — fail loudly
            # like the oracle instead of returning wrong ranks.
            if prm.size and int(prm.max()) > (2**63 - 1) // damping_micro:
                raise OverflowError(
                    "pagerank_int: pr_micro * damping_micro would exceed "
                    f"int64 (max pr_micro {int(prm.max())}); rescale MICRO "
                    "or lower damping for this graph")
            contrib = (prm * damping_micro // MICRO) // od
            return pa.table({
                "csrc": batch["node"],
                "contrib": pa.array(contrib, pa.int64()),
            })

        contribs = _seed(
            ranked_src.map_batches(per_source, batch_format="pyarrow",
                                   zero_copy_batch=True),
            csrc=-1, contrib=0,
        )
        # fan contributions across edges (join moves only 16-byte rows),
        # then sum by destination — the round's one aggregate shuffle
        fanned = edges_ds.join(
            contribs, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("csrc",),
        )
        summed = _seed(
            fanned.groupby("dst").aggregate(Sum("contrib", alias_name="s")),
            dst=-1, s=0,
        )
        def next_rank(b: pa.Table, *, add_micro: int = share) -> pa.Table:
            import pyarrow.compute as pc

            s = pc.fill_null(pc.cast(b["s"], pa.int64()), 0)
            out = {
                "node": b["node"],
                "pr_micro": pc.add(pa.scalar(base + add_micro, pa.int64()), s),
            }
            if redistribute_dangling:
                out["dang"] = b["dang"]
            return pa.table(out)

        pr = nodes.join(
            summed, join_type="left_outer", num_partitions=num_partitions,
            on=("node",), right_on=("dst",),
        ).map_batches(next_rank, batch_format="pyarrow",
                      zero_copy_batch=True)
        # pr is the next round's join input: compact away empty blocks
        # (ops/rayfix.py) so the join shuffle's schema broadcast holds
        if redistribute_dangling:
            pr = _seed(pr, node=-1, pr_micro=MICRO, dang=0)
        else:
            pr = _seed(pr, node=-1, pr_micro=MICRO)

    # drop the schema sentinels (node -1) from the result
    out = pr.filter(expr="node >= 0")
    if redistribute_dangling:
        out = out.select_columns(["node", "pr_micro"])
    return out


def _pagerank_bcast(edges_ds, nodes, outdeg, *, n_iters: int,
                    damping_micro: int, redistribute_dangling: bool):
    """Broadcast-tier iteration (see :func:`pagerank_int`): rank and
    out-degree live as node-sized driver arrays (bounded by the
    broadcast threshold); each round ships the per-source contribution
    dict via ``ray.put``, fans it across the materialized edge table
    with one vectorized map, and collects the narrow (dst, sum) table.
    Formula and operand order identical to the join tier."""
    import ray as _ray
    from ray.data.aggregate import Sum

    base = MICRO - damping_micro
    od = {int(r["src"]): int(r["outdeg"])
          for r in outdeg.take_all() if int(r["src"]) >= 0}
    all_nodes = [int(r["node"]) for r in nodes.take_all()
                 if int(r["node"]) >= 0]
    n_nodes = len(all_nodes)
    pr = {n: MICRO for n in all_nodes}

    for _ in range(n_iters):
        share = 0
        if redistribute_dangling and n_nodes:
            dang_mass = sum(v for n, v in pr.items() if n not in od)
            share = (dang_mass * damping_micro // MICRO) // n_nodes
        # per-source contribution, driver-side exact Python ints (the
        # headroom guard is implicit: Python ints cannot wrap, and the
        # join tier's guard condition is checked explicitly)
        contrib = {}
        for n, deg in od.items():
            p = pr[n]
            if p > (2**63 - 1) // damping_micro:
                raise OverflowError(
                    "pagerank_int: pr_micro * damping_micro would exceed "
                    f"int64 (max pr_micro {p}); rescale MICRO or lower "
                    "damping for this graph")
            contrib[n] = (p * damping_micro // MICRO) // deg
        ref = _ray.put(contrib)

        def fan(b: pa.Table) -> pa.Table:
            import ray as _r

            m = _r.get(ref)
            src = b["src"].to_pylist()
            vals = np.fromiter((m.get(k, 0) for k in src), np.int64,
                               count=len(src))
            keep = vals != 0
            return pa.table({
                "dst": pa.array(b["dst"].to_numpy()[keep], pa.int64()),
                "c": pa.array(vals[keep], pa.int64()),
            })

        summed = _seed(
            edges_ds.map_batches(fan, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby("dst").aggregate(Sum("c", alias_name="s")),
            dst=-1, s=0,
        ).take_all()
        sums = {int(r["dst"]): int(r["s"]) for r in summed
                if int(r["dst"]) >= 0}
        pr = {n: base + share + sums.get(n, 0) for n in all_nodes}

    pr_ref = _ray.put(pr)

    def attach(b: pa.Table) -> pa.Table:
        import ray as _r

        m = _r.get(pr_ref)
        ks = [k for k in b["node"].to_pylist() if k >= 0]
        return pa.table({
            "node": pa.array(ks, pa.int64()),
            "pr_micro": pa.array([m[k] for k in ks], pa.int64()),
        })

    return nodes.map_batches(attach, batch_format="pyarrow",
                             zero_copy_batch=True)


def oracle_pagerank_sql(edges_sql: str, *, n_iters: int = 3,
                        damping_micro: int = 850_000,
                        redistribute_dangling: bool = False) -> str:
    """Chained-CTE DuckDB mirror of :func:`pagerank_int` — one CTE per
    iteration, same integer floor-division formula per edge.  With
    ``redistribute_dangling`` each iteration adds a dangling-mass CTE
    (sum of ranks over nodes absent from outdeg) and every node gets
    ``(d * damping // MICRO) // n_nodes`` — the engine's exact integer
    share formula."""
    base = MICRO - damping_micro
    ctes = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM edges UNION "
        "SELECT dst AS node FROM edges)",
        "outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        f"pr0 AS (SELECT node, CAST({MICRO} AS BIGINT) AS pr_micro FROM nodes)",
    ]
    for i in range(n_iters):
        prev, cur = f"pr{i}", f"pr{i + 1}"
        extra = ""
        if redistribute_dangling:
            ctes.append(
                f"d{i} AS (SELECT COALESCE(SUM(p.pr_micro), 0) AS d "
                f"FROM {prev} p WHERE p.node NOT IN (SELECT src FROM outdeg))"
            )
            extra = (
                f" + ((SELECT d FROM d{i}) * {damping_micro} // {MICRO})"
                f" // (SELECT COUNT(*) FROM nodes)"
            )
        ctes.append(
            f"{cur} AS (SELECT n.node, CAST({base}{extra} + COALESCE(c.s, 0)"
            f" AS BIGINT)"
            f" AS pr_micro FROM nodes n LEFT JOIN ("
            f"SELECT e.dst, SUM((p.pr_micro * {damping_micro} // {MICRO})"
            f" // o.outdeg) AS s"
            f" FROM edges e JOIN {prev} p ON p.node = e.src"
            f" JOIN outdeg o ON o.src = e.src GROUP BY e.dst) c"
            f" ON c.dst = n.node)"
        )
    return ("WITH " + ", ".join(ctes)
            + f" SELECT node, pr_micro FROM pr{n_iters}")
