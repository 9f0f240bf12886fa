"""Strongly-connected components — the `gds.scc` graph verb.

The reference's host platform ships `gds.scc` next to the PageRank family it
benchmarks (Neo4j_Method.java:35 drives the same `gds.*` procedure surface);
WCC exists in this engine as min-label propagation (`dedup_clusters` over
graph edges), and this module adds its directed twin.  Classic use here: the
communicating classes of a Markov transition graph (the driver query runs it
on per-user event-type transition chains, where recurrent classes are real;
the engine's TPC-H-derived graph is a DAG, where SCC correctly degenerates
to singletons — both pinned by tests).

Algorithm — deterministic Forward-Backward *coloring* (Orzan's coloring /
the FW-BW-Trim family used by every distributed SCC implementation), not
Tarjan (inherently sequential DFS; a non-starter at cluster scale):

repeat until no nodes remain:
  1. **Trim to a fixed point**: a node with no incoming or no outgoing
     edge (self-loops excluded) inside the remaining subgraph is its own
     SCC — peel such nodes iteratively.  A DAG dissolves entirely here in
     longest-path rounds; what survives is the cyclic core.
  2. **Color**: propagate ``color[v] = max(color[v], in-neighbor colors)``
     to a fixed point; ``color[v]`` is then the max node id that reaches
     v.  Roots are nodes with ``color[v] == v``.
  3. **Backward mark within color**: from each root r, spread along
     REVERSE edges restricted to ``color == r``.  A marked node u both is
     reached by r (``color[u] == r``) and reaches r (the backward path) —
     exactly SCC(r).  Every marked group is emitted (relabelled to the
     MIN member id, the engine-wide cluster-label convention shared with
     `dedup_clusters`), removed, and the outer loop repeats.

Each outer round removes at least the SCC of every current color root (the
global max id is always one), so the round count is bounded by the longest
chain of non-trivial SCCs in the condensation — small for real graphs; the
``strict`` flag raises if ``max_rounds`` truncates before the fixed point.

Convergence checks are 1-row aggregates over monotone quantities (colors
only increase, the marked set only grows, the remaining set only shrinks)
— map-side partials plus a 1-row exchange per superstep, never an O(n)
frame-equality join (the `dedup_clusters` discipline).

Scale shape: state is node-bounded (node, color) rows keyed by node; every
superstep is one equi join edge⋈state plus a groupBy-max — the same
partitioning as every other iterative verb here (plans/iterative.py: AQE
off + state-scaled shuffle partitions + localCheckpoint lineage cuts).  No
windows, no driver-side loops over nodes, no collect beyond the 1-row
convergence aggregates.

Oracle twin: ``scc_oracle_sql`` rebuilds (node, scc_id=min mutual-reach
member) from first principles via a DuckDB recursive transitive closure —
a different algorithm entirely, so cross-engine agreement checks the
semantics, not the implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import LOCAL_EDGE_THRESHOLD
from ..plans.iterative import (
    SuperstepLoop,
    loop_shuffle_partitions,
    static_superstep_plan,
)

SCC_MAX_ROUNDS = 12  # outer FW-BW rounds; strict raises on truncation
SCC_MAX_STEPS = 40  # inner propagation supersteps per phase


def _count(df: DataFrame) -> int:
    return df.agg(F.count(F.lit(1)).alias("n")).collect()[0][0]


def _scc_local(src, dst) -> dict[int, int]:
    """Driver-local SCC (iterative Tarjan) over int64 edge arrays:
    node -> min member id of its strongly-connected component.  The
    output is algorithm-independent (components and their min members
    are properties of the graph), so this is exactly what the FW-BW
    coloring loop — and the oracle's recursive closure — computes."""
    import numpy as np

    from .._nputil import unique_stable

    nodes = unique_stable(np.concatenate([src, dst]))
    n = len(nodes)
    isrc = np.searchsorted(nodes, src)
    idst = np.searchsorted(nodes, dst)
    order = np.argsort(isrc, kind="stable")
    heads = isrc[order]
    adj_flat = idst[order]
    indptr = np.searchsorted(heads, np.arange(n + 1))
    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    stack: list[int] = []
    comp_min: dict[int, int] = {}
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        # explicit DFS stack of (node, next-edge-offset)
        work = [(root, indptr[root])]
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            v, ei = work[-1]
            if ei < indptr[v + 1]:
                work[-1] = (v, ei + 1)
                u = int(adj_flat[ei])
                if index[u] == -1:
                    index[u] = low[u] = counter
                    counter += 1
                    stack.append(u)
                    on_stack[u] = True
                    work.append((u, int(indptr[u])))
                elif on_stack[u]:
                    if index[u] < low[v]:
                        low[v] = index[u]
            else:
                work.pop()
                if work:
                    p = work[-1][0]
                    if low[v] < low[p]:
                        low[p] = low[v]
                if low[v] == index[v]:
                    members = []
                    while True:
                        x = stack.pop()
                        on_stack[x] = False
                        members.append(x)
                        if x == v:
                            break
                    mid = int(nodes[min(members)])
                    for x in members:
                        comp_min[int(nodes[x])] = mid
    return comp_min


def scc(
    edges: DataFrame,
    max_rounds: int = SCC_MAX_ROUNDS,
    max_steps: int = SCC_MAX_STEPS,
    strict: bool = True,
) -> DataFrame:
    """(node, scc_id) over a directed edge list (``src``, ``dst``).

    ``scc_id`` = smallest node id in the component.  Nodes appear iff they
    occur as an edge endpoint (isolated nodes carry no row — the
    `graph_wcc` convention).
    """
    spark = edges.sparkSession
    edges = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n0 = _count(nodes)
    if n0 == 0:
        return nodes.select("node", F.col("node").alias("scc_id"))
    # Driver-local kernel under the LocalGraph edge cutoff (graph.py
    # precedent): components and their min members are graph properties,
    # so iterative Tarjan returns exactly what the FW-BW loop converges
    # to — without the loop's dozens of per-phase jobs.  Above the gate
    # the FW-BW rounds below run unchanged — the 100x plan.
    if _count(edges) <= LOCAL_EDGE_THRESHOLD:
        import numpy as np
        import pandas as pd

        pdf = edges.toPandas()
        comp = _scc_local(
            pdf["src"].to_numpy(dtype=np.int64),
            pdf["dst"].to_numpy(dtype=np.int64),
        )
        return spark.createDataFrame(
            pd.DataFrame(
                {"node": list(comp.keys()), "scc_id": list(comp.values())}
            ),
            "node long, scc_id long",
        )
    done: list[DataFrame] = []  # (node, scc_id) batches
    with static_superstep_plan(spark, loop_shuffle_partitions(spark, n0)):
        remaining, live = nodes, edges
        for _ in range(max_rounds):
            # -- 1. trim: peel no-in / no-out nodes (structural edges only)
            # Peel order doesn't matter — every node removed by any peel
            # sequence is a singleton SCC — so singletons are emitted in ONE
            # batch after the peel fixed point (fewer checkpoints/actions).
            struct = live.where(F.col("src") != F.col("dst")).localCheckpoint(
                eager=True
            )
            pre_trim, n_rem = remaining, _count(remaining)
            for _ in range(max_steps):
                has_out = struct.select(F.col("src").alias("node")).distinct()
                has_in = struct.select(F.col("dst").alias("node")).distinct()
                core = remaining.join(has_out, "node", "left_semi").join(
                    has_in, "node", "left_semi"
                ).localCheckpoint(eager=True)
                n_core = _count(core)
                remaining = core
                if n_core == n_rem:
                    break
                n_rem = n_core
                struct = (
                    struct.join(core, struct.src == core.node, "left_semi")
                    .join(core, struct.dst == core.node, "left_semi")
                    .localCheckpoint(eager=True)
                )
            else:
                if strict:
                    raise RuntimeError(
                        f"scc trim phase not converged in {max_steps} steps"
                    )
            trimmed = pre_trim.join(remaining, "node", "left_anti")
            if _count(trimmed):
                done.append(
                    trimmed.select(
                        "node", F.col("node").alias("scc_id")
                    ).localCheckpoint(eager=True)
                )
            if _count(remaining) == 0:
                break
            live = struct  # trim already restricted edges to the core

            # -- 2. color: max id reaching each node (monotone-increase sum)
            colors = remaining.select(
                "node", F.col("node").alias("color")
            ).localCheckpoint(eager=True)
            prev = colors.agg(
                F.sum(F.col("color").cast("decimal(38,0)"))
            ).collect()[0][0]
            loop = SuperstepLoop(checkpoint_every=2)
            for _ in range(max_steps):
                pushed = colors.join(live, colors.node == live.src).select(
                    F.col("dst").alias("node"), "color"
                )
                colors = loop.materialize(
                    colors.unionAll(pushed)
                    .groupBy("node")
                    .agg(F.max("color").alias("color")),
                    force=True,
                )
                cur = colors.agg(
                    F.sum(F.col("color").cast("decimal(38,0)"))
                ).collect()[0][0]
                if cur == prev:
                    break
                prev = cur
            else:
                if strict:
                    raise RuntimeError(
                        f"scc color phase not converged in {max_steps} steps"
                    )

            # -- 3. backward mark from roots within same color -------------
            marked = colors.where(F.col("node") == F.col("color")).select(
                "node", "color"
            ).localCheckpoint(eager=True)
            n_marked = _count(marked)
            loop = SuperstepLoop(checkpoint_every=2)
            for _ in range(max_steps):
                spread = (
                    marked.join(live, marked.node == live.dst)
                    .select(F.col("src").alias("node"), "color")
                    .join(
                        colors.withColumnRenamed("color", "c2"), "node"
                    )
                    .where(F.col("color") == F.col("c2"))
                    .select("node", "color")
                )
                marked = loop.materialize(
                    marked.unionAll(spread).distinct(), force=True
                )
                cur = _count(marked)
                if cur == n_marked:
                    break
                n_marked = cur
            else:
                if strict:
                    raise RuntimeError(
                        f"scc mark phase not converged in {max_steps} steps"
                    )

            # relabel each marked color group to its min member ------------
            relabel = marked.groupBy("color").agg(F.min("node").alias("scc_id"))
            done.append(
                marked.join(relabel, "color")
                .select("node", "scc_id")
                .localCheckpoint(eager=True)
            )
            remaining = remaining.join(marked, "node", "left_anti").localCheckpoint(
                eager=True
            )
            if _count(remaining) == 0:
                break
            live = (
                live.join(remaining, live.src == remaining.node, "left_semi")
                .join(remaining, live.dst == remaining.node, "left_semi")
                .localCheckpoint(eager=True)
            )
        else:
            if strict and _count(remaining):
                raise RuntimeError(
                    f"scc not converged within {max_rounds} FW-BW rounds"
                )
    out = done[0]
    for d in done[1:]:
        out = out.unionAll(d)
    return out


def scc_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin from first principles: recursive transitive closure,
    then scc_id = MIN over the mutual-reachability class (self included).
    UNION (set) recursion dedups per step, so cycles terminate."""
    return f"""
WITH RECURSIVE e AS MATERIALIZED (
  SELECT DISTINCT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
  FROM ({edges_sql})
),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
reach(a, b) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src
),
mutual AS (
  SELECT node, node AS m FROM nodes
  UNION
  SELECT r1.a AS node, r1.b AS m
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
)
SELECT node, CAST(MIN(m) AS BIGINT) AS scc_id FROM mutual GROUP BY node
"""


# ---------------------------------------------------------------------------
# Composed op: Markov communicating classes over per-user transition chains
# ---------------------------------------------------------------------------


def markov_communicating_classes(
    events: DataFrame, max_gap_seconds: int | None = None
) -> DataFrame:
    """(user_id, event_type, class_id): SCC over the composite-id per-user
    event-type transition graph (`funnel.user_transition_edges`), decoded
    back through the alphabetical type-rank table.  The communicating
    classes of each user's first-order Markov chain — recurrent behavior
    sets (`event_transitions` is the same chain's probability matrix)."""
    from ..functions.funnel import (
        TRANSITION_NODE_STRIDE,
        type_ranks,
        user_transition_edges,
    )

    comp = scc(user_transition_edges(events, max_gap_seconds=max_gap_seconds))
    # decode through the SAME NULL-safe rank table the encode used
    ranks = type_ranks(events).withColumnRenamed("rank", "rk")
    return (
        comp.select(
            F.floor(F.col("node") / F.lit(TRANSITION_NODE_STRIDE))
            .cast("long")
            .alias("user_id"),
            (F.col("node") % TRANSITION_NODE_STRIDE).alias("rk"),
            F.col("scc_id").alias("class_id"),
        )
        .join(F.broadcast(ranks), "rk")
        .select("user_id", F.col("tname").alias("event_type"), "class_id")
    )


def markov_classes_oracle_sql(
    table: str = "events", max_gap_seconds: int | None = None
) -> str:
    """DuckDB twin of `markov_communicating_classes` (closure-based SCC
    over the identical edge derivation, identical decode)."""
    from ..functions.funnel import (
        TRANSITION_NODE_STRIDE,
        type_ranks_sql,
        user_transition_edges_sql,
    )

    s = TRANSITION_NODE_STRIDE
    edges = user_transition_edges_sql(table=table, max_gap_seconds=max_gap_seconds)
    return f"""
WITH scc_comp AS MATERIALIZED (
  SELECT * FROM ({scc_oracle_sql(edges)}) t
),
scc_ty AS (SELECT tname, rank AS rk FROM {type_ranks_sql(table)} tr)
SELECT CAST(c.node // {s} AS BIGINT) AS user_id,
       ty.tname AS event_type,
       CAST(c.scc_id AS BIGINT) AS class_id
FROM scc_comp c JOIN scc_ty ty ON c.node % {s} = ty.rk
"""
