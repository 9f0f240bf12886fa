"""Forward Push (I1/I2).

Reference: Forward_Push.java:63-142 (whole-graph) and 144-250 (resumable
top-k variant). The reference processes a sequential queue; push is linear and
order-independent over the residue vector, so the engine executes the
*frontier-synchronous batch* schedule instead: per superstep, every node with
r > 0 and (out == 0 or r/out >= rmax) pushes simultaneously. Same fixed point
(every processed node met the threshold), one Spark stage per superstep
instead of one per queue pop — the only schedule that makes sense on a
cluster.

Quirk reproduced: the reference's enqueue test `r(u)/out(u) >= rmax` evaluates
to +inf for out-degree-0 nodes, so dangling nodes *always* qualify once they
hold residue; their push routes (1-alpha)*r back to the source
(Forward_Push.java:101-115). An out-degree-0 source short-circuits to
pi(s,s) = 1 (Forward_Push.java:72-76).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_ALPHA
from ..graph import PropertyGraph
from ..plans.iterative import (
    BROADCAST_NODE_BOUND,
    loop_shuffle_partitions,
    static_superstep_plan,
)
from . import _kernels
from ._result import ppr_result_from_dense, ppr_result_from_state

# Under the shared node bound the push frontier (<= n rows of ~32 bytes)
# broadcasts into the edge-expansion join, so the cached edge table never
# re-shuffles even though the loop runs at state-scaled parallelism;
# above it the loop keeps the session's shuffle-partition count so the
# frontier exchange lands on the edge cache's partitioning — the
# O(frontier)-shuffle plan that is right at 10^9 edges.


def forward_push(
    graph: PropertyGraph,
    source: int,
    rmax: float,
    alpha: float = DEFAULT_ALPHA,
    mode: str = "auto",
    max_supersteps: int = 10_000,
) -> DataFrame:
    """Whole-graph SSPPR via local push. Returns DataFrame(node, ppr)."""
    if mode == "auto":
        mode = "local" if graph.fits_local() else "distributed"
    if mode == "local":
        lg = graph.local
        pi, _, _ = _kernels.forward_push_batch(
            lg, lg.dense(source), alpha, rmax, max_supersteps=max_supersteps
        )
        return ppr_result_from_dense(graph, pi)
    state = _forward_push_distributed_state(graph, source, rmax, alpha, max_supersteps)
    return ppr_result_from_state(state)


def _forward_push_distributed_state(
    graph: PropertyGraph,
    source: int,
    rmax: float,
    alpha: float,
    max_supersteps: int,
    init_state: DataFrame | None = None,
) -> DataFrame:
    """Batch push loop; returns the full (node, residue, reserve) state.

    ``init_state`` resumes a previous push at a tighter rmax (the resumable
    I2 variant, Forward_Push.java:144-250 — the batch schedule needs no
    carried queue: the new threshold re-qualifies nodes directly).
    """
    spark = graph.spark
    src_out = (
        graph.degrees.where(F.col("node") == int(source)).select("out_degree").take(1)
    )
    if not src_out or src_out[0][0] == 0:
        return spark.createDataFrame(
            [(int(source), 0.0, 1.0)], schema="node long, residue double, reserve double"
        )
    return _push_loop(graph, source, rmax, alpha, max_supersteps, init_state)


def _qual_expr(rmax: float):
    """Push qualification: r > 0 and (dangling or r/out >= rmax) — the
    reference's enqueue test with its +inf-for-out-degree-0 quirk."""
    return (F.col("residue") > 0) & (
        (F.col("od") == 0) | (F.col("residue") >= F.lit(rmax) * F.col("od"))
    )


def _superstep_branches(
    frontier: DataFrame,
    edges: DataFrame,
    source: int,
    alpha: float,
    hint_broadcast: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three outputs of one batch push over a qualified frontier
    (node, residue, reserve, od): `kept` banks alpha*r into reserve and zeroes
    residue; `pushed` fans (1-alpha)*r/out to out-neighbors; `dangling` routes
    the out-degree-0 nodes' (1-alpha)*r back to the source as one row.
    Shared verbatim by the whole-graph and resumable-top-k loops so push
    semantics can only be changed in one place.

    `hint_broadcast` applies `F.broadcast` ONLY to the join input of the
    `pushed` branch — hinting the whole frontier (as before r5) orphaned the
    hint on the select/aggregate branches, logging two HintErrorLogger
    warnings per superstep."""
    kept = frontier.select(
        "node",
        F.lit(0.0).alias("residue"),
        (F.col("reserve") + F.lit(alpha) * F.col("residue")).alias("reserve"),
    )
    push_in = frontier.where(F.col("od") > 0)
    if hint_broadcast:
        push_in = F.broadcast(push_in)
    pushed = (
        push_in
        .join(edges, push_in.node == edges.src)
        .select(
            F.col("dst").alias("node"),
            (F.lit(1.0 - alpha) * F.col("residue") / F.col("src_out_degree")).alias(
                "residue"
            ),
            F.lit(0.0).alias("reserve"),
        )
    )
    dangling = (
        frontier.where(F.col("od") == 0)
        .agg(F.sum(F.lit(1.0 - alpha) * F.col("residue")).alias("residue"))
        .select(
            F.lit(int(source)).cast("long").alias("node"),
            F.coalesce("residue", F.lit(0.0)).alias("residue"),
            F.lit(0.0).alias("reserve"),
        )
    )
    return kept, pushed, dangling


def _merge_state(rest: DataFrame, *branches: DataFrame) -> DataFrame:
    """Sum-merge untouched rows with the superstep branch outputs."""
    merged = rest
    for b in branches:
        merged = merged.unionAll(b)
    return merged.groupBy("node").agg(
        F.sum("residue").alias("residue"), F.sum("reserve").alias("reserve")
    )


def _push_loop(
    graph: PropertyGraph,
    source: int,
    rmax: float,
    alpha: float,
    max_supersteps: int,
    init_state: DataFrame | None,
) -> DataFrame:
    spark = graph.spark

    edges = graph.edges_deg
    # the CACHED degrees table, not `out_degrees`: the latter is an uncached
    # aggregation, so joining it per superstep re-runs the edge groupBy
    # shuffle every iteration
    out_deg = graph.degrees.select("node", "out_degree")
    state = init_state if init_state is not None else spark.createDataFrame(
        [(int(source), 1.0, 0.0)], schema="node long, residue double, reserve double"
    )
    small = graph.n <= BROADCAST_NODE_BOUND
    loop_parts = loop_shuffle_partitions(spark, graph.n) if small else None
    # the per-superstep localCheckpoint on `s` below already truncates lineage
    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        for _ in range(max_supersteps):
            s = state.join(out_deg, "node", "left").select(
                "node", "residue", "reserve",
                F.coalesce("out_degree", F.lit(0)).alias("od"),
            )
            s = s.withColumn("qual", _qual_expr(rmax))
            s = s.localCheckpoint(eager=True)  # frontier reused by 4 branches below
            frontier = s.where("qual")
            if frontier.isEmpty():
                return s.select("node", "residue", "reserve")
            rest = s.where(~F.col("qual")).select("node", "residue", "reserve")
            kept, pushed, dangling = _superstep_branches(
                frontier, edges, source, alpha, hint_broadcast=small
            )
            state = _merge_state(rest, kept, pushed, dangling)
    return state


def _forward_push_topk_state(
    graph: PropertyGraph,
    source: int,
    rmax: float,
    min_rmax: float,
    alpha: float,
    max_supersteps: int,
    init_state: DataFrame | None = None,
    init_cand: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Resumable two-threshold push (I2, Forward_Push.java:144-250).

    Batch analogue of the reference's (Q, Q_next) queue pair: each superstep
    re-qualifies ONLY the active set — the candidate frontier carried from the
    previous round (`init_cand`, nodes that reached r/out >= min_rmax), then
    the nodes updated by the previous superstep — never the whole state. A
    node outside the active set cannot newly qualify (its residue is
    unchanged), so the fixed point is identical to the full re-scan while the
    per-superstep qualification input shrinks to O(|frontier| + |updates|).

    Returns (state, next_cand). `next_cand` accumulates every active node
    observed at r/out in [min_rmax, rmax) — like the reference's Q_next it may
    retain nodes whose residue was later pushed out (Forward_Push.java never
    removes from Q_next); stale entries are harmless because every carried
    candidate is re-qualified against the live state at the next round's
    first superstep.
    """
    spark = graph.spark
    src_out = (
        graph.degrees.where(F.col("node") == int(source)).select("out_degree").take(1)
    )
    empty_cand = spark.createDataFrame([], "node long")
    if not src_out or src_out[0][0] == 0:
        # out-degree-0 source short-circuit (Forward_Push.java:149-153)
        state = spark.createDataFrame(
            [(int(source), 0.0, 1.0)], schema="node long, residue double, reserve double"
        )
        return state, empty_cand

    edges = graph.edges_deg
    out_deg = graph.degrees.select("node", "out_degree")  # cached (see _push_loop)
    state = init_state if init_state is not None else spark.createDataFrame(
        [(int(source), 1.0, 0.0)], schema="node long, residue double, reserve double"
    )
    active = init_cand if init_cand is not None else spark.createDataFrame(
        [(int(source),)], "node long"
    )
    next_cand = empty_cand
    small = graph.n <= BROADCAST_NODE_BOUND
    loop_parts = loop_shuffle_partitions(spark, graph.n) if small else None
    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        for _ in range(max_supersteps):
            act = (
                active.select("node")
                .join(state, "node")
                .join(out_deg, "node", "left")
                .select(
                    "node",
                    "residue",
                    "reserve",
                    F.coalesce("out_degree", F.lit(0)).alias("od"),
                )
            )
            act = act.withColumn("qual", _qual_expr(rmax)).localCheckpoint(eager=True)
            # demoted to Q_next: alive but under this round's rmax
            # (Forward_Push.java:243-249)
            next_cand = next_cand.unionAll(
                act.where(
                    ~F.col("qual")
                    & (F.col("residue") > 0)
                    & (F.col("residue") >= F.lit(min_rmax) * F.col("od"))
                ).select("node")
            )
            frontier = act.where("qual")
            if frontier.isEmpty():
                break
            kept, pushed, dangling = _superstep_branches(
                frontier, edges, source, alpha, hint_broadcast=small
            )
            rest = state.join(frontier.select("node"), "node", "left_anti")
            state = _merge_state(rest, kept, pushed, dangling).localCheckpoint(
                eager=True
            )
            # only updated nodes can newly qualify next superstep
            active = (
                pushed.select("node").unionAll(dangling.select("node")).distinct()
            )
        return state, next_cand.distinct().localCheckpoint(eager=True)
