"""Monte-Carlo PPR (R2/R3/A1) — vectorized alpha-stop random walks.

Reference: Monte_Carlo.java:60-157. omega = 3*ln(2/pfail)/eps^2/delta walks
from the source; pi(t) = (#walks stopping at t)/omega. Walk semantics:
- a start node with out-degree 0 ends the walk immediately at the start;
- each step first stops with probability alpha, else moves to a uniformly
  random out-neighbor; a dangling current node *resets the walk to its start*
  (consuming the step) — the dangling->source rule in walk form;
- the `no_zero_hop` variant (used by FORA's whole-graph walk phase) takes one
  unconditional first step.

Distributed plans, two representations:
- single-source MC: COUNTED walks (`run_walks_counted`) — state is
  (node, walk_count), bounded by active nodes rather than omega; stops
  split Binomial(cnt, alpha), movers split multinomially over the
  adjacency arrays. Layout-independent per-(step, node) hash seeding.
- weighted fan-out (FORA's walk phase): per-walk rows (start, cur,
  weight) through `run_walks` — starts and weights vary per walk, so the
  counted compression doesn't apply; supersteps are block-unrolled
  (one materialization + emptiness probe per 4 steps). `F.rand(seed)` is
  deterministic per (partition, row) for a fixed partitioning; run-to-run
  layout can vary, so seeded reproducibility on THIS path is only
  guaranteed on the local kernel.
The superstep count is geometric either way (~ln(omega)/ln(1/(1-alpha))
rounds to drain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_ALPHA, WholeGraphConf
from ..graph import PropertyGraph
from ..plans.iterative import static_superstep_plan
from . import _kernels
from ._result import ppr_result_from_dense

import numpy as np


def monte_carlo(
    graph: PropertyGraph,
    source: int,
    epsilon: float,
    alpha: float = DEFAULT_ALPHA,
    mode: str = "auto",
    seed: int | None = 42,
    max_supersteps: int = 1_000,
) -> DataFrame:
    """Whole-graph MC PPR. Returns DataFrame(node, ppr)."""
    conf = WholeGraphConf(alpha=alpha, n=graph.n, m=graph.m)
    omega = conf.mc_omega(epsilon)
    if mode == "auto":
        mode = "local" if graph.fits_local() else "distributed"
    if mode == "local":
        lg = graph.local
        rng = np.random.default_rng(seed)
        pi = _kernels.monte_carlo(lg, lg.dense(source), alpha, omega, rng)
        return ppr_result_from_dense(graph, pi)
    return _monte_carlo_distributed(
        graph, source, alpha, omega, seed, max_supersteps
    )


def _monte_carlo_distributed(
    graph: PropertyGraph,
    source: int,
    alpha: float,
    omega: int,
    seed: int | None,
    max_supersteps: int = 1_000,
) -> DataFrame:
    """Counted-walk simulation: the omega walks NEVER materialize as rows.

    Walks from one source are exchangeable, so the superstep state is
    (cur, cnt) — bounded by the number of ACTIVE NODES, not omega. Each
    superstep splits each node's walk count binomially (stop vs move) and
    multinomially over its out-neighbors; both splits are exact samples of
    the same joint distribution as per-walk simulation (sums of iid
    Bernoulli/categorical draws). At omega ~ 1e9 (the 100 TB operating
    point: omega grows as 1/delta = n) the per-walk frame is billions of
    rows per superstep; the counted frame is <= n rows and shrinks
    geometrically. Randomness is seeded per (step, node) via a hash —
    deterministic REGARDLESS of partition layout, unlike F.rand."""
    walks = graph.spark.createDataFrame(
        [(int(source), int(omega))], "cur long, cnt long"
    )
    ends = run_walks_counted(
        graph, walks, alpha, int(source), seed=seed, max_supersteps=max_supersteps
    )
    return ends.select(
        F.col("cur").alias("node"),
        (F.col("cnt").cast("double") / F.lit(float(omega))).alias("ppr"),
    )


def run_walks_counted(
    graph: PropertyGraph,
    walks: DataFrame,
    alpha: float,
    source: int,
    seed: int | None = None,
    max_supersteps: int = 1_000,
) -> DataFrame:
    """Drive counted walks(cur, cnt) from ONE source to their stop nodes;
    returns (cur, cnt) of stopped walk counts (summed over supersteps).

    Same reference semantics as `run_walks` (alpha-stop, uniform
    out-neighbor, dangling resets to the source, degree-0 source stops
    immediately), expressed over walk COUNTS: per superstep each (cur,
    cnt) row draws stops ~ Binomial(cnt, alpha) and splits the movers
    Multinomial(cnt - stops, uniform over out-neighbors). One adjacency
    join + one Arrow pass + one groupBy merge per superstep.
    """
    if seed is None:
        import random as _random

        base_seed = _random.randrange(2**31)
    else:
        base_seed = int(seed)

    adj = graph.adj  # (node, neighbors, out_degree)
    src_lit = int(source)

    # one row per node: duplicate cur rows would share a per-(step, node)
    # seed and draw correlated splits
    walks = walks.groupBy("cur").agg(F.sum("cnt").alias("cnt"))

    # a degree-0 source ends every walk at the source immediately
    deg0 = walks.join(adj, walks.cur == adj.node, "left")
    done0 = deg0.where(F.col("node").isNull()).select("cur", "cnt")
    live = deg0.where(F.col("node").isNotNull()).select("cur", "cnt")

    def step_factory(step_i: int):
        def step(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                outc: list = []
                outn: list = []
                outs: list = []
                for cur, cnt, nbrs in zip(
                    pdf["cur"], pdf["cnt"], pdf["neighbors"]
                ):
                    cnt = int(cnt)
                    # per-(step, node) seed: layout-independent determinism
                    mix = (base_seed * 0x9E3779B1 + step_i * 0x85EBCA6B + int(cur)) % (2**63)
                    rng = np.random.default_rng(mix)
                    stops = int(rng.binomial(cnt, alpha))
                    if stops:
                        outc.append(int(cur))
                        outn.append(stops)
                        outs.append(True)
                    movers = cnt - stops
                    if movers == 0:
                        continue
                    if nbrs is None or len(nbrs) == 0:
                        outc.append(src_lit)  # dangling -> reset to source
                        outn.append(movers)
                        outs.append(False)
                        continue
                    deg = len(nbrs)
                    counts = rng.multinomial(movers, np.full(deg, 1.0 / deg))
                    nz = np.nonzero(counts)[0]
                    na = np.asarray(nbrs, dtype=np.int64)
                    outc.extend(int(x) for x in na[nz])
                    outn.extend(int(c) for c in counts[nz])
                    outs.extend([False] * len(nz))
                yield pd.DataFrame({"cur": outc, "cnt": outn, "stopped": outs})

        return step

    finished = [done0]
    with static_superstep_plan(graph.spark):
        live = live.localCheckpoint(eager=True)
        for i in range(max_supersteps):
            # emptiness probe every 3rd step: the geometric tail takes tens
            # of supersteps to drain, and each probe is a driver job; a few
            # no-op supersteps past drain are cheaper than per-step probes
            if i % 3 == 0 and live.isEmpty():
                break
            j = live.join(adj, live.cur == adj.node, "left").select(
                "cur", "cnt", "neighbors"
            )
            # ONE materialization per superstep serves both the stopped
            # slice (kept for the final union) and the next live frontier.
            # Single groupBy(cur) with conditional sums: one output row per
            # node (vs two under a (cur, stopped) key) and the narrower
            # shuffle key.
            nxt = (
                j.mapInPandas(step_factory(i), "cur long, cnt long, stopped boolean")
                .groupBy("cur")
                .agg(
                    F.sum(F.when(F.col("stopped"), F.col("cnt")).otherwise(0)).alias(
                        "stop_cnt"
                    ),
                    F.sum(F.when(~F.col("stopped"), F.col("cnt")).otherwise(0)).alias(
                        "live_cnt"
                    ),
                )
            ).localCheckpoint(eager=True)
            finished.append(
                nxt.where(F.col("stop_cnt") > 0).select(
                    "cur", F.col("stop_cnt").alias("cnt")
                )
            )
            live = nxt.where(F.col("live_cnt") > 0).select(
                "cur", F.col("live_cnt").alias("cnt")
            )

    out = finished[0]
    for f in finished[1:]:
        out = out.unionAll(f)
    return out.groupBy("cur").agg(F.sum("cnt").alias("cnt"))


def run_walks(
    graph: PropertyGraph,
    walks: DataFrame,
    alpha: float,
    zero_hop: bool = True,
    seed: int | None = None,
    max_supersteps: int = 1_000,
    check_every: int = 4,
) -> DataFrame:
    """Drive walks(start, cur, weight) to their stop nodes; returns same schema.

    Implements the reference walk semantics above. Steps are unrolled in
    blocks of ``check_every``: within a block each walk carries a ``done``
    flag (stopped walks ride along unmodified), and the driver materializes
    (localCheckpoint) + probes emptiness only once per block. The alpha-stop
    tail is geometric — ~`ln(omega)/ln(1/(1-alpha))` supersteps to drain —
    so per-step driver round-trips dominate the tail; blocking cuts driver
    synchronization (and Spark job count) ~``check_every``-fold without
    changing any walk's distribution (each step still draws its own
    stop/move randomness). Lineage depth per materialization is bounded by
    ``check_every`` joins, so no recompute amplification.
    """
    adj = graph.adj  # (node, neighbors, out_degree)
    if seed is None:
        # unseeded must mean independent across calls — not F.rand(0)
        import random as _random

        base_seed = _random.randrange(2**31)
    else:
        base_seed = int(seed)

    # walks whose start is dangling stop at the start immediately
    deg0 = walks.join(adj, walks.cur == adj.node, "left")
    done = deg0.where(F.col("node").isNull()).select("start", "cur", "weight")
    live = deg0.where(F.col("node").isNotNull()).select("start", "cur", "weight")

    if not zero_hop:
        live = _step_move(live, adj, base_seed * 7919 + 13)

    finished = [done]
    with static_superstep_plan(graph.spark):
        i = 0
        while i < max_supersteps:
            block = live.withColumn("done", F.lit(False))
            for _ in range(min(check_every, max_supersteps - i)):
                block = _step_flagged(block, adj, alpha, base_seed + 2 * i)
                i += 1
            block = block.localCheckpoint(eager=True)
            finished.append(
                block.where("done").select("start", "cur", "weight")
            )
            live = block.where(~F.col("done")).select("start", "cur", "weight")
            if live.isEmpty():
                break

    out = finished[0]
    for f in finished[1:]:
        out = out.unionAll(f)
    return out


def _step_flagged(block: DataFrame, adj: DataFrame, alpha: float, seed: int) -> DataFrame:
    """One alpha-stop step over (start, cur, weight, done) rows.

    Already-done rows pass through untouched; live rows first draw the stop
    mask, survivors move to a uniform random out-neighbor (dangling resets
    to the walk's start — the dangling->source rule in walk form)."""
    j = block.join(adj, block.cur == adj.node, "left")
    newly_stopped = (~F.col("done")) & (F.rand(seed) < F.lit(alpha))
    done2 = F.col("done") | newly_stopped
    nxt = (
        F.when(done2, F.col("cur"))
        .when(F.col("node").isNull(), F.col("start"))  # dangling -> reset
        .otherwise(
            F.element_at(
                "neighbors",
                (F.floor(F.rand(seed + 1) * F.col("out_degree")) + 1).cast("int"),
            )
        )
    )
    return j.select("start", nxt.alias("cur"), "weight", done2.alias("done"))


def _step_move(walks: DataFrame, adj: DataFrame, seed: int) -> DataFrame:
    """One move: uniform random out-neighbor; dangling resets to start."""
    j = walks.join(adj, walks.cur == adj.node, "left")
    nxt = F.when(
        F.col("node").isNull(), F.col("start")  # dangling -> reset to start
    ).otherwise(
        F.element_at(
            "neighbors",
            (F.floor(F.rand(seed) * F.col("out_degree")) + 1).cast("int"),
        )
    )
    return j.select("start", nxt.alias("cur"), "weight")
