"""Monte-Carlo PPR (R2/R3/A1) — vectorized alpha-stop random walks.

Reference: Monte_Carlo.java:60-157. omega = 3*ln(2/pfail)/eps^2/delta walks
from the source; pi(t) = (#walks stopping at t)/omega. Walk semantics:
- a start node with out-degree 0 ends the walk immediately at the start;
- each step first stops with probability alpha, else moves to a uniformly
  random out-neighbor; a dangling current node *resets the walk to its start*
  (consuming the step) — the dangling->source rule in walk form;
- the `no_zero_hop` variant (used by FORA's whole-graph walk phase) takes one
  unconditional first step.

Distributed plan: COUNTED walks (`run_walks_counted`) — the omega walks
never materialize as rows. State is (start, cur, walk_count); per superstep
stops split Binomial(cnt, alpha) and movers split multinomially over the
adjacency arrays — sums of the identical iid per-walk draws, so endpoint
distributions match per-walk simulation exactly. Single-source MC keeps
<= active-node rows regardless of omega; FORA's weighted multi-start
fan-out rides the same loop with per-start weights applied to the counted
endpoints afterward. Per-(step, start, cur) hash seeding makes results
independent of partition layout (unlike `F.rand`). The superstep count is
geometric (~ln(omega)/ln(1/(1-alpha)) rounds to drain); the driver probes
emptiness every 3rd round.
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
        [(int(source), int(source), int(omega))], "start long, cur long, cnt long"
    )
    ends = run_walks_counted(
        graph, walks, alpha, zero_hop=True, seed=seed, max_supersteps=max_supersteps
    )
    return ends.select(
        F.col("cur").alias("node"),
        (F.col("cnt").cast("double") / F.lit(float(omega))).alias("ppr"),
    )


def run_walks_counted(
    graph: PropertyGraph,
    walks: DataFrame,
    alpha: float,
    zero_hop: bool = True,
    seed: int | None = None,
    max_supersteps: int = 1_000,
) -> DataFrame:
    """Drive counted walks(start, cur, cnt) to their stop nodes; returns
    (start, cur, cnt) of stopped walk counts (summed over supersteps).

    Reference walk semantics (alpha-stop, uniform out-neighbor, dangling
    resets to the walk's START, degree-0 start stops immediately,
    ``zero_hop=False`` takes one unconditional first move —
    Monte_Carlo.java:60-133) expressed over walk COUNTS: per superstep each
    (start, cur, cnt) row draws stops ~ Binomial(cnt, alpha) and splits the
    movers Multinomial(uniform over out-neighbors) — sums of the identical
    iid per-walk draws, so every end-point distribution matches per-walk
    simulation exactly. State is bounded by live (start, cur) pairs — for
    single-start MC that is <= active nodes regardless of omega; for FORA's
    multi-start fan-out it is <= the sum of frontier neighborhoods, never
    the walk count. One adjacency join + one Arrow pass + one groupBy merge
    per superstep; randomness is seeded per (step, start, cur) hash, so
    results are independent of partition layout.
    """
    if seed is None:
        import random as _random

        base_seed = _random.randrange(2**31)
    else:
        base_seed = int(seed)

    adj = graph.adj  # (node, neighbors, out_degree)

    # one row per (start, cur): duplicate rows would share a per-(step,
    # start, cur) seed and draw correlated splits
    walks = walks.groupBy("start", "cur").agg(F.sum("cnt").alias("cnt"))

    # walks whose start has no out-edges stop at the start immediately
    deg0 = walks.join(adj, walks.cur == adj.node, "left")
    done0 = deg0.where(F.col("node").isNull()).select("start", "cur", "cnt")
    live = deg0.where(F.col("node").isNotNull()).select("start", "cur", "cnt")

    def step_factory(step_i: int, stop_prob: float):
        def step(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                outs_: list = []
                outc: list = []
                outn: list = []
                outflag: list = []
                for start, cur, cnt, nbrs in zip(
                    pdf["start"], pdf["cur"], pdf["cnt"], pdf["neighbors"]
                ):
                    start, cnt = int(start), int(cnt)
                    # per-(step, start, cur) seed: layout-independent
                    mix = (
                        base_seed * 0x9E3779B1
                        + step_i * 0x85EBCA6B
                        + start * 0xC2B2AE35
                        + int(cur)
                    ) % (2**63)
                    rng = np.random.default_rng(mix)
                    stops = int(rng.binomial(cnt, stop_prob)) if stop_prob > 0 else 0
                    if stops:
                        outs_.append(start)
                        outc.append(int(cur))
                        outn.append(stops)
                        outflag.append(True)
                    movers = cnt - stops
                    if movers == 0:
                        continue
                    if nbrs is None or len(nbrs) == 0:
                        outs_.append(start)  # dangling -> reset to the start
                        outc.append(start)
                        outn.append(movers)
                        outflag.append(False)
                        continue
                    deg = len(nbrs)
                    counts = rng.multinomial(movers, np.full(deg, 1.0 / deg))
                    nz = np.nonzero(counts)[0]
                    na = np.asarray(nbrs, dtype=np.int64)
                    outs_.extend([start] * len(nz))
                    outc.extend(int(x) for x in na[nz])
                    outn.extend(int(c) for c in counts[nz])
                    outflag.extend([False] * len(nz))
                yield pd.DataFrame(
                    {"start": outs_, "cur": outc, "cnt": outn, "stopped": outflag}
                )

        return step

    schema = "start long, cur long, cnt long, stopped boolean"

    def one_step(frame: DataFrame, step_i: int, stop_prob: float) -> DataFrame:
        j = frame.join(adj, frame.cur == adj.node, "left").select(
            "start", "cur", "cnt", "neighbors"
        )
        # ONE materialization per superstep serves both the stopped slice
        # (kept for the final union) and the next live frontier. Single
        # groupBy(start, cur) with conditional sums: one output row per
        # pair and the narrower shuffle key.
        return (
            j.mapInPandas(step_factory(step_i, stop_prob), schema)
            .groupBy("start", "cur")
            .agg(
                F.sum(F.when(F.col("stopped"), F.col("cnt")).otherwise(0)).alias(
                    "stop_cnt"
                ),
                F.sum(F.when(~F.col("stopped"), F.col("cnt")).otherwise(0)).alias(
                    "live_cnt"
                ),
            )
        ).localCheckpoint(eager=True)

    finished = [done0]
    with static_superstep_plan(graph.spark):
        live = live.localCheckpoint(eager=True)
        if not zero_hop:
            # unconditional first move (no stop draw): all live have
            # out-degree > 0 here, so no mass can stop or reset
            nxt = one_step(live, -1, 0.0)
            live = nxt.where(F.col("live_cnt") > 0).select(
                "start", "cur", F.col("live_cnt").alias("cnt")
            )
        for i in range(max_supersteps):
            # emptiness probe every 3rd step: the geometric tail takes tens
            # of supersteps to drain, and each probe is a driver job; a few
            # no-op supersteps past drain are cheaper than per-step probes
            if i % 3 == 0 and live.isEmpty():
                break
            nxt = one_step(live, i, alpha)
            finished.append(
                nxt.where(F.col("stop_cnt") > 0).select(
                    "start", "cur", F.col("stop_cnt").alias("cnt")
                )
            )
            live = nxt.where(F.col("live_cnt") > 0).select(
                "start", "cur", F.col("live_cnt").alias("cnt")
            )

    out = finished[0]
    for f in finished[1:]:
        out = out.unionAll(f)
    return out.groupBy("start", "cur").agg(F.sum("cnt").alias("cnt"))
