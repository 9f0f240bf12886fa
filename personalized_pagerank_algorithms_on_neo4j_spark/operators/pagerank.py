"""Classic personalized PageRank comparator (I8).

Reference: Neo4j_Method.java:66-98 runs Neo4j's built-in PageRank with
damping = 1 - alpha (inverted convention), the source node as the only
restart target, a fixed iteration count, then sum-normalizes the scores.
That algorithm drops dangling mass instead of returning it to the source, so
it does *not* tightly match the Power-Method oracle — the reference observes
exactly that (dissertation section 5.3); this comparator reproduces the
convention, not the oracle.

rank_{i+1}(v) = (1-d)*[v = s] + d * sum_{u->v} rank_i(u)/out(u), d = 1-alpha,
followed by rank / sum(rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DEFAULT_ALPHA
from ..graph import PropertyGraph
from ..plans.iterative import SuperstepLoop
from . import _kernels
from ._result import ppr_result_from_dense


def personalized_pagerank(
    graph: PropertyGraph,
    source: int,
    iterations: int = 100,
    alpha: float = DEFAULT_ALPHA,
    mode: str = "auto",
) -> DataFrame:
    if mode == "auto":
        mode = "local" if graph.fits_local() else "distributed"
    if mode == "local":
        lg = graph.local
        pi = _kernels.personalized_pagerank(lg, lg.dense(source), alpha, iterations)
        return ppr_result_from_dense(graph, pi)
    return _pagerank_distributed(graph, source, iterations, alpha)


def pagerank_global(
    graph: PropertyGraph,
    iterations: int = 10,
    alpha: float = DEFAULT_ALPHA,
    mode: str = "auto",
) -> DataFrame:
    """Whole-graph (non-personalized) PageRank: uniform 1/n start and
    restart, damping d = 1-alpha, dangling mass dropped, fixed iterations,
    raw (unnormalized) scores — the gds.pageRank default a Neo4j user runs
    before any personalization (Neo4j_Method.java:66-98 minus sourceNodes).
    Returns DataFrame(node, score) with one row per node (every node holds
    at least the restart mass).

    Distributed shape: the rank vector is O(n) state shuffled on `node`
    each superstep against the cached pre-partitioned edge table; the
    restart vector is derived once from the node table and checkpointed.
    """
    if mode == "auto":
        mode = "local" if graph.fits_local() else "distributed"
    if mode == "local":
        import pandas as pd

        lg = graph.local
        r = _kernels.pagerank_global(lg, alpha, iterations)
        pdf = pd.DataFrame({"node": lg.ids, "score": r})
        return graph.spark.createDataFrame(pdf, schema="node long, score double")
    d = 1.0 - alpha
    edges = graph.edges_deg
    n = graph.n
    restart = (
        graph.nodes.select(
            F.col("id").alias("node"),
            F.lit((1.0 - d) / n).alias("rank"),
        )
        .localCheckpoint(eager=True)  # read every superstep; derive once
    )
    rank = restart.select("node", F.lit(1.0 / n).alias("rank"))
    loop = SuperstepLoop(checkpoint_every=4)
    for _ in range(iterations):
        contrib = rank.join(edges, rank.node == edges.src).select(
            F.col("dst").alias("node"),
            (F.lit(d) * F.col("rank") / F.col("src_out_degree")).alias("rank"),
        )
        rank = (
            contrib.unionAll(restart)
            .groupBy("node")
            .agg(F.sum("rank").alias("rank"))
        )
        rank = loop.materialize(rank)
    return rank.select("node", F.col("rank").alias("score"))


def _pagerank_distributed(
    graph: PropertyGraph, source: int, iterations: int, alpha: float
) -> DataFrame:
    d = 1.0 - alpha
    edges = graph.edges_deg
    restart = graph.spark.createDataFrame(
        [(int(source), 1.0 - d)], schema="node long, rank double"
    )
    rank = graph.spark.createDataFrame(
        [(int(source), 1.0)], schema="node long, rank double"
    )
    loop = SuperstepLoop(checkpoint_every=4)
    for _ in range(iterations):
        contrib = (
            rank.join(edges, rank.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                (F.lit(d) * F.col("rank") / F.col("src_out_degree")).alias("rank"),
            )
        )
        rank = (
            contrib.unionAll(restart)
            .groupBy("node")
            .agg(F.sum("rank").alias("rank"))
        )
        rank = loop.materialize(rank)
    # P4 sum-normalization (Neo4j_Method.java:80-98) via a window over ()
    w = Window.partitionBy()
    return (
        rank.where(F.col("rank") > 0)
        .withColumn("ppr", F.col("rank") / F.sum("rank").over(w))
        .select("node", "ppr")
    )
