"""Weighted single-source shortest paths — the `gds.shortestPath` verb.

Neo4j GDS ships Dijkstra/delta-stepping next to the PageRank procedures the
reference benchmarks (same `gds.*` surface as Neo4j_Method.java:35); a
priority queue doesn't distribute, so this engine computes the same
distances with FRONTIER BELLMAN-FORD relaxation — the delta-stepping shape
that does: each superstep relaxes only the edges out of nodes whose
distance improved last round, merges candidates with a min-aggregate, and
stops when the frontier is empty (a true fixed point) or at ``max_rounds``.

Costs are POSITIVE INTEGERS (the caller derives them; the entry uses the
order-volume weights), so every distance is exact in both engines — the
DuckDB oracle (`sssp_oracle_sql`) unrolls naive relaxation rounds and
needs no float rounding gate. Fixed-point algebra makes the two sides
equal at ANY unrolled round count >= Spark's stopping round: once a round
changes nothing, further rounds change nothing (monotone min-plus
iteration), so the oracle's extra rounds are no-ops rather than a
convergence-depth dependency (contrast KCORE_ORACLE_ROUNDS, which peels a
SHRINKING graph and does depend on depth).

Scale shape: the frontier is node-bounded and usually tiny — under
``BROADCAST_NODE_BOUND`` it broadcasts into the edge join so the cached
edge table never re-exchanges. The distance vector merges candidates with
a node-keyed FULL OUTER join, which Spark cannot broadcast on either
side, so it stays a shuffle join by design — but the distance side is
already node-partitioned by the previous round's checkpointed merge, so
only the (frontier-bounded) candidate side actually moves. Early exit
reads the frontier count off the eager checkpoint each round — one
scalar per superstep, no extra scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.iterative import (
    BROADCAST_NODE_BOUND,
    loop_shuffle_partitions,
    static_superstep_plan,
)


def undirected_min_cost(edges: DataFrame) -> DataFrame:
    """(src, dst, w) both directions, MIN cost per ordered pair — the
    undirected view of a weighted edge list (long costs)."""
    e = edges.select("src", "dst", F.col("w").cast("long").alias("w")).where(
        F.col("src") != F.col("dst")
    )
    return (
        e.unionAll(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
    )


def sssp_weighted(
    spark: SparkSession,
    edges: DataFrame,
    source: int,
    max_rounds: int = 20,
    n_hint: int | None = None,
) -> DataFrame:
    """(node, dist) exact min-cost distances from ``source`` over a
    weighted edge list (src, dst, w — positive long costs), for every
    reachable node. ``edges`` is used as given (pass
    ``undirected_min_cost(...)`` for the undirected metric).
    ``n_hint`` bounds the state for broadcast gating and partition
    scaling; when omitted, NO scaling happens (the loop keeps the
    session's shuffle partitioning and the frontier is never broadcast),
    so callers that know graph.n should always pass it."""
    small = n_hint is not None and n_hint <= BROADCAST_NODE_BOUND
    loop_parts = (
        loop_shuffle_partitions(spark, n_hint) if small else None
    )
    dist = spark.createDataFrame(
        [(int(source), 0)], "node long, dist long"
    )
    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        edges = edges.localCheckpoint(eager=True)
        dist = dist.localCheckpoint(eager=True)
        frontier = dist
        for _ in range(max_rounds):
            fj = F.broadcast(frontier) if small else frontier
            cand = (
                edges.join(fj, edges.src == fj["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
            )
            # NO broadcast hint here: Spark cannot broadcast either side of
            # a full outer join (the hint would be silently dropped with a
            # HintErrorLogger warning per round). The merge stays a shuffle
            # join, but `dist` is already node-partitioned by the previous
            # round's checkpointed merge, so only the candidate side moves.
            merged = dist.join(cand, "node", "full_outer").select(
                "node",
                F.least(F.col("dist"), F.col("cand")).alias("new_dist"),
                (
                    F.col("dist").isNull()
                    | (F.col("cand") < F.col("dist"))
                ).alias("improved"),
            )
            # checkpoint EVERY round: merged is read three ways (frontier
            # filter, next dist, the emptiness probe) and is the early-exit
            # boundary, so per-round materialization is load-bearing here —
            # no cadence object needed
            merged = merged.localCheckpoint(eager=True)
            frontier = merged.where("improved").select(
                "node", F.col("new_dist").alias("dist")
            )
            dist = merged.select("node", F.col("new_dist").alias("dist"))
            if frontier.limit(1).count() == 0:
                break
    return dist


def sssp_oracle_sql(
    weighted_edges_sql: str, source_sql: str, rounds: int = 20
) -> str:
    """DuckDB twin: ``rounds`` naive relaxation rounds from ``source_sql``
    (a 1-row SELECT yielding column ``s``) over ``weighted_edges_sql``
    (src, dst, w — the SAME edge view the Spark side was given). Any
    ``rounds`` >= the Spark side's stopping round yields the identical
    fixed point (see module docstring)."""
    ctes = [
        f"ue AS MATERIALIZED ({weighted_edges_sql})",
        f"srcn AS ({source_sql})",
        """d0 AS MATERIALIZED (
  SELECT s AS node, CAST(0 AS BIGINT) AS dist FROM srcn)""",
    ]
    for i in range(rounds):
        ctes.append(
            f"""d{i + 1} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{i}
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM d{i} d JOIN ue e ON d.node = e.src
  ) u GROUP BY node)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT node, dist FROM d{rounds}
"""


def sssp_weighted_multi(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    max_rounds: int = 20,
    n_hint: int | None = None,
) -> DataFrame:
    """(landmark, node, dist) exact min-cost distances from EVERY source in
    ``sources`` (a 1-column ``source`` frame), batched through ONE
    superstep loop — k landmark relaxations ride the same per-round edge
    join instead of k sequential loops (the `bfs_distances_multi` shape,
    weighted). Same fixed-point/early-exit algebra as `sssp_weighted`,
    applied per landmark; the state is bounded by k x n, so pass
    ``n_hint`` as graph.n x len(sources) for the broadcast gate."""
    small = n_hint is not None and n_hint <= BROADCAST_NODE_BOUND
    loop_parts = loop_shuffle_partitions(spark, n_hint) if small else None
    src = F.col("source").cast("long")  # int32 inputs must not leak into
    dist = sources.distinct().select(   # the output schema (dtype parity)
        src.alias("landmark"),
        src.alias("node"),
        F.lit(0).cast("long").alias("dist"),
    )
    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        edges = edges.localCheckpoint(eager=True)
        dist = dist.localCheckpoint(eager=True)
        frontier = dist
        for _ in range(max_rounds):
            fj = F.broadcast(frontier) if small else frontier
            cand = (
                edges.join(fj, edges.src == fj["node"])
                .groupBy(F.col("landmark"), F.col("dst").alias("node"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
            )
            # full outer joins cannot broadcast (see sssp_weighted); the
            # dist side stays (landmark, node)-partitioned from the
            # previous round's checkpoint, only candidates move
            merged = dist.join(cand, ["landmark", "node"], "full_outer").select(
                "landmark",
                "node",
                F.least(F.col("dist"), F.col("cand")).alias("new_dist"),
                (
                    F.col("dist").isNull()
                    | (F.col("cand") < F.col("dist"))
                ).alias("improved"),
            )
            merged = merged.localCheckpoint(eager=True)
            frontier = merged.where("improved").select(
                "landmark", "node", F.col("new_dist").alias("dist")
            )
            dist = merged.select(
                "landmark", "node", F.col("new_dist").alias("dist")
            )
            if frontier.limit(1).count() == 0:
                break
    return dist


def sssp_multi_oracle_sql(
    weighted_edges_sql: str, sources_sql: str, rounds: int = 20
) -> str:
    """DuckDB twin of `sssp_weighted_multi`: ``sources_sql`` yields a
    column ``s`` (one row per landmark); ``rounds`` naive relaxation
    rounds carry the landmark through every CTE. Equal at any round
    count past the per-landmark fixed points."""
    ctes = [
        f"ue AS MATERIALIZED ({weighted_edges_sql})",
        f"srcs AS (SELECT DISTINCT s FROM ({sources_sql}) s0)",
        """m0 AS MATERIALIZED (
  SELECT s AS landmark, s AS node, CAST(0 AS BIGINT) AS dist FROM srcs)""",
    ]
    for i in range(rounds):
        ctes.append(
            f"""m{i + 1} AS MATERIALIZED (
  SELECT landmark, node, MIN(dist) AS dist FROM (
    SELECT landmark, node, dist FROM m{i}
    UNION ALL
    SELECT d.landmark, e.dst AS node, d.dist + e.w AS dist
    FROM m{i} d JOIN ue e ON d.node = e.src
  ) u GROUP BY landmark, node)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT landmark, node, dist FROM m{rounds}
"""
