"""Single-source BFS hop distances (frontier-synchronous expansion).

The fourth iterative engine next to push / power / counted walks. The
reference repo ships no BFS of its own, but its Neo4j host answers
hop-distance / shortestPath queries out of the box — a user switching
from the reference keeps that capability here.

Plan per superstep: expand the frontier through the cached edge table
(broadcast frontier under the node-count bound, shuffle join above it),
dedup the candidates, then anti-join the visited set so each node is
labeled with its FIRST (minimal) hop count. The anti-join shuffles
O(visited) rows per superstep — the standard Pregel-BFS trade; the
alternative (carry every path and min-aggregate at the end) explodes
with path multiplicity and is strictly worse. State is node-bounded, so
the loop runs at state-scaled shuffle parallelism like the other
iterative engines (plans/iterative.loop_shuffle_partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import PropertyGraph
from ..plans.iterative import (
    BROADCAST_NODE_BOUND,
    loop_shuffle_partitions,
    static_superstep_plan,
)


def bfs_distances(
    graph: PropertyGraph, source: int, max_hops: int = 20
) -> DataFrame:
    """(node, dist) for every node reachable from ``source`` within
    ``max_hops`` directed hops; dist is the minimal hop count."""
    spark = graph.spark
    edges = graph.edges.select("src", "dst")
    small = graph.n <= BROADCAST_NODE_BOUND
    loop_parts = loop_shuffle_partitions(spark, graph.n) if small else None
    dist = spark.createDataFrame([(int(source), 0)], "node long, dist int")
    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        dist = dist.localCheckpoint(eager=True)
        frontier = dist.select("node")
        for h in range(1, max_hops + 1):
            f = F.broadcast(frontier) if small else frontier
            nxt = (
                f.join(edges, f["node"] == edges.src)
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(dist.select("node"), "node", "left_anti")
                .select("node", F.lit(h).cast("int").alias("dist"))
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            dist = dist.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt.select("node")
    return dist


def bfs_distances_multi(
    graph: PropertyGraph, sources: DataFrame, max_hops: int = 20
) -> DataFrame:
    """(source, node, dist) for every (landmark, reachable node) pair —
    ALL sources advance through the SAME superstep loop, the batch-BFS
    pattern that makes landmark sweeps one job instead of |sources| jobs
    (the multi-target analogue of backward_search_all). ``sources`` is a
    one-column DataFrame named ``source``. State is keyed (source, node);
    everything else matches `bfs_distances`."""
    spark = graph.spark
    edges = graph.edges.select("src", "dst")
    # state and frontier are up to |sources| x n rows — the broadcast and
    # partition bounds must scale by the landmark count, not graph.n
    # alone (counting the tiny sources frame is one cheap action)
    # duplicate source rows would duplicate every (source, node, 0) seed row
    # (later hops dedup through distinct + anti-join, hop 0 would not),
    # double-counting dist=0 in any downstream aggregate
    sources = sources.distinct()
    n_src = max(1, sources.count())
    state_bound = graph.n * n_src
    small = state_bound <= BROADCAST_NODE_BOUND
    loop_parts = loop_shuffle_partitions(spark, state_bound) if small else None
    dist = sources.select(
        F.col("source").cast("long").alias("source"),
        F.col("source").cast("long").alias("node"),
        F.lit(0).cast("int").alias("dist"),
    )
    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        dist = dist.localCheckpoint(eager=True)
        frontier = dist.select("source", "node")
        for h in range(1, max_hops + 1):
            f = F.broadcast(frontier) if small else frontier
            nxt = (
                f.join(edges, f["node"] == edges.src)
                .select("source", F.col("dst").alias("node"))
                .distinct()
                .join(dist.select("source", "node"), ["source", "node"], "left_anti")
                .select("source", "node", F.lit(h).cast("int").alias("dist"))
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            dist = dist.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt.select("source", "node")
    return dist


def _landmark_sources(graph: PropertyGraph, n_landmarks: int) -> DataFrame:
    """The shared landmark rule for every landmark-approximated
    centrality: the ``n_landmarks`` highest-out-degree nodes,
    deterministic tie-break by id — ONE definition so harmonic and
    closeness can never diverge on which nodes they sweep from."""
    return (
        graph.degrees.where(F.col("out_degree") > 0)
        .orderBy(F.desc("out_degree"), F.asc("node"))
        .limit(n_landmarks)
        .select(F.col("node").alias("source"))
    )


def harmonic_centrality(
    graph: PropertyGraph, n_landmarks: int = 8, max_hops: int = 6
) -> DataFrame:
    """(node, n_reached, harmonic) — landmark-approximated harmonic
    centrality: one multi-source BFS from the ``n_landmarks``
    highest-out-degree nodes (deterministic tie-break by id), then
    harmonic = sum over landmarks of 1/dist (dist > 0), ROUND 6. The
    landmark approximation is the standard scale substitute for exact
    all-pairs closeness (which is O(n) BFS runs)."""
    d = bfs_distances_multi(
        graph, _landmark_sources(graph, n_landmarks), max_hops=max_hops
    )
    return (
        d.where(F.col("dist") > 0)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.round(F.sum(F.lit(1.0) / F.col("dist")), 6).alias("harmonic"),
        )
    )


def bfs_oracle_sql(edges_sql: str, source_sql: str, max_hops: int = 20) -> str:
    """DuckDB twin: recursive CTE with UNION dedup over (node, dist)
    pairs, min-dist per node at the end. ``source_sql`` must yield one
    row with a single BIGINT column ``s``."""
    return f"""
WITH RECURSIVE e AS MATERIALIZED ({edges_sql}),
srcn AS MATERIALIZED ({source_sql}),
walk(node, dist) AS (
  SELECT s AS node, 0 AS dist FROM srcn
  UNION
  SELECT e.dst, w.dist + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.dist < {max_hops}
)
SELECT node, CAST(MIN(dist) AS INT) AS dist FROM walk GROUP BY node
"""


def _landmark_bfs_prefix_sql(
    edges_sql: str, n_landmarks: int, max_hops: int
) -> str:
    """The shared recursive-CTE prefix of every landmark-centrality
    oracle: edges -> deterministic landmark set -> multi-source BFS ->
    per-(source, node) min distance in ``md`` — one copy so the harmonic
    and closeness oracles can never diverge on landmark or hop rules."""
    return f"""
WITH RECURSIVE e AS MATERIALIZED ({edges_sql}),
lm AS MATERIALIZED (
  SELECT src AS source FROM (
    SELECT src, COUNT(*) AS od FROM e GROUP BY src
  ) ORDER BY od DESC, src ASC LIMIT {n_landmarks}
),
walk(source, node, dist) AS (
  SELECT source, source AS node, 0 AS dist FROM lm
  UNION
  SELECT w.source, e.dst, w.dist + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.dist < {max_hops}
),
md AS (SELECT source, node, MIN(dist) AS dist FROM walk GROUP BY source, node)
"""


def harmonic_oracle_sql(
    edges_sql: str, n_landmarks: int = 8, max_hops: int = 6
) -> str:
    """DuckDB twin of `harmonic_centrality`: recursive CTE over
    (source, node, dist) seeded with the same deterministic landmarks."""
    prefix = _landmark_bfs_prefix_sql(edges_sql, n_landmarks, max_hops)
    return f"""{prefix}
SELECT node, COUNT(*) AS n_reached,
       ROUND(SUM(1.0 / dist), 6) AS harmonic
FROM md WHERE dist > 0 GROUP BY node
"""


def closeness_centrality(
    graph: PropertyGraph, n_landmarks: int = 8, max_hops: int = 6
) -> DataFrame:
    """(node, n_reached, total_dist, closeness) — landmark-approximated
    closeness centrality (the `gds.closeness` verb next to harmonic):
    one multi-source BFS from the ``n_landmarks`` highest-out-degree
    nodes (deterministic tie-break by id), then per node

        closeness = n_reached / total_dist

    over the landmarks that reach it (dist > 0) — the Wasserman-Faust
    shape restricted to the landmark set, the standard scale substitute
    for exact all-pairs closeness.  n_reached and total_dist are exact
    integers; the single division is ROUND(_, 6), so cross-engine
    equality is bit-exact.  Shares `bfs_distances_multi`'s batch loop and
    `_landmark_sources`' landmark rule — adding this metric costs one
    aggregate, not another BFS."""
    d = bfs_distances_multi(
        graph, _landmark_sources(graph, n_landmarks), max_hops=max_hops
    )
    return (
        d.where(F.col("dist") > 0)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.sum("dist").cast("long").alias("total_dist"),
            F.round(
                F.count(F.lit(1)).cast("double")
                / F.sum("dist").cast("double"),
                6,
            ).alias("closeness"),
        )
    )


def closeness_oracle_sql(
    edges_sql: str, n_landmarks: int = 8, max_hops: int = 6
) -> str:
    """DuckDB twin of `closeness_centrality`: the same recursive-CTE BFS
    prefix as the harmonic oracle, closing with the n/sum-dist
    aggregate."""
    prefix = _landmark_bfs_prefix_sql(edges_sql, n_landmarks, max_hops)
    return f"""{prefix}
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_reached,
       CAST(SUM(dist) AS BIGINT) AS total_dist,
       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(dist) AS DOUBLE), 6)
         AS closeness
FROM md WHERE dist > 0 GROUP BY node
"""


def diameter_double_sweep(
    edges: DataFrame, max_hops: int = 20
) -> DataFrame:
    """One row (far_a, far_b, diameter_lb): the classic double-sweep
    diameter lower bound over the UNDIRECTED reading — BFS from the
    smallest node id to its farthest node u (ties -> smallest id), then
    BFS from u; u's eccentricity lower-bounds the diameter (and is exact
    on trees).  Scoped to the start node's component, like every
    double-sweep.  Two bounded 1-row collects pick the sweep endpoints —
    the same driver-traffic class as the engine's convergence probes.

    Scale shape: two frontier BFS passes (the `bfs_distances` loop
    shape) over the symmetrized edge table; nothing else."""
    spark = edges.sparkSession
    und = (
        edges.select("src", "dst")
        .unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = und.select("src").distinct().count()
    s0_row = und.agg(F.min("src")).collect()[0][0]
    if s0_row is None:
        # Empty (or self-loop-only) edge table: no component to sweep.
        # Same guard class as boruvka_msf's n0 == 0 early return.
        return spark.createDataFrame(
            [], "far_a long, far_b long, diameter_lb long"
        )
    s0 = int(s0_row)

    def _sweep(source: int) -> DataFrame:
        dist = spark.createDataFrame([(source, 0)], "node long, dist int")
        with static_superstep_plan(spark, loop_shuffle_partitions(spark, n)):
            dist = dist.localCheckpoint(eager=True)
            frontier = dist.select("node")
            for h in range(1, max_hops + 1):
                nxt = (
                    frontier.join(und, frontier["node"] == und.src)
                    .select(F.col("dst").alias("node"))
                    .distinct()
                    .join(dist.select("node"), "node", "left_anti")
                    .select("node", F.lit(h).cast("int").alias("dist"))
                    .localCheckpoint(eager=True)
                )
                if nxt.isEmpty():
                    break
                dist = dist.unionByName(nxt).localCheckpoint(eager=True)
                frontier = nxt.select("node")
        return dist

    def _far(dist: DataFrame) -> tuple[int, int]:
        row = (
            dist.orderBy(F.desc("dist"), F.asc("node")).limit(1).collect()[0]
        )
        return int(row["node"]), int(row["dist"])

    u, _ = _far(_sweep(s0))
    v, ecc = _far(_sweep(u))
    a, b = (u, v) if u <= v else (v, u)
    return spark.createDataFrame(
        [(a, b, ecc)], "far_a long, far_b long, diameter_lb long"
    )


def diameter_oracle_sql(edges_sql: str, max_hops: int = 20) -> str:
    """DuckDB twin: two nested recursive BFS closures with the identical
    (dist DESC, node ASC) endpoint election."""
    return f"""
WITH RECURSIVE dd_e AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst FROM ({edges_sql}) r1
    UNION SELECT dst, src FROM ({edges_sql}) r2
  ) u WHERE src <> dst
),
dd_s0 AS (SELECT src AS s FROM dd_e ORDER BY src ASC LIMIT 1),
dd_w1(node, dist) AS (
  SELECT s AS node, 0 AS dist FROM dd_s0
  UNION
  SELECT e.dst, w.dist + 1 FROM dd_w1 w JOIN dd_e e ON e.src = w.node
  WHERE w.dist < {int(max_hops)}
),
dd_d1 AS (SELECT node, MIN(dist) AS dist FROM dd_w1 GROUP BY node),
dd_u AS (SELECT node AS s FROM dd_d1 ORDER BY dist DESC, node ASC LIMIT 1),
dd_w2(node, dist) AS (
  SELECT s AS node, 0 AS dist FROM dd_u
  UNION
  SELECT e.dst, w.dist + 1 FROM dd_w2 w JOIN dd_e e ON e.src = w.node
  WHERE w.dist < {int(max_hops)}
),
dd_d2 AS (SELECT node, MIN(dist) AS dist FROM dd_w2 GROUP BY node),
dd_v AS (SELECT node, dist FROM dd_d2 ORDER BY dist DESC, node ASC LIMIT 1)
SELECT CAST(LEAST(u.s, v.node) AS BIGINT) AS far_a,
       CAST(GREATEST(u.s, v.node) AS BIGINT) AS far_b,
       CAST(v.dist AS BIGINT) AS diameter_lb
FROM dd_u u CROSS JOIN dd_v v
"""
