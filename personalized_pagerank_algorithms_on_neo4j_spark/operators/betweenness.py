"""Landmark-sampled betweenness centrality (Brandes dependency sums).

The fifth graph-centrality verb next to pagerank / harmonic / HITS /
k-core.  The reference repo ships no betweenness of its own, but its
Neo4j host answers `gds.betweenness` (sampled Brandes) out of the box —
a user switching from the reference keeps that capability here.

Brandes (2001) per landmark s:
  forward  — BFS levels carrying sigma(v) = number of shortest s-v paths
             (sigma is INTEGER, summed level-synchronously: every
             predecessor's sigma is final when its level is the frontier,
             so one groupBy per level is exact — and integer sigma makes
             the forward pass bit-identical across engines);
  backward — dependency accumulation from the deepest level up:
             delta(v) = sum over successors w one level deeper of
             sigma(v)/sigma(w) * (1 + delta(w)).
  bc(v)    = sum over landmarks of delta(v), v not the landmark itself.

All landmarks ride the SAME superstep loops ((source, node)-keyed state,
the bfs_distances_multi pattern), so the sweep is one forward job chain +
one backward job chain regardless of landmark count.  Supersteps are
bounded by the graph eccentricity from the landmarks (<= max_hops); both
directions follow the iterative-plan discipline (AQE off, state-scaled
partitions, broadcast-gated frontier).

Scale note: sigma counts grow with shortest-path multiplicity; they stay
exact while < 2^63 (Spark wraps silently past that, DuckDB raises) — a
gate-scale guard asserts the corpus stays orders of magnitude below the
bound.

Cross-engine float discipline: delta is accumulated in INTEGER MICRO-
UNITS, not doubles.  Each per-edge contribution is computed elementwise
(sigma_v / sigma_w * (1e6 + delta_w), identical IEEE ops on identical
integer inputs in both engines), rounded to a BIGINT, then summed —
integer sums are summation-order-independent, so the ROUND(float-SUM, 6)
.5-boundary flip that bit adamic_adar cannot occur.  The quantized
recurrence (±1 micro-unit per edge per level) IS the operator contract;
both engines implement it bit-identically.  Output bc_micros is integer.
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


DELTA_SCALE = 1_000_000  # micro-units per 1.0 of Brandes dependency


def betweenness_landmarks(
    graph: PropertyGraph, n_landmarks: int = 8, max_hops: int = 6
) -> DataFrame:
    """(node, bc_micros): Brandes dependency sums (in 1e-6 units) over the
    landmark sample.

    Landmarks are the ``n_landmarks`` highest-out-degree nodes, ties by id
    — read from the cached ``graph.degrees`` frame exactly like
    `harmonic_centrality` (no fresh edge aggregation).  Output covers
    every node at dist >= 1 from any landmark (zero scores included — a
    leaf has bc 0 but IS part of the report); landmarks contribute no
    dependency to themselves, per Brandes.
    """
    sources = (
        graph.degrees.where(F.col("out_degree") > 0)
        .orderBy(F.desc("out_degree"), F.asc("node"))
        .limit(n_landmarks)
        .select(F.col("node").alias("source"))
    )
    return _brandes_dependency(graph, sources, n_landmarks, max_hops)


def betweenness_sampled(
    graph: PropertyGraph,
    n_pivots: int = 16,
    seed: int = 9,
    max_hops: int = 6,
) -> DataFrame:
    """(node, bc_micros_est): the Brandes-Pich (2007) pivot-sampled
    betweenness ESTIMATOR — ``n_pivots`` pivots drawn uniformly from the
    out-degree>0 nodes by hash rank (the `exact_k_sample` draw: k
    smallest `portable_hash(node, seed)` values, ties by id — seeded,
    rerun-stable, identical in both engines), dependency sums scaled by
    n_eligible / k.

    Estimator contract: sources with no out-edges contribute zero
    dependency, so E[(n_eligible/k) * sum_{s in S} delta_s(v)] equals the
    full Brandes sum over ALL sources; Hoeffding gives additive error
    O(n * sqrt(log n / k)) on every node's score with high probability
    (Brandes & Pich 2007).  Scaling is integer: est = sum * n_eligible
    DIV k — exact cross-engine arithmetic, and with k == n_eligible the
    estimator degenerates to the exact full Brandes sum (pinned by
    tests/test_betweenness_sampled.py).
    """
    from ..functions.text import portable_hash

    eligible = graph.degrees.where(F.col("out_degree") > 0)
    n_eligible = eligible.count()
    k = min(n_pivots, n_eligible) or 1
    sources = (
        eligible.select(
            F.col("node").alias("source"),
            portable_hash(F.col("node"), seed).alias("_h"),
        )
        .orderBy(F.asc("_h"), F.asc("source"))
        .limit(n_pivots)
        .select("source")
    )
    dep = _brandes_dependency(graph, sources, k, max_hops)
    # integer DIV (never a double divide: the product can exceed the
    # 2^53 double-exact range long before it threatens the 2^63 long)
    return dep.select(
        "node",
        F.expr(f"(bc_micros * {int(n_eligible)}) DIV {int(k)}").alias(
            "bc_micros_est"
        ),
    )


def _brandes_dependency(
    graph: PropertyGraph, sources: DataFrame, n_sources: int, max_hops: int
) -> DataFrame:
    """Core Brandes sweep (module doc): batched forward sigma levels +
    backward micro-unit delta levels from the given `source`-column frame;
    returns the UNSCALED per-node dependency sums."""
    spark = graph.spark
    edges = graph.edges.select("src", "dst")
    state_bound = graph.n * max(1, n_sources)
    small = state_bound <= BROADCAST_NODE_BOUND
    loop_parts = loop_shuffle_partitions(spark, state_bound) if small else None

    sp = sources.select(
        "source",
        F.col("source").alias("node"),
        F.lit(0).cast("int").alias("dist"),
        F.lit(1).cast("long").alias("sigma"),
    )
    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        sp = sp.localCheckpoint(eager=True)
        frontier = sp
        for h in range(1, max_hops + 1):
            f = F.broadcast(frontier) if small else frontier
            cand = (
                f.join(edges, f["node"] == edges.src)
                .select("source", F.col("dst").alias("node"), "sigma")
                .groupBy("source", "node")
                .agg(F.sum("sigma").alias("sigma"))
                .join(sp.select("source", "node"), ["source", "node"], "left_anti")
                .select(
                    "source",
                    "node",
                    F.lit(h).cast("int").alias("dist"),
                    "sigma",
                )
                .localCheckpoint(eager=True)
            )
            if cand.isEmpty():
                break
            sp = sp.unionByName(cand).localCheckpoint(eager=True)
            frontier = cand

        lmax = sp.agg(F.max("dist")).first()[0]
        if not lmax:  # None (no landmarks / no edges) or 0 (no expansion)
            return spark.createDataFrame([], "node long, bc_micros long")
        delta = (
            sp.where(F.col("dist") == lmax)
            .select("source", "node", F.lit(0).cast("long").alias("delta"))
            .localCheckpoint(eager=True)
        )
        levels = [delta]
        # down to level 1 only: the landmarks' own delta (level 0) has no
        # consumer — computing it would be a wasted superstep
        for lvl in range(lmax - 1, 0, -1):
            parents = sp.where(F.col("dist") == lvl)
            child = delta.join(
                sp.where(F.col("dist") == lvl + 1).select(
                    "source", "node", F.col("sigma").alias("sigma_w")
                ),
                ["source", "node"],
            )
            pf = F.broadcast(parents) if small else parents
            # per-edge contribution in micro-units, rounded to a long
            # BEFORE the sum: identical elementwise IEEE ops in both
            # engines, then an order-independent integer sum
            term = F.round(
                F.col("sigma").cast("double")
                / F.col("sigma_w").cast("double")
                * (F.lit(DELTA_SCALE).cast("long") + F.col("delta")).cast(
                    "double"
                )
            ).cast("long")
            contrib = (
                pf.join(edges, pf["node"] == edges.src)
                .select(
                    "source",
                    F.col("node").alias("v"),
                    "sigma",
                    F.col("dst").alias("node"),
                )
                .join(child.select("source", "node", "sigma_w", "delta"),
                      ["source", "node"])
                .groupBy("source", "v")
                .agg(F.sum(term).alias("delta"))
                .withColumnRenamed("v", "node")
            )
            delta = (
                parents.select("source", "node")
                .join(contrib, ["source", "node"], "left")
                .select(
                    "source",
                    "node",
                    F.coalesce(F.col("delta"), F.lit(0).cast("long")).alias(
                        "delta"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            levels.append(delta)

    out = levels[0]
    for frame in levels[1:]:
        out = out.unionByName(frame)
    return out.groupBy("node").agg(F.sum("delta").alias("bc_micros"))


def _brandes_oracle_ctes(edges_sql: str, lm_cte: str, max_hops: int) -> tuple[str, str]:
    """Shared CTE body for both oracle builders: (ctes, delta-union)."""
    R = max_hops
    ctes = [
        f"e AS MATERIALIZED ({edges_sql})",
        lm_cte,
        f"""walk(source, node, dist) AS (
  SELECT source, source AS node, 0 AS dist FROM lm
  UNION
  SELECT w.source, e.dst, w.dist + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.dist < {R})""",
        "md AS MATERIALIZED (SELECT source, node, CAST(MIN(dist) AS INT)"
        " AS dist FROM walk GROUP BY 1, 2)",
        "s0 AS (SELECT source, node, CAST(1 AS BIGINT) AS sigma FROM md"
        " WHERE dist = 0)",
    ]
    for l in range(1, R + 1):
        ctes.append(f"""s{l} AS (
  SELECT p.source, e.dst AS node, CAST(SUM(p.sigma) AS BIGINT) AS sigma
  FROM s{l - 1} p JOIN e ON e.src = p.node
  JOIN md ON md.source = p.source AND md.node = e.dst AND md.dist = {l}
  GROUP BY 1, 2)""")
    sg_union = " UNION ALL ".join(
        f"SELECT source, node, sigma, {l} AS dist FROM s{l}" for l in range(R + 1)
    )
    ctes.append(f"sg AS MATERIALIZED ({sg_union})")
    ctes.append(
        f"d{R} AS (SELECT source, node, CAST(0 AS BIGINT) AS delta"
        f" FROM md WHERE dist = {R})"
    )
    for l in range(R - 1, 0, -1):
        ctes.append(f"""d{l} AS (
  SELECT p.source, p.node, COALESCE(c.delta, CAST(0 AS BIGINT)) AS delta
  FROM (SELECT source, node FROM md WHERE dist = {l}) p
  LEFT JOIN (
    SELECT pv.source, pv.node,
           CAST(SUM(CAST(ROUND(
             CAST(pv.sigma AS DOUBLE) / CAST(ws.sigma AS DOUBLE)
             * CAST({DELTA_SCALE} + wd.delta AS DOUBLE)
           ) AS BIGINT)) AS BIGINT) AS delta
    FROM (SELECT source, node, sigma FROM sg WHERE dist = {l}) pv
    JOIN e ON e.src = pv.node
    JOIN d{l + 1} wd ON wd.source = pv.source AND wd.node = e.dst
    JOIN (SELECT source, node, sigma FROM sg WHERE dist = {l + 1}) ws
      ON ws.source = pv.source AND ws.node = e.dst
    GROUP BY 1, 2
  ) c ON c.source = p.source AND c.node = p.node)""")
    all_d = " UNION ALL ".join(f"SELECT * FROM d{l}" for l in range(R, 0, -1))
    return ",\n".join(ctes), all_d


def betweenness_oracle_sql(
    edges_sql: str, n_landmarks: int = 8, max_hops: int = 6
) -> str:
    """DuckDB twin: recursive min-dist CTE (identical to the harmonic
    walk), then forward sigma levels and backward delta levels unrolled to
    ``max_hops`` — levels past the true eccentricity are empty, so the
    extra unrolled rounds are no-ops (the SSSP fixed-round argument)."""
    lm = f"""lm AS MATERIALIZED (
  SELECT src AS source FROM (SELECT src, COUNT(*) AS od FROM e GROUP BY src)
  ORDER BY od DESC, src ASC LIMIT {n_landmarks})"""
    body, all_d = _brandes_oracle_ctes(edges_sql, lm, max_hops)
    return f"""
WITH RECURSIVE {body}
SELECT node, CAST(SUM(delta) AS BIGINT) AS bc_micros
FROM ({all_d}) GROUP BY node
"""


def betweenness_sampled_oracle_sql(
    edges_sql: str, n_pivots: int = 16, seed: int = 9, max_hops: int = 6
) -> str:
    """DuckDB twin of `betweenness_sampled`: identical algebra with the
    hash-ranked pivot draw and the integer n_eligible/k scaling — the
    same-algebra gate the exact-restricted-to-pivots contract calls
    for."""
    lm = f"""lm AS MATERIALIZED (
  SELECT src AS source FROM (
    SELECT src,
           CAST(('0x' || substring(md5(CAST(src AS VARCHAR) || '#' || '{seed}'),
                 1, 12)) AS BIGINT) AS h
    FROM (SELECT DISTINCT src FROM e) d)
  ORDER BY h ASC, src ASC LIMIT {n_pivots})"""
    body, all_d = _brandes_oracle_ctes(edges_sql, lm, max_hops)
    return f"""
WITH RECURSIVE {body},
bs_stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_eligible,
         CAST(LEAST({n_pivots}, COUNT(*)) AS BIGINT) AS k
  FROM (SELECT DISTINCT src FROM e) d
)
SELECT node, (CAST(SUM(delta) AS BIGINT) * s.n_eligible) // s.k AS bc_micros_est
FROM ({all_d}) CROSS JOIN bs_stats s
GROUP BY node, s.n_eligible, s.k
"""
