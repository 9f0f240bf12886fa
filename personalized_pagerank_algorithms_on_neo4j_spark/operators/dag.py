"""DAG topological layers / longest-path depth — the `gds.dag` verbs.

`topological_layers` assigns every node its longest-path distance from
any source (in-degree-0 node): layer 0 = sources, layer(v) = 1 +
max(layer(pred)).  (layer, node) is a valid topological order key, and
the layer histogram is the stage structure a scheduler parallelizes by —
the standard shape for dependency graphs (build systems, lineage DAGs,
feature pipelines).

Algorithm: monotone max-plus relaxation — every round one in-edge join +
one node-keyed max; layers only ever INCREASE and the recursion reaches
a fixed point iff the graph is acyclic (on a cycle the max-plus walk
grows forever), so the convergence probe doubles as distributed CYCLE
DETECTION: ``strict`` raises when the round budget passes without a
fixed point instead of returning silently-truncated depths.  A depth-d
DAG needs d relaxation rounds plus ONE confirming no-op round (budgeted
separately by the loop), so the fixed-round oracle trick applies
(rounds past the fixed point are no-ops) and the DuckDB twin is an
exact unroll.

Scale shape: state is one (node, layer) frame; each round is the same
edges⋈state + groupBy-max profile as every superstep verb here, run
under the superstep discipline with stats-reset checkpoints; the
convergence probe is a 1-row monotone sum aggregate (layers only grow),
never a frame-equality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.iterative import (
    loop_shuffle_partitions,
    static_superstep_plan,
    stats_reset_checkpoint,
)

DAG_MAX_ROUNDS = 64  # supported DAG depth; convergence breaks out early


def topological_layers(
    edges: DataFrame, max_rounds: int = DAG_MAX_ROUNDS, strict: bool = True
) -> DataFrame:
    """(node, layer): longest-path-from-source depth of every node of
    ``edges(src, dst)``.  ``max_rounds`` is the supported DEPTH: a
    depth-d DAG needs d relaxation rounds plus ONE no-op round to
    confirm the fixed point, so the loop runs max_rounds + 1 times.
    Raises (``strict``) if no fixed point by then — which for a
    reachable cycle is guaranteed, so this is also the engine's cycle
    detector."""
    spark = edges.sparkSession
    e = stats_reset_checkpoint(
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
    )
    layers = stats_reset_checkpoint(
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("layer"))
    )
    n0 = layers.count()

    def _sum(df: DataFrame) -> int:
        # exact monotone convergence check (decimal: no silent wrap)
        v = df.agg(
            F.sum(F.col("layer").cast("decimal(38,0)")).alias("s")
        ).collect()[0][0]
        return int(v) if v is not None else 0

    prev = _sum(layers)
    converged = False
    with static_superstep_plan(spark, loop_shuffle_partitions(spark, n0)):
        # + 1: the confirming no-op round (depth d converges at round d+1)
        for _ in range(int(max_rounds) + 1):
            relaxed = (
                e.join(
                    layers.select(
                        F.col("node").alias("src"), F.col("layer").alias("_pl")
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg((F.max("_pl") + 1).alias("layer"))
            )
            layers = stats_reset_checkpoint(
                layers.unionAll(relaxed)
                .groupBy("node")
                .agg(F.max("layer").alias("layer"))
            )
            cur = _sum(layers)
            if cur == prev:
                converged = True
                break
            prev = cur
    if strict and not converged:
        raise RuntimeError(
            f"topological_layers: no fixed point after max_rounds="
            f"{max_rounds} relaxations (+1 confirm) — the graph has a "
            "cycle (or raise max_rounds for a deeper DAG)"
        )
    return layers


def topological_layers_oracle_sql(edges_sql: str, rounds: int) -> str:
    """DuckDB twin: the identical max-plus relaxation unrolled to
    ``rounds`` CTEs — rounds past the DAG depth are no-ops, so any
    unroll >= the depth at the compare scale is equal (the SSSP
    fixed-round trick)."""
    parts = [
        f"""WITH dag_e AS MATERIALIZED (
  SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
  FROM ({edges_sql}) de
),
dag_l0 AS MATERIALIZED (
  SELECT node, CAST(0 AS BIGINT) AS layer FROM (
    SELECT src AS node FROM dag_e UNION SELECT dst FROM dag_e
  ) nn
)"""
    ]
    for r in range(int(rounds)):
        parts.append(f""",
dag_l{r + 1} AS MATERIALIZED (
  SELECT node, MAX(layer) AS layer FROM (
    SELECT node, layer FROM dag_l{r}
    UNION ALL
    SELECT e.dst AS node, l.layer + 1 AS layer
    FROM dag_e e JOIN dag_l{r} l ON e.src = l.node
  ) x GROUP BY node
)""")
    parts.append(f"\nSELECT node, CAST(layer AS BIGINT) AS layer FROM dag_l{int(rounds)}")
    return "".join(parts)
