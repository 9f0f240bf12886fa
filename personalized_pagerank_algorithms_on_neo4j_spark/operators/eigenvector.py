"""Eigenvector centrality — bounded power iteration, L2-normalized once.

The remaining classic centrality next to PageRank (operators/pagerank.py),
HITS (operators/hits.py), betweenness (operators/betweenness.py) and
harmonic closeness (functions/graphstats.py): score(v) proportional to the
principal eigenvector of the adjacency matrix, the `gds.eigenvector` verb
of the reference's host platform.

Three deliberate conventions:

* **Shifted recurrence (A+I).** The loop iterates x_{i+1} = x_i + A^T x_i.
  A+I has the SAME eigenvectors as A with spectrum shifted to lambda+1, so
  for any symmetric adjacency the principal eigenvector wins strictly
  (|lambda+1| is maximized only at lambda_max) — plain power iteration
  oscillates forever on bipartite components (lambda and -lambda tie in
  magnitude), and real graphs are full of near-bipartite star fringes.
  One extra UNION branch per superstep, no extra shuffle key.

* **No per-round normalization.** Power iteration is scale-invariant —
  x_k / ||x_k|| is identical whether you normalize every round or once at
  the end — so the loop runs the raw recurrence and divides by the L2
  norm exactly once.  That keeps the per-round work to one join + one sum
  (no scalar reduction per superstep) and concentrates all cross-engine
  float exposure in a single final division, orders of magnitude under
  the ROUND(_, 9) gate (same drift argument as the power method oracle).
  Magnitudes stay far inside double range for any sane iteration count
  (score <= (max_degree+1)^iterations; 1e6^20 << 1e308).

* **Symmetrized by default.** On a DAG (the TPC-H projection is one: all
  edges point customer -> supplier -> nation) the pure adjacency part is
  nilpotent and directed scores degenerate to hop-count polynomials.
  `gds.eigenvector` is likewise documented for undirected projections;
  ``symmetrize=True`` walks both edge directions.  Directed inputs with
  real cycles can pass ``symmetrize=False``.

Scale shape: the symmetrized distinct edge table is derived once and
checkpointed; each superstep shuffles only the O(n) score vector against
it under the shared iterative-loop discipline (plans/iterative.py: AQE
off, state-scaled partitions, broadcast-gated state side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import LOCAL_EDGE_THRESHOLD
from ..functions.graphstats import symmetrize_edges
from ..plans.iterative import (
    BROADCAST_NODE_BOUND,
    SuperstepLoop,
    loop_shuffle_partitions,
    static_superstep_plan,
)

__all__ = ["eigenvector_centrality", "eigenvector_oracle_sql"]


def eigenvector_centrality(
    spark: SparkSession,
    edges: DataFrame,
    iterations: int = 10,
    symmetrize: bool = True,
) -> DataFrame:
    """(node, score) for every node incident to an edge: ``iterations``
    rounds of x <- x + A^T x from the all-ones vector, then one L2
    normalization, rounded to 9 decimals."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if symmetrize:
        e = symmetrize_edges(edges)
    else:
        e = (
            edges.select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
    e = e.localCheckpoint(eager=True)  # read every superstep
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    # Driver-local kernel under the edge cutoff: the shifted recurrence
    # x <- x + A^T x on a dense vector.  All quantities stay INTEGRAL
    # until they exceed 2^53 (adjacency weights are 1, x starts at 1), so
    # the replay is typically bit-exact, and in any case within the
    # summation-order drift the unrolled oracle already tolerates.  The
    # final normalization/round below runs through the identical Spark
    # expressions either way.
    if e.count() <= LOCAL_EDGE_THRESHOLD:
        score = _eigenvector_scores_local(spark, e, nodes, iterations)
    else:
        score = nodes.select("node", F.lit(1.0).alias("score"))
        loop = SuperstepLoop(checkpoint_every=4)
        small = n <= BROADCAST_NODE_BOUND
        loop_parts = loop_shuffle_partitions(spark, n) if small else None
        with static_superstep_plan(spark, shuffle_partitions=loop_parts):
            for _ in range(iterations):
                sj = F.broadcast(score) if small else score
                step = sj.join(e, sj.node == e.src).select(
                    F.col("dst").alias("node"), F.col("score")
                )
                # the +I self term keeps every node in the frame each
                # round, so no end-of-loop left join against the node
                # table is needed
                score = (
                    step.unionAll(score.select("node", "score"))
                    .groupBy("node")
                    .agg(F.sum("score").alias("score"))
                )
                score = loop.materialize(score)
    score = score.localCheckpoint(eager=True)  # read by norm + result branch
    norm = score.agg(F.sqrt(F.sum(F.col("score") * F.col("score"))).alias("_n"))
    return score.crossJoin(F.broadcast(norm)).select(
        "node", F.round(F.col("score") / F.col("_n"), 9).alias("score")
    )


def _eigenvector_scores_local(
    spark: SparkSession, e: DataFrame, nodes: DataFrame, iterations: int
) -> DataFrame:
    """Raw (node, score) from the dense replay of the shifted power
    recurrence; normalization stays in the caller's Spark tail."""
    import numpy as np
    import pandas as pd

    epd = e.select("src", "dst").toPandas()
    ids = np.sort(
        nodes.toPandas()["node"].to_numpy(dtype=np.int64), kind="stable"
    )
    es = np.searchsorted(ids, epd["src"].to_numpy(dtype=np.int64))
    ed = np.searchsorted(ids, epd["dst"].to_numpy(dtype=np.int64))
    x = np.ones(len(ids))
    for _ in range(iterations):
        x = x + np.bincount(ed, weights=x[es], minlength=len(ids))
    return spark.createDataFrame(
        pd.DataFrame({"node": ids, "score": x}), "node long, score double"
    )


def eigenvector_oracle_sql(
    edges_sql: str, iterations: int = 10, symmetrize: bool = True
) -> str:
    """DuckDB twin: the identical recurrence unrolled as chained CTEs."""
    if symmetrize:
        und = """SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw
  ) WHERE src <> dst"""
    else:
        und = "SELECT DISTINCT src, dst FROM raw WHERE src <> dst"
    ctes = [
        f"raw AS ({edges_sql})",
        f"e AS MATERIALIZED ({und})",
        """nod AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst FROM e)""",
        "ev0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS score FROM nod)",
    ]
    for i in range(iterations):
        ctes.append(
            f"""ev{i + 1} AS MATERIALIZED (
  SELECT node, SUM(score) AS score FROM (
    SELECT e.dst AS node, t.score FROM ev{i} t JOIN e ON t.node = e.src
    UNION ALL
    SELECT node, score FROM ev{i}
  ) u GROUP BY node)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body},
nrm AS (SELECT SQRT(SUM(score * score)) AS nv FROM ev{iterations})
SELECT node, ROUND(score / (SELECT nv FROM nrm), 9) AS score
FROM ev{iterations}
"""
