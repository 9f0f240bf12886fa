"""HITS hubs & authorities (Kleinberg) — bounded power iteration.

The second eigenvector-style engine next to the PPR power method, sharing
its execution discipline: a fixed number of synchronous supersteps, AQE
off + state-scaled shuffle partitions inside the loop, localCheckpoint
lineage truncation, and a DuckDB oracle that replays the identical
recurrence as chained CTEs (cross-engine float drift stays orders of
magnitude under the ROUND(_, 9) gate — same argument as the power-method
oracle).

Per superstep: authority(v) = sum of hub over in-edges, hub(u) = sum of
authority over out-edges, each max-normalized (Kleinberg's normalization
choice is free; max keeps the recurrence division-exact in both engines
without a global L2 reduction). The normalizing max is one scalar —
computed as a 1-row aggregate and broadcast-cross-joined, never a global
window.
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


def hits(graph: PropertyGraph, iterations: int = 10) -> DataFrame:
    """(node, hub, authority) over every node incident to an edge, after
    ``iterations`` synchronous update rounds from the all-ones hub vector,
    max-normalized per round, rounded to 9 decimals at the end."""
    spark = graph.spark
    # Driver-local kernel under the LocalGraph cutoff: the identical
    # alternating recurrence on dense vectors — per-round sums differ
    # only in ORDER from the hash aggregate (the drift class the unrolled
    # oracle tolerates under the final ROUND(_, 9)); the normalizing max
    # and the per-row division are the same exact IEEE ops.  Replaces
    # ~6 Spark jobs per iteration (two join+agg branches, two
    # checkpoints, two scalar maxima).
    if graph.fits_local():
        import numpy as np
        import pandas as pd

        lg = graph.local
        es, ed = lg.edge_src, lg.edge_dst
        h = np.ones(lg.n)
        a = np.zeros(lg.n)
        # zero edges -> no incident nodes -> empty result either way;
        # skip the loop rather than divide by an all-zero max
        for _ in range(iterations if len(es) else 0):
            a = np.bincount(ed, weights=h[es], minlength=lg.n)
            a = a / a.max()
            h = np.bincount(es, weights=a[ed], minlength=lg.n)
            h = h / h.max()
        inc = (lg.out_deg + lg.in_deg) > 0  # incident nodes only
        pdf = pd.DataFrame(
            {"node": lg.ids[inc], "hub": h[inc], "authority": a[inc]}
        )
        return spark.createDataFrame(
            pdf, "node long, hub double, authority double"
        ).select(
            "node",
            F.round("hub", 9).alias("hub"),
            F.round("authority", 9).alias("authority"),
        )
    edges = graph.edges.select("src", "dst")
    small = graph.n <= BROADCAST_NODE_BOUND
    loop_parts = loop_shuffle_partitions(spark, graph.n) if small else None
    if small:
        # score vectors are node-bounded: broadcast them into the edge
        # joins so the cached edge table NEVER re-exchanges (the
        # state-scaled loop would otherwise drag 600k+ edge rows into one
        # partition per join — measured 10 s vs 2 s at sf0.1)
        e_src = e_dst = edges
    else:
        # at scale: join each direction against the edge cache already
        # partitioned on that join key, so only the score vector shuffles
        e_src = graph.edges_deg.select("src", "dst")
        e_dst = graph.edges_by_dst.select("src", "dst")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )

    def _max_normalize(df: DataFrame, col: str) -> DataFrame:
        # checkpoint BEFORE deriving the max: the normalizer reads its
        # input twice (scalar aggregate + the join branch), and without
        # materialization both reads replay the full edge join
        df = df.localCheckpoint(eager=True)
        m = df.agg(F.max(col).alias("_m"))
        return df.crossJoin(F.broadcast(m)).select(
            "node", (F.col(col) / F.col("_m")).alias(col)
        )

    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        nodes = nodes.localCheckpoint(eager=True)
        h = nodes.select("node", F.lit(1.0).alias("hub")).localCheckpoint(
            eager=True
        )
        a = None
        for _ in range(iterations):
            hj = F.broadcast(h) if small else h
            a = _max_normalize(
                e_src.join(hj, e_src.src == hj["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("hub").alias("authority")),
                "authority",
            )
            aj = F.broadcast(a) if small else a
            h = _max_normalize(
                e_dst.join(aj, e_dst.dst == aj["node"])
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("authority").alias("hub")),
                "hub",
            )
    out = nodes.join(h, "node", "left")
    if a is not None:
        out = out.join(a, "node", "left")
    else:  # iterations == 0
        out = out.withColumn("authority", F.lit(None).cast("double"))
    return out.select(
        "node",
        F.round(F.coalesce("hub", F.lit(0.0)), 9).alias("hub"),
        F.round(F.coalesce("authority", F.lit(0.0)), 9).alias("authority"),
    )


def hits_oracle_sql(edges_sql: str, iterations: int = 10) -> str:
    """DuckDB twin replaying the identical bounded recurrence (including
    the iterations=0 boundary the Spark side supports: all-ones hubs,
    zero authorities)."""
    if iterations < 1:
        return f"""
WITH e AS MATERIALIZED ({edges_sql}),
n AS (SELECT DISTINCT node FROM (
  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e))
SELECT node, 1.0 AS hub, 0.0 AS authority FROM n
"""
    ctes = [
        f"e AS MATERIALIZED ({edges_sql})",
        """n AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e))""",
        "h0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM n)",
    ]
    for i in range(iterations):
        ctes.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(h.hub) AS authority
  FROM e JOIN h{i} h ON e.src = h.node GROUP BY e.dst)"""
        )
        ctes.append(
            f"""a{i} AS MATERIALIZED (
  SELECT node, authority / (SELECT MAX(authority) FROM ar{i}) AS authority
  FROM ar{i})"""
        )
        ctes.append(
            f"""hr{i} AS MATERIALIZED (
  SELECT e.src AS node, SUM(a.authority) AS hub
  FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src)"""
        )
        ctes.append(
            f"""h{i + 1} AS MATERIALIZED (
  SELECT node, hub / (SELECT MAX(hub) FROM hr{i}) AS hub FROM hr{i})"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT n.node,
       ROUND(COALESCE(h.hub, 0.0), 9) AS hub,
       ROUND(COALESCE(a.authority, 0.0), 9) AS authority
FROM n
LEFT JOIN h{iterations} h ON n.node = h.node
LEFT JOIN a{iterations - 1} a ON n.node = a.node
"""
