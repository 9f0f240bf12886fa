"""SALSA hubs & authorities (Lempel & Moran, WWW'00 "The Stochastic
Approach for Link-Structure Analysis" [public]) — the degree-normalized
sibling of HITS, and the scoring core of who-to-follow-style
recommendation stacks (Twitter WTF, Goel et al. 2015 [public]).

HITS (operators/hits.py) sums raw scores and re-normalizes by the max;
SALSA replaces both half-steps with STOCHASTIC transitions — each hub
spreads its mass over its out-edges (1/out-degree), each authority over
its in-edges (1/in-degree).  Mass is therefore conserved exactly
(sum(hub) == sum(authority) == 1 every round, pinned by test), no
per-round normalization scalar is needed, and the fixed point on a
connected component is degree-proportional — the property that makes
SALSA robust to the tightly-knit-community (TKC) effect that inflates
HITS (Lempel & Moran's motivating pathology).

Execution discipline: identical to the HITS/power-method loop — fixed
synchronous supersteps, AQE off + state-scaled shuffle partitions,
broadcast-gated score vectors under the node bound, per-round
localCheckpoint, and a DuckDB oracle replaying the identical recurrence
as unrolled CTEs (float drift far under the ROUND(_, 9) gate; same
argument as the power-method oracle).
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


def salsa(graph: PropertyGraph, iterations: int = 8) -> DataFrame:
    """(node, hub, authority) over every node incident to an edge after
    ``iterations`` alternating stochastic half-steps from the uniform
    hub start (1/|hub side| on every node with an out-edge), rounded to
    9 decimals.  Nodes that are pure authorities keep hub 0 (and vice
    versa) — the bipartite double cover's two sides."""
    spark = graph.spark
    # Driver-local kernel under the LocalGraph cutoff (the hits.py idiom):
    # the identical stochastic half-steps on dense vectors — hub/od and
    # authority/id are the same per-edge IEEE divisions, only the grouped
    # summation ORDER differs (tolerated under the final ROUND(_, 9), as
    # between the distributed loop and the unrolled oracle).
    if graph.fits_local():
        import numpy as np
        import pandas as pd

        lg = graph.local
        es, ed = lg.edge_src, lg.edge_dst
        od, idg = lg.out_deg, lg.in_deg
        n_hubs = int((od > 0).sum())
        # faithful to the distributed h0 (raises on a zero-edge graph
        # exactly like the 1/n_hubs literal below would)
        h = np.where(od > 0, 1.0 / float(n_hubs), 0.0)
        a = np.zeros(lg.n)
        for _ in range(iterations):
            a = np.bincount(ed, weights=h[es] / od[es], minlength=lg.n)
            h = np.bincount(es, weights=a[ed] / idg[ed], minlength=lg.n)
        inc = (od + idg) > 0
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
    od = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    idg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("id"))
    ew = edges.join(od, "src").join(idg, "dst").select("src", "dst", "od", "id")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        ew = ew.localCheckpoint(eager=True)
        nodes = nodes.localCheckpoint(eager=True)
        n_hubs = od.count()  # 1-row driver scalar, like the power method's n
        h = (
            od.select("src")
            .withColumnRenamed("src", "node")
            .select("node", F.lit(1.0 / float(n_hubs)).alias("hub"))
            .localCheckpoint(eager=True)
        )
        a = None
        for _ in range(iterations):
            hj = F.broadcast(h) if small else h
            a = (
                ew.join(hj, ew.src == hj["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("hub") / F.col("od")).alias("authority"))
                .localCheckpoint(eager=True)
            )
            aj = F.broadcast(a) if small else a
            h = (
                ew.join(aj, ew.dst == aj["node"])
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum(F.col("authority") / F.col("id")).alias("hub"))
                .localCheckpoint(eager=True)
            )
    out = nodes.join(h, "node", "left")
    if a is not None:
        out = out.join(a, "node", "left")
    else:
        out = out.withColumn("authority", F.lit(None).cast("double"))
    return out.select(
        "node",
        F.round(F.coalesce("hub", F.lit(0.0)), 9).alias("hub"),
        F.round(F.coalesce("authority", F.lit(0.0)), 9).alias("authority"),
    )


def salsa_oracle_sql(edges_sql: str, iterations: int = 8) -> str:
    """DuckDB twin: the identical stochastic recurrence unrolled
    (including the iterations=0 boundary: uniform hubs, zero
    authorities)."""
    base = [
        f"se AS MATERIALIZED ({edges_sql})",
        """sew AS MATERIALIZED (
  SELECT e.src, e.dst, o.od, i.id FROM se e
  JOIN (SELECT src, COUNT(*) AS od FROM se GROUP BY src) o USING (src)
  JOIN (SELECT dst, COUNT(*) AS id FROM se GROUP BY dst) i USING (dst))""",
        """sn AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM se UNION ALL SELECT dst AS node FROM se))""",
        """sh0 AS MATERIALIZED (
  SELECT src AS node,
         1.0 / (SELECT CAST(COUNT(DISTINCT src) AS DOUBLE) FROM se) AS hub
  FROM se GROUP BY src)""",
    ]
    if iterations < 1:
        base_body = ",\n".join(base)
        return f"""
WITH {base_body}
SELECT n.node, ROUND(COALESCE(h.hub, 0.0), 9) AS hub, 0.0 AS authority
FROM sn n LEFT JOIN sh0 h ON n.node = h.node
"""
    ctes = list(base)
    for i in range(iterations):
        ctes.append(
            f"""sa{i} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(h.hub / e.od) AS authority
  FROM sew e JOIN sh{i} h ON e.src = h.node GROUP BY e.dst)"""
        )
        ctes.append(
            f"""sh{i + 1} AS MATERIALIZED (
  SELECT e.src AS node, SUM(a.authority / e.id) AS hub
  FROM sew e JOIN sa{i} a ON e.dst = a.node GROUP BY e.src)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT n.node,
       ROUND(COALESCE(h.hub, 0.0), 9) AS hub,
       ROUND(COALESCE(a.authority, 0.0), 9) AS authority
FROM sn n
LEFT JOIN sh{iterations} h ON n.node = h.node
LEFT JOIN sa{iterations - 1} a ON n.node = a.node
"""
